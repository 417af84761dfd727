"""Sources: deterministic synthetic image+caption fixture (FIXTURES.md F1)
and codec plumbing for binary image columns."""
