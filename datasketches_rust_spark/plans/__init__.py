"""Plan-level utilities: checkpoint/resume with lineage + metrics."""
