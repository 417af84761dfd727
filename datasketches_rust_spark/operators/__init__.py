"""Relational-level operators the reference lacks (SURVEY.md §2.9): LSH
candidate generation (self-join on band keys), connected components,
similarity search, dedup strategies. All plain DataFrame compositions —
no custom Catalyst rules needed (SURVEY.md §4)."""
