"""Pure-numpy sketch kernels (no Spark imports).

Each module mirrors one reference sketch family's semantics
(build/update/merge/estimate/serialize lifecycle, SURVEY.md §2) but is
columnar: update() takes a vector of pre-hashed values, not one value at a
time, because the Spark integration feeds whole Arrow batches.

Kernels are deliberately Spark-free so the single-node oracle
(tests + FIXTURES.md §F3) and the distributed aggregates (agg.py) share
the exact same code — that is what makes the recall>=0.99 parity check
meaningful.
"""
