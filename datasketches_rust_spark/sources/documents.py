"""Deterministic synthetic text corpus for the text-axis dedup pipeline.

The image fixture (sources/images.py) carries the north_star's
image+caption shape; this is its TEXT-ONLY counterpart for scaling
evidence on the docs dedup pipeline (MinHash -> LSH -> exact-Jaccard
verify -> connected components), where synthesizing PNG bytes would
dominate the runtime without exercising anything the caption path
doesn't.

Same scale design as the image fixture: a cheap driver-side
``plan_clusters`` role plan (reused verbatim), every textual draw keyed
by (seed, row_index) so any worker materializes any slice independently
— ``documents_spark_df`` synthesizes through ``mapInPandas`` over
``spark.range(n)``.

Duplicate injection mirrors the image kinds, re-expressed for text:
  exact          — identical text, new doc_id
  caption/visual — near-dup: 1-2 word substitutions out of 40-80 words
                   (char-5-shingle jaccard >= ~0.86 worst case, above
                   the 0.8 verify threshold with LSH band-match
                   probability ~1.0 at b=32/r=4)
  hard_negative  — distinct text sharing the first two words with the
                   previous cluster's base
Ground truth (doc_id, cluster_id = base row index) emitted alongside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datasketches_rust_spark.sources.images import (_row_rng, make_vocab,
                                                    plan_clusters)

DOC_SCHEMA = "doc_id long, text string"


def _base_words(seed: int, i: int, vocab: list[str],
                lo: int = 40, hi: int = 81) -> list[str]:
    rng = _row_rng(seed, i, 12)
    n = int(rng.integers(lo, hi))
    return [vocab[rng.integers(len(vocab))] for _ in range(n)]


def materialize_docs(indices, plan: list[tuple[str, int]], seed: int,
                     vocab: list[str]) -> pd.DataFrame:
    """Materialize the given row indices — callable from any worker."""
    rows = []
    for i in indices:
        kind, base = plan[i]
        if kind in ("base", "single", "hard_negative"):
            words = _base_words(seed, i, vocab)
            if kind == "hard_negative":
                bw = _base_words(seed, base, vocab)
                words[0], words[1] = bw[0], bw[1]
        elif kind == "exact":
            words = _base_words(seed, base, vocab)
        else:  # caption / visual -> near-dup text variant
            words = _base_words(seed, base, vocab)
            rng = _row_rng(seed, i, 13)
            for _ in range(int(rng.integers(1, 3))):
                words[int(rng.integers(len(words)))] = \
                    vocab[int(rng.integers(len(vocab)))]
        cluster = base if kind in ("base", "exact", "visual",
                                   "caption") else i
        rows.append((i, " ".join(words), int(cluster)))
    return pd.DataFrame(rows, columns=["doc_id", "text", "cluster_id"])


def documents_spark_df(spark, n_rows: int, seed: int = 42,
                       dup_rate: float = 0.30,
                       partitions: int | None = None):
    """(documents DataFrame, truth DataFrame), synthesized IN PARALLEL:
    spark.range(n) -> mapInPandas materializes each row slice on workers
    (plan + vocab broadcast via closure)."""
    plan = plan_clusters(n_rows, seed, dup_rate)
    vocab = make_vocab(seed, size=2000)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield materialize_docs(pdf["id"].to_numpy(), plan, seed, vocab)

    base = spark.range(0, n_rows, numPartitions=parts)
    full = base.mapInPandas(gen, schema=DOC_SCHEMA + ", cluster_id long")
    return full.drop("cluster_id"), full.select("doc_id", "cluster_id")
