"""Suffix-array LCS kernel vs brute-force DP oracle; confirm-pass on Spark."""

import numpy as np
import pytest

from datasketches_rust_spark.operators.suffix import (lcp_kasai,
                                                      longest_common_substring,
                                                      suffix_array)


def brute_lcs(a: bytes, b: bytes) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_suffix_array_banana():
    s = np.frombuffer(b"banana", np.uint8).astype(np.int64)
    sa = suffix_array(s)
    suffixes = [bytes(s[i:].astype(np.uint8)) for i in sa]
    assert suffixes == sorted(suffixes)
    lcp = lcp_kasai(s, sa)
    assert list(lcp) == [0, 1, 3, 0, 0, 2]  # a, ana, anana, b, na, nana


def test_lcs_known_cases():
    assert longest_common_substring(b"hello world", b"yello worlds") == 10
    assert longest_common_substring(b"abc", b"xyz") == 0
    assert longest_common_substring(b"", b"abc") == 0
    assert longest_common_substring(b"same", b"same") == 4


def test_lcs_matches_bruteforce_random():
    rng = np.random.default_rng(9)
    for _ in range(40):
        a = bytes(rng.integers(97, 101, rng.integers(1, 60)).astype(np.uint8))
        b = bytes(rng.integers(97, 101, rng.integers(1, 60)).astype(np.uint8))
        assert longest_common_substring(a, b) == brute_lcs(a, b), (a, b)


def test_confirm_pass_on_spark(spark, sf_correct_dir):
    """LSH candidates confirmed by contiguous-overlap: every injected
    near-dup pair (1-2 token edits) keeps a long common run."""
    from datasketches_rust_spark.config import DedupConfig
    from datasketches_rust_spark.operators.suffix import \
        confirm_pairs_substring
    from datasketches_rust_spark.pipeline import dedup_pairs
    cfg = DedupConfig()
    docs = spark.read.parquet(f"{sf_correct_dir}/documents.parquet")
    pairs = dedup_pairs(docs, cfg, "doc_id", "text").select("id_a", "id_b")
    confirmed = confirm_pairs_substring(pairs, docs, "doc_id", "text",
                                        min_ratio=0.3).collect()
    assert len(confirmed) == 25  # all survive at a 0.3 contiguity floor
    for r in confirmed:
        assert r["lcs_len"] >= 10
