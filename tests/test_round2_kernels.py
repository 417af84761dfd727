"""Round-2 kernel additions: theta sampling_p, bloom contains_and_insert,
frequencies versioned binary serde, CPC estimate-from-bytes wrapper.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketches_rust_spark.hashing import hash_i64s
from datasketches_rust_spark.sketches import serde
from datasketches_rust_spark.sketches.bloom import BloomFilter
from datasketches_rust_spark.sketches.frequencies import FrequentItemsSketch
from datasketches_rust_spark.sketches.theta import MAX_THETA, ThetaSketch


class TestThetaSamplingP:
    def test_start_theta_screens_updates(self):
        # theta/sketch.rs:986-993: initial theta = p * MAX
        sk = ThetaSketch(lg_k=12, sampling_p=0.25)
        assert sk.is_estimation_mode()
        n = 10000
        sk.update_hashes(hash_i64s(np.arange(n, dtype=np.int64)))
        # ~p of the stream is retained, estimate still unbiased
        assert sk.entries.size == pytest.approx(n * 0.25, rel=0.15)
        assert sk.estimate() == pytest.approx(n, rel=0.1)
        assert np.all(sk.entries < sk.theta)

    def test_reset_preserves_p(self):
        sk = ThetaSketch(lg_k=12, sampling_p=0.5)
        sk.update_hashes(hash_i64s(np.arange(100, dtype=np.int64)))
        sk.reset()
        assert sk.entries.size == 0
        assert sk.theta == np.uint64(0.5 * float(MAX_THETA))

    def test_p_one_unchanged(self):
        assert ThetaSketch(lg_k=12).theta == MAX_THETA

    def test_invalid_p(self):
        for p in (0.0, -0.5, 1.5):
            with pytest.raises(ValueError):
                ThetaSketch(lg_k=12, sampling_p=p)

    def test_union_mixed_p(self):
        a = ThetaSketch(lg_k=12, sampling_p=0.5)
        b = ThetaSketch(lg_k=12)
        a.update_hashes(hash_i64s(np.arange(5000, dtype=np.int64)))
        b.update_hashes(hash_i64s(np.arange(2500, 7500, dtype=np.int64)))
        u = a.union(b)
        assert u.estimate() == pytest.approx(7500, rel=0.1)


class TestBloomContainsAndInsert:
    def _keys(self, lo, hi):
        return np.arange(lo, hi, dtype=np.int64).view(np.uint8).reshape(-1, 8)

    def test_semantics(self):
        bf = BloomFilter(1 << 14, 7)
        first = bf.contains_and_insert_keys(self._keys(0, 100))
        assert not first.any()  # nothing present before
        again = bf.contains_and_insert_keys(self._keys(0, 100))
        assert again.all()  # now everything is
        assert bf.contains_keys(self._keys(0, 100)).all()

    def test_within_batch_duplicate_sees_earlier_insert(self):
        # bloom/sketch.rs:97-102 is a per-item loop: the 2nd occurrence
        # of a key IN THE SAME BATCH must report contained
        bf = BloomFilter(1 << 14, 7)
        batch = np.vstack([self._keys(0, 1), self._keys(0, 1)])
        got = bf.contains_and_insert_keys(batch)
        assert list(got) == [False, True]


class TestFreqBinarySerde:
    def test_roundtrip_str_items(self):
        sk = FrequentItemsSketch(64)
        sk.update_counts(["a", "b", "a", "c"], [1, 2, 3, 4])
        rt = FrequentItemsSketch.deserialize(sk.serialize())
        assert rt.counts == sk.counts
        assert rt.offset == sk.offset
        assert rt.total_weight == sk.total_weight
        assert rt.max_map_size == sk.max_map_size

    def test_roundtrip_numpy_int_items(self):
        import pandas as pd
        sk = FrequentItemsSketch(64)
        counts = pd.Series([1, 2, 2, 3, 3, 3]).value_counts()
        sk.update_counts(list(counts.index), counts.to_numpy())
        rt = FrequentItemsSketch.deserialize(sk.serialize())
        assert {int(k): v for k, v in rt.counts.items()} == \
            {int(k): v for k, v in sk.counts.items()}

    def test_roundtrip_bytes_and_float_items(self):
        for items in ([b"blob", b"x"], [1.5, -2.25]):
            sk = FrequentItemsSketch(64)
            sk.update_counts(items, [3, 2])
            rt = FrequentItemsSketch.deserialize(sk.serialize())
            assert rt.counts == sk.counts

    def test_mixed_item_types_rejected(self):
        """The family-10 layout is generic over ONE item type T, like
        FrequentItemsSketch::<T> — a mixed-type payload can't be
        represented, and a Spark column is typed so it never arises."""
        import pytest
        sk = FrequentItemsSketch(64)
        sk.update_counts([b"blob", 1.5], [3, 2])
        with pytest.raises(TypeError, match="mixed item types"):
            sk.serialize()

    def test_no_pickle_in_payload(self):
        sk = FrequentItemsSketch(64)
        sk.update_counts(["x"], [1])
        blob = sk.serialize()
        # pickle protocol-4 frames start with b'\x80\x04' — must be absent
        assert b"\x80\x04" not in blob

    def test_corruption_rejected(self):
        sk = FrequentItemsSketch(64)
        sk.update_counts(["abc"], [5])
        blob = sk.serialize()
        with pytest.raises(serde.SketchDecodeError):
            FrequentItemsSketch.deserialize(blob[:-2])


def test_cpc_estimate_from_bytes():
    from datasketches_rust_spark.sketches.cpc import (CpcSketch,
                                                      estimate_from_bytes)
    sk = CpcSketch(lg_k=11)
    sk.update_hashes(*_mm(np.arange(5000, dtype=np.int64)))
    assert estimate_from_bytes(sk.serialize()) == sk.estimate()
    merged = sk.union(sk)
    assert estimate_from_bytes(merged.serialize()) == merged.estimate()


def _mm(vals):
    from datasketches_rust_spark.hashing import murmur3_x64_128_matrix
    data = vals.view(np.uint8).reshape(len(vals), 8)
    return murmur3_x64_128_matrix(data, 9001)


class TestBpeEncode:
    """functions/bpe: the real merge-apply loop (greedy lowest-rank,
    all occurrences per pass) — semantics shared with the DuckDB
    recursive oracle."""

    def test_rank_priority_wins_over_position(self):
        from datasketches_rust_spark.functions.bpe import bpe_encode
        # ranks: (b,c)=0 beats (a,b)=1 even though (a,b) occurs first
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert bpe_encode("abc", ranks) == ["a", "bc"]

    def test_all_occurrences_fused_per_pass(self):
        from datasketches_rust_spark.functions.bpe import bpe_encode
        ranks = {("a", "b"): 0}
        assert bpe_encode("abab", ranks) == ["ab", "ab"]
        # overlapping run: leftmost-first non-overlapping
        ranks = {("a", "a"): 0}
        assert bpe_encode("aaa", ranks) == ["aa", "a"]

    def test_cascading_merges(self):
        from datasketches_rust_spark.functions.bpe import bpe_encode
        ranks = {("a", "b"): 0, ("ab", "c"): 1}
        assert bpe_encode("abc", ranks) == ["abc"]

    def test_no_merge_applies(self):
        from datasketches_rust_spark.functions.bpe import bpe_encode
        assert bpe_encode("xyz", {("q", "r"): 0}) == ["x", "y", "z"]
        assert bpe_encode("", {}) == []
        assert bpe_encode("a", {}) == ["a"]

    def test_committed_vocab_compresses_fixture_words(self):
        from datasketches_rust_spark.functions.bpe import bpe_encode
        # trained on the corpus: common corpus words collapse fully
        assert bpe_encode(" query") == [" ", "query"]
        assert bpe_encode(" window") == [" window"]
        assert len(bpe_encode(" zzqxv")) == 6  # unseen -> chars
