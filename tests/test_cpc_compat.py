"""CPC reference wire-format codec (sketches/cpc_compat.py).

Round-trips every flavor (EMPTY/SPARSE/HYBRID/PINNED/SLIDING) through the
entropy-compressed layout of cpc/compression.rs + cpc/sketch.rs:457-640,
checks the compressed size actually compresses, and exercises the
corruption guards. Table fidelity is pinned separately: the committed
encode tables regenerate the reference's decode tables bit-exactly
(cpc_compression_tables.py docstring; verified at extraction)."""

import numpy as np
import pytest

from datasketches_rust_spark.hashing import hash_u64s
from datasketches_rust_spark.sketches import cpc_compression_tables as T
from datasketches_rust_spark.sketches.cpc import CpcSketch, CpcUnion
from datasketches_rust_spark.sketches.cpc_compat import (decode_cpc,
                                                         determine_pseudo_phase,
                                                         encode_cpc)
from datasketches_rust_spark.sketches.serde import SketchDecodeError


def _sketch(lg_k, n, seed_off=0):
    sk = CpcSketch(lg_k=lg_k)
    if n:
        keys = hash_u64s(np.arange(seed_off, seed_off + n, dtype=np.uint64))
        sk.update_keys(keys.reshape(-1, 1).view(np.uint8))
    return sk


# n chosen per flavor thresholds (cpc/mod.rs:59-92) relative to K=2^lg_k:
# sparse 32C<3K, hybrid 2C<K, pinned 8C<27K, sliding above. C grows
# sublinearly in n, so n values overshoot generously.
FLAVOR_CASES = [
    ("EMPTY", 10, 0),
    ("SPARSE", 10, 30),
    ("HYBRID", 10, 500),
    ("PINNED", 10, 2500),
    ("SLIDING", 10, 100_000),
    ("SPARSE", 6, 4),
    ("SLIDING", 6, 20_000),
    ("SLIDING", 12, 600_000),
]


class TestRoundTrip:
    @pytest.mark.parametrize("flavor,lg_k,n", FLAVOR_CASES)
    def test_flavor_roundtrip(self, flavor, lg_k, n):
        sk = _sketch(lg_k, n)
        assert sk.flavor() == flavor, (sk.flavor(), sk.num_coupons)
        back = decode_cpc(encode_cpc(sk))
        np.testing.assert_array_equal(back.matrix, sk.matrix)
        assert back.num_coupons == sk.num_coupons
        assert back.merge_flag == sk.merge_flag
        assert back.kxp == pytest.approx(sk.kxp, rel=1e-12)
        assert back.hip_est_accum == pytest.approx(sk.hip_est_accum,
                                                   rel=1e-12)
        assert back.estimate() == pytest.approx(sk.estimate(), rel=1e-12)

    @pytest.mark.parametrize("lg_k,n", [(10, 500), (10, 100_000)])
    def test_merged_roundtrip_uses_icon(self, lg_k, n):
        u = CpcUnion(lg_k)
        u.update(_sketch(lg_k, n))
        u.update(_sketch(lg_k, n, seed_off=n // 2))
        sk = u.to_sketch()
        back = decode_cpc(encode_cpc(sk))
        assert back.merge_flag
        np.testing.assert_array_equal(back.matrix, sk.matrix)
        assert back.estimate() == pytest.approx(sk.estimate(), rel=1e-12)

    def test_estimate_accuracy_survives_wire(self):
        n = 200_000
        back = decode_cpc(encode_cpc(_sketch(11, n)))
        assert back.estimate() == pytest.approx(n, rel=0.05)

    def test_compression_actually_compresses(self):
        """SLIDING at high load: compressed window ~2 bits/row beats the
        8 bits/row raw window (that is the point of the format)."""
        sk = _sketch(12, 600_000)
        assert sk.flavor() == "SLIDING"
        raw_window_bytes = sk.k
        assert len(encode_cpc(sk)) < raw_window_bytes
        # and sparse beats the 4-bytes-per-pair raw pair list
        sp = _sketch(12, 100)
        assert len(encode_cpc(sp)) < 8 + 4 * sp.num_coupons + 24


class TestPseudoPhase:
    def test_midrange_tables(self):
        # compression.rs:641-673 thresholds
        assert determine_pseudo_phase(10, 700) == 16      # 4C < 3K
        assert determine_pseudo_phase(10, 1100) == 17     # 10C < 11K
        assert determine_pseudo_phase(10, 1340) == 18
        assert determine_pseudo_phase(10, 1700) == 19
        assert determine_pseudo_phase(10, 2000) == 20
        assert determine_pseudo_phase(10, 2300) == 21
        assert determine_pseudo_phase(10, 2400) == 6      # pre-phase
        # steady state: true phase from coupon count
        assert determine_pseudo_phase(10, 3 * 1024) == (3072 >> 6) & 15

    def test_tables_shapes(self):
        assert T.ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE.shape == (22, 256)
        assert T.DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE.shape == (22, 4096)
        assert T.COLUMN_PERMUTATIONS_FOR_ENCODING.shape == (16, 56)
        assert T.LENGTH_LIMITED_UNARY_ENCODING_TABLE65.shape == (65,)
        # every decode entry's symbol re-encodes to a prefix of the peek
        enc = T.ENCODING_TABLES_FOR_HIGH_ENTROPY_BYTE[0]
        dec = T.DECODING_TABLES_FOR_HIGH_ENTROPY_BYTE[0]
        for w in (0, 1, 0x2AB, 0xFFF):
            sym = int(dec[w]) & 0xFF
            ln = int(dec[w]) >> 8
            code = int(enc[sym])
            assert code >> 12 == ln
            assert (w & ((1 << ln) - 1)) == (code & 0xFFF)


class TestCorruption:
    def test_wrong_family(self):
        buf = bytearray(encode_cpc(_sketch(10, 100)))
        buf[2] = 7
        with pytest.raises(SketchDecodeError):
            decode_cpc(bytes(buf))

    def test_seed_mismatch(self):
        with pytest.raises(SketchDecodeError):
            decode_cpc(encode_cpc(_sketch(10, 100)), seed=1)

    def test_truncated(self):
        buf = encode_cpc(_sketch(10, 2500))
        with pytest.raises(SketchDecodeError):
            decode_cpc(buf[: len(buf) // 2])

    def test_bad_preamble_ints(self):
        buf = bytearray(encode_cpc(_sketch(10, 100)))
        buf[0] ^= 0x1
        with pytest.raises(SketchDecodeError):
            decode_cpc(bytes(buf))
