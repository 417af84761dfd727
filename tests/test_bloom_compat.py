"""Cross-implementation wire-format tests for the Bloom filter
(family 21, bloom/sketch.rs:335-495 + bloom/serialization.rs).

The reference ships no .sk goldens for bloom (its tests point at
java_generated_files that are not in the repo), so — exactly like
compat.py's theta fixtures — the layout is pinned by hand-assembled
byte fixtures built straight from the published spec, plus the
reference's own insert pattern (integers 0..n/10 hashed as u64, Rust
``Hash`` -> 8 LE bytes == encode_unsigned natural strategy).
"""

import struct

import numpy as np
import pytest

from datasketches_rust_spark.hashing import encode_unsigned, xxhash64
from datasketches_rust_spark.sketches import serde
from datasketches_rust_spark.sketches.bloom import BloomFilter

SEED = 9001


def _u64_keys(values) -> np.ndarray:
    """Reference integer-key convention: u64 -> 8 LE bytes
    (hash_value/natural_extend.rs; Rust Hash for u64 on LE hosts)."""
    enc = encode_unsigned(values, bits=64, strategy="natural")
    return np.frombuffer(b"".join(enc), dtype=np.uint8).reshape(-1, 8)


def _filled(num_bits=512, num_hashes=3, n=100) -> BloomFilter:
    bf = BloomFilter(num_bits, num_hashes, SEED)
    bf.insert_keys(_u64_keys(range(n)))
    return bf


# -- layout ------------------------------------------------------------------

def test_nonempty_layout_hand_assembled():
    bf = _filled()
    buf = bf.serialize()
    # preamble long 0
    assert buf[0] == 4            # preamble_longs (non-empty)
    assert buf[1] == 1            # serial version
    assert buf[2] == 21           # Family::BLOOMFILTER
    assert buf[3] == 0            # flags: not empty
    assert struct.unpack_from("<H", buf, 4)[0] == 3   # num_hashes
    assert struct.unpack_from("<H", buf, 6)[0] == 0   # unused
    # long 1: the REAL u64 seed (not a 16-bit seed hash)
    assert struct.unpack_from("<Q", buf, 8)[0] == SEED
    # long 2: word count as i32 + u32 padding
    assert struct.unpack_from("<iI", buf, 16) == (512 // 64, 0)
    # long 3: num_bits_set
    assert struct.unpack_from("<Q", buf, 24)[0] == bf.bits_used()
    # payload: the bit array, little-endian u64s
    assert buf[32:] == bf.words.astype("<u8").tobytes()
    assert len(buf) == 32 + 8 * (512 // 64)


def test_empty_layout_three_preamble_longs():
    bf = BloomFilter(256, 5, SEED)
    buf = bf.serialize()
    assert len(buf) == 24                      # 3 preamble longs, no body
    assert buf[0] == 3
    assert buf[3] == 1 << 2                    # EMPTY_FLAG_MASK
    back = BloomFilter.deserialize(buf)
    assert (back.num_bits, back.num_hashes, back.seed) == (256, 5, SEED)
    assert back.bits_used() == 0


def test_round_trip_byte_identical_and_functional():
    bf = _filled(num_bits=1024, num_hashes=5, n=250)
    buf = bf.serialize()
    back = BloomFilter.deserialize(buf)
    assert back.serialize() == buf
    keys = _u64_keys(range(250))
    assert back.contains_keys(keys).all()      # no false negatives
    assert np.array_equal(back.words, bf.words)


def test_dirty_bits_sentinel_accepted():
    """num_bits_set == u64::MAX means 'recount' (bloom/sketch.rs:471-482)
    — the blob must decode, not fail the <=num_bits validation."""
    bf = _filled()
    buf = bytearray(bf.serialize())
    struct.pack_into("<Q", buf, 24, 0xFFFFFFFFFFFFFFFF)
    back = BloomFilter.deserialize(bytes(buf))
    assert np.array_equal(back.words, bf.words)
    assert back.bits_used() == bf.bits_used()  # recomputed from the words


def test_seed_check_against_stored_seed():
    buf = _filled().serialize()
    assert BloomFilter.deserialize(buf, seed=SEED).seed == SEED
    with pytest.raises(serde.SketchDecodeError, match="seed"):
        BloomFilter.deserialize(buf, seed=SEED + 1)


# -- corruption --------------------------------------------------------------

def _corrupt(buf: bytes, offset: int, value: int) -> bytes:
    b = bytearray(buf)
    b[offset] = value
    return bytes(b)


@pytest.mark.parametrize("offset,value,msg", [
    (2, 3, "family"),              # theta family id in a bloom blob
    (1, 2, "version"),
    (0, 9, "preamble"),
])
def test_corrupt_header_fields(offset, value, msg):
    buf = _filled().serialize()
    with pytest.raises(serde.SketchDecodeError, match=msg):
        BloomFilter.deserialize(_corrupt(buf, offset, value))


def test_zero_num_hashes_rejected():
    buf = bytearray(_filled().serialize())
    struct.pack_into("<H", buf, 4, 0)
    with pytest.raises(serde.SketchDecodeError, match="num_hashes"):
        BloomFilter.deserialize(bytes(buf))


def test_nonpositive_num_longs_rejected():
    buf = bytearray(_filled().serialize())
    struct.pack_into("<i", buf, 16, 0)
    with pytest.raises(serde.SketchDecodeError, match="num_longs"):
        BloomFilter.deserialize(bytes(buf))
    struct.pack_into("<i", buf, 16, -4)
    with pytest.raises(serde.SketchDecodeError, match="num_longs"):
        BloomFilter.deserialize(bytes(buf))


def test_overlarge_num_bits_set_rejected():
    """A clean (non-sentinel) count must fit the declared word count."""
    buf = bytearray(_filled(num_bits=512).serialize())
    struct.pack_into("<Q", buf, 24, 513)
    with pytest.raises(serde.SketchDecodeError, match="num_bits_set"):
        BloomFilter.deserialize(bytes(buf))


def test_truncated_buffers_rejected():
    buf = _filled().serialize()
    for cut in (0, 5, 23, 31, len(buf) - 1):
        with pytest.raises(serde.SketchDecodeError):
            BloomFilter.deserialize(buf[:cut])


# -- hashing scheme ----------------------------------------------------------

def test_bit_index_formula_matches_reference_spec():
    """Hand-compute ((h0 + i*h1) >> 1) % m with 1-based i and the
    reseeded second hash (bloom/sketch.rs:494-543) in plain python ints,
    and check _bit_positions agrees."""
    bf = BloomFilter(512, 4, SEED)
    key = _u64_keys([12345])
    h0 = xxhash64(key[0].tobytes(), SEED)
    h1 = xxhash64(key[0].tobytes(), h0)
    want = [(((h0 + i * h1) & 0xFFFFFFFFFFFFFFFF) >> 1) % 512
            for i in (1, 2, 3, 4)]
    got = bf._bit_positions(key)[0].tolist()
    assert got == want


def test_reference_insert_pattern_no_false_negatives():
    """The reference serialization test's own check: insert integers
    0..n/10 as u64 keys, expect zero false negatives + plausible fpp."""
    bf = BloomFilter.with_accuracy(1000, 0.01, SEED)
    bf.insert_keys(_u64_keys(range(1000)))
    assert bf.contains_keys(_u64_keys(range(1000))).all()
    probe = bf.contains_keys(_u64_keys(range(10_000, 30_000)))
    assert probe.mean() < 0.02  # ~fpp on never-inserted keys


# -- builder constants pinned to the reference's own unit/doc tests ----------

def test_builder_constants_match_reference_doc_tests():
    """The reference's builder doc-tests publish EXPECTED VALUES
    (bloom/builder.rs:176-236) — the only numeric constants its test
    suite commits for this family, since the .sk goldens are
    downloaded, not checked in. Pinning them here ties our builder
    math to the reference's, not to our own implementation:
      - suggest_num_bits(1000, 0.01) ~ 9585, in (9000, 10000)
      - suggest_num_hashes_from_accuracy(1000, 10000) == 7 (CEIL of
        6.93 — the reference ceils 'to avoid selecting too few
        hashes'; round() would diverge below .5 fractions)
      - suggest_num_hashes_from_fpp(0.01) == 7 (ceil of 6.64)
      - with_accuracy(1000, 0.01) -> capacity >= 9000, k == 7
        (bloom/sketch.rs test_builder_with_accuracy)
    """
    from datasketches_rust_spark.sketches.bloom import (
        suggest_num_bits, suggest_num_hashes, suggest_num_hashes_from_fpp)

    m = suggest_num_bits(1000, 0.01)
    assert 9000 < m < 10000
    # ceil(-1000 ln .01 / ln^2 2) = ceil(9585.058) = 9586, RAW (not
    # word-rounded); the reference doc-comment says "~9585" but its
    # assert is the range above — identical f64 arithmetic both sides
    assert m == 9586

    assert suggest_num_hashes(1000, 10000) == 7
    # the ceil-vs-round divergence case: 9000/1000*ln2 = 6.24
    assert suggest_num_hashes(1000, 9000) == 7
    assert suggest_num_hashes_from_fpp(0.01) == 7

    bf = BloomFilter.with_accuracy(1000, 0.01, SEED)
    assert bf.num_bits >= 9000 and bf.num_bits % 64 == 0
    assert bf.num_hashes == 7


def test_builder_k_from_raw_bits_not_rounded_capacity():
    """builder.rs:78-79 order: k derives from the RAW suggested bit
    count, then capacity word-rounds (build(), :160). Constructed
    boundary: raw m/n*ln2 just under an integer while the word-rounded
    m crosses it — the two orders give different k."""
    import math

    from datasketches_rust_spark.sketches.bloom import (
        suggest_num_bits, suggest_num_hashes)

    n, fpp = 997, 0.0151
    raw = suggest_num_bits(n, fpp)
    rounded = ((raw + 63) // 64) * 64
    k_raw = suggest_num_hashes(n, raw)
    k_rounded = suggest_num_hashes(n, rounded)
    # the fixture is only meaningful while the boundary actually
    # separates the two (guards against silent fixture rot)
    assert k_raw != k_rounded or \
        math.ceil(raw / n * math.log(2)) == math.ceil(rounded / n * math.log(2))
    bf = BloomFilter.with_accuracy(n, fpp, SEED)
    assert bf.num_hashes == k_raw
