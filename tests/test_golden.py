"""Golden-file bit-exactness suite: the reference's committed test
binaries (tests/test_data/*.sk) decoded by our compat decoders and held
to the reference's own assertions
(tests/tdigest_serialization_test.rs:76-110).
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from datasketches_rust_spark.sketches.compat import decode_tdigest
from datasketches_rust_spark.sketches.serde import SketchDecodeError
from datasketches_rust_spark.sketches.tdigest import TDigest

GOLDEN_DIR = "/root/reference/datasketches/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference golden corpus absent")


@pytest.mark.parametrize("name", ["tdigest_ref_k100_n10000_double.sk",
                                  "tdigest_ref_k100_n10000_float.sk"])
def test_reference_implementation_golden(name):
    """Byte-identical mirror of
    tdigest_serialization_test.rs:test_deserialize_from_reference_implementation."""
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        td = decode_tdigest(f.read())
    n = 10000
    assert td.k == 100
    assert td.total_weight() == n
    assert td.min_val == 0.0
    assert td.max_val == float(n - 1)
    assert td.rank(0.0) == pytest.approx(0.0, abs=1e-4)
    assert td.rank(n / 4.0) == pytest.approx(0.25, abs=1e-4)
    assert td.rank(n / 2.0) == pytest.approx(0.5, abs=1e-4)
    assert td.rank(n * 3 / 4.0) == pytest.approx(0.75, abs=1e-4)
    assert td.rank(float(n)) == 1.0


def test_golden_survives_our_roundtrip():
    """A decoded golden sketch must survive OUR serde unchanged — the
    bridge between the reference corpus and in-engine shuffle state."""
    with open(os.path.join(GOLDEN_DIR,
                           "tdigest_ref_k100_n10000_double.sk"), "rb") as f:
        td = decode_tdigest(f.read())
    rt = TDigest.deserialize(td.serialize())
    assert rt.total_weight() == td.total_weight()
    assert rt.rank(5000.0) == td.rank(5000.0)
    assert rt.quantile(0.5) == td.quantile(0.5)


def test_golden_merges_with_native():
    """Merging a golden-decoded digest with a natively built one keeps
    rank accuracy (the cross-implementation interop the reference's
    corpus exists to protect)."""
    with open(os.path.join(GOLDEN_DIR,
                           "tdigest_ref_k100_n10000_double.sk"), "rb") as f:
        golden = decode_tdigest(f.read())
    native = TDigest(k=100)
    native.update_values(np.arange(10000, 20000, dtype=np.float64))
    merged = golden.merge(native)
    assert merged.total_weight() == 20000
    assert merged.rank(10000.0) == pytest.approx(0.5, abs=0.01)


def _ds_v1_blob(k: int, means, weights, mn, mx, buffered=()):
    """Synthesize a DataSketches t-digest v1 (LE, double) blob per
    tdigest/sketch.rs:431-???/serialization.rs constants — exercises the
    non-compat decoder branch without needing external files."""
    head = struct.pack("<BBBHBH", 2, 1, 20, k, 4, 0)  # REVERSE flag set
    body = struct.pack("<II", len(means), len(buffered))
    body += struct.pack("<dd", mn, mx)
    for m, w in zip(means, weights):
        body += struct.pack("<dQ", m, w)
    for v in buffered:
        body += struct.pack("<d", v)
    return head + body


class TestDataSketchesV1Format:
    def test_multi_centroid(self):
        td = decode_tdigest(_ds_v1_blob(
            100, [1.0, 5.0, 9.0], [2, 6, 2], 0.5, 9.5, buffered=[4.0]))
        assert td.k == 100
        assert td.total_weight() == 11
        assert td.min_val == 0.5 and td.max_val == 9.5

    def test_empty(self):
        blob = struct.pack("<BBBHBH", 1, 1, 20, 100, 1, 0)  # EMPTY flag
        td = decode_tdigest(blob)
        assert td.total_weight() == 0

    def test_single_value(self):
        blob = struct.pack("<BBBHBH", 1, 1, 20, 100, 2, 0)  # SINGLE flag
        blob += struct.pack("<d", 42.0)
        td = decode_tdigest(blob)
        assert td.total_weight() == 1
        assert td.quantile(0.5) == 42.0

    def test_corruption_rejected(self):
        with pytest.raises(SketchDecodeError):
            decode_tdigest(b"\x02\x01\x13junk")  # wrong family id
        with pytest.raises(SketchDecodeError):
            decode_tdigest(_ds_v1_blob(100, [1.0], [1], 0, 1)[:-4])
        with pytest.raises(SketchDecodeError):
            decode_tdigest(_ds_v1_blob(100, [1.0], [0], 0, 1))  # 0 weight
        with pytest.raises(SketchDecodeError):
            decode_tdigest(struct.pack(">I", 99))  # unknown compat type
