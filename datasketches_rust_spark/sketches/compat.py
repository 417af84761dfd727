"""Read-only decoders for REFERENCE wire formats.

The reference tests itself against golden binaries from other
datasketches implementations (tests/common.rs:29-52, tests/test_data/).
This module lets the same golden corpus gate OUR kernels: decode the
committed `.sk` files into repo-native sketch objects and assert the
reference's own bounds (tests/test_golden.py).

Implemented formats (tdigest/sketch.rs:404-640, serialization.rs:18-27):

- DataSketches t-digest v1 (little-endian): preamble_longs u8, serial u8
  (=1), family u8 (=20), k u16, flags u8 (EMPTY=1, SINGLE=2, REVERSE=4),
  unused u16; then num_centroids u32, num_buffered u32, min, max,
  centroids [(mean, weight)], buffered values. f64 means with u64
  weights, or f32 means with u32 weights when ``is_f32``.
- t-digest "compat" format of Dunning's reference implementation
  (big-endian): type u32 (1=double, 2=float), min f64, max f64, then
  double: k f64, num u32, [(weight f64, mean f64)];
  float:  k f32, unused u32, num u16, [(weight f32, mean f32)].

Writing these formats stays a non-goal (serde.py header note); decoding
is enough to consume the reference's committed test corpus.
"""

from __future__ import annotations

import struct

import numpy as np

from datasketches_rust_spark.sketches.serde import SketchDecodeError
from datasketches_rust_spark.sketches.tdigest import TDigest

_FAMILY_TDIGEST = 20
_SERIAL_VERSION = 1
_FLAG_EMPTY = 1
_FLAG_SINGLE = 2
_COMPAT_DOUBLE = 1
_COMPAT_FLOAT = 2


def _need(buf: bytes, off: int, n: int, what: str) -> None:
    if len(buf) < off + n:
        raise SketchDecodeError(
            f"insufficient data for {what}: need {off + n}, have {len(buf)}")


def decode_tdigest(buf: bytes, is_f32: bool = False) -> TDigest:
    """Decode either reference t-digest format (auto-dispatch mirrors
    tdigest/sketch.rs:404-421: an all-zero first header triple means the
    big-endian compat format)."""
    _need(buf, 0, 3, "header")
    preamble_longs, serial, family = buf[0], buf[1], buf[2]
    if family != _FAMILY_TDIGEST:
        if preamble_longs == 0 and serial == 0 and family == 0:
            return _decode_compat(buf)
        raise SketchDecodeError(f"family {family} is not TDIGEST")
    if serial != _SERIAL_VERSION:
        raise SketchDecodeError(f"unsupported serial version {serial}")
    _need(buf, 3, 5, "preamble")
    (k,) = struct.unpack_from("<H", buf, 3)
    if k < 10:
        raise SketchDecodeError(f"k must be >= 10, got {k}")
    flags = buf[5]
    off = 8  # u16 unused at 6..8
    if flags & _FLAG_EMPTY:
        return TDigest(k=int(k))
    vchar, vsize = ("f", 4) if is_f32 else ("d", 8)
    vfmt = "<" + vchar
    if flags & _FLAG_SINGLE:
        _need(buf, off, vsize, "single value")
        (v,) = struct.unpack_from(vfmt, buf, off)
        td = TDigest(k=int(k))
        td.update_values(np.array([v]))
        return td
    _need(buf, off, 8 + 2 * vsize, "centroid header")
    num_centroids, num_buffered = struct.unpack_from("<II", buf, off)
    off += 8
    mn, mx = struct.unpack_from("<" + vchar * 2, buf, off)
    off += 2 * vsize
    if is_f32:
        _need(buf, off, 8 * num_centroids, "centroids")
        pairs = np.frombuffer(buf, dtype=[("m", "<f4"), ("w", "<u4")],
                              count=num_centroids, offset=off)
        off += 8 * num_centroids
    else:
        _need(buf, off, 16 * num_centroids, "centroids")
        pairs = np.frombuffer(buf, dtype=[("m", "<f8"), ("w", "<u8")],
                              count=num_centroids, offset=off)
        off += 16 * num_centroids
    _need(buf, off, vsize * num_buffered, "buffer")
    buffered = np.frombuffer(buf, dtype=vfmt, count=num_buffered,
                             offset=off).astype(np.float64)
    means = pairs["m"].astype(np.float64)
    weights = pairs["w"].astype(np.float64)
    if np.any(weights <= 0) or not np.all(np.isfinite(means)):
        raise SketchDecodeError("corrupt centroid list")
    order = np.argsort(means, kind="stable")
    td = TDigest(k=int(k), means=means[order], weights=weights[order],
                 min_val=float(mn), max_val=float(mx))
    if buffered.size:
        td.update_values(buffered)
    return td


def _decode_compat(buf: bytes) -> TDigest:
    (ty,) = struct.unpack_from(">I", buf, 0)
    if ty == _COMPAT_DOUBLE:
        _need(buf, 4, 28, "compat double header")
        mn, mx, kf = struct.unpack_from(">ddd", buf, 4)
        (num,) = struct.unpack_from(">I", buf, 28)
        _need(buf, 32, 16 * num, "compat centroids")
        pairs = np.frombuffer(buf, dtype=[("w", ">f8"), ("m", ">f8")],
                              count=num, offset=32)
    elif ty == _COMPAT_FLOAT:
        _need(buf, 4, 26, "compat float header")
        mn, mx = struct.unpack_from(">dd", buf, 4)
        (kf,) = struct.unpack_from(">f", buf, 20)
        (num,) = struct.unpack_from(">H", buf, 28)  # u32 unused at 24..28
        _need(buf, 30, 8 * num, "compat centroids")
        pairs = np.frombuffer(buf, dtype=[("w", ">f4"), ("m", ">f4")],
                              count=num, offset=30)
    else:
        raise SketchDecodeError(f"unknown compat type {ty}")
    k = int(kf)
    if k < 10:
        raise SketchDecodeError(f"k must be >= 10, got {k}")
    means = pairs["m"].astype(np.float64)
    weights = pairs["w"].astype(np.float64)
    if np.any(weights <= 0) or not np.all(np.isfinite(means)):
        raise SketchDecodeError("corrupt centroid list")
    order = np.argsort(means, kind="stable")
    return TDigest(k=k, means=means[order], weights=weights[order],
                   min_val=float(mn), max_val=float(mx))
