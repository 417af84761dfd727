"""Image byte codecs for the binary `bytes` column — pure numpy/zlib.

The sandbox has no PIL/opencv (task instructions: stub the decode step or
use a deterministic fake, keep the Spark-side plumbing real). Policy:

- "png": a REAL minimal PNG codec (8-bit RGB, filter 0) — spec-compliant
  output (readable by any viewer), lossless round-trip.
- "jpeg": a clearly-marked DETERMINISTIC FAKE ("lossy-sim"): pixels are
  quantized by a quality-derived step (bounded error => decoded PSNR >= 40
  dB for quality >= 90, matching the FIXTURES.md F1 invariant), zlib
  packed with a tagged header. It is NOT wire-format JPEG; swap
  encode_jpeg/decode_jpeg for a real codec outside the sandbox.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)],
        axis=1).tobytes()
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Handles filters 0-4 (full spec for
    8-bit RGB), so it also reads PNGs produced elsewhere."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = b""
    while pos < len(buf):
        (ln,), tag = struct.unpack(">I", buf[pos:pos + 4]), buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    # fast path — every scanline filter 0 (what encode_png writes): the
    # payload IS the pixels; skips the per-scanline unfilter loop, which
    # dominates decode cost in the batched scan-stage UDF
    if not rows[:, 0].any():
        return rows[:, 1:].reshape(h, w, 3).copy()
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, w * 3), dtype=np.int32)
    for y in range(h):
        f, line = filters[y], data[y].copy()
        prev = out[y - 1] if y else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            out[y] = line
        elif f == 2:
            out[y] = (line + prev) & 0xFF
        else:
            for x in range(w * 3):
                a = out[y, x - 3] if x >= 3 else 0
                b = prev[x]
                cc = prev[x - 3] if x >= 3 else 0
                if f == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    line[x] = (line[x] + (a + b) // 2) & 0xFF
                elif f == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    line[x] = (line[x] + pr) & 0xFF
            out[y] = line
    return out.astype(np.uint8).reshape(h, w, 3)


_FAKE_JPEG_MAGIC = b"FJPG"


def encode_jpeg(pixels: np.ndarray, quality: int = 95) -> bytes:
    """DETERMINISTIC FAKE lossy codec (see module docstring).

    Quantization step = round(2 + (100-quality)/8) levels -> max abs pixel
    error = step/2; PSNR >= 20*log10(255/(step/2)) — quality 90 gives
    step 3, worst-case PSNR ~44.6 dB > 40 dB (FIXTURES F1 bound)."""
    h, w, _ = pixels.shape
    step = max(1, round(2 + (100 - quality) / 8))
    q = (pixels.astype(np.int32) + step // 2) // step * step
    q = np.clip(q, 0, 255).astype(np.uint8)
    hdr = _FAKE_JPEG_MAGIC + struct.pack(">HHB", w, h, step)
    return hdr + zlib.compress(q.tobytes(), 6)


def decode_jpeg(buf: bytes) -> np.ndarray:
    if buf[:4] != _FAKE_JPEG_MAGIC:
        raise NotImplementedError(
            "real JPEG decoding is stubbed in-sandbox; only the "
            "deterministic fake codec (FJPG) is supported here")
    w, h, _step = struct.unpack(">HHB", buf[4:9])
    raw = np.frombuffer(zlib.decompress(buf[9:]), dtype=np.uint8)
    return raw.reshape(h, w, 3)


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(buf)
    if fmt == "jpeg":
        return decode_jpeg(buf)
    raise NotImplementedError(f"format {fmt!r} not supported in-sandbox")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
