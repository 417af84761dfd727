"""Audio clip sketch: 64-bit Haitsma–Kalker-style sign code for LSH
candidate generation + a unit-normalized 8x8 band-energy feature
vector for exact verification.

The code follows the Philips robust-hash family ("A Highly Robust
Audio Fingerprint", Haitsma & Kalker, ISMIR'02): the clip is cut into
8 equal TIME segments x 8 LINEAR frequency bands over [100, 3600] Hz
(absolute Hz so a resampled copy lands in the same bands; linear
spacing so uniformly-pitched content occupies bands uniformly — log
spacing concentrates everything in the top bands and collapses
distances), and bit(seg, band) = E[seg, band] >
mean_over_segments(E[:, band]). Comparing against the band's own mean
makes the code exactly GAIN-INVARIANT and robust to PCM16
quantization, mild noise and resampling (fixture-measured: gain 0
bits, noise/resample mostly <=5, tail to ~8; distinct clips ~25-32,
rare tails to ~3) — so the 64-bit code is the CANDIDATE key, not the
verdict. The verdict is the feature vector: each segment's spectrum
is normalized to sum 1 FIRST (removing gain AND envelope — only
per-segment spectral SHAPE remains), then the 8x8 matrix is flattened
and L2-normalized so verification cosine = a plain dot product.
Fixture margins are decisive: dup pairs >= 0.9997 while
band-COLLIDING distinct pairs (the adversarial set candidate
generation selects for) max 0.876 — raw-energy cosine, by contrast,
OVERLAPS (dup min 0.888 < colliding-distinct max 0.900) because the
loudest cells dominate it. See pipeline_audio.py for the
id-only-shuffle join shape.

Pure numpy, Spark-free (the test oracle recomputes with this same
kernel driver-side; rule: sketch kernels stay Spark-free). Not
time-shift invariant by design: alignment-insensitive matching needs
frame-level codes + temporal voting — out of scope for clip dedup,
where dups are re-encodes of the same master.
"""

from __future__ import annotations

import numpy as np

N_SEGMENTS = 8
N_BANDS = 8
F_LO = 100.0
F_HI = 3600.0

BAND_EDGES = np.linspace(F_LO, F_HI, N_BANDS + 1)


def band_energies(pcm: np.ndarray, sr: int) -> np.ndarray:
    """(N_SEGMENTS, N_BANDS) spectral energy matrix of a mono clip."""
    pcm = np.asarray(pcm, dtype=np.float64)
    n = pcm.size - pcm.size % N_SEGMENTS
    out = np.zeros((N_SEGMENTS, N_BANDS), dtype=np.float64)
    if n == 0:
        return out
    segs = pcm[:n].reshape(N_SEGMENTS, -1)
    mag2 = np.abs(np.fft.rfft(segs, axis=1)) ** 2
    freqs = np.fft.rfftfreq(segs.shape[1], 1.0 / sr)
    for b in range(N_BANDS):
        m = (freqs >= BAND_EDGES[b]) & (freqs < BAND_EDGES[b + 1])
        out[:, b] = mag2[:, m].sum(axis=1)
    return out


def audio_sketch(pcm: np.ndarray, sr: int
                 ) -> tuple[int, np.ndarray]:
    """(fingerprint int64, unit-normalized float32[64] feature vector).

    The fingerprint is signed 64-bit two's complement (stores directly
    in a LongType column); bit i = cell i of the segment-major 8x8
    sign matrix. The feature vector is the PER-SEGMENT-normalized
    energy matrix (each row scaled to sum 1 — gain and envelope
    removed, only spectral shape left), flattened and L2-normalized so
    verification cosine = plain dot product.
    """
    e = band_energies(pcm, sr)
    bits = (e > e.mean(axis=0, keepdims=True)).reshape(-1)
    v = np.uint64(0)
    for i in range(64):
        if bits[i]:
            v |= np.uint64(1) << np.uint64(i)
    shape = e / (e.sum(axis=1, keepdims=True) + 1e-30)
    feat = shape.reshape(-1)
    nrm = np.linalg.norm(feat)
    feat = (feat / nrm if nrm > 0 else feat).astype(np.float32)
    return int(v.astype(np.int64)), feat


def audio_fingerprint64(pcm: np.ndarray, sr: int) -> int:
    return audio_sketch(pcm, sr)[0]
