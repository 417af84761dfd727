"""Deterministic synthetic audio-clip fixture (the audio axis of the
multimodal dedup surface; same design as sources/images.py F1).

Schema: (clip_id string, bytes binary, sr int, n_samples long) — real
RIFF/WAVE PCM16 payloads (sources of truth: multimodal.encode_wav /
decode_wav round-trip, tested). Fully seeded, no time/order
dependence; generation is embarrassingly parallel (plan broadcast,
every row keyed by (seed, row_index), mapInPandas over spark.range).

Base clips: 0.5 s at 8 kHz — an 8-NOTE melody (each note a sine at
150–3400 Hz with its own amplitude/phase, spanning 1/8 of the clip),
normalized to 0.8 peak. Melodic (time-varying) content is the honest
choice: a stationary tone mixture makes every segment spectrally
identical, collapsing the fingerprint's temporal axis to the shared
envelope — distinct clips then collide (measured: stationary fixture
had distinct pairs at Hamming 0; the melodic one sits at ~25-32).
Duplicate roles reuse images.plan_clusters verbatim, reinterpreted for
audio:
  exact   — identical bytes, new clip_id
  visual  — GAIN (x0.25–0.8) or additive noise (sigma 0.5–2% of peak):
            the perturbations the fingerprint must absorb
  caption — RESAMPLE to 16 kHz (linear interp) — same content, new
            sample rate
  hard_negative — distinct clip SHARING its first tone with the
            previous base (spectral overlap without being a dup)
Ground truth (clip_id, cluster_id = seed row index) emitted alongside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from datasketches_rust_spark.multimodal import encode_wav, resample_audio
from datasketches_rust_spark.sources.images import plan_clusters

BASE_SR = 8000
CLIP_SECONDS = 0.5


def _row_rng(seed: int, i: int, salt: int) -> np.random.Generator:
    return np.random.default_rng(np.random.PCG64([seed, salt, i]))


N_NOTES = 8


def _notes(seed: int, i: int) -> np.ndarray:
    """(N_NOTES, 3) array of (freq, amp, phase) rows for clip i."""
    rng = _row_rng(seed, i, 11)
    return np.column_stack([rng.uniform(150.0, 3400.0, N_NOTES),
                            rng.uniform(0.3, 1.0, N_NOTES),
                            rng.uniform(0.0, 2 * np.pi, N_NOTES)])


def _base_pcm(seed: int, i: int, share_tone_of: int | None = None
              ) -> np.ndarray:
    n = int(BASE_SR * CLIP_SECONDS)
    t = np.arange(n, dtype=np.float64) / BASE_SR
    notes = _notes(seed, i)
    if share_tone_of is not None:
        notes[0] = _notes(seed, share_tone_of)[0]
    seg = n // N_NOTES
    x = np.zeros(n)
    for k, (f, a, ph) in enumerate(notes):
        s = slice(k * seg, (k + 1) * seg if k < N_NOTES - 1 else n)
        x[s] = a * np.sin(2 * np.pi * f * t[s] + ph)
    peak = np.max(np.abs(x))
    return x / peak * 0.8 if peak > 0 else x


def materialize_clips(indices, plan: list[tuple[str, int]],
                      seed: int) -> pd.DataFrame:
    rows = []
    for i in indices:
        kind, base = plan[i]
        sr = BASE_SR
        if kind in ("base", "single"):
            pcm = _base_pcm(seed, i)
        elif kind == "hard_negative":
            pcm = _base_pcm(seed, i, share_tone_of=base)
        elif kind == "exact":
            pcm = _base_pcm(seed, base)
        elif kind == "visual":  # gain or noise
            pcm = _base_pcm(seed, base)
            rng = _row_rng(seed, i, 13)
            if rng.random() < 0.5:
                pcm = pcm * rng.uniform(0.25, 0.8)
            else:
                pcm = pcm + rng.normal(0.0, rng.uniform(0.004, 0.016),
                                       pcm.size)
        elif kind == "caption":  # resample
            pcm = resample_audio(_base_pcm(seed, base), BASE_SR, 16000)
            sr = 16000
        else:  # pragma: no cover
            raise AssertionError(kind)
        buf = encode_wav(pcm, sr)
        cluster = base if kind in ("base", "exact", "visual",
                                  "caption") else i
        rows.append((f"clip_{i:010d}", buf, sr, pcm.size, int(cluster)))
    return pd.DataFrame(rows, columns=["clip_id", "bytes", "sr",
                                       "n_samples", "cluster_id"])


def generate_clips(n_rows: int, seed: int = 42, dup_rate: float = 0.30
                   ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Single-node convenience: (clips_df, truth_df)."""
    plan = plan_clusters(n_rows, seed, dup_rate)
    full = materialize_clips(range(n_rows), plan, seed)
    truth = full[["clip_id", "cluster_id"]].copy()
    return full.drop(columns="cluster_id"), truth


AUDIO_SCHEMA = "clip_id string, bytes binary, sr int, n_samples long"


def audio_spark_df(spark, n_rows: int, seed: int = 42,
                   dup_rate: float = 0.30, partitions: int | None = None):
    """(clips DataFrame, truth DataFrame), synthesized in parallel."""
    plan = plan_clusters(n_rows, seed, dup_rate)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield materialize_clips(pdf["id"].to_numpy(), plan, seed)

    base = spark.range(0, n_rows, numPartitions=parts)
    full = base.mapInPandas(gen, schema=AUDIO_SCHEMA + ", cluster_id long")
    return full.drop("cluster_id"), full.select("clip_id", "cluster_id")


# ---------------------------------------------------------------------------
# Frame-axis fixture (round 4): time-SHIFTED dups + shared-intro
# negatives
# ---------------------------------------------------------------------------
# The clip-level fixture above cannot represent the one perturbation
# clip-level codes are blind to: TRIMMING/time shift (a trimmed copy's
# 8 fixed time segments slide across different content, scrambling the
# clip code). This plan reinterprets plan_clusters' roles for the
# frame-level pipeline:
#   exact    — identical bytes
#   visual   — gain or noise (absorbed per frame exactly like per clip)
#   caption  — TRIM: drop k in 1..4 hops (32 ms each) from the start,
#              optionally with gain — the new capability; the surviving
#              frames align at hop granularity with the base's frames
#              k.. and match bit-for-bit (audio_frame_codes contract)
#   hard_negative — distinct clip sharing its first THREE notes with
#              the base: the first ~2 frames match exactly, which MUST
#              stay below the temporal-vote threshold (the video
#              pipeline's shared-intro-frame discipline)
AUDIO_FRAME_HOP_SAMPLES = int(0.032 * BASE_SR)  # keep == audiofp hop


def _base_pcm_shared_intro(seed: int, i: int, base: int,
                           n_notes: int = 3) -> np.ndarray:
    """Distinct clip whose first n_notes (freq, amp, phase) rows are
    copied from the base's melody — an identical intro, different
    body."""
    n = int(BASE_SR * CLIP_SECONDS)
    t = np.arange(n, dtype=np.float64) / BASE_SR
    notes = _notes(seed, i)
    notes[:n_notes] = _notes(seed, base)[:n_notes]
    seg = n // N_NOTES
    x = np.zeros(n)
    for k, (f, a, ph) in enumerate(notes):
        s = slice(k * seg, (k + 1) * seg if k < N_NOTES - 1 else n)
        x[s] = a * np.sin(2 * np.pi * f * t[s] + ph)
    peak = np.max(np.abs(x))
    return x / peak * 0.8 if peak > 0 else x


def materialize_clips_frameset(indices, plan: list[tuple[str, int]],
                               seed: int) -> pd.DataFrame:
    rows = []
    for i in indices:
        kind, base = plan[i]
        sr = BASE_SR
        if kind in ("base", "single"):
            pcm = _base_pcm(seed, i)
        elif kind == "hard_negative":
            pcm = _base_pcm_shared_intro(seed, i, base)
        elif kind == "exact":
            pcm = _base_pcm(seed, base)
        elif kind == "visual":  # gain or noise, as the clip fixture
            pcm = _base_pcm(seed, base)
            rng = _row_rng(seed, i, 13)
            if rng.random() < 0.5:
                pcm = pcm * rng.uniform(0.25, 0.8)
            else:
                pcm = pcm + rng.normal(0.0, rng.uniform(0.004, 0.016),
                                       pcm.size)
        elif kind == "caption":  # TRIM k hops (+ sometimes gain)
            rng = _row_rng(seed, i, 17)
            k = int(rng.integers(1, 5))
            pcm = _base_pcm(seed, base)[k * AUDIO_FRAME_HOP_SAMPLES:]
            if rng.random() < 0.5:
                pcm = pcm * rng.uniform(0.4, 0.9)
        else:  # pragma: no cover
            raise AssertionError(kind)
        buf = encode_wav(pcm, sr)
        cluster = base if kind in ("base", "exact", "visual",
                                   "caption") else i
        rows.append((f"clip_{i:010d}", buf, sr, pcm.size, int(cluster)))
    return pd.DataFrame(rows, columns=["clip_id", "bytes", "sr",
                                       "n_samples", "cluster_id"])


def audio_frames_spark_df(spark, n_rows: int, seed: int = 42,
                          dup_rate: float = 0.30,
                          partitions: int | None = None):
    """(clips DataFrame, truth DataFrame) for the frame-level fixture,
    synthesized in parallel (same contract as audio_spark_df)."""
    plan = plan_clusters(n_rows, seed, dup_rate)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield materialize_clips_frameset(pdf["id"].to_numpy(), plan,
                                             seed)

    base = spark.range(0, n_rows, numPartitions=parts)
    full = base.mapInPandas(gen, schema=AUDIO_SCHEMA + ", cluster_id long")
    return full.drop("cluster_id"), full.select("clip_id", "cluster_id")
