"""Audio-axis near-dup pipeline: WAV decode -> (64-bit sign code +
8x8 spectral-shape feature) in ONE pass (sketches/audiofp.py) ->
pigeonhole banding on the code (operators/lsh.bucketed_pair_events,
the small-keyspace sizes-JOIN shape) -> JVM dot-product verify on the
features -> connected components. Completes the modality set next to
text (MinHash/LSH), image (phash), and embedding (cosine-LSH/IVF)
dedup.

Scale discipline, inherited from the image/text axes:
- decode + FFT run ONCE per clip in an Arrow-batched mapInPandas at
  the scan; the bytes column never travels past it.
- candidate generation shuffles (id, band_key, afp) rows — 24 bytes —
  through ONE band_key exchange; the triple-slice keyspace (see
  AUDIO_SLICE_TRIPLES for the measured entropy ladder that chose it)
  is small, so this is the sizes-JOIN shape (operators/lsh.py
  docstring), with hot buckets star-degraded.
- the 256-byte feature vectors do NOT ride the band shuffle: the
  Hamming prefilter (bit_count(xor) <= 12, whole-stage codegen) and
  pair-distinct run on 16-byte id pairs first, and features join back
  once for the survivors (the ANN id-only/vectors-rejoin-once
  pattern). Verify = F.aggregate(zip_with(...)) dot product, all-JVM.
- candidate recall: a dup pair collides when all THREE slices of some
  ring combo are flip-free — with dup distance <= ~8 bits spread over
  8 slices, measured truth-pair coverage is 0.9974 direct / 0.9977
  after closure at 60k, 0.9981 at 240k, 1.0 at 2k; pair recall AND
  precision after closure are 1.0 at the 2k gate (verify margin dup
  >= 0.9997 vs colliding-distinct <= 0.876, threshold 0.95).
- CC is one job per round; string clip ids ride as xxhash64 longs
  through the shuffle-heavy middle like image_cluster_assignments.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from datasketches_rust_spark.config import DedupConfig

AUDIO_PREFILTER_HAMMING = 12  # cheap candidate cut; verify decides
AUDIO_VERIFY_COSINE = 0.95    # dup >= 0.9997, distinct <= 0.876

# Candidate keys are TRIPLES of 8-bit code slices (24-bit keys, 24
# ring combos at strides 1/2/3), arrived at by measurement up the
# entropy ladder:
# - single 8-bit slices (one segment's band bits) carry ~6 effective
#   bits: buckets hit 4.6k members at 60k clips and the 573M pair
#   events OOM the per-bucket arrays (bucketed_pair_events
#   materializes ~size^2/2 structs per bucket row before exploding).
# - PAIR keys (16-bit) fix 60k (max bucket 499, 26M events at hot-cap
#   256) but the cap must scale with n to hold recall — measured at
#   240k: cap 256 drops coverage to 0.9229 (pipeline recall 0.926),
#   and the cap (937) that restores 0.9993 costs 385M cold events.
#   That's the n^2 wall arriving at 10^5.5.
# - TRIPLE keys (~18 effective bits) push the wall out: at 240k,
#   coverage 0.9981 with 61M events and ZERO star-degraded buckets at
#   cap 256; at 60k, 0.9974 direct / 0.9977 after closure with 4.2M
#   events (6x cheaper than pairs). 24 ring combos are the knee (all
#   56 triples: 0.9997 for 2.3x the volume and rows).
# Honest scale note: clip-LEVEL codes cap out around ~30 bits of
# entropy, so candidate volume still grows ~n^2/2^18 — web-scale
# audio matching wants frame-level sub-fingerprints with an inverted
# index (Haitsma-Kalker's original design); the clip-dedup axis here
# targets corpus dedup through the 10^6-10^7 clip range.
AUDIO_SLICE_TRIPLES = (
    [(i, (i + 1) % 8, (i + 2) % 8) for i in range(8)]
    + [(i, (i + 2) % 8, (i + 4) % 8) for i in range(8)]
    + [(i, (i + 3) % 8, (i + 6) % 8) for i in range(8)])

# Hot-bucket cap: with triple keys no 240k bucket reaches it (max
# bucket < 256 measured); it guards pathological skew (e.g. a corpus
# of near-identical clips, where star degrade + verify is the right
# collapse) rather than shaping routine volume.
AUDIO_MAX_BUCKET = 256

def audio_sketch_table(clips: DataFrame, id_col: str = "clip_id",
                       bytes_col: str = "bytes") -> DataFrame:
    """DataFrame[id_col, afp, feat] — decode + FFT once per clip,
    tracked-persisted and materialized with one count() (the AQE
    fan-out hazard: the band self-join consumes this in multiple
    subtrees; without the eager single-job materialization, concurrent
    leaf stages serialize on per-partition cache locks while holding
    task slots)."""
    from datasketches_rust_spark.cache import track

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datasketches_rust_spark.multimodal import _decode_audio
        from datasketches_rust_spark.sketches.audiofp import audio_sketch
        for pdf in batches:
            ids = pdf["__aid"].to_numpy()
            fps = np.empty(len(pdf), dtype=np.int64)
            feats = []
            for j, buf in enumerate(pdf["__b"]):
                pcm, sr = _decode_audio(bytes(buf))
                fp, ft = audio_sketch(pcm, sr)
                fps[j] = fp
                feats.append(ft)
            yield pd.DataFrame({"__aid": ids, "afp": fps,
                                "feat": feats})

    id_type = dict(clips.dtypes)[id_col]
    sk = (clips.select(F.col(id_col).alias("__aid"),
                       F.col(bytes_col).alias("__b"))
          .mapInPandas(
              run,
              schema=f"__aid {id_type}, afp long, feat array<float>")
          .withColumnRenamed("__aid", id_col))
    sk = track(sk)
    sk.count()
    return sk


def _audio_bands(sk: DataFrame, id_col: str,
                 combos: list[tuple[int, int, int]] | None = None
                 ) -> DataFrame:
    """Explode the 64-bit code into triple-slice band keys (default:
    the clip pipeline's 24 ring combos) — JVM bit slicing, injective
    via the combo index in the key's high bits."""
    combos = combos if combos is not None else AUDIO_SLICE_TRIPLES
    slices = [F.shiftrightunsigned(F.col("afp"), 8 * b)
              .bitwiseAND(F.lit(255)) for b in range(8)]
    keys = [(F.lit(ci << 24) + slices[a]
             + F.shiftleft(slices[b], 8)
             + F.shiftleft(slices[c], 16))
            for ci, (a, b, c) in enumerate(combos)]
    return sk.select(F.col(id_col).alias("__id"), F.col("afp"),
                     F.explode(F.array(*keys)).alias("band_key"))


def audio_edges(sk: DataFrame, id_col: str = "clip_id",
                max_bucket_size: int = AUDIO_MAX_BUCKET) -> DataFrame:
    """DataFrame[id_a, id_b] — verified near-dup clip pairs from a
    sketch table (audio_sketch_table output)."""
    from datasketches_rust_spark.operators.lsh import bucketed_pair_events

    ex = _audio_bands(sk, id_col)
    cand = bucketed_pair_events(ex, max_bucket_size, payload="afp")
    ham = F.bit_count(F.col("afp_a").bitwiseXOR(F.col("afp_b")))
    pairs = (cand.where(ham <= AUDIO_PREFILTER_HAMMING)
             .select("id_a", "id_b").distinct())
    fa = sk.select(F.col(id_col).alias("id_a"),
                   F.col("feat").alias("__fa"))
    fb = sk.select(F.col(id_col).alias("id_b"),
                   F.col("feat").alias("__fb"))
    dot = F.aggregate(
        F.zip_with("__fa", "__fb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"))
    return (pairs.join(fa, "id_a").join(fb, "id_b")
            .where(dot >= AUDIO_VERIFY_COSINE)
            .select("id_a", "id_b"))


def audio_cluster_assignments(clips: DataFrame, cfg: DedupConfig
                              | None = None, id_col: str = "clip_id"
                              ) -> DataFrame:
    """DataFrame[clip_id, cluster_id(string)] — cluster_id = min member
    clip_id; singletons map to themselves (never enter the iteration)."""
    from datasketches_rust_spark.operators.connected_components import (
        assign_clusters,
        assign_clusters_string_ids,
    )

    if dict(clips.dtypes)[id_col] == "string":
        return assign_clusters_string_ids(
            clips,
            lambda lclips: audio_edges(
                audio_sketch_table(lclips, "__lid"), "__lid"),
            id_col)
    sk = audio_sketch_table(clips, id_col)
    edges = audio_edges(sk, id_col)
    return assign_clusters(clips.select(F.col(id_col)), edges,
                           id_col=id_col)


# ---------------------------------------------------------------------------
# Frame-level sub-fingerprint pipeline (round 4)
# ---------------------------------------------------------------------------
# The clip-level pipeline above honestly documents its two limits:
# ~30 bits of clip-code entropy (candidate volume ~n^2/2^18 past
# 10^6-10^7 clips) and zero time-shift invariance. This is the
# Haitsma-Kalker frame-level design that removes both, wired through
# the VIDEO pipeline's exact machinery (per-frame 64-bit code ->
# simhash banding -> temporal vote >= k distinct matched frames ->
# CC):
#   - candidate volume is LINEAR-BOUNDED by construction (the ladder
#     in tools/audio_frames_probe.py measures it): matching is
#     two-tier over CODES, not frames. The exact tier is an inverted
#     index on the full 64-bit code restricted to INFORMATIVE codes
#     (clip-df <= AUDIO_FRAME_CODE_DF_CAP — the text LSH's hot-gram
#     df-cap: a code shared by hundreds of clips identifies nothing
#     and would be the volume). The near tier (noise dups whose
#     frames flip a few bits) bands only the DISTINCT informative
#     code table with the clip pipeline's measured triple-slice
#     24-bit keys and a hard star cap, so its event count is
#     <= n_distinct_codes x cap x combos — linear, with the star
#     recall tax measured end-to-end, not assumed. (A first draft
#     banded raw FRAME rows with 16-bit slices, the video shape
#     verbatim — measured ~5.5 effective bits/slice on this content
#     and 20M pair events at just 4k clips, a quadratic curve; codes,
#     not frames, are the right candidate universe.)
#   - a trimmed/shifted copy aligns at hop granularity (32 ms) and
#     matches most surviving frames bit-for-bit, which the clip code
#     cannot (tests pin that clip-level edges MISS the trimmed dups
#     this pipeline finds);
#   - a shared intro (the fixture's 3-note hard negative) stays under
#     the fractional quorum, exactly like the video pipeline's
#     shared-intro-frame discipline — see the quorum constants below
#     for the measured margins that forced a FRACTION, not a flat
#     count.
# Frame rows are (xxhash64(clip, idx), code) 16-byte shuffle rows; the
# vote aggregates distinct matched frame indices of the SMALLER clip
# (a frame matching several frames of the other clip is ONE match —
# the 75% overlap makes neighbor frames of a dup pair collide too,
# which must not inflate the vote).

AUDIO_FRAME_HAMMING = 3      # per-frame near-dup gate
# The vote is a FRACTIONAL QUORUM, not a flat count: a pair links when
# the distinct matched frames of the vote-side clip reach
# max(AUDIO_MIN_FRAME_MATCHES, ceil(AUDIO_FRAME_QUORUM * its frame
# count)). A flat >= 4 is not enough: two DISTINCT clips that both
# copy the same 3-note intro (the fixture's hard-negative pairs with a
# shared base) share an IDENTICAL leading 1500 samples with each other
# and measure up to exactly 4 matched frames — while real dups match
# >= 8 of 8-12. "Half the shorter clip's content matches" is also the
# honest dup semantics (containment), where "some intro matches" is
# not. Measured margins: shared-intro pairs <= 4 votes vs quorum 6 (12
# frames); trimmed dups 8-11 matches vs quorum 4-6.


def audio_frame_sketches(clips: DataFrame, id_col: str = "clip_id",
                         bytes_col: str = "bytes") -> DataFrame:
    """DataFrame[id_col, frame_idx, fcode] — decode + framed FFT in ONE
    Arrow pass; bytes never travel past the scan (the video
    frame-sketch discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from datasketches_rust_spark.multimodal import _decode_audio
        from datasketches_rust_spark.sketches.audiofp import (
            audio_frame_codes)
        for pdf in batches:
            ids, idxs, codes = [], [], []
            for cid, buf in zip(pdf["__aid"], pdf["__b"]):
                pcm, sr = _decode_audio(bytes(buf))
                cs = audio_frame_codes(pcm, sr)
                ids.extend([cid] * len(cs))
                idxs.extend(range(len(cs)))
                codes.append(cs)
            out = (np.concatenate(codes) if codes
                   else np.empty(0, dtype=np.int64))
            yield pd.DataFrame({"__aid": ids, "frame_idx": idxs,
                                "fcode": out})

    id_type = dict(clips.dtypes)[id_col]
    return (clips.select(F.col(id_col).alias("__aid"),
                         F.col(bytes_col).alias("__b"))
            .mapInPandas(
                run,
                schema=f"__aid {id_type}, frame_idx int, fcode long")
            .withColumnRenamed("__aid", id_col))


AUDIO_MIN_FRAME_MATCHES = 4   # quorum floor (very short clips)
AUDIO_FRAME_QUORUM = 0.5      # fraction of the vote-side clip's frames
AUDIO_FRAME_CODE_DF_CAP = 64  # max clips per code to stay informative
AUDIO_FRAME_BUCKET_CAP = 32   # near-tier star cap (per band bucket)
# The frame near tier uses only the 8 STRIDE-1 ring triples (the clip
# pipeline keeps all 24): per-frame candidate recall is allowed to dip
# because the QUORUM gives each clip pair ~12 independent frame
# chances and needs only half — measured end-to-end on the ladder
# (AUDIO_FRAMES_LADDER_r04.json): recall 1.0 / 1.0 / 0.9994 / 0.99622
# at 4k/15k/60k/240k (target >= 0.99) for 3.2x less band volume and
# 2.5x lower wall at 240k; the 24-combo form (pass
# combos=AUDIO_SLICE_TRIPLES) buys 0.9996 at 240k for that cost.
# Adversarial 3-flip placements that defeat all 8 consecutive triples
# exist (flips at slice distance 3) but are rare under the measured
# 0-5 random flips, and a single frame miss costs 1 vote, not the
# pair.
AUDIO_FRAME_SLICE_COMBOS = AUDIO_SLICE_TRIPLES[:8]


def _code_match_table(frames: DataFrame) -> DataFrame:
    """DataFrame[c1, c2] — the symmetric code-match relation over
    INFORMATIVE codes: identity (exact tier) plus Hamming <=
    AUDIO_FRAME_HAMMING pairs from triple-slice banding of the
    DISTINCT code table (near tier). ``frames`` must have columns
    (__c clip, fcode)."""
    from datasketches_rust_spark.operators.lsh import bucketed_pair_events

    clip_df = (frames.select("__c", "fcode").distinct()
               .groupBy("fcode").agg(F.count("*").alias("__ncl")))
    info = (clip_df.where(F.col("__ncl") <= AUDIO_FRAME_CODE_DF_CAP)
            .select("fcode"))
    # near tier: distinct informative codes, clip-ladder triple keys
    d2 = info.select(F.col("fcode").alias("__code"),
                     F.col("fcode").alias("afp"))
    ex = _audio_bands(d2, "__code", combos=AUDIO_FRAME_SLICE_COMBOS)
    cand = bucketed_pair_events(ex, AUDIO_FRAME_BUCKET_CAP,
                                payload="afp")
    ham = F.bit_count(F.col("afp_a").bitwiseXOR(F.col("afp_b")))
    near = (cand.where(ham <= AUDIO_FRAME_HAMMING)
            .select(F.col("id_a").alias("c1"),
                    F.col("id_b").alias("c2")).distinct())
    ident = info.select(F.col("fcode").alias("c1"),
                        F.col("fcode").alias("c2"))
    return (near
            .unionAll(near.select(F.col("c2").alias("c1"),
                                  F.col("c1").alias("c2")))
            .unionAll(ident))


def audio_frame_edges(clips: DataFrame, id_col: str = "clip_id",
                      min_frame_matches: int = AUDIO_MIN_FRAME_MATCHES,
                      quorum: float = AUDIO_FRAME_QUORUM) -> DataFrame:
    """DataFrame[id_a, id_b] — clip pairs whose distinct matched
    INFORMATIVE frames reach the fractional quorum (see the constants'
    comment; id_col must be LONG — string ids map through xxhash64 in
    audio_frame_cluster_assignments). The vote side is the least-id
    clip and the quorum scales with ITS informative-frame count, so
    trimming the copy lowers its own bar; clips made entirely of
    over-popular codes produce no votes (nothing about them is
    identifying — documented df-cap semantics, the idf limit)."""
    from datasketches_rust_spark.cache import track

    fr = audio_frame_sketches(clips, id_col)
    frames = fr.select(F.col(id_col).alias("__c"),
                       F.col("frame_idx").alias("__k"), "fcode")
    frames = track(frames)
    frames.count()  # materialize before the two-tier fan-out
    m = _code_match_table(frames)
    # informative frames of the vote side + their per-clip counts
    fin = frames.join(m.select(F.col("c1").alias("fcode")).distinct(),
                      "fcode")
    nf = fin.groupBy(F.col("__c").alias("__cn")).agg(
        F.count_distinct("__k").alias("__nf"))
    # vote join: a frame (clip A, k, code) matches clip B when some
    # code of B relates to it in m — volume is frames x matched codes
    # x clips-per-code, every factor df-capped
    right = (frames.select(F.col("__c").alias("__cb"), "fcode")
             .distinct()
             .select(F.col("__cb"), F.col("fcode").alias("c2")))
    votes = (fin.join(m, fin["fcode"] == m["c1"])
             .join(right, "c2")
             .where(F.col("__c") < F.col("__cb"))
             .groupBy(F.col("__c").alias("id_a"),
                      F.col("__cb").alias("id_b"))
             .agg(F.count_distinct("__k").alias("__n")))
    need = F.greatest(F.lit(min_frame_matches),
                      F.ceil(F.col("__nf") * quorum))
    return (votes.join(nf, votes["id_a"] == nf["__cn"])
            .where(F.col("__n") >= need)
            .select("id_a", "id_b"))


def audio_frame_cluster_assignments(clips: DataFrame,
                                    id_col: str = "clip_id") -> DataFrame:
    """DataFrame[clip_id, cluster_id(string)] — min member clip_id;
    singletons map to themselves (the video pipeline's id plumbing)."""
    from datasketches_rust_spark.operators.connected_components import (
        assign_clusters,
        assign_clusters_string_ids,
    )

    if dict(clips.dtypes)[id_col] == "string":
        return assign_clusters_string_ids(
            clips,
            lambda lclips: audio_frame_edges(
                lclips.select("__lid", "bytes"), "__lid"),
            id_col)
    edges = audio_frame_edges(clips, id_col)
    return assign_clusters(clips.select(F.col(id_col)), edges,
                           id_col=id_col)
