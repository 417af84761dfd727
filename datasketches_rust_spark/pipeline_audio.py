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


def _audio_bands(sk: DataFrame, id_col: str) -> DataFrame:
    """Explode the 64-bit code into 24 triple-slice band keys — JVM
    bit slicing, injective via the combo index in the key's high
    bits."""
    slices = [F.shiftrightunsigned(F.col("afp"), 8 * b)
              .bitwiseAND(F.lit(255)) for b in range(8)]
    keys = [(F.lit(ci << 24) + slices[a]
             + F.shiftleft(slices[b], 8)
             + F.shiftleft(slices[c], 16))
            for ci, (a, b, c) in enumerate(AUDIO_SLICE_TRIPLES)]
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
        connected_components,
    )

    if dict(clips.dtypes)[id_col] == "string":
        lclips = clips.withColumn("__lid", F.xxhash64(F.col(id_col)))
        sk = audio_sketch_table(lclips, "__lid")
        edges = audio_edges(sk, "__lid")
        cc = connected_components(edges, None, id_col="__lid")
        idmap = clips.select(F.col(id_col),
                             F.xxhash64(F.col(id_col)).alias("__lid"))
        members = (cc.join(idmap, "__lid")
                   .select(F.col(id_col), F.col("cluster_id").alias("__cl")))
        reps = members.groupBy("__cl").agg(
            F.min(id_col).alias("cluster_id"))
        assigned = members.join(reps, "__cl").select(id_col, "cluster_id")
        return (clips.select(F.col(id_col))
                .join(assigned, id_col, "left")
                .withColumn("cluster_id",
                            F.coalesce(F.col("cluster_id"), F.col(id_col)))
                .select(id_col, "cluster_id"))
    sk = audio_sketch_table(clips, id_col)
    edges = audio_edges(sk, id_col)
    return assign_clusters(clips.select(F.col(id_col)), edges,
                           id_col=id_col)
