"""Video-axis near-dup pipeline — the 5th modality: container split ->
per-frame decode + DCT phash in one Arrow pass -> frame-level phash
banding (the image axis' simhash_pairs, unchanged) -> FRAME-OVERLAP
VOTE (videos sharing >= min_frame_matches near-dup frames) ->
connected components.

Temporal voting is what distinguishes video dedup from running image
dedup per frame: a single shared frame (channel intro/outro — the
fixture's hard negative) must NOT connect two videos, while a trimmed
or re-encoded copy (sharing most frames at phash Hamming <= 3) must.
Measured on the fixture: dup pairs share >= 6 of 8 frames, hard
negatives exactly 1, random distinct <= 1 — the >= 4 threshold sits in
a wide margin (sources/video.py).

Scale shape: bytes die at the frame-sketch scan (the one Arrow pass:
split + magic-sniff decode + phash, exploding 1 video row -> n_frames
16-byte sketch rows); frame ids are xxhash64(video_id, frame_idx)
longs, so the frame-level banding shuffles the same 16-byte rows as
the image axis; the vote is a (va, vb)-keyed count-distinct aggregate
over frame-pair edges (bounded by matched frames, never frames^2); CC
is one job per round. The frame-id -> video-id map rides WITH the
frame rows into the pair generation (simhash_pairs' payload column),
so no post-hoc fid->vid join is needed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

VIDEO_FRAME_HAMMING = 3    # per-frame near-dup gate (the image axis')
VIDEO_MIN_FRAME_MATCHES = 4  # dups >= 6, intro-sharing negatives = 1

_PNG_MAGIC = b"\x89PNG"


def _decode_frame(buf: bytes) -> np.ndarray:
    from datasketches_rust_spark.sources.codec import (decode_jpeg,
                                                       decode_png)
    if buf[:4] == _PNG_MAGIC:
        return decode_png(buf)
    return decode_jpeg(buf)


def video_frame_sketches(videos: DataFrame, id_col: str = "video_id",
                         bytes_col: str = "bytes") -> DataFrame:
    """DataFrame[video_id, frame_idx, phash] — split + decode + phash
    in ONE Arrow pass; the bytes column never travels past it."""
    from datasketches_rust_spark.sources.phash import phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids, idxs, phs = [], [], []
            # itertuples mangles dunder-prefixed names — index columns
            for vid, raw in zip(pdf["__vid"], pdf["__b"]):
                buf = bytes(raw)
                pos, idx = 0, 0
                while pos + 4 <= len(buf):
                    ln = int(np.frombuffer(buf, "<u4", 1, pos)[0])
                    frame = buf[pos + 4:pos + 4 + ln]
                    if frame:
                        vids.append(vid)
                        idxs.append(idx)
                        phs.append(phash64(_decode_frame(frame)))
                    pos += 4 + ln
                    idx += 1
            yield pd.DataFrame({"__vid": vids, "frame_idx": idxs,
                                "phash": np.array(phs, dtype=np.int64)})

    id_type = dict(videos.dtypes)[id_col]
    return (videos.select(F.col(id_col).alias("__vid"),
                          F.col(bytes_col).alias("__b"))
            .mapInPandas(
                run,
                schema=f"__vid {id_type}, frame_idx int, phash long")
            .withColumnRenamed("__vid", id_col))


def video_edges(videos: DataFrame, id_col: str = "video_id",
                min_frame_matches: int = VIDEO_MIN_FRAME_MATCHES
                ) -> DataFrame:
    """DataFrame[id_a, id_b] — video pairs sharing >= min_frame_matches
    near-dup frames. id_col must be LONG here (the pipeline maps string
    ids through xxhash64 first)."""
    from datasketches_rust_spark.cache import track
    from datasketches_rust_spark.operators.visual import simhash_pairs

    fr = video_frame_sketches(videos, id_col)
    frames = fr.select(
        F.xxhash64(F.col(id_col), F.col("frame_idx")).alias("__fid"),
        F.col("phash"),
        F.col(id_col).alias("__v"), F.col("frame_idx").alias("__k"))
    frames = track(frames)
    frames.count()  # materialize: 3 consumers in simhash_pairs + 2 maps
    fpairs = simhash_pairs(frames.select("__fid", "phash"),
                           "__fid", "phash",
                           max_hamming=VIDEO_FRAME_HAMMING)
    # frame-id -> (video, frame_idx) rejoin, once per side (the ANN
    # id-only/rejoin-once pattern; the map is the cached sketch table)
    ma = frames.select(F.col("__fid").alias("id_a"),
                       F.col("__v").alias("__va"),
                       F.col("__k").alias("__ka"))
    mb = frames.select(F.col("__fid").alias("id_b"),
                       F.col("__v").alias("__vb"),
                       F.col("__k").alias("__kb"))
    va, vb = F.col("__va"), F.col("__vb")
    return (fpairs.select("id_a", "id_b")
            .join(ma, "id_a").join(mb, "id_b")
            .where(va != vb)
            .select(F.least(va, vb).alias("id_a"),
                    F.greatest(va, vb).alias("id_b"),
                    # vote = distinct matched frames of the SMALLER
                    # video (a frame matching several frames of the
                    # other video is ONE match)
                    F.when(va < vb, F.col("__ka"))
                    .otherwise(F.col("__kb")).alias("__kk"))
            .groupBy("id_a", "id_b")
            .agg(F.count_distinct("__kk").alias("__n"))
            .where(F.col("__n") >= min_frame_matches)
            .select("id_a", "id_b"))


def video_cluster_assignments(videos: DataFrame,
                              id_col: str = "video_id") -> DataFrame:
    """DataFrame[video_id, cluster_id(string)] — min member video_id;
    singletons map to themselves."""
    from datasketches_rust_spark.operators.connected_components import (
        assign_clusters,
        assign_clusters_string_ids,
    )

    if dict(videos.dtypes)[id_col] == "string":
        return assign_clusters_string_ids(
            videos,
            lambda lvids: video_edges(
                lvids.select("__lid", "bytes"), "__lid"),
            id_col)
    edges = video_edges(videos, id_col)
    return assign_clusters(videos.select(F.col(id_col)), edges,
                           id_col=id_col)
