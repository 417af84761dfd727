"""Video axis: container round-trip, frame-sketch parity with the
numpy kernel, temporal-vote semantics (intro-sharing negatives must not
connect), and the pipeline recall/precision gate vs planted truth."""

from collections import defaultdict

import numpy as np

from datasketches_rust_spark.pipeline_video import (
    VIDEO_MIN_FRAME_MATCHES,
    video_cluster_assignments,
    video_frame_sketches,
)
from datasketches_rust_spark.sources.phash import phash64
from datasketches_rust_spark.sources.video import (
    _frames,
    generate_videos,
    video_spark_df,
)


def test_frame_sketches_match_numpy_kernel(spark):
    local = generate_videos(30, seed=42)[0]
    df = spark.createDataFrame(
        local, schema="video_id string, bytes binary, n_frames int")
    got = defaultdict(dict)
    for r in video_frame_sketches(df).collect():
        got[r.video_id][r.frame_idx] = r.phash
    from datasketches_rust_spark.pipeline_video import _decode_frame
    for r in local.itertuples():
        buf = bytes(r.bytes)
        pos, idx = 0, 0
        while pos + 4 <= len(buf):
            ln = int(np.frombuffer(buf, "<u4", 1, pos)[0])
            frame = buf[pos + 4:pos + 4 + ln]
            assert got[r.video_id][idx] == phash64(_decode_frame(frame))
            pos += 4 + ln
            idx += 1
        assert len(got[r.video_id]) == r.n_frames


def test_adjacent_frames_not_near_dups():
    # the motion step must exceed the per-frame Hamming gate, or a
    # video would self-match every other video through static frames
    phs = [phash64(f) for f in _frames(42, 5)]
    hams = [bin(phs[k] ^ phs[k + 1]).count("1")
            for k in range(len(phs) - 1)]
    assert min(hams) > 3


def test_pipeline_recall_precision_and_hard_negative(spark):
    vids, truth = video_spark_df(spark, 1000, seed=42)
    got = video_cluster_assignments(vids).collect()
    t = {r.video_id: r.cluster_id for r in truth.collect()}
    g = {r.video_id: r.cluster_id for r in got}
    assert set(t) == set(g)
    tc, gc = defaultdict(set), defaultdict(set)
    for k, v in t.items():
        tc[v].add(k)
    for k, v in g.items():
        gc[v].add(k)
    tp = {frozenset((a, b)) for m in tc.values()
          for a in m for b in m if a < b}
    gp = {frozenset((a, b)) for m in gc.values()
          for a in m for b in m if a < b}
    inter = len(tp & gp)
    assert inter / len(tp) >= 0.99
    assert inter / max(len(gp), 1) >= 0.99
    # hard negatives (intro-sharing) are singletons in truth; the vote
    # threshold must keep them singletons in the prediction too
    singles_t = {next(iter(m)) for m in tc.values() if len(m) == 1}
    merged = [c for c in singles_t if len(gc[g[c]]) > 1]
    assert not merged
    assert VIDEO_MIN_FRAME_MATCHES > 1  # one shared frame never connects
