"""Multi-source BFS (operators/bfs.py) — distances pinned on crafted
graphs, including the shapes that break naive formulations: chains
(many rounds), cycles (shorter path must win), multiple sources
(nearest source wins), and depth exhaustion (must RAISE, never return
truncated distances)."""

import pytest

from datasketches_rust_spark.operators.bfs import (DepthExhausted,
                                                   bfs_distances)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def _srcs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _dist(df):
    return {r.node: r.dist for r in df.collect()}


def test_path_graph_distances(spark):
    # 1-2-3-4-5, source 1: dist = hops along the chain
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert _dist(bfs_distances(e, _srcs(spark, [1]))) == {
        1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_cycle_takes_shorter_arc(spark):
    # 6-cycle, source 1: node 4 is 3 hops either way, node 6 is 1 hop
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1)])
    assert _dist(bfs_distances(e, _srcs(spark, [1]))) == {
        1: 0, 2: 1, 3: 2, 4: 3, 5: 2, 6: 1}


def test_multi_source_nearest_wins(spark):
    # chain 1..7 with sources at both ends: middle meets at dist 3
    e = _edges(spark, [(i, i + 1) for i in range(1, 7)])
    assert _dist(bfs_distances(e, _srcs(spark, [1, 7]))) == {
        1: 0, 2: 1, 3: 2, 4: 3, 5: 2, 6: 1, 7: 0}


def test_unreachable_component_absent(spark):
    e = _edges(spark, [(1, 2), (10, 11)])
    d = _dist(bfs_distances(e, _srcs(spark, [1])))
    assert d == {1: 0, 2: 1}  # 10/11 never appear


def test_depth_exhaustion_raises(spark):
    e = _edges(spark, [(i, i + 1) for i in range(1, 8)])  # 7-hop chain
    with pytest.raises(DepthExhausted):
        bfs_distances(e, _srcs(spark, [1]), max_depth=3)
    # exactly enough depth: must succeed
    d = _dist(bfs_distances(e, _srcs(spark, [1]), max_depth=7))
    assert d[8] == 7
