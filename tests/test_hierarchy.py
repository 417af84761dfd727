"""operators/hierarchy.py pinned on hand-built trees: doubling depth
coverage on a pure chain, subtree sums on an asymmetric tree, forest
(multi-root) handling, and the cycle/exhaustion raise."""

import pytest

from datasketches_rust_spark.operators.connected_components import (
    ConvergenceError,
)
from datasketches_rust_spark.operators.hierarchy import (
    ancestor_closure,
    tree_rollup,
)


def _parents(spark, edges):
    return spark.createDataFrame(edges, "node long, parent long")


def test_chain_closure_depth_beyond_round_count(spark):
    # chain 1<-2<-...<-12: depth 11 must close in <=4 doubling rounds
    clo = ancestor_closure(
        _parents(spark, [(i, i - 1) for i in range(2, 13)]))
    got = {(r.node, r.anc) for r in clo.collect()}
    expect = {(n, a) for n in range(2, 13) for a in range(1, n)}
    assert got == expect


def test_rollup_asymmetric_tree(spark):
    #        1
    #       / \
    #      2   3
    #     / \
    #    4   5
    parents = _parents(spark, [(2, 1), (3, 1), (4, 2), (5, 2)])
    values = spark.createDataFrame(
        [(1, 100), (2, 10), (3, 20), (4, 1), (5, 2)],
        "node long, value long")
    got = {r.anc: (r.n_nodes, r.total)
           for r in tree_rollup(parents, values).collect()}
    assert got == {1: (5, 133), 2: (3, 13), 3: (1, 20),
                   4: (1, 1), 5: (1, 2)}


def test_forest_roots_do_not_cross(spark):
    parents = _parents(spark, [(2, 1), (20, 10)])
    clo = {(r.node, r.anc) for r in
           ancestor_closure(parents).collect()}
    assert clo == {(2, 1), (20, 10)}


def test_cycle_raises(spark):
    with pytest.raises(ConvergenceError):
        ancestor_closure(_parents(spark, [(1, 2), (2, 1)]),
                         max_rounds=4)
