"""Single-node numpy oracle — "reference clusters" for the recall>=0.99
gate (FIXTURES.md §F3).

Runs the *identical* shingle/signature config through the *same kernels*
as the Spark pipeline (same murmur seed 9001, same 128 permutations, same
band fold), but with a trivial in-memory driver: dict buckets + union-find
instead of shuffles + label propagation. Agreement between the two is then
purely a test of the distributed plumbing, which is the point.
"""

from __future__ import annotations

import numpy as np

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.functions.text import (shingle_hashes_batch,
                                                    unique_shingle_sets)
from datasketches_rust_spark.sketches import minhash as mh


class UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def oracle_pairs(ids: list, texts: list[str], cfg: DedupConfig
                 ) -> set[tuple]:
    """Verified near-dup pairs (id_a < id_b by value) at the same config."""
    import pandas as pd
    lowered = pd.Series([(t or "").lower() for t in texts])
    flat, offsets = shingle_hashes_batch(lowered, cfg.shingle_k, cfg.seed)
    sigs = mh.signatures(flat, offsets, cfg.num_perm, cfg.seed)
    bands = mh.band_hashes(sigs, cfg.lsh_bands, cfg.lsh_rows, cfg.seed)

    buckets: dict[tuple, list[int]] = {}
    for i in range(len(ids)):
        for j in range(cfg.lsh_bands):
            buckets.setdefault((j, int(bands[i, j])), []).append(i)

    shingle_sets = unique_shingle_sets(lowered, cfg.shingle_k, cfg.seed)
    counts: dict[tuple, int] = {}
    star: set[tuple] = set()
    for (_, _), members in buckets.items():
        if 0 < cfg.max_bucket_size < len(members):
            # hot bucket -> star degrade around the min-id representative,
            # same as operators/lsh.py (rep chosen by id VALUE, matching
            # Spark's F.min on the id column)
            rep = min(members, key=lambda i: ids[i])
            for m in members:
                if m != rep:
                    star.add((rep, m) if rep < m else (m, rep))
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                key = (a, b) if a < b else (b, a)
                counts[key] = counts.get(key, 0) + 1

    # band-collision prefilter, mirroring operators/lsh.py; star edges
    # bypass it (their collisions were capped, so there is nothing to count)
    min_nb = max(getattr(cfg, "min_band_matches", 1), 1)
    cand = {k for k, c in counts.items() if c >= min_nb} | star

    out = set()
    for a, b in cand:
        sa, sb = shingle_sets[a], shingle_sets[b]
        if sa.size == 0 and sb.size == 0:
            j = 1.0
        else:
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            j = inter / (sa.size + sb.size - inter)
        if j >= cfg.jaccard_threshold:
            ia, ib = ids[a], ids[b]
            out.add((ia, ib) if ia < ib else (ib, ia))
    return out


def oracle_clusters(ids: list, texts: list[str], cfg: DedupConfig) -> dict:
    """{id: cluster_id} with cluster_id = min member id (matches the Spark
    pipeline's convention and the recursive-SQL oracle)."""
    idx = {v: i for i, v in enumerate(ids)}
    uf = UnionFind(len(ids))
    for a, b in oracle_pairs(ids, texts, cfg):
        uf.union(idx[a], idx[b])
    roots: dict[int, list] = {}
    for v, i in idx.items():
        roots.setdefault(uf.find(i), []).append(v)
    out = {}
    for members in roots.values():
        c = min(members)
        for m in members:
            out[m] = c
    return out


def cluster_pairs(assignment: dict) -> set[tuple]:
    """Unordered within-cluster pairs from an {id: cluster_id} map —
    the unit of the dup-pair recall metric (FIXTURES.md §F1)."""
    groups: dict = {}
    for v, c in assignment.items():
        groups.setdefault(c, []).append(v)
    pairs = set()
    for members in groups.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                pairs.add((members[x], members[y]))
    return pairs


def dup_pair_recall(predicted: dict, truth: dict) -> float:
    """|predicted ∩ truth| / |truth| over within-cluster pairs."""
    tp = cluster_pairs(truth)
    if not tp:
        return 1.0
    return len(cluster_pairs(predicted) & tp) / len(tp)


def assignment_pair_recall(predicted: dict, truth: dict) -> float:
    """Same metric as dup_pair_recall but computed group-wise in O(n) —
    usable when a single truth cluster has thousands of members (the
    materialized pair set would be O(size^2))."""
    from collections import Counter, defaultdict
    groups: dict = defaultdict(list)
    for v, c in truth.items():
        groups[c].append(v)
    tp = total = 0
    for members in groups.values():
        n = len(members)
        if n < 2:
            continue
        total += n * (n - 1) // 2
        sub = Counter(predicted[v] for v in members)
        tp += sum(m * (m - 1) // 2 for m in sub.values())
    return 1.0 if total == 0 else tp / total
