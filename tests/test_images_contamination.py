"""image_contamination_check pinned against an exact numpy all-pairs
Hamming scan over the same fixture (the band join is a candidate
strategy; this proves it loses nothing at the <= 3 gate, which the
4x16-bit pigeonhole guarantees)."""

from collections import defaultdict


def test_matches_exact_numpy_scan(spark):
    from datasketches_rust_spark.queries import q_image_contamination_check
    from datasketches_rust_spark.sources.images import generate_images

    got = {r.image_id: r.n_eval_matches for r in
           q_image_contamination_check(spark, "unused").collect()}

    imgs, _ = generate_images(2000, seed=42)
    ph = dict(zip(imgs.image_id, imgs.phash))
    split = {i: int(i[4:]) % 10 == 0 for i in ph}
    expect = defaultdict(int)
    evals = [(i, p) for i, p in ph.items() if split[i]]
    for cid, cp in ph.items():
        if split[cid]:
            continue
        n = sum(1 for _, ep in evals
                if bin((cp ^ ep) & 0xFFFFFFFFFFFFFFFF).count("1") <= 3)
        if n:
            expect[cid] = n
    assert got == dict(expect)
    assert len(got) > 0  # non-vacuous: planted dups straddle the split
