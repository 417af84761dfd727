"""Unit tests for the round-3 text-pipeline operators: Gopher-style
repetition flags, per-source tf-idf top terms, and fixed-window chunk
dedup stats. Each is also DuckDB-oracle-verified at sf0.01 by the
driver gate; these tests pin the semantics on crafted inputs where the
expected answer is computable by hand."""

from __future__ import annotations

import math


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string")


class TestRepetitionFlags:
    def test_repetitive_doc_flagged(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_repetition_flags
        rows = [
            # 12 tokens, all "spam": dup_trigram_frac = 9/10, top 12/12
            (1, " ".join(["spam"] * 12), "s"),
            # all-distinct tokens: nothing repeats
            (2, "alpha beta gamma delta epsilon zeta", "s"),
            # short doc (< 3 tokens): zero trigrams, frac 0.0
            (3, "one two", "s"),
        ]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["doc_id"]: r for r in
               q_repetition_flags(spark, str(tmp_path)).collect()}
        r1 = out[1]
        assert r1["n_tokens"] == 12
        assert r1["n_dup_trigrams"] == 9
        assert math.isclose(r1["dup_trigram_frac"], 0.9)
        assert math.isclose(r1["top_word_frac"], 1.0)
        assert r1["flagged"]
        r2 = out[2]
        assert r2["n_dup_trigrams"] == 0
        assert math.isclose(r2["top_word_frac"], 1 / 6)
        assert not r2["flagged"]
        r3 = out[3]
        assert r3["n_dup_trigrams"] == 0
        assert r3["dup_trigram_frac"] == 0.0
        # 2 distinct tokens -> top_word_frac = 0.5 > 0.2: the top-word
        # rule literally flags degenerate short docs (any doc under 5
        # tokens trips it); real pipelines cut those by a length rule
        # first. The flag must agree with the formula, not intuition.
        assert math.isclose(r3["top_word_frac"], 0.5)
        assert r3["flagged"]

    def test_top_word_run_length_equals_exact(self, spark, tmp_path):
        # the sorted-run-length top count must equal a literal counter
        from collections import Counter

        from datasketches_rust_spark.queries import q_repetition_flags
        texts = [
            "a b a c a b b d e a",
            "x y z x y x w w w w w q",
            "solo",
        ]
        rows = [(i, t, "s") for i, t in enumerate(texts)]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["doc_id"]: r for r in
               q_repetition_flags(spark, str(tmp_path)).collect()}
        for i, t in enumerate(texts):
            toks = t.split()
            expect = max(Counter(toks).values()) / len(toks)
            assert math.isclose(out[i]["top_word_frac"], expect), (i, t)


class TestChunkDedupStats:
    def test_shared_chunk_detected(self, spark, tmp_path):
        from datasketches_rust_spark.queries import (CHUNK_WORDS,
                                                     q_chunk_dedup_stats)
        boiler = " ".join(f"w{i}" for i in range(CHUNK_WORDS))
        uniq_a = " ".join(f"a{i}" for i in range(CHUNK_WORDS))
        uniq_b = " ".join(f"b{i}" for i in range(10))  # partial chunk
        rows = [
            (1, boiler + " " + uniq_a, "s1"),   # chunks: boiler, uniq_a
            (2, boiler + " " + uniq_b, "s2"),   # chunks: boiler, uniq_b
            (3, uniq_b, "s2"),                  # chunk: uniq_b (shared w/ 2)
        ]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["source"]: r for r in
               q_chunk_dedup_stats(spark, str(tmp_path)).collect()}
        assert out["s1"]["n_chunks"] == 2
        assert out["s1"]["n_shared_chunks"] == 1        # boiler
        assert out["s2"]["n_chunks"] == 3
        assert out["s2"]["n_shared_chunks"] == 3        # boiler + 2x uniq_b

    def test_intra_doc_repeat_not_shared(self, spark, tmp_path):
        # the same chunk twice within ONE doc is not cross-doc sharing
        from datasketches_rust_spark.queries import (CHUNK_WORDS,
                                                     q_chunk_dedup_stats)
        c = " ".join(f"w{i}" for i in range(CHUNK_WORDS))
        rows = [(1, c + " " + c, "s")]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        (row,) = q_chunk_dedup_stats(spark, str(tmp_path)).collect()
        assert row["n_chunks"] == 2
        assert row["n_shared_chunks"] == 0


class TestTfidfTopTerms:
    def test_rare_term_outranks_common(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_tfidf_top_terms
        rows = [
            (1, "common common common rare rare rare rare", "s1"),
            (2, "common filler filler", "s2"),
            (3, "common filler rare hapax", "s2"),
        ]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = q_tfidf_top_terms(spark, str(tmp_path)).collect()
        s1 = sorted((r for r in out if r["source"] == "s1"),
                    key=lambda r: r["rk"])
        # "common" is in every doc -> idf = ln(1) = 0 -> never top;
        # "rare" df=2 of 3 docs
        assert s1[0]["term"] == "rare"
        assert math.isclose(s1[0]["tfidf"], 4 * math.log(3 / 2))
        assert all(r["term"] != "common" or r["tfidf"] == 0.0
                   for r in out)
        # df=1 hapax are floored out of the vocab entirely
        assert all(r["term"] != "hapax" for r in out)
        for src in ("s1", "s2"):
            rks = [r["rk"] for r in out if r["source"] == src]
            assert rks == list(range(1, len(rks) + 1))


class TestSequencePackPlan:
    def test_packing_matches_hand_computation(self, spark, tmp_path):
        from collections import defaultdict

        from datasketches_rust_spark.queries import (PACK_SHARDS, SEQ_LEN,
                                                     q_sequence_pack_plan)
        # token counts chosen to straddle several SEQ_LEN boundaries
        # within one (source, shard) stream: doc_ids 0,16,32,... share
        # shard 0
        rows = [(i * PACK_SHARDS, " ".join(["w"] * n), "s")
                for i, n in enumerate([300, 300, 512, 1, 1023])]
        rows += [(7, " ".join(["w"] * 100), "s")]      # shard 7, alone
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["doc_id"]: r for r in
               q_sequence_pack_plan(spark, str(tmp_path)).collect()}

        streams = defaultdict(list)
        for doc_id, text, src in rows:
            streams[(src, doc_id % PACK_SHARDS)].append(
                (doc_id, len(text.split())))
        for (src, shard), docs in streams.items():
            start = 0
            for doc_id, n in sorted(docs):
                r = out[doc_id]
                assert r["shard"] == shard
                assert r["n_tokens"] == n
                assert r["bin_id"] == start // SEQ_LEN, doc_id
                assert r["bin_offset"] == start % SEQ_LEN, doc_id
                start += n

    def test_offsets_continuous_within_stream(self, spark, tmp_path):
        # start of doc k == start of doc k-1 + its token count, i.e.
        # bin_id*SEQ_LEN + bin_offset is the exact running token total
        from datasketches_rust_spark.queries import (PACK_SHARDS, SEQ_LEN,
                                                     q_sequence_pack_plan)
        rows = [(i, " ".join(["t"] * (7 + 13 * (i % 11))), f"s{i % 2}")
                for i in range(120)]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = q_sequence_pack_plan(spark, str(tmp_path)).collect()
        by_stream = {}
        for r in sorted(out, key=lambda r: r["doc_id"]):
            key = (r["source"], r["shard"])
            expect = by_stream.get(key, 0)
            assert r["bin_id"] * SEQ_LEN + r["bin_offset"] == expect, r
            by_stream[key] = expect + r["n_tokens"]


class TestDedupAgainstIndex:
    def test_tie_breaks_to_min_index_id(self, spark, tmp_path):
        # batch doc 10 is IDENTICAL to index docs 3 and 7 (jaccard 1.0
        # ties) -> best match must be the min index id; batch doc 5 is
        # unique -> not a dup
        from datasketches_rust_spark.queries import q_dedup_against_index
        dup = "the quick brown fox jumps over the lazy dog " * 4
        rows = [
            (3, dup, "s"), (7, dup, "s"),                 # index side
            (1, "completely different index text one", "s"),
            (10, dup, "s"),                               # batch side
            (5, "a unique batch document with no twin", "s"),
        ]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["batch_id"]: r for r in
               q_dedup_against_index(spark, str(tmp_path)).collect()}
        assert set(out) == {10, 5}
        r10 = out[10]
        assert r10["is_dup"] and r10["n_matches"] == 2
        assert r10["best_index_id"] == 3 and r10["best_jaccard"] == 1.0
        r5 = out[5]
        assert not r5["is_dup"] and r5["n_matches"] == 0
        assert r5["best_jaccard"] is None and r5["best_index_id"] is None


class TestBalancedSample:
    def test_skewed_sources_rebalanced(self, spark, tmp_path):
        # big source 200 docs, small source 20 -> thresh_big is 10x
        # smaller; kept counts should land near 0.5*20 for BOTH sources
        import hashlib

        from datasketches_rust_spark.queries import (SAMPLE_FRAC,
                                                     q_balanced_sample)
        rows = ([(i, f"text {i}", "big") for i in range(200)]
                + [(1000 + i, f"text {1000+i}", "small")
                   for i in range(20)])
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = q_balanced_sample(spark, str(tmp_path)).collect()
        kept = {r["doc_id"] for r in out}

        # exact expected membership, recomputed in pure python
        def u32(doc_id):
            return int(hashlib.md5(str(doc_id).encode())
                       .hexdigest()[:8], 16)

        expect = set()
        for doc_id, _, src in rows:
            cnt = 200 if src == "big" else 20
            thresh = math.floor(SAMPLE_FRAC * 20 / cnt * 2 ** 32)
            if u32(doc_id) < thresh:
                expect.add(doc_id)
        assert kept == expect
        n_big = sum(1 for r in out if r["source"] == "big")
        n_small = sum(1 for r in out if r["source"] == "small")
        # both sources target 0.5*min_count = 10 expected keeps
        assert 2 <= n_big <= 20 and 2 <= n_small <= 20

    def test_deterministic_across_runs(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_balanced_sample
        rows = [(i, f"t {i}", f"s{i % 3}") for i in range(90)]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        a = sorted(r["doc_id"]
                   for r in q_balanced_sample(spark, str(tmp_path)).collect())
        b = sorted(r["doc_id"]
                   for r in q_balanced_sample(spark, str(tmp_path)).collect())
        assert a == b and len(a) > 0


class TestChunkDedupClean:
    def test_cross_doc_self_and_tail_dedup(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_chunk_dedup_clean
        c1 = " ".join(f"a{i}" for i in range(32))
        c2 = " ".join(f"b{i}" for i in range(32))
        tail = " ".join(f"t{i}" for i in range(8))
        rows = [
            # two full chunks, both canonical
            (1, f"{c1} {c2}", "s"),
            # exact copy of doc 1's second chunk -> fully cleaned away
            (2, c2, "s"),
            # self-repeat: a chunk unique to doc 3, twice -> second removed
            (3, " ".join(f"s{i}" for i in range(32)) + " "
                + " ".join(f"s{i}" for i in range(32)), "s"),
            # 40 words: full chunk + 8-word tail chunk
            (4, f"{c2.replace('b', 'z')} {tail}", "s"),
            # doc equal to doc 4's TAIL chunk -> removed (tail fps match)
            (5, tail, "s"),
        ]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["doc_id"]: r for r in
               q_chunk_dedup_clean(spark, str(tmp_path)).collect()}
        assert (out[1]["n_chunks"], out[1]["n_removed"]) == (2, 0)
        assert out[1]["clean_text"] == f"{c1} {c2}"
        assert (out[2]["n_chunks"], out[2]["n_removed"]) == (1, 1)
        assert out[2]["clean_text"] == ""
        assert (out[3]["n_chunks"], out[3]["n_removed"]) == (2, 1)
        assert out[3]["clean_text"] == " ".join(f"s{i}" for i in range(32))
        assert (out[4]["n_chunks"], out[4]["n_removed"]) == (2, 0)
        assert (out[5]["n_chunks"], out[5]["n_removed"]) == (1, 1)
        assert out[5]["clean_text"] == ""

    def test_canonical_is_min_doc_then_idx(self, spark, tmp_path):
        # the same chunk in 3 docs: only the least (doc_id, idx)
        # occurrence survives, regardless of row order in the input
        from datasketches_rust_spark.queries import q_chunk_dedup_clean
        x = " ".join(f"x{i}" for i in range(32))
        pre = " ".join(f"p{i}" for i in range(32))
        rows = [(9, x, "s"), (7, f"{pre} {x}", "s"), (8, x, "s")]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        out = {r["doc_id"]: r for r in
               q_chunk_dedup_clean(spark, str(tmp_path)).collect()}
        assert out[7]["n_removed"] == 0 and out[7]["clean_text"] == f"{pre} {x}"
        assert out[8]["clean_text"] == "" and out[9]["clean_text"] == ""


class TestSourceProfile:
    def test_exact_lower_percentiles(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_source_profile
        rows = []
        # source "a": n_chars 10..50, langs en/de alternating, 5 docs
        for i, nc in enumerate([10, 20, 30, 40, 50]):
            rows.append((i, "w " * (i + 1), "a",
                         "en" if i % 2 == 0 else "de", nc))
        # source "b": a single doc -> p50 = p90 = max
        rows.append((99, "one two three", "b", "fr", 77))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, "
                  "lang string, n_chars int")
        df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
        out = {r["source"]: r for r in
               q_source_profile(spark, str(tmp_path)).collect()}
        a = out["a"]
        # lower-method positions: floor((5-1)*.5)+1 = 3 -> 30;
        # floor(4*.9)+1 = 4 -> 40
        assert (a["n_docs"], a["p50_chars"], a["p90_chars"],
                a["max_chars"], a["n_langs"]) == (5, 30, 40, 50, 2)
        # "w " * (i+1) splits into i+1 words -> 1+2+3+4+5 = 15
        assert a["n_words"] == 15
        b = out["b"]
        assert (b["n_docs"], b["n_words"], b["p50_chars"], b["p90_chars"],
                b["max_chars"], b["n_langs"]) == (1, 3, 77, 77, 77, 1)

    def test_randomized_against_python_reference(self, spark, tmp_path):
        """30 docs assembled from a small pool of chunk templates (plus
        short tails) so fingerprint collisions are dense, compared
        exactly against an independent python reference implementation
        of the canonical-first-occurrence rule."""
        import numpy as np
        from datasketches_rust_spark.queries import (CHUNK_WORDS,
                                                     q_chunk_dedup_clean)
        rng = np.random.RandomState(7)
        pool = [" ".join(f"w{p}_{i}" for i in range(CHUNK_WORDS))
                for p in range(6)]
        tails = [" ".join(f"t{p}_{i}" for i in range(5)) for p in range(3)]
        rows = []
        for d in range(30):
            parts = [pool[rng.randint(6)]
                     for _ in range(1 + rng.randint(4))]
            if rng.rand() < 0.5:
                parts.append(tails[rng.randint(3)])
            rows.append((d, " ".join(parts), "s"))
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))
        got = {r["doc_id"]: (r["n_chunks"], r["n_removed"], r["clean_text"])
               for r in q_chunk_dedup_clean(spark, str(tmp_path)).collect()}

        # reference: global first occurrence by (doc_id, idx)
        seen = {}
        for doc_id, text, _ in rows:
            toks = text.lower().split()
            for idx in range(1, -(-len(toks) // CHUNK_WORDS) + 1):
                ch = " ".join(toks[(idx - 1) * CHUNK_WORDS:
                                   idx * CHUNK_WORDS])
                key = (doc_id, idx)
                if ch not in seen or seen[ch] > key:
                    seen[ch] = key
        want = {}
        for doc_id, text, _ in rows:
            toks = text.lower().split()
            n_chunks = -(-len(toks) // CHUNK_WORDS)
            kept, removed = [], 0
            for idx in range(1, n_chunks + 1):
                ch = " ".join(toks[(idx - 1) * CHUNK_WORDS:
                                   idx * CHUNK_WORDS])
                if seen[ch] == (doc_id, idx):
                    kept.append(ch)
                else:
                    removed += 1
            want[doc_id] = (n_chunks, removed, " ".join(kept))
        assert got == want
        assert sum(r for _, r, _ in want.values()) > 0


class TestPiiColumns:
    def test_crafted_matches_and_redaction(self, spark):
        # The sf-fixture gate exercises cross-engine regex parity on the
        # synthetic footer; this pins the Spark-side semantics on known
        # text: counts per category, multi-match, and the exact rewrite.
        from datasketches_rust_spark.functions.text import pii_columns
        import pyspark.sql.functions as F

        rows = [
            (1, "mail a@b.com and c.d+x@e.org, call 555-123-4567"),
            (2, "server 10.0.0.1 talked to 192.168.1.255 twice: 10.0.0.1"),
            (3, "clean text, no pii; 1234-567-8901 has 4-digit prefix"),
        ]
        df = spark.createDataFrame(rows, ["id", "t"])
        pii = pii_columns(F.col("t"))
        got = {r["id"]: r for r in df.select(
            "id", pii["n_emails"].alias("ne"), pii["n_phones"].alias("np"),
            pii["n_ips"].alias("ni"), pii["clean"].alias("clean")
        ).collect()}

        assert (got[1]["ne"], got[1]["np"], got[1]["ni"]) == (2, 1, 0)
        assert got[1]["clean"] == "mail <EMAIL> and <EMAIL>, call <PHONE>"
        assert (got[2]["ne"], got[2]["np"], got[2]["ni"]) == (0, 0, 3)
        assert got[2]["clean"] == ("server <IP> talked to <IP> twice: <IP>")
        # \b guards: a 4-digit run adjoining the phone shape must not match
        assert (got[3]["ne"], got[3]["np"], got[3]["ni"]) == (0, 0, 0)
        assert got[3]["clean"] == rows[2][1]


class TestLeakageSafeSplit:
    def test_cluster_members_share_split_and_deterministic(self, spark,
                                                           tmp_path):
        from datasketches_rust_spark.queries import q_leakage_safe_split

        # 3 near-dup pairs + singletons; each pair must co-locate in one
        # split regardless of where the doc-level hash would have put them.
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark quiet forest tonight")
        rows = []
        for i in range(3):
            rows.append((10 * i + 1, base + f" variant {i}", "web"))
            rows.append((10 * i + 2, base + f" variant {i}!", "web"))
        for i in range(5):
            rows.append((100 + i, f"totally unrelated document number {i} "
                         f"with its own words {i * 7} {i * 13}", "web"))
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        out = q_leakage_safe_split(spark, str(tmp_path)).collect()
        split_of = {r["doc_id"]: r["split"] for r in out}
        cluster_of = {r["doc_id"]: r["cluster_id"] for r in out}
        assert len(out) == len(rows)
        for i in range(3):
            a, b = 10 * i + 1, 10 * i + 2
            assert cluster_of[a] == cluster_of[b]  # near-dups clustered
            assert split_of[a] == split_of[b]      # ...and never straddle
        # split is a pure function of cluster_id -> rerun is identical
        again = {r["doc_id"]: r["split"]
                 for r in q_leakage_safe_split(spark, str(tmp_path)).collect()}
        assert again == split_of


class TestContainmentPairs:
    def test_quote_inclusion_detected_where_jaccard_misses(self, spark,
                                                           tmp_path):
        from datasketches_rust_spark.queries import q_containment_dup_pairs

        quote = "the five boxing wizards jump quickly over it"
        long_doc = ("a very long surrounding article with many distinct "
                    "words that begins here " + quote +
                    " and then continues with plenty of additional "
                    "unrelated prose padding the shingle set far beyond "
                    "the quoted span so the union is large")
        rows = [(1, quote, "web"), (2, long_doc, "web"),
                (3, "completely different text about other topics", "web")]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        out = {(r["id_a"], r["id_b"]): r
               for r in q_containment_dup_pairs(spark, str(tmp_path))
               .collect()}
        assert (1, 2) in out and len(out) == 1
        r = out[(1, 2)]
        assert r["containment"] >= 0.9
        # the same pair under Jaccard is far below any dedup threshold —
        # that asymmetry is the point of the containment axis
        na = len({quote.lower()[i:i + 5]
                  for i in range(max(len(quote) - 4, 1))})
        nb = len({long_doc.lower()[i:i + 5]
                  for i in range(max(len(long_doc) - 4, 1))})
        jac = r["n_common"] / (na + nb - r["n_common"])
        assert jac < 0.5


class TestEventFunnelDaily:
    def test_strict_ordering_and_day_grain(self, spark, tmp_path):
        from datetime import datetime as DT

        from datasketches_rust_spark.queries import q_event_funnel_daily

        d1 = lambda h, m=0, s=0: DT(2024, 3, 1, h, m, s)
        d2 = lambda h: DT(2024, 3, 2, h)
        rows = [
            # u1: full funnel in order -> counts at every stage
            (1, d1(9), "view"), (1, d1(10), "click"), (1, d1(11), "purchase"),
            # u2: purchase BEFORE click BEFORE view -> viewed only
            (2, d1(9), "purchase"), (2, d1(10), "click"), (2, d1(11), "view"),
            # u3: view+click day 1, purchase day 2 -> no purchase credit
            (3, d1(9), "view"), (3, d1(10), "click"), (3, d2(9), "purchase"),
            # u4: click at the SAME timestamp as the first view -> strict
            # "after" fails, click not counted
            (4, d1(9), "view"), (4, d1(9), "click"),
            # u5: click-then-view-then-click -> second click counts
            (5, d1(8), "click"), (5, d1(9), "view"), (5, d1(10), "click"),
            # noise the funnel ignores
            (1, d1(12), "error"), (2, d1(12), "signup"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

        got = {str(r["day"]): (r["n_viewed"], r["n_clicked"],
                               r["n_purchased"])
               for r in q_event_funnel_daily(spark, str(tmp_path)).collect()}
        # day 1: u1..u5 all viewed; clicked = u1, u3, u5; purchased = u1
        assert got["2024-03-01"] == (5, 3, 1)
        # day 2: u3's lone purchase has no view that day -> no grain row
        assert "2024-03-02" not in got


class TestSnapshotDiff:
    def test_classification(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_dataset_snapshot_diff

        # ids crafted against the mods (11 delete, 13 edit, 17 add):
        # 11 -> removed; 13 -> modified; 17 -> unchanged BUT re-added at
        # 1000017; 143 = 11*13 -> removed (delete wins over edit);
        # 187 = 11*17 -> removed AND re-added; 1 -> unchanged.
        rows = [(i, f"text of doc {i}", "web")
                for i in (1, 11, 13, 17, 143, 187)]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        got = {r["doc_id"]: r["change"]
               for r in q_dataset_snapshot_diff(spark, str(tmp_path))
               .collect()}
        assert got == {11: "removed", 13: "modified", 143: "removed",
                       187: "removed", 1000017: "added", 1000187: "added"}


class TestCdcApply:
    def test_merge_semantics(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_cdc_apply_reconstruction

        rows = [(i, f"text of doc {i}", f"src{i % 2}")
                for i in (1, 11, 13, 17, 143)]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        out = {r["doc_id"]: r for r in
               q_cdc_apply_reconstruction(spark, str(tmp_path)).collect()}
        # deletes really delete (11, 143); updates rewrite in place (13);
        # untouched rows pass through (1, 17); inserts append (1000017)
        assert set(out) == {1, 13, 17, 1000017}
        import hashlib
        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
        assert out[1]["fp"] == md5("text of doc 1")
        assert out[13]["fp"] == md5("text of doc 13 [edited]")
        assert out[17]["fp"] == md5("text of doc 17")
        assert out[1000017]["fp"] == md5("new text of doc 17")
        assert out[1000017]["source"] == "src1"


class TestMixtureSamplePlan:
    def test_alpha_half_flattens_head(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_mixture_sample_plan

        # source A: 9 docs x 100 tokens = 900; B: 1 doc x 100 tokens.
        # w = isqrt: (30, 10); budget = 1000 div 2 = 500; total_w = 40.
        # target_A = min(900, 500*30 div 40) = 375
        # target_B = min(100, 500*10 div 40) = 100 (cap binds)
        rows = [(i, " ".join(f"w{i}x{j}" for j in range(100)), "A")
                for i in range(9)]
        rows.append((99, " ".join(f"y{j}" for j in range(100)), "B"))
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        got = {r["source"]: r for r in
               q_mixture_sample_plan(spark, str(tmp_path)).collect()}
        a, b = got["A"], got["B"]
        assert (a["n_tokens"], b["n_tokens"]) == (900, 100)
        assert (a["target_tokens"], b["target_tokens"]) == (375, 100)
        # alpha=0.5 flattening: the big source is downsampled harder
        assert a["target_tokens"] / a["n_tokens"] \
            < b["target_tokens"] / b["n_tokens"]
        # cap-bound source keeps everything (thresh = 2^32)
        assert (b["n_kept_docs"], b["n_kept_tokens"]) == (1, 100)
        assert 0 <= a["n_kept_tokens"] <= 900


class TestFeatureHashing:
    def test_buckets_match_reference_hash_and_counts(self, spark,
                                                     tmp_path):
        import hashlib

        from datasketches_rust_spark.queries import (FEATURE_HASH_DIM,
                                                     q_feature_hash_features)

        rows = [(1, "apple banana apple Cherry cherry cherry", "web"),
                (2, "", "web")]  # empty doc contributes nothing
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        got = {(r["doc_id"], r["bucket"]): r["n"] for r in
               q_feature_hash_features(spark, str(tmp_path)).collect()}
        bucket = lambda t: int(
            hashlib.md5(t.encode()).hexdigest()[:8], 16) % FEATURE_HASH_DIM
        want = {}
        for t, n in (("apple", 2), ("banana", 1), ("cherry", 3)):
            want[(1, bucket(t))] = want.get((1, bucket(t)), 0) + n
        assert got == want


class TestPriceDecileBins:
    def test_hand_computed_deciles(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_price_decile_bins

        # prices 1.00 .. 100.00; n=100, cut_q = value at floor(99q)+1
        # -> cuts [10, 20, ..., 90]; bin b = #cuts <= v
        rows = [(i, float(i)) for i in range(1, 101)]
        df = spark.createDataFrame(rows, ["l_orderkey", "l_extendedprice"])
        df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

        got = {r["bin"]: r for r in
               q_price_decile_bins(spark, str(tmp_path)).collect()}
        assert set(got) == set(range(10))
        assert (got[0]["n_rows"], got[0]["lo_dollars"],
                got[0]["hi_dollars"]) == (9, 1, 9)
        assert (got[1]["n_rows"], got[1]["lo_dollars"],
                got[1]["hi_dollars"]) == (10, 10, 19)
        assert (got[9]["n_rows"], got[9]["lo_dollars"],
                got[9]["hi_dollars"]) == (11, 90, 100)
        assert got[9]["sum_cents"] == sum(i * 100 for i in range(90, 101))


class TestDupGraphTriangles:
    def test_clique_and_pair_counts(self, spark, tmp_path):
        from datasketches_rust_spark.queries import q_dup_graph_triangles

        # 4 identical docs -> K4 (6 edges, 12 wedges, 4 triangles);
        # 2 identical docs -> K2 (1 edge, no wedge); singletons add nothing
        quad = ("the quick brown fox jumps over the lazy dog near the "
                "quiet river bank at dawn every single day")
        pair = ("an entirely different duplicated document about tensor "
                "compilers and kernel fusion strategies in depth")
        rows = [(i, quad, "web") for i in range(4)]
        rows += [(10, pair, "web"), (11, pair, "web")]
        rows += [(20 + i, f"unique filler text number {i} with words "
                  f"{i * 3} {i * 7} {i * 11}", "web") for i in range(3)]
        d = tmp_path / "documents.parquet"
        _docs(spark, rows).write.mode("overwrite").parquet(str(d))

        (row,) = q_dup_graph_triangles(spark, str(tmp_path)).collect()
        assert (row["n_edges"], row["n_wedges"], row["n_triangles"]) \
            == (7, 12, 4)
        assert row["clustering_coeff"] == 1.0
