"""Round-5 corpus-pruning operators: chunk dedup, survivor drop,
semantic prune, doc clusters, tf-idf top-k."""

from __future__ import annotations

import math

from deduper_spark.functions.textstats import tfidf_topk
from deduper_spark.operators.dedup_text import minhash_doc_clusters
from deduper_spark.operators.prune import (
    chunk_dedup,
    drop_near_duplicates,
    semantic_prune,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDedup:
    def test_keep_first_across_docs(self, spark):
        # doc 0 owns both chunks; doc 1 repeats chunk A then adds novel C
        a = "a b c d e f g h i j"
        b = "k l m n o p q r s t"
        c = "novel words only here x y z q w e"
        df = _docs(spark, [(0, f"{a} {b}"), (1, f"{a} {c}")])
        out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_words=10).collect()}
        assert out[0]["text_dedup"] == f"{a} {b}"
        assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
        # doc 1 lost the repeated chunk but kept its novel one, in order
        assert out[1]["text_dedup"] == c
        assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1

    def test_fully_duplicated_doc_disappears(self, spark):
        a = "a b c d e f g h i j"
        df = _docs(spark, [(0, a), (1, a)])
        rows = chunk_dedup(df, chunk_words=10).collect()
        assert [r["doc_id"] for r in rows] == [0]

    def test_short_and_ragged_tails(self, spark):
        # 13 tokens -> chunks of 10 + 3; the 3-token tail is its own key
        df = _docs(spark, [(0, "a b c d e f g h i j k l m"),
                           (1, "k l m")])  # doc 1 == doc 0's tail chunk
        out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_words=10).collect()}
        assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
        assert 1 not in out  # tail chunk already seen at (0, 1)

    def test_keep_first_orders_by_id_then_position(self, spark):
        # same chunk at (5, ci=0) and (3, ci=1): doc 3 wins (lower id)
        a = "a b c d e f g h i j"
        pre = "zz yy xx ww vv uu tt ss rr qq"
        df = _docs(spark, [(5, a), (3, f"{pre} {a}")])
        out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_words=10).collect()}
        assert out[3]["n_kept"] == 2
        assert 5 not in out

    def test_normalization_applies(self, spark):
        # punctuation/case fold into the same chunk key
        df = _docs(spark, [(0, "A, b! C d e f g h i j"),
                           (1, "a b c d e f g h i j")])
        rows = chunk_dedup(df, chunk_words=10).collect()
        assert [r["doc_id"] for r in rows] == [0]

    def test_empty_input(self, spark):
        df = _docs(spark, [])
        assert chunk_dedup(df).count() == 0

    def test_null_text_coalesces_to_empty(self, spark):
        # NULL and '' docs all carry one '' chunk: keep-first keeps the
        # lowest id, later NULL/empty docs drop — deterministic, same
        # contract the oracle's coalesce mirrors
        df = _docs(spark, [(1, None), (2, None), (3, ""),
                           (4, "a b c d e f g h i j")])
        out = {r["doc_id"]: r for r in chunk_dedup(df, chunk_words=10).collect()}
        assert sorted(out) == [1, 4]
        assert out[1]["text_dedup"] == "" and out[1]["n_kept"] == 1


class TestDropNearDuplicates:
    def test_chain_semantics_per_edge(self, spark):
        # chain 1-2, 2-3 (no 1-3 edge): 2 and 3 BOTH drop (each has a
        # smaller-id direct neighbor) — documented per-edge rule
        df = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id long")
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_l long, id_r long")
        kept = sorted(r["id"] for r in
                      drop_near_duplicates(df, pairs, "id").collect())
        assert kept == [1, 9]

    def test_empty_pairs_keeps_all(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "id long")
        pairs = spark.createDataFrame([], "id_l long, id_r long")
        assert drop_near_duplicates(df, pairs, "id").count() == 2


class TestSemanticPrune:
    def test_planted_duplicates_drop(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        base = rng.normal(size=(6, 16)).astype(float)
        rows = [(i, [float(x) for x in base[i]]) for i in range(6)]
        # plant near-copies of vec 0 and 3 at higher ids
        rows.append((10, [float(x) for x in base[0] * 1.001]))
        rows.append((11, [float(x) for x in base[3] * 0.999]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        kept = sorted(r["vec_id"] for r in
                      semantic_prune(df, threshold=0.99).collect())
        assert kept == [0, 1, 2, 3, 4, 5]

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert semantic_prune(df).count() == 0


class TestMinhashDocClusters:
    def test_singletons_and_planted_cluster(self, spark):
        base = ("spark table row scan filter join agg window batch line "
                "key value part hash merge sort group limit order data")
        df = _docs(spark, [
            (0, base),
            (1, base + " tiny tail"),        # near-dup of 0
            (2, "completely different words about nothing in particular "
                "with many unique tokens qq ww ee rr tt yy uu ii oo pp"),
        ])
        out = {r["doc_id"]: r["cluster_id"]
               for r in minhash_doc_clusters(df).collect()}
        assert out[0] == 0 and out[1] == 0   # min-id label
        assert out[2] == 2                   # singleton labels itself

    def test_all_singletons(self, spark):
        df = _docs(spark, [
            (0, "aa bb cc dd ee ff gg hh ii jj kk ll"),
            (1, "mm nn oo pp qq rr ss tt uu vv ww xx"),
        ])
        out = {r["doc_id"]: r["cluster_id"]
               for r in minhash_doc_clusters(df).collect()}
        assert out == {0: 0, 1: 1}


class TestStreamChunkDedup:
    SCHEMA = "doc_id long, text string"

    def _drain(self, spark, src, work):
        from deduper_spark.streaming.incremental import stream_chunk_dedup

        q = stream_chunk_dedup(
            spark, src, self.SCHEMA, f"{work}/target", f"{work}/ledger",
            f"{work}/ckpt")
        q.awaitTermination()

    def test_single_drain_matches_batch_operator(self, spark, tmp_path):
        a = "a b c d e f g h i j"
        b = "k l m n o p q r s t"
        c = "u v w x y z a1 b1 c1 d1"
        rows = [(0, f"{a} {b}"), (1, f"{a} {c}")]
        src, work = str(tmp_path / "src"), str(tmp_path / "work")
        spark.createDataFrame(rows, self.SCHEMA).write.parquet(src)
        self._drain(spark, src, work)
        got = {
            r["doc_id"]: (r["text_dedup"], r["n_chunks"], r["n_kept"])
            for r in spark.read.parquet(f"{work}/target").collect()
        }
        want = {
            r["doc_id"]: (r["text_dedup"], r["n_chunks"], r["n_kept"])
            for r in chunk_dedup(
                spark.createDataFrame(rows, self.SCHEMA)).collect()
        }
        assert got == want

    def test_cross_batch_ledger_drops_seen_chunks(self, spark, tmp_path):
        a = "a b c d e f g h i j"
        b = "k l m n o p q r s t"
        c = "u v w x y z a1 b1 c1 d1"
        novel = "zz yy xx ww vv uu tt ss rr qq"
        src, work = str(tmp_path / "src"), str(tmp_path / "work")
        spark.createDataFrame([(0, f"{a} {b}"), (1, c)],
                              self.SCHEMA).write.mode("append").parquet(src)
        self._drain(spark, src, work)
        # second file drop: doc 2 repeats chunk b + adds a novel chunk;
        # doc 3 is entirely chunks batch 0 already kept
        spark.createDataFrame([(2, f"{b} {novel}"), (3, f"{a} {c}")],
                              self.SCHEMA).write.mode("append").parquet(src)
        self._drain(spark, src, work)
        got = {r["doc_id"]: r
               for r in spark.read.parquet(f"{work}/target").collect()}
        assert sorted(got) == [0, 1, 2]          # doc 3 fully deduped
        assert got[2]["text_dedup"] == novel     # repeated chunk dropped
        assert got[2]["n_chunks"] == 2 and got[2]["n_kept"] == 1
        assert got[0]["batch_id"] == 0 and got[2]["batch_id"] == 1
        # ledger holds one md5 row per DISTINCT chunk ever kept
        assert spark.read.parquet(f"{work}/ledger").count() == 4


class TestTfidfTopk:
    def test_hand_computed(self, spark):
        df = _docs(spark, [
            (0, "apple apple banana"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry durian"),
        ])
        out = tfidf_topk(df, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        n = 3

        def score(tf, dfreq):
            return round(tf * math.log((n + 1) / (dfreq + 1)), 6)

        # doc 0: apple tf=2 df=1, banana tf=1 df=2
        r0 = sorted(by_doc[0], key=lambda r: r["rank"])
        assert [(r["term"], r["score"]) for r in r0] == [
            ("apple", score(2, 1)), ("banana", score(1, 2))]
        # doc 2: cherry tf=3 df=2 beats durian tf=1 df=1
        r2 = sorted(by_doc[2], key=lambda r: r["rank"])
        assert [r["term"] for r in r2] == ["cherry", "durian"]

    def test_tie_breaks_by_term_asc(self, spark):
        df = _docs(spark, [(0, "zeta alpha"), (1, "zeta alpha")])
        out = {(r["doc_id"], r["rank"]): r["term"]
               for r in tfidf_topk(df, k=2).collect()}
        # equal tf and df for both terms -> alphabetical order decides
        assert out[(0, 1)] == "alpha" and out[(0, 2)] == "zeta"

    def test_k_limits_and_empty_text(self, spark):
        df = _docs(spark, [(0, "a b c d e"), (1, "   ")])
        out = tfidf_topk(df, k=3).collect()
        assert {r["doc_id"] for r in out} == {0}
        assert len(out) == 3


class TestCleanTextCorpus:
    def test_all_four_stages(self, spark):
        from deduper_spark.operators.prune import clean_text_corpus

        en = ("the cat and the dog sat on the mat for fun "
              "it is a good day in the sun for all of us here today")
        de = ("der hund und die katze ist von dem haus mit den zu "
              "der hund und die katze ist von dem haus mit den zu")
        rows = [
            (0, en),                    # survives everything
            (1, en),                    # exact dup of 0 -> exact stage kills
            (2, de),                    # german -> lang stage kills
            (3, "x"),                   # 1 token -> quality stage kills
            # shares doc 0's first 10 normalized tokens, novel tail
            (4, "the cat and the dog sat on the mat for "
                "novel tail words here that are for the new doc only"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in clean_text_corpus(df).collect()}
        assert sorted(out) == [0, 4]
        assert out[0]["n_kept"] == out[0]["n_chunks"]
        # doc 4 (21 tokens -> 3 chunks) lost its first chunk (doc 0
        # owns it), kept the two tail chunks
        assert out[4]["n_chunks"] == 3 and out[4]["n_kept"] == 2
        assert out[4]["text_dedup"].startswith("novel tail")
