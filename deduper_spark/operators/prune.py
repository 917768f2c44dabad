"""Corpus-pruning operators for training-data pipelines.

The pruning shapes a 100 TB text/embedding corpus needs beyond
pair detection (operators/dedup_text.py):

- ``chunk_dedup`` (+ ``chunk_explode``/``reassemble_chunks``):
  span-level exact dedup (the C4 / CCNet "remove duplicated
  lines/spans across documents" pass) — fixed-width token chunks,
  global keep-first per chunk, documents reassembled from their
  surviving chunks. The streaming form is
  streaming.incremental.stream_chunk_dedup.
- ``drop_near_duplicates``: survivor selection from ANY verified pair
  stream — drop every row whose neighborhood contains a smaller id
  (the deterministic, SQL-mirrorable variant of greedy pruning).
- ``semantic_prune``: SemDeDup-style semantic dedup (Abbas et al.,
  arXiv:2303.09540) — embedding-cosine near-dup pairs via hyperplane
  LSH, then the same smaller-id-neighbor drop rule.
- ``clean_text_corpus``: the composed cleaning pipeline — language
  filter -> quality floor -> exact doc dedup -> span dedup in one
  call (three hash Exchanges end-to-end).

Everything here composes the existing verified-pair machinery; no new
shuffles beyond the ones the pair generators already pay, plus one
hash Exchange for chunk_dedup's keep-first (a partial-aggregating
min-of-struct groupBy since r6 — see chunk_dedup's docstring).

Generalizes the reference's keep-first survivor contract
(Deduper.kt:181-199: first row wins, later hash matches are dupes) from
whole-row keys to spans and semantic neighborhoods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deduper_spark.functions.text import tokens_expr
from deduper_spark.operators.dedup_text import embedding_cosine_pairs


def chunk_explode(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> DataFrame:
    """(id, ci, chunk, n_chunks) — non-overlapping ``chunk_words``-token
    chunks per document (last chunk may be shorter; every doc emits at
    least one chunk, the empty string for NULL/empty text). Narrow:
    one transform+posexplode inside codegen, no shuffle. Shared by the
    batch keep-first (chunk_dedup) and the streaming ledger ingest
    (streaming.incremental.stream_chunk_dedup)."""
    toks = tokens_expr(F.coalesce(F.col(text_col), F.lit("")))
    w = F.lit(chunk_words)
    n_chunks = F.ceil(F.size("toks") / w).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("n_chunks") - 1),
        lambda i: F.array_join(F.slice(F.col("toks"), i * w + 1, w), " "),
    )
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .withColumn("n_chunks", F.greatest(n_chunks, F.lit(1)))
        .select("id", "n_chunks", F.posexplode(chunks).alias("ci", "chunk"))
    )


def reassemble_chunks(kept: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, text_dedup, n_chunks, n_kept) from surviving
    (id, ci, chunk, n_chunks) rows — original chunk order restored via
    an in-group array_sort on (ci, chunk) structs; one hash Exchange
    keyed on the doc id (narrow rows)."""
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("ci", "chunk"))),
        lambda s: s["chunk"],
    )
    return (
        kept.groupBy("id")
        .agg(
            F.array_join(ordered, " ").alias("text_dedup"),
            F.first("n_chunks").alias("n_chunks"),
            F.count("*").alias("n_kept"),
        )
        .select(
            F.col("id").alias(id_col), "text_dedup",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("n_kept").cast("long").alias("n_kept"),
        )
    )


def chunk_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
) -> DataFrame:
    """Span-level exact dedup: (id, text_dedup, n_chunks, n_kept).

    Documents are split into non-overlapping ``chunk_words``-token
    chunks (last chunk may be shorter); a chunk survives iff it is the
    FIRST occurrence corpus-wide, ordered by (id, chunk index) — the
    keep-first contract at span granularity. Documents are reassembled
    from surviving chunks in original order; documents whose every
    chunk was seen earlier disappear from the output entirely (they
    contribute no novel text — exactly C4's duplicate-span removal).

    Scale shape: one hash Exchange keyed on the chunk string, and
    row_number+filter(rn=1) gets Catalyst's WindowGroupLimit on both
    sides of it (map-side top-1 per key pre-filter, PLANS.md §3), so
    the shuffle carries ~|distinct chunks| rows. The chunk text rides
    the shuffle because reassembly needs it — at 10-word chunks that
    is ~60 B/row, comparable to a hex digest; there is no second
    pass to re-fetch winning text. Reassembly is a groupBy on the
    ORIGINAL id (second Exchange, narrow rows).
    """
    ex = chunk_explode(df, id_col, text_col, chunk_words)
    # keep-first as min-of-struct (r6, guide §2.3): (id, ci) is unique
    # per chunk occurrence, so the lexicographic struct minimum IS the
    # row_number()=1 row of the former ORDER BY (id, ci) window — but
    # as a partial-aggregating HashAggregate (map-side min per chunk)
    # instead of a window with a sort on both sides of its Exchange.
    kept = (
        ex.groupBy("chunk")
        .agg(F.min(F.struct("id", "ci", "n_chunks")).alias("w"))
        .select(F.col("w.id").alias("id"), F.col("w.ci").alias("ci"),
                "chunk", F.col("w.n_chunks").alias("n_chunks"))
    )
    return reassemble_chunks(kept, id_col)


def drop_near_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
) -> DataFrame:
    """Survivors of ``df`` under verified near-dup ``pairs``.

    ``pairs`` must carry (id_l, id_r) with id_l < id_r (the output
    contract of every pair generator in this engine). A row is dropped
    iff it appears as the LARGER side of any pair — i.e. its verified
    neighborhood contains a smaller id. Deterministic and SQL-mirrorable
    (NOT EXISTS over the pair predicate), unlike a sequential greedy
    scan; distributed as one distinct + left_anti join on the id.

    Note the rule is per-EDGE, not per-component: in a chain a—b—c
    (a<b<c) with no a—c edge, both b and c are dropped (each has a
    smaller-id direct neighbor) and a survives. Connected-components
    survivor selection (pipeline.py keep-first over CC labels) would
    keep the same `a` here but may keep MORE rows in general — use
    `connected_components` + keep-min when cluster-level semantics are
    required; use this when the contract is "nothing within τ of an
    earlier kept-or-dropped row", the common corpus-pruning form.
    """
    dropped = pairs.select(F.col("id_r").alias(id_col)).dropDuplicates()
    return df.join(dropped, id_col, "left_anti")


def semantic_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    probe_radius: int = 1,
    n_tables: int | None = None,
    target_miss: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic dedup over an embedding column.

    Candidate pairs come from the OR-amplified hyperplane-LSH blocker
    (embedding_cosine_pairs — recall at the threshold bounded by
    ``target_miss``, measured curve in BENCH/BASELINE.md); survivors
    are rows with NO smaller-id neighbor at cosine >= threshold
    (drop_near_duplicates). Returns ``df``'s surviving rows unchanged.

    SemDeDup (arXiv:2303.09540) clusters with k-means and keeps one
    representative per ε-ball inside each cluster; the min-id direct-
    neighbor rule is the deterministic, oracle-checkable equivalent of
    its keep-one-representative step, with LSH standing in for the
    cluster blocker (same role, bounded recall instead of heuristic).
    """
    pairs = embedding_cosine_pairs(
        df, id_col, vec_col, threshold=threshold, n_planes=n_planes,
        probe_radius=probe_radius, n_tables=n_tables,
        target_miss=target_miss, seed=seed,
    )
    return drop_near_duplicates(df, pairs, id_col)


def clean_text_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str = "en",
    min_quality_micro: int = 600_000,
    chunk_words: int = 10,
) -> DataFrame:
    """The composed C4-style cleaning pipeline in one call:
    language filter -> quality floor -> exact doc dedup (keep-first)
    -> span-level chunk dedup. Returns (id, text_dedup, n_chunks,
    n_kept) — the cleaned corpus a pretraining run would ingest.

    Every stage is an already-oracled operator (lang_id_expr,
    quality_micro_expr, exact_dedup, chunk_dedup), composed so the
    predicates stay in ONE codegen'd projection ahead of the first
    shuffle — Catalyst collapses the two filters into the parquet scan
    (predicate ordering is its call), the exact-dedup Exchange then
    carries only surviving rows, and chunk dedup's Exchange only
    exact-unique rows. The whole pipeline is 3 hash Exchanges
    end-to-end at any scale; nothing widens row count except the
    chunk posexplode, which the chunk-key WindowGroupLimit immediately
    prunes map-side (PLANS.md §3, §13).
    """
    from deduper_spark.functions.textstats import (
        lang_id_expr,
        quality_micro_expr,
    )

    filtered = df.where(
        (lang_id_expr(text_col) == lang)
        & (quality_micro_expr(text_col) >= min_quality_micro)
    ).select(id_col, text_col)
    # exact keep-first inline (r6, guide §2.3): the working row here is
    # exactly (id, text), so "first row per md5(text)" == "min id per
    # text" — a partial-aggregating groupBy on the text itself. The
    # former exact_dedup window plan md5'd every row and sorted both
    # sides of its Exchange; this shuffles the same rows without the
    # hash column or the sorts. Identical survivors (md5 is injective
    # on text; the oracle recomputation is unchanged).
    survivors = (
        filtered.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, text_col)
    )
    return chunk_dedup(survivors, id_col, text_col, chunk_words)
