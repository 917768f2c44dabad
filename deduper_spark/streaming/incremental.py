"""Streaming / incremental ingestion dedup.

The reference is strictly batch; its cross-run state is the seen-hash
ledger (Deduper.kt:135-158). The Spark-native generalization is a
Structured Streaming file source + foreachBatch: every micro-batch is
anti-joined against the persisted ledger, survivors land in the
target, and the batch's new hashes land in the ledger — both written
as batch_id-partitioned dynamic overwrites, so a retried batch
replaces its own output (effectively-once) instead of duplicating it.

Two modes:
  * ``stream_dedup`` — foreachBatch ledger dedup (cross-run durable,
    unbounded state lives in the ledger table, not executor memory);
  * ``watermark_dedup`` — pure Structured Streaming
    dropDuplicatesWithinWatermark for bounded-lateness event streams
    (state store holds only the watermark window).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deduper_spark.functions.keys import md5_key_expr, resolve_hash_keys


def _fresh_vs_ledger(batch_df: DataFrame, ledger_dir: str,
                     batch_id: int) -> DataFrame:
    """Rows of ``batch_df`` whose ``hash`` was NOT ledgered by an
    EARLIER batch. Reading only partitions with batch_id < current is
    the effectively-once retry contract: a retried batch never sees
    its own partial ledger write. A missing ledger (first batch) passes
    everything through; any OTHER failure (corrupt ledger, permissions)
    must raise — treating it as first-batch would silently disable
    dedup. Shared by stream_dedup and stream_chunk_dedup."""
    from pyspark.errors import AnalysisException

    s = batch_df.sparkSession
    try:
        ledger = (
            s.read.parquet(ledger_dir)
            .where(F.col("batch_id") < batch_id)
            .select("hash")
        )
        return batch_df.join(ledger, "hash", "left_anti")
    except AnalysisException as exc:
        # ONLY a genuinely absent/empty ledger is a first batch; any
        # OTHER failure (corrupt ledger, permissions) must raise —
        # treating it as first-batch would silently disable dedup
        # (r5 ADVICE; same narrowing as streaming/fuzzy._read_ledger)
        from deduper_spark.errors import MISSING_OR_EMPTY_PATH, absent_state

        if not absent_state(exc, MISSING_OR_EMPTY_PATH):
            raise
        return batch_df


def _overwrite_batch_partition(df: DataFrame, path: str) -> None:
    """batch_id-partitioned dynamic overwrite: a retried batch replaces
    its own partition instead of appending duplicates."""
    (df.write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("batch_id").parquet(path))


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    target_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    hash_keys: tuple[str, ...] = (),
    available_now: bool = True,
):
    """Incremental file-stream dedup against a durable hash ledger.

    Returns the StreamingQuery (already started). With
    available_now=True it drains existing files and stops — the batch
    "catch-up" mode; leave False for a long-running ingest.

    Effectively-once semantics: both outputs are partitioned by
    ``batch_id`` and written with dynamic partition OVERWRITE, so a
    batch retried after a mid-write crash replaces its own partition
    instead of appending duplicates (fresh-row selection is
    deterministic: the anti-join reads only ledger partitions with
    batch_id < current, so a retry can never see its own partial
    ledger write). Readers see target rows with a ``batch_id`` lineage
    column — drop it if unwanted.
    """
    stream = (
        spark.readStream.schema(source_schema)
        .parquet(source_dir)
    )
    keys = resolve_hash_keys(stream, hash_keys)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.withColumn("hash", md5_key_expr(keys))
        # dedupe within the batch (keep one row per hash)
        in_batch = keyed.dropDuplicates(["hash"])
        fresh = (
            _fresh_vs_ledger(in_batch, ledger_dir, batch_id)
            .withColumn("batch_id", F.lit(batch_id))
            .localCheckpoint()  # compute fresh ONCE for both sinks
        )
        _overwrite_batch_partition(fresh.drop("hash"), target_dir)
        _overwrite_batch_partition(fresh.select("hash", "batch_id"),
                                   ledger_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_chunk_dedup(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    target_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 10,
    available_now: bool = True,
):
    """Streaming span-level dedup (the streaming form of
    operators.prune.chunk_dedup): each micro-batch of documents is
    chunked into ``chunk_words``-token spans, chunks are kept-first
    within the batch AND anti-joined against a durable md5(chunk)
    ledger of everything earlier batches kept, and documents are
    reassembled from their surviving chunks (a doc whose every chunk
    was seen before contributes nothing and drops). Cross-batch order
    is arrival order; within a batch the batch operator's (id, ci)
    keep-first applies — so draining a corpus in id order reproduces
    the batch chunk_dedup output exactly (pinned by test).

    Same effectively-once mechanics as stream_dedup: target and ledger
    are batch_id-partitioned dynamic overwrites, and the anti-join
    reads only ledger partitions with batch_id < current, so a retried
    batch replaces its own output and never sees its own partial
    ledger write. The ledger holds 16-byte BINARY md5 digests
    (unhex'd), not chunk text — at 10^12 chunks it is the hash
    footprint, not the corpus.
    """
    from pyspark.sql import Window

    from deduper_spark.operators.prune import (
        chunk_explode,
        reassemble_chunks,
    )

    stream = (
        spark.readStream.schema(source_schema)
        .parquet(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ex = (
            chunk_explode(batch_df, id_col, text_col, chunk_words)
            .withColumn("hash", F.unhex(F.md5("chunk")))
        )
        first = Window.partitionBy("hash").orderBy("id", "ci")
        in_batch = (
            ex.withColumn("rn", F.row_number().over(first))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        fresh = (
            _fresh_vs_ledger(in_batch, ledger_dir, batch_id)
            .localCheckpoint()  # compute ONCE for both sinks
        )
        out = (
            reassemble_chunks(fresh.drop("hash"), id_col)
            .withColumn("batch_id", F.lit(batch_id))
        )
        _overwrite_batch_partition(out, target_dir)
        _overwrite_batch_partition(
            fresh.select("hash").withColumn("batch_id", F.lit(batch_id)),
            ledger_dir)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def watermark_dedup(
    events: DataFrame,
    ts_col: str,
    key_cols: list[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming dedup: duplicates arriving within the
    watermark horizon are dropped; state is evicted past it. On a
    batch DataFrame (where the streaming-only operator is illegal)
    this degrades to plain dropDuplicates — same output for data that
    fits one batch."""
    if not events.isStreaming:
        return events.dropDuplicates(key_cols)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stateful_dupe_counter(
    stream: DataFrame,
    hash_keys: tuple[str, ...] = (),
    state_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per dedup-key occurrence counting with state timeout.

    For every exact-dedup key seen on the stream, maintains a running
    occurrence count in the state store and emits (hash, n_rows,
    is_dupe) updates each micro-batch — the streaming analog of the
    reference's dupe-group ledger (Deduper.kt:225-240), with BOUNDED
    state: with ``state_timeout_ms`` set (long-running streams), keys
    idle longer than that are evicted via processing-time timeout, so
    state holds only the active working set instead of the full corpus
    history (the durable full ledger is stream_dedup's job; this
    operator is the low-latency signal). Leave it None for availableNow
    catch-up runs — a timeout keeps the drain trigger alive in a
    state-cleanup loop after the data is exhausted.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keys = resolve_hash_keys(stream, hash_keys)
    keyed = stream.withColumn("hash", md5_key_expr(keys))

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n_new = sum(len(pdf) for pdf in pdfs)
        n_old = state.get[0] if state.exists else 0
        n = n_old + n_new
        state.update((n,))
        if state_timeout_ms:
            state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(
            {"hash": [key[0]], "n_rows": [n], "is_dupe": [n > 1]}
        )

    return keyed.groupBy("hash").applyInPandasWithState(
        update,
        outputStructType="hash string, n_rows long, is_dupe boolean",
        stateStructType="n_rows long",
        outputMode="update",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if state_timeout_ms else GroupStateTimeout.NoTimeout),
    )


def run_incremental_batches(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    work_dir: str,
    hash_keys: tuple[str, ...] = (),
) -> dict[str, int]:
    """Convenience wrapper: drain source_dir with availableNow and
    report target/ledger row counts."""
    target = os.path.join(work_dir, "target")
    ledger = os.path.join(work_dir, "ledger")
    ckpt = os.path.join(work_dir, "ckpt")
    q = stream_dedup(spark, source_dir, source_schema, target, ledger, ckpt,
                     hash_keys)
    q.awaitTermination()
    return {
        "target": spark.read.parquet(target).count(),
        "ledger": spark.read.parquet(ledger).count(),
    }
