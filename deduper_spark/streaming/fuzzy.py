"""Streaming FUZZY (near-dup) ingestion dedup.

Generalizes the reference's cross-run seen-hash ledger
(Deduper.kt:135-158) from exact MD5 keys to perceptual fingerprints:
the durable state is a BUCKET ledger — one row per (band, bucket,
fingerprint, id) from the engine's int64 banding — and every
micro-batch is joined against it on (band, bucket) with the inline
``bit_count(xor) <= t`` predicate, exactly the
hamming_candidate_pairs shape (operators/lsh.py). A batch row whose
fingerprint sits within Hamming t of ANY previously-ingested row is a
near-dup and is dropped; survivors append their bucket rows.

Semantics: a batch row is dropped iff it is (a) within t of a RETAINED
representative in the ledger, or (b) a non-minimal member of a
within-batch near-dup component — the SAME connected-components
keep-first rule the flagship batch pipeline applies
(operators/cc.py + keep-first, Deduper.kt:207-224), so batch and
streaming ingestion of identical data retain identical survivors.
The ledger holds surviving representatives only (in exact mode that
equals the reference's all-hashes ledger, since dropped rows share a
survivor's key; in fuzzy mode representatives ARE the state).
Cross-batch transitive closure is out of scope by design: a streaming
filter decides per arrival; full-history re-clustering belongs to the
batch pipeline.

Effectively-once: both outputs are batch_id-partitioned dynamic
overwrites and the ledger read excludes the current batch_id, so a
retried batch replaces its own partitions and can never see its own
partial write — same contract as streaming/incremental.py.

Scale note: the ledger join is an equi-join on (band, bucket), hash-
partitioned, with the SAME sizing/salt/cap guard family as the batch
candidate path (operators/lsh.py): each batch sizes the ledger's
buckets once; buckets over ``max_bucket_size`` are salted — ledger
rows get pmod(xxhash64(val), n_sub) and each probing batch row
replicates across all n_sub salts, so the match test stays EXACT
while per-task fan-in is bounded by ~max_bucket_size; buckets over
``ledger_bucket_cap`` are stop-patterns (a 16-bit band value shared
by 20k+ mutually-distant survivors), dropped from the join and
METERED via ``on_metrics`` — a batch row whose only shared band is
capped is admitted (bounded, reported recall trade — identical
policy to candidate_pairs' salt_cap). Banding contract unchanged:
band_bits=16 → 4 bands x 2^16 buckets; pigeonhole guarantees recall
for Hamming <= n_bands-1 = 3, the default max_hamming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deduper_spark.errors import MISSING_OR_EMPTY_PATH, absent_state


def _band_rows(df: DataFrame, id_col: str, fp_col: str,
               band_bits: int, max_hamming: int) -> DataFrame:
    from deduper_spark.operators.lsh import int64_band_buckets

    return int64_band_buckets(df, id_col, fp_col, band_bits=band_bits,
                              family="fp", max_hamming=max_hamming)


def stream_fuzzy_dedup(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    target_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    id_col: str,
    fingerprint_col: str,
    max_hamming: int = 3,
    band_bits: int = 16,
    available_now: bool = True,
    max_bucket_size: int = 200,
    ledger_bucket_cap: int = 20_000,
    on_metrics=None,
    dropped_dir: str | None = None,
):
    """Start (and return) the streaming query. See module docstring.

    ``on_metrics(dict)`` (optional) is invoked once per non-empty batch
    with the ledger-guard accounting: {batch_id, ledger_salted_buckets,
    ledger_dropped_buckets, ledger_dropped_rows}.

    ``dropped_dir`` (optional): persist each dropped row's (id,
    fingerprint, batch_id) — 16 bytes of BRIDGE EVIDENCE per discarded
    row, no payload. compact_streaming_output then merges retained rows
    whose only connection ran through dropped rows (the chained-dup
    divergence), converging the stream to the batch pipeline's
    clustering."""
    from pyspark.errors import AnalysisException

    stream = spark.readStream.schema(source_schema).parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if batch_df.isEmpty():
            # an empty batch must not write a _SUCCESS-only ledger dir:
            # the next batch's schema inference would fail permanently
            # (UNABLE_TO_INFER_SCHEMA), bricking the stream
            return
        # one fingerprint per id; exact-equal fingerprints collapse
        # keep-first immediately (min id per fingerprint)
        base = (batch_df
                .withColumn("_fp", F.col(fingerprint_col))
                .withColumn(
                    "_rk",
                    F.row_number().over(
                        Window.partitionBy("_fp").orderBy(F.col(id_col))))
                .where("_rk = 1").drop("_rk"))
        bands = _band_rows(base, id_col, "_fp", band_bits, max_hamming)

        ham = F.bit_count(F.col("val").bitwiseXOR(F.col("val_r")))
        # vs ledger: drop any batch row within t of ANY prior row.
        # Guarded join (module docstring "Scale note"): size the
        # ledger's buckets, salt hot ones (exact — batch rows probe
        # every salt), drop + meter stop-pattern buckets over the cap.
        sizes = None
        try:
            ledger = (s.read.parquet(ledger_dir)
                      .where(F.col("batch_id") < batch_id)
                      .select("band", "bucket",
                              F.col("val").alias("val_r")))
            sizes = (ledger.groupBy("band", "bucket")
                     .agg(F.count("*").alias("lsz")).persist())
            lsz = F.col("lsz")
            if on_metrics is not None:
                # the accounting agg + collect is one extra Spark job
                # per batch whose only consumer is the callback — skip
                # it entirely on the default no-callback hot path
                stats = sizes.agg(
                    F.coalesce(F.sum(F.when(
                        lsz > ledger_bucket_cap, 1).otherwise(0)),
                        F.lit(0)).alias("dropped_buckets"),
                    F.coalesce(F.sum(F.when(
                        lsz > ledger_bucket_cap, lsz).otherwise(0)),
                        F.lit(0)).alias("dropped_rows"),
                    F.coalesce(F.sum(F.when(
                        (lsz > max_bucket_size)
                        & (lsz <= ledger_bucket_cap), 1).otherwise(0)),
                        F.lit(0)).alias("salted_buckets"),
                ).collect()[0]
                on_metrics({
                    "batch_id": batch_id,
                    "ledger_salted_buckets": int(stats["salted_buckets"]),
                    "ledger_dropped_buckets": int(stats["dropped_buckets"]),
                    "ledger_dropped_rows": int(stats["dropped_rows"]),
                })
            admitted = sizes.where(lsz <= ledger_bucket_cap)
            n_sub = F.greatest(
                F.ceil(lsz / F.lit(max_bucket_size)), F.lit(1)
            ).cast("int")
            led = (ledger.join(admitted, ["band", "bucket"])
                   .withColumn("salt", F.pmod(F.xxhash64("val_r"),
                                              n_sub).cast("int"))
                   .drop("lsz"))
            probes = (bands.join(admitted, ["band", "bucket"])
                      .withColumn("salt", F.explode(
                          F.sequence(F.lit(0), n_sub - 1)))
                      .drop("lsz"))
            seen_ids = (probes.join(led, ["band", "bucket", "salt"])
                        .where(ham <= max_hamming)
                        .select(F.col("id").alias(id_col)).distinct())
        except AnalysisException as exc:
            # ONLY a genuinely absent or empty ledger is a first run;
            # corrupt or unreadable state must raise, not silently
            # disable dedup (same narrowing as pipeline._preload_seen)
            if not absent_state(exc, MISSING_OR_EMPTY_PATH):
                raise
            seen_ids = None
        fresh = (base.join(seen_ids, id_col, "left_anti")
                 if seen_ids is not None else base)

        # within-batch: connected components over near pairs, keep the
        # min id per component — identical survivor rule to the batch
        # pipeline (so batch vs streaming ingestion agree). Pair
        # generation goes through hamming_candidate_pairs — the bucket
        # rows already carry (val, max_ham) — so hot-bucket
        # sizing/salting/caps apply to a skewed batch (a crawler
        # hiccup emitting thousands of near-identical rows) exactly as
        # in the batch operators.
        from deduper_spark.operators.cc import connected_components
        from deduper_spark.operators.lsh import hamming_candidate_pairs

        fresh = fresh.localCheckpoint()    # pins the anti-join; feeds
        #                                    banding AND the final join
        if sizes is not None:
            sizes.unpersist()   # the ledger-guard joins are pinned in
            #                     `fresh` now; the sizing cache is done
        fb = _band_rows(fresh, id_col, "_fp", band_bits, max_hamming)
        pairs, _dropped = hamming_candidate_pairs(fb)
        comps = connected_components(pairs.select("id_l", "id_r"))
        dropped = (comps.where(F.col("id") != F.col("cluster_id"))
                   .select(F.col("id").alias(id_col)))
        survivors = (fresh.join(dropped, id_col, "left_anti")
                     .withColumn("batch_id", F.lit(batch_id))
                     .localCheckpoint())   # compute once for both sinks

        out_bands = (_band_rows(survivors, id_col, "_fp",
                                band_bits, max_hamming)
                     .select("band", "bucket", "val",
                             F.col("id").alias(id_col))
                     .withColumn("batch_id", F.lit(batch_id)))
        sinks = [(survivors.drop("_fp"), target_dir),
                 (out_bands, ledger_dir)]
        if dropped_dir is not None:
            # bridge evidence: every ORIGINAL batch row that did not
            # survive (ledger-dropped or within-batch non-minimal),
            # id + fingerprint only
            dropped_rows = (base
                            .join(survivors.select(id_col),
                                  id_col, "left_anti")
                            .select(id_col,
                                    F.col("_fp").alias(fingerprint_col))
                            .withColumn("batch_id", F.lit(batch_id)))
            sinks.append((dropped_rows, dropped_dir))
        for cols, path in sinks:
            (cols.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch_id").parquet(path))

    writer = (stream.writeStream.foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_streaming_output(
    spark: SparkSession,
    target_dir: str,
    id_col: str,
    fingerprint_col: str,
    max_hamming: int = 3,
    band_bits: int = 16,
    dropped_dir: str | None = None,
) -> DataFrame:
    """Periodic batch re-clustering of a fuzzy stream's output — the
    documented closure for the streaming-vs-batch divergence on
    chained duplicates (module docstring: no cross-batch transitive
    closure in the per-arrival filter).

    Runs the SAME machinery as the batch pipeline (int64 banding ->
    hamming_candidate_pairs -> connected components) over the retained
    rows UNIONED with the dropped-row bridge evidence (id +
    fingerprint, written when the stream ran with ``dropped_dir``).
    A chain A~B~C ingested across micro-batches retains {A, C} online
    (B, the bridge, was dropped and is not in the target); with B's
    fingerprint as evidence the component {A, B, C} reassembles and
    the compacted output keeps only A. Per component the survivor is
    the MIN-ID RETAINED row — compaction merges, it never resurrects
    (dropped payloads are gone by design); with monotonically assigned
    ingest ids (the standard case) that equals the one-shot batch
    pipeline's keep-first result, pinned by test. Without
    ``dropped_dir`` the pass still merges retained rows that are
    directly within Hamming t of each other. Intended cadence:
    periodic (nightly) — the reference's rebuild-the-ledger role
    (Deduper.kt:135-158) generalized to fuzzy keys."""
    from pyspark.errors import AnalysisException

    from deduper_spark.operators.cc import connected_components
    from deduper_spark.operators.lsh import hamming_candidate_pairs

    try:
        retained = spark.read.parquet(target_dir)
    except AnalysisException as exc:
        # "stream ran but every batch was empty" is a reachable state
        # (empty batches short-circuit before any write), so a
        # scheduled compaction must not crash on the absent target —
        # there is nothing to compact. The payload schema is unknowable
        # without data; return the minimal streamed-output schema.
        if not absent_state(exc, MISSING_OR_EMPTY_PATH):
            raise
        return spark.createDataFrame(
            [], f"`{id_col}` string, `{fingerprint_col}` bigint, "
                "batch_id bigint")
    nodes = retained.select(F.col(id_col).alias("id"),
                            F.col(fingerprint_col).alias("_fp"))
    if dropped_dir is not None:
        try:
            bridges = (spark.read.parquet(dropped_dir)
                       .select(F.col(id_col).alias("id"),
                               F.col(fingerprint_col).alias("_fp")))
            nodes = nodes.unionByName(bridges)
        except AnalysisException as exc:
            if not absent_state(exc, MISSING_OR_EMPTY_PATH):
                raise
            # no dropped rows recorded yet: retained-only compaction

    bands = _band_rows(nodes, "id", "_fp", band_bits, max_hamming)
    pairs, _dropped = hamming_candidate_pairs(bands)
    comps = connected_components(pairs.select("id_l", "id_r"))
    # component rep = min id among RETAINED members (bridges only
    # connect; they cannot win — their payloads no longer exist)
    retained_comps = (retained.select(F.col(id_col).alias("id"))
                      .join(comps, "id", "left")
                      .withColumn("cluster_id",
                                  F.coalesce("cluster_id", F.col("id"))))
    reps = (retained_comps.groupBy("cluster_id")
            .agg(F.min("id").alias("rep")))
    keep = reps.select(F.col("rep").alias(id_col))
    return retained.join(keep, id_col, "left_semi")
