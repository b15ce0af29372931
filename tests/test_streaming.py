"""Structured Streaming lane: batch/stream parity, multi-batch replay,
stateful operator incremental correctness (streaming/pipeline.py)."""

from pyspark.sql import functions as F

from whitebox_tools_spark.streaming import pipeline as sp

SF = "/root/testdata/sf0.001"


def test_streaming_tile_assign_matches_batch(spark):
    from whitebox_tools_spark.api import QUERIES

    got = sorted(tuple(r) for r in sp.streaming_tile_assign(spark, SF).collect())
    want = sorted(tuple(r) for r in QUERIES["tile_assign"](spark, SF).collect())
    assert got == want


def test_streaming_token_stats_matches_batch(spark):
    from whitebox_tools_spark.api import QUERIES

    got = sorted(tuple(r) for r in sp.streaming_token_stats(spark, SF).collect())
    want = sorted(tuple(r) for r in QUERIES["token_stats"](spark, SF).collect())
    assert got == want


def test_streaming_window_counts_matches_batch_agg(spark):
    got = sp.streaming_window_counts(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want = (
        ev.groupBy(
            (F.floor(F.col("ts").cast("timestamp").cast("long") / 3600) * 3600)
            .alias("win_start_epoch"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def _split_events(spark, tmp_path, n_files=4):
    """Re-write the events fixture as n parquet files so the throttled
    file source replays it in multiple micro-batches."""
    src = spark.read.parquet(f"{SF}/events.parquet")
    out = str(tmp_path / "events.parquet")
    src.repartition(n_files).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_stateful_session_peaks_multi_batch(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: replaying
    the events table one file per trigger must converge to the same
    per-user (count, peak) as a single-batch run and as a batch groupBy."""
    sf_dir = _split_events(spark, tmp_path)

    ev = sp.stream_table(spark, sf_dir, "events", max_files_per_trigger=1)
    out = ev.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        sp._session_peaks_fn,
        outputStructType=sp._SESSION_SCHEMA,
        stateStructType=sp._STATE_SCHEMA,
        outputMode="update",
        timeoutConf=sp.GroupStateTimeout.NoTimeout,
    )
    updates = sp.run_available_now(out, "peaks_multibatch", "update")
    final = (
        updates.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("peak_value").alias("peak_value"))
    )
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("peak_value"))
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, want.collect()))
    # and the per-key update stream is genuinely incremental: some user
    # must have emitted more than one state update across batches
    n_updates = updates.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert n_updates > 1


def test_multi_batch_window_counts(spark, tmp_path):
    """Watermarked windowed agg over a multi-batch replay (complete mode)
    equals the one-batch result: the watermark never drops fixture rows
    because AvailableNow replays in file order within the run."""
    sf_dir = _split_events(spark, tmp_path, n_files=3)
    got = sp.streaming_window_counts(spark, sf_dir)
    want = sp.streaming_window_counts(spark, SF)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_is_streaming_plan(spark):
    df = sp.stream_table(spark, SF, "documents")
    assert df.isStreaming


def _split_documents(spark, tmp_path, n_files=4):
    src = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "documents.parquet")
    src.repartition(n_files).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_streaming_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming exact dedup (stateful min-id per content hash) equals
    the batch text.exact_dedup output — including across a multi-batch
    replay where a duplicate group spans micro-batches."""
    from whitebox_tools_spark.operators import text as tx

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = sorted(map(tuple, tx.exact_dedup(docs).select(
        "content_hash", "doc_id").collect()))
    got1 = sorted(map(tuple, sp.streaming_exact_dedup(spark, SF).select(
        "content_hash", "doc_id").collect()))
    assert got1 == want
    sf_dir = _split_documents(spark, tmp_path)
    got_multi = sorted(map(tuple, sp.streaming_exact_dedup(spark, sf_dir).select(
        "content_hash", "doc_id").collect()))
    assert got_multi == want


def test_drop_duplicates_within_watermark_smoke(spark, tmp_path):
    """The built-in watermarked streaming dedup drops exact duplicate
    events inside the watermark window: the surviving (user_id, ts) key
    set equals the batch distinct (survivor row is arrival-arbitrary,
    which is why the oracle row uses the stateful min-id variant)."""
    sf_dir = _split_events(spark, tmp_path, n_files=2)
    ev = sp.stream_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).withWatermark("ts", "1 hour")
    dedup = ev.dropDuplicatesWithinWatermark(["user_id", "ts"])
    got = sp.run_available_now(dedup, "wm_dedup")
    want = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")).distinct()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_streaming_media_stats_matches_batch(spark):
    from whitebox_tools_spark.operators import media
    from whitebox_tools_spark.sources.tables import documents
    from whitebox_tools_spark.streaming import pipeline as sp

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, sp.streaming_media_stats(spark, sf).collect()))
    want = sorted(map(tuple, media.image_stats(
        media.synth_bmp_media(documents(spark, sf))).collect()))
    assert got == want


def test_streaming_restart_from_checkpoint_exactly_once(spark, tmp_path):
    """The production resumability contract: a file-source stream with a
    DURABLE checkpointLocation is stopped after batch 1; new input
    arrives; the restarted query (same checkpoint) processes ONLY the
    new file — every row lands exactly once across the restart. This is
    the streaming twin of the batch snapshot-resume test in
    test_checkpoint.py."""
    in_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    in_dir.mkdir()

    spark.range(0, 10).selectExpr("id", "id * 2 AS v").coalesce(1) \
        .write.parquet(str(in_dir / "f1.parquet"))
    schema = spark.read.parquet(str(in_dir / "*")).schema

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .parquet(str(in_dir) + "/*"))
        q = (stream.writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run_once()
    got1 = {r.id for r in spark.read.parquet(out_dir).collect()}
    assert got1 == set(range(10))

    spark.range(10, 20).selectExpr("id", "id * 2 AS v").coalesce(1) \
        .write.parquet(str(in_dir / "f2.parquet"))
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    ids = sorted(r.id for r in rows)
    # exactly once: f1 NOT reprocessed after the restart, f2 appended
    assert ids == list(range(20))
    assert all(r.v == r.id * 2 for r in rows)
