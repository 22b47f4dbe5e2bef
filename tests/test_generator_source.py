"""Custom Python Data Source (sources/generator.py): partition
planning, pushdown-as-range-pruning, determinism, and stream replay."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.sources.generator import (
    _gen_batch,
    register_synthetic_source,
)


def _load(spark, rows=20000, parts=5):
    register_synthetic_source(spark)
    return (
        spark.read.format("synthetic_events")
        .option("rows", rows)
        .option("numPartitions", parts)
        .load()
    )


def test_count_schema_partitions(spark):
    df = _load(spark)
    assert df.count() == 20000
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
        "value",
    ]
    assert df.rdd.getNumPartitions() == 5


def test_deterministic_and_matches_kernel(spark):
    df = _load(spark, rows=500, parts=3)
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in df.collect()}
    ref = _gen_batch(0, 500).to_pandas()
    for _, row in ref.iterrows():
        assert got[row.event_id] == (row.user_id, row.event_type, row.value)


def test_pushdown_range_pruning_is_lossless(spark):
    df = _load(spark, rows=20000, parts=5)
    pushed = df.filter((F.col("event_id") >= 1500) & (F.col("event_id") < 2500))
    assert pushed.count() == 1000
    ids = [r.event_id for r in pushed.select("event_id").collect()]
    assert min(ids) == 1500 and max(ids) == 2499
    # residual (non-id) filters still evaluated by Spark post-scan
    mixed = df.filter((F.col("event_id") < 1000) & (F.col("event_type") == "view"))
    expect = sum(
        1 for t in _gen_batch(0, 1000).to_pandas().event_type if t == "view"
    )
    assert mixed.count() == expect


def test_empty_range(spark):
    df = _load(spark, rows=1000, parts=4)
    assert df.filter(F.col("event_id") >= 5000).count() == 0


def test_stream_replay_availablenow(spark):
    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 3000)
        .option("rowsPerBatch", 1000)
        .load()
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("synth_replay")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        out = spark.sql("SELECT COUNT(*) AS n, SUM(event_id) AS s FROM synth_replay").first()
        assert out.n == 3000
        assert out.s == 3000 * 2999 // 2


def test_stream_windowed_agg_matches_batch(spark):
    """Watermarked tumbling-window agg over the replayed stream equals
    the same aggregation over the batch read of the identical rows."""
    register_synthetic_source(spark)
    opts = {"rows": 5000, "rowsPerBatch": 1300}

    def with_ts(df):
        # deterministic event-time: one second per id from a fixed epoch
        return df.withColumn(
            "etime", F.timestamp_seconds(F.lit(1700000000) + F.col("event_id"))
        )

    stream = spark.readStream.format("synthetic_events").options(**opts).load()
    agg = (
        with_ts(stream)
        .withWatermark("etime", "10 minutes")
        .groupBy(F.window("etime", "10 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName("synth_win")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["window"].start, r.event_type): (r.n, r.sv)
            for r in spark.sql("SELECT * FROM synth_win").collect()
        }
    batch = (
        with_ts(spark.read.format("synthetic_events").options(**opts).load())
        .groupBy(F.window("etime", "10 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )
    )
    want = {
        (r["window"].start, r.event_type): (r.n, r.sv) for r in batch.collect()
    }
    assert got == want and len(want) > 0
