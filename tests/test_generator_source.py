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
