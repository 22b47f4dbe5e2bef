from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.sources.merge import (
    merge_upsert,
    read_latest,
    read_version,
    upsert_parquet,
)


def test_merge_upsert_transform(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "name", "v"]
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (4, "d", 40.0)], ["id", "name", "v"]
    )
    got = {r["id"]: (r["name"], r["v"]) for r in merge_upsert(base, updates, ["id"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_versioned_upsert_and_time_travel(spark, tmp_path):
    table = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "v"])
    assert upsert_parquet(spark, table, b0, ["id"]) == 0
    u1 = spark.createDataFrame([(2, 21.0), (3, 30.0)], ["id", "v"])
    assert upsert_parquet(spark, table, u1, ["id"]) == 1

    latest = {r["id"]: r["v"] for r in read_latest(spark, table).collect()}
    assert latest == {1: 10.0, 2: 21.0, 3: 30.0}
    # time travel: v0 unchanged (copy-on-write immutability)
    v0 = {r["id"]: r["v"] for r in read_version(spark, table, 0).collect()}
    assert v0 == {1: 10.0, 2: 20.0}


def test_upsert_idempotent_replay(spark, tmp_path):
    table = str(tmp_path / "tbl2")
    b0 = spark.createDataFrame([(1, 1.0)], ["id", "v"])
    upsert_parquet(spark, table, b0, ["id"])
    u = spark.createDataFrame([(1, 2.0)], ["id", "v"])
    upsert_parquet(spark, table, u, ["id"])
    upsert_parquet(spark, table, u, ["id"])  # replaying the same update
    latest = {r["id"]: r["v"] for r in read_latest(spark, table).collect()}
    assert latest == {1: 2.0}
    assert read_latest(spark, table).count() == 1


def test_read_latest_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_latest(spark, str(tmp_path / "nope"))


def test_stream_upsert_foreachbatch(spark, tmp_path):
    from amorphous_mapreduce_spark.streaming.sink import stream_upsert

    src = str(tmp_path / "cdc_src")
    table = str(tmp_path / "cdc_table")
    ckpt = str(tmp_path / "cdc_ckpt")
    b1 = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["id", "v"])
    b2 = spark.createDataFrame([(2, 21.0), (3, 30.0)], ["id", "v"])
    b1.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    b2.coalesce(1).write.mode("append").parquet(src + "/b2")
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = stream_upsert(stream, table, ["id"], ckpt)
    q.awaitTermination(120)
    latest = {r["id"]: r["v"] for r in read_latest(spark, table).collect()}
    # whichever batch order, id=1 and id=3 are unambiguous; id=2 is one of
    # its two versions (20.0 if b2 processed first, 21.0 otherwise)
    assert latest[1] == 10.0 and latest[3] == 30.0
    assert latest[2] in (20.0, 21.0)
    assert len(latest) == 3


def test_merge_upsert_dedupes_multirow_updates(spark):
    # An update batch with several rows per key must yield ONE
    # deterministic survivor (greatest under order_cols desc), never
    # duplicate keys in the snapshot.
    base = spark.createDataFrame([(1, "a", 0)], ["id", "name", "seq"])
    updates = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "x", 1), (2, "y", 2)],
        ["id", "name", "seq"],
    )
    for _ in range(3):  # stable across repeated runs
        got = {
            r["id"]: (r["name"], r["seq"])
            for r in merge_upsert(base, updates, ["id"], order_cols=["seq"]).collect()
        }
        assert got == {1: ("new", 2), 2: ("y", 2)}


def test_merge_upsert_default_ordering_deterministic(spark):
    # No order_cols: survivor is the greatest row over the remaining
    # columns — still deterministic run-to-run.
    base = spark.createDataFrame([], "id long, name string")
    updates = spark.createDataFrame(
        [(1, "alpha"), (1, "zeta"), (1, "mid")], ["id", "name"]
    )
    runs = [
        {r["id"]: r["name"] for r in merge_upsert(base, updates, ["id"]).collect()}
        for _ in range(3)
    ]
    assert runs[0] == {1: "zeta"} and runs.count(runs[0]) == 3


def test_upsert_parquet_first_version_dedupes(spark, tmp_path):
    table = str(tmp_path / "tbl_dedup_v0")
    b0 = spark.createDataFrame(
        [(1, 1.0, 1), (1, 2.0, 2)], ["id", "v", "seq"]
    )
    upsert_parquet(spark, table, b0, ["id"], order_cols=["seq"])
    rows = read_latest(spark, table).collect()
    assert len(rows) == 1 and rows[0]["v"] == 2.0


def test_vacuum_retention(spark, tmp_path):
    import os

    from amorphous_mapreduce_spark.sources.merge import vacuum

    table = str(tmp_path / "vtbl")
    for i in range(4):
        upsert_parquet(
            spark,
            table,
            spark.createDataFrame([(1, float(i))], ["id", "v"]),
            ["id"],
        )
    # a non-version directory must be ignored by the vacuum sweep
    os.makedirs(os.path.join(table, "v=1_tmp"), exist_ok=False)
    removed = vacuum(table, keep_last=2)
    assert removed == [0, 1]
    assert sorted(
        d for d in os.listdir(table) if d.startswith("v=") and "_tmp" not in d
    ) == ["v=2", "v=3"]
    # latest still reads, kept versions still time-travel
    assert {r["v"] for r in read_latest(spark, table).collect()} == {3.0}
    assert {r["v"] for r in read_version(spark, table, 2).collect()} == {2.0}
    # latest never removable
    assert vacuum(table, keep_last=1) == [2]
    with pytest.raises(ValueError):
        vacuum(table, keep_last=0)
    # idempotent on an already-clean table
    assert vacuum(table, keep_last=1) == []


def test_vacuum_reaps_crashed_writes(spark, tmp_path):
    import os

    from amorphous_mapreduce_spark.sources.merge import vacuum

    table = str(tmp_path / "ctbl")
    for i in range(2):
        upsert_parquet(
            spark,
            table,
            spark.createDataFrame([(1, float(i))], ["id", "v"]),
            ["id"],
        )
    # crashed write: directory without _SUCCESS, below the latest commit
    os.makedirs(os.path.join(table, "v=0"), exist_ok=True)  # already committed
    crash = os.path.join(table, "v=5")
    # a crashed FUTURE write (above latest) must be left alone — it may
    # be an in-flight writer about to commit
    os.makedirs(crash)
    removed = vacuum(table, keep_last=2)
    assert removed == []
    assert os.path.isdir(crash)


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    import glob
    import os

    from amorphous_mapreduce_spark.sources.merge import compact, vacuum

    table = str(tmp_path / "frag")
    # fragmented snapshot written directly: explicit repartition(32) is
    # not AQE-coalescible, so v=0 really lands as many small files
    frag = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], ["id", "v"]
    ).repartition(32)
    frag.write.parquet(os.path.join(table, "v=0"))
    n_before = len(glob.glob(os.path.join(table, "v=0", "*.parquet")))
    assert n_before > 8
    new_v = compact(spark, table, target_partitions=4)
    assert new_v == 1
    n_after = len(glob.glob(os.path.join(table, f"v={new_v}", "*.parquet")))
    assert n_after <= 4
    got = {(r["id"], r["v"]) for r in read_latest(spark, table).collect()}
    assert got == {(i, float(i)) for i in range(100)}
    # reclaim the fragmented snapshot
    assert vacuum(table, keep_last=1) == [0]


def test_merge_schema_evolution_additive(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    import pytest as _pytest

    from amorphous_mapreduce_spark.sources.merge import (
        read_latest,
        read_version,
        upsert_parquet,
    )

    path = str(tmp_path / "evolving")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, payload string"
    )
    upsert_parquet(spark, path, base, keys=["id"])

    upd = spark.createDataFrame(
        [(2, "b2", 0.9), (3, "c", 0.5)], "id long, payload string, score double"
    )
    # without the flag: loud failure, no new version
    with _pytest.raises(AnalysisException):
        upsert_parquet(spark, path, upd, keys=["id"])
    assert read_latest(spark, path).columns == ["id", "payload"]

    v = upsert_parquet(spark, path, upd, keys=["id"], evolve_schema=True)
    latest = read_latest(spark, path).orderBy("id").collect()
    assert [r.id for r in latest] == [1, 2, 3]
    got = {r.id: (r.payload, r.score) for r in latest}
    assert got[1] == ("a", None)  # untouched base row: NULL new column
    assert got[2] == ("b2", 0.9)
    assert got[3] == ("c", 0.5)
    # time travel across the boundary keeps the per-version schema
    assert read_version(spark, path, v - 1).columns == ["id", "payload"]
    assert "score" in read_version(spark, path, v).columns
