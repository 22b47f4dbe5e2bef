from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_snapshot_diff_classification(spark):
    diff = QUERIES["snapshot_diff"](spark, SF_DIR).persist()
    by_type = {
        r["change_type"]: r["n"]
        for r in diff.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    }
    # Every 97th key (mod 3 / 5 / 7) was deleted / updated / re-keyed.
    assert set(by_type) == {"insert", "update", "delete"}
    # Updates carry old AND new price, exactly +1.0 apart.
    bad = diff.filter(
        (F.col("change_type") == "update")
        & (F.col("new_totalprice") != F.col("old_totalprice") + F.lit(1.0))
    )
    assert bad.count() == 0
    # Inserts have no old value, deletes no new value.
    assert diff.filter(
        (F.col("change_type") == "insert") & F.col("old_totalprice").isNotNull()
    ).count() == 0
    assert diff.filter(
        (F.col("change_type") == "delete") & F.col("new_totalprice").isNotNull()
    ).count() == 0
    diff.unpersist()


def test_snapshot_diff_volume_is_churn_only(spark):
    # Output rows == churned keys (no unchanged row leaks through).
    from amorphous_mapreduce_spark.sources import load_table

    orders = load_table(spark, SF_DIR, "orders")
    key = F.col("o_orderkey")
    expected = orders.filter(
        (key % 97 == 3) | (key % 97 == 5) | (key % 97 == 7)
    ).count()
    assert QUERIES["snapshot_diff"](spark, SF_DIR).count() == expected


def test_zorder_positions_are_single_cells(spark):
    # The defining Z-order property: one curve position == one
    # (cb, pb) cell, so min==max per dimension in every group — which
    # is exactly what makes file-level min/max stats prune both dims.
    rows = QUERIES["zorder_layout"](spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["cb_min"] == r["cb_max"]
        assert r["pb_min"] == r["pb_max"]
        # Decode the Morton code back to the cell it claims.
        z, cb, pb = r["zval"], 0, 0
        for i in range(4):
            cb |= ((z >> (2 * i)) & 1) << i
            pb |= ((z >> (2 * i + 1)) & 1) << i
        assert (cb, pb) == (r["cb_min"], r["pb_min"])


def test_table_profile_matches_direct_aggregates(spark):
    from amorphous_mapreduce_spark.sources import load_table

    prof = {r["col_name"]: r for r in QUERIES["table_profile"](spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    direct = li.agg(
        F.countDistinct("l_returnflag").alias("d"),
        F.min("l_orderkey").alias("mn"),
        F.max("l_orderkey").alias("mx"),
    ).first()
    assert prof["l_returnflag"]["n_rows"] == n
    assert prof["l_returnflag"]["n_distinct"] == direct["d"]
    assert prof["l_orderkey"]["min_s"] == str(direct["mn"])
    assert prof["l_orderkey"]["max_s"] == str(direct["mx"])
    assert all(r["n_nulls"] == 0 for r in prof.values())
