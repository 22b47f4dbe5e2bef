"""Compliance battery invariants: redaction completeness, cascade
conservation, and sketch bounds (queries/compliance_queries.py,
operators/sketches.cms_join_size, queries/eval_queries.embedding_gram)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries.compliance_queries import (
    q_forget_audit,
    q_pii_redaction,
)
from amorphous_mapreduce_spark.queries.eval_queries import q_embedding_gram
from amorphous_mapreduce_spark.queries.sketch_queries import q_cms_join_size
from amorphous_mapreduce_spark.sources import load_table


def test_pii_redaction_masks_every_digit_run(spark, sf_dir):
    rows = q_pii_redaction(spark, sf_dir).collect()
    assert rows
    # every c_name carries exactly one >=4-digit run (the ordinal)
    for r in rows:
        assert r.ids_found == r.n_rows
        # all names collapse to the same masked form per segment
        assert r.n_distinct_redacted == 1
    # no digits survive redaction anywhere
    n_leaky = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.regexp_replace(F.col("c_name"), "[0-9]{4,}", "<ID>").alias("red")
        )
        .filter(F.col("red").rlike("[0-9]{4,}"))
        .count()
    )
    assert n_leaky == 0


def test_forget_audit_conserves_rows(spark, sf_dir):
    rows = {r.tbl: r for r in q_forget_audit(spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    for name in ("customer", "orders", "lineitem"):
        total = load_table(spark, sf_dir, name).count()
        r = rows[name]
        assert r.n_deleted + r.n_surviving == total
        assert r.n_deleted > 0  # the 5% cohort is non-empty at every SF
        assert r.surviving_value > 0


def test_forget_cascade_is_consistent(spark, sf_dir):
    """Orders of deleted customers are deleted; lineitems follow orders."""
    rows = {r.tbl: r for r in q_forget_audit(spark, sf_dir).collect()}
    # every deleted order's lineitems must be deleted: the lineitem
    # deleted count equals the semi-join of lineitem against deleted
    # orders (recomputed independently here)
    from amorphous_mapreduce_spark.functions.hashing import hex_hash64

    cust = load_table(spark, sf_dir, "customer")
    tomb = cust.filter(
        F.pmod(
            hex_hash64(
                F.concat(F.lit("forget_"), F.col("c_custkey").cast("string"))
            ),
            F.lit(20),
        )
        == 0
    ).select("c_custkey")
    del_orders = (
        load_table(spark, sf_dir, "orders")
        .join(tomb, F.col("o_custkey") == F.col("c_custkey"), "semi")
        .select("o_orderkey")
    )
    n_li = (
        load_table(spark, sf_dir, "lineitem")
        .join(del_orders, F.col("l_orderkey") == F.col("o_orderkey"), "semi")
        .count()
    )
    assert rows["lineitem"].n_deleted == n_li


def test_cms_join_size_upper_bounds_exact(spark, sf_dir):
    r = q_cms_join_size(spark, sf_dir).collect()[0]
    assert r.cms_est >= r.exact_rows  # CMS never underestimates
    assert r.overestimate == r.cms_est - r.exact_rows
    # exact side must equal the true join cardinality
    ev = load_table(spark, sf_dir, "events")
    od = load_table(spark, sf_dir, "orders")
    true_n = ev.join(od, ev.user_id == od.o_custkey).count()
    assert r.exact_rows == true_n


def test_embedding_gram_shape_and_diagonal(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    n = emb.count()
    rows = q_embedding_gram(spark, sf_dir).collect()
    assert len(rows) == d * (d + 1) // 2  # upper triangle incl. diagonal
    by_ij = {(r.i, r.j): r for r in rows}
    for i in range(d):
        assert by_ij[(i, i)].gram_q >= 0  # diagonal = sum of squares
        assert by_ij[(i, i)].n_rows == n


def test_k_anonymity_partitions_table(spark, sf_dir):
    from amorphous_mapreduce_spark.queries.compliance_queries import (
        q_k_anonymity,
    )

    rows = q_k_anonymity(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_rows for r in rows) == total  # classes partition rows
    for r in rows:
        assert r.n_rows == r.group_size * r.n_groups
        if r.group_size < 5:
            assert r.n_rows_below_k5 == r.n_rows
        else:
            assert r.n_rows_below_k5 == 0


def test_dp_randomized_response_debiases(spark, sf_dir):
    from amorphous_mapreduce_spark.queries.compliance_queries import (
        q_dp_randomized_response,
    )

    rows = q_dp_randomized_response(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_reported <= r.n_rows
        assert r.est_numer == 4 * r.n_reported - r.n_rows
    # aggregate estimate (sum of numerators / 2*sum n) should land near
    # the aggregate true rate: |est - truth| < 4/sqrt(n) of the mass
    n = sum(r.n_rows for r in rows)
    t = sum(r.n_true for r in rows)
    est = sum(r.est_numer for r in rows) / 2
    assert abs(est - t) < 4 * n**0.5 + 8


def test_dsar_export_referential_consistency(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = {
        r.table_name: r
        for r in QUERIES["dsar_export"](spark, "/root/testdata/sf0.001").collect()
    }
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    assert rows["customer"].n_rows == 1
    # the subject's lineitems exist iff they have orders
    if rows["orders"].n_rows == 0:
        assert rows["lineitem"].n_rows == 0
    else:
        assert rows["lineitem"].n_rows >= rows["orders"].n_rows


def test_spatial_density_clusters_disjoint_cells(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["spatial_density_clusters"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    for r in rows:
        assert r.n_cells >= 1
        assert r.n_points >= r.n_cells  # every core cell has >= minpts
        assert r.min_cx <= r.max_cx and r.min_cy <= r.max_cy
        # bounding box is at least as large as a connected shape needs
        assert r.n_cells <= (r.max_cx - r.min_cx + 1) * (r.max_cy - r.min_cy + 1)
