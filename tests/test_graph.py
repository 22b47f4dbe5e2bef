from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_connected_components_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11 plus singleton via nodes
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["qid", "nid"]
    )
    nodes = spark.createDataFrame([(99,)], ["id"])
    cc = {
        r["id"]: r["component"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert cc[1] == cc[2] == cc[3] == cc[4] == 1
    assert cc[10] == cc[11] == 10
    assert cc[99] == 99


def test_connected_components_deep_chain_converges(spark):
    # diameter 40: still converges within the iteration cap because the
    # min label jumps across the whole visited frontier each round
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["qid", "nid"]
    )
    cc = connected_components(edges, max_iter=20)
    assert cc.select("component").distinct().count() == 1


def test_dedup_clusters_keepers(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], ["qid", "nid"])
    rows = {r["id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert rows[0]["cluster"] == rows[3]["cluster"] == rows[5]["cluster"] == 0
    keepers = {i for i, r in rows.items() if r["is_keeper"]}
    assert keepers == {0, 1, 2, 4}
