"""Spatial grid-join queries (operators/spatial.py).

Geospatial battery over MD5-derived planar coordinates: grid-cell
blocked nearest-neighbor (the lossless 3x3 halo join) and hotspot cell
density — the two shapes every geo pipeline runs (delivery matching,
store-catchment density). Coordinates are synthetic (the fixtures have
no geography) but the operator plumbing — cell bucketing, halo explode,
keyed equi-join, per-query top-1 — is exactly what runs on real
lat/lon after a fixed-point projection.

Reference tie-in: 2-D hash placement (W6, src/word_count.rs:117-120) +
grid tiling with halo 1 (G3, src/outer_product.rs:146-169).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.spatial import (
    cell_histogram,
    grid_nearest_neighbor,
    hashed_points,
)
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

NN_RADIUS = 50_000
HOT_CELL = 20_000
HOT_K = 20


def _coord(axis: str) -> str:
    return (
        f"CAST('0x' || substr(md5('g{axis}_' || CAST(c_custkey AS VARCHAR)),"
        " 1, 15) AS BIGINT) % 1000000"
    )


_PTS_CTE = f"""
pts AS (
    SELECT c_custkey AS id, {_coord('x')} AS x, {_coord('y')} AS y
    FROM customer
)
"""

NN_ORACLE = (
    "WITH "
    + _PTS_CTE
    + f"""
, cells AS (
    SELECT id, x, y, x // {NN_RADIUS} AS cx, y // {NN_RADIUS} AS cy FROM pts
),
q AS (
    SELECT id AS qid, x AS qx, y AS qy, cx, cy
    FROM cells WHERE id % 20 = 0
),
probe AS (
    SELECT qid, qx, qy, q.cx + dx.o AS cx, q.cy + dy.o AS cy
    FROM q
    CROSS JOIN (VALUES (-1), (0), (1)) AS dx(o)
    CROSS JOIN (VALUES (-1), (0), (1)) AS dy(o)
),
cand AS (
    SELECT p.qid, c.id AS nid,
           (c.x - p.qx) * (c.x - p.qx) + (c.y - p.qy) * (c.y - p.qy) AS d2
    FROM probe p JOIN cells c ON p.cx = c.cx AND p.cy = c.cy
    WHERE c.id <> p.qid
)
SELECT qid, nid, d2 FROM (
    SELECT qid, nid, d2,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, nid) AS rn
    FROM cand WHERE d2 <= {NN_RADIUS * NN_RADIUS}
) WHERE rn = 1
"""
)


@register("spatial_nearest_neighbor", NN_ORACLE)
def q_spatial_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest other customer within 50k planar units for every 20th
    customer — grid-cell blocked (cell = radius, lossless 3x3 halo),
    exact integer squared distances, (d2, id) total-order pick.

    Scale: ONE equi-join on cell ids with a 9-row query-side halo
    explode; candidate volume is 9 x cell occupancy per query, never
    all-pairs. The top-1 window is keyed per query point."""
    cust = load_table(spark, sf_dir, "customer")
    points = hashed_points(cust, "c_custkey")
    queries = points.filter(F.col("id") % 20 == 0)
    return grid_nearest_neighbor(points, queries, NN_RADIUS)


HOT_ORACLE = (
    "WITH "
    + _PTS_CTE
    + f"""
SELECT x // {HOT_CELL} AS cx, y // {HOT_CELL} AS cy,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM pts
GROUP BY cx, cy
ORDER BY n_points DESC, cx, cy
LIMIT {HOT_K}
"""
)


@register("spatial_hotspots", HOT_ORACLE)
def q_spatial_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 densest 20k-unit grid cells — the hotspot density scan
    (one hash aggregate on cell ids, TakeOrderedAndProject top-k).
    The cell grid is area-bounded (50x50 here), corpus-independent."""
    cust = load_table(spark, sf_dir, "customer")
    return cell_histogram(hashed_points(cust, "c_custkey"), HOT_CELL, HOT_K)
