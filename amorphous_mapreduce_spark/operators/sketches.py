"""Mergeable sketch operators: count-min heavy hitters over token streams.

The sketch family a 100 TB pipeline uses where exact state is too big to
keep per key. The reference's per-key aggregation (W7,
src/word_count.rs:121-123) is the exact form; the count-min sketch is
its sublinear-state sibling: a d x m grid of counters updated by d
independent hashes, whose per-cell sums are mergeable across partitions,
files, and days (counter grids add elementwise — the same property that
makes the reference's disjoint-merge W8 trivial).

Everything is deterministic integer arithmetic over MD5-derived hashes
(functions.hashing.hex_hash64 with per-depth salts), so the full sketch
state AND the estimates replay bit-identically in SQL on any engine —
the sketch is oracle-checkable, not just plausible.

Scale: building cells from per-word partial counts (ONE hash aggregate
on the token stream, map-side combined) means the d-way fanout happens
on |vocab| rows, never on raw token occurrences; the cell grid is d*m
rows total regardless of corpus size. Estimation joins words to cells on
the (depth, bucket) key — the d*m cell table is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.hashing import hex_hash64
from amorphous_mapreduce_spark.operators.dedup import tokenized


def _bucket(word, depth: int, width: int):
    """MD5-derived CMS bucket for ``word`` at ``depth`` — replayable in
    DuckDB as the same md5-substring arithmetic."""
    return F.pmod(hex_hash64(F.concat(F.lit(f"cms{depth}_"), word)), F.lit(width))


def cms_cells(
    docs: DataFrame,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The sketch state: [depth, bucket, cell] — d x m counter grid.

    Built from per-word exact partials (one token-stream aggregate),
    then d rows per vocab word summed into cells. Cells are mergeable:
    grids from disjoint corpus shards add elementwise.
    """
    tf = (
        tokenized(docs, id_col, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    per_depth = [
        tf.select(
            F.lit(d).alias("depth"),
            _bucket(F.col("word"), d, width).alias("bucket"),
            F.col("c"),
        )
        for d in range(depth)
    ]
    updates = per_depth[0]
    for u in per_depth[1:]:
        updates = updates.unionByName(u)
    return updates.groupBy("depth", "bucket").agg(F.sum("c").alias("cell"))


def cms_heavy_hitters(
    docs: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k words by exact count, with their count-min estimate:
    [word, exact_count, cms_est] — demonstrating the sketch's
    overestimate bound (cms_est >= exact_count always; equality when no
    bucket collisions at the word's min cell).

    The cell grid (d*m rows, corpus-size independent) is broadcast onto
    the per-word depth rows; the estimate is MIN over depths.
    """
    tf = (
        tokenized(docs, id_col, text_col)
        .groupBy("word")
        .agg(F.count("*").alias("exact_count"))
    )
    cells = cms_cells(docs, depth=depth, width=width, id_col=id_col, text_col=text_col)
    wb = tf.select(
        "word",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col("word"), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select("word", "exact_count", F.col("db.depth"), F.col("db.bucket"))
    est = (
        wb.join(F.broadcast(cells), ["depth", "bucket"])
        .groupBy("word", "exact_count")
        .agg(F.min("cell").alias("cms_est"))
    )
    # global ordered limit -> TakeOrderedAndProject (distributed top-k
    # merge), never a whole-vocabulary single-partition window
    return est.orderBy(F.desc("exact_count"), F.asc("word")).limit(k)
