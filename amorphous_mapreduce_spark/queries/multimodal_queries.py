"""Multimodal-column queries: the operators.multimodal plumbing as
judge-facing registry entries with full SQL oracles.

The codec layer is stubbed (no image/audio libs in this container), but
``fake_decoder`` is a DETERMINISTIC byte->float transform and
``synthetic_media`` blobs are md5-chained from the id — so every stage
(decode, feature-extract, resize, frame-sample) is replayable in pure SQL
over the md5 hex strings and hash-checkable, exactly like the text/dedup
oracles. Frames/contents compare as hex strings because DuckDB 1.0 has no
md5(BLOB); blob slicing maps to hex-substring arithmetic (byte k = hex
chars 2k+1..2k+2).

Reference tie-in: extracted features are array<float> vectors that feed
the E.E^T similarity path (src/outer_product.rs capability, SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    resize_images,
    sample_frames,
    synthetic_media,
)
from amorphous_mapreduce_spark.queries_registry import register

N_MEDIA = 64

# synthetic_media's blob replayed as a 256-hex-char string: 8 chained md5
# chunks of "{id}_{i}" — identical bytes to Spark's unhex(concat(md5...)).
_HX = " || ".join(f"md5(r.range || '_{i}')" for i in range(8))

_MEDIA_CTE = f"""
media AS (
    SELECT r.range AS media_id,
           {_HX} AS hx,
           CASE WHEN r.range % 3 = 0 THEN 'image'
                WHEN r.range % 3 = 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           r.range * 40 + 1000 AS duration_ms
    FROM range({N_MEDIA}) r
)"""


FEATURES_ORACLE = (
    "WITH "
    + _MEDIA_CTE
    + """
SELECT media_id, CAST(i.range AS INT) AS dim,
       CAST(((CAST('0x' || substr(hx, 4 * i.range + 1, 2) AS INT)
             + CAST('0x' || substr(hx, 4 * i.range + 3, 2) AS INT))
             / 2.0 / 255.0) AS FLOAT) AS val
FROM media, range(64) i
"""
)


@register("media_features", FEATURES_ORACLE)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches), exploded
    to scalar rows for hashing. fake_decoder mean-pools the 128 blob bytes
    into 64 buckets: val[i] = (byte(2i)+byte(2i+1))/2/255 as float32."""
    feats = extract_features(synthetic_media(spark, N_MEDIA), decoder=fake_decoder)
    return feats.select(
        "media_id", F.posexplode("feature").alias("dim", "val")
    )


METADATA_ORACLE = (
    "WITH "
    + _MEDIA_CTE
    + """
SELECT media_type,
       COUNT(*) AS n_media,
       CAST(SUM(duration_ms) AS BIGINT) AS total_ms,
       MAX(duration_ms) AS max_ms
FROM media GROUP BY media_type
"""
)


@register("media_metadata_stats", METADATA_ORACLE)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only rollup: touches the typed meta struct, never the blob
    bytes (at scale: parquet column pruning keeps blobs unread)."""
    m = synthetic_media(spark, N_MEDIA)
    return m.groupBy(F.col("meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n_media"),
        F.sum("meta.duration_ms").alias("total_ms"),
        F.max("meta.duration_ms").alias("max_ms"),
    )


FRAMES_ORACLE = (
    "WITH "
    + _MEDIA_CTE
    + """
, vids AS (
    SELECT media_id, hx,
           GREATEST(1, (duration_ms) // 1000) AS n_frames
    FROM media WHERE media_type = 'video'
), stepped AS (
    SELECT media_id, hx, n_frames,
           GREATEST(1, 128 // n_frames) AS step
    FROM vids
)
SELECT media_id,
       CAST(f.range AS INT) AS frame_idx,
       f.range * 1000 AS frame_ts_ms,
       upper(substr(hx, f.range * step * 2 + 1, step * 2)) AS frame_hex
FROM stepped, range(16) f
WHERE f.range < n_frames
"""
)


@register("media_frame_index", FRAMES_ORACLE)
def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample videos (row expansion inside the pandas iterator, no
    JVM explode of blob arrays); frame payloads fingerprinted as hex."""
    frames = sample_frames(
        synthetic_media(spark, N_MEDIA), every_ms=1000, decoder=fake_decoder
    )
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ts_ms",
        F.hex("frame").alias("frame_hex"),
    )


RESIZE_ORACLE = (
    "WITH "
    + _MEDIA_CTE
    + """
SELECT media_id, media_type,
       8 AS width, 4 AS height,
       32 AS n_bytes,
       upper(substr(hx, 1, 64)) AS content_hex
FROM media
"""
)


@register("media_resize_audit", RESIZE_ORACLE)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pass-through audit: with the fake codec, resize to (8,4) is a
    deterministic 32-byte truncation; meta is rewritten to the target
    shape. Verifies the full mapInPandas round-trip of blob + struct."""
    resized = resize_images(
        synthetic_media(spark, N_MEDIA), width=8, height=4, decoder=fake_decoder
    )
    return resized.select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.length("content").alias("n_bytes"),
        F.hex("content").alias("content_hex"),
    )


# --- content-addressed chunk dedup over binary media ---------------------------

# Sibling-structured blobs: ids 2k/2k+1 share their first 7 chunks (the
# "re-encoded copy" case), so chunk-level dedup MUST find exactly the
# even/odd pairs — a built-in correctness invariant.
_SIB_HX = " || ".join(
    f"md5((r.range // 2) || '_{i}')" for i in range(7)
) + " || md5(r.range || '_tail')"

CHUNK_DEDUP_ORACLE = f"""
WITH media AS (
    SELECT r.range AS media_id, {_SIB_HX} AS hx
    FROM range({N_MEDIA}) r
),
chunks AS (
    SELECT media_id, i.range AS idx,
           substr(hx, CAST(32 * i.range + 1 AS BIGINT), 32) AS ch
    FROM media, range(8) i
),
pairs AS (
    SELECT a.media_id AS qid, b.media_id AS nid,
           CAST(COUNT(*) AS BIGINT) AS shared_chunks
    FROM chunks a JOIN chunks b ON a.ch = b.ch AND a.media_id < b.media_id
    GROUP BY a.media_id, b.media_id
)
SELECT qid, nid, shared_chunks,
       CAST(shared_chunks AS DOUBLE) / 8.0 AS chunk_overlap
FROM pairs WHERE shared_chunks >= 6
ORDER BY qid, nid
"""


@register("media_chunk_near_dup", CHUNK_DEDUP_ORACLE)
def q_media_chunk_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level binary dedup over opaque media blobs (the
    rsync/backup-store technique applied to multimodal columns): blobs
    split into fixed 16-byte chunks, chunks matched content-addressed
    (by hash, position-free), pairs sharing >= 6 of 8 chunks flagged as
    re-encoded copies. The synthetic blobs are sibling-structured
    (2k and 2k+1 share 7 chunks) so the expected answer is exactly the
    even/odd pairs — the query self-certifies.

    Exactness: chunks replay as md5 hex substrings (the multimodal
    blob-slicing convention); counts are exact; ONE division renders
    the overlap.

    Scale: the chunk store is a keyed equi-join on chunk hash (the
    content-addressed index); per-pair rollup; no quadratic stage —
    fanout is bounded by chunk duplication, which is the signal
    itself."""
    hx = F.concat(
        *[
            F.md5(
                F.concat(
                    F.expr("CAST(id div 2 AS STRING)"), F.lit(f"_{i}")
                )
            )
            for i in range(7)
        ],
        F.md5(F.concat(F.col("id").cast("string"), F.lit("_tail"))),
    )
    media = spark.range(N_MEDIA).select(
        F.col("id").alias("media_id"), hx.alias("hx")
    )
    chunks = media.select(
        "media_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda i: F.substring(
                    F.col("hx"), i.cast("int") * 32 + 1, 32
                ),
            )
        ).alias("idx", "ch"),
    )
    a = chunks.select(F.col("media_id").alias("qid"), "ch")
    b = chunks.select(F.col("media_id").alias("nid"), "ch")
    pairs = (
        a.join(b, "ch")
        .filter(F.col("qid") < F.col("nid"))
        .groupBy("qid", "nid")
        .agg(F.count("*").alias("shared_chunks"))
    )
    return (
        pairs.filter(F.col("shared_chunks") >= 6)
        .select(
            "qid",
            "nid",
            "shared_chunks",
            (F.col("shared_chunks").cast("double") / F.lit(8.0)).alias(
                "chunk_overlap"
            ),
        )
        .orderBy("qid", "nid")
    )
