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
