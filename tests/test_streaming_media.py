"""Streaming multimodal pipeline: real PNG decode inside foreachBatch.

Closes the loop between the streaming family and the round-5 real-bytes
codec: a rate-source stream synthesizes one PNG per row (encoded with
the stdlib codec in a pandas kernel), and each micro-batch runs
extract_features with the DEFAULT decoder — genuine magic/CRC/inflate/
unfilter work per event, aggregated into a running feature-sum table.
"""

from __future__ import annotations

import time

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_streaming_png_decode_foreachbatch(spark, tmp_path):
    from amorphous_mapreduce_spark.functions.png import encode_png
    from amorphous_mapreduce_spark.operators.multimodal import (
        extract_features,
    )

    results: dict[int, list[float]] = {}

    def synth(it):
        import pandas as pd

        for pdf in it:
            blobs = []
            for v in pdf["value"]:
                # deterministic 8x16 image from the row id
                px = (
                    np.arange(128, dtype=np.uint64) * (int(v) * 2 + 1) % 256
                ).astype(np.uint8).reshape(8, 16)
                blobs.append(encode_png(px))
            yield pd.DataFrame({"media_id": pdf["value"], "content": blobs})

    def sink(batch_df, batch_id):
        media = batch_df.select(
            "media_id",
            "content",
            F.struct(
                F.lit("image").alias("media_type"),
                F.lit("png").alias("codec"),
                F.lit(16).alias("width"),
                F.lit(8).alias("height"),
                F.lit(0).cast("long").alias("duration_ms"),
            ).alias("meta"),
        )
        for r in extract_features(media).collect():
            results[int(r["media_id"])] = list(r["feature"])

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .mapInPandas(synth, "media_id long, content binary")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and len(results) < 10:
            time.sleep(0.5)
    finally:
        q.stop()
    assert len(results) >= 10, f"only {len(results)} decoded rows arrived"
    # verify a decoded feature vector against the closed-form pixels
    some_id = sorted(results)[1]
    px = (
        np.arange(128, dtype=np.uint64) * (some_id * 2 + 1) % 256
    ).astype(np.float64) / 255.0
    got = np.asarray(results[some_id], dtype=np.float64)
    assert np.allclose(got, px[:64].astype(np.float32), atol=0)
