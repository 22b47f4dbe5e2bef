"""Environment-gated capability probes (VERDICT_r03 items 4 and 8).

These tests light up the moment the missing libraries appear in the
image, without any engine-code change:

- a REAL in-memory PNG through ``default_decoder`` (needs PIL);
- ``transformWithStateInPandas`` (needs google.protobuf).

In this container both skip cleanly; the no-codec loud-raise contract
is asserted unconditionally so the fallback path stays covered.

The full environment gap inventory (what is absent, what each absence
gates, and the one-line install that unlocks it) lives in ENV.md at the
repo root.
"""

from __future__ import annotations

import importlib.util

import pytest

def _has(mod: str) -> bool:
    try:
        return importlib.util.find_spec(mod) is not None
    except ModuleNotFoundError:  # find_spec raises if the PARENT is absent
        return False


_HAS_PIL = _has("PIL")
_HAS_PROTOBUF = _has("google.protobuf")


def test_default_decoder_raises_loudly_without_codecs():
    from amorphous_mapreduce_spark.operators.multimodal import default_decoder

    if _HAS_PIL:
        pytest.skip("PIL present — covered by the real-PNG test below")
    # Non-PNG bytes: PIL is absent and the stdlib PNG backend rejects the
    # magic, so the loud no-backend contract must hold.
    with pytest.raises(NotImplementedError, match="codec"):
        default_decoder(b"GIF89a\x00\x00", {"media_type": "image"})


@pytest.mark.skipif(not _HAS_PIL, reason="PIL not installed in this image")
def test_media_features_real_png(spark):
    """End-to-end real-bytes path: encode a PNG with PIL, push it through
    extract_features with the DEFAULT decoder, and compare features
    against a driver-side PIL decode of the same bytes."""
    import io

    import numpy as np
    from PIL import Image

    from amorphous_mapreduce_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(pixels, mode="L").save(buf, format="PNG")
    blob = buf.getvalue()

    media = spark.createDataFrame(
        [(0, bytearray(blob), ("image", "png", 16, 8, 0))],
        schema=MEDIA_SCHEMA,
    )
    rows = extract_features(media).collect()
    assert len(rows) == 1
    expect = (pixels.astype(np.float64).ravel() / 255.0)[:64]
    got = np.asarray(rows[0]["feature"], dtype=np.float64)
    assert np.allclose(got, expect.astype(np.float32), atol=0)


@pytest.mark.skipif(
    not _HAS_PROTOBUF, reason="google.protobuf not installed in this image"
)
def test_transform_with_state_in_pandas(spark, tmp_path):
    """Minimal transformWithStateInPandas run: per-key running count over
    a rate-source micro-batch, ValueState-backed."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [StructField("key", StringType()), StructField("cnt", LongType())]
    )

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState(
                "cnt", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            n = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._cnt.update((n,))
            yield pd.DataFrame({"key": [key[0]], "cnt": [n]})

        def close(self) -> None:
            pass

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .selectExpr("CAST(value % 4 AS STRING) AS key")
    )
    q = (
        src.groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=Counter(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        .writeStream.format("memory")
        .queryName("tws_probe")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM tws_probe").collect()
        assert {r["key"] for r in got} <= {"0", "1", "2", "3"}
    finally:
        q.stop()
