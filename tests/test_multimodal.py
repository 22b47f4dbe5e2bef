from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    default_decoder,
    extract_features,
    fake_decoder,
    resize_images,
    sample_frames,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, n=30)


def test_synthetic_media_schema(media):
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    rows = media.collect()
    assert len(rows) == 30
    assert all(len(r["content"]) == 128 for r in rows)  # 8 md5 blocks


def test_synthetic_media_deterministic(spark):
    a = synthetic_media(spark, 10).collect()
    b = synthetic_media(spark, 10).collect()
    assert [r["content"] for r in a] == [r["content"] for r in b]


def test_default_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        default_decoder(b"\x00", {})


def test_extract_features_plumbing(media):
    feats = extract_features(media, decoder=fake_decoder)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == 64 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["feature"])
    # features flow into the similarity operators unchanged
    from amorphous_mapreduce_spark.operators.similarity import cosine_topk

    top = cosine_topk(feats, k=1, id_col="media_id", vec_col="feature")
    assert top.count() == 30


def test_resize_images_meta_and_bytes(media):
    out = resize_images(media, width=8, height=4, decoder=fake_decoder)
    assert out.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r["content"]) == 32 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 4 for r in rows)


def test_sample_frames_video_only(media):
    frames = sample_frames(media, every_ms=500, decoder=fake_decoder)
    rows = frames.collect()
    assert rows, "no frames sampled"
    vids = {r["media_id"] for r in rows}
    meta = {r["media_id"]: r["meta"]["media_type"] for r in media.collect()}
    assert all(meta[v] == "video" for v in vids)
    # frame timestamps follow the sampling cadence
    assert all(r["frame_ts_ms"] % 500 == 0 for r in rows)
    # duration_ms = id*40+1000 -> id 2 has 1080ms -> 2 frames at 500ms
    per_id = {}
    for r in rows:
        per_id.setdefault(r["media_id"], 0)
        per_id[r["media_id"]] += 1
    assert per_id[2] == 2
