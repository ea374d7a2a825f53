"""Multimodal plumbing: binary containers, mapInPandas decode, UDTF-shaped
frame sampling, codec gating.

The codec is a deterministic fake (crawler_spark/sources/media.py); the
tests pin (a) the JVM-side encoder emits byte-identical containers to the
Python struct encoders, (b) decode recovers every field through a real
shuffle, (c) explosion/geometry arithmetic, (d) the real-codec path is a
clean NotImplementedError listing missing deps.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators import multimodal as MM
from crawler_spark.sources import media as M

N = 90  # covers all three modalities and every mod-class


@pytest.fixture(scope="module")
def media_df(spark):
    df = M.generate_media(spark, N, partitions=4)
    df.cache().count()
    yield df
    df.unpersist()


def test_jvm_encoder_matches_python_encoder(media_df):
    """The closed-form JVM encode (hex/unhex, no UDF) must emit the exact
    bytes of the struct-based Python encoders — including bytes >= 0x80."""
    rows = {r["doc_id"]: (r["media_type"], bytes(r["media"])) for r in media_df.collect()}
    assert len(rows) == N
    for i in range(N):
        mt, got = rows[i]
        expect = {"image": M.encode_image, "audio": M.encode_audio, "video": M.encode_video}[
            mt
        ](i)
        assert got == expect, f"doc {i} ({mt}): {got!r} != {expect!r}"


def test_high_bytes_in_binary_payload(spark):
    """Regression: seed bytes >= 0x80 must be single bytes (hex/unhex), not
    UTF-8 multi-byte sequences. doc_id 200 (video) → seed tail byte 0xC8;
    doc_id 252 (image) → payload byte 252 % 251 = 0x01, seed 0xFC."""
    df = M.media_from_documents(
        spark.createDataFrame([(200,), (252,)], ["doc_id"])
    )
    got = {r["doc_id"]: bytes(r["media"]) for r in df.collect()}
    assert got[200] == M.encode_video(200)
    assert got[252] == M.encode_image(252)
    assert 0xC8 in got[200]


def test_decode_roundtrip_after_shuffle(media_df, spark):
    """Features decoded from the binary column equal the closed forms, with
    a repartition in between so the bytes actually cross a shuffle."""
    feats = MM.decode_features(media_df.repartition(7, "doc_id")).collect()
    by_id = {r["doc_id"]: r for r in feats}
    assert len(by_id) == N
    for i in range(N):
        r = by_id[i]
        if i % 3 == 0:
            assert r["media_type"] == "image"
            assert (r["width"], r["height"]) == (M.IMG_W(i), M.IMG_H(i))
            assert r["n_pixels"] == M.IMG_W(i) * M.IMG_H(i)
            assert r["mean_pixel"] == float(i % 251)
            assert r["n_bytes"] == 12 + M.IMG_PAYLOAD_LEN
            assert r["sample_rate"] is None and r["n_frames"] is None
        elif i % 3 == 1:
            assert r["media_type"] == "audio"
            assert (r["sample_rate"], r["duration_ms"]) == (M.AUD_RATE(i), M.AUD_MS(i))
            assert r["n_samples"] == M.AUD_RATE(i) * M.AUD_MS(i) // 1000
        else:
            assert r["media_type"] == "video"
            assert (r["n_frames"], r["fps"]) == (M.VID_FRAMES(i), M.VID_FPS(i))
            assert r["duration_s"] == M.VID_FRAMES(i) / M.VID_FPS(i)


def test_corrupt_and_null_payloads_dont_crash(spark):
    from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("media", BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "image", b"NOTMAGIC" + b"x" * 20),
            (2, "image", b"FI"),  # truncated before header
            (3, "video", None),
        ],
        schema,
    )
    rows = {r["doc_id"]: r for r in MM.decode_features(df).collect()}
    assert len(rows) == 3
    assert rows[1]["width"] is None and rows[1]["n_bytes"] == 28
    assert rows[2]["width"] is None
    assert rows[3]["n_bytes"] is None and rows[3]["n_frames"] is None


def test_frame_sample_explosion(media_df):
    out = MM.frame_sample(media_df, every_k=10).collect()
    vids = [i for i in range(N) if i % 3 == 2]
    expect_rows = sum(len(range(0, M.VID_FRAMES(i), 10)) for i in vids)
    assert len(out) == expect_rows
    one = sorted(
        (r["frame_idx"], r["ts_ms"]) for r in out if r["doc_id"] == vids[0]
    )
    i = vids[0]
    assert one == [
        (k, k * 1000 // M.VID_FPS(i)) for k in range(0, M.VID_FRAMES(i), 10)
    ]


def test_resize_geometry(media_df):
    out = {r["doc_id"]: r for r in MM.resize_plan(media_df, max_side=256).collect()}
    for i in range(0, N, 3):
        r = out[i]
        w, h = M.IMG_W(i), M.IMG_H(i)
        scale = min(1.0, 256 / max(w, h))
        assert (r["out_width"], r["out_height"]) == (
            max(1, int(w * scale)),
            max(1, int(h * scale)),
        )
        assert r["out_width"] <= 256 and r["out_height"] <= 256


def test_real_codec_gate():
    with pytest.raises(NotImplementedError) as e:
        MM.require_real_codecs()
    assert "PIL" in str(e.value)


def test_decode_uses_arrow_not_row_python(media_df):
    plan = MM.decode_features(media_df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
