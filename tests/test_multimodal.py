"""Multimodal binary-column plumbing tests: real Arrow batching + schemas,
deterministic fake codec (the real decoder is gated behind
NotImplementedError — no image libs in this sandbox)."""

import numpy as np
import pytest

from real_time_anomaly_detection_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    pdf = mm.synth_media_pdf(60, parts=4)
    return spark.createDataFrame(pdf, schema=mm.MEDIA)


def test_fake_codec_roundtrip():
    rng = np.random.Generator(np.random.PCG64(1))
    img = rng.integers(0, 256, size=(10, 7, 3)).astype(np.uint8)
    assert (mm.decode_fake_image(mm.encode_fake_image(img)) == img).all()


def test_image_features(spark, media):
    out = mm.image_features(media).toPandas()
    assert len(out) == 60
    assert out.ok.all()
    src = mm.synth_media_pdf(60, parts=4)
    # feature values match a local decode of the same payload (first frame)
    row = out[out.media_id == "m_00000001"].iloc[0]
    img = mm.decode_fake_image(src[src.media_id == "m_00000001"].payload.iloc[0])
    assert row.height == img.shape[0] and row.width == img.shape[1]
    assert abs(row.mean_intensity - img.mean()) < 1e-9


def test_image_features_error_rows(spark, media):
    from pyspark.sql import functions as F

    poisoned = media.withColumn(
        "payload",
        F.when(F.col("media_id") == "m_00000003", F.lit(b"garbage")).otherwise(
            F.col("payload")
        ),
    )
    out = mm.image_features(poisoned).toPandas()
    bad = out[out.media_id == "m_00000003"].iloc[0]
    assert not bad.ok and bad.error is not None
    assert out[out.media_id != "m_00000003"].ok.all()


def test_thumbnails_shape(spark, media):
    out = mm.thumbnails(media, size=4).toPandas()
    assert len(out) == 60
    th = mm.decode_fake_image(out.thumb.iloc[0])
    assert th.shape == (4, 4, 3)


def test_frame_sample_explodes_videos(spark, media):
    out = mm.frame_sample(media, every=2).toPandas()
    src = mm.synth_media_pdf(60, parts=4)
    vids = src[src.media_type == "video"]
    expected = int(sum((vids.n_frames + 1) // 2)) + len(src) - len(vids)
    assert len(out) == expected
    assert (out[out.media_id.isin(vids.media_id)].frame_no % 2 == 0).all()


def test_real_decoder_is_gated(spark, media):
    with pytest.raises(NotImplementedError):
        mm.image_features(media, decoder="real")


def test_batch_size_independence(spark):
    """Results identical across Arrow batch boundaries (FIXTURES invariant)."""
    pdf = mm.synth_media_pdf(30, parts=2)
    a = mm.image_features(
        spark.createDataFrame(pdf, schema=mm.MEDIA).repartition(1)
    ).toPandas().sort_values("media_id").reset_index(drop=True)
    b = mm.image_features(
        spark.createDataFrame(pdf, schema=mm.MEDIA).repartition(7)
    ).toPandas().sort_values("media_id").reset_index(drop=True)
    assert (a.mean_intensity == b.mean_intensity).all()
    assert (a.height == b.height).all()
