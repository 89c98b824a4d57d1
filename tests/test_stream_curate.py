"""Curation at ingest (streaming/incremental.py:stream_curate).

Covers: per-epoch curated output ≡ the batch fused pipeline over the same
arrival (row-for-row, payload bytes exact), exactly-once file processing
across restarts (second drain curates only the NEW shard, redrain with
nothing new is a no-op), curate_kwargs pass-through, and the CLI flow.
"""

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_pipeline as AP
from real_time_anomaly_detection_spark.streaming import incremental

SR_MIX = (8000, 16000, 22050)


def _clips_pdf(lo: int, hi: int) -> pd.DataFrame:
    rows = []
    for i in range(lo, hi):
        sr = SR_MIX[i % len(SR_MIX)]
        lead = np.zeros(sr * (i % 3) * 40 // 1000)  # 0/40/80 ms dead air
        body = 0.02 * (1 + i % 5) * np.sin(
            2 * np.pi * 440 * np.arange(sr * 300 // 1000) / sr)
        x = np.concatenate([lead, body])
        rows.append(
            {"clip_id": f"c{i:05d}", "bytes": codecs.pcm16_encode(x),
             "sr_hz": sr, "dur_ms": 1000 * x.shape[0] // sr,
             "codec": "pcm16", "transcript": f"t{i}", "part_id": i // 50}
        )
    return pd.DataFrame(rows)


def _write_batch(spark, lo, hi, path):
    df = spark.createDataFrame(_clips_pdf(lo, hi))
    df.select("clip_id", "bytes",
              df.sr_hz.cast("int").alias("sr_hz"),
              df.dur_ms.cast("int").alias("dur_ms"),
              "codec", "transcript",
              df.part_id.cast("int").alias("part_id"),
              ).write.mode("append").parquet(path)


def _as_pdf(df):
    pdf = df.toPandas().sort_values("clip_id").reset_index(drop=True)
    pdf["bytes"] = pdf["bytes"].map(bytes)
    return pdf


def test_stream_curate_exactly_once_and_batch_equivalent(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "curated")

    _write_batch(spark, 0, 100, inp)
    incremental.stream_curate(spark, inp, ckpt, out).awaitTermination()
    e0 = spark.read.parquet(f"{out}/epoch_id=0")
    batch0 = AP.curate_clips(spark.createDataFrame(
        spark.read.parquet(inp).toPandas()))
    pd.testing.assert_frame_equal(_as_pdf(e0), _as_pdf(batch0))
    # every clip got rate-unified, trimmed rows exist
    got = _as_pdf(e0)
    assert (got.sr_hz == 16000).all()
    assert (got.trimmed_lead_ms > 0).any()

    # shard 2 arrives: checkpoint must skip the already-curated files
    _write_batch(spark, 100, 150, inp)
    incremental.stream_curate(spark, inp, ckpt, out).awaitTermination()
    all_out = spark.read.parquet(out)
    assert all_out.count() == 150
    per_epoch = {r.epoch_id: r["cnt"] for r in
                 all_out.groupBy("epoch_id").count()
                 .withColumnRenamed("count", "cnt").collect()}
    assert per_epoch == {0: 100, 1: 50}
    # each clip curated exactly once
    assert all_out.select("clip_id").distinct().count() == 150

    # nothing new: redrain is a no-op
    incremental.stream_curate(spark, inp, ckpt, out).awaitTermination()
    assert spark.read.parquet(out).count() == 150


def test_stream_curate_kwargs_passthrough(spark, tmp_path):
    inp = str(tmp_path / "in")
    _write_batch(spark, 0, 30, inp)
    incremental.stream_curate(
        spark, inp, str(tmp_path / "ck"), str(tmp_path / "o"),
        curate_kwargs=dict(target_sr=8000, normalize=False, trim=False),
    ).awaitTermination()
    got = _as_pdf(spark.read.parquet(str(tmp_path / "o")))
    assert (got.sr_hz == 8000).all()
    assert (got.gain_db == 0.0).all()
    assert (got.trimmed_lead_ms == 0.0).all()


def test_cli_flow(spark, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp = str(tmp_path / "in")
    _write_batch(spark, 0, 40, inp)
    out = str(tmp_path / "curated")
    cli.main(["stream-curate", "--input", inp,
              "--checkpoint", str(tmp_path / "ck"), "--out", out,
              "--target-rms-db", "-25"])
    got = spark.read.parquet(out)
    assert got.count() == 40
    r = [x for x in got.collect() if x.clip_id == "c00000"][0]
    x = codecs.decode(bytes(r.bytes), "pcm16")
    rms_db = 20 * np.log10(np.sqrt(np.mean(np.square(x))))
    assert abs(rms_db - (-25.0)) < 1.0
