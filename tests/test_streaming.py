"""Streaming ingest/validation tests (T1-T6 recast; SURVEY.md §2.9)."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark import engine, synth
from real_time_anomaly_detection_spark.streaming import incremental


def _write_batch(spark, cfg, lo, hi, path):
    pdf = synth.clips_pdf(cfg, lo, hi)
    spark.createDataFrame(pdf, schema=None).write.mode("append").parquet(path)


def test_stream_validate_incremental_exactly_once(spark, tmp_path):
    cfg = synth.clean_config(n_clips=400, clips_per_partition=100)
    inp = str(tmp_path / "clips_in")
    ckpt = str(tmp_path / "ckpt")
    verd = str(tmp_path / "verdicts")

    vcfg = engine.ValidationConfig(checks=("column_stats", "uniqueness"))
    # batch 1: partitions 0-1
    _write_batch(spark, cfg, 0, 200, inp)
    q = incremental.stream_validate(spark, inp, ckpt, verd, cfg=vcfg)
    q.awaitTermination()
    v1 = spark.read.parquet(verd).toPandas()
    assert set(v1.part_id) == {0, 1}
    assert set(v1.epoch_id) == {0}

    # batch 2: partitions 2-3 arrive; checkpoint must skip batch-1 files
    _write_batch(spark, cfg, 200, 400, inp)
    q = incremental.stream_validate(spark, inp, ckpt, verd, cfg=vcfg)
    q.awaitTermination()
    v2 = spark.read.parquet(verd).toPandas()
    assert set(v2.part_id) == {0, 1, 2, 3}
    # partitions 0-1 were validated exactly once
    counts = v2.groupby(["part_id", "constraint"]).size()
    assert (counts == 1).all()

    # re-run with nothing new: no additional rows
    q = incremental.stream_validate(spark, inp, ckpt, verd, cfg=vcfg)
    q.awaitTermination()
    v3 = spark.read.parquet(verd).toPandas()
    assert len(v3) == len(v2)


def test_windowed_stats_batch_equivalence(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = incremental.windowed_stats(
        ev, window="6 hours", watermark="30 minutes"
    ).toPandas()
    # cross-check one window against a direct filter
    row = out.sort_values(["window_start", "event_type"]).iloc[0]
    lo = row.window_start
    hi = row.window_end
    direct = (
        ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .filter(F.col("event_type") == row.event_type)
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean"))
        .toPandas()
        .iloc[0]
    )
    assert row.n == direct.n
    assert abs(row["mean"] - direct["mean"]) < 1e-9


def test_windowed_stats_streaming_drain(spark, tmp_path):
    # watermarks require TIMESTAMP (with tz); the testdata stores TIMESTAMP_NTZ
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "ev_stream")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = incremental.windowed_stats(stream, window="12 hours", watermark="1 hour")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_out").toPandas()
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes all but the last window(s)
    batch = incremental.windowed_stats(ev, window="12 hours", watermark="1 hour").toPandas()
    assert len(got) > 0
    merged = got.merge(
        batch, on=["window_start", "window_end", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got)
    assert (merged.n_s == merged.n_b).all()


def test_stream_validate_manifest_lineage(spark, tmp_path):
    """Per-epoch manifest lineage (T5): every verdict row lands in the
    manifest under run_id=epoch-N, and duplicate appends from a retried
    epoch cannot un-complete a partition (countDistinct semantics)."""
    from real_time_anomaly_detection_spark import manifest as mf
    from real_time_anomaly_detection_spark.streaming import incremental

    cfg = synth.clean_config(n_clips=200, clips_per_partition=100)
    inp = str(tmp_path / "mclips")
    spark.createDataFrame(synth.clips_pdf(cfg)).write.parquet(inp)
    man = str(tmp_path / "mman")
    q = incremental.stream_validate(
        spark, inp, str(tmp_path / "mck"), str(tmp_path / "mv"),
        cfg=__import__("real_time_anomaly_detection_spark.engine", fromlist=["engine"]).ValidationConfig(
            checks=("column_stats", "uniqueness")),
        manifest_path=man,
    )
    q.awaitTermination()
    rows = mf.read_manifest(spark, man)
    assert rows.count() > 0
    assert set(r.run_id for r in rows.select("run_id").distinct().collect()) == {"epoch-0"}
    done = mf.completed_partitions(rows, 3).toPandas()  # 2 stats cols + uniqueness
    assert sorted(done.part_id) == [0, 1]
