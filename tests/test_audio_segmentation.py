"""Fixed-window audio segmentation: the Python boundary spec, the
metadata-only Catalyst plan, and the materialized PCM windows must agree
bit-for-bit; `bytes` never enters the metadata plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_segmentation as ASEG


def test_bounds_spec_goldens():
    b = ASEG.segment_bounds
    # short clip: kept whole regardless of min_tail
    assert b(500, 4000, 2000, 1000) == [(0, 500)]
    # exact single window
    assert b(4000, 4000, 4000, 1000) == [(0, 4000)]
    # non-overlapping + tail above/below the gate
    assert b(10_000, 4000, 4000, 1000) == [(0, 4000), (4000, 8000),
                                           (8000, 10_000)]
    assert b(8500, 4000, 4000, 1000) == [(0, 4000), (4000, 8000)]
    # overlap: full windows reach the end exactly -> NO redundant tail
    assert b(10_000, 4000, 2000, 1000) == [
        (0, 4000), (2000, 6000), (4000, 8000), (6000, 10_000)]
    # overlap with uncovered remainder -> tail from n_full*hop
    assert b(10_999, 4000, 2000, 1000) == [
        (0, 4000), (2000, 6000), (4000, 8000), (6000, 10_000),
        (8000, 10_999)]
    # null / non-positive durations emit nothing
    assert b(0, 4000, 2000, 1000) == [] and b(None, 4000, 2000, 1000) == []


def test_param_guards(spark):
    clips = spark.createDataFrame(
        [(0, "c", None, 16000, 1000, "pcm16")],
        "part_id int, clip_id string, bytes binary, sr_hz long, "
        "dur_ms long, codec string",
    )
    with pytest.raises(ValueError, match="skip audio"):
        ASEG.segment_plan(clips, window_ms=1000, hop_ms=2000)
    with pytest.raises(ValueError, match=">= 1"):
        ASEG.segment_plan(clips, window_ms=0)


def test_plan_matches_bounds_spec(spark):
    """Catalyst expressions == the Python spec over an edge-heavy duration
    grid, in every (window, hop, min_tail) regime."""
    durs = [1, 499, 500, 3999, 4000, 4001, 5999, 6000, 8000, 8499, 8500,
            10_000, 10_999, 59_999, 60_000, 60_001, 123_456]
    rows = [(0, f"c{i}", d) for i, d in enumerate(durs)] + [
        (0, "null_dur", None), (0, "zero_dur", 0)]
    clips = spark.createDataFrame(
        rows, "part_id int, clip_id string, dur_ms long")
    for w, h, mt in [(4000, 4000, 1000), (4000, 2000, 1000),
                     (30_000, 30_000, 2000), (4000, 1000, 0)]:
        got = {}
        plan = ASEG.segment_plan(clips, window_ms=w, hop_ms=h,
                                 min_tail_ms=mt).collect()
        for r in plan:
            got.setdefault(r.clip_id, []).append(
                (r.seg_idx, r.start_ms, r.end_ms, r.seg_ms, r.is_tail))
        for i, d in enumerate(durs):
            exp = [
                (k, s, e, e - s, (e - s) < w)
                for k, (s, e) in enumerate(ASEG.segment_bounds(d, w, h, mt))
            ]
            assert sorted(got.get(f"c{i}", [])) == exp, (d, w, h, mt)
        assert "null_dur" not in got and "zero_dur" not in got


def test_pcm_matches_plan_and_payload(spark):
    """Materialized windows carry the plan's exact boundaries and the
    byte-exact PCM slice; undecodable clips emit nothing."""
    sr = 8000
    t = np.arange(sr * 5) / sr  # 5 s
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    rows = [
        (0, "c1", codecs.pcm16_encode(x), sr, 5000, "pcm16"),
        (0, "bad", b"\x01", sr, 5000, "nosuchcodec"),
        (0, "no_dur", codecs.pcm16_encode(x), sr, None, "pcm16"),
    ]
    clips = spark.createDataFrame(
        rows, "part_id int, clip_id string, bytes binary, sr_hz long, "
              "dur_ms long, codec string")
    w, h, mt = 2000, 1500, 500
    plan = {(r.clip_id, r.seg_idx): (r.start_ms, r.end_ms)
            for r in ASEG.segment_plan(clips, w, h, mt).collect()}
    pcm = ASEG.segment_pcm(clips, w, h, mt).collect()
    assert {r.clip_id for r in pcm} == {"c1"}
    assert {(r.clip_id, r.seg_idx): (r.start_ms, r.end_ms)
            for r in pcm} == {k: v for k, v in plan.items() if k[0] == "c1"}
    ref = codecs.pcm16_decode(codecs.pcm16_encode(x))
    for r in pcm:
        lo, hi = (r.start_ms * sr) // 1000, min((r.end_ms * sr) // 1000,
                                                len(ref))
        np.testing.assert_array_equal(
            codecs.pcm16_decode(bytes(r.bytes)), ref[lo:hi])
        assert r.codec == "pcm16" and r.sr_hz == sr


def test_plan_never_reads_bytes(spark, tmp_path):
    """The metadata surface must prune `bytes` at the scan and carry no
    Exchange — segmentation is map-side over (clip_id, dur_ms)."""
    clips = spark.createDataFrame(
        [(0, "c1", b"\x00\x01", 16000, 65_000, "pcm16")],
        "part_id int, clip_id string, bytes binary, sr_hz long, "
        "dur_ms long, codec string")
    p = str(tmp_path / "clips")
    clips.write.parquet(p)
    df = ASEG.segment_plan(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "bytes" not in plan.split("ReadSchema")[1].split("\n")[0]
    assert "Exchange" not in plan
    assert df.count() == 3  # 2 full 30s windows + 5s tail


def test_segments_compose_with_audio_neardup(spark):
    """The pipeline story: a trimmed re-upload whose duration differs from
    its source is invisible to the WHOLE-clip fingerprint join (the
    duration key correctly separates them), but after fixed-window
    segmentation the shared grid-aligned window is an exact segment-level
    near-dup — materialized segments slot straight into the
    audio_fingerprint pipeline as a clips table."""
    from real_time_anomaly_detection_spark.operators import (
        audio_fingerprint as AFP,
    )

    sr = 16000
    t = np.arange(sr * 6) / sr
    x = (
        0.6 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1300 * t)
        + 0.15 * np.sin(2 * np.pi * 2500 * t)
        # slow AM so different windows are spectrally distinct
        * (1.0 + 0.5 * np.sin(2 * np.pi * 0.2 * t))
    )
    clips = spark.createDataFrame(
        [
            (0, "full", codecs.pcm16_encode(x), sr, 6000, "pcm16"),
            # the [2s, 4s) excerpt, gain-changed
            (0, "trim", codecs.pcm16_encode(0.7 * x[2 * sr:4 * sr]), sr,
             2000, "pcm16"),
        ],
        "part_id int, clip_id string, bytes binary, sr_hz long, "
        "dur_ms long, codec string",
    )
    whole = AFP.neardup_pairs(AFP.fingerprints(clips)).collect()
    assert whole == []  # 6 s vs 2 s: duration-keyed join keeps them apart

    segs = ASEG.segment_pcm(clips, window_ms=2000, hop_ms=2000,
                            min_tail_ms=500)
    seg_clips = segs.select(
        F.lit(0).alias("part_id"),
        F.concat_ws(":", "clip_id", F.col("seg_idx").cast("string"))
        .alias("clip_id"),
        "bytes", "sr_hz", "codec",
    )
    pairs = {
        frozenset((r.clip_a, r.clip_b))
        for r in AFP.neardup_pairs(AFP.fingerprints(seg_clips)).collect()
    }
    assert frozenset(("full:1", "trim:0")) in pairs


def test_segments_compose_with_pack_batches(spark):
    """The window table is pack-batches' natural input: segment windows
    (seg_ms as the duration, composite clip_id:seg_idx id) pack into
    budget-respecting batches with every segment assigned exactly once —
    the segment -> pack pipeline is metadata end-to-end."""
    from real_time_anomaly_detection_spark.operators import audio_packing as AP

    durs = [(0, f"c{i}", 3_000 + 997 * i) for i in range(30)]
    clips = spark.createDataFrame(
        durs, "part_id int, clip_id string, dur_ms long")
    segs = ASEG.segment_plan(clips, window_ms=10_000, hop_ms=10_000,
                             min_tail_ms=1_000)
    as_clips = segs.select(
        F.concat_ws(":", "clip_id", F.col("seg_idx").cast("string"))
        .alias("clip_id"),
        F.col("seg_ms").alias("dur_ms"),
    )
    n_segs = as_clips.count()
    asg = AP.pack_batches(as_clips, budget_s=30.0, n_shards=2)
    rows = asg.collect()
    assert len(rows) == n_segs  # every window assigned exactly once
    assert len({r.clip_id for r in rows}) == n_segs
    stats = AP.batch_stats(asg, budget_s=30.0).collect()
    # windows are <= 10 s and the budget 30 s: no batch may overflow
    assert all(r.total_dur_ms <= 30_000 for r in stats)
