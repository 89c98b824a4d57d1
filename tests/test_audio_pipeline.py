"""Fused audio curation pipeline (operators/audio_pipeline.py).

The op adds no new audio math — every stage is a standalone op's pinned
spec — so the load-bearing test is FUSED ≡ CHAINED: running curate_clips
must match trim_silence -> resample_clips -> normalize_gain row for row,
exactly on metadata/audit columns and within the intermediate
re-quantization (which only the chained path pays) on the payload.
Plus: single-scan plan pin (exactly ONE MapInPandas vs three in the
chained plan), stage toggles, verbatim no-op rows, drops, guards, CLI.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_normalize as AN
from real_time_anomaly_detection_spark.operators import audio_pipeline as AP
from real_time_anomaly_detection_spark.operators import audio_resample as AR
from real_time_anomaly_detection_spark.operators import audio_trim as AT

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)


def _sig(sr: int, lead_ms: int, body_ms: int, trail_ms: int,
         amp: float, freq: float = 440.0) -> np.ndarray:
    lead = np.zeros(sr * lead_ms // 1000)
    body = amp * np.sin(2 * np.pi * freq * np.arange(sr * body_ms // 1000) / sr)
    trail = np.zeros(sr * trail_ms // 1000)
    return np.concatenate([lead, body, trail])


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    cases = [
        # (id, sr, codec, lead, body, trail, amp): every stage-combination
        ("pad_quiet_8k", 8000, "pcm16", 100, 400, 60, 0.03),   # all 3 fire
        ("pad_loud_22k", 22050, "ulaw", 200, 300, 0, 0.9),     # trim+rs+atten
        ("clean_44k", 44100, "alaw", 0, 500, 0, 0.2),          # rs+gain only
        ("clean_16k", 16000, "pcm16", 0, 500, 0, 0.1),         # gain only
        ("silent_16k", 16000, "pcm16", 0, 0, 500, 0.0),        # nothing fires
    ]
    for cid, sr, codec, lead, body, trail, amp in cases:
        x = _sig(sr, lead, body, trail, amp)
        dur = 1000 * x.shape[0] // sr
        rows.append((cid, codecs.encode(x, codec), sr, dur, codec, cid, 0))
    rows.append(("nosr", codecs.pcm16_encode(_sig(8000, 0, 100, 0, 0.5)),
                 None, 100, "pcm16", "n", 1))
    rows.append(("broken", b"\x01", 8000, 100, "opus", "b", 1))
    return spark.createDataFrame(rows, CLIP_SCHEMA)


def _chained(corpus):
    step1 = AT.trim_silence(corpus)
    step2 = AR.resample_clips(step1.drop("trimmed_lead_ms", "trimmed_trail_ms",
                                         "all_silent", "src_dur_ms"), 16000)
    return AN.normalize_gain(step2.drop("src_sr_hz"))


def test_fused_equals_chained(spark, corpus):
    fused = {r.clip_id: r for r in AP.curate_clips(corpus).collect()}
    # chain the standalone ops, re-reading each stage's AUDIT columns
    t = {r.clip_id: r for r in AT.trim_silence(corpus).collect()}
    r_ = {r.clip_id: r for r in _chained(corpus).collect()}
    assert set(fused) == set(r_) == {"pad_quiet_8k", "pad_loud_22k",
                                     "clean_44k", "clean_16k", "silent_16k"}
    for cid, f in fused.items():
        c = r_[cid]
        # metadata identical
        assert (f.sr_hz, f.dur_ms) == (c.sr_hz, c.dur_ms), cid
        assert f.dur_ms == t[cid].dur_ms  # trim decided the duration
        assert f.trimmed_lead_ms == t[cid].trimmed_lead_ms
        assert f.all_silent == t[cid].all_silent
        assert f.peak_limited == c.peak_limited
        # gain agrees to within what the intermediate quantization moves it
        assert abs(f.gain_db - c.gain_db) < 0.2, (cid, f.gain_db, c.gain_db)
        # payload: same length, values within the re-quantization the
        # chained path pays twice (8-bit companded is coarse)
        xf = codecs.decode(bytes(f.bytes), f.codec)
        xc = codecs.decode(bytes(c.bytes), c.codec)
        assert xf.shape == xc.shape, cid
        tol = 4 / 32767 if f.codec == "pcm16" else 0.02
        assert np.max(np.abs(xf - xc)) < tol, cid


def test_fused_output_properties(spark, corpus):
    out = {r.clip_id: r for r in
           AP.curate_clips(corpus, target_rms_db=-20.0).collect()}
    for cid, r in out.items():
        assert r.sr_hz == 16000
        if cid != "silent_16k":
            x = codecs.decode(bytes(r.bytes), r.codec)
            rms_db = 20 * np.log10(np.sqrt(np.mean(np.square(x))))
            if not r.peak_limited:
                assert abs(rms_db - (-20.0)) < 1.0, (cid, rms_db)
        assert r.transcript and r.part_id is not None  # ride-through


def test_noop_row_verbatim(spark, corpus):
    src = {r.clip_id: bytes(r.bytes) for r in corpus.collect()}
    out = {r.clip_id: r for r in AP.curate_clips(corpus).collect()}
    r = out["silent_16k"]  # at target rate, all-silent, unity gain
    assert bytes(r.bytes) == src["silent_16k"]
    assert r.all_silent and r.gain_db == 0.0
    assert r.src_sr_hz == 16000 and r.src_dur_ms == r.dur_ms


def test_stage_toggles(spark, corpus):
    only_gain = {r.clip_id: r for r in AP.curate_clips(
        corpus, trim=False, do_resample=False).collect()}
    r = only_gain["pad_quiet_8k"]
    assert r.sr_hz == 8000 and r.dur_ms == 560  # untouched axes
    assert r.trimmed_lead_ms == 0.0 and r.gain_db > 0
    only_trim = {r.clip_id: r for r in AP.curate_clips(
        corpus, do_resample=False, normalize=False).collect()}
    r = only_trim["pad_quiet_8k"]
    assert r.sr_hz == 8000 and r.dur_ms == 400 and r.gain_db == 0.0
    with pytest.raises(ValueError):
        AP.curate_clips(corpus, trim=False, do_resample=False,
                        normalize=False)
    with pytest.raises(ValueError):
        AP.curate_clips(corpus, peak_limit=2.0)
    with pytest.raises(ValueError):
        AP.curate_clips(corpus, target_sr=0)


def test_single_scan_plan(spark, corpus):
    fused_plan = (AP.curate_clips(corpus)
                  ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in fused_plan
    assert fused_plan.count("MapInPandas") == 1, fused_plan
    chained_plan = (_chained(corpus)
                    ._jdf.queryExecution().executedPlan().toString())
    assert chained_plan.count("MapInPandas") == 3  # what fusion removes


def test_cli_flow(spark, corpus, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    corpus.write.parquet(inp)
    cli.main(["curate-audio", "--input", inp, "--out", out,
              "--target-sr", "8000", "--target-rms-db", "-23"])
    back = spark.read.parquet(out)
    rows = {r.clip_id: r for r in back.collect()}
    assert len(rows) == 5 and all(r.sr_hz == 8000 for r in rows.values())
    x = codecs.decode(bytes(rows["clean_44k"].bytes), "alaw")
    rms_db = 20 * np.log10(np.sqrt(np.mean(np.square(x))))
    assert abs(rms_db - (-23.0)) < 1.0
