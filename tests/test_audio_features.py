"""Audio curation features: hand-built signals with known feature values,
end-to-end extract + filter through Spark, and T7 decode-error rows."""

import numpy as np
import pandas as pd
import pytest

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_features as AF

SR = 16000


def _sine(amp=0.5, f=440, sec=0.5, sr=SR):
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float64)


def test_clip_features_known_values():
    x = _sine(amp=0.5)
    f = AF.clip_features(x, SR)
    # mean square of a 0.5-amp sine = 0.125 -> 10*log10 = -9.03 dB
    assert f["rms_db"] == pytest.approx(10 * np.log10(0.125), abs=0.05)
    assert f["peak"] == pytest.approx(0.5, abs=1e-3)
    assert f["clipping_ratio"] == 0.0
    assert f["dc_offset"] == pytest.approx(0.0, abs=1e-3)
    # sine crosses zero 2f times per second
    assert f["zcr"] == pytest.approx(2 * 440 / SR, rel=0.05)
    assert f["silence_ratio"] == 0.0  # steady tone: no frame 30dB under peak

    z = AF.clip_features(np.zeros(SR), SR)
    assert z["rms_db"] == float("-inf") and z["silence_ratio"] == 1.0

    # half tone / half silence -> silence_ratio ~ 0.5
    h = AF.clip_features(np.concatenate([_sine(sec=0.5), np.zeros(SR // 2)]), SR)
    assert h["silence_ratio"] == pytest.approx(0.5, abs=0.05)

    sq = AF.clip_features(np.sign(_sine(amp=1.0)) * 0.9995, SR)
    assert sq["clipping_ratio"] == pytest.approx(1.0, abs=0.01)

    dc = AF.clip_features(0.2 + _sine(amp=0.1), SR)
    assert dc["dc_offset"] == pytest.approx(0.2, abs=1e-3)


def test_extract_and_filter_end_to_end(spark):
    rows = [
        # (clip_id, signal, codec) — part 0
        ("good", _sine(amp=0.5), "pcm16"),
        ("silent", np.zeros(SR // 2), "pcm16"),
        ("clipped", np.sign(_sine(amp=1.0)), "pcm16"),
        ("dc", np.clip(0.2 + _sine(amp=0.1), -1, 1), "ulaw"),
    ]
    pdf = pd.DataFrame(
        {
            "part_id": [0] * 4,
            "clip_id": [r[0] for r in rows],
            "bytes": [codecs.encode(r[1], r[2]) for r in rows],
            "sr_hz": [SR] * 4,
            "codec": [r[2] for r in rows],
        }
    )
    # undecodable payload: odd-length pcm16 buffer
    bad = pd.DataFrame(
        {
            "part_id": [1],
            "clip_id": ["broken"],
            "bytes": [b"\x01\x02\x03"],
            "sr_hz": [SR],
            "codec": ["pcm16"],
        }
    )
    clips = spark.createDataFrame(pd.concat([pdf, bad], ignore_index=True))
    feats = AF.extract_features(clips)
    out = AF.quality_filter(feats).toPandas().set_index("clip_id")
    assert bool(out.loc["good"].keep) and out.loc["good"].drop_reason is None
    assert out.loc["silent"].drop_reason == "silent"
    assert out.loc["clipped"].drop_reason == "clipped"
    assert out.loc["dc"].drop_reason == "dc_offset"
    assert out.loc["broken"].drop_reason == "decode_error"  # T7: row, not abort
    f = feats.toPandas().set_index("clip_id")
    assert f.loc["good"].decoded_ok and not f.loc["broken"].decoded_ok
    assert f.loc["good"].n_samples == SR // 2


def test_features_payload_never_shuffled(spark):
    """Same X-invariant as pcm_check: the only contact with `bytes` is the
    map stage — feature extraction plans contain no Exchange at all (one
    narrow scan -> mapInPandas)."""
    cfg_pdf = pd.DataFrame(
        {
            "part_id": [0],
            "clip_id": ["a"],
            "bytes": [codecs.encode(_sine(), "pcm16")],
            "sr_hz": [SR],
            "codec": ["pcm16"],
        }
    )
    feats = AF.extract_features(spark.createDataFrame(cfg_pdf))
    plan = feats._jdf.queryExecution().toString()
    assert "Exchange" not in plan


def _feature_clips(spark, rng_amp, n=40, clipped=False, start=0):
    # feature values depend on i//2 only, so BOTH part_id = i % 2
    # partitions carry the identical value multiset — per-partition
    # verdicts against the pooled baseline are then drift-free by
    # construction on the clean side
    rows = []
    for i in range(n):
        amp = rng_amp(i)
        x = _sine(amp=amp, f=440 + 40 * ((i // 2) % 13), sec=0.25)
        if clipped:
            x = np.clip(x * 8.0, -0.9995, 0.9995)
        rows.append((i % 2, f"c{start + i}", codecs.pcm16_encode(x),
                     SR, "pcm16"))
    return spark.createDataFrame(
        rows, "part_id int, clip_id string, bytes binary, sr_hz long, "
              "codec string")


def test_feature_drift_pass_and_fail(spark):
    """Identical feature distributions pass; a capture-chain regression
    (hard clipping) fails at least the clipping_ratio column. A silent
    clip's -inf rms_db is nulled per column, never row-dropped or raised."""
    amp = lambda i: 0.2 + 0.01 * ((i // 2) % 7)  # noqa: E731

    base = AF.extract_features(_feature_clips(spark, amp))
    same = AF.extract_features(_feature_clips(spark, amp, start=100))
    ok = AF.feature_drift(same, base).collect()
    assert ok and all(r.status == "pass" for r in ok)
    assert {r.constraint for r in ok} == {
        f"drift:{c}" for c in AF.DRIFT_COLUMNS}

    bad = AF.extract_features(_feature_clips(spark, amp, clipped=True))
    verdicts = {(r.part_id, r.constraint): r.status
                for r in AF.feature_drift(bad, base).collect()}
    assert all(
        verdicts[(p, "drift:clipping_ratio")] == "fail" for p in (0, 1))

    # a silent clip (rms_db = -inf) on the observed side must not raise
    # and must still contribute to the OTHER columns' counts
    silent = spark.createDataFrame(
        [(0, "s", codecs.pcm16_encode(np.zeros(SR // 4)), SR, "pcm16")],
        "part_id int, clip_id string, bytes binary, sr_hz long, codec string")
    with_silent = AF.extract_features(
        _feature_clips(spark, amp, start=200).unionByName(silent))
    out = AF.feature_drift(with_silent, base).collect()
    n = {(r.part_id, r.constraint): r.metrics["n_nonnull"] for r in out}
    assert n[(0, "drift:rms_db")] == 20.0      # silent clip nulled out
    assert n[(0, "drift:silence_ratio")] == 21.0  # but counted elsewhere
