"""Sample-rate unification (operators/audio_resample.py).

Covers: the resample spec on hand-built signals (length convention, tone
preservation on upsample, anti-alias attenuation on downsample, n_out
override, rate guard), the Spark surface matching the spec per codec,
verbatim pass-through at the target rate, metadata-integrity verdict
invariance (ok/truncated/padded survive the rewrite), undecodable and
null-rate drops, schema ride-through, the no-Exchange plan pin, and the
CLI flow.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_resample as AR
from real_time_anomaly_detection_spark.operators import metadata_integrity as MI


def _sine(freq: float, sr: int, n: int, amp: float = 0.5) -> np.ndarray:
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / sr)


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


# ---- pure spec ----------------------------------------------------------

def test_spec_lengths_and_identity():
    x = _sine(440, 8000, 8000)
    assert AR.resample(x, 8000, 8000) is x  # same-rate identity
    assert AR.resample(x, 8000, 16000).shape[0] == 16000
    assert AR.resample(x, 8000, 16000, n_out=15999).shape[0] == 15999
    # non-integer ratio: round(n * ratio)
    assert AR.resample(_sine(440, 22050, 9635), 22050, 16000).shape[0] \
        == round(9635 * 16000 / 22050)
    assert AR.resample(np.zeros(0), 8000, 16000).shape[0] == 0
    assert AR.resample(np.zeros(0), 8000, 16000, n_out=4).shape[0] == 4
    with pytest.raises(ValueError):
        AR.resample(x, 0, 16000)
    with pytest.raises(ValueError):
        AR.resample(x, 8000, -1)


def test_spec_upsample_preserves_tone():
    # a 440 Hz tone at 8 kHz, linearly interpolated to 16 kHz, must stay a
    # 440 Hz tone: compare against the directly-synthesized target.
    y = AR.resample(_sine(440, 8000, 8000), 8000, 16000)
    ref = _sine(440, 16000, 16000)
    # ignore the last edge sample (interp clamps at the boundary)
    err = np.sqrt(np.mean(np.square(y[:-4] - ref[:-4])))
    assert err < 0.01, err


def test_spec_downsample_antialias():
    # 7 kHz tone at 16 kHz is ABOVE the 8 kHz target's Nyquist: the box
    # low-pass must knock it down hard; a 1 kHz tone must survive.
    hi = AR.resample(_sine(7000, 16000, 16000), 16000, 8000)
    lo = AR.resample(_sine(1000, 16000, 16000), 16000, 8000)
    rms = lambda v: float(np.sqrt(np.mean(np.square(v))))  # noqa: E731
    src_rms = rms(_sine(1000, 16000, 16000))
    assert rms(hi) < 0.25 * src_rms, rms(hi)  # alias energy suppressed
    assert rms(lo) > 0.7 * src_rms, rms(lo)   # pass band survives


# ---- Spark surface ------------------------------------------------------

def _promise(sr: int, dur_ms: int) -> int:
    return max(1, sr * dur_ms // 1000)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for cid, sr, codec in [
        ("r8", 8000, "pcm16"),
        ("r16", 16000, "pcm16"),       # already at target: verbatim
        ("r22", 22050, "ulaw"),
        ("r44", 44100, "alaw"),
    ]:
        n = _promise(sr, 437)  # non-round duration: rounding matters
        rows.append((cid, codecs.encode(_sine(440, sr, n), codec),
                     sr, 437, codec, f"t-{cid}", 0))
    # integrity-deviant clips: truncated / padded at a non-target rate
    n = _promise(22050, 437)
    rows.append(("trunc", codecs.encode(_sine(440, 22050, n - 5), "pcm16"),
                 22050, 437, "pcm16", "t", 1))
    rows.append(("pad", codecs.encode(_sine(440, 22050, n + 5), "pcm16"),
                 22050, 437, "pcm16", "p", 1))
    rows.append(("nosr", codecs.pcm16_encode(_sine(440, 8000, 800)),
                 None, 100, "pcm16", "n", 1))
    rows.append(("broken", b"\x01", 8000, 100, "opus", "b", 1))
    return spark.createDataFrame(rows, CLIP_SCHEMA)


def test_unified_rate_and_lineage(spark, corpus):
    out = {r.clip_id: r for r in AR.resample_clips(corpus, 16000).collect()}
    # null-rate and undecodable rows dropped, everything else present
    assert set(out) == {"r8", "r16", "r22", "r44", "trunc", "pad"}
    for cid, r in out.items():
        assert r.sr_hz == 16000
        assert r.dur_ms == 437
        assert r.transcript and r.part_id is not None  # ride-through
    assert out["r8"].src_sr_hz == 8000
    assert out["r44"].src_sr_hz == 44100


def test_target_rate_passthrough_verbatim(spark, corpus):
    src = {r.clip_id: bytes(r.bytes) for r in corpus.collect()}
    out = {r.clip_id: r for r in AR.resample_clips(corpus, 16000).collect()}
    assert bytes(out["r16"].bytes) == src["r16"]
    assert out["r16"].src_sr_hz == 16000


def test_surface_matches_spec(spark, corpus):
    src = {r.clip_id: r for r in corpus.collect()}
    out = {r.clip_id: r for r in AR.resample_clips(corpus, 16000).collect()}
    r = out["r8"]
    x = codecs.decode(bytes(src["r8"].bytes), "pcm16")
    expected = AR.resample(x, 8000, 16000, n_out=_promise(16000, 437))
    got = codecs.decode(bytes(r.bytes), "pcm16")
    assert got.shape == expected.shape
    assert np.max(np.abs(got - expected)) <= 1.5 / 32767  # one re-quantize


def test_integrity_verdict_invariant(spark, corpus):
    statuses = lambda df: {  # noqa: E731
        r.clip_id: r.row_status
        for r in MI.integrity_signals(MI.payload_lengths(df)).collect()
    }
    before = statuses(corpus.filter("clip_id in ('r8','r22','r44','trunc','pad')"))
    assert before == {"r8": "ok", "r22": "ok", "r44": "ok",
                      "trunc": "truncated", "pad": "padded"}
    after = statuses(
        AR.resample_clips(corpus, 16000)
        .filter("clip_id in ('r8','r22','r44','trunc','pad')")
        .drop("src_sr_hz")
    )
    assert after == before


def test_param_guard(spark, corpus):
    with pytest.raises(ValueError):
        AR.resample_clips(corpus, 0)


def test_plan_no_exchange(spark, corpus):
    p = (
        AR.resample_clips(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, p  # map-only: bytes never shuffle


def test_cli_flow(spark, corpus, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    corpus.write.parquet(inp)
    cli.main(["resample", "--input", inp, "--out", out, "--target-sr", "8000"])
    back = spark.read.parquet(out)
    rows = {r.clip_id: r for r in back.collect()}
    assert set(rows) == {"r8", "r16", "r22", "r44", "trunc", "pad"}
    assert all(r.sr_hz == 8000 for r in rows.values())
    # r8 was already at 8 kHz: verbatim original payload
    src = {r.clip_id: bytes(r.bytes) for r in corpus.collect()}
    assert bytes(rows["r8"].bytes) == src["r8"]
