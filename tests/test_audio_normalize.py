"""Loudness normalization (operators/audio_normalize.py).

Covers: the gain_for spec on hand-built signals (target hit, limiter
engages, silence passthrough), the Spark surface matching the spec with
payload round-trip accuracy per codec, pass-through rows keeping verbatim
bytes, undecodable drop, schema ride-through, the no-Exchange plan pin,
and the CLI flow.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_normalize as AN

SR = 8000


def _sine(amp: float, n: int = 8000) -> np.ndarray:
    return amp * np.sin(2 * np.pi * 440 * np.arange(n) / SR)


def _rms_db(x: np.ndarray) -> float:
    return 20 * np.log10(np.sqrt(np.mean(np.square(x))))


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


def _clips(spark, rows):
    return spark.createDataFrame(rows, CLIP_SCHEMA)


# ---- pure spec ----------------------------------------------------------

def test_gain_spec_hits_target():
    x = _sine(0.0316)  # ~-33 dBFS RMS
    g, lim = AN.gain_for(x, target_rms_db=-20.0)
    assert not lim
    assert abs(_rms_db(x * g) - (-20.0)) < 1e-6


def test_gain_spec_limiter_wins():
    x = _sine(0.5)  # RMS ~-9 dB, peak 0.5; target -3 needs gain ~2.0
    g, lim = AN.gain_for(x, target_rms_db=-3.0, peak_limit=0.9)
    assert lim
    assert abs(np.max(np.abs(x * g)) - 0.9) < 1e-9
    assert _rms_db(x * g) < -3.0  # under target, never clipped


def test_gain_spec_silence_passthrough():
    assert AN.gain_for(_sine(1e-6)) == (1.0, False)  # ~-123 dBFS
    assert AN.gain_for(np.zeros(100)) == (1.0, False)
    assert AN.gain_for(np.zeros(0)) == (1.0, False)


# ---- Spark surface ------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("quiet", codecs.pcm16_encode(_sine(0.0316)), SR, 1000, "pcm16", "q", 0),
        ("loud", codecs.pcm16_encode(_sine(0.9)), SR, 1000, "pcm16", "l", 0),
        ("ulaw", codecs.ulaw_encode(_sine(0.0316)), SR, 1000, "ulaw", "u", 0),
        ("alaw", codecs.alaw_encode(_sine(0.0316)), SR, 1000, "alaw", "a", 1),
        ("silent", codecs.pcm16_encode(np.zeros(8000)), SR, 1000, "pcm16", "s", 1),
        ("broken", b"\x00", SR, 1000, "opus", "b", 1),  # unknown codec
    ]
    return _clips(spark, rows)


def test_normalized_rms_and_schema(spark, corpus):
    out = {r.clip_id: r for r in AN.normalize_gain(corpus).collect()}
    assert set(out) == {"quiet", "loud", "ulaw", "alaw", "silent"}  # broken dropped
    for cid in ("quiet", "loud", "ulaw", "alaw"):
        r = out[cid]
        y = codecs.decode(bytes(r.bytes), r.codec)
        tol = 0.05 if r.codec == "pcm16" else 1.0  # companded 8-bit is coarser
        assert abs(_rms_db(y) - (-20.0)) < tol, (cid, _rms_db(y))
        assert not r.peak_limited
        # every original column rides through
        assert r.transcript and r.sr_hz == SR and r.dur_ms == 1000
    # quiet was boosted, loud attenuated
    assert out["quiet"].gain_db > 0 > out["loud"].gain_db


def test_silent_passthrough_verbatim(spark, corpus):
    src = {r.clip_id: bytes(r.bytes) for r in corpus.collect()}
    r = [x for x in AN.normalize_gain(corpus).collect()
         if x.clip_id == "silent"][0]
    assert bytes(r.bytes) == src["silent"]  # no re-encode round trip
    assert r.gain_db == 0.0 and not r.peak_limited


def test_limiter_on_spark_surface(spark, corpus):
    out = {r.clip_id: r for r in
           AN.normalize_gain(corpus, target_rms_db=-1.0).collect()}
    r = out["loud"]  # RMS -3.9 dB, peak 0.9: -1 dB target needs peak > 1
    assert r.peak_limited
    y = codecs.decode(bytes(r.bytes), "pcm16")
    assert np.max(np.abs(y)) <= AN.PEAK_LIMIT + 2 / 32767


def test_param_guard(spark, corpus):
    with pytest.raises(ValueError):
        AN.normalize_gain(corpus, peak_limit=0.0)


def test_plan_no_exchange(spark, corpus):
    p = (
        AN.normalize_gain(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, p  # map-only: bytes never shuffle


def test_cli_flow(spark, corpus, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    corpus.write.parquet(inp)
    cli.main(["normalize", "--input", inp, "--out", out,
              "--target-rms-db", "-25.0"])
    back = spark.read.parquet(out)
    assert back.count() == 5
    r = [x for x in back.collect() if x.clip_id == "quiet"][0]
    y = codecs.decode(bytes(r.bytes), "pcm16")
    assert abs(_rms_db(y) - (-25.0)) < 0.05
