"""Edge-silence trim (operators/audio_trim.py).

Covers: the trim_bounds spec on hand-built signals (exact frame boundaries,
partial-tail anchoring, gain invariance, all-silent None, guards), the
snap_span metadata convention, the Spark surface matching the spec with
byte-exact slices, verbatim pass-through for untouched / all-silent rows,
metadata-integrity "ok"-by-construction on every trimmed row, undecodable
and null-rate drops, schema ride-through, the no-Exchange plan pin, and
the CLI flow.
"""

import numpy as np
import pytest
from pyspark.sql import types as T

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import audio_trim as AT
from real_time_anomaly_detection_spark.operators import metadata_integrity as MI

SR = 8000
FRAME = SR * 20 // 1000  # 160 samples per 20 ms frame


def _sine(n: int, amp: float = 0.5, freq: float = 440.0, sr: int = SR) -> np.ndarray:
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / sr)


def _padded(lead: int, body: int, trail: int, amp: float = 0.5) -> np.ndarray:
    return np.concatenate([np.zeros(lead), _sine(body, amp), np.zeros(trail)])


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

def test_bounds_exact_frames():
    # 3 silent frames | 10 loud frames | 2 silent frames
    x = _padded(3 * FRAME, 10 * FRAME, 2 * FRAME)
    assert AT.trim_bounds(x, SR) == (3 * FRAME, 13 * FRAME)


def test_bounds_partial_tail_anchors_end():
    # loud energy in a 40-sample partial tail frame must not be cut
    x = np.concatenate([np.zeros(2 * FRAME), _sine(3 * FRAME), np.zeros(FRAME),
                        _sine(40)])
    n = x.shape[0]
    assert AT.trim_bounds(x, SR) == (2 * FRAME, n)


def test_bounds_gain_invariant():
    x = _padded(5 * FRAME, 8 * FRAME, 5 * FRAME)
    assert AT.trim_bounds(x, SR) == AT.trim_bounds(x * 0.01, SR)


def test_bounds_nothing_to_cut():
    x = _sine(10 * FRAME)
    assert AT.trim_bounds(x, SR) == (0, 10 * FRAME)


def test_bounds_all_silent_and_empty():
    assert AT.trim_bounds(np.zeros(10 * FRAME), SR) is None
    assert AT.trim_bounds(np.zeros(0), SR) is None
    # low-level noise floor with NO frame near the peak can't exist by
    # definition (the peak frame is its own reference) — a constant-level
    # noise clip is therefore never trimmed:
    rng = np.random.default_rng(7)
    x = 1e-4 * rng.standard_normal(10 * FRAME)
    s, e = AT.trim_bounds(x, SR)
    assert s == 0 and e == 10 * FRAME


def test_bounds_guards():
    with pytest.raises(ValueError):
        AT.trim_bounds(_sine(100), 0)
    with pytest.raises(ValueError):
        AT.trim_bounds(_sine(100), SR, frame_ms=0)
    with pytest.raises(ValueError):
        AT.trim_bounds(_sine(100), SR, rel_db=3.0)


def test_snap_span_is_the_promise():
    for sr in (8000, 16000, 22050, 44100):
        for n_raw in (1, 7, 159, 160, 9635, 44100):
            n_keep, dur_ms = AT.snap_span(n_raw, sr)
            assert n_keep == max(1, sr * dur_ms // 1000)  # integrity promise
            assert n_keep <= max(n_raw, 1)
            # the snap shaves strictly less than one millisecond
            assert n_raw - n_keep < sr / 1000 + 1


# ---- Spark surface ------------------------------------------------------

@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # padded speech at two rates/codecs, on- and off-frame-grid durations
    x1 = _padded(3 * FRAME, 10 * FRAME, 2 * FRAME)      # 300 ms @8k
    rows.append(("lead_trail", codecs.pcm16_encode(x1), SR,
                 1000 * x1.shape[0] // SR, "pcm16", "t1", 0))
    f22 = 22050 * 20 // 1000
    x2 = _padded(2 * f22 + 7, 5 * f22, 4 * f22)          # off-grid @22.05k
    rows.append(("offgrid", codecs.ulaw_encode(x2), 22050,
                 1000 * x2.shape[0] // 22050, "ulaw", "t2", 0))
    x3 = _sine(10 * FRAME)                               # nothing to cut
    rows.append(("clean", codecs.pcm16_encode(x3), SR, 200, "pcm16", "t3", 0))
    rows.append(("silent", codecs.pcm16_encode(np.zeros(10 * FRAME)), SR, 200,
                 "pcm16", "t4", 1))
    rows.append(("nosr", codecs.pcm16_encode(x3), None, 200, "pcm16", "t5", 1))
    rows.append(("broken", b"\x01", SR, 100, "opus", "t6", 1))
    return spark.createDataFrame(rows, CLIP_SCHEMA)


def test_trim_surface_matches_spec(spark, corpus):
    src = {r.clip_id: r for r in corpus.collect()}
    out = {r.clip_id: r for r in AT.trim_silence(corpus).collect()}
    assert set(out) == {"lead_trail", "offgrid", "clean", "silent"}
    for cid in ("lead_trail", "offgrid"):
        r = out[cid]
        x = codecs.decode(bytes(src[cid].bytes), src[cid].codec)
        s, e_raw = AT.trim_bounds(x, src[cid].sr_hz)
        n_keep, dur_ms = AT.snap_span(e_raw - s, src[cid].sr_hz)
        got = codecs.decode(bytes(r.bytes), r.codec)
        assert got.shape[0] == n_keep
        assert np.max(np.abs(got - codecs.decode(
            codecs.encode(x[s:s + n_keep], r.codec), r.codec))) == 0.0
        assert r.dur_ms == dur_ms
        assert r.src_dur_ms == src[cid].dur_ms
        assert r.trimmed_lead_ms > 0 and r.trimmed_trail_ms > 0
        assert not r.all_silent
        assert r.transcript and r.part_id is not None  # ride-through


def test_untouched_rows_verbatim(spark, corpus):
    src = {r.clip_id: bytes(r.bytes) for r in corpus.collect()}
    out = {r.clip_id: r for r in AT.trim_silence(corpus).collect()}
    for cid, silent in (("clean", False), ("silent", True)):
        r = out[cid]
        assert bytes(r.bytes) == src[cid]  # no re-encode round trip
        assert r.dur_ms == 200 and r.src_dur_ms == 200
        assert r.trimmed_lead_ms == 0.0 and r.trimmed_trail_ms == 0.0
        assert r.all_silent is silent


def test_trimmed_rows_integrity_ok_by_construction(spark, corpus):
    out = AT.trim_silence(corpus).drop(
        "src_dur_ms", "trimmed_lead_ms", "trimmed_trail_ms", "all_silent")
    sig = {r.clip_id: r.row_status
           for r in MI.integrity_signals(MI.payload_lengths(out)).collect()}
    assert sig["lead_trail"] == "ok"
    assert sig["offgrid"] == "ok"


def test_plan_no_exchange(spark, corpus):
    p = (
        AT.trim_silence(corpus)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in p, p  # map-only: bytes never shuffle


def test_cli_flow(spark, corpus, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    corpus.write.parquet(inp)
    cli.main(["trim", "--input", inp, "--out", out, "--rel-db", "-30"])
    back = spark.read.parquet(out)
    rows = {r.clip_id: r for r in back.collect()}
    assert set(rows) == {"lead_trail", "offgrid", "clean", "silent"}
    assert rows["lead_trail"].dur_ms == 200  # 10 loud frames of 20 ms
