"""Audio fingerprint near-dup: descriptor invariances (numpy units),
pigeonhole-exact banded join (synthetic band arrays), and the Spark E2E
over planted re-encoded/noisy duplicates."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators.audio_fingerprint import (
    _AF_CHUNKS,
    _AF_HAM_MAX,
    band_fractions,
    clip_fingerprint,
    fingerprints,
    neardup_pairs,
)
from real_time_anomaly_detection_spark.synth import waveform_for


def _ham(a, b):
    return sum(bin(p ^ q).count("1") for p, q in zip(a, b))


# ---------------------------------------------------------------- numpy units


def test_fingerprint_gain_invariant_exactly():
    for i in range(6):
        x = waveform_for(42, i, 16000, 800)
        assert clip_fingerprint(x, 16000) == clip_fingerprint(0.25 * x, 16000)
        assert clip_fingerprint(x, 16000) == clip_fingerprint(3.0 * x, 16000)


def test_fingerprint_robust_to_reencode_and_noise():
    """ulaw round-trip (~38 dB SNR) + -35 dB additive noise must stay well
    inside the pairing threshold; measured BER is ~0.1 bits."""
    rng = np.random.default_rng(7)
    worst = 0
    for i in range(20):
        sr = [8000, 16000, 22050, 44100][i % 4]
        x = waveform_for(42, i, sr, 200 + (37 * i) % 1800)
        fp = clip_fingerprint(x, sr)
        y = codecs.ulaw_decode(codecs.ulaw_encode(x))
        y = y + rng.normal(0, 10 ** (-35 / 20) * np.std(x), size=y.shape)
        worst = max(worst, _ham(fp, clip_fingerprint(y, sr)))
    assert worst <= 3, worst  # threshold is 7; huge margin


def test_fingerprint_discriminates_unrelated_clips():
    fps = [clip_fingerprint(waveform_for(42, i, 16000, 1200), 16000)
           for i in range(30)]
    dists = [_ham(fps[i], fps[j]) for i in range(30) for j in range(i + 1, 30)]
    # unrelated fingerprints concentrate near 64/128; the corpus's few
    # coincidentally same-frequency sine draws are genuine spectral
    # near-dups, so only the MEDIAN is asserted, not the min
    assert 50 <= int(np.median(dists)) <= 78
    assert max(dists) > 40


def test_fingerprint_degenerate_clips():
    assert clip_fingerprint(np.zeros(4000), 16000) is None  # silent
    assert clip_fingerprint(np.ones(8), 16000) is None  # too short
    assert band_fractions(np.zeros(4000), 16000) is None
    v = band_fractions(waveform_for(42, 1, 16000, 500), 16000)
    assert v is not None and abs(v.sum() - 1.0) < 1e-9 and (v >= 0).all()


def test_fingerprint_sample_rate_comparable():
    """The SAME tone content fingerprinted at different sample rates must
    stay within the pairing threshold (Hz-defined bands)."""
    for i in range(4):
        t1 = np.arange(16000) / 16000.0
        t2 = np.arange(44100) / 44100.0
        f1, f2 = 440.0 * (i + 1), 1337.0
        a = np.sin(2 * np.pi * f1 * t1) + 0.5 * np.sin(2 * np.pi * f2 * t1)
        b = np.sin(2 * np.pi * f1 * t2) + 0.5 * np.sin(2 * np.pi * f2 * t2)
        d = _ham(clip_fingerprint(a, 16000), clip_fingerprint(b, 44100))
        assert d <= _AF_HAM_MAX, (i, d)


# ------------------------------------------------------- banded join semantics


def _flip_bits(bands: list[int], positions: list[int]) -> list[int]:
    out = list(bands)
    for p in positions:
        out[p // 16] ^= 1 << (p % 16)
    return out


def test_banded_join_pigeonhole_exact(spark):
    """EVERY pair within hamming 7 must be found regardless of which bits
    differ (pigeonhole over the 8 chunks); a pair at hamming 8 spread one
    bit per chunk must NOT be found (no shared chunk)."""
    rng = np.random.default_rng(3)
    base = [int(v) for v in rng.integers(0, 1 << 16, size=_AF_CHUNKS)]
    rows = [("c0", base, True, None)]
    # hamming 1..7, bits spread maximally across chunks
    for h in range(1, 8):
        rows.append((f"h{h}", _flip_bits(base, list(range(0, 16 * h, 16))), True, None))
    # hamming 8: one flipped bit in EVERY chunk -> no shared chunk with c0
    rows.append(("h8", _flip_bits(base, list(range(0, 128, 16))), True, None))
    df = spark.createDataFrame(
        [(0, cid, b, ok, err) for cid, b, ok, err in rows],
        "part_id int, clip_id string, bands array<int>, fp_ok boolean, fp_error string",
    )
    pairs = neardup_pairs(df, max_hamming=_AF_HAM_MAX, bucket_cap=None)
    got = {(r.clip_a, r.clip_b): r.hamming for r in pairs.collect()}
    for h in range(1, 8):
        assert got.get(("c0", f"h{h}")) == h, (h, got)
    assert ("c0", "h8") not in got


def test_bucket_cap_drops_degenerate_buckets(spark):
    """A (band, value) bucket over the cap is excluded from candidate
    generation — the corpus cannot go quadratic on one hot chunk value."""
    # 50 clips sharing chunk 0 but otherwise random -> only chunk-0 buckets
    rng = np.random.default_rng(5)
    rows = []
    for i in range(50):
        bands = [7] + [int(v) for v in rng.integers(0, 1 << 16, size=7)]
        rows.append((0, f"c{i:02d}", bands, True, None))
    df = spark.createDataFrame(
        rows,
        "part_id int, clip_id string, bands array<int>, fp_ok boolean, fp_error string",
    )
    uncapped = neardup_pairs(df, max_hamming=127, bucket_cap=None).count()
    capped = neardup_pairs(df, max_hamming=127, bucket_cap=10).count()
    assert uncapped == 50 * 49 // 2
    assert capped == 0  # the only shared chunk was the hot one


# ------------------------------------------------------------------ Spark E2E


@pytest.fixture(scope="module")
def planted_clips(spark):
    """20 canonical clips; each with a ulaw-re-encoded + noisy twin under a
    different clip_id, plus one undecodable payload row."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(20):
        sr = [8000, 16000, 44100][i % 3]
        x = waveform_for(99, i, sr, 600 + 53 * i)
        rows.append((i % 4, f"clip_{i:03d}", codecs.pcm16_encode(x), sr, "pcm16"))
        y = codecs.ulaw_decode(codecs.ulaw_encode(0.6 * x))
        y = y + rng.normal(0, 10 ** (-35 / 20) * np.std(y), size=y.shape)
        rows.append((i % 4, f"dup_{i:03d}", codecs.pcm16_encode(y), sr, "pcm16"))
    rows.append((0, "broken", b"\x01", 16000, "nosuchcodec"))
    return spark.createDataFrame(
        rows, "part_id int, clip_id string, bytes binary, sr_hz long, codec string"
    )


def test_e2e_planted_duplicates_found(spark, planted_clips):
    fps = fingerprints(planted_clips)
    rows = {r.clip_id: r for r in fps.collect()}
    assert not rows["broken"].fp_ok and "Error" in rows["broken"].fp_error
    assert sum(1 for r in rows.values() if r.fp_ok) == 40

    pairs = neardup_pairs(fps)
    got = {(r.clip_a, r.clip_b) for r in pairs.collect()}
    for i in range(20):
        assert (f"clip_{i:03d}", f"dup_{i:03d}") in got, i
    # no clip pairs with a DIFFERENT canonical's twin
    cross = {
        (a, b)
        for a, b in got
        if a.split("_")[1] != b.split("_")[1]
    }
    assert not cross, cross


def test_e2e_payload_never_shuffled(spark, planted_clips):
    """The pairing plan must contain no Exchange carrying the binary
    payload: bytes dies inside the fingerprint map stage."""
    plan = neardup_pairs(fingerprints(planted_clips))._jdf.queryExecution(
    ).executedPlan().toString()
    # structural check: every Exchange lists only fingerprint-stage columns
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes" not in line, line


def _fps_dur(spark, rows):
    """rows: (clip_id, bands, dur_s) — fingerprint rows with duration."""
    return spark.createDataFrame(
        [(0, cid, b, d, True, None) for cid, b, d in rows],
        "part_id int, clip_id string, bands array<int>, dur_s double, "
        "fp_ok boolean, fp_error string",
    )


def test_duration_key_blocks_cross_duration_collisions(spark):
    """The scale valve: identical fingerprints at far-apart durations are
    NOT candidates under the duration key (a whole-clip dup always shares
    duration), but duration_band_s=None recovers the keyless behavior."""
    rng = np.random.default_rng(11)
    bands = [int(v) for v in rng.integers(0, 1 << 16, size=_AF_CHUNKS)]
    df = _fps_dur(spark, [("short", bands, 1.0), ("long", bands, 7.0)])
    assert neardup_pairs(df).count() == 0
    assert neardup_pairs(df, duration_band_s=None).count() == 1


def test_duration_key_boundary_straddle_found(spark):
    """A pair straddling a quantization boundary (1.99s vs 2.01s at a 2s
    band) is still found — the probe side covers adjacent buckets."""
    rng = np.random.default_rng(12)
    bands = [int(v) for v in rng.integers(0, 1 << 16, size=_AF_CHUNKS)]
    df = _fps_dur(spark, [("a", bands, 1.99), ("b", bands, 2.01)])
    got = {(r.clip_a, r.clip_b): r.hamming for r in neardup_pairs(df).collect()}
    assert got == {("a", "b"): 0}


def test_duration_key_cross_sample_rate_pair(spark):
    """The same content at 8 kHz and 16 kHz shares dur_s exactly (seconds,
    not samples), so the duration key never splits a cross-rate dup."""
    from real_time_anomaly_detection_spark.audio import codecs

    rows = []
    for sr, cid in ((8000, "lo"), (16000, "hi")):
        t = np.arange(2 * sr) / sr
        x = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1300 * t)
        rows.append((0, cid, codecs.pcm16_encode(x), sr, "pcm16"))
    clips = spark.createDataFrame(
        rows, "part_id int, clip_id string, bytes binary, sr_hz long, codec string"
    )
    fps = fingerprints(clips)
    durs = {r.clip_id: r.dur_s for r in fps.collect()}
    assert durs == {"lo": 2.0, "hi": 2.0}
    assert neardup_pairs(fps).count() == 1


def test_bucket_cap_counts_per_duration_bucket(spark):
    """The hot-bucket cap operates on (band, value, duration-bucket): one
    shared chunk value spread across many durations is many small buckets
    (nothing capped), while the same value at ONE duration is capped."""
    rng = np.random.default_rng(13)

    def mk(i, dur):
        bands = [7] + [int(v) for v in rng.integers(0, 1 << 16, size=7)]
        return (f"c{i:02d}", bands, dur)

    same_dur = _fps_dur(spark, [mk(i, 5.0) for i in range(40)])
    spread = _fps_dur(spark, [mk(100 + i, 4.0 * i) for i in range(40)])
    assert neardup_pairs(same_dur, max_hamming=127, bucket_cap=10).count() == 0
    # spread durations: every (7-chunk, dq) bucket has ONE member; nothing
    # capped, and nothing pairs either (different dq AND random other chunks)
    assert neardup_pairs(spread, max_hamming=127, bucket_cap=10).count() == 0
    assert (
        neardup_pairs(same_dur, max_hamming=127, bucket_cap=None).count()
        == 40 * 39 // 2
    )
