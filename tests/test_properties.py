"""Property-based tests (hypothesis) for the numpy kernels — no Spark session
needed, so hundreds of examples run in seconds. These pin the invariants the
engine's distributed paths rely on: codec round-trip fidelity (the per-row
SNR >= 30 dB contract is only meaningful if the reference codec itself clears
it on arbitrary signals), detector-score shapes, and fallback math."""

from functools import lru_cache

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from real_time_anomaly_detection_spark.audio import codecs
from real_time_anomaly_detection_spark.operators import detectors

signals = arrays(
    np.float64,
    st.integers(min_value=16, max_value=2000),
    elements=st.floats(min_value=-0.95, max_value=0.95, width=64),
)


@lru_cache(maxsize=None)
def _codec_emax(codec: str) -> float:
    g = np.linspace(-0.95, 0.95, 20001)
    return float(np.max(np.abs(codecs.decode(codecs.encode(g, codec), codec) - g)))


@settings(max_examples=60, deadline=None)
@given(x=signals, codec=st.sampled_from(["pcm16", "ulaw", "alaw"]))
def test_codec_roundtrip_snr(x, codec):
    """Roundtrip quantization noise is bounded on ANY in-range signal — by an
    AMPLITUDE-AWARE floor: quantization error is absolute (<= 0.5 LSB per
    sample), so SNR scales with signal RMS and a fixed 60 dB floor only holds
    near full scale (hypothesis found rms=0.0028 signals at a legitimate
    53 dB). Worst-case bound: 20*log10(rms * 2/step) with step = 1/32767 for
    pcm16 and the companders' minimum linear step 1/8159 (mu-law's smallest
    segment), capped at the full-scale figures (60 / 25 dB) and given 3 dB of
    slack. This is also why the engine's per-row SNR>=30 gate compares
    observed decode vs REFERENCE decode of the same payload (clean clip ->
    +inf), not decode vs the pre-encode original."""
    rms = float(np.sqrt(np.mean(x**2)))
    if rms < 1e-3:
        return  # near-silence: SNR is energy-relative, gate not meaningful
    y = codecs.decode(codecs.encode(x, codec), codec)
    assert y.shape == x.shape
    # Self-calibrating bound: per-sample error rms <= the codec's worst-case
    # single-sample error e_max (probed once on a dense grid — quantization
    # error is piecewise linear in the input, so the grid bounds it), hence
    # SNR >= 20*log10(rms / e_max). Hand-derived step constants kept being
    # wrong in the tails (A-law has no true zero: 0 decodes to +-0.000245;
    # mu-law full-scale sits 0.003 dB under its nominal figure).
    bound = 20 * np.log10(rms / _codec_emax(codec)) - 0.5
    assert codecs.snr_db(x, y) >= bound


@settings(max_examples=60, deadline=None)
@given(x=signals, codec=st.sampled_from(["pcm16", "ulaw", "alaw"]))
def test_codec_deterministic(x, codec):
    assert codecs.encode(x, codec) == codecs.encode(x.copy(), codec)


@settings(max_examples=40, deadline=None)
@given(
    x=arrays(
        np.float64,
        st.integers(min_value=12, max_value=400),
        elements=st.floats(min_value=-1e6, max_value=1e6, width=64),
    )
)
def test_iforest_scores_bounded_and_shape(x):
    s = detectors._iforest_scores(
        x, np.random.Generator(np.random.PCG64(42)), n_trees=10, subsample=64
    )
    assert s.shape == x.shape
    assert np.all((s > 0) & (s <= 1.0 + 1e-9))


@settings(max_examples=40, deadline=None)
@given(
    x=arrays(
        np.float64,
        st.integers(min_value=12, max_value=300),
        elements=st.floats(min_value=-1e6, max_value=1e6, width=64),
    )
)
def test_lof_scores_finite(x):
    s = detectors._lof_scores(x, k=5)
    assert s.shape == x.shape
    assert np.isfinite(s).all()


@settings(max_examples=40, deadline=None)
@given(
    x=arrays(
        np.float64,
        st.integers(min_value=24, max_value=300),
        elements=st.floats(min_value=-1e3, max_value=1e3, width=64),
    ),
    period=st.sampled_from([4, 6, 8]),
)
def test_stl_lite_residual_shape_and_mean(x, period):
    r = detectors._stl_lite_resid(x, period)
    assert r.shape == x.shape
    assert np.isfinite(r).all()
    # decomposition must remove most of a pure seasonal+constant signal
    t = np.arange(x.shape[0])
    pure = 5.0 + np.sin(2 * np.pi * t / period)
    rp = detectors._stl_lite_resid(pure, period)
    assert np.abs(rp[period:-period]).max() < 0.75


@settings(max_examples=60, deadline=None)
@given(
    x=arrays(
        np.float64,
        st.integers(min_value=2, max_value=200),
        elements=st.floats(min_value=-1e9, max_value=1e9, width=64),
    )
)
def test_ar1_resid_shape_and_first_zero(x):
    r = detectors._ar1_resid(x)
    assert r.shape == x.shape
    assert r[0] == 0.0
    assert np.isfinite(r).all()


# --- vectorized single-block MD5 (operators/md5x.py) ---------------------
# The q43 gram path swaps the hashlib-per-position loop for the numpy
# 64-round compression; these pin BIT-IDENTICAL digests against hashlib on
# arbitrary bytes so the oracle ("first 15 hex chars of md5") can never
# drift.


def _ref_top60(buf: bytes, k: int) -> np.ndarray:
    import hashlib

    mv = memoryview(buf)
    n = max(len(buf) - k + 1, 1)
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(mv[i : i + k]).digest()[:8], "big") >> 4
            for i in range(n)
        ),
        np.int64,
        n,
    )


@settings(max_examples=80, deadline=None)
@given(
    buf=st.binary(min_size=0, max_size=400),
    k=st.integers(min_value=1, max_value=55),
)
def test_md5_top60_sliding_matches_hashlib(buf, k):
    from real_time_anomaly_detection_spark.operators import md5x

    got = md5x.md5_top60_sliding(buf, k)
    assert np.array_equal(got, _ref_top60(buf, k))


def test_md5_top60_sliding_crosses_chunk_boundary():
    from real_time_anomaly_detection_spark.operators import md5x

    rng = np.random.default_rng(11)
    buf = bytes(rng.integers(0, 256, md5x._CHUNK + 500, dtype=np.uint8))
    assert np.array_equal(md5x.md5_top60_sliding(buf, 16), _ref_top60(buf, 16))


@settings(max_examples=60, deadline=None)
@given(msgs=st.lists(st.binary(min_size=0, max_size=55), max_size=40))
def test_md5_top60_batch_matches_hashlib(msgs):
    import hashlib

    from real_time_anomaly_detection_spark.operators import md5x

    got = md5x.md5_top60_batch(msgs)
    ref = np.fromiter(
        (
            int.from_bytes(hashlib.md5(m).digest()[:8], "big") >> 4
            for m in msgs
        ),
        np.int64,
        len(msgs),
    )
    assert np.array_equal(got, ref)


def test_md5_top60_rejects_multi_block():
    import pytest

    from real_time_anomaly_detection_spark.operators import md5x

    with pytest.raises(ValueError):
        md5x.md5_top60_sliding(b"x" * 100, 56)
    with pytest.raises(ValueError):
        md5x.md5_top60_batch([b"y" * 56])


@settings(max_examples=60, deadline=None)
@given(
    bufs=st.lists(st.binary(min_size=16, max_size=300), max_size=20),
    k=st.integers(min_value=1, max_value=16),
)
def test_md5_top60_sliding_multi_matches_per_doc(bufs, k):
    from real_time_anomaly_detection_spark.operators import md5x

    vals, counts = md5x.md5_top60_sliding_multi(bufs, k)
    assert counts.tolist() == [len(b) - k + 1 for b in bufs]
    off = 0
    for b, c in zip(bufs, counts):
        assert np.array_equal(vals[off : off + c], _ref_top60(b, k))
        off += c
    assert off == len(vals)


def test_md5_top60_sliding_multi_crosses_chunk_boundary():
    from real_time_anomaly_detection_spark.operators import md5x

    rng = np.random.default_rng(5)
    bufs = [
        bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        for ln in (md5x._CHUNK - 7, 300, md5x._CHUNK + 123, 16)
    ]
    vals, counts = md5x.md5_top60_sliding_multi(bufs, 16)
    off = 0
    for b, c in zip(bufs, counts):
        assert np.array_equal(vals[off : off + c], _ref_top60(b, 16))
        off += c


# ---- payload-rewrite family specs (r6) -----------------------------------

from real_time_anomaly_detection_spark.operators import (  # noqa: E402
    audio_augment,
    audio_resample,
    audio_trim,
)

_rates = st.sampled_from([8000, 16000, 22050, 44100, 48000])


@settings(max_examples=80, deadline=None)
@given(x=signals, sr_in=_rates, sr_out=_rates)
def test_resample_default_length_and_range(x, sr_in, sr_out):
    """Default output length is round(n * ratio); linear interpolation of an
    in-range signal (even after the box low-pass, a convex average) never
    leaves the input's value range."""
    y = audio_resample.resample(x, sr_in, sr_out)
    assert y.shape[0] == (x.shape[0] if sr_in == sr_out
                          else round(x.shape[0] * sr_out / sr_in))
    assert y.min() >= x.min() - 1e-12 and y.max() <= x.max() + 1e-12


@settings(max_examples=80, deadline=None)
@given(n=st.integers(min_value=0, max_value=10_000_000),
       sr=_rates, dur_ms=st.integers(min_value=0, max_value=600_000),
       target=_rates)
def test_resample_n_out_verdict_invariant(n, sr, dur_ms, target):
    """The deviation-scaled output length preserves the SIGN of the clip's
    deviation from its metadata promise — the integrity verdict
    (truncated / ok / padded) survives any rate change."""
    p_in = max(1, sr * dur_ms // 1000)
    p_out = max(1, target * dur_ms // 1000)
    n_out = audio_resample.resample_n_out(n, sr, dur_ms, target)
    assert n_out >= 0
    assert np.sign(n_out - p_out) == np.sign(n - p_in)


@settings(max_examples=80, deadline=None)
@given(n_raw=st.integers(min_value=1, max_value=10_000_000), sr=_rates)
def test_snap_span_promise(n_raw, sr):
    """snap_span output always satisfies the canonical integrity promise
    identically, never exceeds the raw span, and shaves under 1 ms."""
    n_keep, dur_ms = audio_trim.snap_span(n_raw, sr)
    assert n_keep == max(1, sr * dur_ms // 1000)
    assert n_keep <= max(n_raw, 1)
    assert (n_raw - n_keep) * 1000 < sr + 1000  # < 1 ms + the 1-sample floor


@settings(max_examples=60, deadline=None)
@given(x=signals, sr=_rates)
def test_trim_bounds_sane(x, sr):
    """trim_bounds returns either None (all-silent) or a non-empty in-range
    span that CONTAINS the global peak sample — the loudest frame is by
    definition never cut."""
    span = audio_trim.trim_bounds(x, sr)
    if span is None:
        # all-silent: true zeros, or denormals whose SQUARE underflows to 0
        # (frame energy is computed on x**2, so 5e-324 is energy-less)
        assert x.shape[0] == 0 or float(np.max(np.abs(x))) < 1e-150
        return
    s, e = span
    assert 0 <= s < e <= x.shape[0]
    assert s <= int(np.argmax(np.abs(x))) < e


@settings(max_examples=60, deadline=None)
@given(x=signals, sr=_rates,
       factor=st.floats(min_value=0.5, max_value=2.0, width=64))
def test_speed_perturb_promise(x, sr, factor):
    """Speed-perturbed output always satisfies the canonical metadata
    promise for its rewritten duration, at any factor."""
    y, dur_ms = audio_augment.speed_perturb(x, sr, factor)
    assert y.shape[0] == max(1, sr * dur_ms // 1000)


@settings(max_examples=60, deadline=None)
@given(x=signals, snr_db=st.floats(min_value=0.0, max_value=60.0, width=64),
       seed=st.integers(min_value=0, max_value=2**63 - 1))
def test_add_noise_bounded_and_deterministic(x, snr_db, seed):
    """Noise output stays on the pcm rails and is bit-deterministic."""
    y = audio_augment.add_noise(x, snr_db, seed)
    assert y.shape == x.shape
    assert np.all(np.abs(y) <= 1.0)
    assert np.array_equal(y, audio_augment.add_noise(x, snr_db, seed))
