import numpy as np
import pytest

from real_time_anomaly_detection_spark.audio import codecs


@pytest.fixture
def signal():
    rng = np.random.default_rng(7)
    t = np.arange(8000) / 8000.0
    return 0.6 * np.sin(2 * np.pi * 440 * t) + 0.25 * np.sin(2 * np.pi * 1200 * t + 1.0)


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_roundtrip_is_stable(signal, codec):
    # decode(encode(x)) is a fixed point: re-encoding the decoded signal is
    # bit-identical (the reference-codec-as-oracle property, FIXTURES.md §1).
    b1 = codecs.encode(signal, codec)
    y = codecs.decode(b1, codec)
    b2 = codecs.encode(y, codec)
    assert b1 == b2
    assert codecs.snr_db(y, codecs.decode(b2, codec)) == 120.0


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_snr_vs_raw_above_gate(signal, codec):
    y = codecs.decode(codecs.encode(signal, codec), codec)
    assert codecs.snr_db(signal, y) >= 30.0


def test_corruption_detected(signal):
    b = bytearray(codecs.encode(signal, "pcm16"))
    for pos in range(1, len(b), 4):
        b[pos] ^= 0xFF
    y = codecs.decode(bytes(b), "pcm16")
    ref = codecs.decode(codecs.encode(signal, "pcm16"), "pcm16")
    assert codecs.snr_db(ref, y) < 30.0


def test_length_mismatch_is_neg_inf(signal):
    ref = codecs.decode(codecs.encode(signal, "pcm16"), "pcm16")
    assert codecs.snr_db(ref, ref[:-10]) == float("-inf")


def test_pcm16_quantization_bounds():
    x = np.array([-1.5, -1.0, 0.0, 1.0, 1.5])
    y = codecs.decode(codecs.encode(x, "pcm16"), "pcm16")
    assert np.all(np.abs(y) <= 32768 / 32767)
    assert abs(y[2]) < 1e-9
