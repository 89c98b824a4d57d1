"""Pure-numpy audio codecs (the engine's reference codec implementations).

The validation engine treats ``bytes`` as an opaque binary column; these codecs
are the deterministic encode/decode pair used both by the synthesizer (fixture
generation) and by the per-row PCM checks (``operators/audio_checks.py``).
They are standard public companding formulas (ITU-T G.711-style mu-law / A-law
continuous approximations) implemented vectorized — no external audio library.

Reference parity note: the reference system's payload is scalar weather
readings; the graft swaps the payload for audio (BASELINE.json input_hint).
The per-row invariant is decoded-PCM allclose (SNR >= 30 dB) + transcript
equality against this reference implementation.
"""

from __future__ import annotations

import numpy as np

CODECS = ("pcm16", "ulaw", "alaw")

_MU = 255.0
_A = 87.6
_LOG1P_MU = float(np.log1p(_MU))
_LN_A = float(np.log(_A))


# ---------------------------------------------------------------- pcm16

def pcm16_encode(x: np.ndarray) -> bytes:
    """float64 in [-1, 1] -> int16 little-endian bytes."""
    q = np.clip(np.rint(np.clip(x, -1.0, 1.0) * 32767.0), -32768, 32767)
    return q.astype("<i2").tobytes()


def pcm16_decode(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float64) / 32767.0


# ---------------------------------------------------------------- mu-law

def ulaw_encode(x: np.ndarray) -> bytes:
    """float64 in [-1, 1] -> 8-bit mu-law companded bytes."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / _LOG1P_MU  # in [-1, 1]
    q = np.clip(np.rint((y + 1.0) * 127.5), 0, 255)
    return q.astype(np.uint8).tobytes()


def ulaw_decode(b: bytes) -> np.ndarray:
    q = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
    y = q / 127.5 - 1.0
    return np.sign(y) * (np.expm1(np.abs(y) * _LOG1P_MU)) / _MU


# ---------------------------------------------------------------- A-law

def alaw_encode(x: np.ndarray) -> bytes:
    """float64 in [-1, 1] -> 8-bit A-law companded bytes."""
    x = np.clip(x, -1.0, 1.0)
    ax = np.abs(x)
    small = ax < (1.0 / _A)
    y = np.where(
        small,
        _A * ax / (1.0 + _LN_A),
        (1.0 + np.log(np.maximum(_A * ax, 1.0))) / (1.0 + _LN_A),
    )
    y = np.sign(x) * y
    q = np.clip(np.rint((y + 1.0) * 127.5), 0, 255)
    return q.astype(np.uint8).tobytes()


def alaw_decode(b: bytes) -> np.ndarray:
    q = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
    y = q / 127.5 - 1.0
    ay = np.abs(y)
    thresh = 1.0 / (1.0 + _LN_A)
    mag = np.where(
        ay < thresh,
        ay * (1.0 + _LN_A) / _A,
        np.exp(ay * (1.0 + _LN_A) - 1.0) / _A,
    )
    return np.sign(y) * mag


_ENCODERS = {"pcm16": pcm16_encode, "ulaw": ulaw_encode, "alaw": alaw_encode}
_DECODERS = {"pcm16": pcm16_decode, "ulaw": ulaw_decode, "alaw": alaw_decode}


def encode(x: np.ndarray, codec: str) -> bytes:
    return _ENCODERS[codec](x)


def decode(b: bytes, codec: str) -> np.ndarray:
    return _DECODERS[codec](b)


def snr_db(reference: np.ndarray, observed: np.ndarray, cap: float = 120.0) -> float:
    """10*log10(signal_power / noise_power) of observed vs reference.

    Length mismatch (truncated/corrupted payload) is treated as maximal noise.
    Bit-identical payloads get the cap (not +inf) so the value is storable.
    """
    if reference.shape != observed.shape:
        return float("-inf")
    sig = float(np.sum(reference * reference))
    noise = float(np.sum((reference - observed) ** 2))
    if noise == 0.0:
        return cap
    if sig == 0.0:
        return float("-inf")
    return min(cap, 10.0 * np.log10(sig / noise))
