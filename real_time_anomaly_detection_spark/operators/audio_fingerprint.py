"""Robust audio fingerprinting + Hamming-banded near-dup pairing — the
AUDIO-modality analog of the text (q40 simhash / q34 MinHash) and embedding
(q42) near-dup operators, completing the modality matrix for training-data
dedup. Content-level dedup (operators/content_dedup.py) only catches
byte-identical payloads; this catches the perceptually-same clip that
survived a lossy re-encode (ulaw/alaw), a gain change, or low-level noise —
the duplicates an audio training corpus actually accumulates.

Algorithm (composition of two published techniques — Haitsma & Kalker's
band-energy descriptor, ISMIR 2002, and Charikar's random-hyperplane
simhash, STOC 2002 — the same pairing the text side uses in q40):

  * descriptor: FFT energy of the whole clip integrated into
    ``_AF_NBANDS`` log-spaced frequency bands over a FIXED Hz range
    (clips at different sample rates stay comparable), normalized to
    energy FRACTIONS — exactly invariant to gain, and perturbed only
    ~1e-4 relatively by a lossy re-encode (ulaw/alaw requantization noise
    sits ~38 dB under the signal),
  * signature: 128 seeded random hyperplanes over the mean-centered
    fraction vector; a bit flips only when its projection magnitude is
    smaller than the descriptor perturbation, so duplicate BER stays near
    zero while unrelated clips land at ~64/128 bits apart.

H&K's adjacent-band SIGN bits are deliberately NOT used as the signature
here: on sparse spectra (this corpus is 2-3 sinusoids) most bands are
empty, adjacent empty bands compare requantization noise, and the sign
bits degrade to coin flips. Projecting the whole descriptor through
random hyperplanes makes every bit depend on the full spectral shape
(where the mass actually is), which is both robust and high-entropy per
16-bit join chunk. The trade: a clip-global stationary descriptor (no
temporal alignment) — the right choice for whole-clip dedup; H&K's
per-frame subfingerprint sequence is the production extension for
find-snippet-inside-clip matching.

Signature = 128 bits stored as 8 16-bit band ints. Pairing mirrors q40:
equi-join on (band index, band value, quantized duration) — by pigeonhole
EVERY pair within Hamming distance ``_AF_HAM_MAX`` = 7 of 128 shares at
least one exact band — then verify ``sum(bit_count(xor))`` <= threshold.
Exact recall at the design threshold, never all-pairs.

The DURATION key is the 16-bit-bucket scale valve: a 65,536-value band
space saturates around 10^9 clips (every (band, value) bucket passes any
practical cap, and the hot-bucket guard would drop everything — zero
recall, the failure mode disguised as safety). Whole-clip duplicates
preserve duration EXACTLY (gain change, ulaw/alaw re-encode, and
resampling all keep seconds; a clip whose length changed is a trimmed
variant — containment's job, and invisible to this clip-global
descriptor anyway), so quantized seconds multiply the bucket space by
the corpus's duration diversity (~10^3 for speech) for free. The probe
side explodes into the three adjacent duration buckets, so a true dup
pair is never lost to a quantization boundary: recall is exact for
duration deltas < ``duration_band_s``.

Scale shape: fingerprints ride ONE mapInPandas scan of the payload
(`bytes` never joined or shuffled, the audio_features.py pattern); the
banded self-join is bucketed by 16-bit band values with a q29/q43-style
hot-bucket cap (the FEW over-cap band values are broadcast and dropped)
so a degenerate corpus cannot go quadratic.

No reference-repo analog (its payload was scalar weather numbers;
SURVEY.md lists none of this) — beyond-the-reference pipeline coverage.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..audio import codecs
from ..caching import persist_tracked
from ..partitioning import spread

_AF_NBANDS = 48  # descriptor resolution (log-spaced Hz bands)
_AF_BITS = 128
_AF_CHUNKS = 8  # 8 x 16-bit join chunks
_AF_FMIN_HZ = 80.0
_AF_FMAX_HZ = 3800.0  # < Nyquist of the lowest supported rate (8 kHz)
_AF_HAM_MAX = 7  # pigeonhole-exact for 8 banded 16-bit chunks
_AF_MIN_SAMPLES = 256  # below this the band integration is degenerate
_AF_BUCKET_CAP = 5000  # (band, value) groups larger than this are dropped
_AF_SEED = 0x0A0D10F9

_BAND_EDGES_HZ = np.geomspace(_AF_FMIN_HZ, _AF_FMAX_HZ, _AF_NBANDS + 1)
# fixed seeded hyperplanes — part of the fingerprint definition, identical
# on every executor and across runs
_PLANES = np.random.default_rng(_AF_SEED).standard_normal(
    (_AF_BITS, _AF_NBANDS)
)

FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("bands", T.ArrayType(T.IntegerType())),
        T.StructField("dur_s", T.DoubleType()),
        T.StructField("fp_ok", T.BooleanType()),
        T.StructField("fp_error", T.StringType()),
    ]
)


def band_fractions(x: np.ndarray, sr_hz: int) -> np.ndarray | None:
    """The robust descriptor: energy FRACTION per log-spaced Hz band, or
    None for clips too short/degenerate to describe."""
    n = int(x.shape[0])
    if n < _AF_MIN_SAMPLES or sr_hz <= 0:
        return None
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, 1.0 / sr_hz)
    idx = np.searchsorted(freqs, _BAND_EDGES_HZ)
    # vectorized band integration: cumulative spectrum at the edges
    cum = np.concatenate(([0.0], np.cumsum(spec)))
    energies = cum[np.minimum(idx[1:], n // 2 + 1)] - cum[
        np.minimum(idx[:-1], n // 2 + 1)
    ]
    total = energies.sum()
    if total <= 0:
        return None  # silent clip: no spectral shape to fingerprint
    return energies / total


def clip_fingerprint(x: np.ndarray, sr_hz: int) -> list[int] | None:
    """128-bit robust fingerprint of one decoded PCM clip as 8 16-bit ints,
    or None when the clip is too short or silent. Pure numpy — gain
    invariance and perturbation robustness are unit-tested directly."""
    v = band_fractions(x, sr_hz)
    if v is None:
        return None
    bits = (_PLANES @ (v - v.mean())) > 0
    out: list[int] = []
    for c in range(_AF_CHUNKS):
        word = 0
        for b in range(16):
            if bits[c * 16 + b]:
                word |= 1 << b
        out.append(word)
    return out


def fingerprints(clips: DataFrame) -> DataFrame:
    """(part_id, clip_id, bands[8], dur_s, fp_ok, fp_error) — one payload scan,
    decode failures recorded per row (T7 semantics), bytes never leave the
    map stage."""
    projected = clips.select("part_id", "clip_id", "bytes", "sr_hz", "codec")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            payloads = pdf["bytes"].to_numpy()
            codec_arr = pdf["codec"].to_numpy()
            sr_arr = pdf["sr_hz"].to_numpy()
            for k in range(len(pdf)):
                base = {
                    "part_id": pdf["part_id"].iloc[k],
                    "clip_id": pdf["clip_id"].iloc[k],
                }
                try:
                    x = codecs.decode(payloads[k], codec_arr[k])
                    sr = int(sr_arr[k]) if not pd.isna(sr_arr[k]) else 16000
                    fp = clip_fingerprint(x, sr)
                    if fp is None:
                        rows.append({**base, "bands": None, "dur_s": None,
                                     "fp_ok": False,
                                     "fp_error": "too_short_or_silent"})
                    else:
                        rows.append({**base, "bands": fp,
                                     "dur_s": float(x.shape[0]) / sr,
                                     "fp_ok": True, "fp_error": None})
                except Exception as exc:  # noqa: BLE001 — record, don't abort
                    rows.append({**base, "bands": None, "dur_s": None,
                                 "fp_ok": False,
                                 "fp_error": f"{type(exc).__name__}: {exc}"[:200]})
            yield pd.DataFrame(
                rows, columns=[f.name for f in FINGERPRINT_SCHEMA.fields]
            )

    return projected.mapInPandas(batches, schema=FINGERPRINT_SCHEMA)


def neardup_pairs(
    fps: DataFrame,
    max_hamming: int = _AF_HAM_MAX,
    bucket_cap: int | None = _AF_BUCKET_CAP,
    duration_band_s: float | None = 2.0,
) -> DataFrame:
    """(clip_a, clip_b, hamming) for fingerprint pairs within
    ``max_hamming`` of 128 bits. Banded equi-join (exact recall for
    max_hamming <= 7 by pigeonhole over the 8 bands); the Hamming verify
    runs AT the join output so only passing pairs reach the distinct.

    ``duration_band_s`` (the scale valve — module docstring): the join
    key carries floor(dur_s / duration_band_s), with the probe side
    exploded into the three adjacent buckets so a boundary-straddling
    pair is never missed — recall stays exact for pairs whose durations
    differ by < duration_band_s, which is EVERY whole-clip duplicate
    (re-encode/gain/resample preserve seconds). Without it, the 16-bit
    band space saturates around 10^9 clips and the hot-bucket cap turns
    into a zero-recall guillotine. None disables (pre-r6 behavior, also
    the fallback for stored fingerprints lacking dur_s).

    ``bucket_cap`` drops (band, value, duration-bucket) groups larger
    than the cap — the q29/q43 degenerate-corpus guard. The over-cap key
    set is tiny by construction, so it is broadcast as an anti-join;
    pairs sharing ONLY capped buckets are missed (documented recall
    trade, same as q43's stop-fingerprint cap)."""
    use_dur = duration_band_s is not None and "dur_s" in fps.columns
    dq = (
        F.floor(F.col("dur_s") / F.lit(float(duration_band_s))).cast("long")
        if use_dur else F.lit(0).cast("long")
    )
    fp = fps.filter(F.col("fp_ok")).select(
        "clip_id", "bands", dq.alias("dq")
    )
    # multi-referenced by the self-join below (q40 pattern); tracked so
    # long-lived sessions can release it via caching.release_cached().
    # spread first (r7): a STORED fingerprint relation read back from a
    # single parquet file (the CLI audio-neardup flow) otherwise runs the
    # whole banded self-join in ONE task (measured 12s vs ~2s); no-op when
    # the input is already parallel.
    fp = persist_tracked(spread(fp))
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.col("bands").getItem(b).alias("chunk"),
            )
            for b in range(_AF_CHUNKS)
        ]
    )
    x = fp.select(
        "clip_id", "bands", "dq", F.explode(chunks).alias("bb")
    ).select(
        "clip_id",
        "bands",
        "dq",
        F.col("bb.band").alias("band"),
        F.col("bb.chunk").alias("chunk"),
    )
    if bucket_cap is not None:
        hot = (
            x.groupBy("band", "chunk", "dq")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > bucket_cap)
            .select("band", "chunk", "dq")
        )
        x = x.join(F.broadcast(hot), ["band", "chunk", "dq"], "left_anti")
    if use_dur:
        # probe side covers the adjacent duration buckets; the build side
        # stays exact, so each boundary-straddling pair matches exactly once
        probe = x.withColumn(
            "dq", F.explode(F.array(F.col("dq") - 1, F.col("dq"),
                                    F.col("dq") + 1))
        )
    else:
        probe = x
    # r7: static 8-term sum instead of the zip_with/aggregate HOF — higher-
    # order functions are interpreted per element (no whole-stage codegen),
    # and this expression runs once per JOIN CANDIDATE row, the hottest
    # point of the operator (guide §4.1: built-ins first). Same arithmetic:
    # sum over the 8 chunks of popcount(xor).
    ham = sum(
        F.bit_count(
            F.col("a.bands").getItem(i).bitwiseXOR(F.col("b.bands").getItem(i))
        ).cast("long")
        for i in range(_AF_CHUNKS)
    )
    return (
        x.alias("a")
        .join(probe.alias("b"), ["band", "chunk", "dq"])
        .filter((F.col("a.clip_id") < F.col("b.clip_id")) & (ham <= max_hamming))
        .select(
            F.col("a.clip_id").alias("clip_a"),
            F.col("b.clip_id").alias("clip_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )
