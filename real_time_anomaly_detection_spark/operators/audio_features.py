"""Per-clip audio feature extraction + quality filtering (training-data
curation for the audio payload).

The validation families answer "is this table well-formed?"; a training
pipeline also needs "is this CLIP worth training on?" — silent recordings,
digitally clipped takes, and DC-offset captures pass every schema/SNR check
yet poison an ASR corpus. This module extracts the standard cheap curation
features from the decoded PCM and applies thresholded keep/drop rules,
mirroring the text side's quality scoring (queries.py q24) for the audio
modality. No reference-repo analog (its payload was scalar weather numbers);
this is one of the beyond-the-reference pipeline ops the graft carries.

Scale shape (identical to audio_checks.pcm_check): ONE scan of the payload,
`mapInPandas` over Arrow batches, vectorized numpy per row, and only the
small feature rows ever leave the stage — `bytes` is never joined, broadcast,
or shuffled. Decode failures surface as decoded_ok=false rows (T7 semantics:
record and continue), which the filter drops with reason='decode_error'.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..audio import codecs

# silence: mean square below -50 dBFS (full-scale sine = -3 dB)
SILENCE_RMS_DB = -50.0
# a frame is "silent" when its RMS is 30 dB under the clip's peak frame
SILENCE_FRAME_REL_DB = -30.0
FRAME_MS = 20
CLIPPING_ABS = 0.999  # |x| at/over this counts as a clipped sample (pcm16 rails)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms_db", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("dc_offset", T.DoubleType()),
        T.StructField("clipping_ratio", T.DoubleType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
        T.StructField("decoded_ok", T.BooleanType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def clip_features(x: np.ndarray, sr_hz: int) -> dict:
    """Curation features of one decoded PCM clip (float in [-1, 1]).
    Pure numpy — unit-testable against hand-built signals."""
    n = int(x.shape[0])
    if n == 0:
        return dict(n_samples=0, rms_db=float("-inf"), peak=0.0, dc_offset=0.0,
                    clipping_ratio=0.0, silence_ratio=1.0, zcr=0.0)
    ms = float(np.mean(x * x))
    rms_db = 10.0 * np.log10(ms) if ms > 0 else float("-inf")
    frame = max(int(sr_hz * FRAME_MS / 1000), 1)
    n_frames = max(n // frame, 1)
    frames = x[: n_frames * frame].reshape(n_frames, frame)
    frame_rms = np.sqrt(np.mean(frames * frames, axis=1))
    peak_rms = float(frame_rms.max())
    if peak_rms > 0:
        silent = frame_rms < peak_rms * (10.0 ** (SILENCE_FRAME_REL_DB / 20.0))
        silence_ratio = float(np.mean(silent))
    else:
        silence_ratio = 1.0
    return dict(
        n_samples=n,
        rms_db=float(rms_db),
        peak=float(np.abs(x).max()),
        dc_offset=float(np.mean(x)),
        clipping_ratio=float(np.mean(np.abs(x) >= CLIPPING_ABS)),
        silence_ratio=silence_ratio,
        zcr=float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0,
    )


def extract_features(clips: DataFrame) -> DataFrame:
    """(part_id, clip_id, features..., decoded_ok, decode_error) — one scan,
    payload never leaves the map stage."""
    projected = clips.select("part_id", "clip_id", "bytes", "sr_hz", "codec")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            payloads = pdf["bytes"].to_numpy()
            codec_arr = pdf["codec"].to_numpy()
            sr_arr = pdf["sr_hz"].to_numpy()
            for k in range(len(pdf)):  # Arrow-batch rows; per-row work is numpy
                base = {
                    "part_id": pdf["part_id"].iloc[k],
                    "clip_id": pdf["clip_id"].iloc[k],
                }
                try:
                    x = codecs.decode(payloads[k], codec_arr[k])
                    sr = int(sr_arr[k]) if not pd.isna(sr_arr[k]) else 16000
                    rows.append({**base, **clip_features(x, sr),
                                 "decoded_ok": True, "decode_error": None})
                except Exception as exc:  # noqa: BLE001 — record, don't abort
                    rows.append({**base, "n_samples": 0, "rms_db": None,
                                 "peak": None, "dc_offset": None,
                                 "clipping_ratio": None, "silence_ratio": None,
                                 "zcr": None, "decoded_ok": False,
                                 "decode_error": f"{type(exc).__name__}: {exc}"[:200]})
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return projected.mapInPandas(batches, schema=FEATURES_SCHEMA)


def quality_filter(
    features: DataFrame,
    min_rms_db: float = SILENCE_RMS_DB,
    max_clipping_ratio: float = 0.01,
    max_silence_ratio: float = 0.9,
    max_abs_dc: float = 0.05,
) -> DataFrame:
    """keep/drop verdict per clip with the FIRST failing reason (precedence:
    decode_error > silent > clipped > dc_offset) — pure Catalyst expressions
    over the small feature table, so the filter composes with any downstream
    query without touching the payload again."""
    reason = (
        F.when(~F.col("decoded_ok"), F.lit("decode_error"))
        .when(
            (F.col("rms_db") < min_rms_db)
            | (F.col("silence_ratio") > max_silence_ratio),
            F.lit("silent"),
        )
        .when(F.col("clipping_ratio") > max_clipping_ratio, F.lit("clipped"))
        .when(F.abs(F.col("dc_offset")) > max_abs_dc, F.lit("dc_offset"))
    )
    return features.select(
        "part_id", "clip_id", reason.alias("drop_reason"),
        reason.isNull().alias("keep"),
    )


DRIFT_COLUMNS = ("rms_db", "silence_ratio", "clipping_ratio", "zcr")


def _finite_features(features: DataFrame,
                     columns: tuple[str, ...]) -> DataFrame:
    """Null out non-finite feature values per column (rms_db is -inf for
    empty clips; a histogram cannot bin infinities) — per-COLUMN nulling,
    not row drops, so a clip with one degenerate feature still counts in
    every other column's distribution."""
    keep = [c for c in features.columns if c not in columns]
    exprs = [
        F.when(
            F.col(c).isNotNull()
            & ~F.isnan(F.col(c))
            & (F.abs(F.col(c)) != float("inf")),
            F.col(c),
        ).alias(c)
        for c in columns
    ]
    return features.select(*keep, *exprs)


def feature_drift(features: DataFrame, baseline_features: DataFrame,
                  columns: tuple[str, ...] = DRIFT_COLUMNS,
                  part_col: str = "part_id",
                  n_bins: int | None = None):
    """Distribution drift of the AUDIO FEATURE columns against a reference
    features snapshot — the capture-chain regression detector: a new
    encoder that clips, a gain change, or a VAD regression shifts the
    rms/clipping/silence distributions long before any schema or SNR check
    fails. Pure composition: `drift.make_baseline` over the baseline
    features table (feature tables are clip-metadata-scale, so the baseline
    probe is cheap) + `drift.drift_verdicts` on the current one — ONE
    groupBy(part_col) hash agg, O(n_bins + sketch) state per (partition,
    column), the same scale shape as the dur_ms/sr_hz drift family.
    Undecodable rows' null features and -inf rms_db are nulled per column
    (never row-dropped) before both sides."""
    from . import drift as _drift

    kw = {} if n_bins is None else {"n_bins": n_bins}
    rows = _drift.make_baseline(
        _finite_features(baseline_features, columns), columns=columns, **kw
    )
    return _drift.drift_verdicts(
        _finite_features(features, columns), rows, part_col=part_col
    )
