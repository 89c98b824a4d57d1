"""Leading/trailing silence trim — the span-selection transform of audio
curation (librosa.effects.trim / sox silence, re-expressed for a corpus).

Web-crawled speech carries dead air at both ends (recorder spin-up,
endpointing slop); training on it wastes batch seconds and teaches the
model that silence precedes everything. This op keeps each clip's span
from its first to its last non-silent 20 ms frame, where "silent" is the
audio_features convention: frame RMS more than 30 dB below the clip's
PEAK frame (relative, so the detector is gain-invariant and composes with
`audio_normalize` in either order).

Metadata contract — the complement of `audio_resample`'s: trimming changes
wall-clock length, so `dur_ms` is REWRITTEN. The kept span is snapped down
to the whole-millisecond grid: dur_ms = floor(kept_samples * 1000 / sr)
and the payload keeps exactly max(1, floor(sr * dur_ms / 1000)) samples —
identically the canonical promise — so every trimmed row is
metadata-integrity "ok" BY CONSTRUCTION (at most <1 ms of audio is shaved
by the snap). Rows the trimmer does not touch (no silent edge frames, or
ALL-silent clips where cutting everything would leave no payload) pass
through verbatim — original bytes, original dur_ms, original integrity
verdict; the keep/drop call on all-silent clips belongs to
`quality_filter`, which gets an `all_silent` flag here. `src_dur_ms`
carries the original duration for lineage, `trimmed_lead_ms` /
`trimmed_trail_ms` audit what was cut.

No reference-repo analog (scalar weather payloads); beyond-the-reference
audio pipeline op, completing the payload-rewrite family: gain
(audio_normalize), time axis (audio_resample), span (here).

Scale shape (the pcm_check/normalize/resample convention): ONE mapInPandas
scan, decode -> framed-RMS numpy -> slice -> re-encode in the row's own
codec, zero shuffles; `bytes` never leaves its scan task. Undecodable or
rate-less clips emit nothing (decode ERROR reporting is audio_checks' job).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..audio import codecs
from .audio_features import FRAME_MS, SILENCE_FRAME_REL_DB


def trim_bounds(x: np.ndarray, sr: int, frame_ms: int = FRAME_MS,
                rel_db: float = SILENCE_FRAME_REL_DB) -> tuple[int, int] | None:
    """Raw kept span [start, end) in samples, or None when the clip is all
    silence (no frame within `rel_db` of the peak frame) — pure numpy spec,
    unit-testable; the Spark surface applies exactly this per row.

    Frames are `frame_ms` long; the partial tail is evaluated as its own
    (zero-padded) frame so trailing energy shorter than one frame still
    anchors the end."""
    if sr <= 0:
        raise ValueError(f"sample rate must be positive, got {sr}")
    if frame_ms <= 0:
        raise ValueError(f"frame_ms must be positive, got {frame_ms}")
    if rel_db >= 0:
        raise ValueError(f"rel_db must be negative (dB under peak), got {rel_db}")
    n = int(x.shape[0])
    if n == 0:
        return None
    frame = max(sr * frame_ms // 1000, 1)
    n_frames = -(-n // frame)  # ceil: partial tail is a frame too
    pad = np.zeros(n_frames * frame, dtype=np.float64)
    pad[:n] = x
    frame_rms = np.sqrt(np.mean(pad.reshape(n_frames, frame) ** 2, axis=1))
    peak = float(frame_rms.max())
    if peak <= 0.0:
        return None
    loud = np.flatnonzero(frame_rms >= peak * (10.0 ** (rel_db / 20.0)))
    if loud.size == 0:  # peak frame itself is loud, so this can't happen;
        return None     # kept as a guard against float pathology
    return int(loud[0]) * frame, min(n, (int(loud[-1]) + 1) * frame)


def snap_span(n_raw: int, sr: int) -> tuple[int, int]:
    """(kept_samples, dur_ms) for a raw span length: snapped DOWN to the
    millisecond grid so that kept_samples == max(1, floor(sr*dur_ms/1000))
    identically — the canonical metadata-integrity promise. A sub-
    millisecond span gets dur_ms 0, whose canonical promise is 1 sample."""
    dur_ms = n_raw * 1000 // sr
    return max(1, sr * dur_ms // 1000), dur_ms


def trim_silence(clips: DataFrame, frame_ms: int = FRAME_MS,
                 rel_db: float = SILENCE_FRAME_REL_DB) -> DataFrame:
    """The clips table with edge silence removed: `bytes` sliced to the
    loud span + re-encoded in the row's own codec, `dur_ms` rewritten to
    the snapped kept length, plus `src_dur_ms` (lineage),
    `trimmed_lead_ms`/`trimmed_trail_ms` (audit, wall-clock cut at each
    end) and `all_silent` (no loud frame found; payload passed through
    for `quality_filter` to judge). Untouched rows keep their exact
    original payload and dur_ms."""
    in_cols = list(clips.columns)
    out_fields = []
    for f in clips.schema.fields:
        if f.name == "dur_ms":
            out_fields.append(T.StructField("dur_ms", T.IntegerType()))
        else:
            out_fields.append(f)
    out_schema = T.StructType(out_fields + [
        T.StructField("src_dur_ms", T.IntegerType()),
        T.StructField("trimmed_lead_ms", T.DoubleType()),
        T.StructField("trimmed_trail_ms", T.DoubleType()),
        T.StructField("all_silent", T.BooleanType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["bytes"].to_numpy()
            codec_col = pdf["codec"].to_numpy()
            sr_col = pdf["sr_hz"].to_numpy()
            dur_col = pdf["dur_ms"].to_numpy()
            keep, new_bytes, new_dur = [], [], []
            src_dur, lead_ms, trail_ms, silent = [], [], [], []
            for k in range(len(pdf)):
                sr = sr_col[k]
                if sr is None or pd.isna(sr):
                    continue  # no stated rate: frames are undefined
                sr = int(sr)
                try:
                    x = codecs.decode(payloads[k], codec_col[k])
                except Exception:  # noqa: BLE001 — drop, don't abort the task
                    continue
                dur0 = dur_col[k]
                dur0 = None if dur0 is None or pd.isna(dur0) else int(dur0)
                span = trim_bounds(x, sr, frame_ms, rel_db)
                n = int(x.shape[0])
                if span is None or (span[0] == 0 and span[1] == n):
                    # all-silent, empty, or nothing to cut: verbatim
                    keep.append(k)
                    new_bytes.append(payloads[k])
                    new_dur.append(dur0)
                    src_dur.append(dur0)
                    lead_ms.append(0.0)
                    trail_ms.append(0.0)
                    silent.append(span is None)
                    continue
                s, e_raw = span
                n_keep, dur_ms = snap_span(e_raw - s, sr)
                keep.append(k)
                new_bytes.append(codecs.encode(x[s:s + n_keep], codec_col[k]))
                new_dur.append(dur_ms)
                src_dur.append(dur0)
                lead_ms.append(s * 1000.0 / sr)
                trail_ms.append((n - s - n_keep) * 1000.0 / sr)
                silent.append(False)
            out = pdf.iloc[keep].copy()
            out["bytes"] = new_bytes
            out["dur_ms"] = pd.array(new_dur, dtype="Int32")
            out["src_dur_ms"] = pd.array(src_dur, dtype="Int32")
            out["trimmed_lead_ms"] = lead_ms
            out["trimmed_trail_ms"] = trail_ms
            out["all_silent"] = silent
            yield out[in_cols + ["src_dur_ms", "trimmed_lead_ms",
                                 "trimmed_trail_ms", "all_silent"]]

    return clips.mapInPandas(batches, schema=out_schema)
