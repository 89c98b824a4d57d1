"""Fused audio curation pipeline — trim + resample + normalize in ONE scan.

Run separately, the three payload-rewrite ops cost three full corpus
passes: three decodes, three re-encodes, three parquet writes — and the
two intermediate encodes QUANTIZE (pcm16 is 16-bit, the G.711 codecs
8-bit), so chaining also compounds rounding error. At 10^12 clips the
payload IO dominates everything; fusing the chain into one
decode -> numpy(trim, resample, gain) -> encode pass inside a single
mapInPandas scan cuts payload IO 3x and pays exactly ONE quantization.
That is the whole point of this module: it adds no new audio math — each
stage applies the already-pinned pure spec of its standalone op
(`audio_trim.trim_bounds`/`snap_span`, `audio_resample.resample`/
`resample_n_out`, `audio_normalize.gain_for`), and a pytest pins the
fused output ≡ the chained standalone ops to within the intermediate
re-quantization they avoid.

Stage order (fixed): TRIM first (the silence detector is relative to the
clip's own peak frame — gain-invariant — and cutting dead air first means
the resampler never touches samples that are about to be discarded), then
RESAMPLE (time axis), then NORMALIZE (gain last, so the target RMS holds
exactly in the emitted bytes). Each stage is individually skippable; a row
no enabled stage changes keeps its ORIGINAL bytes verbatim.

Metadata: `dur_ms` is rewritten by trim (snapped span — integrity-ok by
construction); resample preserves the verdict of whatever duration it is
given (deviation-scaled length); normalize never touches lengths. So the
fused output is metadata-consistent exactly like the chained ops. Audit
columns are the union of the three ops' columns.

Scale shape: ONE mapInPandas scan, zero shuffles, `bytes` never leaves
its task; composes with a direct `.write` into a map-only job.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..audio import codecs
from .audio_features import FRAME_MS, SILENCE_FRAME_REL_DB
from .audio_normalize import PEAK_LIMIT, SILENCE_RMS_DB, TARGET_RMS_DB, gain_for
from .audio_resample import TARGET_SR, resample, resample_n_out
from .audio_trim import snap_span, trim_bounds

_AUDIT = ["src_sr_hz", "src_dur_ms", "trimmed_lead_ms", "trimmed_trail_ms",
          "all_silent", "gain_db", "peak_limited"]


def curate_clips(clips: DataFrame, *,
                 trim: bool = True,
                 frame_ms: int = FRAME_MS,
                 rel_db: float = SILENCE_FRAME_REL_DB,
                 do_resample: bool = True,
                 target_sr: int = TARGET_SR,
                 normalize: bool = True,
                 target_rms_db: float = TARGET_RMS_DB,
                 peak_limit: float = PEAK_LIMIT,
                 silence_rms_db: float = SILENCE_RMS_DB) -> DataFrame:
    """The clips table trimmed, rate-unified and loudness-unified in one
    payload pass. Output schema = input columns (sr_hz/dur_ms rewritten)
    + src_sr_hz, src_dur_ms, trimmed_lead_ms, trimmed_trail_ms,
    all_silent, gain_db, peak_limited. Disabled stages emit their audit
    columns as identity values (0.0 gain, zero trim, sr/dur unchanged).
    Undecodable or rate-less clips emit nothing."""
    if not (trim or do_resample or normalize):
        raise ValueError("at least one stage must be enabled")
    if peak_limit <= 0 or peak_limit > 1.0:
        raise ValueError(f"peak_limit must be in (0, 1], got {peak_limit}")
    if target_sr <= 0:
        raise ValueError(f"target_sr must be positive, got {target_sr}")
    in_cols = list(clips.columns)
    out_fields = []
    for f in clips.schema.fields:
        if f.name in ("sr_hz", "dur_ms"):
            out_fields.append(T.StructField(f.name, T.IntegerType()))
        else:
            out_fields.append(f)
    out_schema = T.StructType(out_fields + [
        T.StructField("src_sr_hz", T.IntegerType()),
        T.StructField("src_dur_ms", T.IntegerType()),
        T.StructField("trimmed_lead_ms", T.DoubleType()),
        T.StructField("trimmed_trail_ms", T.DoubleType()),
        T.StructField("all_silent", T.BooleanType()),
        T.StructField("gain_db", T.DoubleType()),
        T.StructField("peak_limited", T.BooleanType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["bytes"].to_numpy()
            codec_col = pdf["codec"].to_numpy()
            sr_col = pdf["sr_hz"].to_numpy()
            dur_col = pdf["dur_ms"].to_numpy()
            keep = []
            cols: dict[str, list] = {c: [] for c in
                                     ["bytes", "sr_hz", "dur_ms", *_AUDIT]}
            for k in range(len(pdf)):
                sr = sr_col[k]
                if sr is None or pd.isna(sr):
                    continue  # no stated rate: nothing downstream is defined
                sr = int(sr)
                try:
                    x = codecs.decode(payloads[k], codec_col[k])
                except Exception:  # noqa: BLE001 — drop, don't abort the task
                    continue
                dur0 = dur_col[k]
                dur0 = None if dur0 is None or pd.isna(dur0) else int(dur0)
                dur, changed = dur0, False
                lead = tail = 0.0
                all_silent = False

                if trim:
                    n = int(x.shape[0])
                    span = trim_bounds(x, sr, frame_ms, rel_db)
                    if span is None:
                        all_silent = True
                    elif not (span[0] == 0 and span[1] == n):
                        s, e_raw = span
                        n_keep, dur = snap_span(e_raw - s, sr)
                        lead = s * 1000.0 / sr
                        tail = (n - s - n_keep) * 1000.0 / sr
                        x = x[s:s + n_keep]
                        changed = True

                out_sr = sr
                if do_resample and sr != target_sr:
                    n_out = resample_n_out(int(x.shape[0]), sr, dur, target_sr)
                    x = resample(x, sr, target_sr, n_out=n_out)
                    out_sr = target_sr
                    changed = True

                gain_db, limited = 0.0, False
                if normalize:
                    g, limited = gain_for(x, target_rms_db, peak_limit,
                                          silence_rms_db)
                    if g != 1.0 or limited:
                        x = np.clip(x * g, -1.0, 1.0)
                        gain_db = 20.0 * float(np.log10(g)) if g > 0 else 0.0
                        changed = True

                keep.append(k)
                cols["bytes"].append(
                    codecs.encode(x, codec_col[k]) if changed else payloads[k]
                )
                cols["sr_hz"].append(out_sr)
                cols["dur_ms"].append(dur)
                cols["src_sr_hz"].append(sr)
                cols["src_dur_ms"].append(dur0)
                cols["trimmed_lead_ms"].append(lead)
                cols["trimmed_trail_ms"].append(tail)
                cols["all_silent"].append(all_silent)
                cols["gain_db"].append(gain_db)
                cols["peak_limited"].append(limited)
            out = pdf.iloc[keep].copy()
            out["bytes"] = cols["bytes"]
            out["sr_hz"] = pd.array(cols["sr_hz"], dtype="Int32")
            out["dur_ms"] = pd.array(cols["dur_ms"], dtype="Int32")
            for c in _AUDIT[2:]:
                out[c] = cols[c]
            out["src_sr_hz"] = pd.array(cols["src_sr_hz"], dtype="Int32")
            out["src_dur_ms"] = pd.array(cols["src_dur_ms"], dtype="Int32")
            yield out[in_cols + _AUDIT]

    return clips.mapInPandas(batches, schema=out_schema)
