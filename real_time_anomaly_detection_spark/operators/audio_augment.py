"""Deterministic training-set augmentation — speed perturbation + noise.

The standard speech-training recipe (Kaldi/ESPnet 3-way speed perturb at
0.9/1.0/1.1, plus additive noise at a target SNR) expands the corpus with
controlled variants so the model sees tempo and noise diversity. This op
emits one row per (clip, variant) from a declarative variant list:

- ``sp<factor>`` — speed perturbation: the signal is resampled by the
  factor and RELABELED at the original rate, so it plays `factor`x faster
  (pitch and tempo shift together, the Kaldi convention). Duration
  shrinks/grows by 1/factor; the emitted (payload, dur_ms) pair is snapped
  to the millisecond grid exactly like audio_trim, so every speed variant
  is metadata-integrity OK by construction. The anti-alias low-pass of
  `audio_resample.resample` applies when factor > 1 (a compression in
  time is a downsample in disguise).
- ``noise<snr_db>`` — additive white Gaussian noise at the given
  signal-to-noise ratio (dB), seeded from md5(clip_id, variant) so the
  SAME clip always gets the SAME noise (bit-deterministic re-runs — a
  training corpus must be reproducible) while different clips get
  independent draws. Peak-clipped to the pcm rails. Silent clips pass
  through unchanged (no signal, no defined SNR).

Variant rows get ``clip_id = <src>#<variant>`` (unique ids for downstream
uniqueness constraints) and carry ``src_clip_id`` + ``variant`` lineage;
``--keep-original`` also emits the source row verbatim with variant
'orig'. No reference-repo analog (scalar weather payloads);
beyond-the-reference audio pipeline op.

Scale shape (the payload-rewrite family convention): ONE mapInPandas scan,
decode once per clip, every variant derived from that one decode, encode
per variant in the row's own codec, zero shuffles — output size is
(1+k)x rows but `bytes` never leaves the scan task. Undecodable or
rate-less clips emit nothing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..audio import codecs
from .audio_resample import resample
from .audio_trim import snap_span

DEFAULT_SPEEDS = (0.9, 1.1)


def _seed(clip_id: str, variant: str) -> int:
    h = hashlib.md5(f"{clip_id}#{variant}".encode()).digest()
    return int.from_bytes(h[:8], "little")


def speed_perturb(x: np.ndarray, sr: int, factor: float) -> tuple[np.ndarray, int]:
    """(perturbed signal, dur_ms) — the signal resampled by `factor` and
    relabeled at `sr`: plays factor-x faster. Pure numpy spec; the output
    length/duration pair satisfies the canonical metadata promise."""
    if factor <= 0:
        raise ValueError(f"speed factor must be positive, got {factor}")
    n_raw = max(1, int(round(x.shape[0] / factor)))
    n_keep, dur_ms = snap_span(n_raw, sr)
    # integer rate pair whose ratio realizes the factor: pos[i] = i * sr/sr_out
    sr_out = max(1, int(round(sr / factor)))
    return resample(x, sr, sr_out, n_out=n_keep), dur_ms


def add_noise(x: np.ndarray, snr_db: float, seed: int) -> np.ndarray:
    """Signal + seeded white Gaussian noise at `snr_db`; silent signals
    pass through (no signal power, no defined SNR). Pure numpy spec."""
    p_sig = float(np.mean(np.square(x)))
    if p_sig <= 0.0:
        return x
    sigma = np.sqrt(p_sig / (10.0 ** (snr_db / 10.0)))
    noise = np.random.default_rng(seed).standard_normal(x.shape[0]) * sigma
    return np.clip(x + noise, -1.0, 1.0)


def augment_clips(clips: DataFrame,
                  speeds: tuple[float, ...] = DEFAULT_SPEEDS,
                  noise_snr_db: float | None = None,
                  keep_original: bool = True) -> DataFrame:
    """The clips table fanned out into training variants: per input clip,
    one ``sp<f>`` row per speed factor, one ``noise<snr>`` row when
    `noise_snr_db` is set, and the verbatim source row (variant 'orig')
    when `keep_original`. Variant clip_ids are ``<src>#<variant>``;
    `src_clip_id`/`variant` carry lineage; dur_ms is rewritten on speed
    rows (integrity-ok by construction) and unchanged elsewhere."""
    for f in speeds:
        if f <= 0:
            raise ValueError(f"speed factor must be positive, got {f}")
    if not (speeds or noise_snr_db is not None or keep_original):
        raise ValueError("no variants requested")
    in_cols = list(clips.columns)
    out_fields = []
    for f_ in clips.schema.fields:
        if f_.name == "dur_ms":
            out_fields.append(T.StructField("dur_ms", T.IntegerType()))
        else:
            out_fields.append(f_)
    out_schema = T.StructType(out_fields + [
        T.StructField("src_clip_id", T.StringType()),
        T.StructField("variant", T.StringType()),
    ])
    noise_tag = None if noise_snr_db is None else f"noise{noise_snr_db:g}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["bytes"].to_numpy()
            codec_col = pdf["codec"].to_numpy()
            sr_col = pdf["sr_hz"].to_numpy()
            dur_col = pdf["dur_ms"].to_numpy()
            cid_col = pdf["clip_id"].to_numpy()
            keep, new_id, new_bytes, new_dur, src_id, variant = \
                [], [], [], [], [], []

            def emit(k, tag, b, dur):
                keep.append(k)
                new_id.append(f"{cid_col[k]}#{tag}" if tag != "orig"
                              else cid_col[k])
                new_bytes.append(b)
                new_dur.append(dur)
                src_id.append(cid_col[k])
                variant.append(tag)

            for k in range(len(pdf)):
                sr = sr_col[k]
                if sr is None or pd.isna(sr):
                    continue
                sr = int(sr)
                try:
                    x = codecs.decode(payloads[k], codec_col[k])
                except Exception:  # noqa: BLE001 — drop, don't abort the task
                    continue
                dur0 = dur_col[k]
                dur0 = None if dur0 is None or pd.isna(dur0) else int(dur0)
                if keep_original:
                    emit(k, "orig", payloads[k], dur0)
                for f in speeds:
                    y, dur = speed_perturb(x, sr, f)
                    emit(k, f"sp{f:g}", codecs.encode(y, codec_col[k]), dur)
                if noise_tag is not None:
                    y = add_noise(x, noise_snr_db,
                                  _seed(str(cid_col[k]), noise_tag))
                    emit(k, noise_tag, codecs.encode(y, codec_col[k]), dur0)
            out = pdf.iloc[keep].copy()
            out["clip_id"] = new_id
            out["bytes"] = new_bytes
            out["dur_ms"] = pd.array(new_dur, dtype="Int32")
            out["src_clip_id"] = src_id
            out["variant"] = variant
            yield out[in_cols + ["src_clip_id", "variant"]]

    return clips.mapInPandas(batches, schema=out_schema)
