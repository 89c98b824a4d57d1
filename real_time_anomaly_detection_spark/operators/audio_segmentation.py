"""Fixed-window segmentation of audio clips into training windows.

ASR/audio-LM pretraining consumes fixed-length windows (e.g. 30 s), not
raw uploads: long clips must be chunked (optionally with overlap) and the
window table is what downstream stages key on — `pack-batches` budgets the
window durations, the dedup/containment families run per window when
excerpt-level granularity is wanted. The reference repo has no analog (its
payload was scalar weather numbers); this is a beyond-the-reference
pipeline op like audio_features/audio_packing.

Two surfaces with IDENTICAL boundary semantics:

- `segment_plan`   — metadata only: pure Catalyst expressions over
  (clip_id, dur_ms); ZERO shuffle, `bytes` never read (plan-pinned). At
  10^12 clips this is the table a pipeline stores — segmentation is a
  deterministic function of metadata, so materializing audio bytes per
  window would multiply storage for nothing.
- `segment_pcm`    — materialization for consumers that need the window
  payloads now: ONE mapInPandas scan, decode once per clip, numpy slice
  per window, re-encode pcm16; `bytes` never joined or shuffled
  (the audio_features scan shape).

Boundary semantics (all integer ms arithmetic — both surfaces and the
tests compute bit-identical values):
- full windows start at k*hop_ms, k = 0..n_full-1, each window_ms long;
  n_full = floor((dur - window)/hop) + 1 when dur >= window, else 0.
- when n_full == 0 the whole clip is ONE segment [0, dur) — short clips
  are kept whole (a 5 s clip is all the content there is).
- when n_full > 0, the remainder window [n_full*hop, dur) is emitted iff
  the clip extends past the last full window's end (otherwise every
  sample is already covered and the tail would be redundant) AND it is
  at least `min_tail_ms` long — shorter tails carry little trainable
  signal and a hop < window already covered most of their content.
- `is_tail` marks any segment shorter than window_ms.
- hop_ms > window_ms is rejected (it would silently skip audio);
  null/non-positive dur_ms rows emit nothing (the packing convention:
  a window table cannot account for unknown durations).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..audio import codecs

WINDOW_MS = 30_000
HOP_MS = 30_000
MIN_TAIL_MS = 2_000

PLAN_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("seg_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("seg_ms", T.LongType()),
        T.StructField("is_tail", T.BooleanType()),
    ]
)

PCM_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("seg_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("sr_hz", T.LongType()),
        T.StructField("codec", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
    ]
)


def _check_params(window_ms: int, hop_ms: int, min_tail_ms: int) -> None:
    if window_ms < 1 or hop_ms < 1:
        raise ValueError("window_ms and hop_ms must be >= 1")
    if hop_ms > window_ms:
        raise ValueError(
            f"hop_ms ({hop_ms}) > window_ms ({window_ms}) would silently "
            "skip audio between consecutive windows"
        )
    if min_tail_ms < 0:
        raise ValueError("min_tail_ms must be >= 0")


def segment_bounds(dur_ms: int, window_ms: int = WINDOW_MS,
                   hop_ms: int = HOP_MS,
                   min_tail_ms: int = MIN_TAIL_MS) -> list[tuple[int, int]]:
    """The boundary spec as plain Python — the single source of truth the
    tests pin both DataFrame surfaces against."""
    if dur_ms is None or dur_ms <= 0:
        return []
    if dur_ms < window_ms:
        return [(0, dur_ms)]
    n_full = (dur_ms - window_ms) // hop_ms + 1
    out = [(k * hop_ms, k * hop_ms + window_ms) for k in range(n_full)]
    covered = (n_full - 1) * hop_ms + window_ms
    tail_start = n_full * hop_ms
    if dur_ms > covered and dur_ms - tail_start >= min_tail_ms:
        out.append((tail_start, dur_ms))
    return out


def segment_plan(clips: DataFrame, window_ms: int = WINDOW_MS,
                 hop_ms: int = HOP_MS,
                 min_tail_ms: int = MIN_TAIL_MS) -> DataFrame:
    """(part_id, clip_id, seg_idx, start_ms, end_ms, seg_ms, is_tail) —
    metadata-only window table, map-side Catalyst expressions over the
    pruned (part_id, clip_id, dur_ms) projection."""
    _check_params(window_ms, hop_ms, min_tail_ms)
    w, h, mt = F.lit(int(window_ms)), F.lit(int(hop_ms)), F.lit(int(min_tail_ms))
    dur = F.col("_dur")
    n_full = F.when(dur >= w, F.floor((dur - w) / h) + 1).otherwise(
        F.lit(0).cast("long")
    )
    fulls = F.when(
        n_full > 0,
        F.transform(
            F.sequence(F.lit(0).cast("long"), n_full - 1),
            lambda k: F.struct(
                (k * h).alias("start_ms"), (k * h + w).alias("end_ms")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<start_ms:long,end_ms:long>>"))
    tail_start = n_full * h
    covered = (n_full - 1) * h + w
    tail = F.when(
        ((n_full == 0) & (dur > 0))
        | ((n_full > 0) & (dur > covered) & (dur - tail_start >= mt)),
        F.array(
            F.struct(tail_start.alias("start_ms"), dur.alias("end_ms"))
        ),
    ).otherwise(F.array().cast("array<struct<start_ms:long,end_ms:long>>"))
    segs = F.concat(fulls, tail)
    out = (
        clips.select(
            "part_id", "clip_id", F.col("dur_ms").cast("long").alias("_dur")
        )
        .filter(F.col("_dur").isNotNull() & (F.col("_dur") > 0))
        .select(
            "part_id", "clip_id",
            F.posexplode(segs).alias("seg_idx", "_s"),
        )
    )
    return out.select(
        "part_id",
        "clip_id",
        F.col("seg_idx").cast("long").alias("seg_idx"),
        F.col("_s.start_ms").alias("start_ms"),
        F.col("_s.end_ms").alias("end_ms"),
        (F.col("_s.end_ms") - F.col("_s.start_ms")).alias("seg_ms"),
        (F.col("_s.end_ms") - F.col("_s.start_ms") < F.lit(int(window_ms)))
        .alias("is_tail"),
    )


def segment_pcm(clips: DataFrame, window_ms: int = WINDOW_MS,
                hop_ms: int = HOP_MS,
                min_tail_ms: int = MIN_TAIL_MS) -> DataFrame:
    """Materialized windows: decode each clip ONCE, slice the decoded PCM
    at the `segment_bounds` boundaries (dur_ms metadata is the boundary
    truth — payload/duration consistency is the validation engine's job),
    re-encode pcm16. Undecodable clips emit nothing (the _audio_prepare
    convention: decode-error REPORTING belongs to audio_checks, and a
    window with no payload is useless downstream)."""
    _check_params(window_ms, hop_ms, min_tail_ms)
    projected = clips.select(
        "part_id", "clip_id", "bytes", "sr_hz", "dur_ms", "codec"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            payloads = pdf["bytes"].to_numpy()
            for k in range(len(pdf)):
                dur = pdf["dur_ms"].iloc[k]
                sr = pdf["sr_hz"].iloc[k]
                if pd.isna(dur) or pd.isna(sr) or int(dur) <= 0:
                    continue
                dur, sr = int(dur), int(sr)
                try:
                    x = codecs.decode(payloads[k], pdf["codec"].iloc[k])
                except Exception:  # noqa: BLE001 — drop, don't abort
                    continue
                for idx, (s, e) in enumerate(
                    segment_bounds(dur, window_ms, hop_ms, min_tail_ms)
                ):
                    lo = (s * sr) // 1000
                    hi = min((e * sr) // 1000, len(x))
                    if hi <= lo:
                        continue
                    rows.append(
                        {
                            "part_id": pdf["part_id"].iloc[k],
                            "clip_id": pdf["clip_id"].iloc[k],
                            "seg_idx": idx,
                            "start_ms": s,
                            "end_ms": e,
                            "sr_hz": sr,
                            "codec": "pcm16",
                            "bytes": codecs.pcm16_encode(
                                np.asarray(x[lo:hi])
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in PCM_SCHEMA.fields]
            )

    return projected.mapInPandas(batches, schema=PCM_SCHEMA)
