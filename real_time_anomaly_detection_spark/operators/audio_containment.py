"""Snippet-in-clip containment matching — the trimmed-duplicate detector
the whole-clip fingerprint (operators/audio_fingerprint.py) cannot be:
its clip-global descriptor changes when a clip is cut, so a 10-minute
recording re-uploaded as a 30-second excerpt sails past whole-clip
near-dup AND content-level dedup. In an audio training corpus that is a
common duplicate class (trimmed re-uploads, intro/outro edits, the same
take clipped at different in/out points), and dropping only exact or
whole-clip dups leaves every excerpt in the training set.

Algorithm (the per-frame subfingerprint-sequence extension Haitsma &
Kalker describe, ISMIR 2002, with the same seeded random-hyperplane bits
audio_fingerprint.py already uses in place of H&K's adjacent-band sign
bits — see that module's docstring for why sign bits degrade on sparse
spectra):

  1. frame the decoded PCM into fixed-duration windows (``frame_ms`` at
     hop ``hop_ms``), per frame compute the log-band energy-fraction
     descriptor (gain-invariant, codec-robust) and project it through 32
     seeded hyperplanes -> one 32-bit subfingerprint per frame;
  2. candidate seeds: split each 32-bit subfingerprint into two 16-bit
     bands and equi-join inner frames against outer frames on (band_id,
     band_value), then verify full-fp Hamming distance <= ``max_hamming``
     (H&K section 4's bit-error search, expressed as the repo's standard
     pigeonhole banding — audio_fingerprint.py uses the same trick at
     clip granularity). Exact-value matching is measurably too brittle:
     a half-hop-misaligned trim flips 1-6 of the 32 bits per frame,
     collapsing exact frame recall to 0.54-0.78 while one 16-bit half
     stays clean >= 0.83 of the time (pinned in pytest). A q29/q43-style
     hot-value cap on the band buckets keeps a degenerate corpus (one
     band value shared by everything) from going quadratic;
  3. offset vote: a TRUE containment at trim offset d aligns EVERY inner
     frame i with outer frame i+d, so seeds concentrate on one diagonal;
     ``groupBy(inner, outer, offset).count()`` + ``max_by`` picks the
     best diagonal per pair and keeps pairs whose vote covers >=
     ``min_coverage`` of the inner clip's frames.

Seeds join on frame-fingerprint band VALUES (2 bytes + the 4-byte full
fp for the Hamming verify), never PCM: payloads ride one mapInPandas
scan (the audio_features.py / audio_fingerprint.py pattern) and what
shuffles is ~2 x n_frames x 16 bytes per clip. The vote is one
partial-aggregatable groupBy. No all-pairs stage exists at any scale.

Scale envelope (stated, not hidden): the seed join's bucket space is
2 x 65,536 16-bit band values over FRAMES (tens per clip), so it
saturates around 10^7-10^8 clips per run — past that, typical buckets
exceed any practical ``value_cap`` and the guard costs recall. The
whole-clip join's duration-key valve (audio_fingerprint.py) cannot apply
here: a trimmed excerpt's duration DIFFERS from its source's by
construction. At larger scale, shard the corpus by a dup-preserving
dimension (source channel, upload window — trimmed re-uploads cluster in
time) and run containment per shard; cross-shard trims are the accepted
miss, exactly the trade a web-scale near-dup pass makes when it shards.

Caveats (documented trade, mirrored in tests): frame alignment — a trim
at an arbitrary sample offset shifts the inner clip's frame grid by up
to hop/2 against the outer's, perturbing each descriptor. The dense hop
(default hop = frame/4) keeps worst-case misalignment at frame/8, a
small descriptor perturbation in practice (H&K's measured result; the
pytest suite pins non-grid-aligned trims). A pair below
``min_inner_frames`` is undetectable (too little sequence evidence) and
is reported by the caller-visible ``n_frames`` column instead of
silently missed.

No reference-repo analog (its payload was scalar weather numbers;
SURVEY.md §2 lists no audio operators) — beyond-the-reference coverage
for the audio modality, completing the dedup matrix: exact
(content_dedup), whole-clip perceptual (audio_fingerprint), and
containment (this module).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..audio import codecs
from ..caching import persist_tracked
from .audio_fingerprint import _AF_FMAX_HZ, _AF_FMIN_HZ

_CT_NBANDS = 24  # coarser than the whole-clip 48: frames are short
_CT_BITS = 32
_CT_FRAME_MS = 64
_CT_HOP_MS = 16  # frame/4: dense enough that trim misalignment <= frame/8
_CT_MIN_INNER_FRAMES = 8  # below this a sequence vote is meaningless
_CT_MIN_COVERAGE = 0.6  # fraction of inner frames that must align
_CT_MAX_HAMMING = 6  # full-fp bit-error tolerance on banded candidates
_CT_VALUE_CAP = 2000  # frames sharing one band bucket beyond this are dropped
_CT_SEED = 0x0C047A17

_CT_EDGES_HZ = np.geomspace(_AF_FMIN_HZ, _AF_FMAX_HZ, _CT_NBANDS + 1)
# fixed seeded hyperplanes — part of the subfingerprint definition,
# identical on every executor and across runs
_CT_PLANES = np.random.default_rng(_CT_SEED).standard_normal(
    (_CT_BITS, _CT_NBANDS)
)

FRAME_FP_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_fps", T.ArrayType(T.IntegerType())),
        T.StructField("fp_ok", T.BooleanType()),
        T.StructField("fp_error", T.StringType()),
    ]
)


def frame_subfingerprints(
    x: np.ndarray, sr_hz: int, frame_ms: int = _CT_FRAME_MS,
    hop_ms: int = _CT_HOP_MS,
) -> np.ndarray | None:
    """int32[n_frames] subfingerprint sequence for one decoded clip, or
    None when the clip yields no complete frame. Pure numpy and fully
    vectorized across frames: one strided view -> one batched rFFT ->
    one (frames x bands) @ planes matmul — no per-frame Python loop."""
    if sr_hz <= 0:
        return None
    w = int(sr_hz * frame_ms / 1000)
    h = max(1, int(sr_hz * hop_ms / 1000))
    n = int(x.shape[0])
    if w < 32 or n < w:
        return None
    n_frames = 1 + (n - w) // h
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, w), strides=(x.strides[0] * h, x.strides[0])
    )
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, w//2+1)
    freqs = np.fft.rfftfreq(w, 1.0 / sr_hz)
    idx = np.minimum(np.searchsorted(freqs, _CT_EDGES_HZ), spec.shape[1])
    cum = np.concatenate(
        [np.zeros((n_frames, 1)), np.cumsum(spec, axis=1)], axis=1
    )
    energies = cum[:, idx[1:]] - cum[:, idx[:-1]]  # (n_frames, nbands)
    total = energies.sum(axis=1, keepdims=True)
    ok = total[:, 0] > 0  # silent frames carry no spectral shape
    if not ok.any():
        return None
    frac = np.where(ok[:, None], energies / np.where(total > 0, total, 1.0), 0.0)
    centered = frac - frac.mean(axis=1, keepdims=True)
    bits = (centered @ _CT_PLANES.T) > 0  # (n_frames, 32)
    fps = (bits.astype(np.int64) << np.arange(_CT_BITS)).sum(axis=1)
    # int32 container for the 32-bit pattern (bit 31 lands in the sign)
    fps = fps.astype(np.uint32).astype(np.int32)
    return fps[ok]


def frame_fingerprints(
    clips: DataFrame, frame_ms: int = _CT_FRAME_MS, hop_ms: int = _CT_HOP_MS
) -> DataFrame:
    """(part_id, clip_id, n_frames, frame_fps[], fp_ok, fp_error) — one
    payload scan; bytes never leave the map stage; decode failures are
    recorded per row (the engine's T7 record-don't-abort semantics)."""
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
                    fps = frame_subfingerprints(x, sr, frame_ms, hop_ms)
                    if fps is None:
                        rows.append({**base, "n_frames": 0, "frame_fps": None,
                                     "fp_ok": False,
                                     "fp_error": "too_short_or_silent"})
                    else:
                        rows.append({**base, "n_frames": int(fps.shape[0]),
                                     "frame_fps": fps.tolist(), "fp_ok": True,
                                     "fp_error": None})
                except Exception as exc:  # noqa: BLE001 — record, don't abort
                    rows.append({**base, "n_frames": 0, "frame_fps": None,
                                 "fp_ok": False,
                                 "fp_error": f"{type(exc).__name__}: {exc}"[:200]})
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_FP_SCHEMA.fields]
            )

    return projected.mapInPandas(batches, schema=FRAME_FP_SCHEMA)


def containment_pairs(
    frame_fps: DataFrame,
    min_inner_frames: int = _CT_MIN_INNER_FRAMES,
    min_coverage: float = _CT_MIN_COVERAGE,
    max_hamming: int = _CT_MAX_HAMMING,
    value_cap: int | None = _CT_VALUE_CAP,
) -> DataFrame:
    """(inner, outer, offset_frames, matched_frames, inner_frames,
    coverage) — one row per detected containment: >= ``min_coverage`` of
    the inner clip's frame sequence aligns with the outer's at a single
    frame offset. Self-containment and the inner-longer-than-outer
    direction are excluded; a pair of equal-length near-identical clips
    (whole-clip dups) appears in both orientations' candidate sets but is
    emitted once per (inner, outer) ordering with inner = lexically
    smaller id, matching the near-dup pair convention.

    Frame matching is Hamming-tolerant, not exact: each 32-bit fp yields
    two 16-bit band seeds; frames pair when ANY band value collides AND
    the full fps differ by <= ``max_hamming`` bits (pigeonhole: every
    pair within ``max_hamming`` whose errors leave one half clean is
    found; a random frame pair passes with P ~= 2.7e-4 at the default 6,
    noise the coverage threshold ignores). ``max_hamming=0`` recovers
    exact matching.

    Shuffle budget: explode to 2 x (clip, frame_idx, band, val, fp) seed
    rows (~16 bytes each), one equi-join on (band, val) + bit_count
    verify, one groupBy(inner, outer, offset) vote, one max_by per pair.
    ``value_cap`` broadcasts-and-drops the FEW over-cap band buckets
    (q29/q43 hot-bucket guard) so a degenerate corpus — every clip
    silent-but-one-band — cannot go quadratic; containments supported
    ONLY by capped buckets are missed (documented recall trade).
    """
    fp = persist_tracked(  # seeds relation is referenced by both join sides
        frame_fps.filter(F.col("fp_ok") & (F.col("n_frames") >= min_inner_frames))
        .select("clip_id", "n_frames", "frame_fps")
    )
    frames = fp.select(
        "clip_id",
        "n_frames",
        F.posexplode("frame_fps").alias("frame_idx", "fp"),
    )
    seeds = frames.select(
        "clip_id",
        "n_frames",
        "frame_idx",
        "fp",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.col("fp").bitwiseAND(F.lit(0xFFFF)).alias("val"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    # arithmetic shift then mask: sign bit lands in val
                    F.shiftright("fp", 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                ),
            )
        ).alias("bv"),
    ).select("clip_id", "n_frames", "frame_idx", "fp", "bv.band", "bv.val")
    if value_cap is not None:
        hot = (
            seeds.groupBy("band", "val")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > value_cap)
            .select("band", "val")
        )
        seeds = seeds.join(F.broadcast(hot), ["band", "val"], "left_anti")
    a = seeds.select(
        F.col("clip_id").alias("inner"),
        F.col("n_frames").alias("inner_frames"),
        F.col("frame_idx").alias("ai"),
        F.col("fp").alias("fp_a"),
        "band",
        "val",
    )
    b = seeds.select(
        F.col("clip_id").alias("outer"),
        F.col("n_frames").alias("outer_frames"),
        F.col("frame_idx").alias("bi"),
        F.col("fp").alias("fp_b"),
        "band",
        "val",
    )
    votes = (
        a.join(b, ["band", "val"])
        .filter(
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))) <= max_hamming
        )
        .filter(
            (F.col("inner") != F.col("outer"))
            # containment direction: inner fits inside outer; the equal-
            # length whole-dup case keeps one canonical orientation
            & (
                (F.col("inner_frames") < F.col("outer_frames"))
                | (
                    (F.col("inner_frames") == F.col("outer_frames"))
                    & (F.col("inner") < F.col("outer"))
                )
            )
        )
        .groupBy(
            "inner",
            "outer",
            (F.col("bi") - F.col("ai")).alias("offset_frames"),
            "inner_frames",
        )
        # a repeated fp value inside one frame pair contributes one seed
        # per (ai, bi) combination; counting DISTINCT inner positions
        # keeps self-similar (periodic) clips from over-voting one offset
        .agg(F.count_distinct("ai").alias("matched_frames"))
    )
    best = (
        votes.groupBy("inner", "outer", "inner_frames")
        .agg(
            # deterministic on vote ties (periodic clips): most matched
            # frames, then the SMALLEST offset
            F.max_by(
                F.struct("matched_frames", "offset_frames"),
                F.struct(
                    F.col("matched_frames"), (-F.col("offset_frames")).alias("neg")
                ),
            ).alias("best")
        )
        .select(
            "inner",
            "outer",
            F.col("best.offset_frames").alias("offset_frames"),
            F.col("best.matched_frames").alias("matched_frames"),
            F.col("inner_frames"),
        )
    )
    return best.filter(
        F.col("matched_frames") >= F.ceil(F.lit(min_coverage) * F.col("inner_frames"))
    ).select(
        "inner",
        "outer",
        "offset_frames",
        "matched_frames",
        "inner_frames",
        (F.col("matched_frames") / F.col("inner_frames")).alias("coverage"),
    )


def containment_canonical(pairs: DataFrame, max_iters: int = 16) -> DataFrame:
    """(clip_id, canonical) for every clip that is contained in something:
    the TOP of its containment chain — the clip a dedup sink should keep
    when excerpts nest (a 30s cut of a 10min recording that was itself
    re-uploaded as a 1min excerpt resolves to the 10min original, not the
    1min middleman). The terminal op of the containment path, mirroring
    clusters/survivors for the near-dup paths.

    Each inner picks its best outer (highest coverage, then most matched
    frames, then lexically smallest outer — fully deterministic), giving a
    parent forest; chains collapse by pointer jumping (parent <- parent's
    parent), so rounds are O(log depth), not O(depth). The pair relation
    is acyclic by construction — inner_frames < outer_frames, with the
    equal-length whole-dup case emitted only as (lexically smaller ->
    larger) — so jumping always terminates; ``max_iters`` (2^16-deep
    chains) is a guard, and exceeding it raises rather than returning a
    half-collapsed mapping. Each round is localCheckpoint-ed: the
    iterative self-join would otherwise nest the logical plan per round
    (the components.py lesson).
    """
    from .components import collapse_parent_forest

    w = Window.partitionBy("inner").orderBy(
        F.col("coverage").desc(), F.col("matched_frames").desc(),
        F.col("outer").asc(),
    )
    parent = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("inner").alias("node"), F.col("outer").alias("parent"))
    )
    return collapse_parent_forest(parent, max_iters=max_iters).select(
        F.col("node").alias("clip_id"), F.col("root").alias("canonical")
    )
