"""Speaking-rate (transcript/audio duration) consistency — the
misalignment detector for ASR training corpora (opt-in check).

The audio family verifies the transcript STRING against its reference
(`audio_checks.transcript_check`); label_consistency verifies it against
duplicate copies. Neither can see the failure class where transcript and
audio are both individually plausible but don't belong together: a
transcript paired with the wrong clip, audio truncated by a crashed
uploader while the full transcript survived, or a transcript truncated
while the audio is whole. The cheap, standard curation signal for all of
these is the speaking rate — characters per second of audio:

    chars_per_sec = length(normalized transcript) / (dur_ms / 1000)

Human speech lives in a narrow band (read English ~12-18 cps; even fast
conversational speech stays well under ~35 cps), so a clip at 80 cps has
a transcript that cannot fit its audio, and a 10-minute clip at 0.2 cps
carries a transcript for a fraction of it. Public ASR pipelines (e.g.
Kaldi/ESPnet/NeMo recipe filters, Whisper's data curation as described
in Radford et al. 2022 §2) gate on exactly this ratio.

Two detectors:

- ABSOLUTE bounds (`min_cps`/`max_cps`) — the physiological gate. Runs
  per row, map-side only; a clip is checked when transcript is non-null
  and dur_ms > 0 (null transcript / null duration are the completeness
  family's findings, not this one's).
- ROBUST per-group outliers (`speaking_rate_outliers`) — modified
  z-score of cps against the clip's codec group (|z| > 3.5 by default),
  catching systematic misalignment *inside* the absolute band, e.g. a
  batch whose transcripts were shifted by one row. Group stats use
  percentile_approx (a mergeable KLL-family quantile sketch) rather than
  exact median: groups are few (codecs) but group populations are the
  whole table, and the sketch keeps state O(sketch) per group instead of
  a per-group sort at 10^12 rows. Zero-MAD groups fall back to the mean
  absolute deviation, mirroring `detectors._mad_stats` (A7) semantics.

Length is measured on the NORMALIZED transcript (label_consistency.
transcript_norm: casefold, punctuation stripped, whitespace collapsed)
so formatting-only differences never flip a verdict; an all-punctuation
transcript normalizes to "" -> 0 cps -> a too-slow finding, which is the
right call (the audio has no usable label).

Scale shape: everything runs off the engine's shared metadata projection
— (part_id, clip_id, dur_ms, codec, transcript) — so `bytes` is never
read. The absolute gate is one scan + one per-partition agg; the robust
gate adds two sketch aggs over ~|codecs| groups and a broadcast-size
join of the group stats back onto the signals.

Reference parity: recasts the reference's per-station range checks
(anomaly_detector.py:118 detect_threshold — value inside [lo, hi]) onto
the derived cps column, plus its MAD machinery (anomaly_detector.py:136)
per codec group. Beyond-the-reference coverage for the audio+transcript
table shape in BASELINE.json's input hint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VERDICT_FAIL, VERDICT_PASS
from .label_consistency import transcript_norm

MIN_CPS = 1.0    # slower => transcript covers a fraction of the audio
MAX_CPS = 40.0   # faster => transcript cannot fit the audio
MAD_Z = 3.5      # Iglewicz & Hoaglin modified-z cutoff
MIN_GROUP = 30   # robust stats need a population; below this, skip group
_SKETCH_ACC = 10000  # percentile_approx accuracy (exact on small groups)


def speaking_rate_signals(clips: DataFrame, part_col: str = "part_id") -> DataFrame:
    """(part_id, clip_id, codec, n_chars, dur_s, chars_per_sec) for every
    CHECKABLE row: transcript non-null AND dur_ms > 0. Pure Catalyst
    expressions off the metadata projection — map-side only, no shuffle."""
    cols = [F.col(part_col).alias("part_id"), "clip_id"]
    cols.append(
        (F.col("codec") if "codec" in clips.columns else F.lit(None).cast("string"))
        .alias("codec")
    )
    checkable = clips.filter(
        F.col("transcript").isNotNull()
        & F.col("dur_ms").isNotNull()
        & (F.col("dur_ms") > 0)
    )
    return checkable.select(
        *cols,
        F.length(transcript_norm("transcript")).cast("long").alias("n_chars"),
        (F.col("dur_ms").cast("double") / 1000.0).alias("dur_s"),
    ).withColumn(
        "chars_per_sec", F.col("n_chars") / F.col("dur_s")
    )


def speaking_rate_outliers(
    signals: DataFrame,
    group_cols: tuple[str, ...] = ("codec",),
    z_threshold: float = MAD_Z,
    min_group: int = MIN_GROUP,
) -> DataFrame:
    """Signals rows whose cps is a robust outlier within their group:
    adds (group_median, group_mad, mod_z). Modified z = 0.6745*(x-med)/MAD
    with MAD==0 -> mean-AD fallback (detectors A7 semantics). Group stats
    via percentile_approx — mergeable sketch state, no per-group sort."""
    g = list(group_cols)
    v = F.col("chars_per_sec")
    med = signals.groupBy(*g).agg(
        F.percentile_approx(v, 0.5, _SKETCH_ACC).alias("_med"),
        F.count(v).alias("_n"),
    )
    dev = signals.join(F.broadcast(med), g).withColumn(
        "_ad", F.abs(v - F.col("_med"))
    )
    mad_stats = dev.groupBy(*g).agg(
        F.first("_med").alias("group_median"),
        F.first("_n").alias("_n"),
        F.percentile_approx(F.col("_ad"), 0.5, _SKETCH_ACC).alias("_mad_raw"),
        F.avg("_ad").alias("_mean_ad"),
    ).withColumn(
        "group_mad",
        F.when(F.col("_mad_raw") > 0, F.col("_mad_raw")).otherwise(F.col("_mean_ad")),
    )
    scored = signals.join(F.broadcast(mad_stats), g).withColumn(
        "mod_z",
        F.when(
            F.col("group_mad") > 0,
            F.abs(0.6745 * (v - F.col("group_median")) / F.col("group_mad")),
        ).otherwise(F.lit(0.0)),
    )
    return scored.filter(
        (F.col("_n") >= min_group) & (F.col("mod_z") > z_threshold)
    ).drop("_n", "_mad_raw", "_mean_ad")


def speaking_rate_violations(
    clips: DataFrame,
    part_col: str = "part_id",
    min_cps: float = MIN_CPS,
    max_cps: float = MAX_CPS,
    signals: DataFrame | None = None,
    outliers: DataFrame | None = None,
) -> DataFrame:
    """Violation rows (part_id, constraint, clip_id, column, observed,
    expected, detail): one per out-of-bounds clip, plus one per robust
    outlier (when `outliers` is supplied) that is NOT already out of
    bounds — a clip failing both reports once, as the harder finding."""
    if signals is None:
        signals = speaking_rate_signals(clips, part_col)
    cps = F.col("chars_per_sec")
    oob = signals.filter((cps < min_cps) | (cps > max_cps)).select(
        "part_id",
        F.lit("speaking_rate").alias("constraint"),
        "clip_id",
        F.lit("chars_per_sec").alias("column"),
        F.format_string("%.3f", cps).alias("observed"),
        F.format_string("[%.1f, %.1f]", F.lit(min_cps), F.lit(max_cps)).alias("expected"),
        F.format_string(
            "%s: %d chars over %.2fs audio",
            F.when(cps > max_cps, F.lit("transcript cannot fit audio"))
            .otherwise(F.lit("transcript covers a fraction of audio")),
            F.col("n_chars"), F.col("dur_s"),
        ).alias("detail"),
    )
    if outliers is None:
        return oob
    out = outliers.filter((cps >= min_cps) & (cps <= max_cps)).select(
        "part_id",
        F.lit("speaking_rate").alias("constraint"),
        "clip_id",
        F.lit("chars_per_sec").alias("column"),
        F.format_string("%.3f", cps).alias("observed"),
        F.format_string(
            "~%.3f (codec-group median)", F.col("group_median")
        ).alias("expected"),
        F.format_string(
            "robust outlier: modified z %.2f > threshold within codec group",
            F.col("mod_z"),
        ).alias("detail"),
    )
    return oob.unionByName(out)


def speaking_rate_verdicts(
    clips: DataFrame,
    part_col: str = "part_id",
    min_cps: float = MIN_CPS,
    max_cps: float = MAX_CPS,
    signals: DataFrame | None = None,
    outliers: DataFrame | None = None,
) -> DataFrame:
    """Per-partition pass/fail: fails iff the partition holds an
    out-of-bounds clip or (when outliers are computed) a robust outlier.
    Metrics: n_rows, n_checked, n_too_fast, n_too_slow, n_outliers."""
    if signals is None:
        signals = speaking_rate_signals(clips, part_col)
    per_part = (
        clips.select(part_col)
        .groupBy(part_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumnRenamed(part_col, "part_id")
    )
    cps = F.col("chars_per_sec")
    sig_stats = signals.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(cps > max_cps, 1).otherwise(0)).alias("n_too_fast"),
        F.sum(F.when(cps < min_cps, 1).otherwise(0)).alias("n_too_slow"),
    )
    joined = per_part.join(sig_stats, "part_id", "left").fillna(
        {"n_checked": 0, "n_too_fast": 0, "n_too_slow": 0}
    )
    if outliers is not None:
        o = outliers.filter((cps >= min_cps) & (cps <= max_cps))
        o_stats = o.groupBy("part_id").agg(F.count(F.lit(1)).alias("n_outliers"))
        joined = joined.join(o_stats, "part_id", "left").fillna({"n_outliers": 0})
    else:
        joined = joined.withColumn("n_outliers", F.lit(0))
    n_bad = F.col("n_too_fast") + F.col("n_too_slow") + F.col("n_outliers")
    return joined.select(
        "part_id",
        F.lit("speaking_rate").alias("constraint"),
        F.when(n_bad > 0, F.lit(VERDICT_FAIL))
        .otherwise(F.lit(VERDICT_PASS))
        .alias("status"),
        F.map_from_arrays(
            F.array(
                F.lit("n_rows"), F.lit("n_checked"), F.lit("n_too_fast"),
                F.lit("n_too_slow"), F.lit("n_outliers"),
            ),
            F.array(
                F.col("n_rows").cast("double"),
                F.col("n_checked").cast("double"),
                F.col("n_too_fast").cast("double"),
                F.col("n_too_slow").cast("double"),
                F.col("n_outliers").cast("double"),
            ),
        ).alias("metrics"),
        F.when(
            n_bad > 0,
            F.format_string(
                "%d clips' speaking rate is inconsistent with their audio "
                "(%d too fast, %d too slow, %d group outliers)",
                n_bad, F.col("n_too_fast"), F.col("n_too_slow"), F.col("n_outliers"),
            ),
        ).alias("detail"),
    )
