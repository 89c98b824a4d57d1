"""Label (transcript) consistency across content-duplicate clips — the
labeling-error detector for ASR training corpora (opt-in check).

The audio family's `transcript_check` verifies each row's transcript
against its REFERENCE (engine.py audio family) — a per-row invariant.
This family checks the invariant the reference table cannot express:
when the SAME audio payload appears under several clip_ids (the
content_dedup groups), their transcripts must agree. A disagreement
means at least one copy is mislabeled — and a dedup sink that keeps one
arbitrary copy silently picks one of the conflicting labels. At real
corpus scale this class is common: re-ingested clips relabeled by a
newer ASR model, human-corrected copies coexisting with machine drafts,
truncated transcripts from a crashed labeling job.

Comparison is on NORMALIZED transcripts (casefold, punctuation stripped,
whitespace collapsed) so formatting-only divergence ("Hello,  world!" vs
"hello world") does not page anyone; a null transcript conflicts with a
non-null one (null-safe inequality), two nulls agree.

Scale shape: rides the content_dedup machinery — the payload was already
reduced to a digest at the scan (one sha2 fused into the PCM pass when
both families run, `engine.py`), so this family only ever touches
(clip_id, transcript) projections: one equi-join of the duplicate rows
against the keepers' transcripts, one normalized comparison, one
per-partition agg. `bytes` is never read again, never shuffled.

The near-dup variant (`neardup_transcript_conflicts`) applies the same
idea to PERCEPTUAL duplicate pairs (operators/audio_fingerprint.py),
where transcripts may legitimately differ a little (re-encodes survive,
endpoints shift) — so agreement is token-set Jaccard against a floor,
not equality.

Reference parity: no analog (the reference's payload was scalar weather
numbers, transcript equality has no meaning there — `anomaly_detector.py`
checks value ranges per station). Beyond-the-reference coverage for the
audio+transcript table shape in BASELINE.json's input hint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import VERDICT_FAIL, VERDICT_PASS
from . import content_dedup

JACCARD_FLOOR = 0.8  # near-dup pairs below this token overlap conflict


def transcript_norm(col: Column | str) -> Column:
    """Casefolded, punctuation-free, whitespace-collapsed transcript —
    the equality domain for label comparison. Pure Catalyst expressions
    (lower/regexp_replace/trim), whole-stage-codegen friendly."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]+", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def transcript_conflicts(
    clips: DataFrame,
    part_col: str = "part_id",
    dups: DataFrame | None = None,
) -> DataFrame:
    """(part_id, clip_id, content_hash, keeper, n_copies, transcript,
    keeper_transcript) — one row per NON-KEEPER member of a duplicate-
    content group whose normalized transcript differs from the keeper's.

    `dups`: optionally pass the persisted duplicate_content() relation so
    content_dedup and this family share one digest-agg pass (engine.
    validate does). Transcripts join in as (clip_id, transcript)
    projections — the payload column never re-enters the plan."""
    if dups is None:
        dups = content_dedup.duplicate_content(clips, part_col)
    t = clips.select("clip_id", "transcript")
    keeper_t = t.select(
        F.col("clip_id").alias("keeper"),
        F.col("transcript").alias("keeper_transcript"),
    )
    members = dups.filter(F.col("clip_id") != F.col("keeper")).select(
        "part_id", "clip_id", "content_hash", "keeper", "n_copies"
    )
    joined = members.join(t, "clip_id").join(keeper_t, "keeper")
    return joined.filter(
        # null-safe inequality: null vs non-null conflicts, null vs null
        # agrees — a lost label IS a disagreement with a present one
        ~transcript_norm("transcript").eqNullSafe(
            transcript_norm("keeper_transcript")
        )
    ).select(
        "part_id", "clip_id", "content_hash", "keeper", "n_copies",
        "transcript", "keeper_transcript",
    )


def label_consistency_violations(
    clips: DataFrame,
    part_col: str = "part_id",
    conflicts: DataFrame | None = None,
) -> DataFrame:
    """Violation-shaped rows (part_id, constraint, clip_id, column,
    observed, expected, detail) for every conflicting copy."""
    if conflicts is None:
        conflicts = transcript_conflicts(clips, part_col)
    return conflicts.select(
        "part_id",
        F.lit("label_consistency").alias("constraint"),
        "clip_id",
        F.lit("transcript").alias("column"),
        F.col("transcript").alias("observed"),
        F.col("keeper_transcript").alias("expected"),
        F.format_string(
            "transcript disagrees with content-duplicate keeper %s (%d copies)",
            F.col("keeper"), F.col("n_copies"),
        ).alias("detail"),
    )


def label_consistency_verdicts(
    clips: DataFrame,
    part_col: str = "part_id",
    conflicts: DataFrame | None = None,
) -> DataFrame:
    """Per-partition pass/fail: fails iff the partition holds a copy whose
    transcript disagrees with its group keeper's. Row counts come from a
    metadata-column scan (column pruning keeps `bytes` out)."""
    if conflicts is None:
        conflicts = transcript_conflicts(clips, part_col)
    per_part = (
        clips.select(part_col)
        .groupBy(part_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumnRenamed(part_col, "part_id")
    )
    conflict_stats = conflicts.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_conflicts")
    )
    joined = per_part.join(conflict_stats, "part_id", "left").fillna(
        {"n_conflicts": 0}
    )
    return joined.select(
        "part_id",
        F.lit("label_consistency").alias("constraint"),
        F.when(F.col("n_conflicts") > 0, F.lit(VERDICT_FAIL))
        .otherwise(F.lit(VERDICT_PASS))
        .alias("status"),
        F.map_from_arrays(
            F.array(F.lit("n_rows"), F.lit("n_conflicts")),
            F.array(
                F.col("n_rows").cast("double"),
                F.col("n_conflicts").cast("double"),
            ),
        ).alias("metrics"),
        F.when(
            F.col("n_conflicts") > 0,
            F.format_string(
                "%d rows' transcripts disagree with their content-duplicate keeper",
                F.col("n_conflicts"),
            ),
        ).alias("detail"),
    )


def neardup_transcript_conflicts(
    clips: DataFrame,
    pairs: DataFrame,
    jaccard_floor: float = JACCARD_FLOOR,
) -> DataFrame:
    """(clip_a, clip_b, hamming, jaccard, transcript_a, transcript_b) —
    perceptual near-dup pairs (audio_fingerprint.neardup_pairs output:
    clip_a, clip_b, hamming) whose transcripts' token-set Jaccard falls
    below ``jaccard_floor``. Near-identical audio with disjoint labels is
    the highest-precision mislabel signal a corpus audit has.

    Token-set Jaccard, not equality: a re-encoded/gain-changed duplicate
    legitimately keeps its transcript, but endpointing differences may
    add/drop boundary words — the floor absorbs that. Both-empty
    transcripts agree (jaccard 1.0); one-sided-empty conflicts (0.0).
    Pure Catalyst: split + array_distinct + array_intersect/union sizes
    over the tiny transcript columns; payloads are long gone."""
    t = clips.select(
        "clip_id", F.split(transcript_norm("transcript"), " ").alias("toks")
    ).select(
        "clip_id",
        F.array_distinct(F.filter("toks", lambda x: x != F.lit(""))).alias("toks"),
    )
    ta = t.select(F.col("clip_id").alias("clip_a"), F.col("toks").alias("toks_a"))
    tb = t.select(F.col("clip_id").alias("clip_b"), F.col("toks").alias("toks_b"))
    joined = pairs.join(ta, "clip_a").join(tb, "clip_b")
    union_sz = F.size(F.array_union("toks_a", "toks_b"))
    jac = F.when(union_sz == 0, F.lit(1.0)).otherwise(
        F.size(F.array_intersect("toks_a", "toks_b")) / union_sz
    )
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") < jaccard_floor)
        .select(
            "clip_a", "clip_b", "hamming", "jaccard",
            F.array_join("toks_a", " ").alias("transcript_a"),
            F.array_join("toks_b", " ").alias("transcript_b"),
        )
    )
