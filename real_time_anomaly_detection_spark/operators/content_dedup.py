"""Content-level duplicate detection for the clips fact table (opt-in check).

`uniqueness` (operators/uniqueness.py) enforces the KEY invariant — one row
per clip_id. This family catches the case key uniqueness cannot: the same
audio payload ingested more than once under DIFFERENT clip_ids (re-uploads,
retried producers re-minting ids), which silently over-weights that clip in
any downstream training corpus. The reference has no content-dedup analog
(its UNIQUE(time, station_id) is key-level, `streaming_collector_sqlite.
py:113`); this is one of the training-data-pipeline additions the graft
carries beyond the reference.

Scale shape: the ONLY expression that touches `bytes` is a map-side
sha2(bytes, 256) projection fused into the scan — the 32-byte digest is what
shuffles, never the payload (same X-invariant as the PCM check; plan-tested
in tests/test_plans.py). Duplicate groups come from one hash aggregate on the
digest; `keeper` (the lexicographically-first clip_id of a group) makes the
violation set deterministic and gives a dedup sink an explicit survivor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VERDICT_FAIL, VERDICT_PASS


def content_fingerprints(clips: DataFrame, part_col: str = "part_id") -> DataFrame:
    """(part_id, clip_id, content_hash) — bytes reduced to a digest at the
    scan, before any wide operation."""
    return clips.select(
        F.col(part_col).alias("part_id"),
        "clip_id",
        F.sha2(F.col("bytes"), 256).alias("content_hash"),
    )


def duplicate_content(clips: DataFrame, part_col: str = "part_id",
                      fp: DataFrame | None = None) -> DataFrame:
    """Rows belonging to a content group with >1 member ACROSS the whole
    table (content dups typically span partitions — that is the case
    partition-local checks miss): (part_id, clip_id, content_hash, n_copies,
    keeper).

    `fp`: optionally pass precomputed fingerprints — e.g. the digest column
    the PCM pass emits (audio_checks.pcm_check(with_digest=True)) — so this
    family costs zero additional payload scans."""
    if fp is None:
        fp = content_fingerprints(clips, part_col)
    groups = fp.groupBy("content_hash").agg(
        F.count(F.lit(1)).alias("n_copies"), F.min("clip_id").alias("keeper")
    )
    return fp.join(groups.filter(F.col("n_copies") > 1), "content_hash")


def content_dedup_violations(clips: DataFrame, part_col: str = "part_id",
                             dups: DataFrame | None = None) -> DataFrame:
    """One violation row per NON-KEEPER member of each duplicate-content
    group (the keeper is the row a dedup sink would retain).
    `dups`: optionally pass a precomputed (ideally persisted)
    duplicate_content() result so verdicts and violations share ONE
    digest-agg pass — and, when it came from the PCM scan, ONE payload scan
    (engine.validate does both)."""
    if dups is None:
        dups = duplicate_content(clips, part_col)
    return dups.filter(F.col("clip_id") != F.col("keeper")).select(
        "part_id",
        F.lit("content_dedup").alias("constraint"),
        "clip_id",
        F.lit("bytes").alias("column"),
        F.col("content_hash").alias("observed"),
        F.col("keeper").alias("expected"),
        F.format_string(
            "content duplicate of %s (%d copies)", F.col("keeper"), F.col("n_copies")
        ).alias("detail"),
    )


def content_dedup_verdicts(clips: DataFrame, part_col: str = "part_id",
                           dups: DataFrame | None = None) -> DataFrame:
    """Per-partition pass/fail: fails iff the partition holds any non-keeper
    member of a (table-wide) duplicate-content group.
    `dups`: see content_dedup_violations. The per-partition row counts come
    from a metadata-column scan (column pruning keeps `bytes` out of it)."""
    if dups is None:
        dups = duplicate_content(clips, part_col)
    per_part = (
        clips.select(part_col)
        .groupBy(part_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumnRenamed(part_col, "part_id")
    )
    dup_stats = (
        dups
        .filter(F.col("clip_id") != F.col("keeper"))
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n_dup_rows"))
    )
    joined = per_part.join(dup_stats, "part_id", "left").fillna({"n_dup_rows": 0})
    return joined.select(
        "part_id",
        F.lit("content_dedup").alias("constraint"),
        F.when(F.col("n_dup_rows") > 0, F.lit(VERDICT_FAIL))
        .otherwise(F.lit(VERDICT_PASS))
        .alias("status"),
        F.map_from_arrays(
            F.array(F.lit("n_rows"), F.lit("n_dup_rows")),
            F.array(F.col("n_rows").cast("double"), F.col("n_dup_rows").cast("double")),
        ).alias("metrics"),
        F.when(
            F.col("n_dup_rows") > 0,
            F.format_string("%d rows duplicate other clips' content", F.col("n_dup_rows")),
        ).alias("detail"),
    )
