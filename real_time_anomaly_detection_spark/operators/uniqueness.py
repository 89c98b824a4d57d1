"""clip_id uniqueness via salted two-phase hash aggregation (M2).

Recasts the reference's storage-enforced `UNIQUE(time, station_id)`
(`streaming_collector_sqlite.py:113`; dedup sink `INSERT OR IGNORE` at `:161`)
as an explicit distributed constraint:

  phase 1: groupBy(clip_id, salt)  -> partial counts   (hot key spread over
                                                        `salt_buckets` reducers)
  phase 2: groupBy(clip_id)        -> total counts     (tiny: one row per key
                                                        that survived phase 1)

For plain counting Spark's hash aggregate already does map-side partial
aggregation, so the salt mainly guards the pathological case where a single
clip_id floods one reducer beyond AQE's skew handling — the north rule asks
for the explicit mechanism, and `salt_buckets=1` degenerates to the plain plan.

Violation rows: one per duplicated key per partition with the observed
multiplicity (the reference's INSERT OR IGNORE would have dropped
`multiplicity - 1` rows — we surface them instead of silently dropping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VERDICT_FAIL, VERDICT_PASS


def duplicate_keys(
    clips: DataFrame,
    key: str = "clip_id",
    part_col: str = "part_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keys with multiplicity > 1 per partition: (part_id, clip_id, n_copies)."""
    base = clips.select(part_col, key)
    if salt_buckets > 1:
        salted = base.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(key), F.lit("salt")), F.lit(salt_buckets))
        )
        partial = salted.groupBy(part_col, key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
        totals = partial.groupBy(part_col, key).agg(F.sum("_c").alias("n_copies"))
    else:
        totals = base.groupBy(part_col, key).agg(F.count(F.lit(1)).alias("n_copies"))
    return totals.filter(F.col("n_copies") > 1)


def uniqueness_violations(
    clips: DataFrame, key: str = "clip_id", part_col: str = "part_id", salt_buckets: int = 16,
    dups: DataFrame | None = None,
) -> DataFrame:
    """`dups`: optionally pass a precomputed (ideally persisted)
    duplicate_keys() result so verdicts and violations share ONE salted agg
    pass instead of re-running it (engine.validate does)."""
    if dups is None:
        dups = duplicate_keys(clips, key, part_col, salt_buckets)
    return dups.select(
        F.col(part_col).alias("part_id"),
        F.lit("uniqueness").alias("constraint"),
        F.col(key).alias("clip_id"),
        F.lit(key).alias("column"),
        F.col("n_copies").cast("string").alias("observed"),
        F.lit("1").alias("expected"),
        F.format_string("duplicate %s with %d copies", F.col(key), F.col("n_copies")).alias(
            "detail"
        ),
    )


def uniqueness_verdicts(
    clips: DataFrame, key: str = "clip_id", part_col: str = "part_id", salt_buckets: int = 16,
    dups: DataFrame | None = None,
) -> DataFrame:
    """Per-partition pass/fail with duplicate-key and extra-copy counts.
    `dups`: see uniqueness_violations."""
    if dups is None:
        dups = duplicate_keys(clips, key, part_col, salt_buckets)
    per_part = clips.select(part_col).groupBy(part_col).agg(F.count(F.lit(1)).alias("n_rows"))
    dup_stats = dups.groupBy(part_col).agg(
        F.count(F.lit(1)).alias("n_dup_keys"),
        F.sum(F.col("n_copies") - 1).alias("n_extra_copies"),
    )
    joined = per_part.join(dup_stats, part_col, "left").fillna(
        {"n_dup_keys": 0, "n_extra_copies": 0}
    )
    return joined.select(
        F.col(part_col).alias("part_id"),
        F.lit("uniqueness").alias("constraint"),
        F.when(F.col("n_dup_keys") > 0, F.lit(VERDICT_FAIL))
        .otherwise(F.lit(VERDICT_PASS))
        .alias("status"),
        F.map_from_arrays(
            F.array(F.lit("n_rows"), F.lit("n_dup_keys"), F.lit("n_extra_copies")),
            F.array(
                F.col("n_rows").cast("double"),
                F.col("n_dup_keys").cast("double"),
                F.col("n_extra_copies").cast("double"),
            ),
        ).alias("metrics"),
        F.when(
            F.col("n_dup_keys") > 0,
            F.format_string("%d duplicated keys", F.col("n_dup_keys")),
        ).alias("detail"),
    )
