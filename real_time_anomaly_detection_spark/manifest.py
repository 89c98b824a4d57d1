"""Validation manifest: append-only per-(run, partition, constraint) lineage.

Plays the reference's `collection_log` (`streaming_collector_sqlite.py:120-129`,
append per ingest cycle with status + counts) generalized to per-partition
validation state — the resumability backbone (T5/T6 in SURVEY.md §2.9):
restart-safe because appends are idempotent at partition granularity and
resume = anti-join of expected work against recorded work.

Storage is partitioned parquet (Iceberg's role; see SURVEY.md §7.4.5 — the
sandbox has no Iceberg runtime jar, and the manifest semantics only need
append + scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import VALIDATION_MANIFEST


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    try:
        return spark.read.schema(VALIDATION_MANIFEST).parquet(path)
    except Exception:
        return spark.createDataFrame([], VALIDATION_MANIFEST)


def append_manifest(verdicts: DataFrame, run_id: str, path: str) -> None:
    rows = verdicts.select(
        F.lit(run_id).alias("run_id"),
        F.col("part_id"),
        F.col("constraint"),
        F.col("status"),
        F.col("metrics"),
        F.current_timestamp().alias("started_at"),
        F.current_timestamp().alias("finished_at"),
    )
    rows.write.mode("append").parquet(path)


def completed_partitions(manifest: DataFrame, n_constraints: int) -> DataFrame:
    """Partitions with all expected constraints recorded in a terminal state.

    `error` rows do NOT complete a partition — an errored partition is retried
    on resume (reference behavior: log ERROR and continue next cycle,
    streaming_collector_sqlite.py:400-404).
    """
    return (
        manifest.filter(F.col("status") != "error")
        .groupBy("part_id")
        .agg(F.countDistinct("constraint").alias("n_done"))
        .filter(F.col("n_done") >= n_constraints)
        .select("part_id")
    )


def pending_partitions(
    all_parts: DataFrame, manifest: DataFrame, n_constraints: int
) -> DataFrame:
    """all_parts ANTI completed — the work remaining (SURVEY.md §2.7)."""
    done = completed_partitions(manifest, n_constraints)
    return all_parts.select("part_id").distinct().join(done, "part_id", "left_anti")


def run_verdicts(manifest: DataFrame, run_id: str) -> DataFrame:
    """One PARTITION_VERDICTS-shaped row per (part_id, constraint) for
    `run_id`, keeping the LATEST append — a resumed/retried run appends the
    same key again and the retry outcome supersedes (same keep-latest
    semantics as sinks.upsert_parquet). Feeds report.run_diff so two runs
    can be compared straight off the lineage store; `detail` is not part of
    the manifest schema and comes back null."""
    return (
        manifest.filter(F.col("run_id") == run_id)
        .groupBy("part_id", "constraint")
        .agg(
            F.max_by(
                F.struct("status", "metrics"), F.col("finished_at")
            ).alias("_s")
        )
        .select(
            "part_id",
            "constraint",
            F.col("_s.status").alias("status"),
            F.col("_s.metrics").alias("metrics"),
            F.lit(None).cast("string").alias("detail"),
        )
    )
