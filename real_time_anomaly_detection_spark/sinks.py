"""Keyed upsert + CSV export sinks (S7 / S9).

S7 — upsert: the reference's `INSERT INTO stations ... ON CONFLICT(station_id)
DO UPDATE SET ...` (`streaming_collector_sqlite.py:132-155`, PG variant
`:279-299`): the incoming row replaces the stored row for its key. In
production this is Iceberg `MERGE INTO`; the sandbox has no Iceberg runtime,
so the parquet fallback is the SURVEY S7 shape: union(existing, incoming) ->
`row_number()` over (key ORDER BY ts DESC, incoming-first) -> keep rn=1 ->
atomic directory swap. The swap (write tmp, rename) is needed because Spark
cannot overwrite a path it is lazily reading.

Keep-latest tie-break matches the reference: on equal timestamps the INCOMING
row wins (ON CONFLICT DO UPDATE always overwrites).

Scale note: the window partitions by key — one shuffle on the key, the same
plan Iceberg's MERGE would execute for the copy-on-write case; no driver-side
data movement.

S9 — CSV export: `view_data.py:163-177` (full scan + left join + to_csv) ->
`df.write.option('header', true).csv`.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def keep_latest(
    existing: DataFrame | None,
    incoming: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    ts_col: str | None = None,
) -> DataFrame:
    """Pure-DataFrame upsert semantics: one row per key, newest wins
    (incoming wins ties). Usable on its own for read-side dedup."""
    inc = incoming.withColumn("_src", F.lit(1))
    merged = inc if existing is None else existing.withColumn("_src", F.lit(0)).unionByName(inc)
    order = [F.desc(ts_col)] if ts_col else []
    w = Window.partitionBy(*key_cols).orderBy(*order, F.desc("_src"))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def upsert_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    key_cols: list[str] | tuple[str, ...],
    ts_col: str | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Keyed MERGE into a parquet directory (S7). Re-ingesting an updated row
    replaces it; re-ingesting an identical row is a no-op (idempotent,
    reference T2).

    'Table absent' is decided by a filesystem probe, NOT by catching read
    errors — a transient IO failure or corrupt footer propagates instead of
    silently replacing the table with only the incoming batch. The swap is
    rename-aside (old -> __old, tmp -> path, delete __old): a crash mid-swap
    leaves either the old table at path or the old table at __old — never a
    missing table with no recoverable copy.
    """
    has_existing = os.path.isdir(path)
    existing = spark.read.parquet(path) if has_existing else None
    merged = keep_latest(existing, incoming, key_cols, ts_col)
    token = uuid.uuid4().hex[:8]
    tmp = f"{path}__upsert_{token}"
    writer = merged.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    if has_existing:
        aside = f"{path}__old_{token}"
        os.rename(path, aside)
        os.rename(tmp, path)
        shutil.rmtree(aside)
    else:
        os.rename(tmp, path)


def export_csv(df: DataFrame, path: str, header: bool = True, sep: str = ",") -> None:
    """CSV export sink (S9). Distributed write — one file per partition; use
    `df.coalesce(1)` upstream if a single file is required (the reference's
    to_csv wrote one file from one process). Complex columns (map/array/
    struct — e.g. a verdicts table's metrics map) are JSON-encoded: the CSV
    datasource rejects them outright."""
    cols = [
        F.to_json(F.col(f.name)).alias(f.name)
        if f.dataType.typeName() in ("map", "array", "struct")
        else F.col(f.name)
        for f in df.schema.fields
    ]
    df.select(*cols).write.mode("overwrite").option(
        "header", str(header).lower()
    ).option("sep", sep).csv(path)
