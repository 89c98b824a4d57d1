"""Table provider seam: Iceberg when the runtime is present, partitioned
parquet otherwise (SURVEY.md §7.4.5).

The north star names Iceberg tables; this sandbox has no Iceberg runtime jar,
so the provider exposes one API with two backends and IDENTICAL semantics for
everything the engine needs:

- `write_clips` / `read_clips`: the fact table partitioned by `part_id` —
  partition pruning replaces the reference's B-tree index role
  (`streaming_collector_sqlite.py:117-118`, hypertable chunks `:262`; X3 in
  SURVEY §4). A `part_id` filter must prune at the SOURCE (plan-tested:
  `PartitionFilters`, one directory scanned).
- `snapshots`: commit lineage. Iceberg: the `.snapshots` metadata table.
  Parquet fallback: a `_snapshots` JSON-lines sidecar appended per write
  (id, n_rows, parts, mode) — the same role, manually maintained.
- `upsert`: Iceberg `MERGE INTO`; parquet fallback delegates to
  `sinks.upsert_parquet` (union + row_number keep-latest).

Gating: `iceberg_available(spark)` probes the catalog plugin; the Iceberg
branches are real DataFrameWriterV2 / MERGE INTO code paths that only execute
where the runtime jar exists (this sandbox has none, so tests pin the parquet
fallback and a contract test asserts the two backends' documented semantics
match: keep-latest upsert, part_id partitioning, snapshot lineage).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sinks


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog plugin is loadable in this session."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _snapshot_path(path: str) -> str:
    return os.path.join(path, "_snapshots")


def _append_snapshot(path: str, n_rows: int, parts: list[int], mode: str) -> dict:
    rec = {
        "snapshot_id": uuid.uuid4().hex[:16],
        "committed_at": time.time(),
        "n_rows": n_rows,
        "parts": sorted(parts),
        "mode": mode,
    }
    os.makedirs(_snapshot_path(path), exist_ok=True)
    fname = os.path.join(_snapshot_path(path), f"{rec['snapshot_id']}.json")
    with open(fname, "w") as f:
        json.dump(rec, f)
    return rec


def write_clips(
    spark: SparkSession,
    clips: DataFrame,
    path: str,
    mode: str = "append",
    use_iceberg: bool | None = None,
) -> dict:
    """Write the clips fact table partitioned by part_id, recording a
    snapshot. Returns the snapshot record."""
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark)
    if use_iceberg:
        # DataFrameWriterV2 against an Iceberg catalog table named by `path`.
        # Identical engine semantics to the parquet branch; lineage comes from
        # Iceberg's own .snapshots metadata table instead of the sidecar.
        writer = clips.writeTo(path).partitionedBy(F.col("part_id"))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return {"backend": "iceberg", "table": path, "mode": mode}
    # driver-side metadata agg: O(partitions), not O(rows)
    stats = clips.groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
    clips.write.mode(mode).partitionBy("part_id").parquet(os.path.join(path, "data"))
    return _append_snapshot(
        path, int(sum(r.n for r in stats)), [r.part_id for r in stats], mode
    )


def read_clips(
    spark: SparkSession, path: str, use_iceberg: bool | None = None
) -> DataFrame:
    """Read back with `part_id` as a partition column — filters on it prune
    directories (parquet) / partitions (Iceberg) at the source (X3)."""
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark) and "/" not in path
    if use_iceberg:
        return spark.read.table(path)
    return spark.read.parquet(os.path.join(path, "data"))


def snapshots(
    spark: SparkSession, path: str, use_iceberg: bool | None = None
) -> DataFrame:
    """Commit lineage (the Iceberg `.snapshots` metadata table's role)."""
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark) and "/" not in path
    if use_iceberg:
        # Iceberg exposes lineage as the `<table>.snapshots` metadata table;
        # project to the sidecar's shape so callers are backend-agnostic
        return spark.read.table(f"{path}.snapshots").select(
            F.col("snapshot_id").cast("string").alias("snapshot_id"),
            (F.col("committed_at").cast("double")).alias("committed_at"),
            F.lit(None).cast("long").alias("n_rows"),
            F.lit(None).cast("array<int>").alias("parts"),
            F.col("operation").alias("mode"),
        )
    sp = _snapshot_path(path)
    files = [os.path.join(sp, f) for f in os.listdir(sp)] if os.path.isdir(sp) else []
    rows = []
    for f in files:
        with open(f) as fh:
            rows.append(json.load(fh))
    return spark.createDataFrame(
        rows,
        "snapshot_id string, committed_at double, n_rows long, "
        "parts array<int>, mode string",
    )


def new_parts_since(
    spark: SparkSession, path: str, seen_snapshot_ids: set[str]
) -> list[int]:
    """Partition ids committed by snapshots not yet seen — the incremental
    validator's discovery hook (snapshot diff instead of directory listing).

    Parquet-backend only: on Iceberg the equivalent is the incremental read
    (`spark.read.format('iceberg').option('start-snapshot-id', <seen>)`),
    which yields the new ROWS directly rather than new partition ids —
    callers on that backend should validate the incremental frame itself."""
    snaps = snapshots(spark, path, use_iceberg=False).collect()
    parts: set[int] = set()
    for s in snaps:
        if s.snapshot_id not in seen_snapshot_ids:
            parts.update(s.parts)
    return sorted(parts)


def upsert(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    key_cols: list[str],
    ts_col: str | None = None,
    use_iceberg: bool | None = None,
) -> dict:
    """Keyed MERGE into a managed clips table, preserving the managed layout:
    the merge lands in `path/data` partitioned by `part_id` (so partition
    pruning — the module's X3 invariant — survives the upsert) and a snapshot
    record is appended, keeping `snapshots`/`new_parts_since` lineage intact.

    Iceberg backend: `MERGE INTO` via SQL with the incoming batch as a temp
    view (see `_iceberg_merge_sql` for the exact statement — compiled here,
    executable only where the runtime jar exists). Parquet fallback: the same
    keep-latest semantics via `sinks.upsert_parquet` targeting `path/data`
    with `partition_by=['part_id']`. Returns the snapshot record.
    """
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark)
    if use_iceberg:
        view = f"_incoming_{uuid.uuid4().hex[:8]}"
        # Pre-dedup the source to one row per key (newest wins) with the SAME
        # keep_latest the parquet fallback uses: MERGE INTO fails at runtime
        # when multiple source rows match one target row, and 'WHEN NOT
        # MATCHED THEN INSERT *' would insert every duplicate of a new key —
        # both divergences from the parquet backend's semantics.
        sinks.keep_latest(None, incoming, key_cols, ts_col).createOrReplaceTempView(view)
        try:
            spark.sql(_iceberg_merge_sql(path, view, incoming.columns, key_cols, ts_col))
        finally:
            spark.catalog.dropTempView(view)
        return {"backend": "iceberg", "table": path}
    data_path = os.path.join(path, "data")
    if os.path.isdir(path) and not os.path.isdir(data_path):
        raise ValueError(
            f"{path} exists but is not a managed clips table (no data/ "
            "subdirectory) — use sinks.upsert_parquet for flat parquet dirs"
        )
    sinks.upsert_parquet(
        spark, incoming, data_path, key_cols, ts_col, partition_by=["part_id"]
    )
    stats = (
        spark.read.parquet(data_path)
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return _append_snapshot(
        path, int(sum(r.n for r in stats)), [r.part_id for r in stats], "upsert"
    )


def _iceberg_merge_sql(
    table: str, source_view: str, columns: list[str], key_cols: list[str],
    ts_col: str | None,
) -> str:
    """The MERGE INTO statement the Iceberg backend executes — keep-latest
    with incoming-wins-ties, identical to the parquet fallback's semantics."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    newer = f"s.{ts_col} >= t.{ts_col}" if ts_col else "true"
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in key_cols)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED AND {newer} THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
