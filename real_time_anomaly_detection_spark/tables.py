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

Gating: `iceberg_available(spark)` probes the catalog plugin; every Iceberg
branch raises a clear NotImplementedError in this sandbox rather than
pretending.
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
        raise NotImplementedError(
            "Iceberg runtime detected path not exercised in this sandbox: "
            "spark.sql('CREATE TABLE ... USING iceberg PARTITIONED BY (part_id)') "
            "+ writeTo(...).append() — identical engine semantics"
        )
    # driver-side metadata agg: O(partitions), not O(rows)
    stats = clips.groupBy("part_id").agg(F.count(F.lit(1)).alias("n")).collect()
    clips.write.mode(mode).partitionBy("part_id").parquet(os.path.join(path, "data"))
    return _append_snapshot(
        path, int(sum(r.n for r in stats)), [r.part_id for r in stats], mode
    )


def read_clips(spark: SparkSession, path: str) -> DataFrame:
    """Read back with `part_id` as a partition column — filters on it prune
    directories at the source (X3)."""
    return spark.read.parquet(os.path.join(path, "data"))


def snapshots(spark: SparkSession, path: str) -> DataFrame:
    """Commit lineage (the Iceberg `.snapshots` metadata table's role)."""
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
    validator's discovery hook (snapshot diff instead of directory listing)."""
    snaps = snapshots(spark, path).collect()
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
) -> None:
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark)
    if use_iceberg:
        raise NotImplementedError(
            "Iceberg MERGE INTO path not exercised in this sandbox — the "
            "parquet fallback implements the same keep-latest semantics"
        )
    sinks.upsert_parquet(spark, incoming, path, key_cols, ts_col)
