"""Scan-parallelism helpers shared by queries and operators.

Parquet scans split only on row-group boundaries; the repo's local bench/
test corpora (and any small materialized intermediate written as one file)
yield a handful of splits, which caps every downstream compute-heavy stage
at that many tasks regardless of cores. `spread` is the conditional fix:
round-robin only when the scan yields fewer splits than cores*factor — a
no-op on real at-scale inputs, whose file counts dwarf the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(d: DataFrame, factor: int = 2) -> DataFrame:
    """Ensure a compute-heavy scan-local stage sees >= cores*factor tasks;
    no-op when the plan already yields that many partitions (guide §2.5
    input skew / §6 input splits)."""
    sc = d.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        if d.rdd.getNumPartitions() >= target:
            return d
    except Exception:  # noqa: BLE001 — planning hiccup: spread anyway
        pass
    return d.repartition(target)
