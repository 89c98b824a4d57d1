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

# Below this estimated (column-pruned) input size the rebalance Exchange
# costs more than the parallelism buys (measured: the sf0.1 documents
# corpus — 0.6 MB raw, 0.25 MB pruned — lost ~0.5 s per query to 64-way
# task scheduling while the 2-29 MB bench corpora gained 2-4x) — tiny
# inputs finish fastest in the few tasks they already have.
_MIN_SPREAD_BYTES = 1 << 20


def spread(d: DataFrame, factor: int = 2) -> DataFrame:
    """Ensure a compute-heavy scan-local stage sees >= cores*factor tasks;
    no-op when the plan already yields that many partitions (guide §2.5
    input skew / §6 input splits) or when the input is too small for the
    rebalance to pay for itself."""
    sc = d.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        stats = d._jdf.queryExecution().optimizedPlan().stats()
        if int(stats.sizeInBytes()) < _MIN_SPREAD_BYTES:
            return d
    except Exception:  # noqa: BLE001 — no estimate: fall through to count
        pass
    try:
        # Probe the JVM-side RDD: same partition count as `d.rdd` (the
        # Python wrapper only appends a row-conversion map, which never
        # changes partitioning) at half the driver cost — `d.rdd` also
        # builds the pickle-conversion plan just to read the count.
        if d._jdf.queryExecution().toRdd().getNumPartitions() >= target:
            return d
    except Exception:  # noqa: BLE001 — planning hiccup: spread anyway
        pass
    return d.repartition(target)
