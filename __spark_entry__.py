"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship pipeline: the validation engine's
per-partition column-stats + threshold-verdict pass (the north rule's core,
recasting the reference's health checker `anomaly_detector.py:495-576`)
applied to the driver's `events` table, partitioned by event_type.

`queries()` / `oracle_sql()` expose the full operator suite from
`real_time_anomaly_detection_spark/queries.py` — one entry per operator
family in SURVEY.md §2 plus the training-data ops (dedup, similarity, text,
drift), each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_anomaly_detection_spark.operators import stats  # noqa: E402
from real_time_anomaly_detection_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    _q46_sql,
    _q68_sql,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: column-stats profile + verdicts over sf0.001 events."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    prof = stats.profile(
        ev,
        columns=("value",),
        categorical=("event_type",),
        part_col="event_type",
        approx=True,
    )
    return stats.stats_verdicts(prof, columns=("value",), part_col="event_type")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    # q46's oracle is data-dependent (trained k-means centroids embedded as
    # literals), so it is generated at call time from the correctness-run
    # corpus — the same deterministic training the Spark query performs.
    oracle_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        out["q46_ann_ivf_trained"] = _q46_sql(oracle_dir)
    except (FileNotFoundError, OSError):
        pass  # corpus unavailable: the driver records a rows-only check
    try:
        # q68's oracle embeds the same trained-centroid literals (q46 pattern)
        out["q68_semdedup"] = _q68_sql(oracle_dir)
    except (FileNotFoundError, OSError):
        pass
    return out
