"""`partitioning.spread` contract: conditional round-robin for scan-starved
compute stages (guide §2.5/§6), no-op everywhere else.

r7 pins, kept after the probe switched from `d.rdd.getNumPartitions()` to
the JVM-side `queryExecution().toRdd().getNumPartitions()`: the two counts
are identical by construction (the Python wrapper only appends a
row-conversion map), so the decision logic is unchanged — these tests make
that an executable claim.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from real_time_anomaly_detection_spark import partitioning
from real_time_anomaly_detection_spark.partitioning import spread


@pytest.fixture(scope="module")
def wide_df(spark):
    # ~1.8 MB optimizer estimate: passes the 1 MB floor.
    return (
        spark.range(0, 100000, 1, 2)
        .withColumn("payload", F.repeat(F.lit("x"), 128))
    )


def test_probe_counts_agree_jvm_vs_python(wide_df):
    """The JVM toRdd partition count the probe reads is the `d.rdd` count."""
    jvm_n = wide_df._jdf.queryExecution().toRdd().getNumPartitions()
    assert jvm_n == wide_df.rdd.getNumPartitions() == 2


def test_spread_rebalances_starved_wide_input(spark, wide_df):
    target = spark.sparkContext.defaultParallelism * 2
    out = spread(wide_df)
    assert out.rdd.getNumPartitions() == target
    # Same rows, only redistributed.
    assert out.count() == wide_df.count()


def test_spread_noop_when_enough_partitions(spark, wide_df):
    target = spark.sparkContext.defaultParallelism * 2
    pre = wide_df.repartition(target)
    out = spread(pre)
    assert out is pre  # no extra Exchange appended


def test_spread_noop_below_size_floor(spark):
    tiny = spark.range(0, 100, 1, 1).withColumn("s", F.lit("y"))
    est = int(tiny._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert est < partitioning._MIN_SPREAD_BYTES
    out = spread(tiny)
    assert out is tiny
