"""Duration-bucketed training-batch packing (operators/audio_packing.py):
greedy semantics, bucket isolation, padding bound, determinism, and the
metadata-only plan."""

import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.operators import audio_packing as AP


def _clips(spark, rows):
    return spark.createDataFrame(
        rows, "clip_id string, dur_ms int, bytes binary, part_id int"
    )


def test_greedy_boundaries_single_group(spark):
    """Budget 10s, one shard/bucket: [4,5]s fills to 9, [3,7]s exact-fits,
    a 12s clip overflows alone, the next clip opens a fresh batch."""
    rows = [(f"c{i}", d * 1000, None, 0)
            for i, d in enumerate([4, 5, 3, 7, 12, 2])]
    out = AP.pack_batches(
        _clips(spark, rows), budget_s=10.0,
        bucket_edges_s=(10_000.0,), n_shards=1,
    ).orderBy("clip_id").collect()
    assert [r.batch_id for r in out] == [0, 0, 1, 1, 2, 3]


def test_batches_never_mix_buckets_and_respect_budget(spark):
    """Every batch lives inside one (shard, dur_bucket); total duration
    <= budget except singleton overflow batches."""
    rows = [(f"c{i:03d}", 500 + (i * 997) % 35_000, None, 0)
            for i in range(300)]
    asg = AP.pack_batches(_clips(spark, rows), budget_s=30.0)
    stats = AP.batch_stats(asg, budget_s=30.0).collect()
    assert stats
    for r in stats:
        assert r.total_dur_ms <= 30_000 or r.n_clips == 1, r
    # bucket isolation: the rollup keyed (shard,bucket,batch) must cover
    # every assignment row exactly once
    assert sum(r.n_clips for r in stats) == asg.count()


def test_padding_waste_bounded_by_bucket_width(spark):
    """The point of bucketing: within a batch, dur spread <= its bucket's
    width, so padding waste is bounded — compare vs an unbucketed packer."""
    rows = [(f"c{i:03d}", 500 + (i * 997) % 35_000, None, 0)
            for i in range(300)]
    edges = [int(e * 1000) for e in AP.DEFAULT_BUCKET_EDGES_S]
    lo = {i: ([0] + edges)[i] for i in range(len(edges) + 1)}
    hi = {i: (edges + [None])[i] for i in range(len(edges) + 1)}
    asg = AP.pack_batches(_clips(spark, rows), budget_s=30.0)
    spread = (
        asg.groupBy("shard", "dur_bucket", "batch_id")
        .agg(F.min("dur_ms").alias("mn"), F.max("dur_ms").alias("mx"))
        .collect()
    )
    for r in spread:
        assert r.mn > lo[r.dur_bucket] or lo[r.dur_bucket] == 0
        if hi[r.dur_bucket] is not None:
            assert r.mx <= hi[r.dur_bucket]


def test_null_duration_excluded_and_deterministic(spark):
    rows = [("a", 1000, None, 0), ("b", None, None, 0), ("c", 2000, None, 0)]
    df = _clips(spark, rows)
    out1 = sorted(map(tuple, AP.pack_batches(df).collect()))
    out2 = sorted(map(tuple, AP.pack_batches(df).collect()))
    assert out1 == out2
    assert {t[0] for t in out1} == {"a", "c"}


def test_bad_edges_raise(spark):
    with pytest.raises(ValueError):
        AP.pack_batches(_clips(spark, [("a", 1, None, 0)]),
                        bucket_edges_s=(4.0, 2.0))


def test_plan_metadata_only_one_exchange(spark, tmp_path):
    """bytes never leaves the scan (ReadSchema excludes it) and the only
    Exchange keys on (shard, dur_bucket)."""
    rows = [(f"c{i}", 1000 + i, bytes(4), 0) for i in range(50)]
    _clips(spark, rows).write.mode("overwrite").parquet(str(tmp_path / "c"))
    df = AP.pack_batches(spark.read.parquet(str(tmp_path / "c")))
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("Exchange") == 1, p
    assert "hashpartitioning(shard" in p, p
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and "bytes" not in m.group(1), p
