"""Table-provider seam tests: partitioned writes, partition pruning at the
source (X3), snapshot lineage, snapshot-diff discovery."""

from pyspark.sql import functions as F

from real_time_anomaly_detection_spark import synth, tables


def _full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


def test_write_read_snapshot_roundtrip(spark, tmp_path):
    path = str(tmp_path / "clips_tbl")
    cfg = synth.clean_config(n_clips=400, clips_per_partition=100)
    snap1 = tables.write_clips(spark, synth.clips_df(spark, cfg), path)
    assert snap1["n_rows"] == 400 and snap1["parts"] == [0, 1, 2, 3]
    back = tables.read_clips(spark, path)
    assert back.count() == 400
    assert set(r.part_id for r in back.select("part_id").distinct().collect()) == {0, 1, 2, 3}
    snaps = tables.snapshots(spark, path).collect()
    assert len(snaps) == 1 and snaps[0].snapshot_id == snap1["snapshot_id"]


def test_partition_pruning_at_source(spark, tmp_path):
    """A part_id filter must prune partition DIRECTORIES (X3 — the role of
    the reference's B-tree index / hypertable chunks), not scan-and-filter."""
    path = str(tmp_path / "clips_prune")
    cfg = synth.clean_config(n_clips=400, clips_per_partition=100)
    tables.write_clips(spark, synth.clips_df(spark, cfg), path)
    df = tables.read_clips(spark, path).filter(F.col("part_id") == 2)
    plan = _full_plan(df)
    # the filter must appear as a PartitionFilter on the scan node (directory
    # pruning), not as a post-scan Filter; inputFiles() can't evidence this —
    # it lists the relation's files before partition filters apply
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines and any("part_id" in ln for ln in scan_lines), plan
    assert df.count() == 100


def test_snapshot_diff_discovery(spark, tmp_path):
    path = str(tmp_path / "clips_incr")
    cfg = synth.clean_config(n_clips=200, clips_per_partition=100)
    s1 = tables.write_clips(spark, synth.clips_df(spark, cfg), path)
    assert tables.new_parts_since(spark, path, set()) == [0, 1]
    # a second commit adds partitions 2-3; diff vs seen snapshots finds only them
    cfg2 = synth.clean_config(n_clips=400, clips_per_partition=100)
    df2 = synth.clips_df(spark, cfg2).filter(F.col("part_id") >= 2)
    tables.write_clips(spark, df2, path)
    assert tables.new_parts_since(spark, path, {s1["snapshot_id"]}) == [2, 3]
    assert tables.read_clips(spark, path).count() == 400


def test_incremental_validate_prunes_partition_dirs(spark, tmp_path):
    """Resume over the partitioned layout: the pending-partition IN-filter
    must reach the scan as a PartitionFilter, so completed partitions are
    never re-read from disk (T6 + X3 together)."""
    from real_time_anomaly_detection_spark import engine
    from real_time_anomaly_detection_spark import manifest as mf

    path = str(tmp_path / "clips_inc2")
    man = str(tmp_path / "man")
    cfg = synth.clean_config(n_clips=400, clips_per_partition=100)
    tables.write_clips(spark, synth.clips_df(spark, cfg), path)
    clips = tables.read_clips(spark, path)
    vcfg = engine.ValidationConfig(checks=("column_stats", "uniqueness"))
    engine.validate(spark, clips.filter(F.col("part_id") < 2), cfg=vcfg,
                    run_id="r1", manifest_path=man)[0].count()
    spark.catalog.clearCache()

    # the pending set is {2, 3}; the pushed filter must be a partition filter
    manifest = mf.read_manifest(spark, man)
    pend = mf.pending_partitions(
        clips.select("part_id"), manifest, len(vcfg.constraint_names())
    )
    pend_ids = sorted(r.part_id for r in pend.collect())
    assert pend_ids == [2, 3]
    subset = clips.filter(F.col("part_id").isin(pend_ids))
    plan = _full_plan(subset)
    scan_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan_lines and any("part_id" in ln for ln in scan_lines), plan
    verdicts, _ = engine.incremental_validate(spark, clips, man, cfg=vcfg, run_id="r2")
    v = verdicts.toPandas()
    spark.catalog.clearCache()
    assert set(v.part_id) == {2, 3}


def test_iceberg_gate(spark, tmp_path):
    # no Iceberg runtime in this sandbox: the probe must say so and the
    # forced-iceberg path must raise the documented NotImplementedError
    assert tables.iceberg_available(spark) is False
    cfg = synth.clean_config(n_clips=10, clips_per_partition=10)
    import pytest

    with pytest.raises(NotImplementedError):
        tables.write_clips(
            spark, synth.clips_df(spark, cfg), str(tmp_path / "x"), use_iceberg=True
        )
