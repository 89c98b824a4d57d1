"""JSON report (S10/U16), upsert sink (S7), CSV export (S9), and
error-state lineage (T7) tests."""

import datetime as dt
import os
import json

import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark import engine, report, sinks, synth
from real_time_anomaly_detection_spark import manifest as mf


@pytest.fixture(scope="module")
def golden_run(spark):
    """validate() over the golden planted-violation fixture (synth.golden_config
    partition roles: 0 clean | 1 dup | 2 nulls | 3 zeros | 4 constant |
    6 corrupt pcm | 7 transcript mismatch | 8 near-empty | 9 clean).
    referential is excluded: its missing_ref knob is GLOBAL (every partition
    would fail), which would mask the per-partition roles this golden pins."""
    cfg = synth.golden_config()
    clips = synth.clips_df(spark, cfg)
    refs = synth.transcripts_ref_df(spark, cfg)
    verdicts, violations = engine.validate(
        spark,
        clips,
        refs=refs,
        ref_pcm_fn=lambda cid: synth.reference_pcm(cfg, cid),
        cfg=engine.ValidationConfig(checks=("column_stats", "uniqueness", "audio")),
    )
    v = verdicts.toPandas()
    spark.catalog.clearCache()
    return v


def test_overall_rollup_golden_partitions(spark, golden_run):
    verdicts = spark.createDataFrame(golden_run)
    roll = {
        r.part_id: r.overall_status
        for r in report.overall_rollup(verdicts).collect()
    }
    assert roll[0] == "pass"   # clean partition
    assert roll[1] == "fail"   # planted duplicates
    assert roll[6] == "fail"   # corrupt pcm
    assert roll[7] == "fail"   # transcript mismatch
    # near-empty partition (2 rows): stats insufficient, uniqueness/audio pass
    assert roll[8] == "insufficient_data"
    assert roll[9] == "pass"


def test_overall_rollup_no_data_state(spark):
    # all constraints insufficient -> the reference's no_data state
    # (anomaly_detector.py:549-555); error outranks everything
    rows = [
        (0, "a", "insufficient_data", {}, None),
        (0, "b", "insufficient_data", {}, None),
        (1, "a", "error", {}, None),
        (1, "b", "fail", {}, None),
    ]
    from real_time_anomaly_detection_spark.schemas import PARTITION_VERDICTS

    verdicts = spark.createDataFrame(rows, PARTITION_VERDICTS)
    roll = {r.part_id: r.overall_status for r in report.overall_rollup(verdicts).collect()}
    assert roll[0] == "no_data"
    assert roll[1] == "error"


def test_report_document_shape(spark, golden_run, tmp_path):
    verdicts = spark.createDataFrame(golden_run)
    out = str(tmp_path / "report.json")
    doc = report.write_report(verdicts, out, run_id="test-run")
    on_disk = json.load(open(out))
    assert on_disk["metadata"]["run_id"] == "test-run"
    s = on_disk["summary"]
    assert s["total_partitions"] == 10
    assert s["failed_partitions"] >= 4  # dup/null/corrupt/mismatch partitions
    assert s["passed_partitions"] >= 2
    assert s["insufficient_partitions"] == 1
    parts = {p["part_id"]: p for p in on_disk["partitions"]}
    # per-partition doc carries the sorted constraint list
    names = [c["constraint"] for c in parts[0]["constraints"]]
    assert names == sorted(names) and "uniqueness" in names
    assert doc["summary"] == s
    # reference-shape parity: anomalies list + normal list (response.md)
    assert {a["part_id"] for a in on_disk["anomalies"]} == {
        p["part_id"] for p in on_disk["partitions"] if p["overall_status"] == "fail"
    }
    assert all(a["failing_constraints"] for a in on_disk["anomalies"])
    assert set(on_disk["normal_partitions"]) >= {0, 9}


def test_write_partition_reports_jsonlines(spark, golden_run, tmp_path):
    verdicts = spark.createDataFrame(golden_run)
    out = str(tmp_path / "part_reports")
    report.write_partition_reports(verdicts, out)
    lines = [json.loads(r.value) for r in spark.read.text(out).collect()]
    assert len(lines) == 10
    assert all("overall_status" in d and "constraints" in d for d in lines)


# ---------------------------------------------------------------- S7 upsert

def _mk(spark, rows):
    return spark.createDataFrame(rows, "clip_id string, transcript string, seen_at timestamp")


def test_upsert_replaces_not_duplicates(spark, tmp_path):
    path = str(tmp_path / "refs_tbl")
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    sinks.upsert_parquet(
        spark, _mk(spark, [("a", "one", t0), ("b", "two", t0)]), path, ["clip_id"], "seen_at"
    )
    # updated row for 'a' + new row 'c'; 'b' untouched
    sinks.upsert_parquet(
        spark, _mk(spark, [("a", "ONE-v2", t1), ("c", "three", t1)]), path, ["clip_id"], "seen_at"
    )
    got = {r.clip_id: r.transcript for r in spark.read.parquet(path).collect()}
    assert got == {"a": "ONE-v2", "b": "two", "c": "three"}
    # idempotent re-ingest: same batch again -> no growth
    sinks.upsert_parquet(
        spark, _mk(spark, [("a", "ONE-v2", t1), ("c", "three", t1)]), path, ["clip_id"], "seen_at"
    )
    assert spark.read.parquet(path).count() == 3


def test_upsert_incoming_wins_ties(spark, tmp_path):
    # equal timestamps: the incoming row wins (ON CONFLICT DO UPDATE,
    # streaming_collector_sqlite.py:132-155)
    path = str(tmp_path / "refs_tie")
    t0 = dt.datetime(2024, 1, 1)
    sinks.upsert_parquet(spark, _mk(spark, [("a", "old", t0)]), path, ["clip_id"], "seen_at")
    sinks.upsert_parquet(spark, _mk(spark, [("a", "new", t0)]), path, ["clip_id"], "seen_at")
    assert spark.read.parquet(path).collect()[0].transcript == "new"


def test_export_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "csv_out")
    df = spark.range(10).select(
        F.col("id"), F.concat(F.lit("name_"), F.col("id")).alias("name")
    )
    sinks.export_csv(df.coalesce(1), out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 10
    assert set(back.columns) == {"id", "name"}


# ------------------------------------------------------------- T7 error state

def test_decode_error_partition_continues_and_resumes(spark, tmp_path):
    """Poison one partition with an undecodable codec: its pcm_check verdict is
    status='error', every other constraint/partition completes, and resume
    retries ONLY the errored partition (manifest.completed_partitions excludes
    error rows)."""
    cfg = synth.clean_config(n_clips=400, clips_per_partition=100)
    clips = synth.clips_df(spark, cfg).withColumn(
        "codec",
        F.when(F.col("part_id") == 2, F.lit("not_a_codec")).otherwise(F.col("codec")),
    )
    refs = synth.transcripts_ref_df(spark, cfg)
    man = str(tmp_path / "manifest")
    vcfg = engine.ValidationConfig(checks=("column_stats", "uniqueness", "audio"))
    verdicts, _ = engine.validate(
        spark,
        clips,
        refs=refs,
        ref_pcm_fn=lambda cid: synth.reference_pcm(cfg, cid),
        cfg=vcfg,
        run_id="r1",
        manifest_path=man,
    )
    v = verdicts.toPandas()
    spark.catalog.clearCache()
    pcm = v[v.constraint == "pcm_check"].set_index("part_id").status
    assert pcm[2] == "error"
    assert (pcm.drop(2) == "pass").all()
    # the run continued: all partitions have verdicts for all constraints
    assert set(v.part_id) == {0, 1, 2, 3}

    # resume: only the errored partition is pending
    n_constraints = len(vcfg.runnable_constraints(refs, None, object()))
    manifest = mf.read_manifest(spark, man)
    pend = mf.pending_partitions(
        clips.select(F.col("part_id")), manifest, n_constraints
    )
    assert [r.part_id for r in pend.collect()] == [2]


def test_family_build_failure_records_error_verdict(spark):
    """A constraint family whose plan cannot be built (missing column) yields
    a status='error' row instead of aborting the other families."""
    cfg = synth.clean_config(n_clips=100, clips_per_partition=50)
    clips = synth.clips_df(spark, cfg)
    vcfg = engine.ValidationConfig(
        checks=("column_stats", "uniqueness"), columns=("sr_hz", "no_such_col")
    )
    verdicts, _ = engine.validate(spark, clips, cfg=vcfg)
    v = verdicts.toPandas()
    spark.catalog.clearCache()
    errs = v[v.status == "error"]
    assert list(errs.constraint) == ["column_stats"]
    assert (v[v.constraint == "uniqueness"].status == "pass").all()


def test_upsert_propagates_read_errors(spark, tmp_path):
    """ADVICE r2 (medium): a corrupt existing table must raise — NOT be
    silently replaced by the incoming batch."""
    import pytest

    path = str(tmp_path / "corrupt_tbl")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    t0 = dt.datetime(2024, 1, 1)
    with pytest.raises(Exception):
        sinks.upsert_parquet(spark, _mk(spark, [("a", "x", t0)]), path, ["clip_id"], "seen_at")
    # the corrupt dir is still there (not clobbered by the incoming batch)
    assert os.path.isdir(path) and os.listdir(path)


def test_upsert_partition_by_preserved(spark, tmp_path):
    path = str(tmp_path / "part_tbl")
    df = spark.createDataFrame(
        [("a", 0, "one"), ("b", 1, "two")], "clip_id string, part_id int, transcript string"
    )
    sinks.upsert_parquet(spark, df, path, ["clip_id"], partition_by=["part_id"])
    assert sorted(d for d in os.listdir(path) if d.startswith("part_id=")) == [
        "part_id=0", "part_id=1"
    ]
    df2 = spark.createDataFrame([("a", 0, "ONE")], "clip_id string, part_id int, transcript string")
    sinks.upsert_parquet(spark, df2, path, ["clip_id"], partition_by=["part_id"])
    assert sorted(d for d in os.listdir(path) if d.startswith("part_id=")) == [
        "part_id=0", "part_id=1"
    ]
    got = {r.clip_id: r.transcript for r in spark.read.parquet(path).collect()}
    assert got == {"a": "ONE", "b": "two"}
