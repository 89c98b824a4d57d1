#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4): stage-isolated
timings with the noop sink. bench.py is the frozen driver contract; this
file is where per-stage evidence for OPTIMIZATION_r07.md comes from.

Usage: python bench_extra.py <probe> [args...]
Probes are registered in PROBES; each prints human-readable timings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from real_time_anomaly_detection_spark.caching import release_cached  # noqa: E402
from real_time_anomaly_detection_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)


def _spark():
    return get_spark(
        "rtad-bench-extra", cores=CPUS, shuffle_partitions=max(CPUS, 8),
        extra={"spark.ui.showConsoleProgress": "false"},
    )


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, df):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    _force(df)
    dt = time.perf_counter() - t0
    print(f"  {label:45s} {dt:7.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


def zipf_dir() -> str:
    import bench

    return bench.zipf_corpus_dir()


def neardup_dir() -> str:
    import bench

    return bench.neardup_corpus_dir()


def spans_dir() -> str:
    import bench

    return bench.spans_corpus_dir()


def probe_q69_stages() -> None:
    """Decompose q69 on the zipf bench corpus: doc-set build, df agg,
    global sort, candidate join, verify."""
    from real_time_anomaly_detection_spark.queries import (
        _CJ_THRESHOLD,
        _cj_doc_sets,
        _persist,
        load,
        q69_containment_join,
    )

    spark = _spark()
    d = zipf_dir()
    thr = _CJ_THRESHOLD
    raw = _cj_doc_sets(load(spark, d, "documents"))
    _timed(spark, "q69/0 doc sets (tokenize+md5+distinct)", raw)
    toks = raw.select("doc_id", "n", F.explode("hs").alias("h"))
    _timed(spark, "q69/1 token explode", toks)
    df_tbl = toks.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    _timed(spark, "q69/2 df agg", df_tbl)
    sorted_sets = _persist(
        toks.join(df_tbl, "h")
        .groupBy("doc_id", "n")
        .agg(
            F.expr("transform(sort_array(collect_list(struct(df, h))), s -> s.h)")
            .alias("hs")
        )
    )
    _timed(spark, "q69/3 global-order arrays (join+regroup)", sorted_sets)
    o_min = F.ceil(F.lit(thr) * F.col("n") - 1e-3)
    p = (F.col("n") - o_min + 1).cast("int")
    probe = sorted_sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("n_a"),
        F.posexplode(F.slice("hs", F.lit(1), p)).alias("i", "h"),
    )
    index = sorted_sets.select(
        F.col("doc_b").alias("doc_b") if False else F.col("doc_id").alias("doc_b"),
        F.col("n").alias("n_b"),
        F.posexplode("hs").alias("j", "h"),
    )
    o_min_a = F.ceil(F.lit(thr) * F.col("n_a") - 1e-3)
    cands = (
        probe.join(index, "h")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .filter(F.col("n_b") >= o_min_a)
        .filter(
            1 + F.least(F.col("n_a") - F.col("i") - 1, F.col("n_b") - F.col("j") - 1)
            >= o_min_a
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    _timed(spark, "q69/4 candidates (prefix join+filters)", cands)
    print(f"  n_cands = {cands.count()}")
    a = sorted_sets.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"),
        F.col("n").alias("n_a"),
    )
    b = sorted_sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"))
    out = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.col("doc_a"),
            F.col("doc_b"),
            (F.size(F.array_intersect("hs_a", "hs_b")) / F.col("n_a")).alias("c"),
        )
        .filter(F.round("c", 6) >= thr)
    )
    _timed(spark, "q69/5 verify (2 joins + intersect)", out)
    release_cached()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    _force(q69_containment_join(spark, d))
    print(f"  q69 end-to-end: {time.perf_counter() - t0:.3f}s")


def probe_validate_families() -> None:
    """Per-family wall time of engine.validate on the bench clips table:
    run validate with ONE family enabled at a time (plus the always-shared
    meta persist), then the full default config."""
    import bench
    from real_time_anomaly_detection_spark import engine, synth
    from real_time_anomaly_detection_spark.operators import drift

    spark = _spark()
    n_clips = int(os.environ.get("BENCH_CLIPS", "100000"))
    cfg, clips, refs = bench.clips_table(spark, n_clips)
    clean = synth.scaled(synth.clean_config(), n_clips=4000,
                         clips_per_partition=1000)
    baseline = drift.make_baseline(synth.clips_df(spark, clean),
                                   ("dur_ms", "sr_hz"))
    full = engine.ValidationConfig()
    fams = list(full.checks)
    print("families:", fams)

    def run(checks):
        c = engine.ValidationConfig(checks=tuple(checks))
        verdicts, violations = engine.validate(
            spark, clips, refs=refs, baseline_rows=baseline,
            ref_pcm_fn=lambda cid: synth.reference_pcm(cfg, cid), cfg=c,
        )
        _force(verdicts)
        _force(violations)

    run(["column_stats"])  # warm-up (workers, codegen)
    spark.catalog.clearCache()
    for fam in fams:
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        run([fam])
        print(f"  {fam:25s} {time.perf_counter() - t0:7.3f}s", flush=True)
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    t0 = time.perf_counter()
    run(fams)
    print(f"  {'ALL':25s} {time.perf_counter() - t0:7.3f}s", flush=True)


def probe_audio_neardup_stages() -> None:
    """fingerprints scan vs banded pair join, separately."""
    import bench
    from real_time_anomaly_detection_spark.operators import (
        audio_fingerprint as AFP,
    )

    spark = _spark()
    n_clips = int(os.environ.get("BENCH_CLIPS", "100000"))
    _, clips, _ = bench.clips_table(spark, n_clips)
    _force(clips.limit(2000))  # warm workers
    t0 = time.perf_counter()
    fps = AFP.fingerprints(clips)
    _force(fps)
    print(f"  fingerprints scan  {time.perf_counter() - t0:7.3f}s", flush=True)
    import tempfile

    tmp = tempfile.mkdtemp()
    AFP.fingerprints(clips).write.mode("overwrite").parquet(tmp + "/fps")
    stored = spark.read.parquet(tmp + "/fps")
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = AFP.neardup_pairs(stored).count()
    print(f"  pair join (stored fps) {time.perf_counter() - t0:7.3f}s n={n}",
          flush=True)
    release_cached()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    n = AFP.neardup_pairs(AFP.fingerprints(clips)).count()
    print(f"  end-to-end         {time.perf_counter() - t0:7.3f}s n={n}",
          flush=True)


PROBES = {
    "q69_stages": probe_q69_stages,
    "validate_families": probe_validate_families,
    "audio_neardup_stages": probe_audio_neardup_stages,
}


if __name__ == "__main__":
    PROBES[sys.argv[1]]()
