#!/usr/bin/env python
"""Benchmark harness: headline queries + the clips validation pipeline.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "extra": {...}}

Env knobs:
  SPARK_GRAFT_SF_DIR  input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default all cores)
  BENCH_CLIPS         synthesized clips-table size for the validation bench
                      (default 100000 — large enough that the timed region is
                      compute-bound, not stage-latency-bound; the table is
                      synthesized once and cached as parquet)
  BENCH_QUERIES       comma-separated subset of query names (default: all
                      except the documented O(n^2) oracle twins q26/q39 —
                      their answer to scale is "use the LSH path" (q34/q42),
                      so they stay in CORRECTNESS but out of the default
                      bench; pass them explicitly to time them)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_anomaly_detection_spark import engine, synth  # noqa: E402
from real_time_anomaly_detection_spark.operators import drift  # noqa: E402
from real_time_anomaly_detection_spark.queries import QUERIES  # noqa: E402
from real_time_anomaly_detection_spark.session import get_spark  # noqa: E402

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


def _force(df) -> int:
    """Fully evaluate a DataFrame without driver transfer (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out = {}
    for name in names:
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def clips_table(spark, n_clips: int):
    """Synthesize (once, cached as parquet) the bench clips table."""
    path = os.path.join(CACHE_DIR, f"clips_bench_{n_clips}")
    cfg = synth.golden_config(n_clips=n_clips, clips_per_partition=max(n_clips // 20, 1))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(CACHE_DIR, exist_ok=True)
        synth.clips_df(spark, cfg).write.mode("overwrite").parquet(path)
        synth.transcripts_ref_df(spark, cfg).write.mode("overwrite").parquet(path + "_refs")
    return cfg, spark.read.parquet(path), spark.read.parquet(path + "_refs")


def bench_validation(spark, n_clips: int) -> tuple[float, int]:
    """Time the full constraint-validation pipeline (the north-rule metric).

    A small warm-up validation runs first (JIT/codegen compilation, python
    worker spawn, broadcast machinery — all size-independent one-time costs a
    long-running cluster never re-pays), then the cache is cleared so the
    timed run re-executes every stage on the full input."""
    cfg, clips, refs = clips_table(spark, n_clips)
    clean = synth.scaled(synth.clean_config(), n_clips=min(n_clips, 4000),
                         clips_per_partition=max(min(n_clips, 4000) // 4, 1))
    baseline = drift.make_baseline(synth.clips_df(spark, clean), ("dur_ms", "sr_hz"))
    n_rows = clips.count()  # outside the timed region (input is materialized)

    def run_once(c, cl, rf):
        verdicts, violations = engine.validate(
            spark,
            cl,
            refs=rf,
            baseline_rows=baseline,
            ref_pcm_fn=lambda cid: synth.reference_pcm(c, cid),
            cfg=engine.ValidationConfig(),
        )
        _force(verdicts)
        _force(violations)

    wcfg, wclips, wrefs = clips_table(spark, min(n_clips, 4000))
    run_once(wcfg, wclips, wrefs)  # warm-up (small table)

    # median of 3: single-run numbers on this shared VM swing +/-30% with
    # thermal/steal state (identical code measured 27-55s across a day), and
    # this is the recorded headline metric — de-noise it. Cache cleared +
    # driver GC before every run so each re-executes the full job.
    times = []
    for _ in range(3):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        run_once(cfg, clips, refs)
        times.append(time.perf_counter() - t0)
    return sorted(times)[1], n_rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    n_clips = int(os.environ.get("BENCH_CLIPS", "100000"))
    # O(n^2) small-data oracle twins: correctness-only, not benched by default
    ORACLE_TWINS = {"q26_ngram_jaccard", "q39_embedding_neardup"}
    sel = os.environ.get("BENCH_QUERIES")
    names = sel.split(",") if sel else [q for q in QUERIES if q not in ORACLE_TWINS]

    spark = get_spark("rtad-bench", cores=cpus, shuffle_partitions=max(cpus, 8))
    # warm the JVM/codegen path once on the smallest inputs, and spawn the
    # Python/Arrow workers (a size-independent one-time session cost that a
    # long-running cluster never re-pays — same rationale as the validation
    # warm-up below; q43's fingerprint stage is mapInPandas)
    _force(QUERIES["q05_group_minmax"](spark, sf_dir))
    _force(
        spark.range(cpus * 2)
        .repartition(cpus * 2)
        .mapInPandas(lambda it: it, schema="id long")
    )

    qtimes = bench_queries(spark, sf_dir, names)
    vsec, vrows = bench_validation(spark, n_clips)
    qtimes["clips_validate"] = round(vsec, 3)

    total = round(sum(qtimes.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "e2e_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": {
                    "validated_clips_per_sec": round(vrows / vsec, 1),
                    "n_clips": vrows,
                    "cpus": cpus,
                    "scaling_evidence_file": "BENCH/BASELINE.md",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
