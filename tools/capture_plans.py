#!/usr/bin/env python
"""Capture .explain("formatted") output for a set of queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files.

Usage: python tools/capture_plans.py <suffix> <out_dir> [q69_... q72_...]
Runs against the bench corpora (same routing as bench.py) so the plans
match what the bench times. Explain only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from real_time_anomaly_detection_spark.caching import release_cached  # noqa: E402
from real_time_anomaly_detection_spark.queries import QUERIES  # noqa: E402
from real_time_anomaly_detection_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "q22_haversine_pairs",
    "q44_ann_ivf_topk",
    "q46_ann_ivf_trained",
    "q51_decontamination",
    "q53_repetition_signals",
    "q55_quality_heuristics",
    "q56_pii_redaction",
    "q58_vocab_df_stats",
    "q59_unigram_logprob",
    "q62_tfidf_keywords",
    "q64_dup_span_stats",
    "q65_dup_span_removal",
    "q66_perplexity_buckets",
    "q68_semdedup",
    "q69_containment_join",
    "q70_source_overlap",
    "q71_corpus_card",
    "q72_containment_canonical",
]


def main() -> None:
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.cache/sf1")
    os.makedirs(out_dir, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("rtad-plans", cores=cpus, shuffle_partitions=max(cpus, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    for name in names:
        src = (bench.neardup_corpus_dir() if name in bench.NEARDUP_QUERIES
               else bench.spans_corpus_dir() if name in bench.SPANS_QUERIES
               else bench.zipf_corpus_dir() if name in bench.CONTAINMENT_QUERIES
               else sf_dir)
        fn = (bench.BENCH_FN_OVERRIDES.get(name)
              or bench.NEARDUP_BENCH_FNS.get(name, QUERIES[name]))
        try:
            df = fn(spark, src)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"# {name} ({suffix}) corpus={src}\n{plan}\n")
        release_cached()
        spark.catalog.clearCache()
        print(name, "ok", flush=True)


if __name__ == "__main__":
    main()
