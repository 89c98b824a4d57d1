#!/usr/bin/env python
"""Incremental cluster-maintenance evidence (VERDICT r5 #2).

`dedup-apply` re-contracts the ENTIRE accumulated pair graph per invocation;
`cluster-update` folds only NEW epochs into the persisted star forest. This
harness isolates the claim that matters at 10^12 docs with hourly ingest:
per-epoch incremental cost must track the NEW-pair volume (plus the
metadata-scale forest), while the batch cost it replaces grows with the
ACCUMULATED pair volume.

Protocol per epoch (single long-running session, local[--cores]):
  1. synthesize a fixed-volume pairs epoch (pyarrow, no Spark): dense
     5-doc cliques over fresh doc ids (10 pairs each), with 1% of cliques
     chain-linked into the PREVIOUS epoch's cliques so cross-epoch merges
     exercise the forest-reuse path;
  2. time `update_clusters` (incremental — reads forest + new epochs only);
  3. time batch `connected_components` over ALL accumulated pairs (what
     dedup-apply would redo);
  cache cleared + driver GC before each timing.

If the incremental column is ~flat while the batch column grows with epoch
number, the per-epoch cluster cost tracks new-pair volume — the r5 finding
is closed. Output: markdown table on stdout (append to BENCH/BASELINE.md)
plus one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from real_time_anomaly_detection_spark.operators.components import (  # noqa: E402
    connected_components,
)
from real_time_anomaly_detection_spark.session import get_spark  # noqa: E402
from real_time_anomaly_detection_spark.streaming.clusters import (  # noqa: E402
    update_clusters,
)

CLIQUE = 5
PAIRS_PER_CLIQUE = CLIQUE * (CLIQUE - 1) // 2


def synth_epoch_pairs(pairs_root: str, epoch: int, n_cliques: int) -> int:
    """Deterministic fixed-volume epoch: `n_cliques` dense 5-doc cliques on
    fresh ids, plus 1% chain links into the previous epoch's cliques."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = epoch * 10_000_000
    members = base + (
        np.arange(n_cliques)[:, None] * CLIQUE + np.arange(CLIQUE)[None, :]
    )  # (n_cliques, 5)
    a_idx, b_idx = np.triu_indices(CLIQUE, k=1)
    doc_a = members[:, a_idx].reshape(-1)
    doc_b = members[:, b_idx].reshape(-1)
    if epoch > 0:
        links = np.arange(n_cliques // 100)
        doc_a = np.concatenate([doc_a, base + links * CLIQUE])
        doc_b = np.concatenate([doc_b, (epoch - 1) * 10_000_000 + links * CLIQUE])
    t = pa.table({
        "doc_a": pa.array(doc_a, type=pa.int64()),
        "doc_b": pa.array(doc_b, type=pa.int64()),
        "similarity": pa.array(np.ones(len(doc_a)), type=pa.float64()),
    })
    d = os.path.join(pairs_root, f"epoch_id={epoch}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return len(doc_a)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--cliques-per-epoch", type=int, default=10_000,
                    help="10 pairs per clique -> 100k pairs/epoch default")
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark("cluster-update-bench", cores=args.cores,
                      extra={"spark.ui.showConsoleProgress": "false"})
    work = tempfile.mkdtemp(prefix="cluster_update_bench_")
    pairs_root = os.path.join(work, "pairs")
    cl_root = os.path.join(work, "clusters")

    # warm-up: JIT/codegen + python-worker spawn are size-independent
    # one-time session costs; without this epoch 0's timing absorbs them
    warm = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    connected_components(warm).write.format("noop").mode("overwrite").save()

    rows = []
    acc_pairs = 0
    try:
        for e in range(args.epochs):
            n_new = synth_epoch_pairs(pairs_root, e, args.cliques_per_epoch)
            acc_pairs += n_new

            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            r = update_clusters(spark, pairs_root, cl_root)
            incr = time.perf_counter() - t0
            assert r["head"] == e, r

            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            connected_components(
                spark.read.parquet(pairs_root).select("doc_a", "doc_b")
            ).write.format("noop").mode("overwrite").save()
            batch = time.perf_counter() - t0

            rows.append({"epoch": e, "new_pairs": n_new,
                         "acc_pairs": acc_pairs,
                         "incremental_sec": round(incr, 2),
                         "batch_sec": round(batch, 2)})
            print(f"epoch {e}: new={n_new} acc={acc_pairs} "
                  f"incr={incr:.2f}s batch={batch:.2f}s", flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print("\n| epoch | new pairs | accumulated pairs | cluster-update (s) "
          "| batch CC over accumulated (s) |")
    print("| --- | --- | --- | --- | --- |")
    for r in rows:
        print(f"| {r['epoch']} | {r['new_pairs']} | {r['acc_pairs']} "
              f"| {r['incremental_sec']} | {r['batch_sec']} |")
    first, last = rows[1], rows[-1]  # epoch 0 has no forest to reuse
    print(json.dumps({
        "metric": "cluster_update_epoch_cost",
        "cores": args.cores,
        "rows": rows,
        "incremental_growth": round(
            last["incremental_sec"] / max(first["incremental_sec"], 1e-9), 2),
        "batch_growth": round(
            last["batch_sec"] / max(first["batch_sec"], 1e-9), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
