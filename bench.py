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
  BENCH_NEARDUP_DIR   corpus dir for the near-dup family (q29/q34/q40/q42/
                      q43). Default: a controlled-density synthetic corpus
                      (20k docs / 8k vectors, ~1% near-dup rate, generated
                      once into .cache/neardup_bench by tools/make_sf1's
                      synthesizers). The sf0.1 test corpus is DEGENERATE
                      (~49% of all pairs are LSH candidates, ~84% verify),
                      so near-dup walls there measure verify-stage memory
                      bandwidth, not the candidate-generation design
                      (VERDICT r4 #3); set BENCH_NEARDUP_DIR to the sf dir
                      to reproduce the old behavior. CORRECTNESS still runs
                      the degenerate corpus.
  BENCH_RUNS          timed repetitions for the envelope queries (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_anomaly_detection_spark import engine, synth  # noqa: E402
from real_time_anomaly_detection_spark.caching import release_cached  # noqa: E402
from real_time_anomaly_detection_spark.operators import drift  # noqa: E402
from real_time_anomaly_detection_spark.queries import QUERIES  # noqa: E402
from real_time_anomaly_detection_spark.session import get_spark  # noqa: E402

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")

# near-dup family: benched on the controlled-density corpus by default, in
# the PRODUCTION configuration (threshold-derived banding) rather than the
# oracle-pinned registry geometry — the registry pins q42 to the dense 6x2
# planes the static DuckDB oracle encodes, which is the documented
# scale-killer on any clustered corpus (measured 19.8s vs 1.4s here) and is
# not what a user at scale would run. q42 benches at threshold 0.9, the
# similarity regime of the corpus's planted pairs (cosine ~0.95).
from real_time_anomaly_detection_spark.queries import (  # noqa: E402
    q29_minhash_lsh,
    q34_neardup_lsh_verified,
    q42_embedding_neardup_lsh,
    q47_neardup_clusters,
    q48_dedup_corpus,
    q49_embedding_clusters,
    q50_modality_reconciliation,
    q51_decontamination,
    q57_leakage_safe_split,
    q60_semantic_decontamination,
    q61_decontamination_report,
    q68_semdedup,
)

NEARDUP_BENCH_FNS = {
    "q29_minhash_lsh": q29_minhash_lsh,                      # derived @ 0.5
    "q34_neardup_lsh_verified": q34_neardup_lsh_verified,    # derived @ 0.5
    "q42_embedding_neardup_lsh": (
        lambda s, d: q42_embedding_neardup_lsh(s, d, threshold=0.9)
    ),
    "q47_neardup_clusters": q47_neardup_clusters,            # derived @ 0.5
    # materialized-input pattern: q47's row times the cluster compute;
    # q48's row times what dedup-apply adds — the gated anti-join
    "q48_dedup_corpus": (
        lambda s, d: q48_dedup_corpus(
            s, d, clusters=s.read.parquet(_q50_cluster_paths(s, d)[0]),
        )
    ),
    "q49_embedding_clusters": (
        lambda s, d: q49_embedding_clusters(s, d, threshold=0.9)
    ),
    # reconciliation over MATERIALIZED per-modality cluster relations —
    # how a pipeline actually runs it (cluster-update checkpoints labels
    # every epoch; reconciliation joins the label tables). The q47/q49
    # stacks are timed in their own rows; re-timing both inside q50 (the
    # r6-early behavior, ~10.4s) double-counted the suite's dominant cost.
    # _q50_cluster_paths materializes once, untimed, in bench_queries.
    "q50_modality_reconciliation": (
        lambda s, d: q50_modality_reconciliation(
            s, d,
            text_clusters=s.read.parquet(_q50_cluster_paths(s, d)[0]),
            emb_clusters=s.read.parquet(_q50_cluster_paths(s, d)[1]),
        )
    ),
    # same materialized-input pattern: the cluster compute is q47's row
    "q57_leakage_safe_split": (
        lambda s, d: q57_leakage_safe_split(
            s, d, clusters=s.read.parquet(_q50_cluster_paths(s, d)[0]),
        )
    ),
    # production config like q42: threshold-derived banding at the
    # corpus's planted-pair similarity regime, not the oracle's dense 6x2
    "q60_semantic_decontamination": (
        lambda s, d: q60_semantic_decontamination(s, d, threshold=0.9)
    ),
    # SemDeDup at the corpus's planted-pair similarity regime (q42's bench
    # convention). NOTE: q69 must NOT appear here — NEARDUP_QUERIES is
    # derived from this dict's keys, and q69 routes to the SPANS corpus
    # (SPANS_QUERIES below): the near-dup corpus's 8-letter-run vocabulary
    # degenerates its containment join to ~all-pairs (measured 109s vs 17s).
    "q68_semdedup": (lambda s, d: q68_semdedup(s, d, threshold=0.9)),
    # materialized-input pattern: q51/q60's rows time the two checks,
    # q61's row times the adjudication join
    "q61_decontamination_report": (
        lambda s, d: q61_decontamination_report(
            s, d,
            verbatim=s.read.parquet(_q61_input_paths(s, d)[0]),
            semantic=s.read.parquet(_q61_input_paths(s, d)[1]),
        )
    ),
}

_Q50_CLUSTER_PATHS: dict[str, tuple[str, str]] = {}


def _q50_cluster_paths(spark, corpus_dir: str) -> tuple[str, str]:
    """Materialize q50's two input cluster relations (q47 @ derived 0.5,
    q49 @ derived 0.9 — the same production configs their own bench rows
    time) to parquet once per corpus; returns (text_path, emb_path)."""
    if corpus_dir not in _Q50_CLUSTER_PATHS:
        import hashlib

        key = hashlib.sha256(corpus_dir.encode()).hexdigest()[:12]
        tp = os.path.join(CACHE_DIR, f"q50_text_clusters_{key}")
        ep = os.path.join(CACHE_DIR, f"q50_emb_clusters_{key}")
        q47_neardup_clusters(spark, corpus_dir).write.mode(
            "overwrite").parquet(tp)
        q49_embedding_clusters(spark, corpus_dir, threshold=0.9).write.mode(
            "overwrite").parquet(ep)
        spark.catalog.clearCache()
        _Q50_CLUSTER_PATHS[corpus_dir] = (tp, ep)
    return _Q50_CLUSTER_PATHS[corpus_dir]
_Q61_INPUT_PATHS: dict[str, tuple[str, str]] = {}


def _q61_input_paths(spark, corpus_dir: str) -> tuple[str, str]:
    """Materialize q61's two check relations (q51 verbatim; q60 semantic
    at the production threshold its own bench row uses) once per corpus;
    returns (verbatim_path, semantic_path)."""
    if corpus_dir not in _Q61_INPUT_PATHS:
        import hashlib

        key = hashlib.sha256(corpus_dir.encode()).hexdigest()[:12]
        vp = os.path.join(CACHE_DIR, f"q61_verbatim_{key}")
        sp = os.path.join(CACHE_DIR, f"q61_semantic_{key}")
        q51_decontamination(spark, corpus_dir).write.mode(
            "overwrite").parquet(vp)
        q60_semantic_decontamination(spark, corpus_dir, threshold=0.9).write.mode(
            "overwrite").parquet(sp)
        spark.catalog.clearCache()
        _Q61_INPUT_PATHS[corpus_dir] = (vp, sp)
    return _Q61_INPUT_PATHS[corpus_dir]


NEARDUP_QUERIES = set(NEARDUP_BENCH_FNS) | {
    "q40_simhash_hamming",
    "q43_winnowing_neardup",
}
NEARDUP_DOCS = 20_000
NEARDUP_VECS = 8_000

# exact-substring dedup family: benched on its OWN controlled corpus —
# both the sf dirs and the near-dup corpus are degenerate for k-token
# window hashing (their synthetic words fragment under the [a-z]+
# tokenizer to ~15 distinct letter runs -> 100% window-dup rate, so a
# bench there times the all-duplicate explosion, not the design; the
# spans corpus plants a realistic ~1-2% window-dup rate)
SPANS_QUERIES = {"q64_dup_span_stats", "q65_dup_span_removal"}
SPANS_DOCS = 20_000

# containment join: benched on a ZIPFIAN-vocabulary corpus with planted
# excerpts. The sf and near-dup corpora fragment under [a-z]+ to an
# 8-15-token vocabulary (avg 3 distinct tokens/doc -> 384M raw candidates,
# measured — the all-overlap explosion); the spans corpus has a realistic
# vocabulary SIZE but draws it UNIFORMLY, the worst case for rarity-ordered
# prefix filtering (every df ~equal, nothing to order by). Real corpora are
# Zipf-distributed — prefix tokens are genuinely rare — which is the regime
# the operator is designed for (measured here: 19s uniform vs 10s zipf at
# the same 20k docs, and the gap grows with corpus size).
CONTAINMENT_QUERIES = {"q69_containment_join", "q72_containment_canonical",
                       "q73_dedup_disposition"}

# Bench-fn overrides that do NOT imply corpus routing (NEARDUP_BENCH_FNS
# keys drive NEARDUP_QUERIES — the r6 q69 misroute; overrides for queries
# routed elsewhere go here). q73's row times the disposition SPINE over
# materialized q47/q72 relations (q48/q50/q61 pattern: the component costs
# have their own rows).
from real_time_anomaly_detection_spark.queries import (  # noqa: E402
    q73_dedup_disposition as _q73_raw,
)

BENCH_FN_OVERRIDES = {
    "q73_dedup_disposition": (
        lambda s, d: _q73_raw(
            s, d,
            clusters=s.read.parquet(_q73_input_paths(s, d)[0]),
            canon=s.read.parquet(_q73_input_paths(s, d)[1]),
        )
    ),
}

_Q73_INPUT_PATHS: dict[str, tuple[str, str]] = {}


def _q73_input_paths(spark, corpus_dir: str) -> tuple[str, str]:
    """Materialize q73's cluster + canonical inputs once per corpus,
    untimed (q47 in derived banding at its default threshold; q72 at its
    default 0.9); returns (clusters_path, canon_path)."""
    if corpus_dir not in _Q73_INPUT_PATHS:
        import hashlib

        from real_time_anomaly_detection_spark.queries import (
            q47_neardup_clusters,
            q72_containment_canonical,
        )

        key = hashlib.sha256(corpus_dir.encode()).hexdigest()[:12]
        cp = os.path.join(CACHE_DIR, f"q73_clusters_{key}")
        kp = os.path.join(CACHE_DIR, f"q73_canon_{key}")
        q47_neardup_clusters(spark, corpus_dir).write.mode(
            "overwrite").parquet(cp)
        q72_containment_canonical(spark, corpus_dir).write.mode(
            "overwrite").parquet(kp)
        release_cached()
        spark.catalog.clearCache()
        _Q73_INPUT_PATHS[corpus_dir] = (cp, kp)
    return _Q73_INPUT_PATHS[corpus_dir]
ZIPF_DOCS = 20_000


def zipf_corpus_dir() -> str:
    env = os.environ.get("BENCH_ZIPF_DIR")
    if env:
        return env
    path = os.path.join(CACHE_DIR, f"zipf_bench_{ZIPF_DOCS}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import make_sf1

        os.makedirs(path, exist_ok=True)
        make_sf1.make_zipf_documents(path, n_docs=ZIPF_DOCS)
        open(marker, "w").close()
    return path


def spans_corpus_dir() -> str:
    env = os.environ.get("BENCH_SPANS_DIR")
    if env:
        return env
    path = os.path.join(CACHE_DIR, f"spans_bench_{SPANS_DOCS}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import make_sf1

        os.makedirs(path, exist_ok=True)
        make_sf1.make_span_documents(path, n_docs=SPANS_DOCS)
        open(marker, "w").close()
    return path


def neardup_corpus_dir() -> str:
    """Build (once, cached) the realistic-density near-dup bench corpus:
    tools/make_sf1's synthesizers at 20k docs / 8k vectors, ~1% planted
    near-dup rate, deterministic. No Spark needed — pure pyarrow."""
    env = os.environ.get("BENCH_NEARDUP_DIR")
    if env:
        return env
    path = os.path.join(CACHE_DIR, f"neardup_bench_{NEARDUP_DOCS}_{NEARDUP_VECS}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import make_sf1

        os.makedirs(path, exist_ok=True)
        make_sf1.make_documents(path, n_docs=NEARDUP_DOCS)
        make_sf1.make_embeddings(path, n_vecs=NEARDUP_VECS)
        open(marker, "w").close()
    return path


def _force(df) -> int:
    """Fully evaluate a DataFrame without driver transfer (noop sink)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def bench_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    nd_dir = neardup_corpus_dir() if any(n in NEARDUP_QUERIES for n in names) else None
    if {"q50_modality_reconciliation", "q57_leakage_safe_split",
            "q48_dedup_corpus"} & set(names):
        # materialize the cluster inputs OUTSIDE the timed region
        _q50_cluster_paths(spark, nd_dir)
    if "q61_decontamination_report" in names:
        _q61_input_paths(spark, nd_dir)
    sp_dir = spans_corpus_dir() if SPANS_QUERIES & set(names) else None
    zf_dir = zipf_corpus_dir() if CONTAINMENT_QUERIES & set(names) else None
    out = {}
    for name in names:
        src = (nd_dir if name in NEARDUP_QUERIES
               else sp_dir if name in SPANS_QUERIES
               else zf_dir if name in CONTAINMENT_QUERIES else sf_dir)
        fn = (BENCH_FN_OVERRIDES.get(name)
              or NEARDUP_BENCH_FNS.get(name, QUERIES[name]))
        t0 = time.perf_counter()
        _force(fn(spark, src))
        out[name] = round(time.perf_counter() - t0, 3)
        # queries persist() their multi-referenced intermediates and cannot
        # unpersist before returning; release the tracked registry (and
        # clearCache as a belt) so the bench session doesn't accumulate
        # cached relations across the suite
        release_cached()
        spark.catalog.clearCache()
    return out


def q46_evidence(spark, sf_dir: str) -> dict:
    """n_cells / nprobe / MEASURED recall for the q46 timing (VERDICT r5
    #6): the sqrt-n cell count changes cost round-over-round, so the bench
    artifact must carry the recall those cells buy. Ground truth is a
    driver-side numpy brute force over the full embeddings table — the
    corpora benched here are metadata-sized (2k-8k vectors); the q46 result
    itself is probe-set-sized, so the collect is bounded."""
    import numpy as np
    import pyarrow.parquet as pq

    from real_time_anomaly_detection_spark.queries import (
        _IVF_NPROBE,
        _ivf_cells_for,
        q46_ann_ivf_trained,
    )

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    vid = np.asarray(t.column("vec_id").to_pylist())
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(vid, kind="stable")
    vid, x = vid[order], x[order]
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    idx = {int(v): i for i, v in enumerate(vid)}

    def recall_at(nprobe: int) -> tuple[int, float]:
        by_probe: dict[int, set[int]] = {}
        for r in q46_ann_ivf_trained(spark, sf_dir, nprobe=nprobe).collect():
            by_probe.setdefault(int(r.probe_id), set()).add(int(r.cand_id))
        k = max(len(s) for s in by_probe.values())
        hits = tot = 0
        for p, cands in by_probe.items():
            sims = xn @ xn[idx[p]]
            sims[idx[p]] = -np.inf
            truth = {int(vid[i]) for i in np.lexsort((vid, -sims))[:k]}
            hits += len(cands & truth)
            tot += k
        return k, round(hits / tot, 3)

    # Curve, not a point: the sf corpora are UNCLUSTERED gaussians (worst
    # case for any IVF — the clustered-corpus recall >=0.8 at nprobe=4 is
    # pytest-pinned in tests/test_neardup.py), so the artifact shows the
    # nprobe knob buying recall monotonically rather than one low number
    # with no context.
    curve: dict[str, float] = {}
    k = 0
    for np_ in sorted({_IVF_NPROBE, 4, 8, 16}):
        k, r = recall_at(np_)
        curve[str(np_)] = r
    return {"n_cells": _ivf_cells_for(len(x)), "nprobe": _IVF_NPROBE,
            "topk": k, "recall": curve[str(_IVF_NPROBE)],
            "recall_by_nprobe": curve,
            "corpus": "unclustered gaussian (IVF worst case; clustered-corpus"
                      " recall pinned >=0.8 at nprobe=4 in tests)"}


def clips_table(spark, n_clips: int):
    """Synthesize (once, cached as parquet) the bench clips table."""
    path = os.path.join(CACHE_DIR, f"clips_bench_{n_clips}")
    cfg = synth.golden_config(n_clips=n_clips, clips_per_partition=max(n_clips // 20, 1))
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(CACHE_DIR, exist_ok=True)
        synth.clips_df(spark, cfg).write.mode("overwrite").parquet(path)
        synth.transcripts_ref_df(spark, cfg).write.mode("overwrite").parquet(path + "_refs")
    return cfg, spark.read.parquet(path), spark.read.parquet(path + "_refs")


def bench_validation(spark, n_clips: int) -> tuple[list[float], int]:
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
    for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        run_once(cfg, clips, refs)
        times.append(time.perf_counter() - t0)
    return sorted(times), n_rows


def bench_audio_neardup(spark, n_clips: int) -> tuple[list[float], int]:
    """Time the audio near-dup pipeline (fingerprints -> banded Hamming
    pairs) over the SAME bench clips table the validation metric uses.
    count() is a faithful action here: the expensive stages (payload decode
    + FFT inside mapInPandas, the banded self-join, the distinct) cannot be
    pruned under it."""
    from real_time_anomaly_detection_spark.operators import (
        audio_fingerprint as AFP,
    )

    _, clips, _ = clips_table(spark, n_clips)
    n_pairs = 0
    times = []
    for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        n_pairs = AFP.neardup_pairs(AFP.fingerprints(clips)).count()
        times.append(time.perf_counter() - t0)
    return sorted(times), n_pairs


def bench_audio_curate(spark, n_clips: int) -> list[float]:
    """Time the fused payload-rewrite pipeline (curate-audio: trim +
    resample + normalize in ONE mapInPandas scan) over the SAME bench
    clips table. noop sink — a count() would prune nothing here either,
    but the noop write is the established full-evaluation convention."""
    from real_time_anomaly_detection_spark.operators import (
        audio_pipeline as AP,
    )

    _, clips, _ = clips_table(spark, n_clips)
    times = []
    for _ in range(int(os.environ.get("BENCH_RUNS", "3"))):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        AP.curate_clips(clips).write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    return sorted(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    n_clips = int(os.environ.get("BENCH_CLIPS", "100000"))
    # O(n^2) small-data oracle twins: correctness-only, not benched by default
    ORACLE_TWINS = {"q26_ngram_jaccard", "q39_embedding_neardup"}
    sel = os.environ.get("BENCH_QUERIES")
    names = sel.split(",") if sel else [q for q in QUERIES if q not in ORACLE_TWINS]

    # no console progress bars: the driver parses the metric line from
    # stdout, and the \r-rewritten stage bars broke that parse in r5
    spark = get_spark(
        "rtad-bench", cores=cpus, shuffle_partitions=max(cpus, 8),
        extra={"spark.ui.showConsoleProgress": "false"},
    )
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

    load_start = os.getloadavg()[0]
    qtimes = bench_queries(spark, sf_dir, names)

    # Variance envelope (VERDICT r4 #5): single-run numbers on this shared
    # VM swing +/-15-30%, so the headline clips_validate and the most
    # expensive queries are re-run BENCH_RUNS times and reported as
    # median + min/max — round-over-round comparison becomes mechanical
    # instead of chasing phantom swings between single draws.
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    envelope: dict[str, dict] = {}
    nd_dir = neardup_corpus_dir() if any(n in NEARDUP_QUERIES for n in names) else None
    top5 = sorted(qtimes, key=qtimes.get, reverse=True)[:5]
    for name in top5:
        runs = [qtimes[name]]
        src = (nd_dir if name in NEARDUP_QUERIES
               else spans_corpus_dir() if name in SPANS_QUERIES
               else zipf_corpus_dir() if name in CONTAINMENT_QUERIES
               else sf_dir)
        fn = (BENCH_FN_OVERRIDES.get(name)
              or NEARDUP_BENCH_FNS.get(name, QUERIES[name]))
        for _ in range(n_runs - 1):
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            _force(fn(spark, src))
            runs.append(round(time.perf_counter() - t0, 3))
        runs.sort()
        qtimes[name] = runs[len(runs) // 2]
        envelope[name] = {"median": runs[len(runs) // 2], "min": runs[0],
                          "max": runs[-1], "runs": len(runs)}

    vtimes, vrows = bench_validation(spark, n_clips)
    vsec = vtimes[len(vtimes) // 2]
    qtimes["clips_validate"] = round(vsec, 3)
    envelope["clips_validate"] = {
        "median": round(vsec, 3), "min": round(vtimes[0], 3),
        "max": round(vtimes[-1], 3), "runs": len(vtimes),
    }

    atimes, n_audio_pairs = bench_audio_neardup(spark, n_clips)
    asec = atimes[len(atimes) // 2]
    qtimes["audio_neardup"] = round(asec, 3)
    envelope["audio_neardup"] = {
        "median": round(asec, 3), "min": round(atimes[0], 3),
        "max": round(atimes[-1], 3), "runs": len(atimes),
    }

    ctimes = bench_audio_curate(spark, n_clips)
    csec = ctimes[len(ctimes) // 2]
    qtimes["audio_curate"] = round(csec, 3)
    envelope["audio_curate"] = {
        "median": round(csec, 3), "min": round(ctimes[0], 3),
        "max": round(ctimes[-1], 3), "runs": len(ctimes),
    }

    total = round(sum(qtimes.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    q46x = q46_evidence(spark, sf_dir) if "q46_ann_ivf_trained" in names else None
    payload = (
            {
                "metric": "e2e_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "extra": {
                    "validated_clips_per_sec": round(vrows / vsec, 1),
                    "validated_clips_per_sec_envelope": [
                        round(vrows / vtimes[-1], 1), round(vrows / vtimes[0], 1)
                    ],
                    "n_clips": vrows,
                    "cpus": cpus,
                    "envelope": envelope,
                    "loadavg": [round(load_start, 2),
                                round(os.getloadavg()[0], 2)],
                    "neardup_corpus": (
                        os.environ.get("BENCH_NEARDUP_DIR")
                        or f"controlled-density {NEARDUP_DOCS} docs / "
                           f"{NEARDUP_VECS} vecs (~1% near-dup)"
                    ),
                    "neardup_config": "threshold-derived banding "
                                      "(q29/q34 @0.5, q42 @0.9); registry "
                                      "oracle geometry not benched",
                    "spans_corpus": (
                        os.environ.get("BENCH_SPANS_DIR")
                        or f"controlled window-dup corpus {SPANS_DOCS} docs "
                           "(~1-2% dup spans; sf dirs are degenerate for "
                           "k-token windows — [a-z]+ fragments their words)"
                    ),
                    "q50_inputs": "materialized cluster relations (r6: the "
                                  "cluster compute is the q47/q49 rows; "
                                  "pre-change q50 re-timed both stacks)",
                    "scaling_evidence_file": "BENCH/BASELINE.md",
                    "audio_neardup": {
                        "n_clips": vrows,
                        "n_pairs": n_audio_pairs,
                        "clips_per_sec": round(vrows / asec, 1),
                    },
                    "audio_curate": {
                        "n_clips": vrows,
                        "clips_per_sec": round(vrows / csec, 1),
                    },
                },
            }
    )
    if q46x is not None:
        payload["extra"]["q46_ann_ivf_trained"] = q46x
    line = json.dumps(payload)
    # the metric line is ALSO written to a dedicated file so round-over-round
    # comparison never depends on scraping a shared stdout (VERDICT r5 #2;
    # r5's driver parse failed on stage-progress \r noise)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "last_run.json")
    with open(out_path, "w") as f:
        f.write(line + "\n")
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
