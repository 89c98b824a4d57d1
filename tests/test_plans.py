"""Physical-plan assertions: the scale-critical properties (SURVEY.md §4).

X1 predicate pushdown, X2 column pruning (never scan `bytes` for stats-only
checks), X7 broadcast join selection — checked on the executed plan string so
regressions that silently de-optimize get caught by pytest, not by a 100 TB
bill.
"""

import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark import synth
from real_time_anomaly_detection_spark.operators import referential, stats, uniqueness
from real_time_anomaly_detection_spark.queries import (
    q02_window_scan,
    q06_brand_revenue,
    q22_haversine_pairs,
)

SF = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df) -> str:
    return df._jdf.queryExecution().toString()


@pytest.fixture(scope="module")
def clips_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("clips") / "clips")
    cfg = synth.clean_config(n_clips=400, clips_per_partition=100)
    synth.clips_df(spark, cfg).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def test_stats_profile_never_scans_bytes(spark, clips_parquet):
    prof = stats.profile(clips_parquet)
    rs = [line for line in full_plan(prof).splitlines() if "ReadSchema" in line]
    assert rs, "expected a parquet scan with ReadSchema"
    assert all("bytes" not in line for line in rs), f"bytes column not pruned: {rs}"


def test_uniqueness_never_scans_bytes(spark, clips_parquet):
    v = uniqueness.uniqueness_verdicts(clips_parquet)
    rs = [line for line in full_plan(v).splitlines() if "ReadSchema" in line]
    assert rs and all("bytes" not in line for line in rs)


def test_window_scan_pushes_filters(spark):
    df = q02_window_scan(spark, SF)
    p = full_plan(df)
    assert "PushedFilters: [" in p
    assert "IsNotNull" in p or "GreaterThan" in p


def test_brand_revenue_broadcasts_dim(spark):
    df = q06_brand_revenue(spark, SF)
    assert "BroadcastHashJoin" in plan_str(df)


def test_referential_broadcast_vs_shuffle(spark, clips_parquet):
    refs = clips_parquet.select("clip_id", "transcript")
    bcast = referential.missing_refs(clips_parquet, refs, broadcast=True)
    assert "BroadcastHashJoin" in plan_str(bcast) and "LeftAnti" in plan_str(bcast)
    shuffled = referential.missing_refs(clips_parquet, refs, broadcast=False)
    # without the hint Catalyst may still pick broadcast on tiny inputs; assert
    # only that the anti-join semantics survive
    assert "LeftAnti" in plan_str(shuffled)


def test_spatial_join_is_equi_prefiltered(spark):
    # the grid prefilter must produce an equi-join (hash/sort-merge/broadcast),
    # NOT a nested-loop over all pairs
    df = q22_haversine_pairs(spark, SF)
    p = plan_str(df)
    assert "BroadcastNestedLoopJoin" not in p.replace("BroadcastNestedLoopJoin", "", 0)
    assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p)


def test_stats_is_partial_final_hash_agg(spark, clips_parquet):
    # percentile_approx sketches force ObjectHashAggregate (correct: t-digest
    # style state has no codegen); what matters is a two-phase (partial ->
    # exchange -> final) aggregation so map-side combine happens before the
    # shuffle on part_id.
    p = plan_str(stats.profile(clips_parquet))
    assert p.count("ObjectHashAggregate") + p.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(part_id" in p
    # exact-mode profile (tests/oracles) drops to plain codegen'd hash agg path
    p_exact = plan_str(stats.profile(clips_parquet, approx=False))
    assert "Exchange hashpartitioning(part_id" in p_exact


def test_pcm_check_bytes_never_crosses_exchange(spark, clips_parquet):
    """The 100TB-critical invariant: the binary payload flows parquet scan ->
    mapInPandas and dies there — no Exchange (shuffle), no BroadcastExchange
    may appear BELOW the Arrow eval. A refs join before the UDF (the round-1
    shape) would shuffle the multi-TB bytes column if AQE picks sort-merge."""
    from real_time_anomaly_detection_spark.operators import audio_checks

    checked = audio_checks.pcm_check(clips_parquet, lambda cid: None)
    p = plan_str(checked)
    assert "Exchange" not in p, f"pcm path must be shuffle-free:\n{p}"
    assert "ArrowEvalPython" in p or "MapInPandas" in p or "PythonMapInArrow" in p or "EvalPython" in p, p


def test_transcript_check_never_scans_bytes(spark, clips_parquet):
    from real_time_anomaly_detection_spark.operators import audio_checks

    refs = clips_parquet.select("clip_id", "transcript")
    tr = audio_checks.transcript_check(clips_parquet, refs)
    rs = [line for line in full_plan(tr).splitlines() if "ReadSchema" in line]
    assert rs and all("bytes" not in line for line in rs)


def test_minhash_lsh_single_bands_shuffle(spark):
    """q29 cleanup pin: the exploded (doc_id, band, bucket) table self-joins
    ONCE on (band, bucket) — not the round-1 shape of 4 sequential band joins
    unioned (4x the shuffles of the bands table)."""
    from real_time_anomaly_detection_spark.queries import q29_minhash_lsh

    df = q29_minhash_lsh(spark, SF)
    p = plan_str(df)
    n_joins = (
        p.count("SortMergeJoin") + p.count("ShuffledHashJoin") + p.count("BroadcastHashJoin")
    )
    assert n_joins == 1, f"expected exactly one self-join, got {n_joins}:\n{p}"
    assert "Union" not in p


def test_topk_uses_take_ordered(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = ev.orderBy(F.desc("ts")).limit(5)
    assert "TakeOrderedAndProject" in plan_str(df)


def test_embedding_lsh_never_cartesian(spark):
    """q42/q37 pin: the embedding near-dup and multi-probe ANN plans are
    bucketed equi-joins — no CartesianProduct / BroadcastNestedLoopJoin
    anywhere (the all-pairs shape lives only in the q27/q39 oracle twins)."""
    from real_time_anomaly_detection_spark.queries import (
        q37_ann_lsh_topk,
        q42_embedding_neardup_lsh,
    )

    for q in (q42_embedding_neardup_lsh, q37_ann_lsh_topk):
        p = plan_str(q(spark, SF))
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p


def test_winnowing_one_fingerprint_shuffle_no_join(spark):
    """q43 pin (r6 shape): NO join operator anywhere — pair generation is
    the streaming run-walker over ONE hash repartition + intra-partition
    sort of the fingerprint relation (the r5 df-cap agg + broadcast
    anti-join + fp self-join made three passes over it). Exactly three
    Exchanges: the round-robin input spread, the fp co-location, and the
    final pair-count agg."""
    from real_time_anomaly_detection_spark.queries import q43_winnowing_neardup

    p = plan_str(q43_winnowing_neardup(spark, SF))
    assert "Join" not in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("Exchange") == 3, p
    assert "Sort" in p, p


def test_content_dedup_digest_before_exchange(spark, clips_parquet):
    """content_dedup's only contact with `bytes` is a map-side sha2 digest
    fused below the first Exchange — the payload never shuffles. Checked by
    walking the executed plan tree: no Exchange node may have `bytes` in any
    attribute of its child output."""
    from real_time_anomaly_detection_spark.operators import content_dedup

    # AQE wraps everything in AdaptiveSparkPlanExec with no materialized
    # children before execution — disable it for this plan inspection so the
    # Exchange nodes are walkable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        v = content_dedup.content_dedup_verdicts(clips_parquet)
        node = v._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    def walk(n, out):
        name = n.nodeName()
        if "Exchange" in name:
            cols = n.child().output().mkString(",")
            out.append((name, cols))
        for i in range(n.children().size()):
            walk(n.children().apply(i), out)

    exchanges = []
    walk(node, exchanges)
    assert exchanges, "expected at least one shuffle"
    for name, cols in exchanges:
        assert "bytes" not in cols, f"{name} shuffles the payload: {cols}"


def test_dedup_corpus_broadcasts_nonkeepers_anti(spark):
    """q48's survivor filter in the SMALL-drop-set regime must be a
    broadcast LeftAnti probe over the documents scan — the corpus is never
    shuffled. The bench corpora (~1% near-dup) sit in this regime, so the
    default auto gate must resolve to broadcast here."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    p = plan_str(QUERIES["q48_dedup_corpus"](spark, SF))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_dedup_corpus_shuffles_above_broadcast_gate(spark):
    """q48's survivor filter in the LARGE-drop-set regime (real LLM dedup:
    30-80% of the corpus is non-keeper — billions of ids) must NOT broadcast:
    the auto gate, forced low, has to fall back to a shuffled sort-merge
    LeftAnti, which bounds memory at any dup rate. Regression guard for the
    r5 unconditional-broadcast OOM."""
    from real_time_anomaly_detection_spark.queries import q48_dedup_corpus

    def smj_anti(p):
        # the anti-join itself must be the sort-merge node (q47's internal
        # LSH-cap broadcasts legitimately remain elsewhere in the plan)
        return any(
            "SortMergeJoin" in line and "LeftAnti" in line
            for line in p.splitlines()
        )

    p = plan_str(q48_dedup_corpus(spark, SF, broadcast_max_rows=0))
    assert smj_anti(p), p
    # the explicit knob must force the same plan without any count
    p2 = plan_str(q48_dedup_corpus(spark, SF, broadcast=False))
    assert smj_anti(p2), p2


def test_drop_non_keepers_regimes_agree(spark):
    """Both join regimes must return identical survivors (strategy is a
    physical choice, never a semantic one)."""
    from real_time_anomaly_detection_spark.operators.components import (
        drop_non_keepers,
    )

    docs = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    drop = spark.range(0, 100, 3).withColumnRenamed("id", "doc_id")
    kept_b = sorted(r.doc_id for r in drop_non_keepers(docs, drop, broadcast=True).collect())
    kept_s = sorted(r.doc_id for r in drop_non_keepers(docs, drop, broadcast=False).collect())
    kept_auto = sorted(
        r.doc_id
        for r in drop_non_keepers(docs, drop, broadcast_max_rows=0).collect()
    )
    assert kept_b == kept_s == kept_auto
    assert len(kept_b) == 66 and 0 not in kept_b and 1 in kept_b


def test_decontamination_broadcasts_benchmark_grams(spark):
    """q51's contamination probe must broadcast the (small-by-definition)
    benchmark gram set and never shuffle the corpus-side grams into a
    sort-merge join — the corpus side is 100 TB, the benchmark is not."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    p = plan_str(QUERIES["q51_decontamination"](spark, SF))
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p


def test_stratified_sample_is_one_scan_one_agg(spark):
    """q52 is a map-side predicate + one hash aggregate: exactly one
    exchange (the per-lang agg), no join, no window."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    p = plan_str(QUERIES["q52_stratified_sample"](spark, SF))
    assert "Join" not in p and "Window" not in p, p
    assert p.count("Exchange") == 1, p


def test_repetition_signals_shuffle_free(spark):
    """q53's signals depend only on each doc's own tokens, so the whole
    computation is one scan-local Arrow pass: no KEYED Exchange, no Join —
    the naive explode+groupBy(doc, gram) would shuffle the full token
    stream. r7: `_spread` may round-robin the few-row-group local scan so
    the Arrow pass sees >= cores tasks (a no-op at scale, where the scan's
    own splits drive parallelism); the pin therefore forbids
    hash-partitioned Exchanges specifically — the shape that WOULD mean a
    corpus-scale token shuffle — rather than any Exchange."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    p = plan_str(QUERIES["q53_repetition_signals"](spark, SF))
    assert "hashpartitioning" not in p, f"q53 must not key-shuffle:\n{p}"
    assert "rangepartitioning" not in p, p
    assert "Join" not in p, p


def test_sequence_packing_one_shard_shuffle_no_text(spark):
    """q54 shuffles exactly once, keyed on shard, and only (shard, doc_id,
    ntok) metadata rides it — document text dies at the scan."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    df = QUERIES["q54_sequence_packing"](spark, SF)
    p = plan_str(df)
    assert p.count("Exchange") == 1, p
    assert "hashpartitioning(shard" in p, p
    assert "Join" not in p, p
    # the exchanged row is metadata: the ntok Project consumes text BELOW
    # the Exchange; nothing above the Exchange may reference it
    above_exchange = p.split("Exchange")[0]
    assert "text#" not in above_exchange, above_exchange


def test_q69_text_dies_at_the_scan(spark):
    """q69's corpus contact is the scan-local hashed-token projection; no
    Exchange may carry `text` (only hashed long arrays / id-metadata rows
    shuffle). Same walk as the content-dedup payload pin."""
    from real_time_anomaly_detection_spark.queries import q69_containment_join

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = q69_containment_join(spark, SF)
        node = df._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    def walk(n, out):
        if "Exchange" in n.nodeName():
            out.append((n.nodeName(), n.child().output().mkString(",")))
        for i in range(n.children().size()):
            walk(n.children().apply(i), out)

    exchanges = []
    walk(node, exchanges)
    assert exchanges, "expected shuffles"
    for name, cols in exchanges:
        assert "text" not in cols, f"{name} shuffles text: {cols}"


def test_q68_exchange_count(spark):
    """q68 = ONE cell-keyed Exchange for the per-cell dominance test — the
    pair relation never shuffles (it never exists). r7: the assignment
    pass's round-robin spread is CONDITIONAL (`partitioning.spread` no-ops
    on tiny or already-parallel inputs), so the pin allows 1 or 2
    exchanges but requires exactly one hash(cell) partitioning and no
    other keyed exchange."""
    from real_time_anomaly_detection_spark.queries import q68_semdedup

    df = q68_semdedup(spark, SF)
    p = plan_str(df)
    assert 1 <= p.count("Exchange") <= 2, p
    assert p.count("hashpartitioning(cell") == 1, p
