"""Connected-components operator: star vs min-label equivalence, long-chain
convergence, non-convergence raising, and q48's dedup-applied-corpus
semantics. Ground truth via a driver-side union-find (test-only)."""

import os
import random
from collections import defaultdict

import pandas as pd
import pytest

from real_time_anomaly_detection_spark.operators.components import (
    ComponentsNotConverged,
    connected_components,
)


def _labels_of(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r.doc_id: r.label for r in connected_components(df, **kw).collect()}


def _union_find_truth(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(list)
    for n in parent:
        comp[find(n)].append(n)
    return {n: min(comp[find(n)]) for n in parent}


def test_star_converges_on_long_chain_within_log_rounds(spark):
    """A 121-node path (diameter 120) — min-label would need 120 rounds;
    star contraction must finish within 10 (O(log^2 n))."""
    chain = [(i, i + 1) for i in range(120)]
    got = _labels_of(spark, chain, algorithm="star", max_iters=10)
    assert got == {i: 0 for i in range(121)}


def test_min_label_raises_rather_than_returning_wrong_labels(spark):
    """The failure mode the star default exists for: a component whose
    diameter exceeds the iteration budget. Silent partial labels would be
    WRONG (non-minimal cluster ids); the operator must raise."""
    chain = [(i, i + 1) for i in range(40)]
    with pytest.raises(ComponentsNotConverged):
        _labels_of(spark, chain, algorithm="min_label", max_iters=5)


def test_star_equals_min_label_equals_union_find_on_random_graph(spark):
    rnd = random.Random(7)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    truth = _union_find_truth(edges)
    assert _labels_of(spark, edges, algorithm="star") == truth
    assert _labels_of(spark, edges, algorithm="min_label", max_iters=50) == truth


def test_star_on_cliques_and_isolated_edge(spark):
    edges = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(i, j) for i in range(50, 56) for j in range(i + 1, 56)]
        + [(100, 101)]
    )
    got = _labels_of(spark, edges, algorithm="star")
    assert got == _union_find_truth(edges)


def _write_chain_corpus(spark, tmp_path):
    """The q47 transitivity corpus: one 3-chain, one pair, one loner."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9".split()
    mk = " ".join
    docs = pd.DataFrame(
        [(0, mk(base + ["a0"])),
         (1, mk(base + ["a1"])),
         (2, mk(base[1:] + ["a1", "a2"])),
         (10, mk([f"x{j}" for j in range(10)] + ["b0"])),
         (11, mk([f"x{j}" for j in range(10)] + ["b1"])),
         (20, mk([f"z{j}" for j in range(12)]))],
        columns=["doc_id", "text"],
    )
    path = str(tmp_path / "docs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet"))
    return path


def test_q48_dedup_corpus_keeps_keepers_and_loners(spark, tmp_path):
    """q48 = documents minus non-keeper cluster members: the cluster {0,1,2}
    survives as doc 0, the pair {10,11} as doc 10, and the loner 20 (in no
    near-dup pair) survives untouched."""
    from real_time_anomaly_detection_spark.queries import QUERIES

    path = _write_chain_corpus(spark, tmp_path)
    got = sorted(
        r.doc_id for r in QUERIES["q48_dedup_corpus"](spark, path).collect()
    )
    assert got == [0, 10, 20]


def test_q48_matches_oracle_on_chain_corpus(spark, tmp_path):
    import duckdb

    from real_time_anomaly_detection_spark.queries import _Q48_SQL, QUERIES

    path = _write_chain_corpus(spark, tmp_path)
    got = sorted(
        r.doc_id for r in QUERIES["q48_dedup_corpus"](spark, path).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet('%s')"
        % os.path.join(path, "documents.parquet", "*.parquet")
    )
    want = sorted(int(x) for (x,) in con.execute(_Q48_SQL).fetchall())
    assert got == want
