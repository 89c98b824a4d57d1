"""q69 containment-join goldens: the asymmetric excerpt case symmetric
Jaccard misses, distinct-set semantics, threshold edge, null/token-free
exclusion, and a dual-engine check on the planted corpus."""

import os

import duckdb
import pandas as pd
import pytest

from real_time_anomaly_detection_spark.queries import (
    _Q69_SQL,
    q69_containment_join,
)


def _w(i: int) -> str:
    return f"w{chr(97 + i // 26)}{chr(97 + i % 26)}"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("containment"))
    big = " ".join(_w(i) for i in range(40))          # 40 distinct tokens
    inner = " ".join(_w(i) for i in range(8))          # subset of big
    disjoint = " ".join(_w(100 + i) for i in range(10))
    # same token SET as `inner`, every word tripled (distinct-set semantics)
    tripled = " ".join(w for w in inner.split() for _ in range(3))
    rows = [
        (1, big),
        (2, inner),
        (3, disjoint),
        (4, tripled),
        (5, None),          # null text: excluded
        (6, "1234 5678"),   # no [a-z]+ tokens: excluded
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def _pairs(pdf: pd.DataFrame) -> dict:
    return {
        (int(r.doc_inner), int(r.doc_outer)): float(r.containment)
        for r in pdf.itertuples()
    }


def test_planted_goldens(spark, corpus):
    got = _pairs(q69_containment_join(spark, corpus).toPandas())
    # the asymmetric case: inner fully contained in big -> found at 0.9,
    # even though symmetric Jaccard is only 8/40 = 0.2 (q34-family blind
    # spot); the reverse direction (big in inner, 0.2) must NOT appear
    assert got[(2, 1)] == 1.0 and (1, 2) not in got
    # distinct-set semantics: tripled words == same token set
    assert got[(4, 1)] == 1.0 and got[(2, 4)] == 1.0 and got[(4, 2)] == 1.0
    # disjoint, null-text and token-free docs appear in no pair
    docs = {d for pair in got for d in pair}
    assert docs.isdisjoint({3, 5, 6})
    assert set(got) == {(2, 1), (4, 1), (2, 4), (4, 2)}


def test_threshold_knob(spark, corpus):
    """At t=0.19 the reverse (big-in-inner, 8/40=0.2) direction appears."""
    got = _pairs(q69_containment_join(spark, corpus, threshold=0.19).toPandas())
    assert got[(1, 2)] == 0.2 and got[(1, 4)] == 0.2


def test_dual_engine_on_planted_corpus(spark, corpus):
    sp = (
        q69_containment_join(spark, corpus)
        .toPandas()
        .sort_values(["doc_inner", "doc_outer"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{corpus}/documents.parquet/*.parquet'"  # Spark writes a part-file dir
    )
    oc = (
        con.execute(_Q69_SQL)
        .fetchdf()
        .sort_values(["doc_inner", "doc_outer"])
        .reset_index(drop=True)
    )
    assert sp.equals(oc.astype(sp.dtypes.to_dict()))


@pytest.fixture(scope="module")
def chain_corpus(tmp_path_factory, spark):
    """Nested excerpts: C (8 tokens) ⊂ B (20) ⊂ A (40); D = exact token-set
    twin of C; E disjoint."""
    path = str(tmp_path_factory.mktemp("chain"))
    a = " ".join(_w(i) for i in range(40))
    b = " ".join(_w(i) for i in range(20))
    c = " ".join(_w(i) for i in range(8))
    d = " ".join(reversed(c.split()))  # same set, different order
    rows = [(1, a), (2, b), (3, c), (4, d),
            (5, " ".join(_w(500 + i) for i in range(10)))]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def test_canonical_collapses_chains(spark, chain_corpus):
    from real_time_anomaly_detection_spark.queries import (
        q72_containment_canonical,
    )

    got = {
        int(r.doc_id): int(r.canonical)
        for r in q72_containment_canonical(spark, chain_corpus).collect()
    }
    # the chain collapses to the TOP, not the middleman
    assert got[3] == 1 and got[2] == 1
    # the identical twin maps to the smaller id's chain top
    assert got[4] == 1
    # the top itself and the disjoint doc are contained in nothing
    assert 1 not in got and 5 not in got


def test_canonical_dual_engine(spark, chain_corpus):
    from real_time_anomaly_detection_spark.queries import (
        _Q72_SQL,
        q72_containment_canonical,
    )

    sp = (
        q72_containment_canonical(spark, chain_corpus)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{chain_corpus}/documents.parquet/*.parquet'"
    )
    oc = (
        con.execute(_Q72_SQL)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sp.equals(oc.astype(sp.dtypes.to_dict()))
