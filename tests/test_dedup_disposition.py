"""q73 disposition goldens: one planted doc per verdict class (exact dup,
near dup, contained, keep, null-text group), priority ordering, and the
dual-engine check on the planted corpus."""

import os

import duckdb
import pytest

from real_time_anomaly_detection_spark.queries import (
    _MH_BANDS,
    _Q73_SQL,
    q73_dedup_disposition,
)


def _w(i: int) -> str:
    return f"w{chr(97 + i // 26)}{chr(97 + i % 26)}"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    """Planted classes (token groups disjoint across classes):
    - 1 = 40 tokens; 2 = 10 of them (C=1.0, J=0.25 < 0.5: contained ONLY)
    - 101/102 identical text (exact dups; also a J=1 near-dup cluster)
    - 201 = 20 tokens; 202 = 19 of them + 1 new (J=0.905: near dups;
      202 is also contained at 0.95 — priority must say near_dup)
    - 500 disjoint (keep)
    - 900/901 null text (one exact group; no bands, no containment)"""
    path = str(tmp_path_factory.mktemp("disposition"))
    a = " ".join(_w(i) for i in range(40))
    rows = [
        (1, a),
        (2, " ".join(_w(i) for i in range(10))),
        (101, " ".join(_w(100 + i) for i in range(15))),
        (102, " ".join(_w(100 + i) for i in range(15))),
        (201, " ".join(_w(200 + i) for i in range(20))),
        (202, " ".join(_w(200 + i) for i in range(19)) + " " + _w(300)),
        (500, " ".join(_w(400 + i) for i in range(12))),
        (900, None),
        (901, None),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def _rows(spark, corpus):
    return {
        int(r["doc_id"]): r.asDict()
        for r in q73_dedup_disposition(
            spark, corpus, n_bands=_MH_BANDS, rows_per_band=2
        ).collect()
    }


def test_planted_classes(spark, corpus):
    got = _rows(spark, corpus)
    # pure containment: low Jaccard, full overlap
    assert got[2]["status"] == "contained" and got[2]["contained_in"] == 1
    assert not got[2]["keep"] and not got[2]["exact_dup"]
    assert got[1]["status"] == "keep" and got[1]["keep"]
    # exact pair: keeper survives (it is also its J=1 cluster's keeper)
    assert got[101]["status"] == "keep" and got[101]["exact_keeper"]
    assert got[102]["status"] == "exact_dup" and not got[102]["keep"]
    # near pair: priority says near_dup even though 202 is also contained
    assert got[202]["status"] == "near_dup" and not got[202]["keep"]
    assert got[201]["status"] == "keep" and got[201]["near_keeper"]
    # untouched doc
    assert got[500]["status"] == "keep" and got[500]["near_cluster"] == -1
    assert got[500]["contained_in"] == -1 and not got[500]["exact_dup"]
    # null-text docs form one exact group (q25 GROUP BY semantics)
    assert got[900]["status"] == "keep" and got[900]["exact_keeper"]
    assert got[901]["status"] == "exact_dup"
    # keep bit always equals (status == keep)
    assert all((r["status"] == "keep") == r["keep"] for r in got.values())


def test_dual_engine_on_planted_corpus(spark, corpus):
    sp = (
        q73_dedup_disposition(spark, corpus, n_bands=_MH_BANDS, rows_per_band=2)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{corpus}/documents.parquet/*.parquet'"
    )
    oc = (
        con.execute(_Q73_SQL)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sp.equals(oc.astype(sp.dtypes.to_dict()))


def test_materialized_inputs_equal_recompute(spark, corpus):
    from real_time_anomaly_detection_spark.queries import (
        q47_neardup_clusters,
        q72_containment_canonical,
    )

    direct = (
        q73_dedup_disposition(spark, corpus, n_bands=_MH_BANDS, rows_per_band=2)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    via = (
        q73_dedup_disposition(
            spark,
            corpus,
            clusters=q47_neardup_clusters(
                spark, corpus, n_bands=_MH_BANDS, rows_per_band=2
            ),
            canon=q72_containment_canonical(spark, corpus),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert direct.equals(via)
