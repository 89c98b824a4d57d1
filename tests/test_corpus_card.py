"""q71 corpus data-card goldens: planted strata with nulls and PII, split
counts vs q45, and the dual-engine check on the planted corpus."""

import os

import duckdb
import pytest

from real_time_anomaly_detection_spark.queries import (
    _Q71_SQL,
    q45_hash_split,
    q71_corpus_card,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    path = str(tmp_path_factory.mktemp("card"))
    rows = []
    for i in range(40):  # en/webcrawl: clean 5-token docs
        rows.append((i, "alpha bravo charlie delta echo", "en", "webcrawl"))
    for i in range(40, 50):  # en/forums: one PII class per doc
        rows.append((i, "write to bob@example.com for details", "en", "forums"))
    rows.append((50, None, "en", "forums"))  # null text
    rows.append((51, "server at 10.0.0.1 and phone 555-123-4567", "de", "books"))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).selectExpr("doc_id", "text", "lang", "source",
                 "CASE WHEN text IS NULL THEN 0 ELSE length(text) END AS n_chars")
    df.write.parquet(os.path.join(path, "documents.parquet"))
    return path


def test_planted_goldens(spark, corpus):
    out = {
        (r["lang"], r["source"]): r
        for r in (x.asDict() for x in q71_corpus_card(spark, corpus).collect())
    }
    wc = out[("en", "webcrawl")]
    assert wc["n_docs"] == 40 and wc["n_null_text"] == 0
    assert wc["total_tokens"] == 200 and wc["n_pii_docs"] == 0
    assert wc["mean_chars"] == 30.0
    assert round(wc["corpus_frac"], 6) == round(40 / 52, 6)
    fo = out[("en", "forums")]
    assert fo["n_docs"] == 11 and fo["n_null_text"] == 1
    assert fo["n_pii_docs"] == 10  # the null-text row is never PII
    bk = out[("de", "books")]
    assert bk["n_pii_docs"] == 1  # IPv4 + phone in one doc counts once
    # split shares must reconcile with q45's oracled totals
    q45 = {r["split"]: r["n_docs"] for r in q45_hash_split(spark, corpus).collect()}
    assert sum(v["n_train"] for v in out.values()) == q45.get("train", 0)
    assert sum(v["n_val"] for v in out.values()) == q45.get("val", 0)
    assert sum(v["n_test"] for v in out.values()) == q45.get("test", 0)
    for v in out.values():
        assert v["n_train"] + v["n_val"] + v["n_test"] == v["n_docs"]


def test_dual_engine_on_planted_corpus(spark, corpus):
    sp = (
        q71_corpus_card(spark, corpus)
        .toPandas()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{corpus}/documents.parquet/*.parquet'"
    )
    oc = (
        con.execute(_Q71_SQL)
        .fetchdf()
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    assert sp.equals(oc.astype(sp.dtypes.to_dict()))
