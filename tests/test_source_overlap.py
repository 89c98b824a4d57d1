"""q70 source-overlap goldens: exact identity/disjoint cases, estimator
accuracy at 64 lanes vs planted exact Jaccard, null exclusion, and the
generated-SQL dual-engine path at a non-default lane count."""

import os

import duckdb
import pandas as pd
import pytest

from real_time_anomaly_detection_spark.queries import (
    _q70_sql,
    q70_source_overlap,
)


def _word(i: int) -> str:
    return f"t{chr(97 + i // 676)}{chr(97 + (i // 26) % 26)}{chr(97 + i % 26)}"


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, spark):
    """Four sources with engineered token-set overlaps:
    - mirror_a / mirror_b: identical 300-token sets (J = 1)
    - half: tokens 0..149 of mirror_a's 0..299 (J = 150/300 = 0.5)
    - other: 300 disjoint tokens (J = 0 vs all)
    Tokens are spread across docs (sets are per-SOURCE unions)."""
    path = str(tmp_path_factory.mktemp("overlap"))
    rows = []
    did = 0

    def add(source, lo, hi):
        nonlocal did
        words = [_word(i) for i in range(lo, hi)]
        for s in range(0, len(words), 30):  # 10 docs per source
            rows.append((did, " ".join(words[s : s + 30]), source))
            did += 1

    add("mirror_a", 0, 300)
    add("mirror_b", 0, 300)
    add("half", 0, 150)
    add("other", 1000, 1300)
    rows.append((did, None, "mirror_a"))  # null text: contributes nothing
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(os.path.join(path, "documents.parquet"))
    return path


def _pairs(pdf: pd.DataFrame) -> dict:
    return {
        (r.source_a, r.source_b): float(r.est_jaccard) for r in pdf.itertuples()
    }


def test_identity_disjoint_and_accuracy(spark, corpus):
    got = _pairs(q70_source_overlap(spark, corpus, n_hashes=64).toPandas())
    # identical unions -> every lane minimum agrees
    assert got[("mirror_a", "mirror_b")] == 1.0
    # disjoint unions: P(lane match) = 0 up to hash collisions
    assert got[("mirror_a", "other")] == 0.0
    assert got[("half", "other")] == 0.0
    # J = 0.5 planted: 64-lane estimate within 4 sigma (sigma ~ 0.0625)
    assert abs(got[("half", "mirror_a")] - 0.5) <= 0.25
    assert got[("half", "mirror_a")] == got[("half", "mirror_b")]


def test_dual_engine_generated_sql(spark, corpus):
    """The lane count is a knob; the generated oracle must track it (the
    registry pins 8, this pins the _mh_constants extension path at 64)."""
    sp = (
        q70_source_overlap(spark, corpus, n_hashes=64)
        .toPandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{corpus}/documents.parquet/*.parquet'"
    )
    oc = (
        con.execute(_q70_sql(64))
        .fetchdf()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    assert sp.equals(oc.astype(sp.dtypes.to_dict()))


def test_deterministic(spark, corpus):
    a = q70_source_overlap(spark, corpus).toPandas().sort_values(
        ["source_a", "source_b"]
    ).reset_index(drop=True)
    b = q70_source_overlap(spark, corpus).toPandas().sort_values(
        ["source_a", "source_b"]
    ).reset_index(drop=True)
    assert a.equals(b)
