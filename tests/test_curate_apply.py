"""curate_corpus terminal op + CLI: one-pass gate/redact semantics, the
planted four-way drop accounting, schema preservation, Exchange-free plan,
and equivalence with the q53/q55/q56 query definitions on the real corpus."""

import os
import tempfile

from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.operators.curation import curate_corpus

SF = "/root/testdata/sf0.001"


def _planted(spark):
    diverse = "the and " + " ".join(f"word{i:02d}" for i in range(48))
    good = diverse + " contact bob@x.io at 10.0.0.1"
    rows = [
        (1, good, "en", "s", len(good)),                 # kept + redacted
        (2, "that have " * 30, "en", "s", 0),            # repetition only
        # diverse (passes repetition) but ZERO stop-set members -> heuristics
        (3, " ".join(f"cat{i:02d}" for i in range(48)), "en", "s", 0),
        (4, "spam spam " * 30, "en", "s", 0),            # both gates fail
        (5, None, "en", "s", 0),                         # null text
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )


def test_curate_planted_accounting_and_redaction(spark):
    curated, report = curate_corpus(_planted(spark))
    rows = curated.collect()
    assert [r.doc_id for r in rows] == [1]
    kept = rows[0]
    assert "<EMAIL>" in kept.text and "<IP>" in kept.text
    assert "bob@x.io" not in kept.text and "10.0.0.1" not in kept.text
    assert kept.n_chars == len(kept.text)  # recomputed from redacted text
    assert kept.lang == "en" and kept.source == "s"
    rep = report.collect()[0]
    assert rep.n_docs_with_text == 4 and rep.n_null_text == 1
    assert rep.n_dropped_repetition == 1   # doc 2
    assert rep.n_dropped_heuristics == 1   # doc 3
    assert rep.n_dropped_both == 1         # doc 4
    assert rep.n_kept == 1
    assert rep.n_docs_redacted == 1 and rep.total_pii == 2


def test_curate_plan_is_one_pass(spark):
    """The curated relation must be Exchange-free: gates and redaction are
    functions of each doc's own text, computed on the scan."""
    curated, _ = curate_corpus(_planted(spark))
    plan = curated._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_curate_matches_query_definitions(spark):
    """On the real sf0.001 corpus the apply op must agree with the oracled
    queries: kept ids = q55.keep ∩ (q53.keep ∪ not-in-q53) and the kept
    text equals q56's redacted text."""
    from real_time_anomaly_detection_spark.queries import (
        q53_repetition_signals, q55_quality_heuristics, q56_pii_redaction)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    curated, _ = curate_corpus(docs)
    got = {r.doc_id: r.text for r in curated.collect()}

    q53 = {r.doc_id: r.keep for r in q53_repetition_signals(spark, SF).collect()}
    q55 = {r.doc_id: r.keep for r in q55_quality_heuristics(spark, SF).collect()}
    q56 = {r.doc_id: r.redacted for r in q56_pii_redaction(spark, SF).collect()}
    expect = {i for i, k in q55.items() if k and q53.get(i, True)}
    assert set(got) == expect and expect  # non-degenerate on this corpus
    assert all(got[i] == q56[i] for i in got)


def test_curate_cli_flow(spark, tmp_path):
    from real_time_anomaly_detection_spark import cli

    root = str(tmp_path / "corpus")
    os.makedirs(root)
    _planted(spark).write.parquet(f"{root}/documents.parquet")
    out = str(tmp_path / "out")
    cli.main(["curate", "--input", root, "--out", out])
    curated = spark.read.parquet(os.path.join(out, "curated"))
    report = spark.read.parquet(os.path.join(out, "report"))
    assert curated.count() == 1 and report.collect()[0].n_kept == 1
    # knobs reach the library: lifting both repetition cuts admits doc 2
    # (its heuristics already pass)
    out2 = str(tmp_path / "out2")
    cli.main(["curate", "--input", root, "--out", out2,
              "--top2-max", "1.1", "--dup2-max", "1.1"])
    ids = {r.doc_id for r in
           spark.read.parquet(os.path.join(out2, "curated")).collect()}
    assert ids == {1, 2}


def test_curate_with_tempdir_rejects_missing_columns(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "a long, b string")
    with pytest.raises(ValueError, match="doc_id and text"):
        curate_corpus(df)
