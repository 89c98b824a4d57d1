"""Semantics of the data-mixing / exact-substring-dedup operators: q63
(token-budget mixture sampling) and q64 (duplicate-span statistics,
Lee et al. 2022 detection half)."""

import hashlib
import math
import tempfile

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _write_docs(spark, rows, d):
    spark.createDataFrame(rows, _DOCS_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )


def _greedy_reference(rows, shares):
    """Pure-python q63 reference: per-lang greedy prefix in md5 order."""
    pdf = pd.DataFrame(
        [r for r in rows if r[2] in shares and r[4] is not None],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf["hkey"] = [
        hashlib.md5(f"q63:{i}".encode()).hexdigest() for i in pdf["doc_id"]
    ]
    totals = pdf.groupby("lang")["n_chars"].sum().to_dict()
    # absent strata don't constrain the budget (oracle totals-join semantics)
    scale = min(totals[lg] / shares[lg] for lg in totals if lg in shares)
    keep = set()
    for lg, s in shares.items():
        budget = math.floor(s * scale)
        run = 0
        sub = pdf[pdf["lang"] == lg].sort_values(["hkey", "doc_id"])
        for _, r in sub.iterrows():
            if run + r["n_chars"] > budget:
                break
            run += r["n_chars"]
            keep.add(int(r["doc_id"]))
    return keep


def test_q63_golden_greedy_prefix(spark):
    """Hand-checkable mixture: budgets are floor(share*scale) with
    scale=min(total/share); selection is the greedy md5-order prefix;
    out-of-mixture langs and null n_chars drop; the binding stratum
    keeps ALL its docs (its budget equals its total)."""
    from real_time_anomaly_detection_spark.queries import q63_token_budget_mix

    shares = {"en": 0.75, "fr": 0.25}
    rows = [
        (1, "t", "en", "s", 100), (2, "t", "en", "s", 200),
        (3, "t", "en", "s", 300), (4, "t", "en", "s", 400),
        (5, "t", "fr", "s", 100), (6, "t", "fr", "s", 100),
        (7, "t", "de", "s", 999),   # outside the mixture -> dropped
        (8, "t", "en", "s", None),  # null unit count -> dropped
    ]
    # totals: en 1000, fr 200; scale = min(1000/.75, 200/.25) = 800
    # budgets: en 600, fr 200 (fr is binding: keeps everything)
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = q63_token_budget_mix(spark, d, shares=shares).collect()
    got = {r.doc_id for r in out}
    assert {5, 6} <= got                      # binding stratum complete
    assert got == _greedy_reference(rows, shares)
    en_kept = sum(r.n_chars for r in out if r.lang == "en")
    assert en_kept <= 600
    assert not {7, 8} & got


def test_q63_absent_stratum_does_not_zero_the_budget(spark):
    """A mixture lang with NO data must not collapse scale to 0 (the
    all-empty cut): absent strata are excluded from min(total/share) —
    the oracle's totals-join semantics — and surface as a missing lang
    in the output."""
    from real_time_anomaly_detection_spark.queries import q63_token_budget_mix

    shares = {"en": 0.5, "zh": 0.5}  # zh absent from the corpus
    rows = [
        (1, "t", "en", "s", 100), (2, "t", "en", "s", 200),
        (3, "t", "fr", "s", 999),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = q63_token_budget_mix(spark, d, shares=shares).collect()
    # scale = 300/0.5 = 600; en budget floor(0.5*600)=300 -> both docs
    assert {r.doc_id for r in out} == {1, 2}
    assert {r.lang for r in out} == {"en"}


def test_q63_matches_reference_on_corpus(spark):
    """Row-for-row agreement with the pure-python greedy reference on the
    real sf0.001 corpus (all five default-mixture langs, real skew) —
    subsumes budget adherence AND greedy maximality."""
    from real_time_anomaly_detection_spark.queries import (
        _Q63_SHARES,
        q63_token_budget_mix,
    )

    rows = [
        (r.doc_id, None, r.lang, None, r.n_chars)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "n_chars").collect()
    ]
    got = {r.doc_id for r in q63_token_budget_mix(spark, SF).collect()}
    assert got == _greedy_reference(rows, _Q63_SHARES)


def test_q63_window_only_on_boundary_buckets(spark):
    """The scale contract: the per-lang cumulative-sum Window must run
    over ONLY the boundary buckets (<= one bucket per lang), never the
    full corpus — the Window's input subtree must carry a `_bkt =`
    equality filter, and whole-bucket keeps must flow around the Window
    through a plain Filter/Union."""
    from real_time_anomaly_detection_spark.queries import q63_token_budget_mix

    plan = (
        q63_token_budget_mix(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1, plan
    # the window feeds from a filter pinning specific boundary buckets
    w_tail = plan[plan.index("Window"):]
    assert "_bkt" in w_tail and "Union" in plan, plan


def test_q64_planted_duplicate_spans(spark):
    """Planted 8-token phrase shared by two docs: exact n_spans /
    n_dup_spans / coverage fraction; <k-token docs report zero spans;
    null text emits no row; an INTRA-doc repeat counts as duplicated
    (window hash seen more than once anywhere, the paper's semantics)."""
    from real_time_anomaly_detection_spark.queries import q64_dup_span_stats

    phrase = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, phrase + " one two three", "en", "s", 0),   # 11 tokens
        (2, "x y " + phrase, "en", "s", 0),             # 10 tokens
        (3, "too short", "en", "s", 0),                 # 2 tokens
        (4, None, "en", "s", 0),
        (5, phrase + " " + phrase, "en", "s", 0),       # intra-doc repeat
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = {r.doc_id: r for r in q64_dup_span_stats(spark, d).collect()}

    assert set(out) == {1, 2, 3, 5}
    # doc1: spans 4 (11-8+1); only the window at pos 1 (the phrase) is
    # shared with doc2/doc5 -> 1 dup span covering tokens 1..8 of 11
    assert (out[1].n_spans, out[1].n_dup_spans) == (4, 1)
    assert out[1].dup_token_frac == round(8 / 11, 6)
    # doc2: 3 spans, the phrase sits at pos 3 -> tokens 3..10 of 10
    assert (out[2].n_spans, out[2].n_dup_spans) == (3, 1)
    assert out[2].dup_token_frac == round(8 / 10, 6)
    # doc3: under k tokens -> zero spans, zero coverage
    assert (out[3].n_spans, out[3].n_dup_spans, out[3].dup_token_frac) == (0, 0, 0.0)
    # doc5 "p p": 9 windows; window 1 == window 9 (intra-doc repeat, also
    # matches docs 1/2); windows 2..8 straddle the seam and are unique
    assert (out[5].n_spans, out[5].n_dup_spans) == (9, 2)
    assert out[5].dup_token_frac == round(16 / 16, 6)


def test_q64_k_parameter(spark):
    """k is honored: with k=2 a repeated bigram is detected that k=8
    cannot see."""
    from real_time_anomaly_detection_spark.queries import q64_dup_span_stats

    rows = [
        (1, "red fox jumps", "en", "s", 0),
        (2, "lazy red fox sleeps", "en", "s", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        k2 = {r.doc_id: r for r in q64_dup_span_stats(spark, d, k=2).collect()}
        k8 = {r.doc_id: r for r in q64_dup_span_stats(spark, d).collect()}
    assert k2[1].n_dup_spans == 1 and k2[2].n_dup_spans == 1  # "red fox"
    assert k2[1].dup_token_frac == round(2 / 3, 6)
    assert k8[1].n_dup_spans == 0 and k8[1].n_spans == 0  # 3 tokens < 8


def test_q65_planted_removal_golden(spark):
    """Removal cuts exactly the covered tokens of the q64 planted corpus:
    partial cut keeps the tail/head remainder, <k-token docs pass
    through untouched, a doc made ENTIRELY of duplicated windows
    survives as an empty string with full accounting."""
    from real_time_anomaly_detection_spark.queries import q65_dup_span_removal

    phrase = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, phrase + " one two three", "en", "s", 0),
        (2, "x y " + phrase, "en", "s", 0),
        (3, "too short", "en", "s", 0),
        (4, None, "en", "s", 0),
        (5, phrase + " " + phrase, "en", "s", 0),
        (6, "123 !!!", "en", "s", 0),  # token-free -> empty passthrough
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = {r.doc_id: r for r in q65_dup_span_removal(spark, d).collect()}

    assert set(out) == {1, 2, 3, 5, 6}
    assert (out[1].text_clean, out[1].n_kept, out[1].n_removed) == (
        "one two three", 3, 8)
    assert (out[2].text_clean, out[2].n_kept, out[2].n_removed) == ("x y", 2, 8)
    assert (out[3].text_clean, out[3].n_kept, out[3].n_removed) == (
        "too short", 2, 0)
    # doc5: dup windows at pos 1 and 9 cover tokens 1..8 and 9..16 — gone
    assert (out[5].text_clean, out[5].n_kept, out[5].n_removed) == ("", 0, 16)
    assert (out[6].text_clean, out[6].n_kept, out[6].n_removed) == ("", 0, 0)


def test_q65_accounting_consistent_with_q64(spark):
    """On the real corpus: per doc, kept+removed == q64's n_tokens, and
    tokens are removed exactly when q64 reports duplicated spans."""
    from real_time_anomaly_detection_spark.queries import (
        q64_dup_span_stats,
        q65_dup_span_removal,
    )

    stats = {r.doc_id: r for r in q64_dup_span_stats(spark, SF).collect()}
    removed = {r.doc_id: r for r in q65_dup_span_removal(spark, SF).collect()}
    assert set(stats) == set(removed)
    assert any(r.n_removed > 0 for r in removed.values())  # non-trivial corpus
    for did, r in removed.items():
        s = stats[did]
        assert r.n_kept + r.n_removed == s.n_tokens
        assert (r.n_removed > 0) == (s.n_dup_spans > 0)


def test_q66_matches_reference_labeling(spark):
    """Row-for-row agreement with a pure-pandas reference on the real
    corpus: per language, docs sorted by (bits_per_token, doc_id) and
    labeled head/middle/tail by inclusive token cumsum against
    floor(T/3) / floor(2T/3) — built from the q59 output (its own value
    oracle pins the scores), so this pins exactly the bucketing logic."""
    from real_time_anomaly_detection_spark.queries import (
        q59_unigram_logprob,
        q66_perplexity_buckets,
    )

    lang = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang").collect()
    }
    scored = pd.DataFrame(
        [(r.doc_id, lang[r.doc_id], r.n_tokens, r.bits_per_token)
         for r in q59_unigram_logprob(spark, SF).collect()],
        columns=["doc_id", "lang", "n_tokens", "bits_per_token"],
    )
    expect = {}
    for lg, sub in scored.groupby("lang"):
        sub = sub.sort_values(["bits_per_token", "doc_id"])
        total = int(sub["n_tokens"].sum())
        t1, t2 = total // 3, (2 * total) // 3
        csum = 0
        for _, r in sub.iterrows():
            csum += int(r["n_tokens"])
            expect[int(r["doc_id"])] = (
                "head" if csum <= t1 else "middle" if csum <= t2 else "tail"
            )

    out = q66_perplexity_buckets(spark, SF).collect()
    assert len(out) == len(expect)
    got = {r.doc_id: r.bucket for r in out}
    assert got == expect
    # all three buckets non-empty on the real corpus
    assert {r.bucket for r in out} == {"head", "middle", "tail"}


def test_q66_window_only_on_straddling_buckets(spark):
    """Scale contract: the per-lang cumsum Window runs over ONLY the <=2
    grid buckets per language that straddle a tercile cut — the driver
    labeling joins back as a broadcast, never a corpus shuffle for the
    labeled side."""
    from real_time_anomaly_detection_spark.queries import (
        q66_perplexity_buckets,
    )

    plan = (
        q66_perplexity_buckets(spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1, plan
    assert "BroadcastHashJoin" in plan, plan


def test_q64_tokenize_pass_is_shared(spark):
    """The mapInPandas tokenize+hash stage must be persisted and reused by
    all three consumers (span explode x2, per-doc arithmetic) — the
    executed plan reads the in-memory relation, and the dup-hash join
    back to spans carries no broadcast HINT (web-corpus dup rates are
    30-80%; AQE decides at runtime — the q48 gate precedent)."""
    from real_time_anomaly_detection_spark.queries import q64_dup_span_stats

    df = q64_dup_span_stats(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    logical = df._jdf.queryExecution().logical().toString()
    assert "broadcast" not in logical.lower(), logical
