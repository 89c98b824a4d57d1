"""Semantics of the corpus-statistics / model-scoring operators: q58
(vocabulary document-frequency stats), q59 (self-trained unigram-LM
perplexity proxy), q60 (semantic cross-split decontamination)."""

import math
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _write_docs(spark, rows, d):
    spark.createDataFrame(rows, _DOCS_SCHEMA).write.parquet(
        f"{d}/documents.parquet"
    )


def test_q58_df_cf_golden(spark):
    """Exact df/cf/df_frac on a hand-counted corpus, deterministic
    (df desc, term asc) ordering, and the top-k cut."""
    from real_time_anomaly_detection_spark.queries import q58_vocab_df_stats

    rows = [
        (1, "the cat the", "en", "s", 11),
        (2, "The dog", "en", "s", 7),       # lowercasing folds The -> the
        (3, "bird", "en", "s", 4),
        (4, None, "en", "s", 0),            # null text contributes nothing
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = {r.term: r for r in q58_vocab_df_stats(spark, d).collect()}
        top2 = q58_vocab_df_stats(spark, d, top_k=2).collect()
    assert set(out) == {"the", "cat", "dog", "bird"}
    assert (out["the"].df, out["the"].cf) == (2, 3)
    assert (out["cat"].df, out["cat"].cf) == (1, 1)
    # df_frac denominator is the FULL corpus incl. the null-text doc
    assert out["the"].df_frac == 0.5
    # top-k keeps the highest df, breaking the df=1 tie by term asc
    assert [(r.term, r.df) for r in top2] == [("the", 2), ("bird", 1)]


def test_q58_topk_never_global_sorts(spark):
    """The top-k cut must plan as TakeOrderedAndProject, not a global
    Sort — the vocabulary is corpus-scale at 100 TB — and the whole query
    must carry exactly ONE hash Exchange (the vocabulary-scale term agg;
    per-doc term counts are scan-local, never shuffled)."""
    from real_time_anomaly_detection_spark.queries import q58_vocab_df_stats

    plan = q58_vocab_df_stats(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [df" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q59_logprob_golden(spark):
    """Hand-computed add-one-smoothed unigram scores; zero-token docs
    emit no row."""
    from real_time_anomaly_detection_spark.queries import q59_unigram_logprob

    rows = [
        (1, "a a b", "en", "s", 5),
        (2, "b b b c", "en", "s", 7),
        (3, "!!! 123", "en", "s", 7),  # no [a-z]+ token -> no row
    ]
    # model: cf(a)=2 cf(b)=4 cf(c)=1, T=7, V=3
    lp = {t: math.log((cf + 1.0) / (7 + 3)) for t, cf in
          {"a": 2, "b": 4, "c": 1}.items()}
    exp1 = (2 * lp["a"] + lp["b"]) / 3
    exp2 = (3 * lp["b"] + lp["c"]) / 4
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = {r.doc_id: r for r in q59_unigram_logprob(spark, d).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_tokens == 3 and out[2].n_tokens == 4
    assert out[1].mean_logprob == pytest.approx(exp1, abs=1e-6)
    assert out[2].mean_logprob == pytest.approx(exp2, abs=1e-6)
    assert out[1].bits_per_token == pytest.approx(-exp1 / math.log(2), abs=1e-6)


def _emb(seed_axis: int):
    """A 64-dim one-hot-ish vector; identical seeds -> cosine 1.0,
    different axes -> cosine 0.0."""
    v = [0.0] * 64
    v[seed_axis] = 1.0
    return v


def test_q60_flags_cross_split_pair_only(spark):
    """A planted train/test near-identical pair is reported with the
    correct orientation; an equally-similar train/train pair is NOT
    (same-split duplication is q42/q49's job, not decontamination's)."""
    from real_time_anomaly_detection_spark.queries import (
        q60_semantic_decontamination,
    )

    # md5-bucket(id) % 100: 0 -> 98 (test), 1/2/3/4 -> train (<90)
    rows = [
        (0, _emb(7), 1),   # test split
        (1, _emb(7), 1),   # train split — planted contamination vs vec 0
        (2, _emb(13), 1),  # train
        (3, _emb(13), 1),  # train — same-split near-dup, must NOT appear
        (4, _emb(21), 1),  # train, unrelated
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        out = q60_semantic_decontamination(spark, d).collect()
    assert [(r.train_vec, r.test_vec) for r in out] == [(1, 0)]
    assert out[0].cosine == pytest.approx(1.0)


def test_q60_orientation_on_real_corpus(spark):
    """Every reported train_vec hashes below the TRAIN cut (q45/q51's
    < 80 — val-band docs are in neither role) and every test_vec
    at-or-above the test cut — the orientation can never flip."""
    from real_time_anomaly_detection_spark.queries import (
        q60_semantic_decontamination,
    )

    def bucket(c):
        return F.conv(
            F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10
        ).cast("long") % 100

    # sf0.01: the smallest corpus whose near-dup plants straddle the split
    out = q60_semantic_decontamination(spark, "/root/testdata/sf0.01")
    bad = out.filter(
        (bucket("train_vec") >= 80) | (bucket("test_vec") < 90)
    ).count()
    assert bad == 0
    assert out.count() > 0, "synthetic corpus plants cross-split near-dups"


def test_q61_statuses_golden(spark):
    """Planted corpus exercising all three adjudication statuses: doc 1
    contaminates both ways (shared 8-gram AND near-identical embedding to
    the test doc), doc 2 only verbatim, doc 3 only semantic."""
    import tempfile

    from real_time_anomaly_detection_spark.queries import (
        q61_decontamination_report,
    )

    # md5 buckets: 0 -> 98 (test), 1 -> 48, 2 -> 66, 3 -> 23 (train)
    docs = [
        (0, "z a b c d e f g h i", "en", "s", 19),   # test/benchmark doc
        (1, "a b c d e f g h i j", "en", "s", 19),   # shares 8-grams with 0
        (2, "a b c d e f g h q2 q3", "en", "s", 20), # shares 'a b c d e f g h'
        (3, "u v w x y zz q4 q5 q6 q7", "en", "s", 24),  # no shared gram
    ]
    embs = [
        (0, _emb(7), 1),   # test vector
        (1, _emb(7), 1),   # near-identical to 0 -> semantic pair
        (2, _emb(13), 1),  # unrelated
        (3, _emb(7), 1),   # near-identical to 0 -> semantic pair
    ]
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, docs, d)
        spark.createDataFrame(
            embs, "vec_id long, embedding array<float>, label int"
        ).write.parquet(f"{d}/embeddings.parquet")
        out = {r.doc_id: r for r in
               q61_decontamination_report(spark, d).collect()}
    assert {k: v.status for k, v in out.items()} == {
        1: "both", 2: "verbatim_only", 3: "semantic_only"}
    assert out[1].n_sem_pairs == 1 and out[1].max_cosine == pytest.approx(1.0)
    assert out[2].n_sem_pairs == 0 and out[2].max_cosine == -1.0
    assert out[3].n_shared_grams == 0 and out[3].n_bench_docs == 0
    assert out[1].n_shared_grams >= 1 and out[2].n_shared_grams >= 1


def test_q62_tfidf_golden(spark):
    """Hand-computed TF-IDF, deterministic tie-break by term, top-k cut."""
    from real_time_anomaly_detection_spark.queries import q62_tfidf_keywords

    rows = [
        (1, "apple apple banana", "en", "s", 18),
        (2, "banana cherry", "en", "s", 13),
        (3, "xx yy", "en", "s", 5),    # exact tie -> term asc
        (4, None, "en", "s", 0),       # no tokens -> no rows
    ]
    n = 4
    idf = lambda df: math.log(n / df)  # noqa: E731
    with tempfile.TemporaryDirectory() as d:
        _write_docs(spark, rows, d)
        out = {}
        for r in q62_tfidf_keywords(spark, d, top_k=2).collect():
            out.setdefault(r.doc_id, []).append((r.rank, r.term, r.tfidf))
    assert set(out) == {1, 2, 3}
    by_rank = {doc: {rk: (t, v) for rk, t, v in rows_}
               for doc, rows_ in out.items()}
    assert [by_rank[1][k][0] for k in (1, 2)] == ["apple", "banana"]
    assert by_rank[1][1][1] == pytest.approx(round(2 / 3 * idf(1), 6))
    assert [by_rank[2][k][0] for k in (1, 2)] == ["cherry", "banana"]
    assert by_rank[2][2][1] == pytest.approx(round(1 / 2 * idf(2), 6))
    # exact tie (same cnt, same df): deterministic term-asc ranks
    assert [by_rank[3][k][0] for k in (1, 2)] == ["xx", "yy"]
