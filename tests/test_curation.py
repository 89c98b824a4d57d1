"""Semantics of the corpus-curation operators q51 (benchmark
decontamination) and q52 (deterministic stratified sampling)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _bucket(doc_id_col, salt: str = "", mod: int = 100):
    key = F.concat(F.lit(salt), doc_id_col.cast("string")) if salt else (
        doc_id_col.cast("string")
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long") % mod


def test_decontamination_reports_only_train_docs(spark):
    """Every contaminated doc q51 reports must sit in the train bucket
    (md5 % 100 < 80) — never in the benchmark split itself."""
    from real_time_anomaly_detection_spark.queries import q51_decontamination

    out = q51_decontamination(spark, SF)
    bad = out.filter(_bucket(F.col("doc_id")) >= 80).count()
    assert bad == 0
    rows = out.collect()
    assert rows, "synthetic corpus plants near-dups across splits"
    assert all(r.n_shared_grams >= 1 and r.n_bench_docs >= 1 for r in rows)


def test_decontamination_finds_planted_overlap(spark):
    """A train doc and a benchmark doc sharing an 8-token span must be
    flagged; the gram count must equal the distinct shared windows."""
    from real_time_anomaly_detection_spark.queries import q51_decontamination

    # doc ids chosen so md5-bucket(train)<80 and md5-bucket(bench)>=90
    train_id, bench_id = 1, 0
    df = spark.createDataFrame(
        [
            (train_id, "a b c d e f g h i j", "en", "srcX", 19),
            (bench_id, "z a b c d e f g h i", "en", "srcY", 19),
            (3, "q r s t u v w x y z2", "en", "srcZ", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    buckets = {
        r.doc_id: r.b
        for r in df.select("doc_id", _bucket(F.col("doc_id")).alias("b")).collect()
    }
    assert buckets[train_id] < 80 and buckets[bench_id] >= 90, buckets
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in q51_decontamination(spark, d).collect()
        }
    # shared 8-gram windows of the two texts: 'a b c d e f g h' and
    # 'b c d e f g h i' appear in both docs
    assert set(out) == {train_id}
    assert out[train_id].n_shared_grams == 2
    assert out[train_id].n_bench_docs == 1


def test_stratified_sample_rates_and_determinism(spark):
    """q52's rollup must agree with the WHERE-filter materialization of the
    same predicate, hit the configured rate within binomial noise, and be
    bit-identical across invocations."""
    from real_time_anomaly_detection_spark.queries import (
        _Q52_RATES,
        load,
        q52_stratified_sample,
    )

    sf = "/root/testdata/sf0.01"
    a = {r.lang: r for r in q52_stratified_sample(spark, sf).collect()}
    b = {r.lang: r for r in q52_stratified_sample(spark, sf).collect()}
    assert {k: (v.n_kept, v.realized_rate) for k, v in a.items()} == {
        k: (v.n_kept, v.realized_rate) for k, v in b.items()
    }
    for lang, rate in _Q52_RATES.items():
        got = a[lang].realized_rate
        n = a[lang].n_total
        # 4-sigma binomial envelope around the target rate
        tol = 4 * (rate * (1 - rate) / n) ** 0.5
        assert abs(got - rate) <= tol, (lang, got, rate, tol)

    # the predicate as a WHERE filter reproduces the rollup's kept counts
    d = load(spark, sf, "documents")
    h = _bucket(F.col("doc_id"), salt="q52:", mod=10000)
    thresh = None
    for lang, rate in _Q52_RATES.items():
        cond, val = F.col("lang") == lang, F.lit(int(rate * 10000))
        thresh = F.when(cond, val) if thresh is None else thresh.when(cond, val)
    kept = d.filter(h < thresh.otherwise(F.lit(10000)))
    counts = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {k: v.n_kept for k, v in a.items()}


def test_repetition_signals_planted_docs(spark):
    """A phrase-looped doc fails the gate; a diverse doc passes; <2-token
    and null docs are excluded (no 2-gram is defined)."""
    import tempfile

    from real_time_anomaly_detection_spark.queries import q53_repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam", "en", "s", 19),          # degenerate
            (2, "a b c d e f g h i j k l", "en", "s", 23),      # diverse
            (3, "one", "en", "s", 3),                           # <2 tokens
            (4, None, "en", "s", 0),                            # null text
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q53_repetition_signals(spark, d).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]  # 4x 'spam': top word 4/4, gram ('spam spam') 3x -> 2*3/4
    assert r1.n_tokens == 4 and r1.top_word_frac == 1.0
    assert r1.top_2gram_frac == 1.5 and r1.dup_2gram_frac == 1.0
    assert not r1.keep
    r2 = out[2]  # 12 distinct tokens: top2 = 2/12, no duplicate grams
    assert r2.top_2gram_frac == 0.166667 and r2.dup_2gram_frac == 0.0
    assert r2.keep


def test_sequence_packing_greedy_boundaries(spark):
    """Greedy fill: exact-fit stays in pack, overflow doc packs alone
    (fill_rate > 1), next doc opens a fresh pack."""
    import tempfile

    from real_time_anomaly_detection_spark.queries import q54_sequence_packing

    def toks(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    # doc_id order IS pack order; token counts 4,5,3,7,12,2 vs budget 10:
    # p0=[4,5] (9), p1=[3,7] (10, exact fit), p2=[12] (overflow), p3=[2]
    rows = [(i, toks(n, f"d{i}_"), "en", "s", 0)
            for i, n in enumerate([4, 5, 3, 7, 12, 2])]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = sorted(
            q54_sequence_packing(spark, d, budget=10, n_shards=1).collect(),
            key=lambda r: r.pack_id,
        )
    got = [(r.pack_id, r.n_docs, r.n_tokens, r.fill_rate) for r in out]
    assert got == [
        (0, 2, 9, 0.9),
        (1, 2, 10, 1.0),
        (2, 1, 12, 1.2),
        (3, 1, 2, 0.2),
    ]


def test_sequence_packing_deterministic_and_sharded(spark, sf_dir):
    """Two invocations produce identical packs, and every shard id is in
    range — the parallelism unit is the shard."""
    from real_time_anomaly_detection_spark.queries import q54_sequence_packing

    a = sorted(map(tuple, q54_sequence_packing(spark, sf_dir).collect()))
    b = sorted(map(tuple, q54_sequence_packing(spark, sf_dir).collect()))
    assert a == b and a
    assert {t[0] for t in a} <= set(range(8))


def test_quality_heuristics_planted_docs(spark):
    """q55 keep-gate goldens: each Gopher rule fails in isolation; a
    compliant doc passes; zero-token/null docs are excluded."""
    import tempfile

    from real_time_anomaly_detection_spark.queries import q55_quality_heuristics

    good = "the cat sat with the dog and that was fine to see " * 5  # 60 toks
    rows = [
        (1, good, "en", "s", len(good)),
        # too short (10 tokens) but otherwise compliant
        (2, "the cat sat with the dog and that was fine", "en", "s", 43),
        # long enough, stopwords present, but mean word len > 10
        (3, ("the " + "supercalifragilistic " * 2 + "with ") * 12, "en", "s", 0),
        # long enough but ZERO stop-set members
        (4, "cat dog bird fish " * 12, "en", "s", 0),
        # alphabetic fraction below 0.8: 50% symbol tokens
        (5, ("the of %% !! " * 12) + "be with", "en", "s", 0),
        (6, "   ", "en", "s", 3),   # zero tokens: excluded
        (7, None, "en", "s", 0),    # null text: excluded
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q55_quality_heuristics(spark, d).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1].keep and out[1].n_tokens == 60
    assert out[1].n_stopwords >= 2
    assert not out[2].keep and out[2].n_tokens == 10
    assert not out[3].keep and out[3].mean_word_len > 10.0
    assert not out[4].keep and out[4].n_stopwords == 0
    assert not out[5].keep and out[5].alpha_word_frac == 0.52
    # sanity: rules fail independently — docs 3/4/5 all clear the length gate
    assert all(out[i].n_tokens >= 40 for i in (3, 4, 5))


def test_quality_heuristics_shuffle_free_plan(spark, sf_dir):
    """Every q55 signal folds over the doc's own token array: the executed
    plan must contain NO KEYED Exchange — the scan is the whole
    computation. r7: `_spread` may round-robin a few-row-group local scan
    for parallelism (no-op at scale), so the pin forbids hash/range
    partitioning — the shape that WOULD mean a corpus-scale shuffle —
    rather than any Exchange (the q53 pin convention)."""
    from real_time_anomaly_detection_spark.queries import q55_quality_heuristics

    plan = (
        q55_quality_heuristics(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_pii_redaction_dual_engine_golden(spark):
    """q56 planted-PII semantics, proven in BOTH engines: the Spark query
    and the DuckDB oracle SQL run over the same planted docs and must
    produce identical rows (the corpus-scale oracle only exercises the
    no-PII path). Staged redaction: email -> ip -> phone."""
    import tempfile

    import duckdb

    from real_time_anomaly_detection_spark.queries import (
        _Q56_SQL, q56_pii_redaction)

    rows = [
        (1, "mail a.b+x@foo-bar.co or b@x.io now", "en", "s", 0),
        (2, "call +1 (555) 123-4567 or 555 987 6543", "en", "s", 0),
        (3, "host 10.0.255.7 and 192.168.1.1 up", "en", "s", 0),
        (4, "bob@corp.com at 10.1.1.1 dials (555) 111-2222", "en", "s", 0),
        (5, "no pii here at all", "en", "s", 0),
        (6, None, "en", "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(f"{d}/documents.parquet")
        got = {r.doc_id: r for r in q56_pii_redaction(spark, d).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
        )
        oracle = {r[0]: r for r in con.execute(_Q56_SQL).fetchall()}
    assert set(got) == set(oracle) == {1, 2, 3, 4, 5}
    for i in got:
        g = got[i]
        assert (g.n_emails, g.n_ips, g.n_phones, g.n_pii, g.redacted) == \
            tuple(oracle[i][1:]), (i, g, oracle[i])
    assert got[1].n_emails == 2
    assert got[1].redacted == "mail <EMAIL> or <EMAIL> now"
    assert got[2].n_phones == 2
    assert got[2].redacted == "call <PHONE> or <PHONE>"
    assert got[3].n_ips == 2
    assert got[3].redacted == "host <IP> and <IP> up"
    assert got[4].n_pii == 3
    assert got[4].redacted == "<EMAIL> at <IP> dials <PHONE>"
    assert got[5].n_pii == 0 and got[5].redacted == "no pii here at all"


def test_pii_redaction_shuffle_free_plan(spark, sf_dir):
    # r7: no KEYED exchange and no join — `_spread`'s round-robin rebalance
    # of a few-row-group local scan is allowed (no-op at scale; the q53/q55
    # pin convention)
    from real_time_anomaly_detection_spark.queries import q56_pii_redaction

    plan = (
        q56_pii_redaction(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_leakage_safe_split_planted_cluster(spark):
    """q57: two near-identical docs whose OWN-id hashes land in different
    splits (doc 0 -> test, doc 1 -> train) must be assigned together to the
    cluster anchor's split; the rollup reports the prevented leak."""
    import tempfile

    from real_time_anomaly_detection_spark.queries import q57_leakage_safe_split

    dup = " ".join(f"tok{i:02d}" for i in range(20))
    rows = [
        (0, dup, "en", "s", len(dup)),          # own split: test (bucket 98)
        (1, dup + " tail", "en", "s", 0),       # own split: train (bucket 48)
        (3, " ".join(f"solo{i}" for i in range(15)), "en", "s", 0),  # loner
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {r.split: r for r in q57_leakage_safe_split(spark, d).collect()}
    assert out["test"].n_docs == 2           # both dups follow anchor doc 0
    assert out["test"].n_clustered == 2
    assert out["test"].n_moved == 1          # doc 1 was pulled out of train
    assert out["train"].n_docs == 1 and out["train"].n_moved == 0


def test_leakage_safe_split_totals_match_q45(spark, sf_dir):
    """q57 assigns every document exactly once, and it prevents real
    leakage on this corpus (n_moved > 0 — q45 would have split clusters)."""
    from real_time_anomaly_detection_spark.queries import (
        q45_hash_split, q57_leakage_safe_split)

    q57 = q57_leakage_safe_split(spark, sf_dir).collect()
    q45 = q45_hash_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in q57) == sum(r.n_docs for r in q45)
    assert sum(r.n_moved for r in q57) > 0
