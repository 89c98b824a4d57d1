"""Deterministic training-order resharding (operators/reshard.py, q67).

Covers: the assignment is a permutation with dense per-shard positions,
rerun- and salt-determinism, shard balance, the one-Exchange/no-global-sort
plan pin, the materialized layout (one ordered file per shard directory,
row order == pos order, union == corpus), and the CLI flow.
"""

import os
import re

import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.operators import reshard as RS

N = 500


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 3).cast("int").alias("lang_code"),
    )


def test_permutation_and_dense_positions(spark, docs):
    asg = RS.training_order(docs, n_shards=4).collect()
    assert {r.doc_id for r in asg} == set(range(N))  # every doc exactly once
    by_shard = {}
    for r in asg:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_deterministic_and_salt_independent(spark, docs):
    a = {(r.doc_id, r.shard, r.pos) for r in
         RS.training_order(docs, n_shards=4).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in
         RS.training_order(docs, n_shards=4).collect()}
    assert a == b  # rerun-identical
    c = {(r.doc_id, r.shard, r.pos) for r in
         RS.training_order(docs, n_shards=4, salt="epoch1").collect()}
    assert c != a  # a new salt is a genuinely different permutation
    assert {t[0] for t in c} == set(range(N))  # ...but still a permutation


def test_shard_balance(spark, docs):
    sizes = [
        r.n for r in RS.training_order(docs, n_shards=4)
        .groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    # Binomial(500, 1/4): mean 125, sigma ~9.7 — 4-sigma band
    assert all(86 <= s <= 164 for s in sizes), sizes


def test_n_shards_guard(spark, docs):
    with pytest.raises(ValueError):
        RS.training_order(docs, n_shards=0)


def test_plan_one_exchange_no_global_sort(spark, docs):
    p = (
        RS.training_order(docs, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert p.count("Exchange") == 1, p
    assert "hashpartitioning(shard" in p, p
    assert "rangepartitioning" not in p, p  # never the sampled global sort


def test_write_shards_layout(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    RS.write_shards(docs, out, n_shards=4)
    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shard_dirs == [f"shard={k}" for k in range(4)]
    asg = {
        r.doc_id: (r.shard, r.pos)
        for r in RS.training_order(docs, n_shards=4).collect()
    }
    seen = []
    for d in shard_dirs:
        shard = int(d.split("=")[1])
        files = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)  # one ordered file per shard
        rows = spark.read.parquet(os.path.join(out, d)).collect()
        # file row order IS the training order: pos dense-ascending,
        # and each row's (shard, pos) matches the assignment relation
        assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            assert asg[r.doc_id] == (shard, r.pos)
        assert all(r.text == f"text-{r.doc_id}" for r in rows)  # payload rides
        seen.extend(r.doc_id for r in rows)
    assert sorted(seen) == list(range(N))


def test_cli_flow(spark, docs, tmp_path):
    from real_time_anomaly_detection_spark import cli

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    docs.write.parquet(inp)
    cli.main(["reshard", "--input", inp, "--out", out, "--n-shards", "2"])
    back = spark.read.parquet(out)
    assert back.count() == N
    assert back.select("shard").distinct().count() == 2
    # a different salt re-orders without losing rows
    out2 = str(tmp_path / "out2")
    cli.main(["reshard", "--input", inp, "--out", out2, "--n-shards", "2",
              "--salt", "epoch1"])
    a = [(r.shard, r.pos, r.doc_id)
         for r in spark.read.parquet(out).orderBy("doc_id").collect()]
    b = [(r.shard, r.pos, r.doc_id)
         for r in spark.read.parquet(out2).orderBy("doc_id").collect()]
    assert a != b and len(a) == len(b) == N
