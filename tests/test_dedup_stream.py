"""Streaming incremental near-dup: cross-batch pairs found at ingest time,
equivalence with the batch pipeline on the unioned corpus, restart no-op."""

import os

import pandas as pd
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.queries import q34_neardup_lsh_verified
from real_time_anomaly_detection_spark.streaming import dedup_stream


def _docs(rows):
    return pd.DataFrame(rows, columns=["doc_id", "text"])


BATCH1 = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
    (3, "one two three four five six seven eight"),
]
BATCH2 = [
    (10, "alpha beta gamma delta epsilon zeta eta thetaX"),  # near-dup of 1/2 (cross-batch)
    (11, "one two three four five six seven nine"),          # near-dup of 3 (cross-batch)
    (12, "completely different words everywhere here now"),
]


def _drain(spark, tmp_path, batches):
    src = str(tmp_path / "ds_src")
    out = str(tmp_path / "ds_out")
    ckpt = str(tmp_path / "ds_ckpt")
    for pdf in batches:
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        q = dedup_stream.stream_dedup(spark, src, ckpt, out)
        q.awaitTermination()
    return src, out, ckpt


def _norm(pairs_pdf):
    return {frozenset((a, b)) for a, b in zip(pairs_pdf.doc_a, pairs_pdf.doc_b)}


def test_cross_batch_pairs_and_batch_equivalence(spark, tmp_path):
    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1), _docs(BATCH2)])
    got = spark.read.parquet(os.path.join(out, "pairs"))
    got_pdf = got.toPandas()

    # batch-pipeline truth over the full corpus (same LSH + verify arithmetic)
    all_dir = str(tmp_path / "all")
    spark.createDataFrame(_docs(BATCH1 + BATCH2)).write.parquet(
        os.path.join(all_dir, "documents.parquet")
    )
    truth = q34_neardup_lsh_verified(spark, all_dir).toPandas()
    assert _norm(got_pdf) == _norm(truth)
    assert frozenset((1, 10)) in _norm(got_pdf)   # cross-batch pair found
    assert frozenset((3, 11)) in _norm(got_pdf)
    assert frozenset((1, 2)) in _norm(got_pdf)    # within-batch pair found
    # epoch attribution: cross-batch pairs belong to the arrival epoch
    e1 = got.filter(F.col("epoch_id") == 1).toPandas()
    assert frozenset((1, 10)) in _norm(e1)

    # jaccard values match the batch pipeline exactly
    tv = {frozenset((a, b)): j for a, b, j in zip(truth.doc_a, truth.doc_b, truth.jaccard)}
    for a, b, j in zip(got_pdf.doc_a, got_pdf.doc_b, got_pdf.similarity):
        assert j == tv[frozenset((a, b))]


def test_redrain_without_new_files_is_noop(spark, tmp_path):
    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1), _docs(BATCH2)])
    before = spark.read.parquet(os.path.join(out, "pairs")).count()
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    assert spark.read.parquet(os.path.join(out, "pairs")).count() == before


def test_embedding_stream_dedup_matches_batch(spark, tmp_path):
    """Embedding modality: streamed pairs equal the batch q42 pipeline's on
    the unioned corpus, including cross-batch near-dup discovery."""
    import numpy as np

    from real_time_anomaly_detection_spark.queries import q42_embedding_neardup_lsh

    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 64))

    def vec(i, noise=0.0):
        v = base[i] + noise * rng.normal(size=64)
        return [float(x) for x in v]

    b1 = pd.DataFrame({"doc_id": [0, 1, 2],
                       "embedding": [vec(0), vec(1), vec(2)]})
    # 10 is a near-copy of 0 (cross-batch), 11 near-copy of 1, 12 independent
    b2 = pd.DataFrame({"doc_id": [10, 11, 12],
                       "embedding": [vec(0, 0.05), vec(1, 0.05), vec(5)]})

    src = str(tmp_path / "es_src")
    out = str(tmp_path / "es_out")
    ckpt = str(tmp_path / "es_ckpt")
    for pdf in (b1, b2):
        spark.createDataFrame(pdf, "doc_id long, embedding array<float>") \
            .coalesce(1).write.mode("append").parquet(src)
        q = dedup_stream.stream_dedup(spark, src, ckpt, out, modality="embedding")
        q.awaitTermination()
    got = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
    got_pairs = {frozenset((a, b)) for a, b in zip(got.doc_a, got.doc_b)}

    all_dir = str(tmp_path / "es_all")
    allp = pd.concat([b1, b2]).rename(columns={"doc_id": "vec_id"})
    spark.createDataFrame(allp, "vec_id long, embedding array<float>") \
        .write.parquet(os.path.join(all_dir, "embeddings.parquet"))
    truth = q42_embedding_neardup_lsh(spark, all_dir).toPandas()
    truth_pairs = {frozenset((a, b)) for a, b in zip(truth.vec_a, truth.vec_b)}
    assert got_pairs == truth_pairs
    assert frozenset((0, 10)) in got_pairs  # cross-batch near-copy found
    assert frozenset((1, 11)) in got_pairs
    assert not any(12 in p for p in got_pairs)


def test_reingested_doc_id_does_not_self_pair(spark, tmp_path):
    """A document re-sent in a later batch (same doc_id, same text) must not
    emit a (x, x, 1.0) self-pair from the cross-batch join."""
    b1 = _docs(BATCH1)
    b2 = _docs([BATCH1[0]])  # doc 1 arrives again
    src, out, ckpt = _drain(spark, tmp_path, [b1, b2])
    got = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
    assert not (got.doc_a == got.doc_b).any()
