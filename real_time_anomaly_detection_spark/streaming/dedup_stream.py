"""Incremental near-duplicate detection at ingest time (streaming dedup),
for BOTH modalities: text (MinHash-LSH, the q34 pipeline) and embeddings
(banded cosine-LSH, the q42 pipeline).

The batch dedup family answers "which pairs in this corpus are near-dups?";
a 100 TB ingest pipeline instead asks, PER ARRIVING BATCH, "which of these
new items duplicate something we already hold?" — re-running the all-corpus
job per batch is O(corpus) per epoch and unusable. This module recasts both
LSH pipelines onto the collector loop (readStream + foreachBatch, the same
T1/T2/T5 skeleton as streaming/incremental.py):

  per micro-batch:
    1. band the new items — same md5-portable minhash (text) / LCG sign
       planes (embeddings) as the batch queries, so streamed results are
       bit-identical to the batch pipeline's on the same corpus;
    2. candidates = new-bands JOIN accumulated-bands-store (new vs
       EVERYTHING seen so far) UNION new-bands self-join (within-batch
       pairs) — both keyed on (band, bucket), never all-pairs;
    3. verify the exact similarity (hashed-token Jaccard / cosine) on
       candidates only, reading payloads from the store + the batch;
    4. append the batch's bands + payloads to the stores, epoch-keyed
       (overwrite-own-epoch => a retried epoch replaces its partial output —
       same idempotency contract as stream_validate);
    5. write verified pairs under pairs/epoch_id=N.

State is a pair of parquet tables, NOT driver memory — executors join
against it, so the accumulated corpus can be arbitrarily large; at real scale
both stores would be Iceberg tables bucketed by (band, bucket) to make the
step-2 join co-located. The bucket-size cap / salt mitigations from
queries._lsh_candidate_pairs apply to the store join identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import _hashed_tokens, _minhash_bands_spark, _nd_bands_expr

DOCS_SCHEMA = "doc_id long, text string"
EMB_SCHEMA = "doc_id long, embedding array<float>"
JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.45


# ---------------------------------------------------------------- modalities

def _text_prepare(batch: DataFrame) -> DataFrame:
    """(doc_id, payload) with payload = 60-bit hashed token array."""
    return batch.select("doc_id", _hashed_tokens(F.col("text")).alias("payload"))


def _text_bands(batch: DataFrame) -> DataFrame:
    htoks = _hashed_tokens(F.col("text"))
    return batch.select(
        "doc_id", F.explode(_minhash_bands_spark(htoks)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _jaccard(ca: str, cb: str):
    n_common = F.size(F.array_intersect(ca, cb))
    return n_common / (F.size(ca) + F.size(cb) - n_common)


def _emb_prepare(batch: DataFrame) -> DataFrame:
    return batch.select(
        "doc_id", F.transform("embedding", lambda x: x.cast("double")).alias("payload")
    )


def _emb_bands(batch: DataFrame) -> DataFrame:
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return batch.select(
        "doc_id", emb.alias("_e")
    ).select("doc_id", F.explode(_nd_bands_expr("_e")).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _cosine(ca: str, cb: str):
    dot = F.aggregate(
        F.zip_with(F.col(ca), F.col(cb), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return dot / (norm(ca) * norm(cb))


_MODALITIES = {
    "text": (DOCS_SCHEMA, _text_prepare, _text_bands, _jaccard, JACCARD_THRESHOLD),
    "embedding": (EMB_SCHEMA, _emb_prepare, _emb_bands, _cosine, COSINE_THRESHOLD),
}


# ---------------------------------------------------------------- shared core

def _verify(cands: DataFrame, pay_a: DataFrame, pay_b: DataFrame,
            sim_fn, threshold: float) -> DataFrame:
    pa = pay_a.select(F.col("doc_id").alias("doc_a"), F.col("payload").alias("pa"))
    pb = pay_b.select(F.col("doc_id").alias("doc_b"), F.col("payload").alias("pb"))
    return (
        cands.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("similarity", F.round(sim_fn("pa", "pb"), 6))
        .filter(F.col("similarity") >= threshold)
        .select("doc_a", "doc_b", "similarity")
    )


def stream_dedup(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    out_dir: str,
    modality: str = "text",
    threshold: float | None = None,
    available_now: bool = True,
    processing_time: str = "600 seconds",
):
    """Watch `input_path` for new files of the given modality; emit verified
    near-dup pairs per epoch under `out_dir`/pairs/epoch_id=N. `doc_a` is the
    previously-seen (or lower-id within-batch) item, `doc_b` the new one.
    Returns the StreamingQuery."""
    schema, prepare, bands_of, sim_fn, default_thr = _MODALITIES[modality]
    threshold = default_thr if threshold is None else threshold
    bands_store = os.path.join(out_dir, "bands_store")
    payload_store = os.path.join(out_dir, "payload_store")
    pairs_out = os.path.join(out_dir, "pairs")

    stream = spark.readStream.schema(schema).parquet(input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.dropDuplicates(["doc_id"]).persist()
        new_bands = bands_of(batch_df).persist()
        new_pay = prepare(batch_df)

        # within-batch pairs: bucketed self-join (ordered doc_a < doc_b)
        within = (
            new_bands.alias("a")
            .join(new_bands.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        pairs = _verify(within, new_pay, new_pay, sim_fn, threshold)

        # cross-batch pairs: new items vs the accumulated store. 'Store
        # absent' is a filesystem probe, NOT a caught read error — a corrupt
        # store must fail the epoch (and be retried) rather than silently
        # dropping every cross-batch pair (same contract as sinks.upsert).
        if os.path.isdir(bands_store):
            old_bands = spark.read.parquet(bands_store).filter(
                F.col("epoch_id") < epoch_id  # a retried epoch must not see its own partial state
            )
            old_pay = spark.read.parquet(payload_store).filter(
                F.col("epoch_id") < epoch_id
            )
            cross = (
                old_bands.alias("a")
                .join(new_bands.alias("b"), ["band", "bucket"])
                # a re-ingested doc_id (same id arriving again in a later
                # batch) must not self-pair at similarity 1.0
                .filter(F.col("a.doc_id") != F.col("b.doc_id"))
                .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                .distinct()
            )
            pairs = pairs.unionByName(
                _verify(cross, old_pay.select("doc_id", "payload"), new_pay,
                        sim_fn, threshold)
            )

        pairs.write.mode("overwrite").parquet(f"{pairs_out}/epoch_id={epoch_id}")
        # epoch-keyed state appends: overwrite-own-epoch => idempotent retry
        new_bands.write.mode("overwrite").parquet(f"{bands_store}/epoch_id={epoch_id}")
        new_pay.write.mode("overwrite").parquet(f"{payload_store}/epoch_id={epoch_id}")
        new_bands.unpersist()
        batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
