"""Incremental near-duplicate detection at ingest time (streaming dedup).

The batch dedup family (queries.py q29/q34) answers "which pairs in this
corpus are near-dups?"; a 100 TB ingest pipeline instead asks, PER ARRIVING
BATCH, "which of these new documents duplicate something we already hold?" —
re-running the all-corpus job per batch is O(corpus) per epoch and unusable.
This module recasts the MinHash-LSH pipeline onto the collector loop
(readStream + foreachBatch, the same T1/T2/T5 skeleton as
streaming/incremental.py):

  per micro-batch:
    1. band the new docs (explode to (doc_id, band, bucket) — the same
       md5-portable minhash as q29, so batch results are comparable to the
       batch pipeline's);
    2. candidates = new-bands JOIN accumulated-bands-store (new docs vs
       EVERYTHING seen so far) UNION new-bands self-join (within-batch
       pairs) — both keyed on (band, bucket), never all-pairs;
    3. verify exact hashed-token Jaccard >= threshold on candidates only,
       reading token arrays from the docs store + the batch;
    4. append the batch's bands + hashed tokens to the stores (epoch-keyed
       overwrite => a retried epoch replaces its own partial output instead
       of duplicating it — same idempotency contract as stream_validate);
    5. write the verified pairs under pairs/epoch_id=N.

State is a pair of parquet tables (bands store: 4 tiny rows per doc; docs
store: doc_id + 60-bit token hashes), NOT driver memory — executors join
against it, so the accumulated corpus can be arbitrarily large; at real scale
both stores would be Iceberg tables bucketed by (band, bucket) to make the
step-2 join co-located. The bucket-size cap / salt mitigations from
_lsh_candidate_pairs apply to the store join identically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import _hashed_tokens, _minhash_bands_spark
from ..schemas import CLIPS  # noqa: F401  (documents schema defined below)

DOCS_SCHEMA = "doc_id long, text string"
JACCARD_THRESHOLD = 0.5


def _bands(docs: DataFrame) -> DataFrame:
    htoks = _hashed_tokens(F.col("text"))
    return docs.select(
        "doc_id", F.explode(_minhash_bands_spark(htoks)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def _toks(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", _hashed_tokens(F.col("text")).alias("toks"))


def _verify(cands: DataFrame, toks_a: DataFrame, toks_b: DataFrame,
            threshold: float) -> DataFrame:
    ta = toks_a.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta"))
    tb = toks_b.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb"))
    n_common = F.size(F.array_intersect("ta", "tb"))
    jac = n_common / (F.size("ta") + F.size("tb") - n_common)
    return (
        cands.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def stream_dedup(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    out_dir: str,
    threshold: float = JACCARD_THRESHOLD,
    available_now: bool = True,
    processing_time: str = "600 seconds",
):
    """Watch `input_path` for new document files; emit verified near-dup
    pairs per epoch under `out_dir`/pairs/epoch_id=N. `doc_a` is always the
    PREVIOUSLY-SEEN (or lower-id within-batch) document, `doc_b` the new one.
    Returns the StreamingQuery."""
    bands_store = os.path.join(out_dir, "bands_store")
    docs_store = os.path.join(out_dir, "docs_store")
    pairs_out = os.path.join(out_dir, "pairs")

    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = batch_df.dropDuplicates(["doc_id"]).persist()
        new_bands = _bands(batch_df).persist()
        new_toks = _toks(batch_df)

        # within-batch pairs: bucketed self-join (ordered doc_a < doc_b)
        within = (
            new_bands.alias("a")
            .join(new_bands.alias("b"), ["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        within_pairs = _verify(within, new_toks, new_toks, threshold)

        # cross-batch pairs: new docs vs the accumulated store. 'Store
        # absent' is a filesystem probe, NOT a caught read error — a corrupt
        # store must fail the epoch (and be retried) rather than silently
        # dropping every cross-batch pair (same contract as sinks.upsert).
        has_store = os.path.isdir(bands_store)
        if has_store:
            old_bands = spark.read.parquet(bands_store).filter(
                F.col("epoch_id") < epoch_id  # a retried epoch must not see its own partial state
            )
            old_toks = spark.read.parquet(docs_store).filter(F.col("epoch_id") < epoch_id)
            cross = (
                old_bands.alias("a")
                .join(new_bands.alias("b"), ["band", "bucket"])
                .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
                .distinct()
            )
            cross_pairs = _verify(
                cross, old_toks.select("doc_id", "toks"), new_toks, threshold
            )
            pairs = within_pairs.unionByName(cross_pairs)
        else:
            pairs = within_pairs

        pairs.write.mode("overwrite").parquet(f"{pairs_out}/epoch_id={epoch_id}")
        # epoch-keyed state appends: overwrite-own-epoch => idempotent retry
        new_bands.write.mode("overwrite").parquet(f"{bands_store}/epoch_id={epoch_id}")
        new_toks.write.mode("overwrite").parquet(f"{docs_store}/epoch_id={epoch_id}")
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
