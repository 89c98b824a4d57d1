"""Duration-bucketed greedy batch packing — the training-batch assembly
step of a speech pipeline (the audio analog of q54's token packing).

ASR training pads every clip in a batch to the batch's longest clip, so
batching arbitrary durations together wastes compute quadratically in the
duration spread. The standard answer (Lhotse's ``DynamicBucketingSampler``,
ESPnet's batch bins) is: bucket clips by duration so within-batch spread is
bounded by the bucket width, then fill each batch greedily to an
audio-seconds budget.

Spark shape for 100 TB: the duration bucket and md5 shard are map-side
expressions over CLIP METADATA — the payload column is never read (plan
test pins ``bytes`` out of the scan schema). The only shuffle keys on
(shard, dur_bucket), and each group packs independently inside ONE
applyInPandas pass over (clip_id, dur_ms) rows — ~24 bytes/clip, so even a
10^12-clip corpus shuffles only metadata. Parallelism = n_shards x
n_buckets; a real deployment sizes n_shards so a group's id+duration pairs
fit an executor. Packing is inherently sequential WITHIN a stream, so
deterministic clip_id order within the group is what makes the assignment
reproducible across runs and cluster sizes.

Reference parity note: the reference engine has no batching stage (it
validates 504 observations single-threaded); this operator exists for the
LLM/ASR-pipeline coverage axis the build brief adds on top.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bucket edges in seconds: bucket i holds clips with dur in (edge[i-1], edge[i]];
# the last bucket is unbounded above. Chosen to roughly double — padding waste
# within a bucket is then bounded by ~half the bucket's upper edge.
DEFAULT_BUCKET_EDGES_S = (2.0, 4.0, 8.0, 16.0, 30.0)


def pack_batches(
    clips: DataFrame,
    budget_s: float = 60.0,
    bucket_edges_s: tuple[float, ...] = DEFAULT_BUCKET_EDGES_S,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each clip to a (shard, dur_bucket, batch_id) training batch.

    Greedy fill in deterministic clip_id order within each (shard, bucket)
    group: a clip joins the open batch until adding it would push the
    batch's total duration past ``budget_s``, then opens a new batch. A
    clip longer than the budget overflows a batch of its own (the
    trainer's truncation decision, not the packer's). Clips with null
    ``dur_ms`` are excluded — a batch budget cannot account for an
    unknown duration; a curation pipeline quarantines those rows upstream
    (the validation engine's completeness family already flags them).

    Returns one row per packed clip:
    (clip_id, shard, dur_bucket, batch_id, dur_ms).
    """
    budget_ms = int(round(float(budget_s) * 1000.0))
    edges_ms = [int(round(e * 1000.0)) for e in bucket_edges_s]
    if sorted(edges_ms) != edges_ms:
        raise ValueError(f"bucket_edges_s must be ascending: {bucket_edges_s}")

    # bucket = number of edges strictly below dur_ms (flat when-chain, the
    # q45/q52 convention — no nested re-inlining)
    bucket = None
    for i, e in enumerate(edges_ms):
        cond = F.col("dur_ms") <= F.lit(e)
        bucket = F.when(cond, F.lit(i)) if bucket is None else bucket.when(
            cond, F.lit(i)
        )
    bucket = bucket.otherwise(F.lit(len(edges_ms)))

    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("pack:"), F.col("clip_id"))), 1, 15
            ), 16, 10,
        ).cast("long")
        % n_shards
    )
    rows = (
        clips.filter(F.col("dur_ms").isNotNull())
        .select(
            "clip_id",
            F.col("dur_ms").cast("long").alias("dur_ms"),
            shard.alias("shard"),
            bucket.cast("int").alias("dur_bucket"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("clip_id")
        batch_ids, acc, bid = [], 0, 0
        first = True
        for d in pdf["dur_ms"]:
            d = int(d)
            if not first and acc + d > budget_ms:
                bid, acc = bid + 1, d
            else:
                acc += d
            first = False
            batch_ids.append(bid)
        return pdf.assign(batch_id=batch_ids)[
            ["clip_id", "shard", "dur_bucket", "batch_id", "dur_ms"]
        ]

    return rows.groupBy("shard", "dur_bucket").applyInPandas(
        pack,
        schema="clip_id string, shard long, dur_bucket int, batch_id long, "
               "dur_ms long",
    )


def batch_stats(assignments: DataFrame, budget_s: float = 60.0) -> DataFrame:
    """Per-batch rollup over ``pack_batches`` output: clip count, total /
    max duration, fill rate, and the padding-waste fraction the bucketing
    bounds (padded cost = n_clips * max_dur; waste = 1 - total/padded).
    One hash aggregate — use it to audit bucket-edge choices."""
    budget_ms = float(budget_s) * 1000.0
    return (
        assignments.groupBy("shard", "dur_bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum("dur_ms").alias("total_dur_ms"),
            F.max("dur_ms").alias("max_dur_ms"),
        )
        .withColumn("fill_rate", F.round(F.col("total_dur_ms") / budget_ms, 6))
        .withColumn(
            "padding_waste",
            F.round(
                1.0
                - F.col("total_dur_ms")
                / (F.col("n_clips") * F.col("max_dur_ms")),
                6,
            ),
        )
    )
