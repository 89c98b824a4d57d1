"""Ingest-partition overlap triage: MinHash resemblance between partitions'
CONTENT — which capture batches / ingest shards largely duplicate each other
(a re-uploaded session, a replayed feed, an overlapping crawl window) —
answered BEFORE any clip-level dedup is paid. The corpus-composition
decision (drop / quarantine a whole batch vs per-clip dedup) is the audio
analog of q70's source-overlap table for documents.

Recasts the reference's peer-baseline comparison (spatial trend
verification, anomaly_detector.py:317-373) at the ingest-batch level.

Spark shape for 10^12 clips: the clip's contact is ONE map-side sha2 digest
(the content_dedup convention — reuses the PCM pass's digest column when the
audio family is on, so `bytes` is read zero extra times); a partition's
signature is `n_hashes` MIN-aggregates over 60-bit digest prefixes — map-side
combinable and MERGEABLE across shards and epochs (a running signature per
partition can be maintained incrementally; min is idempotent), so the
Exchange carries n_partitions x n_hashes longs. The pairwise table is
O(P^2) on the metadata-scale signature relation — at web scale P = ingest
batches, so a deployment thresholds the output; the signatures stay linear.

Estimator: est_jaccard = matching-lane fraction, the unbiased MinHash
estimate of J(content(A), content(B)) over DISTINCT clip digests;
stderr ~ sqrt(J(1-J)/n_hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .content_dedup import content_fingerprints

# q29's universal-hash family over 60-bit md5-style values (the first 8
# (a, b) pairs are the oracle-pinned constants there; this module extends
# with the same seeded LCG so signatures stay deterministic).
_P = 1_000_000_007
_A0 = (472882049, 741103597, 284886941, 856201099)
_B0 = (86028157, 553105253, 15485867, 32452843)


def _constants(n: int) -> list[tuple[int, int]]:
    pairs = list(zip(_A0, _B0))
    s = 0x51AB1E5EED
    while len(pairs) < n:
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = s % (_P - 1) + 1
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        pairs.append((a, s % _P))
    return pairs[:n]


def partition_signatures(
    clips: DataFrame, n_hashes: int = 16, fp: DataFrame | None = None
) -> DataFrame:
    """(part_id, m0..m{n-1}): per-partition MinHash signature over the
    partition's distinct clip-content digests. `fp`: optionally pass
    precomputed (part_id, clip_id, content_hash) fingerprints — e.g. the
    digest column the PCM pass emits — so `bytes` is never re-scanned."""
    if fp is None:
        fp = content_fingerprints(clips)
    # top-60-bits of the digest as a long (the engine's portable-hash form)
    h = F.conv(F.substring("content_hash", 1, 15), 16, 10).cast("long")
    rows = fp.select("part_id", h.alias("h"))
    return rows.groupBy("part_id").agg(
        *[
            F.min(((F.col("h") % _P) * a + b) % _P).alias(f"m{i}")
            for i, (a, b) in enumerate(_constants(n_hashes))
        ]
    )


def partition_overlap(
    clips: DataFrame,
    n_hashes: int = 16,
    min_est: float = 0.0,
    fp: DataFrame | None = None,
    sig: DataFrame | None = None,
) -> DataFrame:
    """(part_a, part_b, n_matching_lanes, est_jaccard) for partition pairs
    with est_jaccard >= `min_est` (0.0 = full matrix; set a floor at scale
    so the O(P^2) output stays triage-sized). ``sig``: optionally pass an
    already-materialized `partition_signatures` relation (e.g. the one the
    CLI just wrote) so the payload column is not re-scanned (r6 ADVICE:
    the CLI previously paid the bytes scan twice)."""
    if sig is None:
        sig = partition_signatures(clips, n_hashes=n_hashes, fp=fp)
    a, b = sig.alias("a"), sig.alias("b")
    matches = sum(
        F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
        for i in range(n_hashes)
    )
    out = a.join(b, F.col("a.part_id") < F.col("b.part_id")).select(
        F.col("a.part_id").alias("part_a"),
        F.col("b.part_id").alias("part_b"),
        matches.cast("long").alias("n_matching_lanes"),
        F.round(matches / F.lit(float(n_hashes)), 6).alias("est_jaccard"),
    )
    if min_est > 0.0:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out
