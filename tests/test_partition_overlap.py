"""Partition-overlap triage goldens: planted duplicated / half-shared /
disjoint ingest partitions, estimator accuracy vs exact digest-set Jaccard,
the mergeable-signature property the incremental story rests on, the
precomputed-fingerprint path, and the bytes-never-shuffle plan pin."""

import pyspark.sql.functions as F
import pytest

from real_time_anomaly_detection_spark.operators.content_dedup import (
    content_fingerprints,
)
from real_time_anomaly_detection_spark.operators.partition_overlap import (
    partition_overlap,
    partition_signatures,
)


@pytest.fixture(scope="module")
def clips(spark):
    """Four partitions of 40 one-payload-per-clip rows:
    p0 / p1 IDENTICAL content (a re-ingested batch), p2 shares exactly half
    of p0's payloads, p3 disjoint. Payload bytes are tiny distinct blobs —
    content identity is all that matters here."""
    rows = []

    def blob(i: int) -> bytes:
        return b"payload-%06d" % i

    for j in range(40):
        rows.append((f"c0_{j}", 0, blob(j)))
        rows.append((f"c1_{j}", 1, blob(j)))           # identical content
        rows.append((f"c2_{j}", 2, blob(j if j < 20 else 1000 + j)))
        rows.append((f"c3_{j}", 3, blob(2000 + j)))    # disjoint
    return spark.createDataFrame(
        rows, "clip_id string, part_id int, bytes binary"
    )


def _pairs(df):
    return {
        (int(r.part_a), int(r.part_b)): float(r.est_jaccard)
        for r in df.collect()
    }


def test_planted_goldens(spark, clips):
    got = _pairs(partition_overlap(clips, n_hashes=64))
    assert got[(0, 1)] == 1.0          # re-ingested batch: every lane agrees
    assert got[(0, 3)] == 0.0 and got[(1, 3)] == 0.0 and got[(2, 3)] == 0.0
    # p0 ∩ p2 = 20 of 60 distinct payloads -> J = 1/3; 64 lanes, 4 sigma
    assert abs(got[(0, 2)] - 1 / 3) <= 4 * (1 / 3 * 2 / 3 / 64) ** 0.5
    assert got[(0, 2)] == got[(1, 2)]  # identical partitions, identical row


def test_min_est_floor(spark, clips):
    got = _pairs(partition_overlap(clips, n_hashes=64, min_est=0.9))
    assert set(got) == {(0, 1)}


def test_signatures_merge(spark, clips):
    """A partition's signature over the full batch equals the element-wise
    MIN of signatures computed over any split of it — the property that
    makes per-epoch incremental maintenance sound."""
    full = partition_signatures(clips, n_hashes=16).filter("part_id = 0")
    half_a = clips.filter("part_id = 0").limit(25)
    half_b = clips.filter("part_id = 0").subtract(half_a)
    sa = partition_signatures(half_a, n_hashes=16).collect()[0]
    sb = partition_signatures(half_b, n_hashes=16).collect()[0]
    merged = [min(sa[f"m{i}"], sb[f"m{i}"]) for i in range(16)]
    whole = full.collect()[0]
    assert merged == [whole[f"m{i}"] for i in range(16)]


def test_precomputed_fp_path(spark, clips):
    fp = content_fingerprints(clips)
    direct = _pairs(partition_overlap(clips, n_hashes=32))
    via_fp = _pairs(partition_overlap(clips, n_hashes=32, fp=fp))
    assert direct == via_fp


def test_bytes_never_shuffle(spark, clips):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        node = (
            partition_overlap(clips, n_hashes=16)
            ._jdf.queryExecution()
            .executedPlan()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    def walk(n, out):
        if "Exchange" in n.nodeName():
            out.append((n.nodeName(), n.child().output().mkString(",")))
        for i in range(n.children().size()):
            walk(n.children().apply(i), out)

    exchanges = []
    walk(node, exchanges)
    assert exchanges, "expected the signature agg shuffle"
    for name, cols in exchanges:
        assert "bytes" not in cols, f"{name} shuffles the payload: {cols}"
