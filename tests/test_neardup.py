"""Near-dup pipeline tests: LSH candidate recall vs the exact all-pairs truth
(VERDICT round-1 item 4) and soundness of the composed verify stage."""

import os

from real_time_anomaly_detection_spark.queries import (
    q26_ngram_jaccard,
    q29_minhash_lsh,
    q34_neardup_lsh_verified,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _pairs(pdf):
    return set(zip(pdf.doc_a, pdf.doc_b))


def test_lsh_recall_against_exact_truth(spark):
    """q34 (LSH candidates -> exact verify) must recover >= 90% of the true
    Jaccard>=0.5 pairs that the all-pairs oracle twin (q26) finds. With 4
    bands of 2 hashes, a pair at similarity s is a candidate with prob
    1-(1-s^2)^4 (0.68 at s=0.5, 0.9987 at s=0.9); this corpus's near-dups sit
    high enough that measured recall is ~0.93 — deterministic (fixed hash
    constants), so the bound is stable, not flaky."""
    truth = _pairs(q26_ngram_jaccard(spark, SF_DIR).toPandas())
    got = _pairs(q34_neardup_lsh_verified(spark, SF_DIR).toPandas())
    assert len(truth) > 0
    recall = len(got & truth) / len(truth)
    assert recall >= 0.90, f"recall {recall:.3f}"


def test_verified_pairs_are_sound(spark):
    """Every composed-pipeline pair is a true Jaccard>=0.5 pair (verification
    makes the pipeline sound; LSH only costs recall, never precision)."""
    truth = _pairs(q26_ngram_jaccard(spark, SF_DIR).toPandas())
    got = _pairs(q34_neardup_lsh_verified(spark, SF_DIR).toPandas())
    assert got <= truth


def test_verified_is_subset_of_candidates(spark):
    cands = _pairs(q29_minhash_lsh(spark, SF_DIR).toPandas())
    got = _pairs(q34_neardup_lsh_verified(spark, SF_DIR).toPandas())
    assert got <= cands
