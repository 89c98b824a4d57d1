"""Tracked-persist registry (ADVICE r5): builders that persist
multi-referenced intermediates register them, and release_cached()
actually unpersists them — so long-lived sessions (bench envelopes,
parity suite, notebooks) don't accumulate cached relations."""

from pyspark.storagelevel import StorageLevel

from real_time_anomaly_detection_spark import caching
from real_time_anomaly_detection_spark.queries import (
    q29_minhash_lsh,
    q40_simhash_hamming,
)


def test_builders_register_and_release_drains(spark, sf_dir):
    caching.release_cached()
    assert caching.tracked_count() == 0

    q40_simhash_hamming(spark, sf_dir).count()
    assert caching.tracked_count() == 1, "q40 should track its simhash persist"
    tracked = list(caching._CACHED)
    assert tracked[0].storageLevel != StorageLevel.NONE

    q29_minhash_lsh(spark, sf_dir).count()
    assert caching.tracked_count() == 2, "q29 should track its bands persist"

    released = caching.release_cached()
    assert released == 2
    assert caching.tracked_count() == 0
    # the relation is genuinely uncached, not just forgotten
    assert tracked[0].storageLevel == StorageLevel.NONE


def test_release_cached_idempotent_and_safe(spark, sf_dir):
    assert caching.release_cached() == 0  # empty registry is a no-op
    q40_simhash_hamming(spark, sf_dir).count()
    assert caching.release_cached() == 1
    assert caching.release_cached() == 0
