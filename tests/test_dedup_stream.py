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


def test_audio_stream_dedup_matches_batch(spark, tmp_path):
    """Audio modality: streamed pairs equal the batch audio_fingerprint
    pipeline's on the unioned clips corpus — cross-batch perceptual dups
    (gain change, μ-law re-encode) found at ingest, similarity = the batch
    Hamming recast as 1 - h/128, undecodable rows dropped pair-free, and
    the fixed 8x16-bit geometry guarded (threshold floor + band_kwargs +
    cross-modality marker all raise)."""
    import numpy as np
    import pytest

    from real_time_anomaly_detection_spark.audio import codecs
    from real_time_anomaly_detection_spark.operators import audio_fingerprint as AFP

    sr = 16000
    t = np.arange(sr) / sr

    def tone(fs, amps):
        return sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(fs, amps))

    x = tone((440, 1300, 2500), (1.0, 0.5, 0.25))
    y = tone((700, 2100), (1.0, 0.4))
    z = tone((300, 900, 3300), (0.8, 0.6, 0.3))
    b1 = [
        ("c1", codecs.pcm16_encode(x), sr, "pcm16"),
        ("c2", codecs.pcm16_encode(0.5 * x), sr, "pcm16"),  # within-batch dup
        ("c3", codecs.pcm16_encode(y), sr, "pcm16"),
    ]
    b2 = [
        ("c10", codecs.ulaw_encode(0.8 * x), sr, "ulaw"),   # cross-batch dup
        ("c11", codecs.pcm16_encode(z), sr, "pcm16"),
        ("bad", b"\x01", sr, "nosuchcodec"),                # undecodable
    ]
    src = str(tmp_path / "as_src")
    out = str(tmp_path / "as_out")
    ckpt = str(tmp_path / "as_ckpt")
    for rows in (b1, b2):
        spark.createDataFrame(rows, dedup_stream.CLIPS_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        q = dedup_stream.stream_dedup(spark, src, ckpt, out, modality="audio")
        q.awaitTermination()
    got = spark.read.parquet(os.path.join(out, "pairs"))
    got_pdf = got.toPandas()
    got_pairs = _norm(got_pdf)

    all_clips = spark.createDataFrame(
        [(0, *r) for r in b1 + b2],
        "part_id int, clip_id string, bytes binary, sr_hz long, codec string",
    )
    truth = AFP.neardup_pairs(AFP.fingerprints(all_clips)).toPandas()
    assert got_pairs == {
        frozenset((a, b)) for a, b in zip(truth.clip_a, truth.clip_b)}
    assert frozenset(("c1", "c2")) in got_pairs    # within-batch
    assert frozenset(("c1", "c10")) in got_pairs   # cross-batch, re-encoded
    assert not any("bad" in p for p in got_pairs)
    assert not any("c3" in p or "c11" in p for p in got_pairs)
    # similarity is the batch Hamming recast: 1 - h/128, 6-dp rounded
    tv = {frozenset((a, b)): h
          for a, b, h in zip(truth.clip_a, truth.clip_b, truth.hamming)}
    for a, b, s in zip(got_pdf.doc_a, got_pdf.doc_b, got_pdf.similarity):
        assert s == round(1.0 - tv[frozenset((a, b))] / 128.0, 6)
    # cross-batch pair attributed to the arrival epoch
    e1 = got.filter(F.col("epoch_id") == 1).toPandas()
    assert frozenset(("c1", "c10")) in _norm(e1)

    # redrain without new files: no-op
    before = got.count()
    dedup_stream.stream_dedup(spark, src, ckpt, out,
                              modality="audio").awaitTermination()
    assert spark.read.parquet(os.path.join(out, "pairs")).count() == before

    # guards: threshold past the pigeonhole bound; caller-supplied geometry;
    # a different modality against this store's marker
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup_stream.stream_dedup(spark, src, ckpt, out, modality="audio",
                                  threshold=0.9)
    with pytest.raises(ValueError, match="fixed by the fingerprint"):
        dedup_stream.stream_dedup(spark, src, ckpt, out, modality="audio",
                                  band_kwargs={"n_bands": 4})
    with pytest.raises(ValueError, match="store-layout parameters differ"):
        dedup_stream.stream_dedup(spark, src, ckpt, out, modality="text")


def test_reingested_doc_id_does_not_self_pair(spark, tmp_path):
    """A document re-sent in a later batch (same doc_id, same text) must not
    emit a (x, x, 1.0) self-pair from the cross-batch join."""
    b1 = _docs(BATCH1)
    b2 = _docs([BATCH1[0]])  # doc 1 arrives again
    src, out, ckpt = _drain(spark, tmp_path, [b1, b2])
    got = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
    assert not (got.doc_a == got.doc_b).any()


def test_half_written_store_does_not_wedge(spark, tmp_path):
    """ADVICE r3 (re-simulated accurately for r4 #7 lineage): a crash
    between the two store writes of the FIRST epoch leaves payload_store on
    disk, bands_store absent, and neither a snapshot record nor a
    checkpoint commit (both are written after the bands write). On the
    next drain the epoch REPLAYS: the cross-batch branch is gated on BOTH
    stores existing, so the replayed epoch runs the within-batch-only path
    instead of wedging on a read of the missing store, heals the stores,
    and the following epoch finds its cross-batch pairs — final pairs
    equal the crash-free run and the lineage gate passes."""
    import shutil

    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1)])
    # accurate mid-epoch-0 crash: bands write, snapshot append, and
    # checkpoint commit all never happened
    shutil.rmtree(os.path.join(out, "bands_store"))
    os.remove(os.path.join(out, dedup_stream.SNAPSHOT_DIR, "epoch_0.json"))
    os.remove(os.path.join(ckpt, "commits", "0"))
    crc = os.path.join(ckpt, "commits", ".0.crc")
    if os.path.exists(crc):
        os.remove(crc)

    # replay of epoch 0 must complete (no exception) on the degraded
    # within-batch-only path and heal the stores; epoch 1 then runs normally
    spark.createDataFrame(_docs(BATCH2)).coalesce(1).write.mode("append").parquet(src)
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    got = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert frozenset((1, 2)) in got    # replayed within-batch pair intact
    assert frozenset((1, 10)) in got   # epoch 1 cross-batch pair found
    assert frozenset((3, 11)) in got
    assert dedup_stream.verify_store_lineage(out, ckpt)["epochs"] == [0, 1]

    # healed stores serve later epochs too
    spark.createDataFrame(_docs([(20, BATCH2[0][1])])).coalesce(1) \
        .write.mode("append").parquet(src)
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    got = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert frozenset((10, 20)) in got


def test_reingest_changed_content_uses_latest_payload(spark, tmp_path):
    """ADVICE r3: a doc_id re-ingested with CHANGED content must be matched
    on its NEWEST payload — the keep-latest window on the payload store. The
    old content's stale bands may still generate candidates, but verify
    computes similarity against the new payload, so pairs that only match the
    OLD content are filtered out."""
    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight"
    b1 = _docs([(1, text_a), (2, "unrelated filler vocabulary entirely")])
    b2 = _docs([(1, text_b)])                            # doc 1 changes content
    b3 = _docs([(30, "one two three four five six seven nine"),   # dup of NEW
                (31, "alpha beta gamma delta epsilon zeta eta iota")])  # dup of OLD
    src, out, ckpt = _drain(spark, tmp_path, [b1, b2, b3])
    got = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
    pairs = _norm(got)
    assert frozenset((1, 30)) in pairs      # matches the new content
    assert frozenset((1, 31)) not in pairs  # old content no longer matchable

    # similarity equals the batch pipeline's on the CURRENT corpus state
    all_dir = str(tmp_path / "cur")
    spark.createDataFrame(_docs([(1, text_b), (30, b3.text[0])])).write.parquet(
        os.path.join(all_dir, "documents.parquet"))
    truth = q34_neardup_lsh_verified(spark, all_dir).toPandas()
    tv = {frozenset((a, b)): j for a, b, j in zip(truth.doc_a, truth.doc_b, truth.jaccard)}
    sim = {frozenset((a, b)): s for a, b, s in zip(got.doc_a, got.doc_b, got.similarity)}
    assert sim[frozenset((1, 30))] == tv[frozenset((1, 30))]


def test_stream_bucket_cap_drops_mega_bucket_only(spark, tmp_path):
    """VERDICT r3 #2: the cap knob on the STREAMING joins (within-batch and
    cross-batch). A mega-bucket of identical docs spanning both the store and
    the batch is dropped; a genuine cross-batch near-dup pair outside it
    survives."""
    mega1 = [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)]
    mega2 = [(50 + i, "alpha beta gamma delta epsilon zeta") for i in range(15)]
    b1 = _docs(mega1 + [(100, "oak elm birch maple one")])
    b2 = _docs(mega2 + [(101, "oak elm birch maple two")])

    src = str(tmp_path / "cap_src")
    out = str(tmp_path / "cap_out")
    ckpt = str(tmp_path / "cap_ckpt")
    for pdf in (b1, b2):
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        q = dedup_stream.stream_dedup(spark, src, ckpt, out, max_bucket_size=10)
        q.awaitTermination()
    pairs = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    mega_ids = {i for i, _ in mega1} | {i for i, _ in mega2}
    assert frozenset((100, 101)) in pairs             # real pair survives the cap
    assert not any(p & mega_ids for p in pairs)       # mega-bucket fully dropped


def test_store_layout_is_bucket_partitioned(spark, tmp_path):
    """The state stores must be written bucket-partitioned (epoch_id=N/
    sbucket=K and epoch_id=N/pbucket=K dirs) — the layout the per-epoch
    IN-filter pruning depends on."""
    import glob

    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1)])
    assert glob.glob(os.path.join(out, "bands_store", "epoch_id=0", "sbucket=*"))
    assert glob.glob(os.path.join(out, "payload_store", "epoch_id=0", "pbucket=*"))


def test_checkpoint_replay_of_partial_epoch_is_exact(spark, tmp_path):
    """VERDICT r3 #8 (stretch): kill/restart consistency via checkpoint
    replay. Simulate a crash DURING epoch 1's state writes: pairs/epoch_id=1
    and payload_store/epoch_id=1 are on disk, bands_store/epoch_id=1 is not,
    and the checkpoint commit marker for batch 1 was never written. On
    restart, Structured Streaming replays batch 1 from its recorded offsets
    under the SAME epoch_id; overwrite-own-epoch state writes plus the
    epoch_id < current filter on store reads must converge to exactly the
    crash-free result — no pair lost, none duplicated, stores healed."""
    import shutil

    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1), _docs(BATCH2)])
    before = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
    assert len(before) > 0

    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")  # local-FS checksum sidecar
    if os.path.exists(crc):
        os.remove(crc)
    shutil.rmtree(os.path.join(out, "bands_store", "epoch_id=1"))
    # the store snapshot is written AFTER the bands write, so a crash
    # mid-epoch-1 means its lineage record was never appended either (r5)
    os.remove(os.path.join(out, dedup_stream.SNAPSHOT_DIR, "epoch_1.json"))

    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    after = spark.read.parquet(os.path.join(out, "pairs")).toPandas()
    assert _norm(after) == _norm(before)
    assert len(after) == len(before)  # replay did not duplicate pair rows
    assert os.path.isdir(os.path.join(out, "bands_store", "epoch_id=1"))


def test_embedding_stream_threshold_matched_banding(spark, tmp_path):
    """Round 4: `band_kwargs` threads the threshold-matched banding (q42's
    scale configuration) into the streaming embedding dedup. On a clustered
    corpus with planted cosine~0.997 duplicates split across two batches,
    the 6x12-plane stream at threshold 0.9 finds exactly the planted pairs —
    including the cross-batch ones — matching batch
    q42(n_bands=6, planes_per_band=12, threshold=0.9) on the union."""
    import numpy as np
    import pandas as pd

    from real_time_anomaly_detection_spark.queries import q42_embedding_neardup_lsh

    rng = np.random.RandomState(3)
    n, dim = 400, 64
    x = rng.normal(size=(n, dim))
    x += (rng.normal(size=(10, dim)) * 0.5)[np.arange(n) % 10]
    for p in range(10):
        x[2 * p + 1] = x[2 * p] + rng.normal(size=dim) * 0.01
    rows = [{"doc_id": i, "embedding": [float(v) for v in x[i]]} for i in range(n)]
    # split so 5 planted pairs straddle the batch boundary
    b1, b2 = rows[:15] + rows[20:210], rows[15:20] + rows[210:]

    src = str(tmp_path / "es_src")
    out = str(tmp_path / "es_out")
    ckpt = str(tmp_path / "es_ckpt")
    kw = dict(n_bands=6, planes_per_band=12)
    for pdf in (b1, b2):
        spark.createDataFrame(pd.DataFrame(pdf), "doc_id long, embedding array<float>") \
            .coalesce(1).write.mode("append").parquet(src)
        q = dedup_stream.stream_dedup(
            spark, src, ckpt, out, modality="embedding",
            threshold=0.9, band_kwargs=kw,
        )
        q.awaitTermination()

    got = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    planted = {frozenset((2 * p, 2 * p + 1)) for p in range(10)}
    assert got == planted

    all_dir = str(tmp_path / "all")
    allp = pd.DataFrame(rows).rename(columns={"doc_id": "vec_id"})
    spark.createDataFrame(allp, "vec_id long, embedding array<float>").write.parquet(
        os.path.join(all_dir, "embeddings.parquet"))
    truth = q42_embedding_neardup_lsh(
        spark, all_dir, n_bands=6, planes_per_band=12, threshold=0.9
    ).toPandas()
    assert got == _norm(truth.rename(columns={"vec_a": "doc_a", "vec_b": "doc_b"}))


def test_store_meta_pins_layout_parameters(spark, tmp_path):
    """ADVICE r4 (medium): store_buckets (and band geometry / modality) are
    baked into the accumulated store layout; a later invocation with a
    different value must raise, not silently drop cross-batch pairs."""
    import pytest

    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1)])
    assert os.path.exists(os.path.join(out, dedup_stream.STORE_META_FILE))

    # same parameters: fine (the normal resume path)
    spark.createDataFrame(_docs(BATCH2)).coalesce(1).write.mode("append").parquet(src)
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()

    # different store_buckets against the same store: hard error
    with pytest.raises(ValueError, match="store-layout parameters differ"):
        dedup_stream.stream_dedup(spark, src, ckpt, out, store_buckets=8)
    # different modality against the same store: hard error
    with pytest.raises(ValueError, match="store-layout parameters differ"):
        dedup_stream.stream_dedup(spark, src, ckpt, out, modality="embedding")


def test_markerless_populated_store_raises(spark, tmp_path):
    """ADVICE r5 (medium): a store with committed epochs but NO
    store_meta.json (built by pre-marker code) must not silently adopt the
    currently-resolved geometry — the resolved defaults may differ from
    whatever built the store, which is the cross-batch-pair-dropping
    failure the marker exists to prevent. Backfilling the legacy meta (or a
    fresh out_dir) is the documented unblock."""
    import pytest

    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1)])
    meta_path = os.path.join(out, dedup_stream.STORE_META_FILE)
    stored = open(meta_path).read()
    os.remove(meta_path)  # simulate a pre-marker store

    spark.createDataFrame(_docs(BATCH2)).coalesce(1).write.mode("append").parquet(src)
    with pytest.raises(ValueError, match="predates the layout marker"):
        dedup_stream.stream_dedup(spark, src, ckpt, out)

    # backfilling the legacy meta unblocks the resume
    with open(meta_path, "w") as f:
        f.write(stored)
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()


def test_trained_planes_beat_fixed_at_equal_bands(spark, tmp_path):
    """VERDICT r4 #6: covariance-matched planes trained on the first epoch's
    bounded sample must recover MORE planted cross/within-batch pairs than
    the fixed LCG planes at the SAME (tight) band geometry, on a clustered
    corpus whose planted pairs sit at cosine ~0.987. Also pins plane
    persistence: planes.json is written on epoch 0 and reloaded on epoch 1,
    so every band row in the store used identical planes."""
    import numpy as np
    import pandas as pd

    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    rng = np.random.RandomState(3)
    n, dim = 400, 64
    x = rng.normal(size=(n, dim))
    x += (rng.normal(size=(10, dim)) * 0.5)[np.arange(n) % 10]
    for p in range(20):
        x[2 * p + 1] = x[2 * p] + rng.normal(size=dim) * 0.18
    xn = unit(x)
    rows = [{"doc_id": i, "embedding": [float(v) for v in xn[i]]} for i in range(n)]
    b1, b2 = rows[:300], rows[300:]
    planted = {frozenset((2 * p, 2 * p + 1)) for p in range(20)}
    kw = dict(n_bands=2, planes_per_band=16)

    def run(root, train):
        src, out, ckpt = (str(tmp_path / f"{root}_{d}") for d in ("src", "out", "ck"))
        for pdf in (b1, b2):
            spark.createDataFrame(pd.DataFrame(pdf),
                                  "doc_id long, embedding array<float>") \
                .coalesce(1).write.mode("append").parquet(src)
            q = dedup_stream.stream_dedup(
                spark, src, ckpt, out, modality="embedding",
                threshold=0.9, band_kwargs=kw, train_planes=train,
            )
            q.awaitTermination()
        got = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
        return got, out

    fixed_pairs, _ = run("fx", False)
    trained_pairs, tout = run("tr", True)
    assert os.path.exists(os.path.join(tout, dedup_stream.PLANES_FILE))
    # precision stays exact (every pair verified at cosine >= 0.9)
    assert fixed_pairs <= planted and trained_pairs <= planted
    assert len(trained_pairs) > len(fixed_pairs), (
        f"trained {len(trained_pairs)} <= fixed {len(fixed_pairs)}")
    # mismatched train_planes flag against an existing store is a hard error
    import pytest

    with pytest.raises(ValueError, match="store-layout parameters differ"):
        dedup_stream.stream_dedup(
            spark, str(tmp_path / "tr_src"), str(tmp_path / "tr_ck"), tout,
            modality="embedding", threshold=0.9, band_kwargs=kw,
            train_planes=False,
        )


def test_store_lineage_detects_mismatch_and_loss(spark, tmp_path):
    """VERDICT r4 #7: restart consistency comes from snapshot-diff lineage,
    not directory trust. After a clean 2-epoch run: (a) lineage lists both
    epochs and agrees with the checkpoint; (b) a FRESH checkpoint pointed
    at the old store fails at stream start (the restarted stream would
    renumber epochs and overwrite early store state); (c) a committed
    epoch's pairs output going missing fails; (d) the legitimate
    partial-epoch replay state (commit marker gone, snapshot gone, store
    dir gone) still passes the gate and heals."""
    import shutil

    import pytest

    src, out, ckpt = _drain(spark, tmp_path, [_docs(BATCH1), _docs(BATCH2)])

    info = dedup_stream.verify_store_lineage(out, ckpt)
    assert info["epochs"] == [0, 1]
    assert info["checkpoint_commits"] == [0, 1]
    snaps = dedup_stream.store_snapshots(out)
    assert [s["epoch_id"] for s in snaps] == [0, 1]
    assert all(s["n_docs"] == 3 for s in snaps)

    # (b) fresh checkpoint + old store: hard error before any batch runs
    with pytest.raises(ValueError, match="beyond the checkpoint"):
        dedup_stream.stream_dedup(spark, src, str(tmp_path / "fresh_ck"), out)

    # (c) committed pairs output lost after commit
    shutil.move(os.path.join(out, "pairs", "epoch_id=1"),
                str(tmp_path / "stash"))
    with pytest.raises(ValueError, match="missing from pairs"):
        dedup_stream.verify_store_lineage(out, ckpt)
    shutil.move(str(tmp_path / "stash"), os.path.join(out, "pairs", "epoch_id=1"))

    # (d) the replay state is legal: commit 1 + snapshot 1 + bands epoch 1
    # all gone together (crash before the lineage append)
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    shutil.rmtree(os.path.join(out, "bands_store", "epoch_id=1"))
    os.remove(os.path.join(out, dedup_stream.SNAPSHOT_DIR, "epoch_1.json"))
    before = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    after = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert after == before
    assert dedup_stream.verify_store_lineage(out, ckpt)["epochs"] == [0, 1]


def test_dedup_apply_over_streamed_pairs(spark, tmp_path):
    """End-to-end contract between the two CLIs: dedup-apply consumes
    stream-dedup's pairs root AS WRITTEN (column names, epoch partitioning)
    and produces the transitively-deduplicated survivor corpus. With pairs
    (1,2),(1,10),(2,10),(3,11): clusters {1,2,10}->1 and {3,11}->3 survive
    via keepers; 12 (no pair) survives untouched."""
    from real_time_anomaly_detection_spark import cli

    src, out, _ = _drain(spark, tmp_path, [_docs(BATCH1), _docs(BATCH2)])
    docs = str(tmp_path / "all_docs")
    spark.createDataFrame(_docs(BATCH1 + BATCH2)).write.parquet(docs)

    applied = str(tmp_path / "applied")
    cli.main(["dedup-apply", "--pairs", os.path.join(out, "pairs"),
              "--docs", docs, "--out", applied])

    survivors = sorted(
        r.doc_id
        for r in spark.read.parquet(os.path.join(applied, "survivors")).collect()
    )
    assert survivors == [1, 3, 12]


def test_audio_stream_duration_valve(spark, tmp_path):
    """The stream's fused duration buckets match the batch join's valve:
    a stationary mixture at 1s vs 7s has an IDENTICAL fingerprint (band
    fractions are duration-invariant) but must NOT pair — far-apart
    durations are never whole-clip dups — while 1.9s vs 2.1s (adjacent
    duration buckets at the 2s band) MUST pair via the probe-side +-1
    explode, including across batches through the store. The marker pins
    duration_band_s."""
    import json

    import numpy as np

    from real_time_anomaly_detection_spark.audio import codecs

    sr = 16000

    def mix(dur_s):
        t = np.arange(int(dur_s * sr)) / sr
        return np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1300 * t)

    b1 = [
        ("s1", codecs.pcm16_encode(mix(1.0)), sr, "pcm16"),
        ("e19", codecs.pcm16_encode(mix(1.9)), sr, "pcm16"),
    ]
    b2 = [
        ("s7", codecs.pcm16_encode(mix(7.0)), sr, "pcm16"),       # same fp as s1
        ("e21", codecs.pcm16_encode(0.5 * mix(2.1)), sr, "pcm16"),  # boundary dup
    ]
    src = str(tmp_path / "dv_src")
    out = str(tmp_path / "dv_out")
    ckpt = str(tmp_path / "dv_ckpt")
    for rows in (b1, b2):
        spark.createDataFrame(rows, dedup_stream.CLIPS_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(src)
        dedup_stream.stream_dedup(spark, src, ckpt, out,
                                  modality="audio").awaitTermination()
    got = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert frozenset(("e19", "e21")) in got   # cross-batch, adjacent buckets
    assert not any("s1" in p and "s7" in p for p in got)  # valve blocks
    meta = json.load(open(os.path.join(out, "store_meta.json")))
    assert meta["banding"]["duration_band_s"] == 2.0


def test_dedup_apply_over_audio_stream_pairs(spark, tmp_path):
    """The audio stream's pairs root (string clip_ids) composes with
    dedup-apply via --id-col: the clips corpus is deduplicated to one
    keeper per perceptual-duplicate cluster, original schema preserved."""
    import numpy as np

    from real_time_anomaly_detection_spark import cli
    from real_time_anomaly_detection_spark.audio import codecs

    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1300 * t)
    y = np.sin(2 * np.pi * 700 * t) + 0.4 * np.sin(2 * np.pi * 2100 * t)
    rows = [
        ("c1", codecs.pcm16_encode(x), sr, "pcm16"),
        ("c2", codecs.pcm16_encode(0.5 * x), sr, "pcm16"),
        ("c3", codecs.ulaw_encode(0.8 * x), sr, "ulaw"),
        ("k1", codecs.pcm16_encode(y), sr, "pcm16"),
    ]
    src = str(tmp_path / "da_src")
    out = str(tmp_path / "da_out")
    ckpt = str(tmp_path / "da_ckpt")
    spark.createDataFrame(rows, dedup_stream.CLIPS_SCHEMA) \
        .coalesce(1).write.parquet(src)
    dedup_stream.stream_dedup(spark, src, ckpt, out,
                              modality="audio").awaitTermination()

    applied = str(tmp_path / "da_applied")
    cli.main(["dedup-apply", "--pairs", os.path.join(out, "pairs"),
              "--docs", src, "--id-col", "clip_id", "--out", applied])
    survivors = spark.read.parquet(os.path.join(applied, "survivors"))
    assert sorted(r.clip_id for r in survivors.collect()) == ["c1", "k1"]
    assert survivors.columns[0] == "clip_id"  # original schema preserved


def test_cluster_update_incremental_over_streamed_pairs(spark, tmp_path):
    """VERDICT r5 #2 E2E: cluster-update folds stream-dedup's pairs root
    incrementally (one call per ingest epoch, reusing the persisted star
    forest) and the final labels equal batch connected_components over ALL
    accumulated pairs. Driven through the CLI so the spark-submit surface
    is the thing tested."""
    import json as _json

    from real_time_anomaly_detection_spark import cli
    from real_time_anomaly_detection_spark.operators.components import (
        connected_components,
    )
    from real_time_anomaly_detection_spark.streaming import clusters as C

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    clroot = str(tmp_path / "cl")

    for i, batch in enumerate([BATCH1, BATCH2]):
        spark.createDataFrame(_docs(batch)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = dedup_stream.stream_dedup(spark, src, ckpt, out)
        q.awaitTermination()
        cli.main(["cluster-update", "--pairs", os.path.join(out, "pairs"),
                  "--out", clroot])
        head = _json.load(open(os.path.join(clroot, C.HEAD_FILE)))
        assert head["head"] == i

    got = {r.doc_id: r.label
           for r in C.head_labels(spark, clroot).collect()}
    batch_labels = connected_components(
        spark.read.parquet(os.path.join(out, "pairs")).select("doc_a", "doc_b")
    )
    assert got == {r.doc_id: r.label for r in batch_labels.collect()}
    # the cross-batch merges landed: {1,2,10} -> 1, {3,11} -> 3
    assert got[10] == 1 and got[2] == 1 and got[11] == 3


def test_compaction_preserves_pairs_lineage_and_shrinks_files(spark, tmp_path):
    """VERDICT r5 #3: compact after two epochs, then keep streaming — the
    compacted run's pair output (including the post-compaction epoch's
    cross-batch pairs) equals an uncompacted twin's, the lineage gate still
    passes, the store collapses to one epoch dir with fewer files, and a
    redrain stays a no-op."""
    import pytest

    B3 = _docs([(20, BATCH2[0][1]),                       # dup of 10/1/2
                (21, "unrelated fresh tokens apple pear plum quince fig")])

    # twin A: never compacted
    (tmp_path / "A").mkdir()
    srcA, outA, ckptA = _drain(spark, tmp_path / "A",
                               [_docs(BATCH1), _docs(BATCH2), B3])
    want = _norm(spark.read.parquet(os.path.join(outA, "pairs")).toPandas())

    # twin B: compact between epoch 1 and epoch 2
    (tmp_path / "B").mkdir()
    src, out, ckpt = _drain(spark, tmp_path / "B",
                            [_docs(BATCH1), _docs(BATCH2)])
    r = dedup_stream.compact_store(spark, out, ckpt)
    assert r["compacted_through"] == 1
    assert r["files_after"] < r["files_before"]
    assert dedup_stream._epoch_dirs(os.path.join(out, "bands_store")) == {1}
    assert dedup_stream._epoch_dirs(os.path.join(out, "payload_store")) == {1}
    assert dedup_stream.verify_store_lineage(out, ckpt)["epochs"] == [0, 1]

    # redrain with no new files: still a no-op after compaction
    before = spark.read.parquet(os.path.join(out, "pairs")).count()
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    assert spark.read.parquet(os.path.join(out, "pairs")).count() == before

    # epoch 2 on the compacted store: same pairs as the uncompacted twin
    spark.createDataFrame(B3).coalesce(1).write.mode("append").parquet(src)
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    got = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert got == want
    assert frozenset((10, 20)) in got  # cross-batch via the compacted store

    # re-compacting an already-compacted store is a safe no-op-shaped fold
    r2 = dedup_stream.compact_store(spark, out, ckpt)
    assert r2["compacted_through"] == 2
    got2 = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert got2 == want

    # a crash window (record missing, stores folded) fails the next stream
    # start LOUDLY and re-running compact heals it
    os.remove(os.path.join(out, dedup_stream.COMPACTION_FILE))
    with pytest.raises(ValueError, match="compaction crashed mid-swap"):
        dedup_stream.verify_store_lineage(out, ckpt)
    r3 = dedup_stream.compact_store(spark, out, ckpt)
    assert r3["compacted_through"] == 2
    assert dedup_stream.verify_store_lineage(out, ckpt)["epochs"] == [0, 1, 2]


def test_compaction_keeps_latest_payload_and_stale_bands(spark, tmp_path):
    """Compaction folds the payload store keep-latest (a changed doc's NEW
    content is what future epochs verify against) while the bands fold is a
    DISTINCT that keeps stale band rows — both exactly the pre-compaction
    read semantics."""
    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight"
    b1 = _docs([(1, text_a), (2, "unrelated filler vocabulary entirely")])
    b2 = _docs([(1, text_b)])  # doc 1 changes content
    src, out, ckpt = _drain(spark, tmp_path, [b1, b2])
    dedup_stream.compact_store(spark, out, ckpt)

    b3 = _docs([(30, "one two three four five six seven nine"),   # dup of NEW
                (31, "alpha beta gamma delta epsilon zeta eta iota")])  # dup of OLD
    spark.createDataFrame(b3).coalesce(1).write.mode("append").parquet(src)
    q = dedup_stream.stream_dedup(spark, src, ckpt, out)
    q.awaitTermination()
    pairs = _norm(spark.read.parquet(os.path.join(out, "pairs")).toPandas())
    assert frozenset((1, 30)) in pairs      # verified against doc 1's LATEST
    assert frozenset((1, 31)) not in pairs  # old content no longer matchable
