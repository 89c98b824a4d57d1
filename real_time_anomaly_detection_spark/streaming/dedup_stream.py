"""Incremental near-duplicate detection at ingest time (streaming dedup),
for ALL THREE modalities: text (MinHash-LSH, the q34 pipeline), embeddings
(banded cosine-LSH, the q42 pipeline), and audio (whole-clip spectral
fingerprints + banded Hamming, the operators/audio_fingerprint.py
pipeline; the per-epoch payload decode runs ONCE — bands derive from the
persisted fingerprint relation, not a second scan, and only the 8x8-byte
fingerprint ever enters the stores or shuffles).

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
against it, so the accumulated corpus can be arbitrarily large. Both stores
are BUCKET-PARTITIONED so per-epoch cost tracks the batch's candidate
volume, not total store size:

  bands_store   partitioned by sbucket = pmod(hash(band, bucket), B) — the
                epoch read prunes to the sbuckets the new batch actually
                touches (a driver-side list of <= B ints pushed down as a
                partition IN-filter, i.e. genuine file pruning);
  payload_store partitioned by pbucket = pmod(hash(doc_id), B) — the verify
                read prunes to the pbuckets of the candidate pairs' store
                side. All epochs of one doc_id share a pbucket, so the
                keep-latest-epoch window below is exact within the pruned
                subset.

Stale band rows (a doc re-ingested with CHANGED content leaves its old
bands in sbuckets the new epoch doesn't overwrite) are harmless by
construction: they can only ever ADD candidate pairs, and every candidate
is verified against the keep-latest payload — extra verify work, never a
wrong pair. Payloads, by contrast, MUST be keep-latest (a pair's similarity
is computed on them), hence the max-epoch window on the payload read.

The bucket-size cap / salt mitigations from queries._lsh_candidate_pairs
apply to both the within-batch self-join (reused directly) and the
cross-batch store join (same two knobs, re-derived for the two-sided case).
At real scale both stores would be Iceberg tables with the same bucket
transform, making the step-2 join co-located as well as pruned.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import audio_fingerprint as _afp
from ..queries import (
    _cosine_row_prob,
    _hashed_tokens,
    _lsh_candidate_pairs,
    _mh_bands_rows,
    _nd_bands_rows,
    _resolve_banding,
)

DOCS_SCHEMA = "doc_id long, text string"
EMB_SCHEMA = "doc_id long, embedding array<float>"
CLIPS_SCHEMA = "clip_id string, bytes binary, sr_hz long, codec string"
JACCARD_THRESHOLD = 0.5
COSINE_THRESHOLD = 0.45
STORE_BUCKETS = 64  # bump at real scale so small batches prune hard
AUDIO_DURATION_BAND_S = 2.0  # same valve as audio_fingerprint.neardup_pairs
# chunk-vs-duration fusion stride: dq = dur/2s reaches 1e6 only past a
# 23-DAY clip — any real dq sits far below, so +-1 stays within one chunk
_AUDIO_DQ_STRIDE = 1_000_000


# ---------------------------------------------------------------- modalities

def _text_prepare(batch: DataFrame) -> DataFrame:
    """(doc_id, payload) with payload = 60-bit hashed token array."""
    return batch.select("doc_id", _hashed_tokens(F.col("text")).alias("payload"))


def _text_bands(batch: DataFrame, n_bands: int = 4,
                rows_per_band: int = 2) -> DataFrame:
    """Delegates to queries._mh_bands_rows, so wide production geometries
    take the same vectorized numpy minhash path as batch q29/q34 — streamed
    and batch bands are identical at any geometry."""
    return _mh_bands_rows(batch, n_bands, rows_per_band)


def _jaccard(ca: str, cb: str):
    n_common = F.size(F.array_intersect(ca, cb))
    return n_common / (F.size(ca) + F.size(cb) - n_common)


def _emb_prepare(batch: DataFrame) -> DataFrame:
    return batch.select(
        "doc_id", F.transform("embedding", lambda x: x.cast("double")).alias("payload")
    )


def _emb_bands(batch: DataFrame, n_bands: int = 6,
               planes_per_band: int = 2) -> DataFrame:
    """Banding must be threshold-matched at scale (see q42's docstring: a
    geometry mismatched to the threshold is candidate-dense for any sizeable
    clustered corpus); `stream_dedup` resolves the geometry from the
    threshold by default and threads explicit `band_kwargs` here. Delegates
    to queries._nd_bands_rows, so wide production geometries take the same
    vectorized numpy path as batch q42 — streamed and batch bands are
    bit-identical at any geometry."""
    emb = F.transform("embedding", lambda x: x.cast("double"))
    return _nd_bands_rows(
        batch.select("doc_id", emb.alias("_e")),
        n_bands, planes_per_band, id_col="doc_id", emb_col="_e",
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


def _audio_prepare(batch: DataFrame) -> DataFrame:
    """(doc_id, payload, dur_s) with payload = the whole-clip 128-bit
    fingerprint as 8 x 16-bit chunks (operators/audio_fingerprint.py) —
    ONE mapInPandas decode+FFT pass; `bytes` never leaves the map stage.
    dur_s rides along for the duration-keyed band buckets (and lands in
    the payload store as lineage). Undecodable / too-short clips are
    DROPPED here: an item with no fingerprint cannot be deduplicated, and
    decode-error REPORTING is the validation engine's job (audio_checks),
    not the dedup stream's."""
    fps = _afp.fingerprints(
        batch.select(
            F.lit(0).alias("part_id"),
            F.col("doc_id").alias("clip_id"),
            "bytes", "sr_hz", "codec",
        )
    )
    return fps.filter(F.col("fp_ok")).select(
        F.col("clip_id").alias("doc_id"), F.col("bands").alias("payload"),
        "dur_s",
    )


def _audio_bands(pay: DataFrame, n_bands: int = 8,
                 bits_per_band: int = 16,
                 duration_band_s: float = AUDIO_DURATION_BAND_S) -> DataFrame:
    """(doc_id, band, bucket) from the PREPARED payload relation — the
    audio modality's bands derive from prepare()'s output (bands_source =
    'payload' in _MODALITIES) so the expensive decode scan runs once per
    epoch. Chunk geometry is FIXED by the fingerprint definition (8
    chunks x 16 bits, `audio_fingerprint._AF_CHUNKS`); the n_bands/
    bits_per_band arguments exist only to satisfy the modality contract
    and are validated in stream_dedup.

    The bucket value FUSES the 16-bit chunk with the quantized duration:
    bucket = chunk * _AUDIO_DQ_STRIDE + floor(dur_s / duration_band_s) —
    the same scale valve as the batch join (audio_fingerprint.py): a bare
    65,536-value band space saturates around 10^9 stored clips, while
    whole-clip duplicates preserve seconds exactly, so duration multiplies
    bucket diversity at zero recall cost. Adjacent duration buckets stay
    ADJACENT INTEGERS under the fusion (the stride dwarfs any sane dq), so
    the probe side covers quantization boundaries by exploding bucket+-1
    (`_audio_probe_expand`) — pairs whose durations differ by <
    duration_band_s are never lost, matching the batch join's exact
    single-sided +-1 window."""
    dq = F.greatest(
        F.floor(F.col("dur_s") / F.lit(float(duration_band_s))), F.lit(0)
    ).cast("long")
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.col("payload").getItem(b).cast("long")
                    * F.lit(_AUDIO_DQ_STRIDE)
                    + dq
                ).alias("bucket"),
            )
            for b in range(_afp._AF_CHUNKS)
        ]
    )
    return pay.select("doc_id", F.explode(chunks).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _audio_probe_expand(bands: DataFrame) -> DataFrame:
    """The probe-side duration-adjacency explode: each band row also probes
    the two neighboring duration buckets (bucket +- 1 under the fused
    encoding). Build/store rows stay exact, so the admitted window is
    |dq delta| <= 1 — identical to the batch join's. A bucket-1 underflow
    at dq=0 probes the previous chunk's impossible max-dq region (stride
    >> any real dq), which matches nothing."""
    return bands.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1
            )
        ),
    )


def _audio_sim(ca: str, cb: str):
    """similarity = 1 - hamming/128 over the chunked fingerprints — the
    Hamming verify of audio_fingerprint.neardup_pairs recast as the store
    pipeline's similarity-floor contract."""
    ham = F.aggregate(
        F.zip_with(
            F.col(ca), F.col(cb), lambda p, q: F.bit_count(p.bitwiseXOR(q))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) - ham / F.lit(float(_afp._AF_BITS))


# default floor accepts hamming <= _AF_HAM_MAX (the batch default) and
# rejects _AF_HAM_MAX+1; the half-step keeps the 6-dp similarity rounding
# in _verify away from the decision boundary
AUDIO_SIM_THRESHOLD = 1.0 - (_afp._AF_HAM_MAX + 0.5) / _afp._AF_BITS



# (schema, id_col, prepare, bands_fn, bands_source, probe_expand, sim_fn,
#  default_threshold, per_row_prob, rows-knob name) — per_row_prob feeds
# the threshold->banding derivation (identity for Jaccard, the hyperplane
# map for cosine; None+None = fixed geometry, audio). bands_source says
# what bands_fn consumes: the raw batch ("raw") or prepare()'s output
# ("payload" — used when prepare is the expensive scan to run once).
# probe_expand (or None) widens the PROBE side of every candidate join
# (audio: duration-bucket adjacency) while store/build rows stay exact.
_MODALITIES = {
    "text": (DOCS_SCHEMA, "doc_id", _text_prepare, _text_bands, "raw",
             None, _jaccard, JACCARD_THRESHOLD, None, "rows_per_band"),
    "embedding": (EMB_SCHEMA, "doc_id", _emb_prepare, _emb_bands, "raw",
                  None, _cosine, COSINE_THRESHOLD, _cosine_row_prob,
                  "planes_per_band"),
    "audio": (CLIPS_SCHEMA, "clip_id", _audio_prepare, _audio_bands,
              "payload", _audio_probe_expand, _audio_sim,
              AUDIO_SIM_THRESHOLD, None, None),
}


# ---------------------------------------------------------------- shared core

def _sbucket(n: int):
    return F.pmod(F.hash(F.col("band"), F.col("bucket")), F.lit(n)).cast("int")


def _pbucket(col: str, n: int):
    return F.pmod(F.hash(F.col(col)), F.lit(n)).cast("int")


def _verify(cands: DataFrame, pay_a: DataFrame, pay_b: DataFrame,
            sim_fn, threshold: float,
            size_prefilter: bool = False) -> DataFrame:
    pa = pay_a.select(F.col("doc_id").alias("doc_a"), F.col("payload").alias("pa"))
    pb = pay_b.select(F.col("doc_id").alias("doc_b"), F.col("payload").alias("pb"))
    if size_prefilter:
        # Exact Jaccard size bound (J <= min-size/max-size): drop
        # size-incompatible candidate pairs on 8-byte size columns BEFORE
        # the wide token-array rows shuffle into the verify joins. Only
        # valid for set-overlap similarities (text modality); cosine is
        # scale-invariant so sizes bound nothing there. Slack matches the
        # batch pipeline (rounded-similarity final filter).
        sa = pa.select("doc_a", F.size("pa").alias("_sza"))
        sb = pb.select("doc_b", F.size("pb").alias("_szb"))
        cands = (
            cands.join(sa, "doc_a")
            .join(sb, "doc_b")
            .filter(
                F.least("_sza", "_szb")
                >= (threshold - 1e-6) * F.greatest("_sza", "_szb")
            )
            .select("doc_a", "doc_b")
        )
    return (
        cands.join(pa, "doc_a")
        .join(pb, "doc_b")
        .withColumn("similarity", F.round(sim_fn("pa", "pb"), 6))
        .filter(F.col("similarity") >= threshold)
        .select("doc_a", "doc_b", "similarity")
    )


def _cross_candidates(old_bands: DataFrame, new_bands: DataFrame,
                      max_bucket_size: int | None,
                      salt: int | None) -> DataFrame:
    """(doc_a=stored, doc_b=new) candidate pairs from the two-sided band
    join, with the same two hot-bucket mitigations as the self-join helper
    (queries._lsh_candidate_pairs): a LOSSY size cap counted over the
    COMBINED (store ∪ batch) bucket membership, and an EXACT salt that
    splits one bucket's m_old x m_new work across R tasks (store side gets
    hash(doc_id) % R, the small batch side is replicated to all R salts)."""
    if max_bucket_size is not None:
        # broadcast the few OVER-cap buckets, anti-join (the under-cap set
        # is O(all buckets) — see queries._lsh_candidate_pairs, r5)
        hot = (
            old_bands.select("band", "bucket")
            .unionByName(new_bands.select("band", "bucket"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .drop("_n")
        )
        old_bands = old_bands.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
        new_bands = new_bands.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    # round-robin repartition of the store (probe) side: the pruned store
    # read may be few parquet files; without this the pair emission runs in
    # as few tasks as there are files (same measured pathology as the batch
    # helper's probe side)
    par = old_bands.sparkSession.sparkContext.defaultParallelism * 2
    if salt and salt > 1:
        a = old_bands.repartition(par).withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(salt)).cast("int")
        )
        b = new_bands.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        joined = a.alias("a").join(b.alias("b"), ["band", "bucket", "_salt"])
    else:
        joined = old_bands.repartition(par).alias("a").join(
            new_bands.alias("b"), ["band", "bucket"]
        )
    return (
        joined
        # a re-ingested doc_id (same id arriving again in a later batch)
        # must not self-pair at similarity 1.0
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


STORE_META_FILE = "store_meta.json"


def _check_store_meta(out_dir: str, meta: dict) -> None:
    """Pin the store-layout parameters (bucket modulus, band geometry,
    modality) to the store's lifetime: written once when the store is
    created, validated on every later invocation. A mismatch is a hard
    error — the caller either passes the stored values or starts a fresh
    out_dir. (At real scale this marker lives in the Iceberg table's
    properties; here it is a JSON file beside the stores.)"""
    path = os.path.join(out_dir, STORE_META_FILE)
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing != meta:
            raise ValueError(
                "store-layout parameters differ from the values this store "
                f"was created with: stored {existing}, requested {meta}. "
                "Changing store_buckets/band geometry/modality invalidates "
                "the accumulated bands/payload stores (partition pruning and "
                "band collisions would use the wrong layout, silently "
                "dropping cross-batch pairs). Re-run with the stored values "
                "or point out_dir at a fresh location."
            )
    else:
        # no meta, but stores already populated: a marker-less store built
        # by pre-marker code must NOT silently adopt the currently-resolved
        # geometry — the resolved defaults may differ from whatever built
        # the store (e.g. threshold-derived banding vs the old implicit
        # 4x2/6x2), which is exactly the cross-batch-pair-dropping failure
        # this guard exists to prevent
        populated = [
            d for d in ("bands_store", "payload_store")
            if _epoch_dirs(os.path.join(out_dir, d))
        ]
        if populated:
            raise ValueError(
                f"store at {out_dir!r} has committed epochs in {populated} "
                f"but no {STORE_META_FILE}: it predates the layout marker, "
                "and adopting the current defaults could silently change "
                "the geometry it was built with. Backfill the marker with "
                "the legacy values (write store_meta.json matching the "
                "original run's modality/store_buckets/banding) or start a "
                "fresh out_dir."
            )
        os.makedirs(out_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, sort_keys=True)
        os.replace(tmp, path)


PLANES_FILE = "planes.json"
_PLANES_SAMPLE_CAP = 4096
SNAPSHOT_DIR = "store_snapshots"


def _append_store_snapshot(out_dir: str, epoch_id: int, n_docs: int) -> None:
    """Epoch-commit lineage for the dedup stores (VERDICT r3 #8 / r4 #7 —
    the `tables.py` snapshot-sidecar pattern): one JSON record per epoch,
    written AFTER both store writes succeed, keyed by epoch so a retried
    epoch replaces its own record (same idempotency as the stores). At real
    scale this is the Iceberg snapshot log; here it is the parquet-backend
    sidecar."""
    sp = os.path.join(out_dir, SNAPSHOT_DIR)
    os.makedirs(sp, exist_ok=True)
    import time

    rec = {"epoch_id": int(epoch_id), "committed_at": time.time(),
           "n_docs": int(n_docs)}
    path = os.path.join(sp, f"epoch_{epoch_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, path)


def store_snapshots(out_dir: str) -> list[dict]:
    """Committed-epoch lineage records, sorted by epoch."""
    sp = os.path.join(out_dir, SNAPSHOT_DIR)
    if not os.path.isdir(sp):
        return []
    out = []
    for f in sorted(os.listdir(sp)):
        if f.startswith("epoch_") and f.endswith(".json"):
            with open(os.path.join(sp, f)) as fh:
                out.append(json.load(fh))
    return sorted(out, key=lambda r: r["epoch_id"])


def _epoch_dirs(root: str) -> set[int]:
    if not os.path.isdir(root):
        return set()
    return {
        int(d.split("=", 1)[1])
        for d in os.listdir(root)
        if d.startswith("epoch_id=")
    }


def verify_store_lineage(out_dir: str, checkpoint_dir: str) -> dict:
    """Cross-check the three epoch-keyed artifacts — store snapshots
    (lineage), the streaming checkpoint's commit log, and the on-disk epoch
    directories — instead of trusting directory listings:

    - every lineage epoch must be <= the checkpoint's next batch id: a
      lineage epoch the checkpoint could never have produced means a FRESH
      checkpoint was pointed at an OLD store — the restarted stream would
      renumber epochs from 0 and silently overwrite early store epochs
      while trusting later ones (lost/duplicated pairs);
    - every lineage epoch must have its pairs/ output (lost-pairs check);
    - an epoch DIRECTORY without a lineage record is legal only at the
      in-flight head (a crash between the store writes and the snapshot
      append — the retry overwrites it); below the committed head it means
      corruption.

    Compaction (``compact_store``) folds store epochs <= its record's
    ``compacted_through`` into the single epoch dir ``epoch_id=T``; with the
    record present, the stores are required to hold {T} plus every lineage
    epoch above T (pairs/ is never compacted — all lineage epochs stay
    required there). A half-finished compaction (no record yet, stores
    already rewritten) therefore fails the missing-epochs check LOUDLY;
    re-running compact_store heals it.

    Returns {"epochs": [...], "checkpoint_commits": [...]} when consistent;
    raises ValueError otherwise. Runs automatically at stream start."""
    lineage = {r["epoch_id"] for r in store_snapshots(out_dir)}
    commits_dir = os.path.join(checkpoint_dir, "commits")
    commits = set()
    if os.path.isdir(commits_dir):
        for f in os.listdir(commits_dir):
            if f.isdigit():
                commits.add(int(f))
    next_batch = (max(commits) + 1) if commits else 0
    ahead = {e for e in lineage if e > next_batch}
    if ahead:
        raise ValueError(
            f"store lineage has epochs {sorted(ahead)} beyond the "
            f"checkpoint's next batch id {next_batch}: this checkpoint "
            "cannot have produced them (fresh checkpoint against an old "
            "store?). A restarted stream would renumber epochs and corrupt "
            "the store — reuse the original checkpoint or start a fresh "
            "out_dir."
        )
    head = max(lineage) if lineage else -1
    ct = compacted_through(out_dir)
    for artifact in ("pairs", "bands_store", "payload_store"):
        root = os.path.join(out_dir, artifact)
        required = lineage
        if artifact != "pairs" and ct >= 0:
            # compacted stores hold one merged dir at epoch_id=ct plus any
            # epochs committed after the compaction
            required = {e for e in lineage if e > ct} | ({ct} & lineage)
        missing = required - _epoch_dirs(root)
        if missing:
            raise ValueError(
                f"committed epochs {sorted(missing)} are missing from "
                f"{artifact} — state lost after commit (the snapshot is "
                "written only after every epoch artifact is on disk), or a "
                "compaction crashed mid-swap (re-run compact_store to heal)"
            )
        orphans = {
            e for e in _epoch_dirs(root) if e not in lineage and e <= head
        }
        if orphans:
            raise ValueError(
                f"{artifact} has unsnapshotted epochs {sorted(orphans)} "
                f"below the committed lineage head {head} — store corruption"
            )
    return {"epochs": sorted(lineage), "checkpoint_commits": sorted(commits)}


COMPACTION_FILE = "compaction.json"


def compacted_through(out_dir: str) -> int:
    """Epoch through which compact_store folded the stores; -1 if never."""
    path = os.path.join(out_dir, COMPACTION_FILE)
    if not os.path.exists(path):
        return -1
    with open(path) as f:
        return int(json.load(f)["compacted_through"])


def _store_files(root: str) -> int:
    n = 0
    for _, _, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _swap_in(root: str, stage_root: str, t: int) -> None:
    """Commit a READY stage: remove the folded source epoch dirs, then
    rename the staged epoch_id=<t> dir into the store."""
    import shutil

    for e in sorted(_epoch_dirs(root)):
        if e <= t:
            shutil.rmtree(os.path.join(root, f"epoch_id={e}"))
    os.rename(os.path.join(stage_root, f"epoch_id={t}"),
              os.path.join(root, f"epoch_id={t}"))


def _compact_one(spark: SparkSession, root: str, target: int,
                 shape_fn, n_buckets: int) -> None:
    """Fold every epoch dir <= target of ONE store into a single
    epoch_id=<target> dir, one file per bucket partition.

    Crash-safe resume: the folded relation is STAGED under
    root/.compacting/epoch_id=<target> (a dot-dir, invisible to Spark's
    reader) and only once its _SUCCESS marker exists are the source epoch
    dirs removed and the staged dir renamed in (_swap_in). A re-run after
    any crash either resumes the staged swap (stage complete — nothing is
    recomputed), or recomputes from the untouched source dirs (stage
    incomplete — nothing was deleted yet). A READY stage for an OLDER
    target is committed first, never discarded: its rows may be the only
    copy of source dirs the interrupted run already deleted."""
    import shutil

    stage_root = os.path.join(root, ".compacting")
    if os.path.isdir(stage_root):
        for d in os.listdir(stage_root):
            if not d.startswith("epoch_id="):
                continue
            t_old = int(d.split("=", 1)[1])
            if t_old != target and os.path.exists(
                os.path.join(stage_root, d, "_SUCCESS")
            ):
                _swap_in(root, stage_root, t_old)
    stage = os.path.join(stage_root, f"epoch_id={target}")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        if os.path.isdir(stage_root):
            shutil.rmtree(stage_root)  # partial stage: sources untouched
        folded = shape_fn(
            spark.read.parquet(root).filter(F.col("epoch_id") <= target)
        )
        part_col = "sbucket" if "sbucket" in folded.columns else "pbucket"
        (
            folded.repartition(n_buckets, F.col(part_col))
            .write.partitionBy(part_col)
            .mode("overwrite")
            .parquet(stage)
        )
    _swap_in(root, stage_root, target)
    shutil.rmtree(stage_root, ignore_errors=True)


def compact_store(spark: SparkSession, out_dir: str,
                  checkpoint_dir: str) -> dict:
    """Rewrite the accumulated bands/payload stores to ONE file per bucket
    (VERDICT r5 #3): the epoch writes append one file per bucket per epoch,
    so listing/footer cost grows with store AGE even when partition pruning
    keeps scanned BYTES flat (r3 measured +35% epoch wall by epoch 9 from
    file count alone). Run with the stream stopped.

    Read semantics are preserved exactly:
    - bands: the candidate join consumes the (doc_id, band, bucket) SET, so
      folding is a DISTINCT across epochs — stale band rows of re-ingested
      docs are kept (they can still surface candidates whose verify runs
      against the keep-latest payload, exactly as before);
    - payload: the read side keeps max-epoch per doc, so folding applies
      keep-latest per doc_id before collapsing to the target epoch.

    Folded rows land in epoch_id=T, T = min(lineage head, last
    checkpoint-committed batch): an in-flight epoch (stores written,
    checkpoint commit missing) stays UNfolded so its retry still excludes
    its own partial state via the `epoch_id < current` read filter.

    Crash-safety: stage-then-swap per store (_compact_one), the
    compaction record committed LAST. Any mid-swap crash fails the next
    stream start loudly (verify_store_lineage's missing-epochs check) and
    re-running compact_store heals it."""
    lineage = {r["epoch_id"] for r in store_snapshots(out_dir)}
    commits_dir = os.path.join(checkpoint_dir, "commits")
    commits = set()
    if os.path.isdir(commits_dir):
        for f in os.listdir(commits_dir):
            if f.isdigit():
                commits.add(int(f))
    if not lineage or not commits:
        return {"compacted_through": compacted_through(out_dir),
                "skipped": "no committed epochs"}
    target = min(max(lineage), max(commits))
    with open(os.path.join(out_dir, STORE_META_FILE)) as f:
        n_buckets = json.load(f)["store_buckets"]

    bands_root = os.path.join(out_dir, "bands_store")
    pay_root = os.path.join(out_dir, "payload_store")
    files_before = _store_files(bands_root) + _store_files(pay_root)

    latest = Window.partitionBy("doc_id")

    def bands_shape(df):
        return df.select("doc_id", "band", "bucket", "sbucket").distinct()

    def pay_shape(df):
        return (
            df.withColumn("_mx", F.max("epoch_id").over(latest))
            .filter(F.col("epoch_id") == F.col("_mx"))
            .select("doc_id", "payload", "pbucket")
        )

    for root, shape in ((bands_root, bands_shape), (pay_root, pay_shape)):
        if any(e <= target for e in _epoch_dirs(root)):
            _compact_one(spark, root, target, shape, n_buckets)

    import time

    path = os.path.join(out_dir, COMPACTION_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"compacted_through": int(target), "at": time.time()}, f)
    os.replace(tmp, path)
    return {"compacted_through": int(target),
            "files_before": files_before,
            "files_after": _store_files(bands_root) + _store_files(pay_root)}


def _train_cov_planes(batch_df: DataFrame, n_planes: int) -> list:
    """Covariance-matched sign planes (VERDICT r4 #6): planes = unit rows of
    G @ Sigma^(1/2), where G is the SAME seeded LCG +-1 direction stream the
    fixed path uses and Sigma is the covariance of a bounded deterministic
    sample (orderBy doc_id, limit cap) of unit-normalized first-epoch
    vectors. Mechanism: matching the projection to the data covariance
    enlarges |u.x| for typical corpus vectors, so a near-dup pair's sign
    bits flip less often — measured on the planted clustered corpus,
    trained recall beats fixed at equal (tight) band geometry
    (tests/test_dedup_stream.py). Training is metadata-sized (<= cap rows
    to the driver — the bounded-sample pattern of _ivf_trained_centroids)
    and bit-deterministic, so a retried first epoch retrains identically."""
    import numpy as np

    from ..queries import _nd_planes

    pdf = (
        batch_df.select("doc_id", "embedding")
        .filter(F.col("embedding").isNotNull())
        .orderBy("doc_id")
        .limit(_PLANES_SAMPLE_CAP)
        .toPandas()
    )
    if not len(pdf):
        # an all-null first batch trains nothing: fall back to the fixed
        # LCG planes (unit rows of g), identical to train_planes=False
        g = np.asarray(_nd_planes(n_planes), dtype=np.float64)
        gn = np.linalg.norm(g, axis=1, keepdims=True)
        gn[gn == 0] = 1.0
        return [[float(a) for a in row] for row in g / gn]
    x = np.stack(pdf["embedding"].apply(lambda v: np.asarray(v, dtype=np.float64)))
    nrm = np.linalg.norm(x, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    x = x / nrm
    g = np.asarray(_nd_planes(n_planes), dtype=np.float64)
    c = np.cov(x.T) + 1e-9 * np.eye(x.shape[1])
    w, v = np.linalg.eigh(c)
    half = v @ np.diag(np.sqrt(np.maximum(w, 0.0))) @ v.T
    planes = g @ half
    pn = np.linalg.norm(planes, axis=1, keepdims=True)
    pn[pn == 0] = 1.0
    planes = planes / pn
    return [[float(a) for a in row] for row in planes]


def _load_or_train_planes(out_dir: str, batch_df: DataFrame,
                          n_planes: int) -> list:
    """Train once on the first epoch, persist beside the stores, reload ever
    after — band geometry AND plane values are store-lifetime state (a crash
    after the write reloads them; a crash before retrains bit-identically
    from the same deterministic sample)."""
    path = os.path.join(out_dir, PLANES_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    planes = _train_cov_planes(batch_df, n_planes)
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(planes, f)
    os.replace(tmp, path)
    return planes


def stream_dedup(
    spark: SparkSession,
    input_path: str,
    checkpoint_dir: str,
    out_dir: str,
    modality: str = "text",
    threshold: float | None = None,
    max_bucket_size: int | None = None,
    salt: int | None = None,
    store_buckets: int = STORE_BUCKETS,
    available_now: bool = True,
    processing_time: str = "600 seconds",
    band_kwargs: dict | None = None,
    train_planes: bool = False,
):
    """Watch `input_path` for new files of the given modality ("text",
    "embedding", or "audio"); emit verified near-dup pairs per epoch under
    `out_dir`/pairs/epoch_id=N. `doc_a` is the previously-seen (or
    lower-id within-batch) item, `doc_b` the new one (audio: clip_ids —
    the stores and pairs carry them as string doc_id/doc_a/doc_b).
    `max_bucket_size`/`salt` are the hot-bucket mitigations from the batch
    pipelines, applied to both the within-batch and store joins.
    Band geometry DEFAULTS to the threshold-matched derivation
    (queries._banding_for) for both modalities; `band_kwargs` overrides it
    explicitly (text: n_bands/rows_per_band; embedding:
    n_bands/planes_per_band — e.g. the round-4 hand-tuned
    dict(n_bands=6, planes_per_band=12) at threshold=0.9).
    Store-layout parameters (modality, store_buckets, band geometry) are
    pinned to the store's lifetime via a marker file written on first run
    and validated on every later run — a mismatched re-invocation raises
    instead of silently dropping cross-batch pairs. Returns the
    StreamingQuery."""
    (schema, id_col, prepare, bands_fn, bands_source, probe_expand, sim_fn,
     default_thr, row_prob, rows_key) = _MODALITIES[modality]
    threshold = default_thr if threshold is None else threshold
    # Resolve the band geometry ONCE, before anything touches the store:
    # explicit band_kwargs win; otherwise it is derived from the threshold
    # (queries._banding_for — the scale-safe default, VERDICT r4 #1).
    kw = dict(band_kwargs or {})
    if rows_key is None:
        # fixed-geometry modality (audio): the fingerprint definition IS
        # the banding — _AF_CHUNKS x 16-bit chunks — so there is nothing to
        # derive or override. Banded recall is EXACT (pigeonhole) only for
        # thresholds admitting hamming <= n_chunks-1; a lower floor would
        # silently miss pairs sharing no clean chunk, which is precisely
        # the failure class this module's guards exist to prevent — raise.
        if kw:
            raise ValueError(
                f"band_kwargs not supported for {modality}: the geometry is "
                "fixed by the fingerprint definition (8 x 16-bit chunks)")
        nb = _afp._AF_CHUNKS
        rows = _afp._AF_BITS // _afp._AF_CHUNKS
        # the INTEGER hamming ceiling this floor admits (similarities are
        # exact multiples of 1/128, so floor() is the right cast)
        h_max = int((1.0 - threshold) * _afp._AF_BITS + 1e-9)
        if h_max > nb - 1:
            raise ValueError(
                f"threshold {threshold} admits hamming {h_max} > {nb - 1}, "
                f"past the {nb}-chunk pigeonhole recall guarantee; lowest "
                f"exact floor is {1.0 - (nb - 1) / _afp._AF_BITS}")
        banding = {"n_bands": nb, "bits_per_band": rows,
                   "duration_band_s": AUDIO_DURATION_BAND_S}
    else:
        unknown = set(kw) - {"n_bands", rows_key}
        if unknown:
            raise ValueError(
                f"unknown band_kwargs for {modality}: {sorted(unknown)}")
        nb, rows = _resolve_banding(
            kw.get("n_bands"), kw.get(rows_key), threshold, row_prob
        )
        banding = {"n_bands": nb, rows_key: rows}
    if train_planes and modality != "embedding":
        raise ValueError("train_planes applies to the embedding modality only")
    if train_planes:
        # planes are trained on the FIRST epoch's sample and persisted
        # beside the stores; later epochs (and restarts) reload them, so
        # every band row ever written used the same planes
        def bands_of(b):
            planes = _load_or_train_planes(out_dir, b, nb * rows)
            return _nd_bands_rows(
                b.select(
                    "doc_id",
                    F.transform("embedding", lambda x: x.cast("double")).alias("_e"),
                ),
                nb, rows, id_col="doc_id", emb_col="_e", planes=planes,
            )
    else:
        bands_of = lambda b: bands_fn(b, nb, rows)  # noqa: E731
    # Store-layout parameters are baked into the accumulated stores: the
    # partition IN-filters are computed with store_buckets as the modulus
    # against partitions WRITTEN with it, and the band geometry determines
    # which (band, bucket) keys ever collide. Re-invoking with different
    # values against an existing store would silently drop cross-batch pairs
    # — so the RESOLVED values are persisted in a marker on first run and
    # validated ever after (a threshold change that re-derives a different
    # geometry trips the same guard).
    _check_store_meta(
        out_dir,
        {
            "modality": modality,
            "store_buckets": store_buckets,
            "banding": banding,
            "trained_planes": train_planes,
        },
    )
    bands_store = os.path.join(out_dir, "bands_store")
    payload_store = os.path.join(out_dir, "payload_store")
    pairs_out = os.path.join(out_dir, "pairs")
    # snapshot-diff consistency gate (r4 #7): a store with committed epochs
    # this checkpoint cannot explain, lost pair outputs, or unsnapshotted
    # store epochs below the lineage head fails HERE, before any batch runs
    verify_store_lineage(out_dir, checkpoint_dir)

    stream = spark.readStream.schema(schema).parquet(input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if id_col != "doc_id":
            batch_df = batch_df.withColumnRenamed(id_col, "doc_id")
        batch_df = batch_df.dropDuplicates(["doc_id"]).persist()
        cached = [batch_df]
        new_pay = prepare(batch_df)
        if bands_source == "payload":
            # prepare() is the expensive payload scan (audio: decode+FFT);
            # persist it and derive bands FROM it so the scan runs once per
            # epoch — never once for bands and again for the store write
            new_pay = new_pay.persist()
            cached.append(new_pay)
            new_bands = bands_of(new_pay).persist()
        else:
            new_bands = bands_of(batch_df).persist()
        cached.append(new_bands)
        # probe rows: the modality may widen the probe side (audio:
        # duration-bucket adjacency) — store/build rows stay exact, so the
        # admitted window matches the batch join's single-sided +-1
        if probe_expand is not None:
            probe_bands = probe_expand(new_bands).persist()
            cached.append(probe_bands)
        else:
            probe_bands = new_bands

        # within-batch pairs: the batch helper verbatim (bucketed self-join,
        # ordered doc_a < doc_b, probe repartition + cap/salt knobs). With a
        # probe expansion, the self-join runs exact-vs-expanded through the
        # two-sided helper instead (both orientations appear; the unordered
        # pair collapse below dedupes them).
        if probe_expand is not None:
            within = _cross_candidates(new_bands, probe_bands,
                                       max_bucket_size, salt)
        else:
            within = _lsh_candidate_pairs(new_bands, max_bucket_size, salt)
        pairs = _verify(within, new_pay, new_pay, sim_fn, threshold,
                        size_prefilter=(modality == "text"))

        # cross-batch pairs: new items vs the accumulated store. 'Store
        # absent' is a filesystem probe on BOTH stores, NOT a caught read
        # error — a corrupt store must fail the epoch (and be retried) rather
        # than silently dropping every cross-batch pair; and a crash between
        # the two store writes below must leave the retry on the
        # within-batch-only path, not wedge it on a half-written store pair.
        if os.path.isdir(bands_store) and os.path.isdir(payload_store):
            # prune the store read to the sbuckets this batch touches:
            # <= store_buckets ints collected driver-side, pushed down as a
            # partition IN-filter => file-level pruning, store-size-independent
            touched = [
                r[0]
                for r in probe_bands.select(_sbucket(store_buckets).alias("sb"))
                .distinct()
                .collect()
            ]
            old_bands = (
                spark.read.parquet(bands_store)
                .filter(F.col("sbucket").isin(touched))
                # a retried epoch must not see its own partial state
                .filter(F.col("epoch_id") < epoch_id)
                .select("doc_id", "band", "bucket")
            )
            cross = _cross_candidates(
                old_bands, probe_bands, max_bucket_size, salt
            ).persist()
            cached.append(cross)
            # prune the payload read to the candidate pairs' pbuckets; the
            # keep-latest window is exact within a pbucket because all epochs
            # of one doc_id hash to the same pbucket
            cand_pb = [
                r[0]
                for r in cross.select(_pbucket("doc_a", store_buckets).alias("pb"))
                .distinct()
                .collect()
            ]
            latest = Window.partitionBy("doc_id")
            old_pay = (
                spark.read.parquet(payload_store)
                .filter(F.col("pbucket").isin(cand_pb))
                .filter(F.col("epoch_id") < epoch_id)
                # keep-latest payload per doc: a re-ingested doc's similarity
                # must be computed on its newest content
                .withColumn("_mx", F.max("epoch_id").over(latest))
                .filter(F.col("epoch_id") == F.col("_mx"))
                .select("doc_id", "payload")
            )
            pairs = pairs.unionByName(
                _verify(cross, old_pay, new_pay, sim_fn, threshold,
                        size_prefilter=(modality == "text"))
            )

        # one row per unordered pair: a doc re-ingested alongside its twin
        # can surface the same pair from both the within-batch and
        # cross-batch branches, and stale bands can duplicate candidates.
        # Deterministic keep: the max (similarity, doc_a, doc_b) struct —
        # when content changed between epochs, the branch that saw the
        # higher similarity wins (ties broken lexically, never arbitrarily).
        pairs = (
            pairs.groupBy(
                F.least("doc_a", "doc_b").alias("_lo"),
                F.greatest("doc_a", "doc_b").alias("_hi"),
            )
            .agg(F.max(F.struct("similarity", "doc_a", "doc_b")).alias("_s"))
            .select(
                F.col("_s.doc_a").alias("doc_a"),
                F.col("_s.doc_b").alias("doc_b"),
                F.col("_s.similarity").alias("similarity"),
            )
        )

        pairs.write.mode("overwrite").parquet(f"{pairs_out}/epoch_id={epoch_id}")
        # epoch-keyed state appends: overwrite-own-epoch => idempotent retry.
        # payload BEFORE bands: the cross-batch gate above requires both, so
        # whichever single store a crash leaves behind, the retry is safe.
        # repartition ON the bucket column before the partitioned write: one
        # file per bucket per epoch instead of one per (task, bucket) —
        # without it the store accumulates shuffle_partitions x buckets files
        # per epoch and the per-epoch listing/footer cost grows with store
        # AGE even when pruning keeps the scanned bytes flat (measured: +35%
        # epoch wall by epoch 9 at 4k docs/epoch, from file count alone).
        new_pay.withColumn("pbucket", _pbucket("doc_id", store_buckets)).repartition(
            store_buckets, F.col("pbucket")
        ).write.partitionBy("pbucket").mode("overwrite").parquet(
            f"{payload_store}/epoch_id={epoch_id}"
        )
        new_bands.withColumn("sbucket", _sbucket(store_buckets)).repartition(
            store_buckets, F.col("sbucket")
        ).write.partitionBy("sbucket").mode("overwrite").parquet(
            f"{bands_store}/epoch_id={epoch_id}"
        )
        # lineage LAST: the snapshot record asserts both stores + pairs for
        # this epoch are fully on disk (batch_df is persisted; the count is
        # a cached-scan metadata pass)
        _append_store_snapshot(out_dir, epoch_id, batch_df.count())
        for df in cached:
            df.unpersist()

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
