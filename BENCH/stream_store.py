#!/usr/bin/env python
"""Streaming-dedup store-growth evidence (VERDICT r3 next #3).

The r3 flat-epoch table fed the real sf0.1 corpus (degenerate: ~84% of LSH
candidates verify), so per-epoch wall was dominated by candidate volume and
the store was too small (4k docs) to expose a store-size dependence. This
harness isolates exactly that variable:

  - every epoch ingests `--docs-per-epoch` documents with DISJOINT
    vocabularies (token soup unique to each doc) => near-zero cross-doc LSH
    collisions, PLUS a fixed quota of `--dups-per-epoch` exact re-uploads of
    epoch-0 documents => the per-epoch candidate volume is CONSTANT by
    construction while the accumulated store grows linearly.
  - if per-epoch wall is flat across the run, epoch cost tracks candidates;
    if it grows with epoch number, the store join is scanning state it
    should have pruned (the pre-bucketing pathology).

The store reaches epochs*docs_per_epoch documents — with the defaults, 40k,
10x the r3 table's final store.

Protocol per epoch: write the epoch's input file, drain one availableNow
trigger, clear cache + force driver GC, record wall. Single Spark session
(a long-running collector), local[--cores].

Output: a markdown table on stdout (append to BENCH/BASELINE.md) plus one
JSON line for machine consumption.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from real_time_anomaly_detection_spark.session import get_spark  # noqa: E402
from real_time_anomaly_detection_spark.streaming.dedup_stream import (  # noqa: E402
    stream_dedup,
)


def synth_epoch(epoch: int, n_docs: int, n_dups: int, tokens_per_doc: int = 120):
    """Deterministic epoch batch: doc texts over per-doc-disjoint vocab, plus
    `n_dups` exact re-uploads of epoch-0 docs under fresh doc_ids."""
    rows = []
    base = epoch * 1_000_000
    for i in range(n_docs - n_dups):
        doc = base + i
        rows.append(
            (doc, " ".join(f"e{epoch}d{i}w{j % 57}x{j}" for j in range(tokens_per_doc)))
        )
    for i in range(n_dups):
        # re-upload a DISJOINT slice of epoch-0 docs each epoch (epoch e
        # re-uploads docs e*n_dups..): every re-upload pairs with exactly one
        # stored doc, so per-epoch candidate volume is constant, not growing
        src = epoch * n_dups + i
        rows.append(
            (base + n_docs + i,
             " ".join(f"e0d{src}w{j % 57}x{j}" for j in range(tokens_per_doc)))
        )
    return rows


def synth_epoch_audio(epoch: int, n_docs: int, n_dups: int,
                      sr: int = 8000, dur_s: float = 0.5):
    """Deterministic audio epoch batch: each unique clip mixes 8 tones at
    per-clip-seeded random frequencies/amplitudes across the descriptor
    range, so band-energy patterns are ~independent across clips and
    fingerprint collisions are rare (a 3-tone grid variant measured pair
    volume GROWING with the store — those clips were spectrally too close,
    which measures corpus density, not store pruning). Plus `n_dups`
    gain-changed re-uploads of epoch-0 clips under fresh clip_ids —
    fingerprints are gain-exact, so each re-upload pairs with exactly one
    stored clip and per-epoch candidate volume stays ~constant while the
    store grows."""
    import numpy as np

    from real_time_anomaly_detection_spark.audio import codecs

    t = np.arange(int(sr * dur_s)) / sr

    def clip(k: int) -> np.ndarray:
        rng = np.random.default_rng(0xA0D10 ^ k)
        freqs = rng.uniform(90.0, 3700.0, size=8)
        amps = rng.uniform(0.3, 1.0, size=8)
        return sum(a * np.sin(2 * np.pi * f * t)
                   for f, a in zip(freqs, amps))

    rows = []
    base = epoch * 1_000_000
    for i in range(n_docs - n_dups):
        rows.append((f"c{base + i:09d}",
                     codecs.pcm16_encode(clip(base + i)), sr, "pcm16"))
    for i in range(n_dups):
        src = epoch * n_dups + i  # same disjoint-slice scheme as text
        rows.append((f"c{base + n_docs + i:09d}",
                     codecs.pcm16_encode(0.8 * clip(src)), sr, "pcm16"))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--docs-per-epoch", type=int, default=4000)
    ap.add_argument("--dups-per-epoch", type=int, default=20)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--keep", action="store_true", help="keep work dir")
    ap.add_argument("--compact", action="store_true",
                    help="after the run: one epoch on the aged store, "
                         "compact, one epoch on the compacted store")
    ap.add_argument("--modality", choices=["text", "audio"], default="text",
                    help="audio: clips batches through stream-dedup's audio "
                         "modality (per-epoch decode+FFT, fingerprint store)")
    args = ap.parse_args()

    # The re-upload source index (epoch*n_dups+i) must stay inside epoch-0's
    # unique-doc range, or late epochs would "re-upload" docs that never
    # existed and the constant-candidate-volume invariant silently breaks.
    eff_epochs = args.epochs + (2 if args.compact else 0)  # --compact adds 2
    if eff_epochs * args.dups_per_epoch > args.docs_per_epoch - args.dups_per_epoch:
        ap.error(
            "epochs*dups_per_epoch must be <= docs_per_epoch - dups_per_epoch "
            f"({eff_epochs}*{args.dups_per_epoch} > "
            f"{args.docs_per_epoch - args.dups_per_epoch}): re-uploads would "
            "reference epoch-0 docs that were never ingested"
        )

    work = tempfile.mkdtemp(prefix="stream_store_")
    in_dir = os.path.join(work, "in")
    out_dir = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)

    spark = get_spark(
        "stream-store-bench", cores=args.cores, shuffle_partitions=max(args.cores, 8)
    )
    walls, pair_counts = [], []
    compaction = None
    total_pairs = 0
    try:
        if args.modality == "audio":
            synth_fn, schema = synth_epoch_audio, (
                "clip_id string, bytes binary, sr_hz long, codec string")
        else:
            synth_fn, schema = synth_epoch, "doc_id long, text string"

        def write_and_drain(epoch: int) -> float:
            rows = synth_fn(epoch, args.docs_per_epoch, args.dups_per_epoch)
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append").parquet(in_dir)
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            q = stream_dedup(spark, in_dir, ckpt, out_dir,
                             modality=args.modality)
            q.awaitTermination()
            return t0

        for epoch in range(args.epochs):
            t0 = write_and_drain(epoch)
            walls.append(round(time.perf_counter() - t0, 2))
            n_pairs = spark.read.parquet(os.path.join(out_dir, "pairs")).count()
            pair_counts.append(n_pairs - total_pairs)
            total_pairs = n_pairs
            store = epoch * args.docs_per_epoch
            print(
                f"| {epoch} | {args.docs_per_epoch} | {store} | "
                f"{pair_counts[-1]} | {walls[-1]} |",
                flush=True,
            )

        if args.compact:
            # compaction evidence (VERDICT r5 #3): one extra epoch on the
            # AGED store, then compact, then the same-volume epoch on the
            # compacted store — the delta is the listing/footer cost the
            # one-file-per-bucket-per-epoch growth was charging every epoch
            from real_time_anomaly_detection_spark.streaming.dedup_stream import (
                compact_store,
            )

            def one_epoch(epoch):
                t0 = write_and_drain(epoch)
                return round(time.perf_counter() - t0, 2)

            aged_wall = one_epoch(args.epochs)
            t0 = time.perf_counter()
            r = compact_store(spark, out_dir, ckpt)
            compact_wall = round(time.perf_counter() - t0, 2)
            pairs_pre = spark.read.parquet(os.path.join(out_dir, "pairs")).count()
            compacted_wall = one_epoch(args.epochs + 1)
            pairs_post = spark.read.parquet(os.path.join(out_dir, "pairs")).count()
            compaction = {
                "aged_epoch_wall": aged_wall,
                "compacted_epoch_wall": compacted_wall,
                "compact_wall": compact_wall,
                "files_before": r["files_before"],
                "files_after": r["files_after"],
                "pairs_delta_post_compact": pairs_post - pairs_pre,
            }
            print(f"compaction: {json.dumps(compaction)}", flush=True)
    finally:
        spark.stop()
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "stream_dedup_epoch_walls_sec",
                "walls": walls,
                "pairs_per_epoch": pair_counts,
                "docs_per_epoch": args.docs_per_epoch,
                "dups_per_epoch": args.dups_per_epoch,
                "final_store_docs": args.epochs * args.docs_per_epoch,
                "cores": args.cores,
                "compaction": compaction,
            }
        )
    )


if __name__ == "__main__":
    main()
