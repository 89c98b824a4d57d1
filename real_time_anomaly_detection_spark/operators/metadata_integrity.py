"""Metadata<->payload integrity constraint family (opt-in check).

Catches the failure class no other family sees: the payload byte count
disagreeing with what (sr_hz, dur_ms, codec) promise — truncated uploads,
padded/garbage tails, sample-frame misalignment, or metadata lies (dur_ms
zeroed or rescaled after encode). The PCM/SNR family needs a reference
signal to compare against; this one is reference-free, so it also runs on
tables that have no oracle at all.

Reference parity: the reference's schema sanity rules are value-range checks
on scalar readings (`anomaly_detector.py:377` row-count gate and the range
validators around it); the graft's binary payload adds the length-consistency
axis the input_hint implies (bytes + sr_hz + dur_ms + codec must agree).

Scale shape: the ONLY payload expression is ``length(bytes)`` fused into the
parquet scan — pure Catalyst, JVM-side, 8 bytes per row shuffle, never the
payload. When the audio family is also enabled, even that scan is skipped:
``pcm_check(with_len=True)`` emits ``payload_len`` out of the SAME Arrow
batches the decode already reads, so both families share ONE payload scan
(engine.validate wires it; tests/test_plans.py pins the single-scan plan).

Row statuses (precedence order):
- ``null_meta``       sr_hz/dur_ms/codec/payload NULL — skipped, not a
                      violation (null-rate is column_stats' job, P6 pattern)
- ``unknown_codec``   codec not in BYTES_PER_SAMPLE — cannot be decoded
- ``misaligned``      payload_len not a multiple of the sample width
- ``truncated``       fewer samples than floor(sr_hz*dur_ms/1000) - tol
- ``padded``          more samples than promised + tol
- ``ok``

The expected-sample formula is ``greatest(floor(sr_hz*dur_ms/1000), 1)`` —
the synthesizer's own ``max(1, int(sr*dur/1000))`` (synth.py:88), i.e. the
canonical PCM length convention for this schema. ``tol_ms`` (default 0)
widens the accepted band by ceil(sr_hz*tol_ms/1000) samples for pipelines
whose upstream rounds dur_ms instead of truncating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VERDICT_FAIL, VERDICT_PASS

#: sample width per codec — pcm16 is 2-byte LE int16; the G.711 companded
#: codecs are 1 byte/sample (audio/codecs.py CODECS).
BYTES_PER_SAMPLE = {"pcm16": 2, "ulaw": 1, "alaw": 1}

_LEN_COLS = ("part_id", "clip_id", "sr_hz", "dur_ms", "codec", "payload_len")


def payload_lengths(clips: DataFrame, part_col: str = "part_id") -> DataFrame:
    """(part_id, clip_id, sr_hz, dur_ms, codec, payload_len) — the payload
    reduced to its byte count AT THE SCAN (map-side ``length``, no Python).
    Used when the audio family is off; with audio on, engine.validate feeds
    integrity_signals the identical relation out of the PCM pass instead."""
    return clips.select(
        F.col(part_col).alias("part_id"),
        "clip_id",
        "sr_hz",
        "dur_ms",
        "codec",
        F.length(F.col("bytes")).cast("long").alias("payload_len"),
    )


def integrity_signals(lens: DataFrame, tol_ms: float = 0.0) -> DataFrame:
    """Per-clip integrity classification over a payload_lengths()-shaped
    relation (either source). Pure Catalyst — composes into whole-stage
    codegen, nothing here touches Python or the payload."""
    bps = F.lit(None).cast("long")
    for codec, width in BYTES_PER_SAMPLE.items():
        bps = F.when(F.col("codec") == codec, F.lit(width)).otherwise(bps)
    expected = F.greatest(
        F.floor(F.col("sr_hz").cast("long") * F.col("dur_ms") / 1000), F.lit(1)
    ).cast("long")
    tol = F.ceil(F.col("sr_hz") * F.lit(float(tol_ms)) / 1000).cast("long")
    sig = lens.select(
        *_LEN_COLS,
        bps.alias("bps"),
        expected.alias("expected_samples"),
    ).withColumn(
        "actual_samples", F.floor(F.col("payload_len") / F.col("bps")).cast("long")
    )
    status = (
        F.when(
            F.col("sr_hz").isNull()
            | F.col("dur_ms").isNull()
            | F.col("codec").isNull()
            | F.col("payload_len").isNull(),
            F.lit("null_meta"),
        )
        .when(F.col("bps").isNull(), F.lit("unknown_codec"))
        .when(F.col("payload_len") % F.col("bps") != 0, F.lit("misaligned"))
        .when(F.col("actual_samples") < F.col("expected_samples") - tol, F.lit("truncated"))
        .when(F.col("actual_samples") > F.col("expected_samples") + tol, F.lit("padded"))
        .otherwise(F.lit("ok"))
    )
    return sig.withColumn("row_status", status)


def integrity_violations(sig: DataFrame) -> DataFrame:
    """One VIOLATIONS-schema row per clip whose payload length contradicts
    its metadata. null_meta rows are skipped (column_stats owns null-rate)."""
    bad = sig.filter(~F.col("row_status").isin("ok", "null_meta"))
    return bad.select(
        "part_id",
        F.lit("metadata_integrity").alias("constraint"),
        "clip_id",
        F.lit("bytes").alias("column"),
        F.format_string(
            "%d bytes (%d samples)",
            F.col("payload_len"),
            F.coalesce(F.col("actual_samples"), F.lit(-1)),
        ).alias("observed"),
        F.when(
            F.col("bps").isNotNull(),
            F.format_string(
                "%d bytes (%d samples)",
                F.col("expected_samples") * F.col("bps"),
                F.col("expected_samples"),
            ),
        ).alias("expected"),
        F.format_string(
            "%s: payload vs sr_hz=%s dur_ms=%s codec=%s",
            F.col("row_status"),
            F.coalesce(F.col("sr_hz").cast("string"), F.lit("NULL")),
            F.coalesce(F.col("dur_ms").cast("string"), F.lit("NULL")),
            F.coalesce(F.col("codec"), F.lit("NULL")),
        ).alias("detail"),
    )


def integrity_verdicts(sig: DataFrame) -> DataFrame:
    """Per-partition pass/fail: fails iff any checked clip's payload length
    contradicts its metadata. Metrics carry the checked/skipped split so a
    partition passing on 3 checked rows out of 10k is visibly weak evidence."""
    agg = sig.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("row_status") == "null_meta").alias("n_null_meta"),
        F.count_if(~F.col("row_status").isin("ok", "null_meta")).alias("n_bad"),
    )
    return agg.select(
        "part_id",
        F.lit("metadata_integrity").alias("constraint"),
        F.when(F.col("n_bad") > 0, F.lit(VERDICT_FAIL))
        .otherwise(F.lit(VERDICT_PASS))
        .alias("status"),
        F.map_from_arrays(
            F.array(
                F.lit("n_rows"), F.lit("n_checked"), F.lit("n_bad"), F.lit("n_null_meta")
            ),
            F.array(
                F.col("n_rows").cast("double"),
                (F.col("n_rows") - F.col("n_null_meta")).cast("double"),
                F.col("n_bad").cast("double"),
                F.col("n_null_meta").cast("double"),
            ),
        ).alias("metrics"),
        F.when(
            F.col("n_bad") > 0,
            F.format_string(
                "%d clips' payload length contradicts (sr_hz, dur_ms, codec)",
                F.col("n_bad"),
            ),
        ).alias("detail"),
    )
