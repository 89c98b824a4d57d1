"""Declared StructType schemas — never inferred (reference parity: fixed DDL at
``streaming_collector_sqlite.py:79-130``; graft shape from BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import types as T

# Primary fact table: audio clip + transcript pairs, partitioned by part_id.
# part_id plays the role of the reference's 6-hour evaluation window / station
# grouping (anomaly_detector.py:42-58): the unit over which stats + verdicts
# are computed.
CLIPS = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        T.StructField("part_id", T.IntegerType(), False),
    ]
)

# Referential parent table (plays the `stations` dimension,
# streaming_collector_sqlite.py:82-93).
TRANSCRIPTS_REF = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("transcript", T.StringType(), True),
    ]
)

# Baseline snapshot for drift checks: fixed-bin histogram + quantile grid per
# column (plays the spatial-neighbor baseline, anomaly_detector.py:317-373).
BASELINE_SNAPSHOT = T.StructType(
    [
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("column_name", T.StringType(), False),
        T.StructField("bin_lo", T.ArrayType(T.DoubleType()), False),
        T.StructField("bin_hi", T.ArrayType(T.DoubleType()), False),
        # exact histogram bin width (nullable: pre-bin_width snapshots fall
        # back to bin_hi[0]-bin_lo[0], 1-ulp inexact on boundary values)
        T.StructField("bin_width", T.DoubleType(), True),
        T.StructField("bin_frac", T.ArrayType(T.DoubleType()), False),
        T.StructField("quantile_p", T.ArrayType(T.DoubleType()), False),
        T.StructField("quantile_v", T.ArrayType(T.DoubleType()), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)

# Per-(partition, constraint) verdict rows — the engine's primary output
# (recasts the JSON report schema, stream_detection/api/response.md:151-272).
PARTITION_VERDICTS = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # pass|fail|insufficient_data|error
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Row-level violation records (recasts anomaly records, anomaly_detector.py:423-425).
VIOLATIONS = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("clip_id", T.StringType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("observed", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Append-only run manifest (plays `collection_log`,
# streaming_collector_sqlite.py:120-129) — the resumability backbone.
VALIDATION_MANIFEST = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
    ]
)

VERDICT_PASS = "pass"
VERDICT_FAIL = "fail"
VERDICT_INSUFFICIENT = "insufficient_data"
VERDICT_ERROR = "error"
