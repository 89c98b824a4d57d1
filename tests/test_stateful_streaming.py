"""applyInPandasWithState online-detector tests: state persists across
micro-batches, flags use PRIOR statistics only (no lookahead), and the
running stats match an offline prefix computation."""

import datetime as dt

import numpy as np
import pandas as pd

from real_time_anomaly_detection_spark.streaming import stateful

T0 = dt.datetime(2024, 1, 1)


def _events_pdf(vals_by_key, t_off=0):
    rows = []
    for k, vals in vals_by_key.items():
        for i, v in enumerate(vals):
            rows.append(
                {"key": k, "ts": T0 + dt.timedelta(minutes=10 * (i + t_off)), "value": float(v)}
            )
    return pd.DataFrame(rows)


def _drain(spark, tmp_path, name, batches, **kw):
    """Write batches as separate files, stream with availableNow per batch so
    state must survive ACROSS drains (each drain = a separate query restart
    recovering from the checkpoint — the memory sink can't recover, so the
    output goes to a parquet file sink). Returns cumulative output per drain."""
    src = str(tmp_path / f"{name}_src")
    ckpt = str(tmp_path / f"{name}_ckpt")
    out = str(tmp_path / f"{name}_out")
    outs = []
    for pdf in batches:
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("key string, ts timestamp, value double").parquet(src)
        q = (
            stateful.running_anomalies(stream, emit_all=True, min_points=5, **kw)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        outs.append(spark.read.parquet(out).toPandas())
    return outs


def test_state_survives_across_microbatches(spark, tmp_path):
    base = [10.0, 11, 9, 10, 12, 10, 11, 9, 10, 11]
    batch1 = _events_pdf({"a": base})
    batch2 = _events_pdf({"a": [10.0, 99.0, 10.0]}, t_off=10)  # spike in batch 2
    out1, out2 = _drain(spark, tmp_path, "st1", [batch1, batch2])

    # batch 2 rows carry state accumulated in batch 1: n_seen starts at 10
    assert len(out1) == 10
    b2 = (
        out2[~out2.ts.isin(out1.ts)].sort_values("ts").reset_index(drop=True)
    )
    assert list(b2.n_seen) == [10, 11, 12]
    assert bool(b2.loc[1, "is_anomaly"])  # 99 vs running stats of ~10s
    assert not bool(b2.loc[0, "is_anomaly"])
    # running stats as-of arrival match an offline prefix computation
    prefix = np.array(base + [10.0])
    assert abs(b2.loc[1, "running_mean"] - prefix.mean()) < 1e-9
    assert abs(b2.loc[1, "running_std"] - prefix.std()) < 1e-9


def test_no_lookahead_and_min_points_gate(spark, tmp_path):
    # the first min_points rows are never flagged (insufficient prior state),
    # even when they would be outliers against the FULL series
    vals = [10.0, 10, 10, 99, 10, 10, 10, 10, 10, 10]
    (out,) = _drain(spark, tmp_path, "st2", [_events_pdf({"a": vals})])
    out = out.sort_values("ts").reset_index(drop=True)
    assert not out.loc[3, "is_anomaly"]  # 99 arrived at n_seen=3 < 5
    assert out.n_seen.tolist() == list(range(10))


def test_keys_isolated(spark, tmp_path):
    # key a needs nonzero variance in the prior (U1 parity: sigma==0 flags
    # nothing); key b is constant at 50 so 50 is always normal there
    b = _events_pdf({"a": [10.0, 11, 9, 10, 12, 10, 11, 9, 50.0], "b": [50.0] * 9})
    (out,) = _drain(spark, tmp_path, "st3", [b])
    a = out[out.key == "a"].sort_values("ts")
    bb = out[out.key == "b"].sort_values("ts")
    assert bool(a.is_anomaly.iloc[-1])  # 50 anomalous for key a...
    assert not bb.is_anomaly.any()  # ...but normal for key b


def test_event_time_order_across_arrow_chunks():
    """ADVICE r2 (low): when one key's micro-batch spans multiple Arrow
    chunks, the Welford fold must process values in GLOBAL event-time order —
    a per-chunk sort would make flags depend on chunk boundaries."""

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.stored = None

        def update(self, v):
            self.stored = v

    def run(chunks):
        st = FakeState()
        outs = list(stateful._flag_and_update(("k",), iter(chunks), st, 3.0, 5, True))
        return pd.concat(outs, ignore_index=True), st.stored

    # 12 in-order points then a spike, delivered as chunks whose internal
    # order is fine but whose CONCATENATION is out of event-time order
    vals = [10.0, 11, 9, 10, 12, 10, 11, 9, 10, 11, 10, 9, 99.0]
    full = _events_pdf({"k": vals})[["ts", "value"]]
    ordered_out, ordered_state = run([full])
    # chunk 2 holds the EARLIER half: concat order != event-time order
    chunked_out, chunked_state = run(
        [full.iloc[7:].reset_index(drop=True), full.iloc[:7].reset_index(drop=True)]
    )
    pd.testing.assert_frame_equal(
        ordered_out.sort_values("ts").reset_index(drop=True),
        chunked_out.sort_values("ts").reset_index(drop=True),
    )
    assert ordered_state == chunked_state
    assert bool(ordered_out.sort_values("ts").is_anomaly.iloc[-1])  # spike flagged
