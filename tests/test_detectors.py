"""Detector + spatial-verification parity tests.

Pins the reference's exact detector semantics (SURVEY.md §2.10) on hand-built
series, and reproduces the two documented end-to-end walkthroughs:
device failure (stream_detection/examples/device-failure.md: stuck 99-degree
sensor -> critical_failure) and weather event (all stations move together ->
weather_event).
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from real_time_anomaly_detection_spark.operators import detectors, spatial

T0 = dt.datetime(2024, 1, 1)


def series_df(spark, values_by_key: dict, step_min: int = 10):
    rows = [
        (k, T0 + dt.timedelta(minutes=step_min * i), float(v) if v is not None else None)
        for k, vals in values_by_key.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_zscore_matches_numpy_population_std(spark):
    vals = [10.0, 11, 9, 10, 12, 10, 11, 9, 10, 50]  # one huge spike
    df = series_df(spark, {"s1": vals})
    out = detectors.zscore(df, "key", "ts", "value").toPandas()
    arr = np.array(vals)
    mu, sigma = arr.mean(), arr.std()  # np.std = population (anomaly_detector.py:117)
    expected = arr[(arr > mu + 3 * sigma) | (arr < mu - 3 * sigma)]
    assert sorted(out.value) == sorted(expected.tolist())


def test_zscore_constant_series_flags_nothing(spark):
    df = series_df(spark, {"s1": [5.0] * 10})
    assert detectors.zscore(df, "key", "ts", "value").count() == 0


def test_zscore_min_points_gate(spark):
    df = series_df(spark, {"s1": [1.0, 100.0]})  # n=2 < 3
    assert detectors.zscore(df, "key", "ts", "value").count() == 0


def test_iqr_matches_numpy(spark):
    vals = [1.0, 2, 2, 3, 3, 3, 4, 4, 5, 30, -20]
    df = series_df(spark, {"s1": vals})
    out = detectors.iqr(df, "key", "ts", "value").toPandas()
    q1, q3 = np.percentile(vals, [25, 75])
    iqr = q3 - q1
    expected = [v for v in vals if v < q1 - 1.5 * iqr or v > q3 + 1.5 * iqr]
    assert sorted(out.value) == sorted(expected)


def test_mad_zero_fallback_to_mean_abs(spark):
    # MAD = 0 (majority identical) -> fallback to mean abs deviation
    # (anomaly_detector.py:136-137)
    vals = [10.0] * 8 + [10.0, 99.0]
    df = series_df(spark, {"s1": vals})
    out = detectors.mad(df, "key", "ts", "value").toPandas()
    med = np.median(vals)
    ad = np.abs(np.array(vals) - med)
    mad_raw = np.median(ad)
    assert mad_raw == 0.0
    scale = 1.4826 * ad.mean()
    expected = [v for v in vals if abs(v - med) / scale > 3.5]
    assert sorted(out.value) == sorted(expected)


def test_modified_zscore(spark):
    vals = [10.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 25.0]
    df = series_df(spark, {"s1": vals})
    out = detectors.modified_zscore(df, "key", "ts", "value").toPandas()
    med = np.median(vals)
    mad_ = np.median(np.abs(np.array(vals) - med))
    expected = [v for v in vals if abs(0.6745 * (v - med) / mad_) > 3]
    assert sorted(out.value) == sorted(expected)


def test_percentile_detector(spark):
    vals = list(np.linspace(0, 100, 101))
    df = series_df(spark, {"s1": vals})
    out = detectors.percentile_detector(df, "key", "ts", "value").toPandas()
    lo, hi = np.percentile(vals, [1, 99])
    expected = [v for v in vals if v < lo or v > hi]
    assert sorted(out.value) == sorted(expected)


def test_sudden_change_first_element_never_flagged(spark):
    vals = [100.0, 10.0, 11.0, 90.0, 91.0]
    df = series_df(spark, {"s1": vals})
    out = detectors.sudden_change(df, "key", "ts", "value", max_change=50).toPandas()
    # diffs: -90 (flag), +1, +79 (flag), +1 ; first element untouched
    assert sorted(out.value) == [10.0, 90.0]


def test_ar1_residual_flags_level_break(spark):
    rng = np.random.default_rng(3)
    smooth = list(np.cumsum(rng.normal(0, 0.1, 40)) + 10)
    smooth[25] = 60.0  # isolated break
    df = series_df(spark, {"s1": smooth})
    out = detectors.ar1_residual(df, "key", "ts", "value").toPandas()
    assert 60.0 in set(out.value)
    assert len(out) <= 3


def test_model_detectors_constant_series(spark):
    # every model-based method runs (library or numpy fallback) and flags
    # nothing on a constant series; full goldens in test_model_detectors.py
    df = series_df(spark, {"s1": [1.0] * 20})
    for m in ("arima", "stl", "isolation_forest", "lof", "ocsvm"):
        out = detectors.detect(df, "key", "ts", "value", method=m).toPandas()
        assert len(out) == 0, m


def test_multi_key_single_job(spark):
    # n must be >= ~11 for a single outlier to exceed 3 population-sigma
    # (max z for one outlier among n is (n-1)/sqrt(n))
    df = series_df(spark, {"a": [1.0] * 29 + [9.0], "b": [2.0] * 30})
    out = detectors.zscore(df, "key", "ts", "value").toPandas()
    assert set(out.key) == {"a"}
    assert list(out.value) == [9.0]


# ---------------------------------------------------------------- spatial


@pytest.fixture(scope="module")
def dims(spark):
    # 5 stations within ~30 km, similar elevation (neighbor graph is complete)
    rows = [
        ("s1", 47.00, 8.00, 400.0),
        ("s2", 47.10, 8.05, 420.0),
        ("s3", 47.05, 8.15, 380.0),
        ("s4", 46.95, 8.10, 450.0),
        ("s5", 47.02, 7.90, 410.0),
    ]
    return spark.createDataFrame(rows, "key string, lat double, lon double, elev double")


def test_neighbor_graph_symmetric(spark, dims):
    g = spatial.neighbor_graph(dims, radius_km=100, max_elev_diff=500).toPandas()
    assert len(g) == 20  # complete graph of 5, both directions
    pairs = set(zip(g.key, g.neighbor))
    assert all((b, a) in pairs for a, b in pairs)


def test_neighbor_graph_elevation_cutoff(spark):
    rows = [("a", 47.0, 8.0, 0.0), ("b", 47.01, 8.0, 1000.0)]
    d = spark.createDataFrame(rows, "key string, lat double, lon double, elev double")
    assert spatial.neighbor_graph(d).count() == 0


def test_spatial_mad_flags_outlier_station(spark, dims):
    g = spatial.neighbor_graph(dims)
    snap = spark.createDataFrame(
        [("s1", 99.0), ("s2", 20.0), ("s3", 21.0), ("s4", 19.5), ("s5", 20.5)],
        "key string, value double",
    )
    out = spatial.spatial_mad_check(snap, g, var_kind="temp").toPandas().set_index("key")
    assert bool(out.loc["s1", "is_spatial_anomaly"])
    assert not bool(out.loc["s2", "is_spatial_anomaly"])
    assert out.loc["s1", "n_neighbors"] == 4


def _obs(spark, series: dict):
    rows = []
    for k, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((k, T0 + dt.timedelta(minutes=10 * i), float(v)))
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def test_device_failure_verdict(spark, dims):
    """The device-failure walkthrough: suspect stuck at 99 while neighbors
    follow the weather -> uncorrelated -> critical_failure."""
    t = np.arange(24)
    weather = 20 + 3 * np.sin(t / 4)
    series = {f"s{i}": weather + 0.2 * i for i in range(2, 6)}
    series["s1"] = np.full(24, 99.0)
    series["s1"][5:8] = [99.1, 98.9, 99.0]
    obs = _obs(spark, series)
    g = spatial.neighbor_graph(dims)
    suspects = spark.createDataFrame([("s1",)], "key string")
    corr = spatial.trend_correlation(obs, g, suspects)
    v = spatial.classify_verdict(corr).toPandas().iloc[0]
    assert v.n_neighbors == 4
    assert v.verdict == "critical_failure"
    assert v.median_corr < 0.3


def test_weather_event_verdict(spark, dims):
    """All stations trend together (cold front) -> consistent -> weather_event."""
    t = np.arange(24)
    front = 20 - t  # sharp drop everywhere
    rng = np.random.default_rng(1)
    series = {f"s{i}": front + rng.normal(0, 0.3, 24) for i in range(1, 6)}
    obs = _obs(spark, series)
    g = spatial.neighbor_graph(dims)
    suspects = spark.createDataFrame([("s1",)], "key string")
    v = spatial.classify_verdict(spatial.trend_correlation(obs, g, suspects)).toPandas().iloc[0]
    assert v.verdict == "weather_event"
    assert v.median_corr > 0.6


def test_unverified_when_no_neighbors(spark):
    d = spark.createDataFrame(
        [("lone", 47.0, 8.0, 100.0)], "key string, lat double, lon double, elev double"
    )
    obs = _obs(spark, {"lone": [1.0] * 10})
    g = spatial.neighbor_graph(d)
    suspects = spark.createDataFrame([("lone",)], "key string")
    v = spatial.classify_verdict(spatial.trend_correlation(obs, g, suspects)).toPandas()
    assert v.iloc[0].verdict == "unverified"


def test_max_corr_escape_hatch(spark, dims):
    """Code-vs-docs divergence pinned: median <= 0.6 but max > 0.8 is still
    'consistent' (anomaly_detector.py:371)."""
    t = np.arange(24).astype(float)
    series = {
        "s1": t,            # suspect trends up
        "s2": t,            # one neighbor perfectly correlated (max > 0.8)
        "s3": -t,           # rest anti-correlated (median < 0.6)
        "s4": -t,
        "s5": -t,
    }
    obs = _obs(spark, series)
    g = spatial.neighbor_graph(dims)
    suspects = spark.createDataFrame([("s1",)], "key string")
    v = spatial.classify_verdict(spatial.trend_correlation(obs, g, suspects)).toPandas().iloc[0]
    assert v.median_corr <= 0.6 and v.max_corr > 0.8
    assert v.verdict == "weather_event"
