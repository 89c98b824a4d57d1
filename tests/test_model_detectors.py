"""Model-based detector tests (U7-U11): every reference method returns real
rows on a synthetic series, mirroring the ar1_residual golden
(test_detectors.py). In this sandbox statsmodels/sklearn are absent, so these
exercise the pure-numpy fallbacks; the same assertions hold for the library
path (planted gross outliers are flagged by every member of the family)."""

import datetime as dt

import numpy as np

from real_time_anomaly_detection_spark.operators import detectors

T0 = dt.datetime(2024, 1, 1)


def series_df(spark, values_by_key: dict, step_min: int = 10):
    rows = [
        (k, T0 + dt.timedelta(minutes=step_min * i), float(v) if v is not None else None)
        for k, vals in values_by_key.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "key string, ts timestamp, value double")


def _spiky_series(n=60, spike_at=(30,), spike_val=99.0, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    x = 10.0 + np.sin(np.arange(n) * 2 * np.pi / 6) + rng.normal(0, 0.3, n)
    for i in spike_at:
        x[i] = spike_val
    return x.round(4).tolist()


def test_arima_flags_spike_and_gates_short_series(spark):
    vals = _spiky_series()
    df = series_df(spark, {"s1": vals, "short": vals[:10]})
    out = detectors.detect(df, "key", "ts", "value", method="arima").toPandas()
    assert (out.key == "s1").all()  # <20 points -> nothing (anomaly_detector.py:166)
    assert 99.0 in set(out.value)
    assert (out.method == "arima").all()


def test_stl_flags_spike_on_seasonal_series(spark):
    vals = _spiky_series()  # period-6 seasonal component built in
    df = series_df(spark, {"s1": vals, "short": vals[:8]})
    out = detectors.detect(df, "key", "ts", "value", method="stl").toPandas()
    assert (out.key == "s1").all()  # <2*period points -> nothing (:181)
    assert 99.0 in set(out.value)


def test_stl_constant_residual_flags_nothing(spark):
    # perfectly periodic series -> residuals ~0, MAD 0 -> no anomalies (:185)
    vals = ([1.0, 2.0, 3.0, 4.0, 3.0, 2.0] * 5)
    df = series_df(spark, {"s1": vals})
    assert detectors.detect(df, "key", "ts", "value", method="stl").count() == 0


def test_isolation_forest_flags_extremes(spark):
    vals = _spiky_series(spike_at=(15, 45))
    df = series_df(spark, {"s1": vals, "short": vals[:5]})
    out = detectors.detect(df, "key", "ts", "value", method="isolation_forest").toPandas()
    assert (out.key == "s1").all()  # <10 points -> nothing (:192)
    assert 99.0 in set(out.value)
    # contamination=0.1 flags ~10% of 60 points
    assert 1 <= len(out) <= 12


def test_isolation_forest_deterministic(spark):
    vals = _spiky_series()
    df = series_df(spark, {"s1": vals})
    a = detectors.isolation_forest(df, "key", "ts", "value").toPandas()
    b = detectors.isolation_forest(df, "key", "ts", "value").toPandas()
    assert sorted(a.value) == sorted(b.value)  # seeded PCG64(42) / random_state=42


def test_lof_flags_isolated_point(spark):
    vals = _spiky_series()
    df = series_df(spark, {"s1": vals, "short": vals[:5]})
    out = detectors.detect(df, "key", "ts", "value", method="lof").toPandas()
    assert (out.key == "s1").all()
    assert 99.0 in set(out.value)
    assert len(out) <= 12


def test_ocsvm_flags_extremes(spark):
    vals = _spiky_series(spike_at=(20,))
    df = series_df(spark, {"s1": vals, "short": vals[:5]})
    out = detectors.detect(df, "key", "ts", "value", method="ocsvm").toPandas()
    assert (out.key == "s1").all()
    assert 99.0 in set(out.value)
    # nu=0.1 -> ~10% of 60 points
    assert 1 <= len(out) <= 12


def test_modified_zscore_zero_mad_flags_nothing(spark):
    # reference detect_zscore has NO fallback: MAD==0 -> no anomalies
    # (anomaly_detector.py:146) even though detect_mad would flag via its
    # mean-abs fallback — the two must diverge on this series
    vals = [10.0] * 9 + [99.0]
    df = series_df(spark, {"s1": vals})
    assert detectors.modified_zscore(df, "key", "ts", "value").count() == 0
    assert detectors.mad(df, "key", "ts", "value").count() > 0


def test_iforest_scores_pure_numpy_shape():
    rng = np.random.Generator(np.random.PCG64(0))
    x = np.concatenate([rng.normal(0, 1, 200), [25.0]])
    s = detectors._iforest_scores(x, np.random.Generator(np.random.PCG64(42)))
    assert s.shape == x.shape
    assert s[-1] == s.max()  # the gross outlier isolates fastest


def test_lof_scores_pure_numpy():
    x = np.concatenate([np.linspace(0, 1, 50), [10.0]])
    s = detectors._lof_scores(x, k=5)
    assert s[-1] == s.max()
    assert np.isfinite(s).all()
