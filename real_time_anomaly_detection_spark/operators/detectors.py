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
are Arrow `applyInPandas` grouped-map fits. When statsmodels/sklearn are
installed they run the reference's exact library calls
(anomaly_detector.py:163-213, seeds pinned); when absent, each falls back to
a documented pure-numpy implementation of the same rule (AR(1) residuals for
ARMA, moving-average STL-lite, a real 1-D isolation forest, full LOF, and a
two-sided extremity quantile for the 1-D OCSVM region). `ar1_residual` stays
as the explicitly dependency-free member of the family.
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
    # the reference's detect_zscore (anomaly_detector.py:146) flags NOTHING
    # when the raw median-AD is 0 — the mean-abs-dev fallback exists only in
    # detect_mad (:136) — so gate and scale on _mad_raw, never the fallback
    score = F.abs(0.6745 * (v - F.col("_med")) / F.col("_mad_raw"))
    mask = (
        (F.col("_n") >= MIN_POINTS["modified_zscore"])
        & (F.col("_mad_raw") > 0)
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


def _grouped_mask_detector(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                           method: str, mask_fn) -> DataFrame:
    """Shared Arrow `applyInPandas` harness for the model-based family: one
    grouped-map fit per key over the ts-ordered series, `mask_fn(x) -> bool[]`
    selects the anomaly records (mask -> records, anomaly_detector.py:423-425).
    Groups are per-(key, window-partition) series — bounded, never the whole
    table — so executor memory is O(series), embarrassingly parallel across
    keys (SURVEY.md §2.10)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ts", kind="stable")
        x = pdf["_v"].to_numpy(dtype=np.float64)
        mask = mask_fn(x)
        out = pdf.loc[mask, ["_key", "_ts", "_v"]].rename(
            columns={"_key": "key", "_ts": "ts", "_v": "value"}
        )
        out["method"] = method
        return out

    prepped = df.select(
        F.col(key_col).cast("string").alias("_key"),
        F.col(ts_col).alias("_ts"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return prepped.groupBy("_key").applyInPandas(fit, schema=_RECORD_SCHEMA)


def _have(module: str) -> bool:
    try:
        __import__(module)
        return True
    except ImportError:
        return False


def _ar1_resid(x: np.ndarray) -> np.ndarray:
    """Closed-form AR(1) least-squares residuals (resid[0] = 0)."""
    mu = np.nanmean(x)
    xc = x - mu
    denom = float(np.nansum(xc[:-1] * xc[:-1]))
    phi = float(np.nansum(xc[1:] * xc[:-1]) / denom) if denom > 0 else 0.0
    resid = np.empty_like(xc)
    resid[0] = 0.0
    resid[1:] = xc[1:] - phi * xc[:-1]
    return resid


def arima(df: DataFrame, key_col: str, ts_col: str, value_col: str,
          threshold: float = 3.0) -> DataFrame:
    """U7: ARIMA(1,0,1) residual rule (anomaly_detector.py:163-174): fit per
    key, flag |resid| > threshold * std(resid); < 20 points -> nothing.

    statsmodels present: the reference's exact `ARIMA(values, order=(1,0,1))`
    fit. Absent: closed-form AR(1) residuals stand in for the ARMA residuals
    (documented approximation — no MA term; same thresholding rule)."""
    use_sm = _have("statsmodels")

    def mask_fn(x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        if n < MIN_POINTS["arima"] or np.any(np.isnan(x)):
            return np.zeros(n, dtype=bool)
        if use_sm:
            try:
                from statsmodels.tsa.arima.model import ARIMA as _ARIMA

                resid = _ARIMA(x, order=(1, 0, 1)).fit().resid
            except Exception:  # reference returns no anomalies on fit failure (:174)
                return np.zeros(n, dtype=bool)
        else:
            resid = _ar1_resid(x)
        s = float(np.std(resid))
        if s == 0:
            return np.zeros(n, dtype=bool)
        mask = np.abs(resid) > threshold * s
        if not use_sm:
            mask[0] = False  # resid[0] is definitionally 0 in the AR(1) fallback
        return mask

    return _grouped_mask_detector(df, key_col, ts_col, value_col, "arima", mask_fn)


def _stl_lite_resid(x: np.ndarray, period: int) -> np.ndarray:
    """Pure-numpy STL-lite: moving-average trend (window=period, centered,
    reflect-padded) + per-phase median seasonal of the detrended series.
    Approximates statsmodels' robust STL well enough for the residual-MAD
    anomaly rule; used only when statsmodels is absent."""
    n = x.shape[0]
    half = period // 2
    padded = np.concatenate([x[half:0:-1], x, x[-2:-2 - half:-1]])
    kernel = np.ones(period) / period
    trend = np.convolve(padded, kernel, mode="same")[half:half + n]
    detr = x - trend
    seasonal = np.zeros(n)
    for ph in range(period):
        seasonal[ph::period] = np.median(detr[ph::period])
    seasonal -= seasonal.mean()
    return x - trend - seasonal


def stl(df: DataFrame, key_col: str, ts_col: str, value_col: str,
        period: int = 6, threshold: float = 3.0) -> DataFrame:
    """U8: STL residual rule (anomaly_detector.py:176-186): robust STL
    decomposition per key, flag |resid - median| > threshold * 1.4826 * MAD;
    < 2*period points or MAD == 0 -> nothing."""
    use_sm = _have("statsmodels")

    def mask_fn(x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        if n < 2 * period or np.any(np.isnan(x)):
            return np.zeros(n, dtype=bool)
        if use_sm:
            try:
                from statsmodels.tsa.seasonal import STL as _STL

                resid = _STL(x, period=period, robust=True).fit().resid
            except Exception:
                return np.zeros(n, dtype=bool)
        else:
            resid = _stl_lite_resid(x, period)
        med = np.median(resid)
        mad_ = np.median(np.abs(resid - med))
        if mad_ == 0:
            return np.zeros(n, dtype=bool)
        return np.abs(resid - med) > threshold * (1.4826 * mad_)

    return _grouped_mask_detector(df, key_col, ts_col, value_col, "stl", mask_fn)


# --- pure-numpy iForest/LOF used when sklearn is absent --------------------

def _iforest_scores(x: np.ndarray, rng: np.random.Generator,
                    n_trees: int = 100, subsample: int = 256) -> np.ndarray:
    """1-D isolation forest anomaly scores (Liu et al. 2008). Each tree is
    built on a subsample with uniform axis splits; on one dimension a tree
    partitions the line into intervals, so routing every point is a single
    vectorized `searchsorted` per tree."""

    def c(m: float) -> float:  # average unsuccessful-search path length
        if m <= 1:
            return 0.0
        return 2.0 * (np.log(m - 1) + 0.5772156649) - 2.0 * (m - 1) / m

    n = x.shape[0]
    sub = min(subsample, n)
    depth_limit = int(np.ceil(np.log2(max(sub, 2))))
    total_depth = np.zeros(n)
    for _ in range(n_trees):
        sample = np.sort(rng.choice(x, size=sub, replace=False))
        bounds: list[float] = []   # interior split points, sorted by construction
        leaf_depth: list[float] = []

        def build(vals: np.ndarray, depth: int) -> None:
            if depth >= depth_limit or vals.shape[0] <= 1 or vals[0] == vals[-1]:
                leaf_depth.append(depth + c(float(vals.shape[0])))
                return
            split = rng.uniform(vals[0], vals[-1])
            k = int(np.searchsorted(vals, split, side="right"))
            k = min(max(k, 1), vals.shape[0] - 1)  # both children non-empty
            build(vals[:k], depth + 1)
            bounds.append(split)
            build(vals[k:], depth + 1)

        build(sample, 0)
        leaf = np.searchsorted(np.asarray(bounds), x, side="right")
        total_depth += np.asarray(leaf_depth)[leaf]
    avg_depth = total_depth / n_trees
    return 2.0 ** (-avg_depth / max(c(float(sub)), 1e-12))


def _lof_scores(x: np.ndarray, k: int = 20) -> np.ndarray:
    """Local outlier factor on a 1-D series (Breunig et al. 2000), O(n^2)
    pairwise — groups are bounded per-key series, not whole tables."""
    n = x.shape[0]
    k = min(k, n - 1)
    d = np.abs(x[:, None] - x[None, :])
    np.fill_diagonal(d, np.inf)
    idx = np.argpartition(d, k - 1, axis=1)[:, :k]
    rows = np.arange(n)[:, None]
    kdist = np.partition(d, k - 1, axis=1)[:, k - 1]
    reach = np.maximum(d[rows, idx], kdist[idx])  # reach-dist(p, o) per neighbor o
    lrd = 1.0 / (reach.mean(axis=1) + 1e-10)
    return lrd[idx].mean(axis=1) / lrd


def isolation_forest(df: DataFrame, key_col: str, ts_col: str, value_col: str,
                     contamination: float = 0.1) -> DataFrame:
    """U9: IsolationForest (anomaly_detector.py:188-195), contamination=0.1,
    random_state=42, label -1 = anomaly; < 10 points -> nothing.

    sklearn present: the reference's exact call. Absent: pure-numpy isolation
    forest (same algorithm, seeded PCG64(42)) flagging the top-contamination
    fraction by anomaly score — same contract, not bit-identical to sklearn."""
    use_sk = _have("sklearn")

    def mask_fn(x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        if n < MIN_POINTS["isolation_forest"] or np.any(np.isnan(x)):
            return np.zeros(n, dtype=bool)
        if use_sk:
            from sklearn.ensemble import IsolationForest as _IF

            return _IF(contamination=contamination, random_state=42).fit_predict(
                x.reshape(-1, 1)
            ) == -1
        scores = _iforest_scores(x, np.random.Generator(np.random.PCG64(42)))
        return scores > np.quantile(scores, 1.0 - contamination)

    return _grouped_mask_detector(df, key_col, ts_col, value_col, "isolation_forest", mask_fn)


def lof(df: DataFrame, key_col: str, ts_col: str, value_col: str,
        contamination: float = 0.1) -> DataFrame:
    """U10: LocalOutlierFactor (anomaly_detector.py:197-203), contamination=0.1;
    < 10 points -> nothing. sklearn absent: pure-numpy LOF (k=20, sklearn's
    default n_neighbors) flagging the top-contamination fraction by LOF score."""
    use_sk = _have("sklearn")

    def mask_fn(x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        if n < MIN_POINTS["lof"] or np.any(np.isnan(x)):
            return np.zeros(n, dtype=bool)
        if use_sk:
            from sklearn.neighbors import LocalOutlierFactor as _LOF

            return _LOF(contamination=contamination).fit_predict(x.reshape(-1, 1)) == -1
        scores = _lof_scores(x)
        return scores > np.quantile(scores, 1.0 - contamination)

    return _grouped_mask_detector(df, key_col, ts_col, value_col, "lof", mask_fn)


def ocsvm(df: DataFrame, key_col: str, ts_col: str, value_col: str,
          contamination: float = 0.1) -> DataFrame:
    """U11: One-Class SVM (anomaly_detector.py:205-213): StandardScaler +
    OneClassSVM(nu=contamination), label -1 = anomaly; < 10 points -> nothing.

    sklearn absent: documented approximation — after standardization, a 1-D
    RBF OCSVM's decision region is an interval around the data mass, so flag
    the ~nu fraction with the largest |z| (two-sided extremity)."""
    use_sk = _have("sklearn")

    def mask_fn(x: np.ndarray) -> np.ndarray:
        n = x.shape[0]
        if n < MIN_POINTS["ocsvm"] or np.any(np.isnan(x)):
            return np.zeros(n, dtype=bool)
        if use_sk:
            from sklearn.preprocessing import StandardScaler as _SS
            from sklearn.svm import OneClassSVM as _OCSVM

            z = _SS().fit_transform(x.reshape(-1, 1))
            return _OCSVM(nu=contamination).fit_predict(z) == -1
        sd = np.std(x)
        if sd == 0:
            return np.zeros(n, dtype=bool)
        z = np.abs((x - np.mean(x)) / sd)
        return z > np.quantile(z, 1.0 - contamination)

    return _grouped_mask_detector(df, key_col, ts_col, value_col, "ocsvm", mask_fn)


DETECTORS = {
    "zscore": zscore,
    "iqr": iqr,
    "mad": mad,
    "modified_zscore": modified_zscore,
    "percentile": percentile_detector,
    "sudden_change": sudden_change,
    "ar1_residual": ar1_residual,
    "arima": arima,
    "stl": stl,
    "isolation_forest": isolation_forest,
    "lof": lof,
    "ocsvm": ocsvm,
}


def detect(df: DataFrame, key_col: str, ts_col: str, value_col: str,
           method: str = "zscore", **kw) -> DataFrame:
    """Dispatch mirroring the reference's method switch (anomaly_detector.py:416-419)."""
    if method in DETECTORS:
        return DETECTORS[method](df, key_col, ts_col, value_col, **kw)
    raise ValueError(f"unknown method {method!r}")
