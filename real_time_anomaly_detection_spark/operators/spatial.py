"""Spatial verification: neighbor graph, snapshot deviation, trend correlation.

Recasts the reference's spatial verifier (`anomaly_detector.py:215-409`,
`generate_map.py:23-74`) distributed:

- `neighbor_graph` (J2): all-pairs haversine+elevation theta join over the
  dimension table. Dims are small (14 stations in the reference) -> broadcast
  nested-loop; a grid-prefiltered variant exists in queries.q22 for big dims.
- `elevation_adjust` (F5): lapse-rate adjustment, temp 0.65deg/100m,
  pressure 1.2hPa/10m (`anomaly_detector.py:235-238`).
- `spatial_mad_check` (U12): per key, deviation of the latest value from the
  elevation-adjusted neighbor median, scaled by neighbor MAD with the
  reference's fallback chain MAD -> std -> 1e-6 (`anomaly_detector.py:262-266`);
  flagged when score > 3; needs >= 2 neighbors (`:255-258`).
- `trend_correlation` (U13): per suspect, align suspect+neighbor series on
  time (pandas pivot), interpolate gaps (method='time', limit=2,
  both directions), dropna, Pearson per neighbor, median/max rollup
  (`anomaly_detector.py:317-373`) — an Arrow `applyInPandas` group per
  suspect (group = suspect + its <= O(10) neighbors' window rows).
- `classify_verdict` (U14): the reference's verdict trichotomy
  (`anomaly_detector.py:385-404`). NOTE the code-vs-docs divergence the
  engine preserves from CODE: `is_trend_consistent = median > 0.6 OR
  max > 0.8` (docs say median only; `anomaly_detector.py:371` adds the max
  escape) — pinned by test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CORR_CONSISTENT_MEDIAN = 0.6
CORR_CONSISTENT_MAX = 0.8
CORR_FAILURE = 0.3
MIN_ALIGNED_POINTS = 5  # W7, anomaly_detector.py:358
MIN_NEIGHBORS = 2


def haversine_km(lat1, lon1, lat2, lon2):
    """Catalyst column expression (F4, anomaly_detector.py:217-221)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dlat = p2 - p1
    dlon = F.radians(lon2) - F.radians(lon1)
    h = F.sin(dlat / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlon / 2) ** 2
    return 2 * 6371.0 * F.asin(F.sqrt(h))


def neighbor_graph(
    dims: DataFrame,
    key_col: str = "key",
    radius_km: float = 100.0,
    max_elev_diff: float = 500.0,
) -> DataFrame:
    """(key, neighbor, dist_km, elev_diff) pairs, both directions.

    dims: (key, lat, lon, elev). Reference: anomaly_detector.py:224-232
    (100 km / 500 m); generate_map.py:57-74 uses 50 km.
    """
    a = dims.select(
        F.col(key_col).alias("key"),
        F.col("lat").alias("_lat_a"),
        F.col("lon").alias("_lon_a"),
        F.col("elev").alias("_elev_a"),
    )
    b = dims.select(
        F.col(key_col).alias("neighbor"),
        F.col("lat").alias("_lat_b"),
        F.col("lon").alias("_lon_b"),
        F.col("elev").alias("_elev_b"),
    )
    dist = haversine_km(F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("key") != F.col("neighbor"))
        .withColumn("dist_km", dist)
        .withColumn("elev_diff", F.col("_elev_b") - F.col("_elev_a"))
        .filter((F.col("dist_km") <= radius_km) & (F.abs("elev_diff") <= max_elev_diff))
        .select("key", "neighbor", "dist_km", "elev_diff")
    )


def elevation_adjust(value, var_kind: str, elev_diff):
    """Adjust a NEIGHBOR's value to the target's elevation (F5,
    anomaly_detector.py:235-238). elev_diff = elev_neighbor - elev_target."""
    if var_kind == "temp":
        return value + (elev_diff / 100.0) * 0.65
    if var_kind == "pressure":
        return value + (elev_diff / 10.0) * 1.2
    return value


def spatial_mad_check(
    snapshot: DataFrame,
    graph: DataFrame,
    value_col: str = "value",
    var_kind: str = "temp",
    threshold: float = 3.0,
) -> DataFrame:
    """U12: per key, |v - median(neighbor values adjusted)| / (1.4826*scale) > t.

    snapshot: one row per key (key, value) — the latest observation.
    Fallback chain for a zero MAD: MAD -> stddev_pop -> 1e-6
    (anomaly_detector.py:262-266). Output: key, n_neighbors, neighbor_median,
    deviation_score, is_spatial_anomaly (null score when < 2 neighbors).
    """
    nb_vals = graph.join(
        snapshot.select(F.col("key").alias("neighbor"), F.col(value_col).alias("_nv")),
        "neighbor",
    ).withColumn("_nv_adj", elevation_adjust(F.col("_nv"), var_kind, F.col("elev_diff")))
    # MAD needs a two-pass: median first, then median absolute deviation
    med = nb_vals.groupBy("key").agg(F.median("_nv_adj").alias("_med"))
    mad_df = (
        nb_vals.join(med, "key")
        .withColumn("_ad", F.abs(F.col("_nv_adj") - F.col("_med")))
        .groupBy("key")
        .agg(
            F.count("_nv_adj").alias("n_neighbors"),
            F.first("_med").alias("neighbor_median"),
            F.median("_ad").alias("_mad"),
            F.stddev_pop("_nv_adj").alias("_std"),
        )
    )
    # the reference substitutes mad = std(nb_vals) or 1e-6 and STILL divides
    # by 1.4826*mad (anomaly_detector.py:265-267) — the factor applies to the
    # fallback too, else fallback scores come out 1.4826x too large
    scale = 1.4826 * F.when(F.col("_mad") > 0, F.col("_mad")).otherwise(
        F.when(F.col("_std") > 0, F.col("_std")).otherwise(F.lit(1e-6))
    )
    out = snapshot.join(mad_df, "key", "left").select(
        "key",
        F.col(value_col).cast("double").alias("value"),
        F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
        "neighbor_median",
        F.when(
            F.col("n_neighbors") >= MIN_NEIGHBORS,
            F.abs(F.col(value_col) - F.col("neighbor_median")) / scale,
        ).alias("deviation_score"),
    )
    return out.withColumn(
        "is_spatial_anomaly",
        F.when(F.col("deviation_score").isNotNull(), F.col("deviation_score") > threshold),
    )


_CORR_SCHEMA = (
    "key string, n_neighbors int, n_aligned int, median_corr double, "
    "max_corr double, is_trend_consistent boolean"
)


def trend_correlation(
    obs: DataFrame,
    graph: DataFrame,
    suspects: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """U13: per suspect, Pearson correlation of its series vs each neighbor's,
    after time-interpolation (limit 2, both directions) and aligned dropna —
    the exact pandas sequence of anomaly_detector.py:352-371, executed as one
    `applyInPandas` group per suspect.

    obs: long-format (key, ts, value) already restricted to the verification
    window. suspects: (key) rows to verify.
    """
    pairs = suspects.select(F.col(key_col).alias("_suspect")).join(
        graph.select(F.col("key").alias("_suspect"), "neighbor"), "_suspect"
    )
    # rows shipped to each suspect-group: the suspect's own series + each
    # neighbor's series (tagged with the series key it aligns as)
    sus_rows = suspects.select(F.col(key_col).alias("_suspect")).join(
        obs.select(
            F.col(key_col).alias("_suspect"),
            F.col(ts_col).alias("_ts"),
            F.col(value_col).cast("double").alias("_v"),
        ),
        "_suspect",
    ).select("_suspect", F.lit("__self__").alias("_series"), "_ts", "_v")
    nb_rows = pairs.join(
        obs.select(
            F.col(key_col).alias("neighbor"),
            F.col(ts_col).alias("_ts"),
            F.col(value_col).cast("double").alias("_v"),
        ),
        "neighbor",
    ).select("_suspect", F.col("neighbor").alias("_series"), "_ts", "_v")
    all_rows = sus_rows.unionByName(nb_rows)

    def per_suspect(pdf: pd.DataFrame) -> pd.DataFrame:
        suspect = pdf["_suspect"].iloc[0]
        pivot = pdf.pivot_table(index="_ts", columns="_series", values="_v", aggfunc="first")
        neighbors = [c for c in pivot.columns if c != "__self__"]
        empty = pd.DataFrame(
            {
                "key": [suspect],
                "n_neighbors": [len(neighbors)],
                "n_aligned": [0],
                "median_corr": [np.nan],
                "max_corr": [np.nan],
                "is_trend_consistent": [None],
            }
        )
        if "__self__" not in pivot.columns or not neighbors:
            return empty
        pivot = pivot.sort_index()
        # exact reference sequence: anomaly_detector.py:357
        pivot = pivot.interpolate(method="time", limit_direction="both", limit=2).dropna()
        if len(pivot) < MIN_ALIGNED_POINTS:
            empty["n_aligned"] = len(pivot)
            return empty
        corrs = []
        for nb in neighbors:
            c = pivot["__self__"].corr(pivot[nb])
            if not np.isnan(c):
                corrs.append(c)
        if not corrs:
            empty["n_aligned"] = len(pivot)
            return empty
        med, mx = float(np.median(corrs)), float(np.max(corrs))
        consistent = bool(
            med > CORR_CONSISTENT_MEDIAN or mx > CORR_CONSISTENT_MAX
        )  # code semantics incl. the max>0.8 escape (anomaly_detector.py:371)
        return pd.DataFrame(
            {
                "key": [suspect],
                "n_neighbors": [len(neighbors)],
                "n_aligned": [len(pivot)],
                "median_corr": [med],
                "max_corr": [mx],
                "is_trend_consistent": [consistent],
            }
        )

    return all_rows.groupBy("_suspect").applyInPandas(per_suspect, schema=_CORR_SCHEMA)


def classify_verdict(corr_df: DataFrame) -> DataFrame:
    """U14 (anomaly_detector.py:385-404): weather_event / critical_failure /
    suspected_anomaly / unverified."""
    return corr_df.withColumn(
        "verdict",
        F.when(F.col("is_trend_consistent").isNull(), F.lit("unverified"))
        .when(F.col("is_trend_consistent"), F.lit("weather_event"))
        .when(F.col("median_corr") < CORR_FAILURE, F.lit("critical_failure"))
        .otherwise(F.lit("suspected_anomaly")),
    )
