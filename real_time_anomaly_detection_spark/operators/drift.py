"""Distribution-drift checks: PSI + KS vs a baseline snapshot (M4).

Recasts the reference's dual verification idea — "does this series deviate
from its peer baseline?" (spatial trend verification, `anomaly_detector.py:
317-373`, thresholded verdict at `:385-404`) — as per-partition distribution
comparison against a persisted baseline snapshot:

- baseline: per column, a fixed-bin histogram (fractions) + quantile grid,
  built once over a reference dataset (`make_baseline`) and stored as a tiny
  metadata table (BASELINE_SNAPSHOT schema);
- check: per partition, bin counts with the SAME bin edges via a pure Catalyst
  expression -> ONE groupBy(part_id) with n_bins conditional-sum aggregates
  (map-side combinable, O(n_bins) state, no sort, no UDF);
- PSI = sum_i (p_i - b_i) * ln(p_i / b_i) (epsilon-smoothed),
  KS  = max_i |cumsum(p)_i - cumsum(b)_i| (binned ECDF approximation —
  documented in metrics as `ks_binned`).

Scale: histogram state is n_bins doubles per partition; the whole check is a
single shuffle on part_id. The baseline is collected to the driver (it is
metadata-sized: n_columns rows) and folded into literals, so the comparison
never joins.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import VERDICT_FAIL, VERDICT_INSUFFICIENT, VERDICT_PASS

PSI_THRESHOLD = 0.25
KS_THRESHOLD = 0.15
MIN_ROWS = 10
EPS = 1e-6
DEFAULT_BINS = 24
_QGRID = [i / 20 for i in range(21)]


def make_baseline(
    reference: DataFrame,
    columns: tuple[str, ...] = ("dur_ms", "sr_hz"),
    n_bins: int = DEFAULT_BINS,
    snapshot_id: str = "baseline",
    accuracy: int = 10000,
) -> list[dict]:
    """Build the baseline snapshot rows (list of plain dicts, BASELINE_SNAPSHOT
    shape) from a reference dataset. Two jobs: range probe + histogram."""
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.count(col).alias(f"{c}__n"),
            F.percentile_approx(col, _QGRID, accuracy).alias(f"{c}__q"),
        ]
    ranges = reference.select(*[F.col(c) for c in columns]).agg(*aggs).collect()[0]

    hist_aggs = []
    edges: dict[str, tuple[float, float, float]] = {}
    for c in columns:
        lo = float(ranges[f"{c}__min"])
        hi = float(ranges[f"{c}__max"])
        width = (hi - lo) / n_bins if hi > lo else 1.0
        edges[c] = (lo, hi, width)
        b = _bin_expr(c, lo, width, n_bins)
        for i in range(n_bins):
            hist_aggs.append(
                F.sum(F.when(b == i, 1).otherwise(0)).alias(f"{c}__h{i}")
            )
    hist = reference.select(*[F.col(c) for c in columns]).agg(*hist_aggs).collect()[0]

    rows = []
    for c in columns:
        lo, hi, width = edges[c]
        n = float(ranges[f"{c}__n"]) or 1.0
        counts = [float(hist[f"{c}__h{i}"] or 0) for i in range(n_bins)]
        rows.append(
            {
                "snapshot_id": snapshot_id,
                "column_name": c,
                "bin_lo": [lo + i * width for i in range(n_bins)],
                "bin_hi": [lo + (i + 1) * width for i in range(n_bins)],
                "bin_frac": [cnt / n for cnt in counts],
                "quantile_p": list(_QGRID),
                "quantile_v": [float(v) for v in ranges[f"{c}__q"]],
                "n_rows": int(ranges[f"{c}__n"]),
            }
        )
    return rows


def _bin_expr(c: str, lo: float, width: float, n_bins: int):
    col = F.col(c).cast("double")
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))


def drift_verdicts(
    clips: DataFrame,
    baseline_rows: list[dict],
    part_col: str = "part_id",
    psi_threshold: float = PSI_THRESHOLD,
    ks_threshold: float = KS_THRESHOLD,
    min_rows: int = MIN_ROWS,
) -> DataFrame:
    """Per-(partition, column) drift verdicts. One groupBy(part_id) per column
    (unioned), each a single-shuffle conditional-sum histogram."""
    outs = []
    for row in baseline_rows:
        c = row["column_name"]
        fracs = row["bin_frac"]
        n_bins = len(fracs)
        lo = row["bin_lo"][0]
        width = row["bin_hi"][0] - row["bin_lo"][0]
        b = _bin_expr(c, lo, width, n_bins)

        aggs = [F.count(F.col(c)).alias("n_nonnull")]
        for i in range(n_bins):
            aggs.append(
                F.sum(F.when(F.col(c).isNotNull() & (b == i), 1).otherwise(0)).alias(f"h{i}")
            )
        g = clips.select(part_col, c).groupBy(part_col).agg(*aggs)

        n = F.greatest(F.col("n_nonnull").cast("double"), F.lit(1.0))
        psi = F.lit(0.0)
        ks = F.lit(0.0)
        cum_p = F.lit(0.0)
        cum_b = 0.0
        for i in range(n_bins):
            p_i = F.col(f"h{i}") / n + F.lit(EPS)
            b_i = F.lit(fracs[i] + EPS)
            psi = psi + (p_i - b_i) * (F.log(p_i) - F.lit(math.log(fracs[i] + EPS)))
            cum_p = cum_p + F.col(f"h{i}") / n
            cum_b += fracs[i]
            ks = F.greatest(ks, F.abs(cum_p - F.lit(cum_b)))

        status = (
            F.when(F.col("n_nonnull") < min_rows, F.lit(VERDICT_INSUFFICIENT))
            .when(
                (psi > psi_threshold) | (ks > ks_threshold), F.lit(VERDICT_FAIL)
            )
            .otherwise(F.lit(VERDICT_PASS))
        )
        outs.append(
            g.select(
                F.col(part_col).alias("part_id"),
                F.lit(f"drift:{c}").alias("constraint"),
                status.alias("status"),
                F.map_from_arrays(
                    F.array(F.lit("n_nonnull"), F.lit("psi"), F.lit("ks_binned")),
                    F.array(F.col("n_nonnull").cast("double"), psi, ks),
                ).alias("metrics"),
                F.when(
                    (psi > psi_threshold) | (ks > ks_threshold),
                    F.format_string("distribution drift psi=%.4f ks=%.4f", psi, ks),
                ).alias("detail"),
            )
        )
    res = outs[0]
    for df in outs[1:]:
        res = res.unionByName(df)
    return res
