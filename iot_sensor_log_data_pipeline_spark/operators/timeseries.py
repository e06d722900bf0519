"""Time-series gap-filling operators (the hypertable surface an IoT
sensor pipeline actually needs): epoch-aligned bucketing, dense time
spines, last-observation-carried-forward, and linear interpolation --
the `time_bucket_gapfill` / `locf` / `interpolate` trio of the
published TimescaleDB API, re-expressed as DataFrame compositions.

The reference charts hourly sensor averages (README.md Kibana panels);
any real deployment has gaps (device offline, broker drop) and the
chart needs the missing buckets present and filled.  Nothing here is a
UDF: spine generation is `sequence` + `explode`, the fills are
IGNORE-NULLS window functions, all JVM-side.

Scale (100 TB): the spine is one row per (group, bucket) -- dense but
tiny next to raw events (it is the chart's own resolution), and every
window partitions by the series key, so fills never cross groups and
parallelize per series.  For unbounded retention, slice the spine per
(group, day) before exploding so no single sequence array grows past
~100k elements.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def time_bucket(ts: Column | str, seconds: int) -> Column:
    """Epoch-aligned bucket start (DuckDB ``time_bucket`` twin)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        (F.unix_timestamp(col) / seconds).cast("long") * seconds
    )


def gapfill_spine(
    bucketed: DataFrame, group_cols: list[str], bucket_col: str, seconds: int
) -> DataFrame:
    """One row per (group, bucket) from each group's min to max bucket,
    gaps included: per-group ``sequence`` + ``explode``."""
    bounds = bucketed.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    return bounds.select(
        *group_cols,
        F.explode(
            F.sequence("_lo", "_hi", F.expr(f"interval {seconds} seconds"))
        ).alias(bucket_col),
    )


def locf(value: Column | str, group_cols: list[str], order_col: str) -> Column:
    """Last observation carried forward (nulls inherit the most recent
    non-null value in the series; leading nulls stay null)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    col = F.col(value) if isinstance(value, str) else value
    return F.last(col, ignorenulls=True).over(w)


def linear_interpolate(
    value: Column | str, group_cols: list[str], bucket_col: str
) -> Column:
    """Linear interpolation across gaps: a null bucket gets the value
    on the line between the nearest non-null observations before and
    after it (weighted by bucket time distance); one-sided gaps fall
    back to the available side (flat extrapolation)."""
    col = F.col(value) if isinstance(value, str) else value
    back = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*group_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    eb = F.unix_timestamp(F.col(bucket_col)).cast("double")
    prev_v = F.last(col, ignorenulls=True).over(back)
    prev_b = F.last(F.when(col.isNotNull(), eb), ignorenulls=True).over(back)
    next_v = F.first(col, ignorenulls=True).over(fwd)
    next_b = F.first(F.when(col.isNotNull(), eb), ignorenulls=True).over(fwd)
    frac = (eb - prev_b) / (next_b - prev_b)
    return (
        F.when(col.isNotNull(), col)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )


def lttb_downsample(
    df: DataFrame,
    n_out: int,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets chart downsampling per series
    (Steinarsson 2013, the standard visual-fidelity downsampler): keep
    first and last points, split the rest into ``n_out - 2`` buckets,
    and from each bucket keep the point forming the largest triangle
    with the PREVIOUSLY SELECTED point and the next bucket's centroid.

    The selected-point recurrence is inherently sequential, so this is
    the one legitimate ``applyInPandas`` operator in the time-series
    family (a window/SQL formulation cannot express it).  Each series
    must fit one executor's memory -- the operator contract for grouped
    chart rendering (a series bigger than that should be pre-bucketed
    with ``time_bucket`` first).  Deterministic: rows are ordered by
    (x, y) -- not x alone, where equal-x rows would keep arbitrary
    partition-read order -- and area ties break to the first maximal
    point (NumPy argmax semantics), so the selection is a pure function
    of the data and an external oracle can replay it (the recursive-CTE
    oracle on ``downsample_lttb_value``).  ``x_col``/``y_col`` must be
    numeric (pass epoch seconds, not raw timestamps).
    """
    import pandas as pd

    out_fields = [df.schema[c] for c in (*group_cols, x_col, y_col)]
    out_schema = T.StructType(out_fields)

    def one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[[*group_cols, x_col, y_col]]
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        # bucket boundaries over the interior points [1, n-1)
        edges = np.linspace(1, n - 1, n_out - 1).astype("int64")
        selected = [0]
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nlo, nhi = edges[b + 1], (edges[b + 2] if b + 2 < len(edges) else n)
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            ax, ay = x[selected[-1]], y[selected[-1]]
            area = np.abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            selected.append(lo + int(area.argmax()))
        selected.append(n - 1)
        return pdf.iloc[selected][[*group_cols, x_col, y_col]]

    return df.select(*group_cols, x_col, y_col).groupBy(*group_cols).applyInPandas(
        one_series, schema=out_schema
    )


def cusum_alarms(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    order_cols: list[str],
    k: float = 0.5,
    h: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM change-point detection (Page 1954) per series:
    the sequential control chart that catches SUSTAINED mean shifts a
    per-row z-score never fires on (each point is individually
    unremarkable; the cumulative drift is not).  Per group, values are
    standardized against the group's own mean/std, then folded in
    ``order_cols`` order:

        s_hi_i = max(0, s_hi_{i-1} + z_i - k)
        s_lo_i = min(0, s_lo_{i-1} + z_i + k)
        alarm_i = s_hi_i > h  or  s_lo_i < -h   (both reset to 0 after)

    ``k`` is the slack (shift size, in sigmas, to be insensitive to),
    ``h`` the decision threshold.  Emits every row with its running
    statistics and the alarm flag -- the downstream gate keeps alarms.

    Caveat (standard CUSUM practice): standardization uses the
    group's WHOLE-window mean/std, so a shift that occupies a large
    fraction of the window biases the baseline z's and can fire the
    opposite-side sum -- feed a rolling window or a held-out baseline
    period when the monitored stretch may be mostly-shifted.

    A running recurrence WITH RESET is not a window function (no
    prefix-decomposable form), so the fold runs as one grouped Arrow
    pass per series (``applyInPandas`` -- the LTTB precedent:
    inherently sequential semantics take the grouped-Python path, and
    parallelism comes from the series key, state is O(1) per group).
    ``z`` is rounded to 6 decimals BEFORE the fold so an external
    replay folding the same rounded inputs is bit-identical -- the
    engine-portability trick the md5 operators use, applied to floats.
    """
    import pandas as pd

    v = F.col(value_col).cast("double")
    stats = df.groupBy(*group_cols).agg(
        F.avg(v).alias("__mu"), F.stddev_samp(v).alias("__sd")
    )
    z = F.when(
        F.col("__sd").isNull() | (F.col("__sd") == 0.0), F.lit(0.0)
    ).otherwise(F.round((v - F.col("__mu")) / F.col("__sd"), 6))
    from ..session import default_parallelism

    # Pin the grouped-fold parallelism: the fold's input is narrow
    # (key + order + one double), so AQE coalesces the groupBy shuffle
    # to ~2 partitions at test scale and the per-group Python folds
    # serialize onto 2 cores (measured 7.8 s -> 2.1 s at sf0.1 with an
    # explicit width).  An explicit repartition by the group key both
    # spreads the groups and already satisfies FlatMapGroupsInPandas's
    # required distribution, so no second exchange is added.
    base = (
        df.join(F.broadcast(stats), group_cols)
        .select(*group_cols, *order_cols, z.alias("__z"))
        .repartition(default_parallelism(), *group_cols)
    )
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in base.schema.fields
        if f.name != "__z"
    )
    schema = f"{out_fields}, s_hi double, s_lo double, alarm boolean"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        s_hi = s_lo = 0.0
        hi, lo, alarm = [], [], []
        for zv in pdf["__z"].to_numpy():
            s_hi = max(0.0, s_hi + zv - k)
            s_lo = min(0.0, s_lo + zv + k)
            fired = s_hi > h or s_lo < -h
            hi.append(round(s_hi, 6))
            lo.append(round(s_lo, 6))
            alarm.append(fired)
            if fired:
                s_hi = s_lo = 0.0
        out = pdf.drop(columns=["__z"]).copy()
        out["s_hi"] = hi
        out["s_lo"] = lo
        out["alarm"] = alarm
        return out

    return base.groupBy(*group_cols).applyInPandas(fold, schema)


def seasonal_residual_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    series_col: str = "event_type",
    threshold: float = 3.0,
):
    """Seasonal-baseline residual anomaly scoring: per (series,
    hour-of-day) mean/std baseline, residual z = (x - mu) / sigma,
    flagged at ``|z| >= threshold`` -- the detector diurnal telemetry
    actually needs: a reading normal at 14:00 can be an outlier at
    03:00, and a GLOBAL z-score (``anomaly_rolling_zscore``'s frame,
    ``anomaly_robust_zscore``'s corpus stats) averages the cycle away
    in both the mean AND the inflated sigma.  The additive
    seasonal-decomposition special case with a cyclic seasonal index
    -- STL's job when the period is known a priori.

    Scale shape: ONE hash agg over (series x 24) keys -- the baseline
    table is seasonality-sized, never corpus-sized -- broadcast back
    for the in-row residual; no window, no shuffle of the facts beyond
    the agg's partial/final exchange.  Returns every row with
    ``season_hour / baseline_mean / residual_z / is_anomaly``; filter
    or threshold downstream.
    """
    hod = F.hour(F.col(ts_col))
    base = (
        df.groupBy(F.col(series_col).alias("__s"), hod.alias("__h"))
        .agg(
            F.avg(value_col).alias("baseline_mean"),
            F.stddev_pop(value_col).alias("__sd"),
        )
    )
    z = (F.col(value_col) - F.col("baseline_mean")) / F.col("__sd")
    return (
        df.join(
            F.broadcast(base),
            (F.col(series_col) == F.col("__s")) & (hod == F.col("__h")),
        )
        .where(F.col("__sd") > 0)
        .select(
            "*",
            hod.alias("season_hour"),
            z.alias("residual_z"),
            (F.abs(z) >= F.lit(float(threshold))).alias("is_anomaly"),
        )
        .drop("__s", "__h", "__sd")
    )
