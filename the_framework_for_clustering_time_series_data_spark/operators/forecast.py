"""Per-series forecasting operators. The recursions (Holt's linear
trend) are inherently sequential per series, so they run as
``applyInPandas`` over the series key — one shuffle, state bounded by a
single series span, NumPy inside the Arrow batch. Everything upstream
(rollup, gap-fill) and downstream stays declarative DataFrame ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def holt_linear_forecast(
    grid: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 7,
    series_col: str = "series_id",
    bucket_col: str = "bucket",
    value_col: str = "v_locf",
) -> DataFrame:
    """Holt's linear-trend exponential smoothing (Holt 1957; Hyndman &
    Athanasopoulos, FPP3 §8.2) fit per series over a UNIFORM time grid
    (use resample.gapfill_locf first — the recursion assumes equal
    steps), forecasting ``horizon`` steps ahead.

    Initialization: level = y_0, trend = y_1 - y_0; update
    l_t = α·y_t + (1-α)(l_{t-1} + b_{t-1}),
    b_t = β(l_t - l_{t-1}) + (1-β)·b_{t-1}; forecast ŷ_{T+h} = l_T + h·b_T.
    Series with fewer than 2 grid points drop (no trend estimate).
    Deterministic — fixed smoothing constants, no fitting randomness —
    but recursive, hence rows-only at the driver's correctness gate;
    tests pin exact closed-form behavior on constant and linear series.
    """
    out_schema = (
        f"{series_col} long, h int, yhat double, level double, trend double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        v = pdf[value_col].to_numpy(dtype=float)
        if len(v) < 2:
            return pd.DataFrame(
                columns=[series_col, "h", "yhat", "level", "trend"]
            ).astype({series_col: "int64", "h": "int32"})
        level, trend = float(v[0]), float(v[1] - v[0])
        for x in v[1:]:
            prev = level
            level = alpha * x + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1.0 - beta) * trend
        sid = pdf[series_col].iloc[0]
        return pd.DataFrame(
            [
                {
                    series_col: sid,
                    "h": h,
                    "yhat": round(level + h * trend, 6),
                    "level": round(level, 6),
                    "trend": round(trend, 6),
                }
                for h in range(1, horizon + 1)
            ]
        )

    from the_framework_for_clustering_time_series_data_spark.operators.grouped import grouped_apply

    # partition-batched: the Holt recursion is a scalar loop per
    # series — per-group UDF-call overhead would dominate (grouped.py)
    return grouped_apply(grid, [series_col], fit, out_schema)
