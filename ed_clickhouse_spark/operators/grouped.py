"""Grouped-map Pandas operators (SURVEY.md §2 B10) — the applyInPandas
surface for per-group logic that has no relational expression.

Kept deliberately small: anything expressible with window functions or
aggregates stays JVM-side (see q29/q31/q51); these exist for the cases
that genuinely need per-group imperative code, and as the template for
user-defined grouped transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def zscore_per_group(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score via applyInPandas (Arrow-batched grouped map).

    Note: the same result is expressible with window aggregates — this
    operator is the B10 template (per-group pandas in/out). Groups are
    shuffled once on ``keys``; each group must fit in executor memory
    (true for per-user/per-session groups; NOT for a global key)."""
    import pandas as pd

    schema = f"{', '.join(f'{k} {df.schema[k].dataType.simpleString()}' for k in keys)}, " \
             f"{value_col} double, {out_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=1)
        z = (v - v.mean()) / std if std and std > 0 else v * 0.0
        return pd.DataFrame(
            {**{k: pdf[k] for k in keys}, value_col: v, out_col: z}
        )

    return df.select(*keys, value_col).groupBy(*keys).applyInPandas(fn, schema=schema)


def resample_fill_per_group(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    freq_seconds: int,
) -> DataFrame:
    """Per-group time resampling with forward fill — the gap-filling
    variant that needs imperative state (last-observation-carried-
    forward), hence pandas. Emits one row per ``freq_seconds`` between
    each group's first and last observation."""
    import pandas as pd

    schema = f"{', '.join(f'{k} {df.schema[k].dataType.simpleString()}' for k in keys)}, " \
             f"{ts_col} timestamp, {value_col} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).set_index(ts_col)
        out = (
            pdf[[value_col]]
            .resample(f"{freq_seconds}s")
            .mean()
            .ffill()
            .reset_index()
        )
        for k in keys:
            out[k] = pdf[k].iloc[0]
        return out[[*keys, ts_col, value_col]]

    return df.select(*keys, ts_col, value_col).groupBy(*keys).applyInPandas(
        fn, schema=schema
    )
