"""Grouped ("many models") fitting: one model per group key.

The segment-models pattern (per-store demand model, per-language
quality model, per-tenant forecaster): ``groupBy(key).applyInPandas``
ships each group's rows to ONE Arrow batch where an arbitrary python
fit runs, returning a model-summary row per group. N/A in the
reference (PyCOMPSs fits one global model); standard Spark pattern.

Scale design: parallelism = number of groups; each group must fit a
single executor's memory (the applyInPandas contract — for groups
bigger than that, fall back to sufficient-statistics aggregation like
``regression.ols_fit``, which is what ``grouped_ols`` replays and the
m19 oracle checks). Skewed group sizes behave like any grouped agg —
AQE cannot split one giant group; pre-filter or sub-sample the
whales.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_fit(
    df: DataFrame,
    group_col: str,
    fit: Callable[[pd.DataFrame], dict],
    schema: str,
) -> DataFrame:
    """Fit ``fit(pdf) -> dict`` once per group; each dict becomes one
    output row (must include the group key or it is added). ``schema``
    is the output DDL string."""
    # parse with the real DDL parser — a naive split(',') mis-parses
    # parameterized/nested types like decimal(10,2) or array<struct<>>
    from pyspark.sql.types import _parse_datatype_string

    out_cols = [f.name for f in _parse_datatype_string(schema).fields]

    # no type hints: pyspark tries to infer the eval type from them
    # and warns on the (key, pdf) form
    def _run(key, pdf):
        res = fit(pdf)
        res.setdefault(group_col, key[0])
        return pd.DataFrame([{c: res.get(c) for c in out_cols}])

    return df.groupBy(group_col).applyInPandas(_run, schema=schema)


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """One OLS line per group via the grouped-model harness (numpy
    lstsq per Arrow batch). Closed-form and deterministic, so the
    result is SQL-replayable (REGR_SLOPE / REGR_INTERCEPT per group) —
    the m19 oracle checks the whole applyInPandas path end-to-end.

    Returns (group, n, slope, intercept) rounded to 6 places.
    """
    def _fit(pdf: pd.DataFrame) -> dict:
        x = pdf[x_col].to_numpy(dtype=np.float64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(x)
        # normal equations in float64 — bit-comparable to REGR_*:
        # slope = cov(x,y)/var(x) on population moments
        mx, my = x.mean(), y.mean()
        sxy = ((x - mx) * (y - my)).sum()
        sxx = ((x - mx) ** 2).sum()
        slope = sxy / sxx
        intercept = my - slope * mx
        return {
            "n": n,
            "slope": round(float(slope), 6),
            "intercept": round(float(intercept), 6),
        }

    # derive the group key's type from the input schema rather than
    # hardcoding string — non-string keys (int dates, bigint ids)
    # must round-trip with their own type
    key_ddl = df.schema[group_col].dataType.simpleString()
    return grouped_fit(
        df.select(group_col, x_col, y_col),
        group_col,
        _fit,
        f"{group_col} {key_ddl}, n long, slope double, intercept double",
    )
