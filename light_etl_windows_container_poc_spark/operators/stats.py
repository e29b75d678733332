"""Custom grouped-map statistics via applyInPandas (Arrow-batched).

The showcase constraint: a Python-side operator whose output still
hash-matches a SQL oracle bit-for-bit. The recipe is the same as the
JVM-side exact-aggregation rules ([[spark-oracle-float-parity]]):
accumulate integer moments exactly (numpy int64), then assemble the final
double with the IDENTICAL IEEE expression tree the oracle uses —
`(n·sxy − sx·sy) / (n·sxx − sx·sx)` with every operand cast to double
first. numpy must never touch the float math (its pairwise summation
reorders rounding); it only sums integers.
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401  (doc parity with siblings)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_OLS_SCHEMA = ("event_type string, n long, sx long, sy long, sxx long, "
               "sxy long, slope double, intercept double")


def grouped_ols(events: DataFrame, group_col: str = "event_type",
                ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Per-group OLS of value-cents against whole seconds since the
    group's first event. Integer moments stay exact up to ~sf1 group
    sizes (sum x² < 2^63); beyond that shard the time axis or move the
    moment sums to Decimal.
    """
    from ..session import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        us = pdf[ts_col].astype("datetime64[us]").astype("int64")
        secs = us // 1_000_000
        x = (secs - secs.min()).to_numpy(dtype=np.int64)
        y = np.rint(pdf[value_col].to_numpy(dtype=np.float64) * 100) \
            .astype(np.int64)
        n = len(pdf)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, sxy = int((x * x).sum()), int((x * y).sum())
        denom = float(n) * float(sxx) - float(sx) * float(sx)
        slope = ((float(n) * float(sxy) - float(sx) * float(sy)) / denom
                 if denom != 0.0 else float("nan"))
        intercept = (float(sy) - slope * float(sx)) / float(n)
        return pd.DataFrame([{
            "event_type": pdf[group_col].iloc[0], "n": n, "sx": sx,
            "sy": sy, "sxx": sxx, "sxy": sxy, "slope": slope,
            "intercept": intercept,
        }])

    return (events.select(group_col, ts_col, value_col)
            .groupBy(group_col).applyInPandas(fit, _OLS_SCHEMA))
