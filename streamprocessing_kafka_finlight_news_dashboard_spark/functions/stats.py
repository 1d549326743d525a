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


def exact_quantile_values(
    df,
    col: str,
    fracs: list[tuple[int, int]],
    cell_scale: float = 1000.0,
    max_fine_rows: int = 1_000_000,
) -> list[float]:
    """EXACT order statistics of a double column at 100-TB scale
    without a global sort: the classic two-pass distributed selection.

    Quantiles are given as RATIONALS ``(num, den)``; the target is the
    value at ascending 1-based rank ``ceil(num·n/den)`` computed in
    exact integer arithmetic (type-1 quantile — float ``ceil(q*n)``
    can land one rank off when q·n is an exact integer, and a
    cross-engine oracle must agree on the rank bit-for-bit).

    Pass 1 groups values into fixed-width cells (``floor(v·cell_scale)``
    — monotone, so cells partition the order) and collects the cell
    histogram; the driver walks cumulative counts to find each rank's
    cell and residual rank. Pass 2 collects per-VALUE counts within
    just the target cells and walks to the residual. Both collects are
    bounded: the histogram by the column's range × cell_scale, the
    fine pass by cell width × the value grid (≤ 1001 distinct values
    per 1e-3 cell for a round-6 column) — model-sized driver collects,
    the same contract as the quantizer/BPE training collects, never
    O(corpus). Compare percentile_approx: one pass but sketch-
    approximate past ``accuracy`` rows; this is two passes and exact
    at any n.

    The fine-pass bound is a PROPERTY OF THE DATA, not of the
    algorithm: on a continuous (non-rounded) double column a single
    cell can hold one distinct value PER ROW, making the second
    collect O(cell population). ``max_fine_rows`` enforces the
    contract mechanically (ADVICE r9): the distinct-value count of the
    target cells is checked distributed-side before anything is
    collected, and breach raises with the tuning guidance instead of
    silently materializing a corpus-sized collect on the driver.
    """
    for num, den in fracs:
        if not 1 <= num <= den:
            # num > den would ask for a rank past n: the cell walk
            # would never break and the result list would silently
            # shorten AND misalign positionally with fracs
            raise ValueError(f"exact_quantile_values: quantile {num}/{den} not in (0, 1]")
    c = F.col(col)
    # NaN is not NULL: isNotNull keeps it, floor(NaN)·cast maps it to
    # an arbitrary cell and it poisons the driver-side value walk —
    # exclude it like NULL (a NaN has no place in an order statistic)
    clean = df.filter(c.isNotNull() & ~F.isnan(c))
    # limit(N+1).collect() bounds the driver transfer BY CONSTRUCTION
    # (one pass; no separate count() re-executing the aggregate — r10
    # ADVICE) while still detecting the over-bound case via the +1 row.
    coarse_rows = (
        clean.groupBy(F.floor(c * cell_scale).cast("long").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .limit(max_fine_rows + 1)
        .collect()
    )
    if len(coarse_rows) > max_fine_rows:
        raise ValueError(
            f"exact_quantile_values: coarse histogram exceeds "
            f"{max_fine_rows} cells — the column's range × cell_scale="
            f"{cell_scale} is too wide for a bounded driver collect; "
            "lower cell_scale or pre-clip the column."
        )
    hist = {r["cell"]: r["cnt"] for r in coarse_rows}
    n = sum(hist.values())
    if n == 0:
        raise ValueError(f"exact_quantile_values: no non-null rows in {col}")
    ranks = [(num * n + den - 1) // den for num, den in fracs]
    targets = []  # (rank, cell, residual)
    for rank in ranks:
        cum = 0
        for cell in sorted(hist):
            if cum + hist[cell] >= rank:
                targets.append((rank, cell, rank - cum))
                break
            cum += hist[cell]
    fine_grouped = (
        clean.filter(
            F.floor(c * cell_scale)
            .cast("long")
            .isin([cell for _, cell, _ in targets])
        )
        .groupBy(F.floor(c * cell_scale).cast("long").alias("cell"), c.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # limit(N+1) bounds the driver collect BY CONSTRUCTION in ONE
    # pass (a separate count() would re-execute the filtered
    # scan+aggregate — r10 ADVICE); the +1 row detects a dense cell
    # (continuous doubles, or a cell_scale far too coarse for the
    # column's range) and fails loudly.
    fine = fine_grouped.limit(max_fine_rows + 1).collect()
    if len(fine) > max_fine_rows:
        raise ValueError(
            f"exact_quantile_values: fine pass would collect more than "
            f"max_fine_rows={max_fine_rows} distinct (cell, value) "
            f"rows — the target cells are too dense for a bounded "
            f"driver collect. This column is effectively continuous at "
            f"cell_scale={cell_scale}: raise cell_scale so cells "
            "narrow (fewer distinct values each), round the column "
            "upstream, or raise max_fine_rows if the driver can "
            "genuinely hold the collect."
        )
    by_cell: dict[int, list] = {}
    for r in fine:
        by_cell.setdefault(r["cell"], []).append((r["v"], r["cnt"]))
    out = []
    for _, cell, residual in targets:
        cum = 0
        for v, cnt in sorted(by_cell[cell]):
            cum += cnt
            if cum >= residual:
                out.append(v)
                break
    return out


def exact_quantile_values_by_group(
    df,
    group_col: str,
    col: str,
    fracs: list[tuple[int, int]],
    cell_scale: float = 1000.0,
    max_fine_rows: int = 1_000_000,
) -> dict:
    """GROUPED exact order statistics: :func:`exact_quantile_values`
    run once per group value in the SAME two distributed passes — the
    stratified form (CCNet buckets per language, per-source score
    cutpoints) where sorting within each group (a low-cardinality
    window over corpus-sized input, skewed by the hot group) is the
    plan-shape to avoid at scale.

    Pass 1 is one groupBy(group, cell) histogram whose collect is
    bounded by |groups| × range × cell_scale; the driver walks each
    group's cumulative counts independently. Pass 2 restricts the
    per-value count to exactly the (group, cell) target pairs — a
    bounded OR-of-conjunctions predicate (≤ |groups| clauses, pushed
    to the scan) — with the same ``max_fine_rows`` loud-fail bound.
    Returns {group_value: [value per frac]}; groups with no non-null
    rows are absent.
    """
    for num, den in fracs:
        if not 1 <= num <= den:
            raise ValueError(
                f"exact_quantile_values_by_group: quantile {num}/{den} not in (0, 1]"
            )
    c = F.col(col)
    g = F.col(group_col)
    clean = df.filter(c.isNotNull() & ~F.isnan(c) & g.isNotNull())
    cell_expr = F.floor(c * cell_scale).cast("long")
    # The coarse (group, cell) histogram is O(|groups| × cells): a
    # high-cardinality group column would otherwise materialize
    # exactly the unbounded driver collect the fine-pass bound exists
    # to prevent (r10 ADVICE). limit(N+1) bounds it by construction.
    coarse = (
        clean.groupBy(g.alias("grp"), cell_expr.alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .limit(max_fine_rows + 1)
        .collect()
    )
    if len(coarse) > max_fine_rows:
        raise ValueError(
            f"exact_quantile_values_by_group: coarse histogram exceeds "
            f"{max_fine_rows} (group, cell) rows — the group column "
            f"'{group_col}' is too high-cardinality (or cell_scale="
            f"{cell_scale} too fine) for the stratified two-pass "
            "form; aggregate to a coarser stratum first or lower "
            "cell_scale."
        )
    hist: dict = {}
    for r in coarse:
        hist.setdefault(r["grp"], {})[r["cell"]] = r["cnt"]
    if not hist:
        raise ValueError(
            f"exact_quantile_values_by_group: no non-null rows in {col}"
        )
    targets: dict = {}  # grp -> [(rank, cell, residual) per frac]
    for grp, cells in hist.items():
        n = sum(cells.values())
        tlist = []
        for num, den in fracs:
            rank = (num * n + den - 1) // den
            cum = 0
            for cell in sorted(cells):
                if cum + cells[cell] >= rank:
                    tlist.append((rank, cell, rank - cum))
                    break
                cum += cells[cell]
        targets[grp] = tlist
    pred = None
    for grp, tlist in targets.items():
        clause = (g == F.lit(grp)) & cell_expr.isin(
            sorted({cell for _, cell, _ in tlist})
        )
        pred = clause if pred is None else (pred | clause)
    fine_grouped = (
        clean.filter(pred)
        .groupBy(g.alias("grp"), cell_expr.alias("cell"), c.alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # limit(N+1) bounds the collect by construction in ONE pass — a
    # separate count() would re-execute the filtered scan+aggregate
    # (the same r10-ADVICE fix as the ungrouped passes above)
    fine = fine_grouped.limit(max_fine_rows + 1).collect()
    if len(fine) > max_fine_rows:
        raise ValueError(
            f"exact_quantile_values_by_group: fine pass would collect "
            f"more than max_fine_rows={max_fine_rows} distinct "
            "(group, cell, value) rows — see exact_quantile_values for "
            "tuning (cell_scale / upstream rounding / max_fine_rows)."
        )
    by_gc: dict = {}
    for r in fine:
        by_gc.setdefault((r["grp"], r["cell"]), []).append((r["v"], r["cnt"]))
    out: dict = {}
    for grp, tlist in targets.items():
        vals = []
        for _, cell, residual in tlist:
            cum = 0
            for v, cnt in sorted(by_gc[(grp, cell)]):
                cum += cnt
                if cum >= residual:
                    vals.append(v)
                    break
        out[grp] = vals
    return out
