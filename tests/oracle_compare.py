"""Local re-implementation of the driver's DuckDB-oracle compare:
row count + column names + order-insensitive canonicalized value hash.
Used by tests so every catalog entry is pre-validated before the
driver's per-round verify."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from streamprocessing_kafka_finlight_news_dashboard_spark.sources.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        # canonicalize to 6 significant-ish decimals like the driver
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return f"{r:.6f}".rstrip("0")
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def _dtype_class(dt) -> str:
    s = str(dt).lower()
    if "int" in s:
        return "int"
    if "float" in s or "double" in s or "decimal" in s:
        return "float"
    return "other"


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}")
        return problems
    # The driver's value hash is numeric-type sensitive: a DuckDB HUGEINT
    # (sum over integers) arrives in pandas as float64 while Spark's BIGINT
    # stays int64, and identical values then hash differently. Catch any
    # int-vs-float class divergence here so the oracle SQL gets an explicit
    # CAST before the driver ever sees it.
    for c in sp.columns:
        a, b = _dtype_class(sp[c].dtype), _dtype_class(oracle_df[c].dtype)
        if {a, b} == {"int", "float"} and not (sp[c].isna().any() or oracle_df[c].isna().any()):
            problems.append(
                f"numeric type class differs on {c!r}: spark={sp[c].dtype} oracle={oracle_df[c].dtype} "
                "(add an explicit CAST in the oracle SQL)"
            )
    if len(sp) != len(oracle_df):
        problems.append(f"row count differs: spark={len(sp)} oracle={len(oracle_df)}")
    a, b = canonical_rows(sp), canonical_rows(oracle_df)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:3]
        only_oracle = [r for r in b if r not in set(a)][:3]
        problems.append(
            f"values differ: {len([r for r in a if r not in set(b)])} spark-only rows; "
            f"examples spark={only_spark} oracle={only_oracle}"
        )
    return problems
