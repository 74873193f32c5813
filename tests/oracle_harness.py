"""Local mirror of the driver's DuckDB differential oracle.

Compares a Spark DataFrame against DuckDB running the oracle SQL on the same
parquet files: row count, column names, and order-insensitive values.

The driver's value-hash is TYPE-SENSITIVE and EXACT (round-3 evidence: a
DuckDB DECIMAL '35.00' hash-mismatched Spark double 35.0 despite equal
values, and a 1e-6 float difference at a rounding boundary failed). The
default comparison here mirrors that: dtype class must agree (a DECIMAL
column against a double column is a failure even when numerically equal)
and values must match exactly. Pass ``rtol`` explicitly only for tests that
deliberately check approximate pipelines outside the driver's oracle path.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

from mysoftware_nocnetintel_spark.sources import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _type_class(s: pd.Series) -> str:
    """Coarse type class used for the driver-style type-sensitivity check."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if s.dtype == object:
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, Decimal) for v in non_null):
            return "decimal"
        if len(non_null) and all(isinstance(v, bool) for v in non_null):
            return "bool"
        if len(non_null) and all(
            isinstance(v, int) and not isinstance(v, bool) for v in non_null
        ):
            return "int"
        if len(non_null) and all(isinstance(v, float) for v in non_null):
            return "float"
    return "object"


def _cells_equal(a, b) -> bool:
    """Exact scalar/array equality with NaN==NaN and null==null; no float
    tolerance — mirrors the driver's exact value-hash."""
    import numpy as np

    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(
        b, (list, tuple, np.ndarray)
    ):
        a_l = list(a) if not isinstance(a, (int, float, str)) else [a]
        b_l = list(b) if not isinstance(b, (int, float, str)) else [b]
        return len(a_l) == len(b_l) and all(
            _cells_equal(x, y) for x, y in zip(a_l, b_l)
        )
    a_na = not isinstance(a, (list, tuple)) and pd.isna(a)
    b_na = not isinstance(b, (list, tuple)) and pd.isna(b)
    if a_na or b_na:
        return bool(a_na and b_na)
    return bool(a == b)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by value (the driver is order-insensitive
    in both), WITHOUT coercing types — type divergence must stay visible."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
    key = df.apply(lambda row: tuple(repr(v) for v in row), axis=1)
    if len(df):
        df = df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def assert_matches_oracle(
    spark_df, oracle_sql: str, sf_dir: str, rtol: float | None = None
):
    got = _normalize(spark_df.toPandas())
    con = duckdb_con(sf_dir)
    want = _normalize(con.sql(oracle_sql).df())
    con.close()

    assert list(got.columns) == list(want.columns), (
        f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        tg, tw = _type_class(g), _type_class(w)
        if tg != tw:
            raise AssertionError(
                f"col {c!r} TYPE mismatch (driver hash is type-sensitive): "
                f"spark={tg} ({g.dtype}) oracle={tw} ({w.dtype}) — "
                f"e.g. spark={g.iloc[0]!r} oracle={w.iloc[0]!r}"
                if len(g)
                else f"col {c!r} TYPE mismatch: spark={tg} oracle={tw}"
            )
        if rtol is not None and tg == "float":
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                both_nan = (isinstance(a, float) and math.isnan(a)) and (
                    isinstance(b, float) and math.isnan(b)
                )
                if not both_nan and not math.isclose(a, b, rel_tol=rtol, abs_tol=1e-9):
                    raise AssertionError(f"col {c!r} row {i}: spark={a!r} oracle={b!r}")
            continue
        for i in range(len(g)):
            a, b = g.iloc[i], w.iloc[i]
            if _cells_equal(a, b):
                continue
            raise AssertionError(
                f"col {c!r} first diff at row {i} (exact compare, "
                f"driver-style): spark={a!r} oracle={b!r}"
            )
