"""Local mirror of the driver's DuckDB differential oracle.

Compares a Spark DataFrame against DuckDB running the oracle SQL on the same
parquet files: row count, column names, and order-insensitive values with
float tolerance (the driver's value-hash is tolerance-aware per FIXTURES.md).
"""

from __future__ import annotations

import math

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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, rtol: float = 1e-6):
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
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                both_nan = (isinstance(a, float) and math.isnan(a)) and (
                    isinstance(b, float) and math.isnan(b)
                )
                if not both_nan and not math.isclose(
                    a, b, rel_tol=rtol, abs_tol=1e-9
                ):
                    raise AssertionError(
                        f"col {c!r} row {i}: spark={a!r} oracle={b!r}"
                    )
        else:
            if not g.equals(w):
                diff = (g != w)
                i = int(diff[diff].index[0])
                raise AssertionError(
                    f"col {c!r} first diff at row {i}: "
                    f"spark={g.iloc[i]!r} oracle={w.iloc[i]!r}"
                )
