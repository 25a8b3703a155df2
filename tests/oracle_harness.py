"""Local stand-in for the driver's DuckDB-oracle comparison: runs a Spark
query and its oracle SQL on the same sf dir, compares column names, row count,
and order-insensitive values."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Driver-strict canonicalization (round-1 lesson: a lenient local canon
    said 38/38 while the driver said 24/38).

    - int and float are DIFFERENT (the driver hashes pandas dtypes, so DuckDB
      HUGEINT→float64 vs Spark int64 is a mismatch even when values are equal)
    - Decimal is float-like, NOT rescued to int
    - binary (bytes/bytearray) RAISES — the driver's canonicalizer crashes on
      it (pandas sort_values → factorize → unhashable bytearray)
    """
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, (bytes, bytearray, memoryview)):
        raise TypeError(
            f"binary column reaches the oracle hash ({type(v).__name__}); "
            "emit hex()/md5() strings instead"
        )
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    return v


def _rows(df_pandas, cols):
    return sorted(
        tuple(_canon(v) for v in row) for row in df_pandas[cols].itertuples(index=False)
    )


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return list of problems ([] = match)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        return [f"{name}: column mismatch spark={sp_cols} oracle={du_cols}"]
    if len(sp) != len(du):
        problems.append(f"{name}: row count spark={len(sp)} oracle={len(du)}")
        return problems
    a, b = _rows(sp, sp_cols), _rows(du, du_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        problems.append(f"{name}: value mismatch, first diffs: {diffs}")
    return problems
