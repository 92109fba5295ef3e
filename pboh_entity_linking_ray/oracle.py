"""Dev-side mirror of the driver's Ray-vs-DuckDB comparison.

The driver runs each ``queries()`` callable and its ``oracle_sql()`` twin,
sorts columns by name, and hash-compares values.  This module reproduces
that comparison locally so parity regressions are caught by pytest before
a round's CORRECTNESS report."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form mirroring the driver's value-hash semantics: integer
    width and timestamp unit are insignificant (r1 evidence: int32-vs-int64
    and ts-unit diffs hash-matched), but int-vs-float IS significant (the
    DuckDB HUGEINT→float64 promotion was exactly the r1 hash-fail class)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(ray_result, sql: str, sf_dir: str) -> tuple[bool, str]:
    got = normalize(to_pandas(ray_result))
    con = duckdb_conn(sf_dir)
    want = normalize(con.execute(sql).fetchdf())
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row counts differ: {len(got)} vs {len(want)}"
    try:
        # exact: the driver hash-compares values, so any value or
        # int/float representation difference is a failure
        pd.testing.assert_frame_equal(got, want, check_dtype=True,
                                      check_exact=True)
    except AssertionError as e:
        return False, str(e)[:500]
    return True, "ok"
