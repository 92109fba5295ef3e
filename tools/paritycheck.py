"""Strict local parity check: run queries() vs oracle_sql() at sf0.01 and
compare exact values + dtypes after canonical column/row sort.

Usage: python tools/paritycheck.py [query ...]
"""
from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sortable = [c for c in df.columns if df[c].dtype != object or True]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, ora_df: pd.DataFrame) -> bool:
    a, b = canon(ray_df), canon(ora_df)
    ok = True
    if list(a.columns) != list(b.columns):
        print(f"  [{name}] COLUMN MISMATCH ray={list(a.columns)} oracle={list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  [{name}] ROWCOUNT ray={len(a)} oracle={len(b)}")
        return False
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            print(f"  [{name}] DTYPE col={c} ray={a[c].dtype} oracle={b[c].dtype}")
            ok = False
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        try:
            neq = ~(pd.Series(av) == pd.Series(bv)).to_numpy()
            both_nan = pd.isna(pd.Series(av)).to_numpy() & pd.isna(pd.Series(bv)).to_numpy()
            neq = neq & ~both_nan
        except Exception as e:
            print(f"  [{name}] compare error col={c}: {e}")
            ok = False
            continue
        if neq.any():
            idx = np.flatnonzero(neq)[:5]
            print(f"  [{name}] VALUES col={c} ndiff={neq.sum()}")
            for i in idx:
                print(f"     row {i}: ray={av[i]!r} oracle={bv[i]!r}")
            ok = False
    return ok


def main():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import importlib
    entry = importlib.import_module("__ray_entry__")
    qs, sqls = entry.queries(), entry.oracle_sql()
    names = sys.argv[1:] or [n for n in qs if n in sqls]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    n_ok = 0
    for name in names:
        if name not in sqls:
            print(f"[{name}] (no oracle, skipped)")
            continue
        ray_df = to_pandas(qs[name](SF_DIR))
        ora_df = con.execute(sqls[name]).df()
        ok = compare(name, ray_df, ora_df)
        print(f"[{name}] {'OK' if ok else 'MISMATCH'}")
        n_ok += ok
    print(f"{n_ok}/{len(names)} strict-OK")


if __name__ == "__main__":
    main()
