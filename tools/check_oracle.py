"""Local mimic of the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same sf dir, compare row count,
column set, and order-insensitive values (floats rounded as produced).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_df(x) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.unsignedinteger):
            pass  # keep uint64 (simhash/digest) — int64 cast would wrap
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = E.queries()
    try:
        oracles = E.oracle_sql(sf_dir)  # flagship oracles are sf-relative
    except TypeError:
        oracles = E.oracle_sql()
    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception as e:
            print(f"{name:24s} QUERY ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(mine)} rows  [no oracle]")
            continue
        try:
            oracle = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"{name:24s} ORACLE ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if list(mine.columns) != list(oracle.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(oracle.columns)}")
        elif len(mine) != len(oracle):
            problems.append(f"rows {len(mine)} vs {len(oracle)}")
        elif not mine.equals(oracle):
            neq = (mine != oracle) & ~(mine.isna() & oracle.isna())
            bad_cols = [c for c in mine.columns if neq[c].any()]
            problems.append(f"values differ in {bad_cols}")
            for c in bad_cols[:2]:
                i = neq[c].idxmax()
                problems.append(f"  {c}[{i}]: {mine[c][i]!r} vs {oracle[c][i]!r}")
        if problems:
            print(f"{name:24s} MISMATCH: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"{name:24s} OK ({len(mine)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} failed")
    ray.shutdown()
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main() else 0)
