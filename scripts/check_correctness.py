"""Mimic the driver's correctness gate: run each queries()[name](sf_dir)
and oracle_sql()[name] side-by-side, compare row count + schema +
order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import logging
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS {len(ray_df)} vs {len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # The driver's value-hash is typed: an int64 Ray column vs a
        # float64 oracle column (DuckDB HUGEINT -> pandas float) hash
        # differently even when numerically identical. Fail on kind
        # divergence so untyped SUM()/COUNT() oracles can't pass here
        # and then red-flag at the driver (round-3 lesson).
        if av.dtype.kind != bv.dtype.kind:
            return f"DTYPE[{c}] {av.dtype} vs {bv.dtype}"
        if av.dtype.kind == "f":
            if not np.allclose(av, bv, rtol=0, atol=0, equal_nan=True):
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUES[{c}] e.g. {av[bad]} vs {bv[bad]}"
        else:
            if not (av == bv).all():
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUES[{c}] e.g. {av[bad]} vs {bv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"{name:28s} RAY-ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only rows={len(ray_df)} ray={t_ray:.1f}s")
            n_ok += 1
            continue
        t0 = time.time()
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} SQL-ERROR {type(e).__name__}: {e}")
            n_bad += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        status = "OK " if verdict == "OK" else "FAIL"
        if verdict == "OK":
            n_ok += 1
        else:
            n_bad += 1
        print(f"{name:28s} {status} rows={len(ray_df)} ray={t_ray:.1f}s "
              f"sql={time.time()-t0:.1f}s {'' if verdict=='OK' else verdict}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
