"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf dir and diff against oracle_sql() via DuckDB.

    python scripts/check_oracles.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj):
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name, mine: pd.DataFrame, oracle: pd.DataFrame) -> str:
    if len(mine) != len(oracle):
        return f"ROWS {len(mine)} vs {len(oracle)}"
    a, b = canon(mine), canon(oracle)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating):
            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                exact = "EXACT-MISMATCH"
                if np.allclose(av.astype(float), bv.astype(float), rtol=1e-9, equal_nan=True):
                    return f"FLOAT-ULP {c} ({exact} but within 1e-9)"
                return f"VALUES {c}"
        else:
            if not (av == bv).all():
                bad = np.nonzero(av != bv)[0][:3]
                return f"VALUES {c} e.g. rows {bad.tolist()} {av[bad]} vs {bv[bad]}"
    return "OK"


def main():
    args = sys.argv[1:]
    only: set | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    if only is not None:
        missing = only - set(qs)
        if missing:
            print(f"unknown queries: {sorted(missing)}")
            return 1
        qs = {n: f for n, f in qs.items() if n in only}
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        try:
            mine = to_pandas(fn(sf_dir))
            if name in oracles:
                oracle = con.sql(oracles[name]).df()
                results[name] = compare(name, mine, oracle)
            else:
                results[name] = f"rows-only ({len(mine)} rows)"
        except Exception as exc:
            results[name] = f"ERROR {type(exc).__name__}: {exc}"
    width = max(len(n) for n in results)
    fails = 0
    for name, status in results.items():
        print(f"{name:<{width}}  {status}")
        if status != "OK" and not status.startswith("rows-only"):
            fails += 1
    print(f"\n{len(results) - fails}/{len(results)} clean")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
