"""Local mirror of the driver's correctness gate: run every queries()
entry at a given sf against its oracle_sql() twin in DuckDB and compare
row count, schema (column names) and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    # normalize dtypes: ints/floats → repr strings, stable row order
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # sketch-family oracle twins read the expected parquet from the
    # scale-keyed path (__ray_entry__._expected_dir) — point them at
    # the scale this run actually uses
    os.environ["CDR_EXPECTED_SF_DIR"] = sf_dir
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            n_pass += 1
            continue
        want = con.execute(oracles[name]).df()
        problems = []
        if len(mine) != len(want):
            problems.append(f"rows {len(mine)} != {len(want)}")
        if sorted(mine.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(want.columns)}")
        if not problems and value_hash(mine) != value_hash(want):
            problems.append("value hash mismatch")
            # show first diff
            a = mine[sorted(mine.columns)].astype(str)
            b = want[sorted(want.columns)].astype(str)
            sa = set(map(tuple, a.itertuples(index=False, name=None)))
            sb = set(map(tuple, b.itertuples(index=False, name=None)))
            d1 = list(sa - sb)[:3]
            d2 = list(sb - sa)[:3]
            problems.append(f"mine-only={d1} oracle-only={d2}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
