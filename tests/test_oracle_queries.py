"""Mirror of the driver's correctness gate: every ``queries()`` entry
with an ``oracle_sql()`` twin runs against DuckDB on the same parquet
tables at sf0.001, comparing row count, column names and values (columns
sorted by name, rows sorted by all columns, floats rounded) — catching
column-name or semantics drift before the driver does."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
# sketch-family oracle twins read the expected parquet from the
# scale-keyed path (__ray_entry__._expected_dir) — point them at the
# scale this mirror runs, before oracle_sql() renders its strings
os.environ["CDR_EXPECTED_SF_DIR"] = SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _oracle_frame(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(4)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _query_names():
    import __ray_entry__ as entry

    return sorted(entry.oracle_sql())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name):
    import __ray_entry__ as entry

    q = entry.queries()[name]
    sql = entry.oracle_sql()[name]
    got = q(SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = _oracle_frame(sql)

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows vs oracle {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            ok = [
                (math.isnan(x) and math.isnan(y)) or abs(x - y) <= 1e-4 * max(1, abs(y))
                for x, y in zip(g[c], w[c])
            ]
            assert all(ok), f"{name}: value drift in float column {c}"
        else:
            assert g[c].tolist() == w[c].tolist(), f"{name}: mismatch in {c}"
