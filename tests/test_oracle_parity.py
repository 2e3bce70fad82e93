"""Driver-style correctness gate, run locally: every ``queries()`` entry
with an ``oracle_sql()`` entry must match DuckDB on row count, column
names and (order-insensitive) values — the same compare the driver
applies at sf0.01."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert sorted(got.columns) == sorted(want.columns), (
        name, sorted(got.columns), sorted(want.columns))
    assert len(got) == len(want), (name, len(got), len(want))
    g, w = _norm(got), _norm(want)
    for col in g.columns:
        gv, wv = g[col], w[col]
        # dtype discipline: a float column where the oracle has ints (or
        # vice versa) is a value-hash mismatch at the driver even when
        # the numbers compare equal — fail it here too (round-1
        # q_hash_join escaped locally exactly this way).
        assert (gv.dtype.kind == "f") == (wv.dtype.kind == "f"), (
            name, col, gv.dtype, wv.dtype)
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            ga = gv.to_numpy(dtype=np.float64, na_value=np.nan)
            wa = wv.to_numpy(dtype=np.float64, na_value=np.nan)
            assert np.allclose(ga, wa, rtol=0, atol=0, equal_nan=True), (
                name, col, ga[~np.isclose(ga, wa, equal_nan=True)][:5])
        elif str(gv.dtype).startswith("datetime") or str(wv.dtype).startswith("datetime"):
            assert (pd.to_datetime(gv).values == pd.to_datetime(wv).values).all(), (name, col)
        else:
            assert gv.astype(str).tolist() == wv.astype(str).tolist(), (
                name, col, gv[gv.astype(str) != wv.astype(str)][:5])


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name):
    got = _to_pandas(QUERIES[name](SF_DIR))
    want = _oracle(ORACLES[name])
    _compare(name, got, want)


def test_every_query_is_oracle_gated():
    """Since round 2 every ``queries()`` entry has a full SQL oracle —
    no rows-only fallbacks remain (the old fallback test auto-SKIPPED
    on its now-empty parameter set; this asserts the invariant
    explicitly instead)."""
    assert set(QUERIES.keys()) == set(ORACLES.keys())
