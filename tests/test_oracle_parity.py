"""Emulates the driver's correctness gate locally: for every query with
an oracle, run the Ray pipeline AND the DuckDB SQL at sf0.01 and compare
row count + schema (column names) + order-insensitive values."""

import math

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _to_pdf(res) -> pd.DataFrame:
    if isinstance(res, rd.Dataset):
        from nailray.io import to_arrow

        return to_arrow(res).to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, con):
    got = _norm(_to_pdf(QUERIES[name](SF)))
    want = _norm(con.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa, bb = a.fillna(math.nan), b.fillna(math.nan)
            mism = ~((aa == bb) | (aa.isna() & bb.isna()))
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} float mismatches, first: "
                f"{list(zip(aa[mism][:3], bb[mism][:3]))}")
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"{name}.{c} differs"


def test_all_queries_have_unique_names():
    assert len(QUERIES) == len(set(QUERIES))
    assert set(ORACLES) <= set(QUERIES)


def test_rows_only_queries_run():
    for name in sorted(set(QUERIES) - set(ORACLES) - {"encode_corpus"}):
        res = _to_pdf(QUERIES[name](SF))
        assert len(res) >= 0, name


def test_entry_smoke():
    df = _to_pdf(entrymod.entry())
    assert len(df) == 1
    assert bool(df["bit_identical"].iloc[0]) is True
