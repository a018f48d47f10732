"""Exact distributed quantiles: DuckDB quantile_disc parity, int
exactness beyond 2^53, hot-value degenerate brackets, nulls."""
import duckdb
import pyarrow as pa
import ray.data as rd

import nailray.io as nio
from nailray.ops.quantile import exact_quantiles

QS = [0.0, 0.25, 0.5, 0.75, 1.0]


def test_quantiles_float_vs_duckdb(sf_dir):
    ds = nio.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_extendedprice"])
    # small limit forces histogram-refinement rounds even at sf0.001
    df = exact_quantiles(ds, "l_extendedprice", QS, bins=64,
                         collect_limit=200)
    ora = duckdb.sql(
        f"select quantile_disc(l_extendedprice, {QS}) "
        f"from read_parquet('{sf_dir}/lineitem.parquet')").fetchone()[0]
    assert list(df["value"]) == list(ora)


def test_quantiles_int_vs_duckdb(sf_dir):
    ds = nio.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey"])
    df = exact_quantiles(ds, "l_orderkey", QS, bins=32, collect_limit=100)
    ora = duckdb.sql(
        f"select quantile_disc(l_orderkey, {QS}) "
        f"from read_parquet('{sf_dir}/lineitem.parquet')").fetchone()[0]
    assert [int(v) for v in df["value"]] == list(ora)


def test_quantiles_bigint_hot_value_and_nulls():
    """>2^53 ints (float64 rounds them) plus one value carrying 80% of
    the mass (unshrinkable bracket) plus nulls — all exact."""
    base = 1 << 60
    vals = [base + i * 7 for i in range(2000)] + [base + 3] * 8000 + [None] * 50
    t = pa.table({"x": pa.array(vals, pa.int64())})
    df = exact_quantiles(rd.from_arrow(t).repartition(4), "x",
                         [0.1, 0.5, 0.9], bins=16, collect_limit=100)
    duckdb.register("bigint_hot", t)
    ora = duckdb.sql(
        "select quantile_disc(x, [0.1, 0.5, 0.9]) from bigint_hot").fetchone()[0]
    assert [int(v) for v in df["value"]] == list(ora)


def test_quantiles_all_null_and_empty_qs():
    ds = rd.from_arrow(pa.table({"x": pa.array([None, None], pa.float64())}))
    assert exact_quantiles(ds, "x", [0.5])["value"].tolist() == [None]
    assert len(exact_quantiles(ds, "x", [])) == 0
