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


def test_quantiles_by_group_vs_duckdb(sf_dir):
    from nailray.io import to_arrow
    from nailray.ops.quantile import quantiles_by

    ds = nio.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_returnflag", "l_extendedprice"])
    got = to_arrow(quantiles_by(ds, "l_extendedprice", "l_returnflag",
                                qs=(0.0, 0.25, 0.5, 0.75, 1.0))) \
        .to_pandas().sort_values(["l_returnflag", "q"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW li AS SELECT * FROM "
                f"read_parquet('{sf_dir}/lineitem.parquet')")
    want = con.execute(" UNION ALL ".join(
        f"SELECT l_returnflag, {q} AS q, "
        f"quantile_cont(l_extendedprice, {q}) AS value FROM li "
        f"GROUP BY l_returnflag" for q in (0.0, 0.25, 0.5, 0.75, 1.0))) \
        .df().sort_values(["l_returnflag", "q"]).reset_index(drop=True)
    assert got["l_returnflag"].tolist() == want["l_returnflag"].tolist()
    assert got["value"].tolist() == want["value"].tolist()  # ulp-exact


def test_quantiles_by_group_nulls_and_singletons():
    from nailray.io import to_arrow
    from nailray.ops.quantile import quantiles_by

    t = pa.table({
        "g": ["a", "a", "a", "b", "c", "c", None],
        "v": [1.0, None, 3.0, 7.0, None, None, 5.0],
    })
    out = to_arrow(quantiles_by(rd.from_arrow(t), "v", "g",
                                qs=(0.5,))).to_pandas()
    lab = {(r["g"] if isinstance(r["g"], str) else None): r["value"]
           for _, r in out.iterrows()}
    assert lab["a"] == 2.0        # nulls dropped inside the group
    assert lab["b"] == 7.0        # singleton group
    assert lab[None] == 5.0       # NULL group key is its own group
    assert "c" not in lab         # all-NULL group omitted


def test_grouped_tdigest_accuracy_and_layout_independence():
    """Grouped t-digest: per-group rank error within tolerance vs the
    exact answer at every block layout, and re-running a FIXED layout
    reproduces the estimate exactly (payload-sorted merge order;
    t-digest partials are lossy, so cross-layout values may shift
    within the error bound)."""
    import numpy as np

    from nailray.io import to_arrow
    from nailray.sketch import approx_quantiles_tdigest_by

    rng = np.random.default_rng(7)
    n = 30000
    g = np.repeat(["a", "b", "c"], n // 3)
    v = np.concatenate([rng.normal(0, 1, n // 3),
                        rng.exponential(5, n // 3),
                        rng.uniform(-10, 10, n // 3)])
    t = pa.table({"g": g, "v": v})
    qs = [0.1, 0.5, 0.9, 0.99]

    def run(n_blocks):
        ds = rd.from_arrow(t).repartition(n_blocks)
        out = to_arrow(approx_quantiles_tdigest_by(ds, "v", "g", qs)) \
            .to_pandas().sort_values(["g", "q"]).reset_index(drop=True)
        return out

    est1, est2, est1b = run(4), run(17), run(4)
    assert est1["value"].tolist() == est1b["value"].tolist()  # reproducible
    for est in (est1, est2):  # accurate at every layout
        for _, r in est.iterrows():
            grp = v[g == r["g"]]
            rank = (grp <= r["value"]).mean()
            assert abs(rank - r["q"]) < 0.02, (r["g"], r["q"], rank)


def test_grouped_quantiles_big_int_keys_with_nulls():
    """int64 keys beyond 2^53 alongside NULL keys must survive the
    pandas round-trip exactly (nullable-Int64 mapper) in BOTH grouped
    quantile ops — the default conversion widens to float64 and merges
    adjacent ids."""
    from nailray.io import to_arrow
    from nailray.ops.quantile import quantiles_by
    from nailray.sketch import approx_quantiles_tdigest_by

    big = (1 << 62) + 1
    t = pa.table({"k": pa.array([big, big, big + 1, None, None], pa.int64()),
                  "v": [1.0, 3.0, 7.0, 9.0, 11.0]})
    for op in (lambda ds: quantiles_by(ds, "v", "k", qs=(0.5,)),
               lambda ds: approx_quantiles_tdigest_by(ds, "v", "k", [0.5])):
        out = to_arrow(op(rd.from_arrow(t)))
        rows = set(zip(out.column("k").to_pylist(),
                       out.column("value").to_pylist()))
        assert (big, 2.0) in rows and (big + 1, 7.0) in rows \
            and (None, 10.0) in rows, rows
