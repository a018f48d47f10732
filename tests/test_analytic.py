"""Per-group analytic (window) function tests: rank family, running
aggregates, lag/lead — planted edge cases (null keys, null order
values, null aggregates, ties) plus a DuckDB cross-check."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nailray.io import to_arrow
from nailray.ops import analytic


def _planted():
    # groups: 1 (4 rows, with a null value), 2 (1 row), null key (2 rows)
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 2, None, None], pa.int64()),
        "o": pa.array([10, 30, 20, None, 5, 2, 1], pa.int64()),
        "v": pa.array([1.0, None, 3.0, 4.0, 7.0, 9.0, 8.0], pa.float64()),
    })
    return rd.from_arrow(t).repartition(3)


def _by_o(ds, cols):
    df = to_arrow(ds).to_pandas()
    return df.sort_values("o", na_position="last").reset_index(drop=True)[cols]


def test_group_rank_row_number_and_null_keys():
    got = _by_o(analytic.group_rank(_planted(), ["k"], "o"), ["k", "o", "rn"])
    # group 1 by o asc (null o last): 10->1, 20->2, 30->3, None->4
    assert got.dropna(subset=["o"]).set_index("o")["rn"].to_dict() == {
        10: 1, 20: 2, 30: 3, 5: 1, 2: 2, 1: 1}
    assert got[got["o"].isna()]["rn"].tolist() == [4]  # null order key last
    # null group keys form ONE group (rn 1..2), not one group per row
    assert sorted(got[got["k"].isna()]["rn"].tolist()) == [1, 2]


def test_group_rank_methods_and_ties():
    t = pa.table({"k": pa.array([1] * 4, pa.int64()),
                  "o": pa.array([5, 5, 7, 9], pa.int64())})
    ds = rd.from_arrow(t).repartition(2)
    rank = _by_o(analytic.group_rank(ds, ["k"], "o", method="rank"),
                 ["o", "rn"])["rn"].tolist()
    dense = _by_o(analytic.group_rank(ds, ["k"], "o", method="dense_rank"),
                  ["o", "rn"])["rn"].tolist()
    assert rank == [1, 1, 3, 4]
    assert dense == [1, 1, 2, 3]
    import pytest
    with pytest.raises(ValueError):
        analytic.group_rank(ds, ["k"], "o", method="percentile")


def test_running_agg_sum_ignores_nulls():
    # group 1 in o order: v = 1.0(o10), 3.0(o20), None(o30), 4.0(o None)
    got = _by_o(analytic.running_agg(_planted(), ["k"], "o", "v", fn="sum"),
                ["k", "o", "running_sum"])
    by_o = got.dropna(subset=["o"]).set_index("o")["running_sum"].to_dict()
    assert by_o[10] == 1.0 and by_o[20] == 4.0
    assert by_o[30] == 4.0  # null v: frame sum unchanged, NOT null
    assert got[got["o"].isna()]["running_sum"].tolist() == [8.0]


def test_running_agg_count_min_max():
    ds = _planted()
    cnt = _by_o(analytic.running_agg(ds, ["k"], "o", "v", fn="count"),
                ["o", "running_count"])
    assert cnt.dropna(subset=["o"]).set_index("o")["running_count"].to_dict() \
        == {10: 1, 20: 2, 30: 2, 5: 1, 1: 1, 2: 2}
    mx = _by_o(analytic.running_agg(ds, ["k"], "o", "v", fn="max"),
               ["o", "running_max"])
    assert mx.set_index("o", drop=False).loc[30, "running_max"] == 3.0


def test_running_agg_all_null_prefix_is_null():
    t = pa.table({"k": pa.array([1, 1], pa.int64()),
                  "o": pa.array([1, 2], pa.int64()),
                  "v": pa.array([None, 5.0], pa.float64())})
    got = _by_o(analytic.running_agg(rd.from_arrow(t), ["k"], "o", "v"),
                ["o", "running_sum"])
    assert pd.isna(got["running_sum"].iloc[0]) and got["running_sum"].iloc[1] == 5.0


def test_group_lag_and_lead():
    ds = _planted()
    lag = _by_o(analytic.group_lag(ds, ["k"], "o", "v"), ["k", "o", "lag_v"])
    assert pd.isna(lag.set_index("o", drop=False).loc[10, "lag_v"])
    assert lag.set_index("o", drop=False).loc[20, "lag_v"] == 1.0
    lead = _by_o(analytic.group_lag(ds, ["k"], "o", "v", offset=-1),
                 ["o", "lead_v"])
    assert lead.set_index("o", drop=False).loc[10, "lead_v"] == 3.0


def test_analytic_matches_duckdb_windows(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    got = to_arrow(
        analytic.group_rank(ds, ["user_id"], "event_id", method="row_number")
        .select_columns(["event_id", "rn"])).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = con.execute(
        "SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY event_id) AS rn FROM events ORDER BY event_id").fetchdf()
    assert got["rn"].tolist() == want["rn"].tolist()


def test_percent_rank_cume_dist_ntile_vs_duckdb():
    # ties + nulls + a single-row group, cross-checked against DuckDB
    t = pa.table({
        "k": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "o": pa.array([1.0, 1.0, 2.0, None, None, 9.0], pa.float64()),
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT id, ROUND(PERCENT_RANK() OVER w, 6) pr, "
        "ROUND(CUME_DIST() OVER w, 6) cd, "
        "NTILE(4) OVER (PARTITION BY k ORDER BY id) nt "
        "FROM t WINDOW w AS (PARTITION BY k ORDER BY o) "
        "ORDER BY id").fetchdf()
    ds = rd.from_arrow(t).repartition(2)
    import pandas as pd

    def got(method, order, out):
        r = analytic.group_rank(ds, ["k"], order, method=method, out_col=out)
        return to_arrow(r).to_pandas().sort_values("id").reset_index(drop=True)

    pr = got("percent_rank", "o", "pr")
    cd = got("cume_dist", "o", "cd")
    nt = got("ntile", "id", "nt")
    assert [round(x, 6) for x in pr["pr"]] == want["pr"].tolist()
    assert [round(x, 6) for x in cd["cd"]] == want["cd"].tolist()
    assert nt["nt"].tolist() == want["nt"].tolist()


def test_group_value_first_last_positional_nulls():
    # FIRST_VALUE is positional: a null first row stays null
    t = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "o": pa.array([1, 2, 3], pa.int64()),
        "v": pa.array([None, 5.0, 7.0], pa.float64()),
    })
    ds = rd.from_arrow(t)
    first = to_arrow(analytic.group_value(ds, ["k"], "o", "v", which="first")) \
        .to_pandas().sort_values("o")
    last = to_arrow(analytic.group_value(ds, ["k"], "o", "v", which="last")) \
        .to_pandas().sort_values("o")
    assert first["first_v"].isna().all()
    assert last["last_v"].tolist() == [7.0, 7.0, 7.0]
    import pytest
    with pytest.raises(ValueError):
        analytic.group_value(ds, ["k"], "o", "v", which="middle")


# --- global exact ranks (ops.rank) -----------------------------------------

def test_global_avg_rank_matches_pandas():
    import numpy as np
    from nailray.ops.rank import global_avg_rank

    rng = np.random.default_rng(5)
    x = rng.integers(0, 40, 3000).astype(float)  # heavy ties
    df = pd.DataFrame({"x": x})
    ds = rd.from_pandas(df).repartition(7)
    m = to_arrow(global_avg_rank(ds, "x")).to_pandas().set_index("x")["x__rank"]
    got = df["x"].map(m)
    want = df["x"].rank(method="average")
    assert (got - want).abs().max() == 0.0
    # one row per distinct value
    assert len(m) == df["x"].nunique()


def test_spearman_exact_matches_pandas_with_nulls():
    import numpy as np
    from nailray.ops.rank import spearman_exact

    rng = np.random.default_rng(6)
    n = 4000
    x = rng.integers(0, 50, n).astype(float)
    y = x * 0.5 + rng.normal(0, 10, n)
    x[rng.random(n) < 0.05] = np.nan
    y[rng.random(n) < 0.05] = np.nan
    df = pd.DataFrame({"x": x, "y": y})
    rho = spearman_exact(rd.from_pandas(df).repartition(9), "x", "y")
    sub = df.dropna()
    want = sub["x"].rank().corr(sub["y"].rank())
    assert abs(rho - want) < 1e-12


def test_kendall_exact_matches_bruteforce():
    import math

    import numpy as np
    from nailray.ops.rank import kendall_exact

    rng = np.random.default_rng(8)
    n = 2500
    x = rng.integers(0, 30, n).astype(float)       # heavy ties
    y = x * 0.6 + rng.integers(0, 25, n)
    x[rng.random(n) < 0.04] = np.nan               # null pairs dropped
    df = pd.DataFrame({"x": x, "y": y})
    sub = df.dropna()
    vx, vy = sub["x"].to_numpy(), sub["y"].to_numpy()
    m = len(vx)
    sx = np.sign(vx[:, None] - vx[None, :])
    sy = np.sign(vy[:, None] - vy[None, :])
    cd = (sx * sy)[np.triu_indices(m, 1)].sum()
    n0 = m * (m - 1) / 2
    n1 = sum(v * (v - 1) / 2 for v in np.unique(vx, return_counts=True)[1])
    n2 = sum(v * (v - 1) / 2 for v in np.unique(vy, return_counts=True)[1])
    want = cd / math.sqrt((n0 - n1) * (n0 - n2))
    tau = kendall_exact(rd.from_pandas(df).repartition(7), "x", "y",
                        n_buckets=8)
    assert abs(tau - want) < 1e-9


def test_spearman_matrix_matches_pandas():
    import numpy as np
    from nailray.ops.aggregates import spearman_matrix

    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame({
        "a": rng.integers(0, 50, n).astype(float),
        "b": rng.normal(0, 1, n),
    })
    df["c"] = df["a"] * 0.3 + rng.normal(0, 5, n)
    m = spearman_matrix(rd.from_pandas(df).repartition(5), ["a", "b", "c"],
                        per_batch_sample=10000)
    want = df.rank().corr()
    for p, q in [("a", "b"), ("a", "c"), ("b", "c")]:
        assert abs(m.loc[p, q] - want.loc[p, q]) < 1e-9
        assert m.loc[p, q] == m.loc[q, p]


def test_pearson_chi2_pvalue():
    import math

    import numpy as np
    from nailray.ops.aggregates import pearson_with_p

    rng = np.random.default_rng(10)
    n = 500
    a = rng.normal(0, 1, n)
    df = pd.DataFrame({"a": a, "b": a * 0.2 + rng.normal(0, 1, n)})
    r = pearson_with_p(rd.from_pandas(df).repartition(3), "a", "b")
    assert abs(r["chi2"] - r["t"] ** 2) < 1e-9
    assert abs(r["chi2_p"] - math.erfc(abs(r["t"]) / math.sqrt(2))) < 1e-12


def test_global_avg_rank_empty_input():
    from nailray.ops.rank import global_avg_rank

    ds = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    out = global_avg_rank(ds, "x")
    assert out.count() == 0
    assert out.schema().names == ["x", "x__rank"]


def test_global_avg_rank_string_column():
    import numpy as np
    from nailray.ops.rank import global_avg_rank

    rng = np.random.default_rng(7)
    words = [f"w{int(i):03d}" for i in rng.integers(0, 60, 2000)]
    df = pd.DataFrame({"s": words})
    ds = rd.from_pandas(df).repartition(5)
    m = to_arrow(global_avg_rank(ds, "s")).to_pandas().set_index("s")["s__rank"]
    got = df["s"].map(m)
    want = df["s"].rank(method="average")  # lexicographic == numeric here
    assert (got - want).abs().max() == 0.0
