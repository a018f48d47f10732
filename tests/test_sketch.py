"""Mergeable sketches: HLL distinct error bound, Count-Min heavy
hitters exactness (verify pass), sketch mergeability."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

import nailray.io as nio
from nailray import sketch


def test_hll_error_bound(sf_dir):
    ds = nio.read_parquet(f"{sf_dir}/lineitem.parquet")
    est = sketch.approx_distinct(ds, "l_orderkey")
    exact = duckdb.sql(
        f"select count(distinct l_orderkey) from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05  # ~0.8% expected at p=14


def test_hll_string_and_small_range():
    ds = rd.from_arrow(pa.table({"s": [f"v{i%7}" for i in range(1000)]}))
    assert sketch.approx_distinct(ds, "s") == 7  # linear-counting regime


def test_heavy_hitters_exact(sf_dir):
    ds = nio.read_parquet(f"{sf_dir}/events.parquet")
    hh = sketch.heavy_hitters(ds, "event_type", k=3)
    exact = duckdb.sql(
        f"select event_type, count(*) as count from read_parquet('{sf_dir}/events.parquet') "
        "group by 1 order by count desc, event_type limit 3").fetchdf()
    pd.testing.assert_frame_equal(
        hh.reset_index(drop=True), exact.reset_index(drop=True))


def test_heavy_hitters_int_column():
    vals = [1] * 500 + [2] * 300 + list(range(100, 300))
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.int64())})).repartition(4)
    hh = sketch.heavy_hitters(ds, "k", k=2)
    assert list(hh["k"]) == [1, 2]
    assert list(hh["count"]) == [500, 300]


def test_cms_upper_bound_property():
    rng = np.random.default_rng(3)
    s = pd.Series(rng.integers(0, 200, 20000))
    cms = sketch._cms_fold(sketch._hash64(s), 1024, 4)
    truth = s.value_counts()
    est = sketch.cms_estimate(cms, pd.Series(truth.index), 1024, 4)
    assert (est >= truth.to_numpy()).all()  # CMS never underestimates


def test_hll_large_int64_ids():
    """>2^53 ids must not collapse: float64 canonicalization in the hash
    would merge distinct values (reproduced 255x undercount)."""
    base = 1 << 60
    ds = rd.from_arrow(pa.table({"id": pa.array(
        [base + i for i in range(20000)], pa.int64())})).repartition(4)
    est = sketch.approx_distinct(ds, "id")
    assert abs(est - 20000) / 20000 < 0.05


def test_heavy_hitters_all_null_block():
    """An all-null block must emit candidates with the column's type,
    not a hardcoded string list (schema divergence across blocks)."""
    t1 = pa.table({"k": pa.array([7] * 50 + [8] * 20, pa.int64())})
    t2 = pa.table({"k": pa.array([None] * 10, pa.int64())})
    ds = rd.from_arrow([t1, t2])
    hh = sketch.heavy_hitters(ds, "k", k=1)
    assert list(hh["k"]) == [7] and list(hh["count"]) == [50]


def test_tdigest_rank_error_bound():
    """Merged per-block digests must estimate quantiles within a tight
    rank error on skewed and discrete data (k1 scale, delta=200)."""
    import numpy as np

    from nailray.sketch import TDigest

    rng = np.random.default_rng(0)
    for data in (rng.lognormal(0, 2, 100000),
                 rng.integers(0, 500, 100000).astype(float)):
        d = TDigest(200)
        for block in np.array_split(data, 23):
            d = d.merge(TDigest.of(block, 200))
        s = np.sort(data)
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            est = d.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.005, (q, est, true_rank)
        assert len(d.means) < 3 * 200  # bounded state


def test_tdigest_bytes_roundtrip_and_empty():
    import numpy as np

    from nailray.sketch import TDigest

    d = TDigest.of(np.arange(1000, dtype=float), 100)
    d2 = TDigest.from_bytes(d.to_bytes(), 100)
    assert np.allclose(d.means, d2.means) and np.allclose(d.weights, d2.weights)
    assert np.isnan(TDigest(100).quantile(0.5))
    # NaNs excluded at build
    d3 = TDigest.of(np.array([np.nan, 1.0, np.nan]), 100)
    assert d3.quantile(0.5) == 1.0


def test_approx_quantiles_tdigest_dataset(sf_dir):
    """The Ray path (per-block partials, driver merge) must agree with
    the exact quantiles within the sketch's rank tolerance."""
    import duckdb

    from nailray.io import read_parquet
    from nailray.sketch import approx_quantiles_tdigest

    got = approx_quantiles_tdigest(
        read_parquet(f"{sf_dir}/lineitem.parquet",
                     columns=["l_extendedprice"]),
        "l_extendedprice", [0.1, 0.5, 0.9])
    con = duckdb.connect()
    for q, est in got.items():
        lo, hi = con.execute(
            f"SELECT quantile_cont(l_extendedprice, {max(0.0, q - 0.01)}), "
            f"quantile_cont(l_extendedprice, {min(1.0, q + 0.01)}) FROM "
            f"read_parquet('{sf_dir}/lineitem.parquet')").fetchone()
        assert lo <= est <= hi, (q, est, lo, hi)


def test_approx_distinct_by_accuracy_and_layout(sf_dir):
    import duckdb

    from nailray.io import read_parquet
    from nailray.sketch import approx_distinct_by

    ds = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_returnflag", "l_partkey"])
    got = {r["l_returnflag"]: r["n_distinct_approx"]
           for r in approx_distinct_by(ds, ["l_returnflag"],
                                       "l_partkey", p=12).take_all()}
    want = dict(duckdb.sql(
        f"SELECT l_returnflag, COUNT(DISTINCT l_partkey) "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet') "
        f"GROUP BY l_returnflag").fetchall())
    assert set(got) == set(want)
    for g, exact in want.items():
        assert abs(got[g] - exact) / max(exact, 1) < 0.1, (g, got[g], exact)

    # register max-merge is layout-independent: identical estimates
    got2 = {r["l_returnflag"]: r["n_distinct_approx"]
            for r in approx_distinct_by(ds.repartition(7),
                                        ["l_returnflag"],
                                        "l_partkey", p=12).take_all()}
    assert got == got2


def test_approx_distinct_by_null_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from nailray.sketch import approx_distinct_by

    df = pd.DataFrame({"g": ["a", "a", "c", "c", None],
                       "v": [1.0, 2.0, None, None, 3.0]})
    ds = rd.from_pandas(df).repartition(2)
    got = {r["g"]: r["n_distinct_approx"]
           for r in approx_distinct_by(ds, ["g"], "v", p=8).take_all()}
    assert got["a"] == 2
    assert got["c"] == 0       # all-NULL value group surfaces with 0
    assert got[None] == 1      # NULL group key is its own group


def test_approx_distinct_by_int_keys_with_nulls(ray_session):
    """Int group keys with nulls in SOME blocks: block schemas must not
    diverge (int64 vs float64) and big int keys must survive exactly."""
    import pandas as pd
    import ray.data as rd

    from nailray.sketch import approx_distinct_by

    big = (1 << 53) + 1
    a = pd.DataFrame({"g": pd.array([big, big, None], dtype="Int64"),
                      "v": [1.0, 2.0, 3.0]})
    b = pd.DataFrame({"g": pd.array([big + 1, big + 1], dtype="Int64"),
                      "v": [1.0, 4.0]})
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    got = {r["g"]: r["n_distinct_approx"]
           for r in approx_distinct_by(ds, ["g"], "v", p=8).take_all()}
    assert got[big] == 2
    assert got[big + 1] == 2   # not merged with `big` by float rounding
    assert got[None] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="p must be"):
        approx_distinct_by(ds, ["g"], "v", p=0)


def test_approx_distinct_by_sort_exchange_path(ray_session, monkeypatch):
    import pandas as pd
    import ray.data as rd

    import nailray.shuffle as sh
    from nailray.sketch import approx_distinct_by

    df = pd.DataFrame({"g": ["a"] * 50 + ["b"] * 30,
                       "v": list(range(50)) + list(range(15)) * 2})
    ds = rd.from_pandas(df).repartition(4)
    direct = sorted(tuple(r.values()) for r in
                    approx_distinct_by(ds, ["g"], "v", p=10).take_all())
    monkeypatch.setattr(sh, "default_exchange", lambda: "sort")
    sort_path = sorted(tuple(r.values()) for r in
                       approx_distinct_by(ds, ["g"], "v", p=10).take_all())
    assert direct == sort_path
