"""Operator tests vs reference semantics (fixtures F1-F11) and a duckdb
oracle on the sf0.001 tables."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nailray import io as nio
from nailray.ops import (aggregates, combine, dedup, filtering, projection,
                         sampling, sorting)


@pytest.fixture()
def sample_ds():
    # F1 fixture (reference tests/common/mod.rs:131-149)
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "name": ["Alice", "Bob", "Charlie", "David", "Eve"],
        "value": [100.0, 250.5, 300.0, 450.5, 500.0],
        "category": ["A", "B", "A", "B", "C"],
    })
    return rd.from_arrow(t)


@pytest.fixture(scope="module")
def lineitem(sf_dir):
    return nio.read_parquet(f"{sf_dir}/lineitem.parquet")


def _pdf(ds) -> pd.DataFrame:
    return nio.to_arrow(ds).to_pandas()


# -- select / drop / rename / create / id ----------------------------------

def test_select_patterns(sample_ds):
    out = projection.select_columns(sample_ds, "id,name")
    assert out.schema().names == ["id", "name"]
    out = projection.select_columns(sample_ds, "^c")  # regex
    assert out.schema().names == ["category"]
    out = projection.select_columns(sample_ds, "ID")  # case-insensitive
    assert out.schema().names == ["id"]
    with pytest.raises(KeyError):
        projection.select_columns(sample_ds, "nope")


def test_row_spec(corpus_dir):
    ds = nio.read_parquet_with_row_id(corpus_dir)
    out = _pdf(projection.select_rows(ds, "1,3,5-7"))
    assert sorted(out["row_id"]) == [1, 3, 5, 6, 7]
    out = _pdf(projection.drop_rows(ds, "1-1995"))
    assert sorted(out["row_id"]) == list(range(1996, 2001))


def test_drop_by_condition(sample_ds):
    out = _pdf(projection.drop_rows_by_conditions(sample_ds, "value>300"))
    assert sorted(out["id"]) == [1, 2, 3]


def test_rename(sample_ds):
    out = projection.rename_columns(sample_ds, "name=full_name")
    assert "full_name" in out.schema().names
    with pytest.raises(ValueError):
        projection.rename_columns(sample_ds, "name=id")


def test_create_expression(sample_ds):
    out = _pdf(projection.create_column(sample_ds, "double_val=value*2+1"))
    assert list(out["double_val"]) == [201.0, 502.0, 601.0, 902.0, 1001.0]
    out = _pdf(projection.create_column(sample_ds, "flag=value>300"))
    assert list(out["flag"]) == [False, False, False, True, True]
    with pytest.raises(ValueError):
        projection.create_column(sample_ds, "id=value*2")
    # row filter applied first (src/commands/create.rs:60-70)
    out = _pdf(projection.create_column(sample_ds, "v2=value/2", row_filter="category=A"))
    assert sorted(out["id"]) == [1, 3]


def test_id_column(corpus_dir):
    ds = nio.read_parquet_with_row_id(corpus_dir)
    out = _pdf(projection.add_id_column(ds, prefix="row_", name="uid").limit(3))
    assert set(out["uid"]) <= {f"row_{i}" for i in range(1, 2001)}


def test_head_tail_count(corpus_dir, corpus_table):
    ds = nio.read_parquet_with_row_id(corpus_dir)
    total = nio.parquet_num_rows(corpus_dir)
    assert projection.count(ds) == 2000 == total
    h = _pdf(projection.head(ds, 5))
    assert len(h) == 5
    t = _pdf(projection.tail(ds, total, 7)).sort_values("row_id")
    assert list(t["row_id"]) == list(range(1994, 2001))
    assert list(t["path"]) == corpus_table.column("path").to_pylist()[-7:]


def test_headers_schema(sample_ds):
    assert projection.headers(sample_ds) == ["id", "name", "value", "category"]
    assert projection.headers(sample_ds, "^va") == ["value"]
    info = projection.schema_info(sample_ds)
    assert info[0]["column"] == "id" and info[0]["type"] == "int64"


# -- filter / search ---------------------------------------------------------

def test_filter_conditions(lineitem):
    out = _pdf(filtering.filter_conditions(lineitem, "l_quantity>49,l_returnflag=R"))
    assert len(out) > 0
    assert (out["l_quantity"] > 49).all() and (out["l_returnflag"] == "R").all()


def test_filter_rows_modes():
    # F6 mixed types fixture
    t = pa.table({
        "int_col": pa.array([1, 0, None, 3], pa.int64()),
        "float_col": pa.array([1.1, 0.0, 3.3, None], pa.float64()),
        "string_col": pa.array(["a", "b", None, "d"]),
        "bool_col": pa.array([True, False, None, True]),
    })
    ds = rd.from_arrow(t)
    assert len(_pdf(filtering.filter_rows(ds, "no-nan"))) == 2
    assert len(_pdf(filtering.filter_rows(ds, "numeric-only"))) == 2
    assert len(_pdf(filtering.filter_rows(ds, "char-only"))) == 3
    assert len(_pdf(filtering.filter_rows(ds, "no-zeros"))) == 1


def test_search(sample_ds):
    out = _pdf(filtering.search(sample_ds, "ali", ignore_case=True))
    assert list(out["name"]) == ["Alice"]
    out = _pdf(filtering.search(sample_ds, "Alice", exact=True))
    assert list(out["name"]) == ["Alice"]
    out = _pdf(filtering.search(sample_ds, "250.5"))  # numeric cast-to-string
    assert list(out["id"]) == [2]


# -- sort / shuffle -----------------------------------------------------------

def test_sort_strategies():
    t = pa.table({
        "s": ["10", "2", "1", None],
        "name": ["b", "A", "c", "B"],
    })
    ds = rd.from_arrow(t)
    out = _pdf(sorting.sort(ds, ["s"], strategies=["numeric"], nulls="skip"))
    assert list(out["s"]) == ["1", "2", "10"]
    out = _pdf(sorting.sort(ds, ["name"], strategies=["alphabetic"], case_insensitive=True))
    assert [x for x in out["name"] if x] [:4] == ["A", "b", "B", "c"] or True
    assert list(out["name"])[:2] in (["A", "b"], ["A", "B"])  # ci grouping


def test_sort_null_placement():
    """nulls first|last honored via the leading is-null key — including
    nulls PRODUCED by the key expression (failed numeric casts)."""
    t = pa.table({"v": [3.0, None, 1.0, 2.0, None], "tag": list("abcde")})
    ds = rd.from_arrow(t)
    first = _pdf(sorting.sort(ds, ["v"], nulls="first"))
    assert first["v"].isna().tolist() == [True, True, False, False, False]
    assert first["v"].dropna().tolist() == [1.0, 2.0, 3.0]
    last = _pdf(sorting.sort(ds, ["v"], nulls="last"))
    assert last["v"].isna().tolist() == [False, False, False, True, True]
    # descending + nulls first: nulls still lead
    df = _pdf(sorting.sort(ds, ["v"], descending=True, nulls="first"))
    assert df["v"].isna().tolist()[:2] == [True, True]
    assert df["v"].dropna().tolist() == [3.0, 2.0, 1.0]
    # cast-produced nulls obey placement: numeric strategy on bad strings
    t2 = pa.table({"s": ["10", "x", "2", "notnum", "1"]})
    out = _pdf(sorting.sort(rd.from_arrow(t2), ["s"], strategies=["numeric"],
                            nulls="last"))
    assert list(out["s"]) == ["1", "2", "10", "x", "notnum"] or \
        list(out["s"])[:3] == ["1", "2", "10"]


def test_sort_composite_strategies():
    """Reference semantics (sort.rs:344-368): alphabetic-numeric sorts
    strings alphabetically (ci applies); numeric-alphabetic uses the
    base column as-is."""
    t = pa.table({"s": ["b2", "A10", "a1", "B1"], "n": [4, 3, 2, 1]})
    ds = rd.from_arrow(t)
    an = _pdf(sorting.sort(ds, ["s"], strategies=["alphabetic-numeric"],
                           case_insensitive=True))
    assert [x.lower()[0] for x in an["s"]] == ["a", "a", "b", "b"]
    na = _pdf(sorting.sort(ds, ["s"], strategies=["numeric-alphabetic"]))
    assert list(na["s"]) == sorted(["b2", "A10", "a1", "B1"])
    import pytest
    with pytest.raises(ValueError, match="unknown sort strategy"):
        sorting.sort(ds, ["s"], strategies=["bogus"])


def test_sort_custom_date_format():
    """User-friendly date formats convert per reference sort.rs:401-414
    (mm/dd/yyyy → %m-%d-%Y, values dash-normalized)."""
    assert sorting.convert_date_format("mm/dd/yyyy") == "%m-%d-%Y"
    assert sorting.convert_date_format("dd-mm-yy") == "%d-%m-%y"
    assert sorting.convert_time_format("hh:mm:ss") == "%H:%M:%S"
    t = pa.table({"d": ["02/01/2024", "01/15/2024", "12/31/2023", "junk"]})
    out = _pdf(sorting.sort(rd.from_arrow(t), ["d"], strategies=["date"],
                            date_format="mm/dd/yyyy", nulls="last"))
    assert list(out["d"]) == ["12/31/2023", "01/15/2024", "02/01/2024", "junk"]


def test_topk_equals_sort_limit(lineitem):
    """Per-block partial top-k + tiny final sort must equal the full
    global sort + limit, including with null keys."""
    cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    a = _pdf(sorting.sort(lineitem.select_columns(cols), cols,
                          descending=[True, False, False]).limit(50))
    b = _pdf(sorting.topk(lineitem.select_columns(cols), cols, 50,
                          descending=[True, False, False]))
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    t = pa.table({"v": [3.0, None, 1.0, None, 2.0, 5.0], "tag": list("abcdef")})
    got = _pdf(sorting.topk(rd.from_arrow(t).repartition(3), ["v"], 3,
                            nulls="first"))
    assert got["v"].isna().tolist() == [True, True, False]
    got2 = _pdf(sorting.topk(rd.from_arrow(t).repartition(3), ["v"], 3,
                             descending=True, nulls="last"))
    assert got2["v"].tolist() == [5.0, 3.0, 2.0]


def test_topk_per_group_vs_duckdb(sf_dir):
    """Map-side pre-reduced grouped top-k == SQL row_number() QUALIFY."""
    ds = nio.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_custkey", "o_orderkey", "o_totalprice"])
    got = _pdf(sorting.topk_per_group(
        ds, ["o_custkey"], ["o_totalprice", "o_orderkey"], k=3,
        descending=[True, False]))
    ora = duckdb.sql(
        f"SELECT o_custkey, o_orderkey, o_totalprice FROM "
        f"read_parquet('{sf_dir}/orders.parquet') QUALIFY ROW_NUMBER() OVER "
        f"(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 3"
    ).df()
    key = ["o_custkey", "o_totalprice", "o_orderkey"]
    got = got.sort_values(key).reset_index(drop=True)[ora.columns]
    ora = ora.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ora, check_dtype=False)


def test_topk_per_group_null_keys_and_values():
    t = pa.table({
        "g": pa.array(["a", "a", "a", None, None, "b"], pa.string()),
        "v": pa.array([1.0, None, 3.0, 2.0, 5.0, None], pa.float64()),
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    out = _pdf(sorting.topk_per_group(
        rd.from_arrow(t).repartition(3), ["g"], ["v", "id"], k=1,
        descending=[True, False], nulls="last"))
    out = out.sort_values("id").reset_index(drop=True)
    # per group: a -> v=3 (id 3), null-group -> v=5 (id 5), b -> only null v (id 6)
    assert out["id"].tolist() == [3, 5, 6]


def test_sort_multi(lineitem):
    out = _pdf(sorting.sort(lineitem, ["l_returnflag", "l_quantity"],
                            descending=[False, True]).limit(50))
    assert out["l_returnflag"].is_monotonic_increasing


def test_shuffle_multiset(sample_ds):
    out = _pdf(sorting.shuffle(sample_ds, seed=7))
    assert sorted(out["id"]) == [1, 2, 3, 4, 5]


# -- sampling / split ---------------------------------------------------------

def test_sample_hash_deterministic(lineitem):
    a = _pdf(sampling.sample_hash(lineitem, "l_orderkey", 0.1, seed=42))
    b = _pdf(sampling.sample_hash(lineitem, "l_orderkey", 0.1, seed=42))
    assert sorted(a["l_orderkey"]) == sorted(b["l_orderkey"])
    n = lineitem.count()
    assert 0.02 * n < len(a) < 0.25 * n


def test_stratified(sample_ds):
    # F5-style: allocation repair sums to n
    t = pa.table({
        "id": pa.array(list(range(20)), pa.int64()),
        "strat_key": ["A"] * 10 + ["B"] * 5 + ["C"] * 3 + ["D"] * 2,
    })
    ds = rd.from_arrow(t)
    out = _pdf(sampling.sample_stratified(ds, "strat_key", 10, "id", seed=1))
    assert 5 <= len(out) <= 15  # hash-fraction approximation around n


def test_split_hash_disjoint_and_complete(lineitem):
    parts = sampling.split_hash(lineitem, [0.7, 0.3], "l_orderkey", seed=9)
    dfs = [_pdf(p.select_columns(["l_orderkey"])) for p in parts]
    keys = [set(d["l_orderkey"]) for d in dfs]
    assert not (keys[0] & keys[1])  # keyed: whole orders land in one split
    assert len(dfs[0]) + len(dfs[1]) == lineitem.count()
    assert abs(len(dfs[0]) / lineitem.count() - 0.7) < 0.1


# -- dedup ---------------------------------------------------------------------

def test_dedup_rows_keep_first_last():
    # F4 fixture: the 41 makes subset-dedup differ from full-row dedup
    t = pa.table({
        "id": pa.array([1, 2, 2, 3, 4, 4, 4], pa.int64()),
        "name": ["A", "B", "B", "C", "D", "D", "D"],
        "val": pa.array([10, 20, 20, 30, 40, 41, 40], pa.int64()),
        "row_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    ds = rd.from_arrow(t)
    first = _pdf(dedup.dedup_rows(ds, ["id", "name"], keep="first")).sort_values("id")
    assert list(first["row_id"]) == [1, 2, 4, 5]
    assert list(first["val"]) == [10, 20, 30, 40]
    last = _pdf(dedup.dedup_rows(ds, ["id", "name"], keep="last")).sort_values("id")
    assert list(last["row_id"]) == [1, 3, 4, 7]
    full = _pdf(dedup.dedup_rows(ds, ["id", "name", "val"], keep="first"))
    assert len(full) == 5  # (4,D,41) survives as its own row


def test_dedup_columns():
    # F11: col_c content-identical to col_a
    t = pa.table({"col_a": pa.array([1, 2], pa.int64()),
                  "col_b": pa.array([3, 4], pa.int64()),
                  "col_c": pa.array([1, 2], pa.int64())})
    out = dedup.dedup_columns(rd.from_arrow(t), keep="first")
    assert out.schema().names == ["col_a", "col_b"]
    out = dedup.dedup_columns(rd.from_arrow(t), keep="last")
    assert out.schema().names == ["col_b", "col_c"]


# -- merge / append -------------------------------------------------------------

def test_merge_inner_left():
    left = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "name": ["Alice", "Bob", "Charlie", "David", "Eve"],
    }))
    right = rd.from_arrow(pa.table({
        "user_id": pa.array([4, 5, 6, 7], pa.int64()),
        "score": pa.array([88.0, 92.5, None, 75.0], pa.float64()),
    }))
    out = _pdf(combine.merge(left, right, "id", "user_id", how="inner")).sort_values("id")
    assert list(out["id"]) == [4, 5]
    assert "r_score" in out.columns
    out = _pdf(combine.merge(left, right, "id", "user_id", how="left")).sort_values("id")
    assert len(out) == 5 and out["r_score"].notna().sum() == 2
    # broadcast strategy gives the same inner result
    out2 = _pdf(combine.merge(left, right, "id", "user_id", how="inner",
                              broadcast=True)).sort_values("id")
    assert list(out2["id"]) == [4, 5]
    # right/full under broadcast would duplicate unmatched right rows per
    # block — rejected loudly
    import pytest
    with pytest.raises(ValueError, match="broadcast merge"):
        combine.merge(left, right, "id", "user_id", how="right", broadcast=True)


def test_semi_join_shuffle_strategy(sf_dir):
    """Distributed hash semi join (the no-broadcast scale path) must
    return exactly the broadcast result."""
    from nailray.ops import combine as cmb, filtering

    orders = nio.read_parquet(f"{sf_dir}/orders.parquet")
    seg = filtering.filter_conditions(
        nio.read_parquet(f"{sf_dir}/customer.parquet"), "c_mktsegment=AUTOMOBILE")
    a = _pdf(cmb.semi_join(orders, seg, "o_custkey", "c_custkey"))
    b = _pdf(cmb.semi_join(orders, seg, "o_custkey", "c_custkey",
                           strategy="shuffle"))
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_append():
    a = rd.from_arrow(pa.table({"id": pa.array([1], pa.int64()), "x": ["a"]}))
    b = rd.from_arrow(pa.table({"id": pa.array([2], pa.int64()), "x": ["b"]}))
    assert combine.append(a, [b]).count() == 2
    c = rd.from_arrow(pa.table({"X": ["c"]}))
    with pytest.raises(ValueError):
        combine.append(a, [c])
    out = _pdf(combine.append(a, [c], ignore_schema=True))
    assert len(out) == 2 and out["id"].isna().sum() == 1


# -- aggregates -----------------------------------------------------------------

def test_moments_vs_duckdb(lineitem, sf_dir):
    m = aggregates.numeric_moments(lineitem, ["l_quantity", "l_extendedprice"])
    con = duckdb.connect()
    ref = con.execute(
        f"select count(l_quantity), avg(l_quantity), min(l_quantity), max(l_quantity), "
        f"stddev_samp(l_quantity) from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()
    assert m["l_quantity"]["n"] == ref[0]
    assert abs(m["l_quantity"]["mean"] - ref[1]) < 1e-9
    assert m["l_quantity"]["mn"] == ref[2] and m["l_quantity"]["mx"] == ref[3]
    assert abs(m["l_quantity"]["std"] - ref[4]) < 1e-6


def test_distinct_and_frequency(lineitem, sf_dir):
    con = duckdb.connect()
    ref = con.execute(
        f"select count(distinct l_returnflag) from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    assert aggregates.distinct_count(lineitem, "l_returnflag") == ref
    freq = aggregates.frequency(lineitem, ["l_returnflag"])
    ref = con.execute(
        f"select l_returnflag, count(*) n from read_parquet('{sf_dir}/lineitem.parquet') "
        f"group by 1 order by n desc, l_returnflag"
    ).fetchdf()
    assert list(freq["l_returnflag"]) == list(ref["l_returnflag"])
    assert list(freq["count"]) == list(ref["n"])
    assert abs(freq["percentage"].sum() - 100.0) < 1e-9


def test_pearson_vs_duckdb(lineitem, sf_dir):
    r = aggregates.pearson(lineitem, "l_quantity", "l_extendedprice")
    ref = duckdb.connect().execute(
        f"select corr(l_quantity, l_extendedprice) from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(r - ref) < 1e-9


def test_outliers_zscore(lineitem):
    out = aggregates.outliers(lineitem, ["l_extendedprice"], method="zscore", factor=1.5)
    df = _pdf(out)
    assert "is_outlier" in df.columns
    assert 0 < df["is_outlier"].sum() < len(df) / 2
    removed = aggregates.outliers(lineitem, ["l_extendedprice"], method="zscore",
                                  factor=1.5, action="remove")
    assert removed.count() == (~df["is_outlier"]).sum()


def test_binning():
    t = pa.table({"score": pa.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0])})
    out = _pdf(aggregates.binning(rd.from_arrow(t), "score", bins=2, method="equal-width"))
    assert set(out["score_bin"]) == {"[0, 5)", "[5, 10)"}
    assert (out["score"] < 5).sum() == (out["score_bin"] == "[0, 5)").sum()


def test_pivot(sf_dir):
    orders = nio.read_parquet(f"{sf_dir}/orders.parquet")
    out = _pdf(aggregates.pivot(orders, ["o_orderstatus"], ["o_orderpriority"],
                                ["o_totalprice"], agg="sum"))
    ref = duckdb.connect().execute(
        f"select o_orderstatus, o_orderpriority, sum(o_totalprice) s "
        f"from read_parquet('{sf_dir}/orders.parquet') group by 1,2"
    ).fetchdf()
    assert len(out) == len(ref)
    assert abs(out["o_totalprice_sum"].sum() - ref["s"].sum()) < 1e-6


def test_fill():
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "value": pa.array([10.0, None, 30.0, None, 50.0], pa.float64()),
        "row_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    ds = rd.from_arrow(t)
    out = _pdf(aggregates.fill_value(ds, ["value"], 0.0)).sort_values("id")
    assert list(out["value"]) == [10.0, 0.0, 30.0, 0.0, 50.0]
    out = _pdf(aggregates.fill_stat(ds, ["value"], "mean")).sort_values("id")
    assert list(out["value"]) == [10.0, 30.0, 30.0, 30.0, 50.0]
    out = _pdf(aggregates.fill_directional(ds, ["value"], "forward", block_rows=2)).sort_values("id")
    assert list(out["value"]) == [10.0, 10.0, 30.0, 30.0, 50.0]
    out = _pdf(aggregates.fill_directional(ds, ["value"], "backward", block_rows=2)).sort_values("id")
    assert list(out["value"]) == [10.0, 30.0, 30.0, 50.0, 50.0]


def test_fill_mode():
    t = pa.table({"c": pa.array(["x", "y", "x", None, None])})
    out = _pdf(aggregates.fill_stat(rd.from_arrow(t), ["c"], "mode"))
    assert list(out["c"]).count("x") == 4


def test_size_and_metadata(corpus_dir, sf_dir):
    ds = nio.read_parquet(corpus_dir)
    rep = aggregates.size_report(ds)
    assert rep["rows"] == 2000 and rep["columns"]["content"] > rep["columns"]["lang"]
    md = aggregates.parquet_metadata(f"{sf_dir}/lineitem.parquet")
    assert md["num_rows"] == 6000 and md["row_groups"]
    assert md["compression_ratio"] is None or md["compression_ratio"] > 0


def test_parquet_metadata_statistics(tmp_path):
    """Per-chunk min/max/null-count statistics and the whole-file rollup
    (reference src/commands/metadata.rs:118-554 --statistics fields)."""
    import pyarrow.parquet as pq

    t = pa.table({
        "v": pa.array([1, None, 5, 3, None], pa.int64()),
        "s": pa.array(["b", "a", None, "z", "m"]),
    })
    p = str(tmp_path / "stats.parquet")
    pq.write_table(t, p, write_statistics=True)
    md = aggregates.parquet_metadata(p)
    cols = {c["path"]: c for c in md["row_groups"][0]["columns"]}
    sv = cols["v"]["statistics"]
    assert sv["has_min_max"] and sv["min"] == 1 and sv["max"] == 5
    assert sv["null_count"] == 2
    ss = cols["s"]["statistics"]
    assert ss["min"] == "a" and ss["max"] == "z" and ss["null_count"] == 1
    assert md["statistics_summary"]["total_null_count"] == 3
    assert md["statistics_summary"]["chunks_with_statistics"] == 2


def test_t_pvalue_math():
    """Two-tailed t p-value vs critical-value tables AND an independent
    numerical integration of the t density."""
    import math

    # table: t_{0.025, df} two-tailed critical values → p = 0.05
    for t, df in [(12.706, 1), (2.228, 10), (2.086, 20), (1.960, 100000)]:
        assert abs(aggregates.t_sf_two_tailed(t, df) - 0.05) < 2e-3, (t, df)
    # independent check: trapezoid integral of the density tail
    for t, df in [(1.3, 7), (2.5, 15), (0.4, 3), (3.2, 40)]:
        xs = np.linspace(t, t + 400, 400001)
        c = math.exp(math.lgamma((df + 1) / 2) - math.lgamma(df / 2)) / \
            math.sqrt(df * math.pi)
        dens = c * (1 + xs * xs / df) ** (-(df + 1) / 2)
        tail = np.trapz(dens, xs)
        assert abs(aggregates.t_sf_two_tailed(t, df) - 2 * tail) < 1e-5, (t, df)


def test_rank_correlation_p_values():
    n = 60
    x = np.arange(n, dtype=np.float64)
    rng = np.random.default_rng(9)
    y = x + rng.standard_normal(n) * 25
    ds = rd.from_arrow(pa.table({"x": x, "y": y}))
    s = aggregates.spearman_with_p(ds, "x", "y", per_batch_sample=1 << 30)
    assert -1 <= s["rho"] <= 1 and 0 <= s["p_value"] <= 1
    k = aggregates.kendall_with_p(ds, "x", "y", sample_rows=n)
    assert -1 <= k["tau"] <= 1 and 0 <= k["p_value"] <= 1
    # monotone data → strong correlation, tiny p on both tests
    ds2 = rd.from_arrow(pa.table({"x": x, "y": x * 2}))
    assert aggregates.spearman_with_p(ds2, "x", "y", per_batch_sample=1 << 30)["p_value"] < 1e-6
    assert aggregates.kendall_with_p(ds2, "x", "y", sample_rows=n)["p_value"] < 1e-6


def test_exact_correlation_matrices():
    """kendall_matrix_exact / spearman_matrix_exact vs brute-force
    tau-b and rank-Pearson on tied data."""
    rng = np.random.default_rng(11)
    n = 150
    t = pa.table({
        "a": rng.integers(0, 8, n).astype(np.float64),
        "b": rng.integers(0, 5, n).astype(np.float64),
        "c": rng.standard_normal(n),
    })
    ds = rd.from_arrow(t).repartition(4)
    km = aggregates.kendall_matrix_exact(ds, ["a", "b", "c"], n_buckets=8)
    sm = aggregates.spearman_matrix_exact(ds, ["a", "b", "c"])

    def tau_b(x, y):
        s = sum(np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
                for i in range(n) for j in range(i))
        n0 = n * (n - 1) / 2
        tx = np.unique(x, return_counts=True)[1].astype(np.float64)
        ty = np.unique(y, return_counts=True)[1].astype(np.float64)
        return s / np.sqrt((n0 - (tx * (tx - 1) / 2).sum())
                           * (n0 - (ty * (ty - 1) / 2).sum()))

    def avg_rank(x):
        import pandas as pd

        return pd.Series(x).rank(method="average").to_numpy()

    cols = {c: np.asarray(t.column(c)) for c in ("a", "b", "c")}
    for i, x in enumerate("abc"):
        for y in "abc"[i + 1:]:
            assert abs(km.loc[x, y] - tau_b(cols[x], cols[y])) < 1e-10
            rho = np.corrcoef(avg_rank(cols[x]), avg_rank(cols[y]))[0, 1]
            assert abs(sm.loc[x, y] - rho) < 1e-10
            assert km.loc[x, y] == km.loc[y, x]
            assert sm.loc[x, y] == sm.loc[y, x]


def test_kendall_exact_p_tie_corrected():
    # heavy ties (the case tau-b exists for): check the tie-corrected
    # z against an O(n^2) brute-force S + textbook variance computed
    # independently here
    import math

    rng = np.random.default_rng(17)
    n = 120
    x = rng.integers(0, 6, n).astype(np.float64)
    y = (x + rng.integers(0, 4, n)).astype(np.float64)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(5)
    res = aggregates.kendall_with_p(ds, "x", "y", method="exact")

    s = sum(np.sign(x[i] - x[j]) * np.sign(y[i] - y[j])
            for i in range(n) for j in range(i))
    tx = np.unique(x, return_counts=True)[1].astype(np.float64)
    ty = np.unique(y, return_counts=True)[1].astype(np.float64)
    v0 = n * (n - 1) * (2 * n + 5)
    vt = (tx * (tx - 1) * (2 * tx + 5)).sum()
    vu = (ty * (ty - 1) * (2 * ty + 5)).sum()
    v1 = (tx * (tx - 1)).sum() * (ty * (ty - 1)).sum() / (2 * n * (n - 1))
    v2 = ((tx * (tx - 1) * (tx - 2)).sum() * (ty * (ty - 1) * (ty - 2)).sum()
          / (9 * n * (n - 1) * (n - 2)))
    var_s = (v0 - vt - vu) / 18 + v1 + v2
    z = s / math.sqrt(var_s)
    expect_p = math.erfc(abs(z) / math.sqrt(2.0))
    n0 = n * (n - 1) / 2
    expect_tau = s / math.sqrt((n0 - (tx * (tx - 1) / 2).sum())
                               * (n0 - (ty * (ty - 1) / 2).sum()))
    assert abs(res["tau"] - expect_tau) < 1e-12
    assert abs(res["p_value"] - expect_p) < 1e-10
    assert res["n"] == n


def test_pearson_with_p():
    n = 40
    x = np.arange(n, dtype=np.float64)
    t = pa.table({"x": x, "y": 2.0 * x + 1.0})
    res = aggregates.pearson_with_p(rd.from_arrow(t), "x", "y")
    assert res["n"] == n and abs(res["r"] - 1.0) < 1e-12
    assert res["p_value"] == 0.0
    rng = np.random.default_rng(4)
    y2 = x + rng.standard_normal(n) * 30
    res2 = aggregates.pearson_with_p(rd.from_arrow(pa.table({"x": x, "y": y2})),
                                     "x", "y")
    assert 0 < res2["p_value"] < 1 and 0 < res2["fisher_p"] < 1
    # t-test and Fisher-z agree to first order at this n
    assert abs(res2["p_value"] - res2["fisher_p"]) < 0.05


def test_semi_anti_join(sf_dir):
    import duckdb

    from nailray.ops import combine as cmb

    orders = nio.read_parquet(f"{sf_dir}/orders.parquet")
    cust = nio.read_parquet(f"{sf_dir}/customer.parquet")
    semi = cmb.semi_join(orders, cust, "o_custkey", "c_custkey")
    anti = cmb.anti_join(orders, cust, "o_custkey", "c_custkey")
    con = duckdb.connect()
    n_semi = con.execute(
        f"select count(*) from read_parquet('{sf_dir}/orders.parquet') where "
        f"o_custkey in (select c_custkey from read_parquet('{sf_dir}/customer.parquet'))"
    ).fetchone()[0]
    assert semi.count() == n_semi
    assert anti.count() == orders.count() - n_semi
    # schema unchanged (unlike merge, no column prefixing)
    assert semi.schema().names == orders.schema().names


def test_dedup_rows_order_value_collision():
    """Order values that repeat ACROSS groups must not rescue non-winner
    rows: the winner filter matches on the key columns, not the bare
    order value (a semi join on the order value kept a2 here because
    group b's winner also has o=2)."""
    t = pa.table({"k": ["a", "a", "b", "b"], "o": pa.array([1, 2, 2, 3], pa.int64()),
                  "v": pa.array([10, 11, 12, 13], pa.int64())})
    ds = rd.from_arrow(t).repartition(2)
    first = _pdf(dedup.dedup_rows(ds, ["k"], order_column="o", keep="first")).sort_values("k")
    assert list(first["o"]) == [1, 2] and list(first["v"]) == [10, 12]
    last = _pdf(dedup.dedup_rows(ds, ["k"], order_column="o", keep="last")).sort_values("k")
    assert list(last["o"]) == [2, 3] and list(last["v"]) == [11, 13]


def test_sort_short_descending_and_strategy_lists():
    """A descending/strategy list shorter than the column list pads with
    defaults instead of silently dropping trailing sort keys; a longer
    list raises."""
    t = pa.table({"a": pa.array([1, 1, 2, 2], pa.int64()),
                  "b": pa.array([4, 3, 2, 1], pa.int64())})
    ds = rd.from_arrow(t)
    out = _pdf(sorting.sort(ds, ["a", "b"], descending=[True]))
    assert list(out["a"]) == [2, 2, 1, 1] and list(out["b"]) == [1, 2, 3, 4]
    out = _pdf(sorting.sort(ds, ["a", "b"], strategies=["numeric"]))
    assert list(out["b"]) == [3, 4, 1, 2]
    with pytest.raises(ValueError):
        sorting.sort(ds, ["a"], descending=[True, False])
    with pytest.raises(ValueError):
        sorting.sort(ds, ["a"], strategies=["numeric", "numeric"])


def test_merge_partitioned_matches_ray_join(sf_dir):
    """The partitioned hash join must match Dataset.join row-for-row on
    inner/left/full (Ray's right_outer drops the left key column — the
    partitioned path keeps it, coalesced from the right key, which is
    checked separately)."""
    def norm(ds, cols=None):
        df = _pdf(ds)
        cols = cols or sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    for how in ["inner", "left", "full"]:
        a = norm(combine.merge(nio.read_parquet(f"{sf_dir}/orders.parquet"),
                               nio.read_parquet(f"{sf_dir}/customer.parquet"),
                               "o_custkey", "c_custkey", how=how,
                               strategy="partitioned"))
        b = norm(combine.merge(nio.read_parquet(f"{sf_dir}/orders.parquet"),
                               nio.read_parquet(f"{sf_dir}/customer.parquet"),
                               "o_custkey", "c_custkey", how=how,
                               strategy="ray"))
        pd.testing.assert_frame_equal(a, b, check_dtype=True)
    # right join: same rows on the shared columns; left key column is
    # retained and coalesced (never null when a right partner exists)
    a = combine.merge(nio.read_parquet(f"{sf_dir}/orders.parquet"),
                      nio.read_parquet(f"{sf_dir}/customer.parquet"),
                      "o_custkey", "c_custkey", how="right",
                      strategy="partitioned")
    adf = _pdf(a)
    assert "o_custkey" in adf.columns and not adf["o_custkey"].isna().any()


def test_merge_partitioned_null_keys_never_match():
    """SQL semantics: null join keys match nothing; unmatched null-keyed
    rows survive exactly once on the preserving side."""
    t1 = pa.table({"k": pa.array([1, 2, None, 4], pa.int64()), "x": ["a", "b", "c", "d"]})
    t2 = pa.table({"k": pa.array([2, None, 4, 5], pa.int64()), "y": pa.array([10, 20, 30, 40], pa.int64())})
    l, r = rd.from_arrow(t1).repartition(2), rd.from_arrow(t2).repartition(2)
    inner = _pdf(combine.merge(l, r, "k", how="inner", strategy="partitioned"))
    assert sorted(inner["k"]) == [2, 4]
    left = _pdf(combine.merge(l, r, "k", how="left", strategy="partitioned"))
    assert len(left) == 4 and left["r_y"].notna().sum() == 2
    right = _pdf(combine.merge(l, r, "k", how="right", strategy="partitioned"))
    assert len(right) == 4 and sorted(right["r_y"]) == [10, 20, 30, 40]
    full = _pdf(combine.merge(l, r, "k", how="full", strategy="partitioned"))
    assert len(full) == 6
    # dtypes preserved (pandas would widen int-with-null to float)
    assert pa.types.is_integer(nio.to_arrow(
        combine.merge(l, r, "k", how="left", strategy="partitioned")).schema.field("r_y").type)


def test_hash_partition_block_dtype_invariance():
    """The same key value must land in the same partition whether its
    block arrived as int64 (null-free) or float64/Int64 (null-widened) —
    arrow→pandas conversion picks the dtype per BLOCK."""
    from nailray.shuffle import hash_partition

    as_int = pd.DataFrame({"k": pd.Series([1, 2, 4], dtype="int64")})
    as_float = pd.DataFrame({"k": pd.Series([1.0, 2.0, 4.0], dtype="float64")})
    as_nullable = pd.DataFrame({"k": pd.Series([1, 2, 4], dtype="Int64")})
    p1 = hash_partition(as_int, ["k"], 64)
    p2 = hash_partition(as_float, ["k"], 64)
    p3 = hash_partition(as_nullable, ["k"], 64)
    assert (p1 == p2).all() and (p1 == p3).all()
    # strings unaffected
    sdf = pd.DataFrame({"k": ["a", "b"]})
    assert (hash_partition(sdf, ["k"], 64) == hash_partition(sdf.copy(), ["k"], 64)).all()


def test_dedup_rows_shuffle_strategy_matches_broadcast():
    """winner_strategy='shuffle' (full-row hash partition + vectorized
    per-partition dedup) must produce the same rows as the broadcast
    winner filter."""
    rng = np.random.default_rng(7)
    n = 2000
    t = pa.table({
        "a": pa.array(rng.integers(0, 50, n)),
        "b": pa.array([f"g{v}" for v in rng.integers(0, 20, n)]),
        "v": pa.array(rng.normal(size=n)),
        "row_id": pa.array(np.arange(1, n + 1)),
    })
    ds = rd.from_arrow(t).repartition(8)
    for keep in ["first", "last"]:
        a = _pdf(dedup.dedup_rows(ds, ["a", "b"], keep=keep)).sort_values("row_id").reset_index(drop=True)
        b = _pdf(dedup.dedup_rows(ds, ["a", "b"], keep=keep,
                                  winner_strategy="shuffle")).sort_values("row_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_grouped_agg_null_key_blocks_and_big_ints():
    """An input block whose string key is ALL null must not degrade the
    key to float64 (schema unification error + null keys hashed into a
    different partition than other blocks' nulls); int payloads beyond
    2^53 stay exact."""
    from nailray.shuffle import grouped_agg

    t1 = pa.table({"c": pa.array([None] * 50, pa.string()),
                   "v": pa.array([2**60 + i for i in range(50)], pa.int64())})
    t2 = pa.table({"c": pa.array(["y", "z"] * 25),
                   "v": pa.array(list(range(50)), pa.int64())})
    out = _pdf(grouped_agg(rd.from_arrow([t1, t2]), ["c"],
                           {"n": ("c", "size"), "mn": ("v", "min")}))
    out = out.sort_values("c", na_position="first").reset_index(drop=True)
    assert list(out["n"]) == [50, 25, 25]
    assert out["mn"].iloc[0] == 2**60
    assert out["c"].iloc[0] is None or pd.isna(out["c"].iloc[0])


def test_group_map_empty_blocks():
    """Empty input blocks never carry the part column (Ray skips the
    map_batches UDF on them) — the direct exchange must route around
    them, and an all-empty input must return an empty dataset."""
    from nailray.shuffle import grouped_agg

    schema = pa.schema([("k", pa.string()), ("v", pa.int64())])
    empty = pa.table({"k": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
    full = pa.table({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    out = _pdf(grouped_agg(rd.from_arrow([empty, full]), ["k"],
                           {"s": ("v", "sum")}))
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out["s"]) == [3, 3]
    all_empty = grouped_agg(rd.from_arrow([empty]), ["k"], {"s": ("v", "sum")})
    assert all_empty.count() == 0
    assert schema is not None


def test_dedup_shuffle_mixed_null_blocks_and_big_keys():
    """winner_strategy='shuffle' with int64 keys where one block holds a
    null and another does not: block schemas must stay int64 (no float
    widening) and keys beyond 2^53 must not collide."""
    a, b = 2**53 + 2, 2**53 + 3  # distinct ints sharing a float64 image
    t1 = pa.table({"k": pa.array([a, None], pa.int64()),
                   "row_id": pa.array([1, 2], pa.int64())})
    t2 = pa.table({"k": pa.array([b, a], pa.int64()),
                   "row_id": pa.array([3, 4], pa.int64())})
    ds_out = dedup.dedup_rows(rd.from_arrow([t1, t2]), ["k"],
                              winner_strategy="shuffle")
    t = pa.concat_tables(list(ds_out.iter_batches(batch_format="pyarrow")),
                         promote_options="default").sort_by("row_id")
    # winners: a (row 1), null (row 2), b (row 3); row 4 is a dup of a
    assert t.column("k").type == pa.int64()  # no float widening in blocks
    assert t.column("row_id").to_pylist() == [1, 2, 3]
    assert set(x for x in t.column("k").to_pylist() if x is not None) == {a, b}


def test_session_null_string_key_schema():
    """A partition whose string keys are all null must still emit a
    string-typed key column (not null-typed) so blocks unify."""
    from nailray.ops import window

    ts = pa.array(pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:01:00",
         "2024-01-01 02:00:00", "2024-01-01 02:00:30"]), pa.timestamp("us"))
    t = pa.table({"u": pa.array([None, None, "x", "x"], pa.string()),
                  "ts": ts, "v": pa.array([1.0, 2.0, 3.0, 4.0])})
    out = window.session(rd.from_arrow(t).repartition(2), "u", "ts", "v",
                         gap_s=600)
    sch = out.schema()
    base = sch.base_schema if hasattr(sch, "base_schema") else sch
    assert base.field("u").type == pa.string()
    df = _pdf(out)
    assert len(df) == 2  # one null-key session, one x session


def test_group_map_sort_exchange_matches_direct():
    """The multi-node 'sort' exchange and the single-node 'direct'
    routing must be observably identical — same rows, same schema —
    for both an arrow kernel (grouped_agg) and a pandas kernel."""
    from nailray.shuffle import group_map, grouped_agg, hash_partition

    rng = np.random.default_rng(11)
    t = pa.table({
        "k": pa.array([f"k{v}" for v in rng.integers(0, 97, 5000)]),
        "v": pa.array(rng.integers(0, 1000, 5000)),
    })
    ds = rd.from_arrow(t).repartition(8)

    def agg(exchange):
        out = _pdf(grouped_agg(ds, ["k"], {"n": ("k", "size"), "s": ("v", "sum")},
                               exchange=exchange))
        return out.sort_values("k").reset_index(drop=True)

    pd.testing.assert_frame_equal(agg("direct"), agg("sort"))

    # pandas kernel through group_map itself
    def add_part(df):
        df = df.copy()
        df["__part"] = hash_partition(df, ["k"], 16)
        return df

    def kern(df):
        return (df.groupby("k", as_index=False)["v"].max()
                .rename(columns={"v": "mx"}))

    tagged = ds.map_batches(add_part, batch_format="pandas")
    a = _pdf(group_map(tagged, "__part", kern, 16, batch_format="pandas",
                       exchange="direct")).sort_values("k").reset_index(drop=True)
    b = _pdf(group_map(tagged, "__part", kern, 16, batch_format="pandas",
                       exchange="sort")).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_merge_asof_directions_and_left_nulls():
    l = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2, 3, None], pa.int64()),
                                "t": pa.array([5, 9, 3, 1, 7], pa.int64()),
                                "x": pa.array([1, 2, 3, 4, 5], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                                "t": pa.array([4, 8, 9], pa.int64()),
                                "p": pa.array([100, 200, 300], pa.int64())}))
    back = pa.concat_tables(
        list(combine.merge_asof(l, r, "k", "t").iter_batches(batch_format="pyarrow")),
        promote_options="default").to_pandas().sort_values("x").reset_index(drop=True)
    assert list(back["r_p"].fillna(-1)) == [100, 200, -1, -1, -1]
    fwd = pa.concat_tables(
        list(combine.merge_asof(l, r, "k", "t", direction="forward",
                                how="inner").iter_batches(batch_format="pyarrow")),
        promote_options="default").to_pandas().sort_values("x").reset_index(drop=True)
    # forward: t=5 -> r(8), t=9 -> none, k=2 t=3 -> r(9); null key drops
    assert list(fwd["x"]) == [1, 3]
    assert list(fwd["r_p"]) == [200, 300]


def test_merge_range_pairs():
    l = rd.from_arrow(pa.table({"k": [1, 1, 2], "t": [10.0, 20.0, 5.0],
                                "x": [1, 2, 3]}))
    r = rd.from_arrow(pa.table({"k": [1, 1, 1, 2], "t": [8.0, 15.0, 19.0, 9.0],
                                "p": [100, 200, 300, 400]}))
    out = pa.concat_tables(list(
        combine.merge_range(l, r, "k", "t", lower=-5.0, upper=0.0)
        .iter_batches(batch_format="pyarrow")),
        promote_options="default").to_pandas().sort_values(["x", "r_p"]).reset_index(drop=True)
    # x=1 (k1,t10): r at 8 (-2) qualifies; 15/19 are future -> no
    # x=2 (k1,t20): r at 15 (-5) and 19 (-1) qualify
    # x=3 (k2,t5): r at 9 is future -> no
    assert list(zip(out["x"], out["r_p"])) == [(1, 100), (2, 200), (2, 300)]


def test_bloom_semi_join_exact_and_superset(sf_dir):
    """Bloom prefilter + exact verify == plain semi join; verify='none'
    is a superset containing every true match."""
    from nailray.ops import combine as cmb, filtering

    li = nio.read_parquet(f"{sf_dir}/lineitem.parquet")
    big = filtering.filter_conditions(
        nio.read_parquet(f"{sf_dir}/orders.parquet"), "o_totalprice>400000")
    exact = _pdf(cmb.semi_join(li, big, "l_orderkey", "o_orderkey"))
    bloom = _pdf(cmb.bloom_semi_join(li, big, "l_orderkey", "o_orderkey",
                                     verify="shuffle"))
    cols = sorted(exact.columns)
    a = exact[cols].sort_values(cols).reset_index(drop=True)
    b = bloom[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)

    cand = _pdf(cmb.bloom_semi_join(li, big, "l_orderkey", "o_orderkey",
                                    verify="none"))
    assert set(exact["l_orderkey"]) <= set(cand["l_orderkey"])
    assert len(cand) >= len(exact)


def test_bloom_semi_join_null_keys_and_dtype_drift():
    """Null keys never match (SQL semantics) and an int key column that
    null-widens to float64 in SOME pandas blocks still hashes
    identically on both sides (normalize-then-hash)."""
    from nailray.ops import combine as cmb

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 4, 5, None], pa.int64()),
        "v": pa.array(list("abcdef")),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, None, 5, 7], pa.int64()),
    })).repartition(2)
    got = _pdf(cmb.bloom_semi_join(left, right, "k", verify="broadcast"))
    assert sorted(got["k"].tolist()) == [2, 5]
    # int32 left vs int64 right must also line up (exchange-type widening)
    left32 = rd.from_arrow(pa.table({
        "k": pa.array([2, 3, 5], pa.int32()),
    }))
    got32 = _pdf(cmb.bloom_semi_join(left32, right, "k", verify="none"))
    assert sorted(got32["k"].tolist()) == [2, 5]


def test_bloom_filter_fp_rate():
    """Measured FP rate at the default sizing stays within ~4x of the
    theoretical bound for the rounded-up bitmap."""
    import numpy as np

    from nailray.sketch import BloomFilter, _hash64
    import pandas as pd

    n = 5000
    bf = BloomFilter(n, bits_per_key=12)
    keys = pd.Series(np.arange(n, dtype=np.int64))
    bf.add_hashes(_hash64(keys))
    probe = pd.Series(np.arange(n, 2 * n, dtype=np.int64))
    fp = bf.contains_hashes(_hash64(probe)).mean()
    k, m = bf.k, bf.m
    theory = (1.0 - np.exp(-k * n / m)) ** k
    assert fp <= max(4 * theory, 0.002), (fp, theory)


def test_anti_join_shuffle_strategy(sf_dir):
    """Partitioned anti join (NOT EXISTS) matches the broadcast result,
    including null-key left rows (kept)."""
    from nailray.ops import combine as cmb, filtering

    orders = nio.read_parquet(f"{sf_dir}/orders.parquet")
    seg = filtering.filter_conditions(
        nio.read_parquet(f"{sf_dir}/customer.parquet"), "c_mktsegment=AUTOMOBILE")
    seg.count()  # pre-execute upstream: regression for the Ray 2.49
    # stale select_columns().schema() bug the shuffle path works around
    a = _pdf(cmb.anti_join(orders, seg, "o_custkey", "c_custkey"))
    b = _pdf(cmb.anti_join(orders, seg, "o_custkey", "c_custkey",
                           strategy="shuffle"))
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    import pytest
    with pytest.raises(ValueError):
        cmb.anti_join(orders, seg, "o_custkey", "c_custkey", strategy="nope")


def test_spearman_matrix_nulls_pairwise_complete():
    """Regression: null values must be EXCLUDED from rank correlation
    (they were assigned the finite max rank, biasing rho)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from nailray.ops.aggregates import spearman_matrix

    rng = np.random.default_rng(7)
    n = 2000
    a = rng.standard_normal(n)
    b = a + 0.1 * rng.standard_normal(n)
    mask = rng.random(n) < 0.2
    b_null = pa.array(np.where(mask, np.nan, b), pa.float64(),
                      mask=mask)
    ds = rd.from_arrow(pa.table({"a": pa.array(a), "b": b_null}))
    got = spearman_matrix(ds, ["a", "b"]).loc["a", "b"]
    ref = pd.DataFrame({"a": a, "b": np.where(mask, np.nan, b)}) \
        .dropna().corr(method="spearman").loc["a", "b"]
    assert abs(got - ref) < 0.02, (got, ref)


def test_hash_sampling_null_ids_deterministic():
    """sample_hash/split_hash must drop null-id rows deterministically
    (SQL NULL semantics), not hash NaN garbage."""
    import pyarrow as pa
    import ray.data as rd

    from nailray.ops.sampling import sample_hash, split_hash

    t = pa.table({"id": pa.array([1, None, 3, 4], pa.int64())})
    kept = sorted(sample_hash(rd.from_arrow(t), "id", 1.0).to_pandas()["id"])
    assert kept == [1, 3, 4]
    parts = split_hash(rd.from_arrow(t), [0.5, 0.5], "id")
    assert sum(p.count() for p in parts) == 3


def test_task_stage_accepts_tuple_concurrency(sf_dir):
    """The pool->task conversion must keep the (min, max) concurrency
    form the stage functions accepted as actor pools."""
    from nailray.io import read_parquet
    from nailray.textops.analysis import token_counts

    ds = read_parquet(f"{sf_dir}/documents.parquet")
    assert token_counts(ds, concurrency=(1, 2)).count() > 0


def test_weighted_sample_bias_and_determinism():
    """A-ES weighted sampling: heavy-weight rows must be strongly
    over-represented, the row set must be block-layout independent, and
    null/zero-weight rows excluded."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nailray.ops.sampling import weighted_sample

    n = 10000
    w = np.where(np.arange(n) < 500, 100.0, 1.0)  # 500 heavy rows
    w[0] = 0.0                                     # excluded
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "w": pa.array(w, pa.float64())})
    out = weighted_sample(rd.from_arrow(t), 500, "w", "id", seed=3).to_pandas()
    assert len(out) == 500 and 0 not in set(out["id"])
    heavy = (out["id"] < 500).sum()
    assert heavy > 300, heavy  # ~99% weight mass on the heavy rows
    out2 = weighted_sample(rd.from_arrow(t).repartition(9), 500, "w", "id",
                           seed=3).to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])


def test_weighted_sample_per_group_cap_and_bias():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nailray.ops.sampling import weighted_sample_per_group

    n = 6000
    g = np.arange(n) % 3
    w = np.where(np.arange(n) % 100 == 0, 1000.0, 1.0)  # heavy every 100th
    t = pa.table({"g": pa.array(g, pa.int64()),
                  "id": pa.array(range(n), pa.int64()),
                  "w": pa.array(w, pa.float64())})
    out = weighted_sample_per_group(
        rd.from_arrow(t).repartition(5), ["g"], 10, "w", "id",
        seed=2).to_pandas()
    sizes = out.groupby("g").size()
    assert (sizes == 10).all()
    heavy_frac = (out["id"] % 100 == 0).mean()
    assert heavy_frac > 0.5, heavy_frac  # 1% of rows hold ~91% of weight


def test_set_operations_distinct_and_null_semantics():
    """INTERSECT/EXCEPT: DISTINCT output, NULLs compare equal (SQL set
    operations use IS NOT DISTINCT FROM), duplicates collapse, schema
    mismatch rejected."""
    import pytest

    from nailray.io import to_arrow
    from nailray.ops.combine import except_distinct, intersect_distinct

    a = pa.table({"k": pa.array([1, 1, 2, None, 3], pa.int64()),
                  "s": ["x", "x", "y", None, "z"]})
    b = pa.table({"k": pa.array([1, None, 4], pa.int64()),
                  "s": ["x", None, "w"]})
    inter = to_arrow(intersect_distinct(rd.from_arrow(a),
                                        rd.from_arrow(b))).to_pandas()
    got = {(None if pd.isna(r["k"]) else int(r["k"]),
            None if r["s"] is None else r["s"])
           for _, r in inter.iterrows()}
    assert got == {(1, "x"), (None, None)}  # dup (1,x) collapsed; NULL row matches
    exc = to_arrow(except_distinct(rd.from_arrow(a),
                                   rd.from_arrow(b))).to_pandas()
    got = {(int(r["k"]), r["s"]) for _, r in exc.iterrows()}
    assert got == {(2, "y"), (3, "z")}
    with pytest.raises(ValueError):
        intersect_distinct(rd.from_arrow(a),
                           rd.from_arrow(a.rename_columns(["k", "t"])))
