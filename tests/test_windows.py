"""Windowed aggregates and embedding near-dup."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nailray.io import read_parquet, to_arrow
from nailray.ops import window
from nailray.textops.dedup import embedding_near_duplicates


def test_tumbling_vs_duckdb(sf_dir):
    ds = read_parquet(f"{sf_dir}/events.parquet")
    got = to_arrow(window.tumbling(ds, "user_id", "ts", "value", "hour")).to_pandas()
    ref = duckdb.connect().execute(
        f"select user_id, date_trunc('hour', ts) ws, count(*) n, sum(value) s "
        f"from read_parquet('{sf_dir}/events.parquet') group by 1,2"
    ).fetchdf()
    assert len(got) == len(ref)
    assert got["n"].sum() == ref["n"].sum()


def test_sliding_counts(sf_dir):
    ds = read_parquet(f"{sf_dir}/events.parquet")
    n = ds.count()
    got = to_arrow(window.sliding(ds, "user_id", "ts", "value",
                                  width_s=7200, slide_s=3600)).to_pandas()
    # every event lands in exactly width/slide = 2 windows
    assert got["n"].sum() == 2 * n
    # window starts are slide-aligned
    assert (got["window_start_s"] % 3600 == 0).all()


def test_sliding_containment_non_multiple_width():
    """width not a multiple of slide: an event is only in windows whose
    [start, start+width) range actually contains it."""
    ts = pd.to_datetime([
        "2024-01-01 01:10:00",  # in-slot offset 600 < 1800 → 2 windows
        "2024-01-01 01:40:00",  # in-slot offset 2400 >= 1800 → 1 window
    ])
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array(ts),
        "value": pa.array([1.0, 1.0]),
    })
    got = to_arrow(window.sliding(rd.from_arrow(t), "user_id", "ts", "value",
                                  width_s=5400, slide_s=3600)).to_pandas()
    # event 1 → windows starting 00:00 and 01:00; event 2 → only 01:00
    starts = got.set_index("window_start_s")["n"].to_dict()
    base = pd.Timestamp("2024-01-01 00:00:00").timestamp()
    assert starts == {base: 1, base + 3600: 2}
    assert got["window_start_s"].dtype == "float64"


def test_sliding_ns_timestamp_unit():
    """timestamp[ns] input must land on the same epoch-second windows."""
    ts = pd.to_datetime(["2024-01-01 01:10:00"])
    t_ns = pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array(ts).cast(pa.timestamp("ns")),
        "value": pa.array([1.0]),
    })
    got = to_arrow(window.sliding(rd.from_arrow(t_ns), "user_id", "ts", "value",
                                  width_s=7200, slide_s=3600)).to_pandas()
    base = pd.Timestamp("2024-01-01 00:00:00").timestamp()
    assert set(got["window_start_s"]) == {base, base + 3600}


def test_session_windows():
    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:00:30", "2024-01-01 00:01:00",  # session 1
        "2024-01-01 02:00:00",                                               # session 2
        "2024-01-01 02:10:00", "2024-01-01 02:10:20",                        # session 3
    ])
    t = pa.table({
        "user_id": pa.array([7] * 6, pa.int64()),
        "ts": pa.array(ts),
        "value": pa.array([1.0] * 6),
    })
    got = to_arrow(window.session(rd.from_arrow(t), "user_id", "ts", "value",
                                  gap_s=120)).to_pandas().sort_values("session_start")
    assert list(got["n"]) == [3, 1, 2]
    assert got["sum_value"].sum() == 6.0


def test_session_two_phase_bucket_invariance(sf_dir):
    """The two-phase sessionization (per-(key,bucket) then boundary
    merge) must equal the single-bucket result for ANY bucket width —
    including one small enough to force many cross-bucket merges."""
    ds = read_parquet(f"{sf_dir}/events.parquet")
    a = to_arrow(window.session(ds, "user_id", "ts", "value", gap_s=600,
                                bucket_s=1800)).to_pandas()
    b = to_arrow(window.session(ds, "user_id", "ts", "value", gap_s=600,
                                bucket_s=10**9)).to_pandas()
    k = ["user_id", "session_start"]
    a = a.sort_values(k).reset_index(drop=True)
    b = b.sort_values(k).reset_index(drop=True)
    assert len(a) == len(b)
    assert a[k].equals(b[k])
    assert (a["n"].values == b["n"].values).all()
    assert np.allclose(a["sum_value"], b["sum_value"])


def test_embedding_near_duplicates():
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    vecs = [base, base + rng.standard_normal(16) * 0.01,  # near-dup pair
            rng.standard_normal(16), rng.standard_normal(16)]
    t = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    })
    pairs = to_arrow(embedding_near_duplicates(rd.from_arrow(t), "embedding",
                                               "vec_id", threshold=0.95)).to_pandas()
    assert {(a, b) for a, b in zip(pairs.get("id_a", []), pairs.get("id_b", []))} == {(0, 1)}


def test_lookback_agg_matches_pandas_rolling():
    """Trailing-window count/sum per key, RANGE-frame semantics
    (equal-timestamp peers included)."""
    import pandas as pd
    from nailray.ops import window

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:05:00", "2024-01-01 00:05:00",
        "2024-01-01 00:20:00", "2024-01-01 00:00:00"])
    t = pa.table({"u": pa.array(["a", "a", "a", "a", "b"]),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0, 9.0])})
    out = pa.concat_tables(list(
        window.lookback_agg(rd.from_arrow(t).repartition(2), "u", "ts", "v",
                            lookback_s=600.0).iter_batches(batch_format="pyarrow")),
        promote_options="default").to_pandas()
    out = out.sort_values(["u", "ts", "v"]).reset_index(drop=True)
    # rows at 00:05 are peers: both see [00:00, both 00:05] -> n=3 sum=6
    assert list(out["lb_n"]) == [1, 3, 3, 1, 1]
    assert list(out["lb_sum"]) == [1.0, 6.0, 6.0, 4.0, 9.0]


def test_lookback_agg_null_ts_and_null_value():
    """Null timestamps must not corrupt the key's other rows (NaT ->
    INT64_MIN broke searchsorted's sorted precondition) and null values
    sum as 0 per SQL SUM semantics while still counting the row."""
    import pandas as pd
    from nailray.ops import window

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:05:00", "2024-01-01 00:08:00",
        None, "2024-01-01 00:03:00"])
    t = pa.table({"u": pa.array(["a", "a", "a", "a", "a"]),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "v": pa.array([1.0, 2.0, 3.0, 100.0, None])})
    out = pa.concat_tables(list(
        window.lookback_agg(rd.from_arrow(t), "u", "ts", "v",
                            lookback_s=600.0).iter_batches(batch_format="pyarrow")),
        promote_options="default").to_pandas()
    out = out.sort_values("ts").reset_index(drop=True)
    # null-ts row last after sort; its outputs are null
    assert out["lb_n"].iloc[-1] is pd.NA or pd.isna(out["lb_n"].iloc[-1])
    assert pd.isna(out["lb_sum"].iloc[-1])
    valid = out.iloc[:4]
    assert list(valid["lb_n"]) == [1, 2, 3, 4]
    # null v at 00:03 contributes 0 to sums, but counts as a row
    assert list(valid["lb_sum"]) == [1.0, 1.0, 3.0, 6.0]
