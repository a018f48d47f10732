"""Distributed k-means + SemDeDup semantic dedup (nailray.cluster)
and TF-IDF feature extraction (textops.analysis.tfidf_scores)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nailray.cluster import (_id_digests, kmeans_embeddings,
                             semantic_dedup)
from nailray.io import read_parquet


def _emb(sf_dir):
    return read_parquet(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])


def _ref_kmeans(ids, mat, k, n_iter, normalize=True):
    """Sequential reference implementing the IDENTICAL algorithm:
    digest-seeded init, Lloyd rounds, empty clusters keep their old
    centroid."""
    dig = np.array([int.from_bytes(
        hashlib.sha256(repr(v).encode()).digest()[:8], "big")
        for v in ids], np.uint64)
    order = np.argsort(dig, kind="stable")[:k]
    cent = mat[order].astype(np.float64)

    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                              1e-12)

    if normalize:
        cent = norm(cent)
        x = norm(mat.astype(np.float64))
    else:
        x = mat.astype(np.float64)
    for _ in range(n_iter):
        if normalize:
            lab = np.argmax(x @ cent.T, axis=1)
        else:
            d2 = (np.sum(x * x, 1, keepdims=True) - 2 * (x @ cent.T)
                  + np.sum(cent * cent, 1))
            lab = np.argmin(d2, axis=1)
        new = cent.copy()
        for c in range(k):
            m = lab == c
            if m.any():
                new[c] = x[m].mean(axis=0)
        if normalize:
            new = norm(new)
        cent = new
    if normalize:
        lab = np.argmax(x @ cent.T, axis=1)
    else:
        d2 = (np.sum(x * x, 1, keepdims=True) - 2 * (x @ cent.T)
              + np.sum(cent * cent, 1))
        lab = np.argmin(d2, axis=1)
    return lab, cent


@pytest.mark.parametrize("normalize", [True, False])
@pytest.mark.parametrize("small_rows", [0, 2_000_000])
def test_kmeans_matches_sequential_reference(sf_dir, normalize, small_rows):
    # small_rows=0 forces the DISTRIBUTED partial-sum path; the default
    # takes the one-task small-input short-circuit — both must agree
    # with the sequential reference
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_pylist()
    mat = np.stack([np.asarray(v, np.float64)
                    for v in tbl.column("embedding").to_pylist()])
    ref_lab, ref_cent = _ref_kmeans(ids, mat, k=8, n_iter=5,
                                    normalize=normalize)

    asg, cent, inertia = kmeans_embeddings(
        _emb(sf_dir), k=8, n_iter=5, normalize=normalize,
        compute_inertia=True, small_input_rows=small_rows)
    np.testing.assert_allclose(cent, ref_cent, rtol=1e-9, atol=1e-9)
    got = {r["vec_id"]: r["cluster"] for r in asg.take_all()}
    want = dict(zip(ids, ref_lab))
    assert got == want
    assert inertia is not None


def test_kmeans_blocking_independent(sf_dir):
    """Same clustering regardless of block layout (init + partials are
    layout-free)."""
    a, cent_a, _ = kmeans_embeddings(_emb(sf_dir), k=5, n_iter=3)
    many = _emb(sf_dir).repartition(13)
    b, cent_b, _ = kmeans_embeddings(many, k=5, n_iter=3)
    np.testing.assert_allclose(cent_a, cent_b, rtol=1e-12)
    ga = sorted((r["vec_id"], r["cluster"]) for r in a.take_all())
    gb = sorted((r["vec_id"], r["cluster"]) for r in b.take_all())
    assert ga == gb


def test_semantic_dedup_drops_planted_near_dups(ray_session):
    """Plant exact-duplicate vectors: every duplicate group collapses
    to its min-digest representative; distinct vectors survive."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append({"vec_id": i, "embedding": list(map(float, v))})
    # ids 100..119 duplicate vectors 0..19 (cosine 1.0 >= threshold)
    for i in range(20):
        rows.append({"vec_id": 100 + i,
                     "embedding": list(map(float, base[i] * 2.0))})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(4)
    out = semantic_dedup(ds, k=4, threshold=0.999, n_iter=3)
    kept = sorted(r["vec_id"] for r in out.take_all())
    assert len(kept) == 40
    for i in range(20):
        dig = _id_digests([i, 100 + i])
        winner = [i, 100 + i][int(np.argmin(dig))]
        assert winner in kept
        assert ([i, 100 + i][int(np.argmax(dig))]) not in kept
    for i in range(20, 40):
        assert i in kept


def test_tfidf_matches_duckdb(sf_dir):
    from nailray.textops.analysis import tfidf_scores

    out = tfidf_scores(
        read_parquet(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "text"]),
        "text", "doc_id", top_vocab=200)
    got = out.to_pandas().sort_values(
        ["doc_id", "token"]).reset_index(drop=True)
    got["tfidf"] = got["tfidf"].round(6)

    sql = f"""
    WITH tok AS (SELECT doc_id,
           unnest(regexp_split_to_array(text, '\\s+')) AS token
           FROM read_parquet('{sf_dir}/documents.parquet')),
    t2 AS (SELECT * FROM tok WHERE token != ''),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd
          FROM read_parquet('{sf_dir}/documents.parquet')),
    dfx AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
            FROM t2 GROUP BY token),
    top AS (SELECT token, df FROM dfx ORDER BY df DESC, token LIMIT 200),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM t2 GROUP BY doc_id, token)
    SELECT tf.doc_id, tf.token, tf.tf,
           ROUND(tf.tf * LN(n.nd / top.df), 6) AS tfidf
    FROM tf JOIN top USING (token), n
    ORDER BY doc_id, token
    """
    want = duckdb.sql(sql).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0,
        atol=1e-9)


def test_tfidf_counts_tokenless_docs_in_n(ray_session):
    """N = total docs (incl. empty/NULL text), exactly like the SQL
    oracle's COUNT(*) FROM documents."""
    from nailray.textops.analysis import tfidf_scores

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a", "b c", None, "   "]})
    ds = rd.from_pandas(df).repartition(3)
    out = tfidf_scores(ds, "text", "doc_id", top_vocab=10).to_pandas()
    # df: a->1 doc, b->2, c->1; N=4
    row = out[(out.doc_id == 1) & (out.token == "a")].iloc[0]
    assert row["tf"] == 2
    assert abs(row["tfidf"] - 2 * np.log(4 / 1)) < 1e-12
    row_b = out[(out.doc_id == 2) & (out.token == "b")].iloc[0]
    assert abs(row_b["tfidf"] - 1 * np.log(4 / 2)) < 1e-12
    assert set(out.doc_id) == {1, 2}


def test_standardize_zscore_group_vs_duckdb(sf_dir):
    from nailray.io import read_parquet
    from nailray.ops.aggregates import standardize

    ds = read_parquet(f"{sf_dir}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber", "l_returnflag",
                               "l_extendedprice"])
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic table —
    # sort on the value too so ties can't reorder between the two sides
    got = standardize(ds, ["l_extendedprice"], by="l_returnflag") \
        .to_pandas() \
        .sort_values(["l_orderkey", "l_linenumber", "l_extendedprice"]) \
        .reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT l_orderkey, l_linenumber, l_extendedprice,
        (l_extendedprice - avg(l_extendedprice) OVER w)
          / stddev_pop(l_extendedprice) OVER w AS z
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        WINDOW w AS (PARTITION BY l_returnflag)
        ORDER BY l_orderkey, l_linenumber, l_extendedprice""").df()
    np.testing.assert_allclose(got["l_extendedprice_std"], want["z"],
                               rtol=1e-9, atol=1e-9)


def test_standardize_edge_cases(ray_session):
    from nailray.ops.aggregates import standardize

    df = pd.DataFrame({
        "g": ["a", "a", "b", "c", "c"],
        "x": [1.0, 3.0, 7.0, 5.0, None]})
    ds = rd.from_pandas(df).repartition(2)
    out = standardize(ds, ["x"], by="g").to_pandas() \
        .sort_values(["g", "x"]).reset_index(drop=True)
    # group a: mean 2, pop-std 1 -> -1, +1; group b: single row -> 0.0;
    # group c: one value + one NULL -> 0.0 and NULL
    vals = dict(zip(zip(out["g"], out["x"].fillna(-1)), out["x_std"]))
    assert vals[("a", 1.0)] == -1.0 and vals[("a", 3.0)] == 1.0
    assert vals[("b", 7.0)] == 0.0
    assert vals[("c", 5.0)] == 0.0
    assert np.isnan(vals[("c", -1.0)])

    # minmax, global (no group)
    out2 = standardize(ds, ["x"], method="minmax").to_pandas()
    m = dict(zip(out2["x"].fillna(-1), out2["x_std"]))
    assert m[1.0] == 0.0 and m[7.0] == 1.0 and abs(m[5.0] - 4/6) < 1e-12


def test_standardize_large_offset_no_cancellation(ray_session):
    """Epoch-nanosecond-scale offsets: the naive sumsq/n - mean^2 would
    cancel catastrophically; the shifted sums must not."""
    base = 1_700_000_000_000_000_000
    vals = np.array([base, base + 1_000_000_000, base + 2_000_000_000],
                    dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"g": ["a"] * 3, "x": vals}))
    from nailray.ops.aggregates import standardize

    out = standardize(ds, ["x"], by="g").to_pandas().sort_values("x")
    # mean = base+1e9, pop std = sqrt(2/3)*1e9
    want = (vals - (base + 1_000_000_000)) / (np.sqrt(2.0 / 3.0) * 1e9)
    np.testing.assert_allclose(out["x_std"].to_numpy(), np.sort(want),
                               rtol=1e-9)


def test_standardize_empty_input(ray_session):
    from nailray.ops.aggregates import standardize

    empty = rd.from_pandas(pd.DataFrame({"g": pd.Series([], dtype=str),
                                         "x": pd.Series([], dtype=float)}))
    assert standardize(empty, ["x"], by="g").count() == 0
    assert standardize(empty, ["x"], method="minmax").count() == 0


def test_tfidf_tokenless_corpus(ray_session):
    from nailray.textops.analysis import tfidf_scores

    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1, 2],
                                      "text": ["   ", None]}))
    assert tfidf_scores(ds, "text", "doc_id", top_vocab=5).count() == 0


def test_filter_quantile_int64_beyond_float53(ray_session):
    """int64 values beyond 2^53: bounds must compare exactly in the
    native type, not through a float64 round-trip."""
    from nailray.ops.quantile import filter_quantile

    base = (1 << 60)
    # 1..20 spaced by 1 around base: float64 can't distinguish base+i
    vals = [base + i for i in range(1, 21)]
    ds = rd.from_pandas(pd.DataFrame({"x": pd.Series(vals, dtype="int64")}))
    out = filter_quantile(ds, "x", 0.25, 0.75).to_pandas()
    lo = vals[int(np.ceil(0.25 * 20)) - 1]
    hi = vals[int(np.ceil(0.75 * 20)) - 1]
    assert sorted(out["x"]) == [v for v in vals if lo <= v <= hi]


def test_distinct_count_by_nulls_and_layout(ray_session):
    from nailray.ops.aggregates import distinct_count_by

    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b", None],
        "v": [1, 1, None, 2, 3, 4]})
    ds = rd.from_pandas(df).repartition(3)
    out = {r["g"]: r["n_distinct"]
           for r in distinct_count_by(ds, ["g"], "v").take_all()}
    # NULL v excluded (COUNT DISTINCT semantics); NULL group kept
    assert out["a"] == 1 and out["b"] == 2 and out[None] == 1


def test_distinct_count_by_all_null_group_and_key_clash(ray_session):
    from nailray.ops.aggregates import distinct_count_by

    df = pd.DataFrame({"g": ["a", "a", "c", "c"],
                       "v": [1, 2, None, None]})
    ds = rd.from_pandas(df).repartition(2)
    out = {r["g"]: r["n_distinct"]
           for r in distinct_count_by(ds, ["g"], "v").take_all()}
    # all-NULL group surfaces with 0, like SQL COUNT(DISTINCT)
    assert out == {"a": 2, "c": 0}

    with pytest.raises(ValueError, match="group key"):
        distinct_count_by(ds, ["g"], "g")


def test_distinct_count_by_nan_is_a_value(ray_session):
    """Float NaN is a countable distinct value under SQL
    COUNT(DISTINCT); NULL is not — the Arrow-side validity column must
    keep them apart even though both spell NaN after a pandas hop."""
    from nailray.ops.aggregates import distinct_count_by

    t = pa.table({
        "g": ["a", "a", "a", "b", "b"],
        "v": pa.array([1.0, float("nan"), None, float("nan"), None],
                      pa.float64())})
    ds = rd.from_arrow(t).repartition(2)
    out = {r["g"]: r["n_distinct"]
           for r in distinct_count_by(ds, ["g"], "v").take_all()}
    assert out == {"a": 2, "b": 1}


def test_arrow_schema_of_null_first_row(ray_session):
    """A None in the peeked row must not poison the object column to
    pa.null() — keep the string fallback."""
    import pyarrow as pa

    from nailray.shuffle import arrow_schema_of

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2], "s": [None, "x"]}))
    sch = arrow_schema_of(ds)
    assert pa.types.is_string(sch.field("s").type)


def test_semantic_dedup_sort_exchange_path(ray_session, monkeypatch):
    """The multi-node group_map path (groupby().map_groups) must give
    the identical survivor set as the single-node direct routing."""
    import nailray.shuffle as sh

    rng = np.random.default_rng(3)
    base = rng.normal(size=(30, 8))
    rows = [{"vec_id": i, "embedding": list(map(float, v))}
            for i, v in enumerate(base)]
    for i in range(10):
        rows.append({"vec_id": 200 + i,
                     "embedding": list(map(float, base[i] * 3.0))})
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(3)

    direct = sorted(r["vec_id"] for r in semantic_dedup(
        ds, k=3, threshold=0.999, n_iter=2).take_all())
    monkeypatch.setattr(sh, "default_exchange", lambda: "sort")
    sort_path = sorted(r["vec_id"] for r in semantic_dedup(
        ds, k=3, threshold=0.999, n_iter=2).take_all())
    assert direct == sort_path
    assert len(direct) == 30


def test_standardize_per_group_offsets_no_cancellation(ray_session):
    """The r4 residual: group A at offset ~0, group B at offset 1e15
    with unit intra-group spread. A GLOBAL cancellation shift leaves
    group B's squared sums at 1e30 magnitude where float64 granularity
    is ~1e14 (the variance of 1.0 cancels to garbage); the per-group
    shift must standardize B to exactly +/-1."""
    from nailray.ops.aggregates import standardize

    b0 = 1.0e15
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b"],
        "x": [0.0, 1.0, 2.0, b0 - 1.0, b0 + 1.0],
    })
    ds = rd.from_pandas(df).repartition(3)
    out = standardize(ds, ["x"], by="g").to_pandas()
    a = out[out["g"] == "a"].sort_values("x")["x_std"].to_numpy()
    b = out[out["g"] == "b"].sort_values("x")["x_std"].to_numpy()
    np.testing.assert_allclose(a, (np.arange(3) - 1.0) / np.sqrt(2.0 / 3.0),
                               rtol=1e-12)
    np.testing.assert_allclose(b, [-1.0, 1.0], rtol=1e-9)


def test_standardize_global_zscore_rebased_fold(ray_session):
    """by=None zscore: per-block local-min partials rebase exactly on
    the driver — same answer across block layouts, nulls excluded."""
    from nailray.ops.aggregates import standardize

    vals = [10.0, None, 30.0, 20.0, 40.0, None]
    want_vals = np.array([10.0, 30.0, 20.0, 40.0])
    mu, sd = want_vals.mean(), want_vals.std()
    for parts in (1, 4):
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(parts)
        out = standardize(ds, ["x"]).to_pandas()
        got = out["x_std"].dropna().to_numpy()
        np.testing.assert_allclose(np.sort(got),
                                   np.sort((want_vals - mu) / sd), rtol=1e-12)
        assert out["x_std"].isna().sum() == 2
