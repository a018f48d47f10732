"""Aggregate operators: stats, frequency, correlations, outliers,
binning, pivot, fill, size, metadata (SURVEY §2.3/§2.5).

Design: every two-pass operator follows aggregate → broadcast-small →
map_batches apply (the reference's collect-into-HashMap pattern,
src/commands/fill.rs:155-244, re-expressed without driver materializing
data). Partial aggregation happens inside map_batches before any
groupby shuffle."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..expr import resolve_column
from ..io import ROW_ID


def _numeric_cols(schema: pa.Schema) -> list[str]:
    return [f.name for f in schema
            if (pa.types.is_integer(f.type) or pa.types.is_floating(f.type))
            and f.name != ROW_ID]


def _schema(ds: rd.Dataset) -> pa.Schema:
    s = ds.schema()
    return s.base_schema if hasattr(s, "base_schema") else s


# --------------------------------------------------------------------------
# moment partials: one streaming pass → driver-side tiny combine
# --------------------------------------------------------------------------

def numeric_moments(ds: rd.Dataset, columns: list[str] | None = None) -> dict[str, dict]:
    """count / mean / min / max / var (population) per column in ONE pass
    via per-batch partial sums (no groupby shuffle at all)."""
    schema = _schema(ds)
    cols = columns or _numeric_cols(schema)

    def partial(batch: pa.Table) -> pa.Table:
        row = {}
        for c in cols:
            v = batch.column(c)
            row[f"{c}__n"] = [pc.count(v).as_py()]
            row[f"{c}__s"] = [pc.sum(v).as_py() or 0.0]
            vv = pc.multiply(pc.cast(v, pa.float64()), pc.cast(v, pa.float64()))
            row[f"{c}__ss"] = [pc.sum(vv).as_py() or 0.0]
            row[f"{c}__mn"] = [pc.min(v).as_py()]
            row[f"{c}__mx"] = [pc.max(v).as_py()]
        return pa.table(row)

    out: dict[str, dict] = {c: {"n": 0, "s": 0.0, "ss": 0.0, "mn": None, "mx": None} for c in cols}
    for part in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for c in cols:
            d = out[c]
            for i in range(part.num_rows):
                d["n"] += part.column(f"{c}__n")[i].as_py()
                d["s"] += float(part.column(f"{c}__s")[i].as_py() or 0)
                d["ss"] += float(part.column(f"{c}__ss")[i].as_py() or 0)
                mn, mx = part.column(f"{c}__mn")[i].as_py(), part.column(f"{c}__mx")[i].as_py()
                if mn is not None:
                    d["mn"] = mn if d["mn"] is None else min(d["mn"], mn)
                if mx is not None:
                    d["mx"] = mx if d["mx"] is None else max(d["mx"], mx)
    for c, d in out.items():
        n = d["n"]
        d["mean"] = d["s"] / n if n else None
        d["var_pop"] = d["ss"] / n - (d["s"] / n) ** 2 if n else None
        d["std"] = math.sqrt(max(d["var_pop"], 0.0)) * math.sqrt(n / (n - 1)) if n > 1 else None
        d["var"] = d["std"] ** 2 if d["std"] is not None else None
    return out


def approx_quantiles(ds: rd.Dataset, column: str, qs: list[float],
                     per_batch_sample: int = 2048) -> list[float]:
    """Approximate quantiles from deterministic stride samples per batch
    (reference uses APPROX_PERCENTILE_CONT, src/utils/stats.rs:120-141)."""
    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column).drop_null()
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], pa.float64())})
        stride = max(1, n // per_batch_sample)
        idx = pa.array(range(0, n, stride))
        return pa.table({"v": pc.cast(pc.take(v, idx), pa.float64())})

    samples = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        samples.append(np.asarray(b.column("v")))
    allv = np.concatenate(samples) if samples else np.array([])
    if len(allv) == 0:
        return [None] * len(qs)
    return [float(np.quantile(allv, q)) for q in qs]


def stats(ds: rd.Dataset, columns: list[str] | None = None,
          kind: str = "basic") -> pd.DataFrame:
    """Per-column statistics (src/utils/stats.rs:104-245).

    basic: count, mean, q25/q50/q75 (approx), distinct count;
    exhaustive: + std, min, max, var_pop, duplicates."""
    schema = _schema(ds)
    cols = columns or [f.name for f in schema if f.name != ROW_ID]
    num = set(_numeric_cols(schema))
    moments = numeric_moments(ds, [c for c in cols if c in num])
    rows = []
    for c in cols:
        row: dict = {"column": c}
        if c in num:
            m = moments[c]
            row.update(count=m["n"], mean=m["mean"])
            if kind == "exhaustive":
                row.update(std=m["std"], min=m["mn"], max=m["mx"], var_pop=m["var_pop"])
            else:
                q = approx_quantiles(ds, c, [0.25, 0.5, 0.75])
                row.update(q25=q[0], q50=q[1], q75=q[2])
        else:
            row["count"] = ds.count() - _null_count(ds, c)
        d = distinct_count(ds, c)
        row["distinct"] = d
        if kind == "exhaustive":
            row["duplicates"] = row["count"] - d
        rows.append(row)
    return pd.DataFrame(rows)


def _null_count(ds: rd.Dataset, col: str) -> int:
    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n": [batch.column(col).null_count]})
    return sum(r["n"] for r in ds.map_batches(partial, batch_format="pyarrow").take_all())


def distinct_count(ds: rd.Dataset, col: str) -> int:
    """Exact distributed distinct: per-batch unique partial → coarse-
    partitioned combine (the partial shrinks the exchange to the
    distinct set per batch; the combine groups P Ray partitions, not
    the full distinct key space)."""
    from ..shuffle import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column(col).combine_chunks())
        return pa.table({col: u.drop_null()})

    uniq = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(uniq, [col], {"__c": (col, "size")}).count()


def distinct_count_by(ds: rd.Dataset, keys: list[str] | str,
                      col: str) -> rd.Dataset:
    """Exact ``COUNT(DISTINCT col) GROUP BY keys`` at O(distinct)
    exchange cost: per-block unique (keys, col) pairs → grouped
    dedup over the pair space → pre-combined count per key.  Neither
    exchange carries raw rows — the first carries each block's
    distinct pairs, the second one row per (block, key).  Returns
    ``(keys..., n_distinct)``."""
    from ..shuffle import grouped_agg

    names = ds.schema().names
    if isinstance(keys, str):
        keys = [c.strip() for c in keys.split(",") if c.strip()]
    keys = [resolve_column(names, c) for c in keys]
    col = resolve_column(names, col)
    if col in keys:
        raise ValueError(
            f"distinct_count_by: column {col!r} is also a group key "
            "(COUNT(DISTINCT key) per key is 1 by definition)")

    from ..shuffle import arrow_schema_of
    expected = arrow_schema_of(ds.select_columns(keys + [col]))

    def pair_partial(batch: pa.Table) -> pa.Table:
        # NULL values are KEPT as (key, NULL) pairs so an all-NULL
        # group still surfaces — with count 0, exactly like SQL's
        # COUNT(DISTINCT). Validity is recorded HERE, at the Arrow
        # level: float NaN is a countable distinct value under SQL
        # COUNT(DISTINCT) while NULL is not, and after a pandas
        # round-trip both spell NaN — a pandas-side "count" agg would
        # undercount NaN-bearing float columns by one.
        t = batch.select(keys + [col]).combine_chunks()
        for name in keys + [col]:
            f = t.schema.field(name)
            # an all-None slice of a pandas object column arrives as
            # Arrow null type — re-anchor it to the dataset-level type
            # so cross-block combine agrees
            want = expected.field(name).type
            if pa.types.is_null(f.type) and not pa.types.is_null(want):
                t = t.set_column(t.column_names.index(name), name,
                                 pc.cast(t.column(name), want))
        t = t.group_by(keys + [col]).aggregate([])
        return t.append_column(
            "__nn", pc.cast(pc.is_valid(t.column(col)), pa.int64()))

    pairs = ds.select_columns(keys + [col]).map_batches(
        pair_partial, batch_format="pyarrow")
    # dedup the pair space (max is idempotent: should a pandas combine
    # merge a NULL pair with a NaN pair, the surviving row still counts
    # exactly the one valid value), then sum validity per key
    dedup = grouped_agg(pairs, keys + [col], {"__nn": ("__nn", "max")})
    counts = grouped_agg(dedup.select_columns(keys + ["__nn"]), keys,
                         {"n_distinct": ("__nn", "sum")})
    return counts


def frequency(ds: rd.Dataset, columns: list[str], limit: int | None = None) -> pd.DataFrame:
    """GROUP BY cols ORDER BY count DESC + percentage
    (src/commands/frequency.rs:61-86). Pre-combined per block
    (:func:`nailray.shuffle.grouped_agg`): the exchange carries one row
    per (block, group), not the raw rows."""
    from ..shuffle import grouped_agg

    names = ds.schema().names
    cols = [resolve_column(names, c) for c in columns]
    counts = grouped_agg(ds.select_columns(cols), cols,
                         {"count": (cols[0], "size")})
    df = counts.to_pandas()
    total = df["count"].sum()
    df["percentage"] = df["count"] / total * 100.0
    df = df.sort_values(["count"] + cols, ascending=[False] + [True] * len(cols),
                        kind="mergesort").reset_index(drop=True)
    return df.head(limit) if limit else df


# --------------------------------------------------------------------------
# correlations (src/utils/stats.rs:251-553)
# --------------------------------------------------------------------------

def correlation_partials(ds: rd.Dataset, cols: list[str]) -> dict:
    """One streaming pass computing, for every pair, the null-pair-free
    sums needed for Pearson (n, sx, sy, sxx, syy, sxy)."""
    def partial(batch: pa.Table) -> pa.Table:
        arrs = {c: np.asarray(pc.cast(batch.column(c), pa.float64())) for c in cols}
        valid = {c: ~np.isnan(arrs[c]) if arrs[c].dtype == np.float64 else np.ones(len(arrs[c]), bool)
                 for c in cols}
        for c in cols:
            v = batch.column(c)
            if v.null_count:
                valid[c] &= np.asarray(pc.is_valid(v))
        row = {}
        for i, a in enumerate(cols):
            for b in cols[i + 1:]:
                m = valid[a] & valid[b]
                x, y = arrs[a][m], arrs[b][m]
                key = f"{a}|{b}"
                row[f"{key}__n"] = [len(x)]
                row[f"{key}__sx"] = [float(x.sum())]
                row[f"{key}__sy"] = [float(y.sum())]
                row[f"{key}__sxx"] = [float((x * x).sum())]
                row[f"{key}__syy"] = [float((y * y).sum())]
                row[f"{key}__sxy"] = [float((x * y).sum())]
        return pa.table(row)

    acc: dict[str, dict[str, float]] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for i, a in enumerate(cols):
            for c2 in cols[i + 1:]:
                key = f"{a}|{c2}"
                d = acc.setdefault(key, {"n": 0, "sx": 0, "sy": 0, "sxx": 0, "syy": 0, "sxy": 0})
                for f in d:
                    col = b.column(f"{key}__{f}")
                    d[f] += sum(x.as_py() for x in col)
    return acc


def pearson_matrix(ds: rd.Dataset, columns: list[str] | None = None) -> pd.DataFrame:
    cols = columns or _numeric_cols(_schema(ds))
    acc = correlation_partials(ds, cols)
    mat = pd.DataFrame(np.eye(len(cols)), index=cols, columns=cols)
    for key, d in acc.items():
        a, b = key.split("|")
        n = d["n"]
        if n < 2:
            r = float("nan")
        else:
            cov = d["sxy"] - d["sx"] * d["sy"] / n
            vx = d["sxx"] - d["sx"] ** 2 / n
            vy = d["syy"] - d["sy"] ** 2 / n
            r = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
        mat.loc[a, b] = mat.loc[b, a] = r
    return mat


def pearson(ds: rd.Dataset, x: str, y: str) -> float:
    return float(pearson_matrix(ds, [x, y]).loc[x, y])


# --- p-values (no scipy in this environment: regularized incomplete beta
# via the Lentz continued fraction, Abramowitz & Stegun 26.5.8 / 26.2.19) ---

def _betacf(a: float, b: float, x: float, max_iter: int = 200,
            eps: float = 3e-14) -> float:
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    d = tiny if abs(d) < tiny else d
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = tiny if abs(d) < tiny else d
        c = 1.0 + aa / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = tiny if abs(d) < tiny else d
        c = 1.0 + aa / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def _betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (math.lgamma(a + b) - math.lgamma(a) - math.lgamma(b)
                + a * math.log(x) + b * math.log1p(-x))
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def t_sf_two_tailed(t: float, df: float) -> float:
    """Two-tailed Student-t p-value: I_{df/(df+t²)}(df/2, 1/2)."""
    if df <= 0 or math.isnan(t):
        return float("nan")
    return _betainc(df / 2.0, 0.5, df / (df + t * t))


def pearson_with_p(ds: rd.Dataset, x: str, y: str) -> dict:
    """Pearson r with significance: t-test p (r·√((n−2)/(1−r²)), df=n−2)
    and the Fisher-z normal approximation (z=atanh(r)·√(n−3)).

    Engine extra beyond the reference's bare CORR() output
    (src/utils/stats.rs:477-496); formulas are the classical ones."""
    acc = correlation_partials(ds, [x, y])
    return _p_from_partial(next(iter(acc.values())))


def pearson_with_p_all(ds: rd.Dataset, columns: list[str] | None = None) -> dict[tuple, dict]:
    """All-pairs Pearson r + p-values from ONE dataset pass (the
    per-pair API would rescan the dataset per column pair)."""
    cols = columns or _numeric_cols(_schema(ds))
    acc = correlation_partials(ds, cols)
    out = {}
    for key, d in acc.items():
        a, b = key.split("|")
        out[(a, b)] = _p_from_partial(d)
    return out


def _p_from_partial(d: dict) -> dict:
    n = int(d["n"])
    if n < 3:
        return {"r": float("nan"), "n": n, "t": float("nan"),
                "p_value": float("nan"), "fisher_z": float("nan"),
                "fisher_p": float("nan")}
    cov = d["sxy"] - d["sx"] * d["sy"] / n
    vx = d["sxx"] - d["sx"] ** 2 / n
    vy = d["syy"] - d["sy"] ** 2 / n
    r = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else float("nan")
    r_c = max(min(r, 1.0), -1.0)
    if abs(r_c) >= 1.0:
        t = float("inf")
        p = 0.0
    else:
        t = r_c * math.sqrt((n - 2) / (1.0 - r_c * r_c))
        p = t_sf_two_tailed(t, n - 2)
    if n > 3 and abs(r_c) < 1.0:
        z = math.atanh(r_c) * math.sqrt(n - 3)
        fisher_p = math.erfc(abs(z) / math.sqrt(2.0))
    else:
        z, fisher_p = float("nan"), float("nan")
    # χ² flavor (reference parity: src/utils/stats.rs:311-316): the
    # statistic is t² on 1 df, so the p-value is the two-tailed NORMAL
    # tail of |t| — P(χ²₁ > t²) = erfc(|t|/√2)
    if math.isinf(t):
        chi2, chi2_p = float("inf"), 0.0
    else:
        chi2 = t * t
        chi2_p = math.erfc(abs(t) / math.sqrt(2.0))
    return {"r": float(r), "n": n, "t": float(t), "p_value": float(p),
            "fisher_z": float(z), "fisher_p": float(fisher_p),
            "chi2": float(chi2), "chi2_p": float(chi2_p)}


def spearman_with_p(ds: rd.Dataset, x: str, y: str,
                    per_batch_sample: int = 4096,
                    method: str = "sample") -> dict:
    """Spearman rho with the t-approximation p-value
    (t = ρ·√((n−2)/(1−ρ²)), df = n−2 — the standard large-n test).
    ``method="exact"`` computes rho on exact distributed global ranks
    (:func:`nailray.ops.rank.spearman_exact`) instead of the sampled
    CDF ranks."""
    n = ds.count()
    if method == "exact":
        from .rank import spearman_exact

        rho = spearman_exact(ds, x, y)
    else:
        rho = spearman(ds, x, y, per_batch_sample)
    if n < 3 or math.isnan(rho) or abs(rho) >= 1.0:
        p = 0.0 if (not math.isnan(rho) and abs(rho) >= 1.0 and n >= 3) else float("nan")
        return {"rho": rho, "n": n, "p_value": p}
    t = rho * math.sqrt((n - 2) / (1.0 - rho * rho))
    return {"rho": rho, "n": n, "p_value": t_sf_two_tailed(t, n - 2)}


def kendall_with_p(ds: rd.Dataset, x: str, y: str, sample_rows: int = 2000,
                   seed: int = 42, method: str = "sample") -> dict:
    """Kendall tau with a normal-approximation p-value.

    ``method="sample"`` (default): tau-a on a seeded sample, n = sampled
    rows, no-ties variance z = 3τ·√(n(n−1)) / √(2(2n+5)).
    ``method="exact"``: exact distributed tau-b over ALL complete pairs
    (:func:`nailray.ops.rank.kendall_exact`), n = complete-pair count,
    and the TIE-CORRECTED variance of the S = C−D statistic (Kendall
    1945 — the variance tau-b itself exists for):

        var(S) = (v0 − vt − vu)/18 + v1 + v2
        v0 = n(n−1)(2n+5);  vt/vu = Σ t(t−1)(2t+5) per variable
        v1 = Σt(t−1)·Σu(u−1) / (2n(n−1))
        v2 = Σt(t−1)(t−2)·Σu(u−1)(u−2) / (9n(n−1)(n−2))

    with z = S/√var(S). With zero ties this reduces exactly to the
    sample formula. The tie moments ride along from kendall_exact's own
    aggregates — no extra dataset scan."""
    if method == "exact":
        from .rank import kendall_exact

        st = kendall_exact(ds, x, y, return_stats=True)
        tau, n = st["tau"], st["n"]
        if n < 2 or math.isnan(tau):
            return {"tau": tau, "n": n, "p_value": float("nan")}
        tx1, tx2, tx3 = st["tie_x"]
        ty1, ty2, ty3 = st["tie_y"]
        v0 = float(n) * (n - 1) * (2 * n + 5)
        var_s = (v0 - tx2 - ty2) / 18.0
        var_s += (2.0 * tx1) * (2.0 * ty1) / (2.0 * n * (n - 1))
        if n > 2:
            var_s += tx3 * ty3 / (9.0 * n * (n - 1) * (n - 2))
        if var_s <= 0:
            return {"tau": tau, "n": n, "p_value": float("nan")}
        z = st["s"] / math.sqrt(var_s)
        return {"tau": tau, "n": n,
                "p_value": math.erfc(abs(z) / math.sqrt(2.0))}
    elif method == "sample":
        total = ds.count()
        n = min(total, sample_rows)
        tau = kendall(ds, x, y, sample_rows=sample_rows, seed=seed)
    else:
        raise ValueError(f"unknown kendall method {method!r}: sample|exact")
    if n < 2 or math.isnan(tau):
        return {"tau": tau, "n": n, "p_value": float("nan")}
    z = 3.0 * tau * math.sqrt(n * (n - 1)) / math.sqrt(2.0 * (2 * n + 5))
    return {"tau": tau, "n": n,
            "p_value": math.erfc(abs(z) / math.sqrt(2.0))}


def _cdf_rank_fn(ds: rd.Dataset, col: str, per_batch_sample: int = 4096):
    """Sampled empirical CDF → approximate global rank function.

    The reference's Spearman is itself an approximation (two independent
    ORDER BY windows, src/utils/stats.rs:374-381 — noted in SURVEY §2.5);
    here ranks come from a deterministic stride-sampled CDF, one
    streaming pass, broadcastable."""
    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).drop_null()
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], pa.float64())})
        stride = max(1, n // per_batch_sample)
        return pa.table({"v": pc.cast(pc.take(v, pa.array(range(0, n, stride))), pa.float64())})

    samples = [np.asarray(b.column("v"))
               for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    sorted_sample = np.sort(np.concatenate(samples)) if samples else np.array([])

    def rank(vals: np.ndarray) -> np.ndarray:
        if len(sorted_sample) == 0:
            return np.where(np.isnan(vals), np.nan, 0.0)
        lo = np.searchsorted(sorted_sample, vals, side="left")
        hi = np.searchsorted(sorted_sample, vals, side="right")
        r = (lo + hi) / 2.0  # mid-rank for ties
        # nulls stay NaN (not the finite max rank searchsorted gives
        # them) so the pairwise-complete Pearson filter excludes them —
        # same fix as spearman_matrix's to_ranks
        r[np.isnan(vals)] = np.nan
        return r

    return rank


def spearman(ds: rd.Dataset, x: str, y: str,
             per_batch_sample: int = 4096) -> float:
    """Spearman rho = Pearson over (approximate) global ranks; with
    ``per_batch_sample`` ≥ the largest batch the CDF sample is exhaustive
    and the mid-ranks (hence rho) are EXACT."""
    rx = _cdf_rank_fn(ds, x, per_batch_sample)
    ry = _cdf_rank_fn(ds, y, per_batch_sample)

    def to_ranks(batch: pa.Table) -> pa.Table:
        vx = np.asarray(pc.cast(batch.column(x), pa.float64()))
        vy = np.asarray(pc.cast(batch.column(y), pa.float64()))
        return pa.table({"rank_x": pa.array(rx(vx)), "rank_y": pa.array(ry(vy))})

    ranked = ds.map_batches(to_ranks, batch_format="pyarrow")
    return pearson(ranked, "rank_x", "rank_y")


def spearman_matrix(ds: rd.Dataset, columns: list[str] | None = None,
                    per_batch_sample: int = 4096) -> pd.DataFrame:
    """All-pairs Spearman matrix (reference parity:
    ``src/utils/stats.rs:344-475`` computes the full matrix with
    symmetry caching for every method; here symmetry is free — the
    matrix is Pearson over rank columns).

    Two dataset passes TOTAL regardless of column count: one shared
    sampling pass builds every column's CDF rank function, one ranked
    pass feeds :func:`pearson_matrix` (which accumulates all pairs from
    its single pass). The reference would run one SQL query per pair."""
    cols = columns or _numeric_cols(_schema(ds))

    def sample_all(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = pc.cast(batch.column(c).drop_null(), pa.float64())
            n = len(v)
            if n == 0:
                out[c] = np.zeros(0)
                continue
            stride = max(1, n // per_batch_sample)
            out[c] = np.asarray(v.combine_chunks()
                                if isinstance(v, pa.ChunkedArray) else v)[::stride]
        m = max((len(a) for a in out.values()), default=0)
        # pad to a rectangle (NaN padding is dropped when sorting below)
        return pa.table({c: pa.array(np.concatenate(
            [a, np.full(m - len(a), np.nan)]), pa.float64())
            for c, a in out.items()})

    samples: dict[str, list] = {c: [] for c in cols}
    for b in ds.map_batches(sample_all, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for c in cols:
            if c in b.column_names:
                v = np.asarray(b.column(c))
                samples[c].append(v[~np.isnan(v)])
    sorted_samples = {
        c: np.sort(np.concatenate(s)) if s else np.zeros(0)
        for c, s in samples.items()}

    def to_ranks(batch: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            v = np.asarray(pc.cast(batch.column(c), pa.float64()))
            ss = sorted_samples[c]
            if len(ss) == 0:
                out[c] = np.where(np.isnan(v), np.nan, 0.0)
            else:
                lo = np.searchsorted(ss, v, side="left")
                hi = np.searchsorted(ss, v, side="right")
                r = (lo + hi) / 2.0  # mid-rank for ties
                # nulls must stay NaN (not the finite max rank
                # searchsorted assigns them) so pearson_matrix's
                # pairwise-complete filter excludes the pair
                r[np.isnan(v)] = np.nan
                out[c] = r
        return pa.table({c: pa.array(r) for c, r in out.items()})

    ranked = ds.map_batches(to_ranks, batch_format="pyarrow")
    return pearson_matrix(ranked, cols)


def spearman_matrix_exact(ds: rd.Dataset, columns: list[str] | None = None,
                          num_partitions: int | None = None) -> pd.DataFrame:
    """All-pairs EXACT Spearman matrix (reference parity:
    ``src/utils/stats.rs:344-475`` full-matrix mode, here on exact
    global average-tie ranks instead of the sampled CDF).

    The distinct-collapse is shared ACROSS pairs of the same column —
    each column's exact rank map (:func:`~nailray.ops.rank.global_avg_rank`,
    O(distinct) exchanges) is computed ONCE, overlapped in threads,
    then attached with C left hash-joins; all C·(C−1)/2 Pearson cells
    come from pearson_matrix's single ranked pass. Null handling is
    pairwise-complete like the sampled matrix (a null keys a null rank
    through the left join, which the Pearson filter drops per pair) —
    per-pair :func:`~nailray.ops.rank.spearman_exact` instead re-ranks
    over each pair's complete rows; identical when columns are
    null-free."""
    from concurrent.futures import ThreadPoolExecutor

    from .combine import merge
    from .rank import global_avg_rank

    cols = columns or _numeric_cols(_schema(ds))
    base = ds.select_columns(cols).materialize()  # reused C+1 times
    with ThreadPoolExecutor(max(2, min(8, len(cols)))) as ex:
        futs = [(c, ex.submit(global_avg_rank, base, c, 256,
                              num_partitions)) for c in cols]
        maps = {c: f.result() for c, f in futs}
    j = base
    for c in cols:
        j = merge(j, maps[c], c, c, how="left",
                  num_partitions=num_partitions, right_prefix="")
    m = pearson_matrix(j, [f"{c}__rank" for c in cols])
    m.index = list(cols)
    m.columns = list(cols)
    return m


def kendall_matrix_exact(ds: rd.Dataset, columns: list[str] | None = None,
                         n_buckets: int = 128,
                         num_partitions: int | None = None) -> pd.DataFrame:
    """All-pairs EXACT Kendall tau-b matrix — each unordered pair runs
    the distributed bucket-decomposition
    (:func:`~nailray.ops.rank.kendall_exact`) once; symmetry fills the
    mirror cell (the reference's symmetry caching,
    ``src/utils/stats.rs:344-475``). Pairs run two-at-a-time in threads
    so one pair's driver barriers overlap another's exchanges."""
    from concurrent.futures import ThreadPoolExecutor

    from .rank import kendall_exact

    cols = columns or _numeric_cols(_schema(ds))
    base = ds.select_columns(cols).materialize()  # shared scan
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    mat = pd.DataFrame(np.eye(len(cols)), index=cols, columns=cols)
    with ThreadPoolExecutor(2) as ex:
        futs = [(a, b, ex.submit(kendall_exact, base, a, b, n_buckets,
                                 num_partitions)) for a, b in pairs]
        for a, b, f in futs:
            mat.loc[a, b] = mat.loc[b, a] = f.result()
    return mat


def _tau_a(vx: np.ndarray, vy: np.ndarray) -> float:
    """Sample tau-a via the sign outer product — THE single quadratic
    kernel behind :func:`kendall` and :func:`kendall_matrix` (only ever
    applied to bounded samples; exact full-data tau-b lives in
    :func:`nailray.ops.rank.kendall_exact`)."""
    n = len(vx)
    if n < 2:
        return float("nan")
    sx = np.sign(vx[:, None] - vx[None, :])
    sy = np.sign(vy[:, None] - vy[None, :])
    conc = (sx * sy)[np.triu_indices(n, 1)]
    return float(conc.sum() / (n * (n - 1) / 2))


def kendall_matrix(ds: rd.Dataset, columns: list[str] | None = None,
                   sample_rows: int = 2000, seed: int = 42) -> pd.DataFrame:
    """All-pairs Kendall tau-a matrix from ONE seeded sample collection
    (matches :func:`kendall`'s sampling semantics; the per-pair API
    would re-sample the dataset per pair). For exact distributed tau-b
    on a single pair use :func:`nailray.ops.rank.kendall_exact`."""
    cols = columns or _numeric_cols(_schema(ds))
    total = ds.count()
    frac = min(1.0, sample_rows / max(total, 1))
    sub = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    df = sub.select_columns(cols).to_pandas().head(sample_rows)
    mat = pd.DataFrame(np.eye(len(cols)), index=cols, columns=cols)
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            pair = df[[a, b]].dropna()
            tau = _tau_a(pair[a].to_numpy(np.float64),
                         pair[b].to_numpy(np.float64))
            mat.loc[a, b] = mat.loc[b, a] = tau
    return mat


def kendall(ds: rd.Dataset, x: str, y: str, sample_rows: int = 2000, seed: int = 42) -> float:
    """Kendall tau on a seeded sample (the reference computes an O(n²)
    self-CROSS-JOIN, src/utils/stats.rs:386-410 — quadratic is only
    viable on a bounded sample at scale)."""
    total = ds.count()
    frac = min(1.0, sample_rows / max(total, 1))
    sub = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    df = sub.select_columns([x, y]).to_pandas().dropna().head(sample_rows)
    return _tau_a(df[x].to_numpy(np.float64), df[y].to_numpy(np.float64))


# --------------------------------------------------------------------------
# outliers (src/commands/outliers.rs)
# --------------------------------------------------------------------------

def outliers(ds: rd.Dataset, columns: list[str], method: str = "zscore",
             factor: float = 3.0, action: str = "flag") -> rd.Dataset:
    """Flag or remove outliers. zscore uses exact mean/std (one pass);
    iqr uses approximate quartiles. Bounds broadcast into map_batches."""
    bounds: dict[str, tuple[float, float]] = {}
    if method == "zscore":
        m = numeric_moments(ds, columns)
        for c in columns:
            mu, sd = m[c]["mean"], m[c]["std"] or 0.0
            bounds[c] = (mu - factor * sd, mu + factor * sd)
    elif method == "iqr":
        for c in columns:
            q1, q3 = approx_quantiles(ds, c, [0.25, 0.75])
            iqr = q3 - q1
            bounds[c] = (q1 - factor * iqr, q3 + factor * iqr)
    elif method == "modified-zscore":
        # median ± factor * MAD / 0.6745 (src/commands/outliers.rs:356-480)
        for c in columns:
            med = approx_quantiles(ds, c, [0.5])[0]

            def dev(batch: pa.Table, c=c, med=med) -> pa.Table:
                v = pc.cast(batch.column(c), pa.float64())
                return pa.table({c: pc.abs(pc.subtract(v, med))})

            mad = approx_quantiles(ds.map_batches(dev, batch_format="pyarrow"), c, [0.5])[0]
            spread = factor * (mad / 0.6745 if mad else 1.0)
            bounds[c] = (med - spread, med + spread)
    elif method == "isolation":
        # min/max-range heuristic (src/commands/outliers.rs:484-615)
        m = numeric_moments(ds, columns)
        for c in columns:
            rng = (m[c]["mx"] - m[c]["mn"]) or 1.0
            margin = rng * (1.0 - min(factor / 10.0, 0.99)) / 2.0
            bounds[c] = (m[c]["mn"] + margin, m[c]["mx"] - margin)
    else:
        raise ValueError(f"unknown outlier method {method!r}")

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for c, (lo, hi) in bounds.items():
            v = pc.cast(batch.column(c), pa.float64())
            m = pc.or_(pc.less(v, lo), pc.greater(v, hi))
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.or_(mask, m)
        if action == "flag":
            return batch.append_column("is_outlier", mask)
        return batch.filter(pc.invert(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# binning (src/commands/binning.rs)
# --------------------------------------------------------------------------

def binning(ds: rd.Dataset, column: str, bins: int = 10, method: str = "equal-width",
            edges: list[float] | None = None, suffix: str = "_bin",
            drop_original: bool = False) -> rd.Dataset:
    """Bucket a numeric column; edges from min/max (equal-width),
    approx quantiles (equal-frequency), or given; label '[lo, hi)'."""
    if edges is None:
        if method == "equal-width":
            m = numeric_moments(ds, [column])[column]
            edges = list(np.linspace(m["mn"], m["mx"], bins + 1))
        elif method == "equal-frequency":
            qs = list(np.linspace(0, 1, bins + 1))
            edges = approx_quantiles(ds, column, qs)
        else:
            raise ValueError(f"unknown binning method {method!r}")
    edges = sorted(set(float(e) for e in edges))
    labels = [f"[{edges[i]:g}, {edges[i+1]:g})" for i in range(len(edges) - 1)]

    def fn(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch.column(column), pa.float64()))
        idx = np.clip(np.digitize(v, edges[1:-1]), 0, len(labels) - 1)
        lab = pa.array([labels[i] if not np.isnan(x) else None for i, x in zip(idx, v)])
        out = batch.append_column(f"{column}{suffix}", lab)
        if drop_original:
            out = out.drop_columns([column])
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# pivot = grouped aggregation (src/commands/pivot.rs:171-212 —
# documented as NOT a wide pivot, README.md:800)
# --------------------------------------------------------------------------

def pivot(ds: rd.Dataset, index: list[str], pivot_cols: list[str],
          values: list[str], agg: str = "sum") -> rd.Dataset:
    """Grouped aggregation via the pre-combined exchange; ``mean`` is
    assembled from combinable sum+size partials in a final projection."""
    from ..shuffle import grouped_agg

    keys = list(index) + list(pivot_cols)
    if agg not in ("sum", "mean", "count", "min", "max"):
        raise ValueError(f"unknown agg {agg!r}")
    aggs: dict[str, tuple[str, str]] = {}
    for v in values:
        if agg == "count":
            aggs[f"{v}_count"] = (v, "size")
        elif agg == "mean":
            aggs[f"__{v}_sum"] = (v, "sum")
            aggs[f"__{v}_n"] = (v, "count")
        else:
            aggs[f"{v}_{agg}"] = (v, agg)
    out = grouped_agg(ds.select_columns(keys + list(values)), keys, aggs)
    if agg != "mean":
        return out

    def finish(batch: pa.Table) -> pa.Table:
        for v in values:
            s = pc.cast(batch.column(f"__{v}_sum"), pa.float64())
            n = pc.cast(batch.column(f"__{v}_n"), pa.float64())
            batch = batch.append_column(f"{v}_mean", pc.divide(s, n))
        return batch.drop_columns(
            [c for v in values for c in (f"__{v}_sum", f"__{v}_n")])

    return out.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# fill (src/commands/fill.rs)
# --------------------------------------------------------------------------

def fill_value(ds: rd.Dataset, columns: list[str], value) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        for c in columns:
            i = batch.column_names.index(c)
            col = batch.column(c)
            batch = batch.set_column(i, c, pc.fill_null(col, pa.scalar(value, col.type)))
        return batch
    return ds.map_batches(fn, batch_format="pyarrow")


def fill_stat(ds: rd.Dataset, columns: list[str], stat: str = "mean") -> rd.Dataset:
    """mean/median/mode fill: aggregate pass → broadcast dict →
    COALESCE projection (src/commands/fill.rs:155-322)."""
    values: dict[str, object] = {}
    if stat == "mean":
        m = numeric_moments(ds, columns)
        values = {c: m[c]["mean"] for c in columns}
    elif stat == "median":
        for c in columns:
            values[c] = approx_quantiles(ds, c, [0.5])[0]
    elif stat == "mode":
        import functools

        from ..shuffle import grouped_agg

        def drop_null_key(batch: pa.Table, *, col: str) -> pa.Table:
            # the null-value group is never the mode, and Ray's sort
            # sampler cannot compare None against strings
            return batch.filter(pc.is_valid(batch.column(col)))

        for c in columns:
            top = (
                grouped_agg(ds.select_columns([c]), [c], {"n": (c, "size")})
                .map_batches(functools.partial(drop_null_key, col=c),
                             batch_format="pyarrow")
                .sort(["n", c], descending=[True, False]).limit(1).take_all()
            )
            values[c] = top[0][c] if top else None
    else:
        raise ValueError(f"unknown fill stat {stat!r}")

    def fn(batch: pa.Table) -> pa.Table:
        for c, v in values.items():
            if v is None:
                continue
            i = batch.column_names.index(c)
            col = batch.column(c)
            batch = batch.set_column(i, c, pc.fill_null(col, pa.scalar(v, col.type)))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow")


def fill_directional(ds_with_row_id: rd.Dataset, columns: list[str],
                     direction: str = "forward", block_rows: int = 65536,
                     order_column: str = ROW_ID) -> rd.Dataset:
    """Order-dependent forward/backward fill, distributed.

    The reference fully materializes (src/commands/fill.rs:325-376).
    Here: deterministic range blocks on row_id → pass 1 gathers each
    block's boundary value (small) → driver prefix-combines carries →
    pass 2 fills each block seeded with its carry. Two bounded shuffles,
    no driver data materialization."""
    fwd = direction == "forward"
    ROW = order_column

    def with_block(batch: pa.Table) -> pa.Table:
        blk = pc.cast(pc.floor(pc.divide(pc.cast(batch.column(ROW), pa.float64()),
                                         float(block_rows))), pa.int64())
        return batch.append_column("__blk", blk)

    ds2 = ds_with_row_id.map_batches(with_block, batch_format="pyarrow")

    def boundary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ROW)
        row = {"__blk": [g["__blk"].iloc[0]]}
        for c in columns:
            s = g[c].dropna()
            row[f"{c}__edge"] = [s.iloc[-1] if fwd else s.iloc[0]] if len(s) else [None]
        return pd.DataFrame(row)

    edges = ds2.groupby("__blk").map_groups(boundary, batch_format="pandas").to_pandas()
    edges = edges.sort_values("__blk").reset_index(drop=True)
    carry: dict[int, dict] = {}
    state: dict[str, object] = {c: None for c in columns}
    records = edges.to_dict("records")
    for row in (records if fwd else reversed(records)):
        carry[int(row["__blk"])] = dict(state)
        for c in columns:
            v = row[f"{c}__edge"]
            if v is not None and not (isinstance(v, float) and math.isnan(v)):
                state[c] = v

    def fill_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ROW)
        seed = carry.get(int(g["__blk"].iloc[0]), {})
        for c in columns:
            s = g[c]
            if fwd:
                s = s.ffill()
                if seed.get(c) is not None:
                    s = s.fillna(seed[c])
            else:
                s = s.bfill()
                if seed.get(c) is not None:
                    s = s.fillna(seed[c])
            g[c] = s
        return g.drop(columns="__blk")

    return ds2.groupby("__blk").map_groups(fill_block, batch_format="pandas")


# --------------------------------------------------------------------------
# size & metadata (src/commands/size.rs, metadata.rs)
# --------------------------------------------------------------------------

def size_report(ds: rd.Dataset) -> dict:
    """Exact per-column in-memory bytes via streaming partial sums
    (beats the reference's per-type byte-cost estimate,
    src/commands/size.rs:133-173)."""
    names = ds.schema().names

    def partial(batch: pa.Table) -> pa.Table:
        row = {c: [batch.column(c).nbytes] for c in names}
        row["__rows"] = [batch.num_rows]
        return pa.table(row)

    acc = {c: 0 for c in names}
    rows = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for c in names:
            acc[c] += sum(x.as_py() for x in b.column(c))
        rows += sum(x.as_py() for x in b.column("__rows"))
    return {"rows": rows, "columns": acc, "total_bytes": sum(acc.values())}


def size_estimate(ds: rd.Dataset) -> pa.Table:
    """Per-column LOGICAL data bytes (the reference's per-type
    byte-cost model, src/commands/size.rs:133-173): strings count
    their octet lengths, fixed-width types count width x non-null
    values, lists count element width x total element count.  One
    tiny partial row per block per column; the driver folds scalars.
    Returns ``(col, n_values, data_bytes)`` sorted by column name."""
    schema = ds.schema()
    base = schema.base_schema if hasattr(schema, "base_schema") else schema
    names = list(base.names)

    def partial(batch: pa.Table) -> pa.Table:
        row: dict[str, list] = {}
        for c in names:
            col = batch.column(c)
            n = len(col) - col.null_count
            t = col.type
            if pa.types.is_string(t) or pa.types.is_large_string(t) \
                    or pa.types.is_binary(t) or pa.types.is_large_binary(t):
                s = pc.sum(pc.binary_length(col)).as_py() or 0
            elif pa.types.is_list(t) or pa.types.is_large_list(t):
                elems = pc.sum(pc.list_value_length(col)).as_py() or 0
                s = elems * max(1, t.value_type.bit_width // 8)
            else:
                s = n * max(1, t.bit_width // 8)
            row[f"{c}__n"] = [n]
            row[f"{c}__b"] = [int(s)]
        return pa.table(row)

    acc_n = {c: 0 for c in names}
    acc_b = {c: 0 for c in names}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for c in names:
            acc_n[c] += sum(x.as_py() for x in b.column(f"{c}__n"))
            acc_b[c] += sum(x.as_py() for x in b.column(f"{c}__b"))
    order = sorted(names)
    return pa.table({
        "col": pa.array(order, pa.string()),
        "n_values": pa.array([acc_n[c] for c in order], pa.int64()),
        "data_bytes": pa.array([acc_b[c] for c in order], pa.int64()),
    })


def parquet_metadata(path: str) -> dict:
    """Footer dump: rows, row groups, per-column-chunk compression /
    encodings / sizes / stats (src/commands/metadata.rs:45-554)."""
    f = pq.ParquetFile(path)
    md = f.metadata
    out = {
        "num_rows": md.num_rows,
        "num_row_groups": md.num_row_groups,
        "created_by": md.created_by,
        "format_version": md.format_version,
        "serialized_footer_bytes": md.serialized_size,
        "schema": [{"name": s.name, "physical_type": s.physical_type}
                   for s in (md.schema.column(i) for i in range(md.num_columns))],
        "row_groups": [],
    }
    comp_total = 0
    uncomp_total = 0
    for rg in range(md.num_row_groups):
        r = md.row_group(rg)
        cols = []
        for ci in range(r.num_columns):
            c = r.column(ci)
            comp_total += c.total_compressed_size
            uncomp_total += c.total_uncompressed_size
            entry = {
                "path": c.path_in_schema,
                "compression": c.compression,
                "encodings": list(c.encodings),
                "compressed_bytes": c.total_compressed_size,
                "uncompressed_bytes": c.total_uncompressed_size,
            }
            # per-chunk statistics (src/commands/metadata.rs:118-554:
            # has_min_max, null_count, distinct_count, min/max values)
            st = c.statistics
            if st is not None:
                entry["statistics"] = {
                    "has_min_max": bool(st.has_min_max),
                    "null_count": st.null_count if st.has_null_count else None,
                    "distinct_count": st.distinct_count if st.has_distinct_count else None,
                    "min": st.min if st.has_min_max else None,
                    "max": st.max if st.has_min_max else None,
                    "num_values": st.num_values,
                }
            else:
                entry["statistics"] = None
            cols.append(entry)
        out["row_groups"].append({"num_rows": r.num_rows, "columns": cols})
    out["compression_ratio"] = uncomp_total / comp_total if comp_total else None
    # whole-file statistics rollup (metadata.rs:348-420 collect_statistics):
    total_nulls = 0
    chunks_with_stats = 0
    chunks_total = 0
    for rg in out["row_groups"]:
        for c in rg["columns"]:
            chunks_total += 1
            s = c["statistics"]
            if s is not None:
                chunks_with_stats += 1
                if s["null_count"] is not None:
                    total_nulls += s["null_count"]
    out["statistics_summary"] = {
        "column_chunks": chunks_total,
        "chunks_with_statistics": chunks_with_stats,
        "total_null_count": total_nulls,
    }
    return out


def standardize(ds: rd.Dataset, columns: list[str] | str,
                by: list[str] | str | None = None, method: str = "zscore",
                out_suffix: str = "_std",
                cache_input: bool | str = "auto") -> rd.Dataset:
    """Per-group (or global) feature standardization: ``zscore``
    ((x − mean) / population-std) or ``minmax`` ((x − min) / (max −
    min)).  Appends ``<col><out_suffix>`` per input column; NULLs stay
    NULL and are excluded from the stats; a degenerate group (zero
    variance / single value / empty) standardizes to 0.0 — the CASE
    the SQL window oracle spells out identically.

    Scale shape: zscore is ONE grouped exchange carrying per-(block,
    group) partials ``(n, local_min, Σ(x−local_min), Σ(x−local_min)²)``
    — each block shifts by ITS OWN per-group minimum, and the combine
    rebases partials onto the group's global minimum with the exact
    shift-translation identity (s' = s + n·Δ, q' = q + 2Δs + n·Δ²,
    Chan et al. pairwise-update form), so the classic sumsq/n − mean²
    catastrophic cancellation is gone even for GROUPS sitting at wildly
    different offsets with tiny intra-group spread (epoch timestamps
    per shard, sequence-id ranges): every accumulated magnitude is
    bounded by the group's own data spread, never its offset.  The
    per-group stats table (bounded by the group-key cardinality)
    broadcasts via ``ray.put``; the final pass standardizes each batch
    with one pandas merge + vectorized arithmetic. ``by=None`` folds
    the same rebased partials from one row per block on the driver (no
    exchange at all). ``cache_input`` follows the multi-pass auto
    policy (:func:`nailray.io.resolve_cache_input`)."""
    import ray

    from ..io import resolve_cache_input as _resolve_cache_input
    from ..shuffle import grouped_agg

    if isinstance(columns, str):
        columns = [c.strip() for c in columns.split(",") if c.strip()]
    names = ds.schema().names
    columns = [resolve_column(names, c) for c in columns]
    if isinstance(by, str):
        by = [c.strip() for c in by.split(",") if c.strip()]
    by = [resolve_column(names, c) for c in by] if by else None
    if method not in ("zscore", "minmax"):
        raise ValueError(f"unknown method {method!r}: zscore|minmax")

    if _resolve_cache_input(ds, cache_input):
        ds = ds.materialize()

    def _fold_scalar_blocks(d, make_row):
        rows = [b for b in d.map_batches(make_row, batch_format="pyarrow")
                .iter_batches(batch_size=None, batch_format="pyarrow")]
        if not rows:
            return None
        return pa.concat_tables(rows, promote_options="default").to_pandas()

    import pandas as _pd

    stat_cols = ["__n_", "__m_", "__s_", "__q_"]  # zscore partial fields

    def _z_rebase(df: "_pd.DataFrame", keys: list[str] | None):
        """Merge (n, m, s, q) partial rows onto each group's global
        min: Δ = m − M; s' = Σ(s + nΔ); q' = Σ(q + 2Δs + nΔ²)."""
        res = {}
        gb = df.groupby(keys, dropna=False, sort=False) if keys else None
        for c in columns:
            n = df[f"__n_{c}"].astype("float64")
            m = df[f"__m_{c}"].astype("float64")
            s = df[f"__s_{c}"].astype("float64")
            q = df[f"__q_{c}"].astype("float64")
            M = (gb[f"__m_{c}"].transform("min").astype("float64")
                 if gb is not None else _pd.Series(m.min(), index=df.index))
            delta = (m - M).fillna(0.0)
            res[f"__s_{c}"] = s + n * delta
            res[f"__q_{c}"] = q + 2.0 * delta * s + n * delta * delta
            res[f"__n_{c}"] = n
            res[f"__m_{c}"] = M.fillna(0.0)
        rb = _pd.DataFrame(res, index=df.index)
        if keys:
            rb[keys] = df[keys]
            g2 = rb.groupby(keys, dropna=False, sort=False)
            agg = {f"__n_{c}": (f"__n_{c}", "sum") for c in columns}
            agg |= {f"__s_{c}": (f"__s_{c}", "sum") for c in columns}
            agg |= {f"__q_{c}": (f"__q_{c}", "sum") for c in columns}
            agg |= {f"__m_{c}": (f"__m_{c}", "min") for c in columns}
            return g2.agg(**agg).reset_index()
        return _pd.DataFrame({
            **{f"__n_{c}": [rb[f"__n_{c}"].sum()] for c in columns},
            **{f"__s_{c}": [rb[f"__s_{c}"].sum()] for c in columns},
            **{f"__q_{c}": [rb[f"__q_{c}"].sum()] for c in columns},
            **{f"__m_{c}": [rb[f"__m_{c}"].min()] for c in columns}})

    if method == "zscore":
        from ..shuffle import (group_map, hash_partition, int_types_mapper,
                               partition_count, to_arrow_clean)

        # resolved ONCE on the driver: a worker-side partition_count
        # could disagree (cluster resources changing between planning
        # and execution) and rows tagged >= the driver's count would be
        # silently dropped by the direct exchange
        n_parts_z = partition_count(None)

        def partial(batch: pa.Table) -> pa.Table:
            key_types = ({k: batch.schema.field(k).type for k in by}
                         if by else {})
            df = batch.to_pandas(types_mapper=int_types_mapper)
            gb = df.groupby(by, dropna=False, sort=False) if by else None
            rows = {}
            for c in columns:
                x = df[c].astype("float64")
                m = (gb[c].transform("min") if gb is not None
                     else _pd.Series(x.min(), index=df.index)).astype("float64")
                xs = (x - m).fillna(0.0)
                t = _pd.DataFrame({"n": x.notna().astype("int64"),
                                   "m": m, "s": xs, "q": xs * xs})
                if gb is not None:
                    t[by] = df[by]
                    a = t.groupby(by, dropna=False, sort=False).agg(
                        n=("n", "sum"), m=("m", "min"),
                        s=("s", "sum"), q=("q", "sum"))
                else:
                    a = _pd.DataFrame({"n": [t["n"].sum()],
                                       "m": [t["m"].min()],
                                       "s": [t["s"].sum()],
                                       "q": [t["q"].sum()]})
                rows[c] = a
            first = rows[columns[0]]
            out = _pd.DataFrame(index=first.index)
            for c in columns:
                a = rows[c]
                out[f"__n_{c}"] = a["n"]
                out[f"__m_{c}"] = a["m"]
                out[f"__s_{c}"] = a["s"]
                out[f"__q_{c}"] = a["q"]
            out = out.reset_index() if by else out
            if not by:
                return to_arrow_clean(out)
            arrays = {k: pa.Array.from_pandas(out[k], type=key_types[k])
                      for k in by}
            t = pa.table({**arrays,
                          **{c2: pa.Array.from_pandas(out[c2])
                             for c2 in out.columns if c2 not in by}})
            part = hash_partition(t.select(by).to_pandas(), by,
                                  n_parts_z)
            return t.append_column("__part", pa.array(part))

        if by:
            def combine(g: pa.Table) -> pa.Table:
                key_types = {k: g.schema.field(k).type for k in by}
                df = g.to_pandas(types_mapper=int_types_mapper)
                out = _z_rebase(df, by)
                arrays = {k: pa.Array.from_pandas(out[k],
                                                  type=key_types[k])
                          for k in by}
                return pa.table({**arrays,
                                 **{c2: pa.Array.from_pandas(out[c2])
                                    for c2 in out.columns
                                    if c2 not in by}})

            parts_ds = ds.select_columns(by + columns).map_batches(
                partial, batch_format="pyarrow")
            stats_ds = group_map(parts_ds, "__part", combine,
                                 n_parts_z)
            stat_parts = [b for b in stats_ds.iter_batches(
                batch_size=None, batch_format="pyarrow")]
            if stat_parts:
                stats = pa.concat_tables(
                    stat_parts, promote_options="default").to_pandas()
            else:  # empty input: no groups — apply never runs either
                stats = _pd.DataFrame(
                    {c: [] for c in by
                     + [p + c2 for c2 in columns for p in stat_cols]})
        else:
            parts = _fold_scalar_blocks(ds.select_columns(columns), partial)
            if parts is None:
                stats = _pd.DataFrame(
                    {f"__{f}_{c}": [0.0] for c in columns
                     for f in ("n", "s", "q", "m")})
            else:
                stats = _z_rebase(parts, None)
    else:
        aggs = {}
        for c in columns:
            aggs[f"__lo_{c}"] = (c, "min")
            aggs[f"__hi_{c}"] = (c, "max")
        if by:
            stats_ds = grouped_agg(ds.select_columns(by + columns), by, aggs)
            stat_parts = [b for b in stats_ds.iter_batches(
                batch_size=None, batch_format="pyarrow")]
            if stat_parts:
                stats = pa.concat_tables(
                    stat_parts, promote_options="default").to_pandas()
            else:
                stats = _pd.DataFrame({c: [] for c in by + list(aggs)})
        else:
            def mm_partial(batch: pa.Table) -> pa.Table:
                row = {}
                for c in columns:
                    x = pc.cast(batch.column(c), pa.float64(), safe=False)
                    mm = pc.min_max(x)
                    row[f"__lo_{c}"] = [mm["min"].as_py()]
                    row[f"__hi_{c}"] = [mm["max"].as_py()]
                return pa.table(row)

            parts = _fold_scalar_blocks(ds.select_columns(columns),
                                        mm_partial)
            if parts is None:
                parts = _pd.DataFrame({k: [None] for k in aggs})
            stats = _pd.DataFrame({
                **{f"__lo_{c}": [parts[f"__lo_{c}"].min()] for c in columns},
                **{f"__hi_{c}": [parts[f"__hi_{c}"].max()] for c in columns}})

    stats_ref = ray.put(stats)

    def apply(df: "pd.DataFrame") -> "pd.DataFrame":
        st = ray.get(stats_ref)
        df = df.reset_index(drop=True)  # align assignments positionally
        if by:
            merged = df.merge(st, on=by, how="left")
        else:
            merged = df.assign(**{c2: st[c2].iloc[0] for c2 in st.columns})
        for c in columns:
            x = merged[c].astype("float64")
            if method == "zscore":
                n = merged[f"__n_{c}"].astype("float64")
                sm = merged[f"__s_{c}"] / n.where(n > 0, 1.0)  # shifted mean
                var = merged[f"__q_{c}"] / n.where(n > 0, 1.0) - sm * sm
                std = np.sqrt(np.maximum(var, 0.0))
                z = (x - (sm + merged[f"__m_{c}"])) / std.where(std > 0, 1.0)
                out = z.where(std > 0, 0.0)
            else:
                lo = merged[f"__lo_{c}"].astype("float64")
                rng = merged[f"__hi_{c}"].astype("float64") - lo
                out = ((x - lo) / rng.where(rng > 0, 1.0)).where(rng > 0, 0.0)
            df[f"{c}{out_suffix}"] = out.where(x.notna(), np.nan)
        return df

    return ds.map_batches(apply, batch_format="pandas")
