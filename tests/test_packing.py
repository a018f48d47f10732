"""Sequence packing invariants: budget respected, every doc assigned
exactly once, oversized docs isolated, determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from nailray.io import to_arrow
from nailray.textops.packing import pack_sequences


def _run(df, budget, **kw):
    ds = rd.from_pandas(df).repartition(4)
    return to_arrow(pack_sequences(ds, budget, "doc_id", **kw)).to_pandas()


def test_pack_invariants_counts():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "n": rng.integers(1, 900, 500).astype(np.int64),
    })
    out = _run(df, budget=2048, count_col="n")
    # every doc exactly once, counts preserved
    assert sorted(out["doc_id"]) == list(range(500))
    assert out.set_index("doc_id")["n_tokens"].sort_index().tolist() == df["n"].tolist()
    # budget respected (no doc exceeds it here)
    per_pack = out.groupby("pack_id")["n_tokens"].sum()
    assert (per_pack <= 2048).all()
    # packing is reasonably tight: >= 50% average fill
    assert per_pack.mean() >= 1024


def test_pack_oversized_doc_isolated():
    df = pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "n": np.array([5000, 10, 20], dtype=np.int64),
    })
    out = _run(df, budget=100, count_col="n").set_index("doc_id")
    big_pack = out.loc[1, "pack_id"]
    # the oversized doc shares its pack with nobody
    assert (out["pack_id"] == big_pack).sum() == 1


def test_pack_from_text_and_determinism():
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [("w " * (i % 7 + 1)).strip() for i in range(40)],
    })
    a = _run(df, budget=10, text_col="text").sort_values("doc_id").reset_index(drop=True)
    b = _run(df, budget=10, text_col="text").sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # token counts match the whitespace split
    assert a.set_index("doc_id")["n_tokens"].sort_index().tolist() == \
        [i % 7 + 1 for i in range(40)]
    per_pack = a.groupby("pack_id")["n_tokens"].sum()
    assert (per_pack <= 10).all()
