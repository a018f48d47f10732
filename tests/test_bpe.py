"""Distributed BPE trainer: merge-sequence identity with the sequential
reference, overlap-run semantics, unicode fallback."""

import pyarrow as pa
import ray.data as rd

from nailray.textops.bpe import (bpe_pair_counts, bpe_train,
                                 bpe_train_reference, words_with_counts)


def _wc(texts):
    wc = {}
    for s in texts:
        for w in s.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ds(texts, parts=3):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return rd.from_arrow(t).repartition(parts)


def test_bpe_merge_sequence_matches_reference():
    texts = ["low lower lowest low low", "new newer newest new",
             "wider wide wide new low", "banana bandana banana"]
    got = bpe_train(_ds(texts), "text", n_merges=10)
    ref = bpe_train_reference(_wc(texts), n_merges=10)
    assert got == ref
    assert len(got) == 10


def test_bpe_overlapping_runs_left_to_right():
    """'aaaa' under merge ('a','a') must merge non-overlapping
    left-to-right (aa,aa), exactly like the sequential scan."""
    texts = ["aaaa aaa aa aaaa"]
    got = bpe_train(_ds(texts, parts=1), "text", n_merges=3)
    ref = bpe_train_reference(_wc(texts), n_merges=3)
    assert got == ref
    assert got[0] == ("a", "a", 9)          # 3+2+1+3 adjacent pairs
    assert ("aa", "aa", 2) in got            # the two 'aaaa' words


def test_bpe_unicode_words_fall_back():
    texts = ["héllo héllo wörld café café café"]
    got = bpe_train(_ds(texts, parts=1), "text", n_merges=4)
    ref = bpe_train_reference(_wc(texts), n_merges=4)
    assert got == ref


def test_bpe_min_count_stops_early():
    texts = ["ab cd ef"]  # every pair count 1
    assert bpe_train(_ds(texts, parts=1), "text", n_merges=5,
                     min_count=2) == []


def test_words_with_counts_and_pair_query(sf_dir):
    import duckdb

    from nailray.io import read_parquet

    ds = read_parquet(f"{sf_dir}/documents.parquet")
    total = sum(r["cnt"] for r in words_with_counts(ds).take_all())
    ref = duckdb.connect().execute(
        f"SELECT CAST(SUM(len(list_filter(regexp_split_to_array(text, "
        f"'\\s+'), x -> x != ''))) AS BIGINT) FROM "
        f"read_parquet('{sf_dir}/documents.parquet')").fetchone()[0]
    assert total == ref
    top = bpe_pair_counts(ds, k=5).to_pandas()
    assert len(top) == 5 and (top["cnt"].diff().dropna() <= 0).all()


def test_bpe_long_sequence_random_corpus():
    """Long merge sequence (50) over a random small-alphabet corpus —
    the regime where the batched speculative trainer mispredicts often
    (new pairs outrank later candidates) and the validated-prefix
    rollback must keep the sequence EXACTLY sequential."""
    import numpy as np

    rng = np.random.default_rng(23)
    alpha = list("abcde")
    texts = [" ".join("".join(rng.choice(alpha, rng.integers(1, 9)))
                      for _ in range(40)) for _ in range(12)]
    got = bpe_train(_ds(texts, parts=4), "text", n_merges=50, min_count=1,
                    batch_merges=8)
    ref = bpe_train_reference(_wc(texts), n_merges=50, min_count=1)
    assert got == ref


def test_bpe_batch_one_equals_batch_many():
    texts = ["low lower lowest low low", "new newer newest new",
             "aaaa aaa banana bandana banana"]
    a = bpe_train(_ds(texts), "text", n_merges=12, batch_merges=1)
    b = bpe_train(_ds(texts), "text", n_merges=12, batch_merges=32)
    ref = bpe_train_reference(_wc(texts), n_merges=12)
    assert a == ref and b == ref


def test_bpe_recount_fallback_path():
    """driver_pairs_budget=0 forces the legacy per-round recount loop —
    same merge sequence."""
    texts = ["low lower lowest low low", "banana bandana banana"]
    got = bpe_train(_ds(texts), "text", n_merges=8, driver_pairs_budget=0)
    ref = bpe_train_reference(_wc(texts), n_merges=8)
    assert got == ref


def test_bpe_empty_corpus_and_nul_bytes():
    # empty corpus → empty merge table, no crash
    assert bpe_train(_ds([""], parts=1), "text", n_merges=3) == []
    # NUL byte in a word must NOT take the ASCII byte-view fast path
    # (S1→U1 maps b'\x00' to '', corrupting symbols)
    texts = ["a\x00b a\x00b a\x00b xy xy"]
    got = bpe_train(_ds(texts, parts=1), "text", n_merges=2)
    ref = bpe_train_reference(_wc(texts), n_merges=2)
    assert got == ref
