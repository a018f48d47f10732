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


# ----------------------------------------------------------------------
# bpe_encode: apply a trained merge table — reference identity, ids,
# end-to-end chain into pack_sequences
# ----------------------------------------------------------------------

def test_bpe_encode_matches_reference():
    from nailray.textops.bpe import (bpe_alphabet, bpe_encode,
                                     bpe_encode_reference)

    texts = ["low lower lowest low low", "new newer newest new",
             "", "banana bandana aaaa aaa", "wider wide  wide new low"]
    ds = _ds(texts, parts=3)
    merges = bpe_train(_ds(texts, parts=2), "text", n_merges=8)
    alpha = bpe_alphabet(ds, "text")
    out = bpe_encode(ds, merges, alphabet=alpha, text_col="text")
    rows = {r["doc_id"]: r for r in out.take_all()}
    for i, t in enumerate(texts):
        ref = bpe_encode_reference(t, merges, alpha)
        assert rows[i]["token_ids"] == ref, (i, t)
        assert rows[i]["n_tokens"] == len(ref)


def test_bpe_encode_unicode_and_unknown_chars():
    from nailray.textops.bpe import bpe_encode, bpe_encode_reference

    texts = ["héllo wörld café", "abc héllo"]
    alpha = list("abcdefghilmnorw")  # no accents: é/ö → unk
    merges = [("a", "b"), ("ab", "c")]
    ds = _ds(texts, parts=2)
    out = bpe_encode(ds, merges, alphabet=alpha, text_col="text", unk_id=-1)
    rows = {r["doc_id"]: r for r in out.take_all()}
    for i, t in enumerate(texts):
        ref = bpe_encode_reference(t, merges, alpha)
        assert rows[i]["token_ids"] == ref
        assert -1 in rows[i]["token_ids"]  # every doc here has an accent → unk


def test_bpe_encode_null_and_empty_rows():
    from nailray.textops.bpe import bpe_encode

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["aa bb", None, "   "], pa.string())})
    out = bpe_encode(rd.from_arrow(t), [("a", "a")], alphabet=["a", "b"])
    rows = {r["doc_id"]: r for r in out.take_all()}
    assert rows[0]["token_ids"] == [2, 1, 1]  # 'aa'→id 2, 'b','b'
    assert rows[1]["token_ids"] == [] and rows[1]["n_tokens"] == 0
    assert rows[2]["token_ids"] == [] and rows[2]["n_tokens"] == 0


def test_bpe_encode_duplicate_merge_product_shares_id():
    from nailray.textops.bpe import bpe_encode, bpe_vocab

    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc")]
    vocab, id2tok = bpe_vocab(merges, ["a", "b", "c"])
    assert vocab["abc"] == 4 and id2tok[4] == "abc"
    assert len(id2tok) == len(set(id2tok))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "text": pa.array(["abc"], pa.string())}))
    out = bpe_encode(ds, merges, alphabet=["a", "b", "c"]).take_all()
    assert out[0]["token_ids"] == [4]


def test_bpe_encode_into_pack_sequences():
    """train → tokenize → pack: packs budget REAL BPE token counts."""
    from nailray.textops.bpe import bpe_alphabet, bpe_encode
    from nailray.textops.packing import pack_sequences

    texts = [("lo " * 20).strip(), ("ba " * 3).strip(), "x", "y z",
             ("na " * 40).strip()]
    ds = _ds(texts, parts=2)
    merges = bpe_train(ds, "text", n_merges=3, min_count=2)
    enc = bpe_encode(ds, merges, text_col="text")
    packed = pack_sequences(enc, budget=25, id_col="doc_id",
                            count_col="n_tokens")
    rows = {r["doc_id"]: r for r in packed.take_all()}
    enc_rows = {r["doc_id"]: r["n_tokens"] for r in enc.take_all()}
    assert {r for r in rows} == set(range(5))
    for i in range(5):
        assert rows[i]["n_tokens"] == enc_rows[i]
    # every multi-doc pack within budget
    by_pack = {}
    for r in rows.values():
        by_pack.setdefault(r["pack_id"], []).append(r["n_tokens"])
    for members in by_pack.values():
        if len(members) > 1:
            assert sum(members) <= 25
