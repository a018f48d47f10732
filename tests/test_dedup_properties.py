"""Property tests: dedup_lines / dedup_spans / bm25 against brute-force
Python references on random corpora (random block splits included)."""

import collections
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from nailray.io import to_arrow
from nailray.textops.analysis import bm25_scores
from nailray.textops.dedup import dedup_lines, dedup_spans

_WORDS = ["a", "bb", "ccc", "dd", "e"]


@st.composite
def corpora(draw):
    rng = np.random.default_rng(draw(st.integers(0, 10_000)))
    n_docs = draw(st.integers(1, 12))
    docs = []
    for _ in range(n_docs):
        n_lines = int(rng.integers(0, 4))
        lines = [" ".join(rng.choice(_WORDS, size=rng.integers(1, 6)))
                 for _ in range(n_lines)]
        docs.append("\n".join(lines))
    return docs, int(draw(st.integers(1, 4)))


def _ds(docs, nblocks):
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    return rd.from_arrow(t).repartition(nblocks)


def _out(ds_result):
    return to_arrow(ds_result).to_pandas().sort_values("doc_id")["text"].tolist()


@settings(max_examples=15, deadline=None)
@given(corpora())
def test_dedup_lines_matches_bruteforce(tc):
    docs, nblocks = tc
    counts = collections.Counter(l for d in docs for l in d.split("\n"))
    want = ["\n".join(l for l in d.split("\n") if counts[l] < 3) for d in docs]
    got = _out(dedup_lines(_ds(docs, nblocks), min_count=3))
    assert got == want


def _spans_ref(docs, k, min_count):
    toks = [[t for t in d.split() if t] for d in docs]
    counts = collections.Counter(
        " ".join(ts[i:i + k]) for ts in toks for i in range(len(ts) - k + 1))
    out = []
    for ts in toks:
        covered = [False] * len(ts)
        for i in range(len(ts) - k + 1):
            if counts[" ".join(ts[i:i + k])] >= min_count:
                for j in range(i, i + k):
                    covered[j] = True
        out.append(" ".join(t for t, c in zip(ts, covered) if not c))
    return out


@settings(max_examples=15, deadline=None)
@given(corpora(), st.integers(2, 3))
def test_dedup_spans_matches_bruteforce(tc, k):
    docs, nblocks = tc
    want = _spans_ref(docs, k, 2)
    got = _out(dedup_spans(_ds(docs, nblocks), k=k, min_count=2))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(corpora())
def test_bm25_matches_bruteforce(tc):
    docs, nblocks = tc
    terms = ["a", "ccc"]
    k1, b = 1.2, 0.75
    toks = [[t for t in d.split() if t] for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    df = {t: sum(1 for ts in toks if t in ts) for t in terms}
    want = {}
    for i, ts in enumerate(toks):
        s = 0.0
        for t in terms:
            tf = ts.count(t)
            if tf:
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / max(avgdl, 1e-12)))
        if s > 0:
            want[i] = s
    gdf = to_arrow(bm25_scores(_ds(docs, nblocks), terms)).to_pandas()
    # a fully-filtered result has zero batches; to_arrow then yields a
    # no-column empty table (Ray 2.49 quirk) — normalize to empty dict
    got = ({} if gdf.empty else gdf.set_index("doc_id")["score"].to_dict())
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9


@given(st.lists(st.text(max_size=80), min_size=1, max_size=20))
@settings(max_examples=25, deadline=None)
def test_normalize_text_idempotent(texts):
    """normalize(normalize(x)) == normalize(x) — canonical forms are
    fixed points (NFC, lower, ASCII-ws collapse, trim)."""
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.clean import normalize_text

    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    once = normalize_text(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id")["text"].tolist()
    t2 = pa.table({"doc_id": pa.array(range(len(once)), pa.int64()),
                   "text": pa.array(once, pa.string())})
    twice = normalize_text(rd.from_arrow(t2)).to_pandas() \
        .sort_values("doc_id")["text"].tolist()
    assert once == twice


@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60), min_size=1, max_size=12))
@settings(max_examples=25, deadline=None)
def test_redact_pii_leaves_no_matches(texts):
    """After redaction, no PII pattern matches remain in any document
    (the replacement tokens themselves must not re-trigger a kind)."""
    import re

    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.clean import PII_PATTERNS, redact_pii

    kinds = ("email", "ipv4", "ssn")
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = redact_pii(rd.from_arrow(t), kinds=kinds).to_pandas()
    for txt in out["text"]:
        for kind in kinds:
            assert not re.search(PII_PATTERNS[kind], txt), (kind, txt)


def test_verify_pairs_jaccard_planted(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from nailray.textops.dedup import verify_pairs_jaccard

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["abcdefgh", "abcdefgh",   # identical -> 1.0
                 "abcdefgh", "zzzzzzzz",   # disjoint grams -> 0.0
                 "ab", None],              # both shorter than k -> 1.0
    })).repartition(3)
    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": [0, 2, 4], "id_b": [1, 3, 5]}))
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in verify_pairs_jaccard(docs, pairs, "text", "doc_id",
                                         k=5).take_all()}
    assert out[(0, 1)] == 1.0
    assert out[(2, 3)] == 0.0
    assert out[(4, 5)] == 1.0  # empty-vs-empty convention

    # overlap case: "abcdef" vs "bcdefg": grams {ab cde f., bcdef} ...
    docs2 = rd.from_pandas(pd.DataFrame({
        "doc_id": [10, 11], "text": ["abcdefg", "bcdefgh"]}))
    pairs2 = rd.from_pandas(pd.DataFrame({"id_a": [10], "id_b": [11]}))
    got = verify_pairs_jaccard(docs2, pairs2, "text", "doc_id",
                               k=5).take_all()[0]["jaccard"]
    # grams a: {abcde,bcdef,cdefg} b: {bcdef,cdefg,defgh}; |I|=2 |U|=4
    assert abs(got - 0.5) < 1e-12


def test_verify_pairs_jaccard_random_unicode_matches_reference(ray_session):
    """Vectorized gram-code scorer == per-pair Python string-set scorer
    on a random corpus with multi-byte codepoints, repeats, and docs
    shared across many pairs."""
    import random

    import pandas as pd
    import ray.data as rd

    from nailray.textops.dedup import _char_kgram_set, verify_pairs_jaccard

    rng = random.Random(7)
    alphabet = "abc déß日本語🙂"
    texts = ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 30)))
             for _ in range(40)]
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(40), "text": texts})).repartition(4)
    ia = [rng.randrange(40) for _ in range(120)]
    ib = [rng.randrange(40) for _ in range(120)]
    pairs = rd.from_pandas(pd.DataFrame({"id_a": ia, "id_b": ib}))
    k = 3
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in verify_pairs_jaccard(docs, pairs, "text", "doc_id",
                                         k=k).take_all()}
    for a, b in zip(ia, ib):
        sa, sb = _char_kgram_set(texts[a], k), _char_kgram_set(texts[b], k)
        want = (1.0 if not sa and not sb else
                0.0 if not sa or not sb else len(sa & sb) / len(sa | sb))
        assert abs(got[(a, b)] - want) < 1e-12, (a, b, texts[a], texts[b])
