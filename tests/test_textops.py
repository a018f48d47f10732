"""Training-data operators: dedup (exact/minhash/simhash), text
analysis, ANN, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from nailray import ann, multimodal
from nailray.io import read_parquet, to_arrow
from nailray.textops import analysis, dedup


def _docs(sf_dir):
    return read_parquet(f"{sf_dir}/documents.parquet")


def test_exact_dedup(sf_dir):
    ds = _docs(sf_dir)
    out = to_arrow(dedup.exact_dedup(ds, "text", "doc_id")).to_pandas()
    import duckdb
    ref = duckdb.connect().execute(
        f"select count(*) from (select min(doc_id) from "
        f"read_parquet('{sf_dir}/documents.parquet') group by text)"
    ).fetchone()[0]
    assert len(out) == ref
    assert out["doc_id"].is_unique


def test_minhash_near_dup():
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    texts = [base, base + " extra", "completely different content about quantum physics " * 3,
             base.replace("quick", "quik"), "another unrelated short text snippet entirely"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    ds = rd.from_arrow(t)
    out = dedup.minhash_dedup(ds, "text", "doc_id", threshold=0.5, num_perm=64, bands=16)
    kept = sorted(to_arrow(out).to_pandas()["doc_id"])
    assert 0 in kept  # canonical survives
    assert len(kept) < 5  # near-dups of 0 dropped
    assert 2 in kept and 4 in kept  # unrelated docs survive


def test_exact_dedup_shuffle_carries_no_text(sf_dir):
    """Scale guard: the shuffled stage of exact dedup must carry only
    (content_sha256, keep_id) — never the document text."""
    ds = _docs(sf_dir).limit(100)
    winners = dedup.exact_dedup_winners(ds, "text", "doc_id")
    names = set(winners.schema().names)
    assert names == {"content_sha256", "keep_id"}, names


def test_minhash_dedup_dup_heavy_cluster():
    """A 3k-identical-doc cluster must be handled linearly (star pairs to
    the min-id rep), not O(cluster²): all dups dropped, distinct docs
    survive, and the run completes fast."""
    import time

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    n_dup = 3000
    texts = [base] * n_dup + [
        f"totally distinct document number {i} about topic {i * 7} " * 2
        for i in range(10)
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    t0 = time.time()
    out = dedup.minhash_dedup(rd.from_arrow(t).repartition(8), "text", "doc_id",
                              threshold=0.8)
    kept = sorted(to_arrow(out).to_pandas()["doc_id"])
    wall = time.time() - t0
    assert kept[0] == 0 and len([k for k in kept if k < n_dup]) == 1
    assert set(range(n_dup, n_dup + 10)) <= set(kept)
    # O(cluster²) would emit ~4.5M pairs per band × 16 bands; linear star
    # pairs finish well inside this bound even on a noisy box
    assert wall < 120, wall


def test_two_pass_cache_input_auto(sf_dir):
    """cache_input='auto' must re-read plain file inputs (no pinning)
    and materialize derived ones — and both modes must produce the same
    result (the r2 VERDICT scale-default A/B)."""
    from nailray.io import is_plain_file_read

    ds = _docs(sf_dir)
    assert is_plain_file_read(ds)
    derived = ds.map_batches(lambda t: t, batch_format="pyarrow")
    assert not is_plain_file_read(derived)

    def norm(d):
        return to_arrow(d).to_pandas().sort_values("doc_id").reset_index(drop=True)

    a = norm(dedup.dedup_lines(ds, cache_input="auto"))      # re-read path
    b = norm(dedup.dedup_lines(ds, cache_input=True))        # materialize path
    c = norm(dedup.dedup_lines(derived, cache_input="auto"))  # derived → materialize
    assert a.equals(b) and a.equals(c)


def test_minhash_dedup_distributed_cc_beyond_max_edges():
    """The distributed components path (default) has NO driver edge cap:
    a dup cluster whose pair count exceeds a deliberately tiny
    ``max_edges`` must still fully merge (exactly one survivor), while
    the legacy driver path under the same cap under-merges."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    n_dup = 200  # star pairs alone (199) exceed max_edges=20
    texts = [base] * n_dup + ["unique doc %d with its own words %d" % (i, i * 3)
                              for i in range(5)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = dedup.minhash_dedup(rd.from_arrow(t).repartition(6), "text",
                              "doc_id", threshold=0.8, max_edges=20,
                              components="distributed")
    kept = sorted(to_arrow(out).to_pandas()["doc_id"])
    assert [k for k in kept if k < n_dup] == [0]
    assert set(range(n_dup, n_dup + 5)) <= set(kept)


def test_connected_component_labels_chain():
    """Multi-round convergence: a path graph needs label propagation +
    pointer jumping across several rounds; every node must end at the
    component-min label with no driver-side union-find."""
    import numpy as np

    n = 40  # path 0-1-...-39 → diameter 39, converges via jumping
    edges = pa.table({"id_a": pa.array(np.arange(1, n), pa.int64()),
                      "id_b": pa.array(np.arange(0, n - 1), pa.int64())})
    for stme in (0, 10**6):  # multi-round exchange AND single-task paths
        lab = dedup.connected_component_labels(
            rd.from_arrow(edges).repartition(4), single_task_max_edges=stme)
        df = to_arrow(lab).to_pandas()
        assert len(df) == n
        assert (df["label"] == 0).all()


def test_embedding_dup_heavy_bucket():
    """2k byte-identical vectors collapse to star pairs (linear), with the
    expected (rep, member) pair count and cosine 1.0."""
    from nailray.textops.dedup import embedding_near_duplicates

    rng = np.random.default_rng(1)
    v = rng.standard_normal(8)
    n = 2000
    vecs = [v] * n + [rng.standard_normal(8) for _ in range(5)]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([x.tolist() for x in vecs], pa.list_(pa.float32())),
    })
    pairs = to_arrow(embedding_near_duplicates(
        rd.from_arrow(t).repartition(4), "embedding", "vec_id",
        threshold=0.99)).to_pandas()
    dup_pairs = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] < n)]
    assert len(dup_pairs) == n - 1          # star, not quadratic
    assert (dup_pairs["cosine"] == 1.0).all()


def test_minhash_batched_equals_per_doc():
    """The batched sliding-window MinHasher must produce bit-identical
    signatures to the per-document reference path (incl. empty and
    shorter-than-k docs)."""
    rng = np.random.default_rng(7)
    texts = ["", "ab", "abcd", "hello world " * 5, "x" * 3,
             "the quick brown fox jumps over the lazy dog"]
    texts += ["".join(chr(97 + int(c)) for c in
                      rng.integers(0, 26, int(rng.integers(0, 300))))
              for _ in range(40)]
    mh = dedup.MinHasher("text", "doc_id", 64, 5, 42)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    got = np.stack([np.asarray(v, np.uint64)
                    for v in mh(t).column("minhash").to_pylist()])
    ref = np.stack([dedup._minhash_sig(dedup._shingle_hashes(x or "", 5),
                                       mh.a, mh.b) for x in texts])
    assert (got == ref).all()


def test_simhash_batched_equals_per_doc():
    """SimHasher (memoized, reduceat bit-votes) must bit-match
    simhash64 per document, incl. empty/whitespace-only docs."""
    rng = np.random.default_rng(3)
    texts = ["", "  ", "one", "a b c", "the quick brown fox " * 3]
    # exotic whitespace: \v and NBSP are NOT separators under the shared
    # RE2 tokenizer — both sides must treat them as token characters
    texts += ["a\x0bb c", "x\xa0y z", "tab\tsep\nlines\r\fmix"]
    texts += [" ".join("tok%d" % rng.integers(0, 50)
                       for _ in range(int(rng.integers(0, 40))))
              for _ in range(40)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    got = np.asarray(dedup.SimHasher("text")(t).column("simhash"), np.uint64)
    ref = np.array([dedup.simhash64(x) for x in texts], np.uint64)
    assert (got == ref).all()


def test_ngram_jaccard():
    assert dedup.ngram_jaccard("abcdefgh", "abcdefgh") == 1.0
    assert dedup.ngram_jaccard("abcdefgh", "zzzzzzzz") == 0.0
    mid = dedup.ngram_jaccard("the quick brown fox", "the quick brown cat")
    assert 0.2 < mid < 0.9


def test_simhash_candidates():
    texts = ["the quick brown fox jumps over the lazy dog every day",
             "the quick brown fox jumps over the lazy dog every night",
             "entirely different words here about compilers and parsers",
             "the quick brown fox jumps over the lazy dog every day"]  # dup of 0
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    ds = dedup.add_simhash(rd.from_arrow(t), "text")
    hs = to_arrow(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    d01 = bin(int(hs["simhash"][0]) ^ int(hs["simhash"][1])).count("1")
    d02 = bin(int(hs["simhash"][0]) ^ int(hs["simhash"][2])).count("1")
    assert d01 < d02  # similar docs are closer in hamming space
    assert int(hs["simhash"][0]) == int(hs["simhash"][3])  # identical text
    # banding guarantees candidacy for hamming ≤ 3 (pigeonhole on 4×16 bits)
    cand = to_arrow(dedup.simhash_candidates(ds, "doc_id", max_hamming=3)).to_pandas()
    assert {(a, b) for a, b in zip(cand["id_a"], cand["id_b"])} >= {(0, 3)}


def test_text_analysis(sf_dir):
    ds = _docs(sf_dir)
    out = to_arrow(analysis.token_counts(ds, "text")).to_pandas()
    assert (out["n_words"] >= 0).all()
    # n_chars column in the table should match our computed chars
    assert (out["n_chars_calc"] == out["n_chars"]).all()
    q = to_arrow(analysis.quality_scores(ds.limit(50), "text")).to_pandas()
    assert q["quality_score"].between(0, 1).all()
    lid = to_arrow(analysis.language_id(ds.limit(50), "text")).to_pandas()
    assert set(lid["lang_pred"]) <= {"en", "de", "fr", "es", "it", "unknown"}
    fp = to_arrow(analysis.fingerprint(ds.limit(20), "text")).to_pandas()
    assert fp["fingerprint"].str.len().eq(16).all()
    # fingerprint ignores whitespace normalization differences
    t = pa.table({"text": ["a  b\tc", "a b c"]})
    fp2 = to_arrow(analysis.fingerprint(rd.from_arrow(t), "text")).to_pandas()
    assert fp2["fingerprint"][0] == fp2["fingerprint"][1]


def test_ann_bruteforce_vs_numpy(sf_dir):
    ds = read_parquet(f"{sf_dir}/embeddings.parquet")
    t = to_arrow(ds)
    mat = np.stack([np.asarray(v, np.float64) for v in t.column("embedding").to_pylist()])
    ids = np.asarray(t.column("vec_id"))
    q = mat[0]
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    ref = set(ids[np.argsort(-sims)[:10]].tolist())
    got = ann.topk_cosine(ds, q, k=10)
    assert set(got["vec_id"]) == ref
    assert got["sim"].iloc[0] > 0.999  # self-match first


def test_ann_lsh(sf_dir):
    ds = read_parquet(f"{sf_dir}/embeddings.parquet")
    t = to_arrow(ds)
    dim = len(t.column("embedding")[0].as_py())
    q = np.asarray(t.column("embedding")[0].as_py(), np.float64)
    bucketed = ann.add_lsh_bucket(ds, dim, n_bits=8)
    got = ann.topk_cosine_lsh(bucketed, q, k=5, dim=dim, n_bits=8)
    assert len(got) == 5
    assert got["vec_id"].iloc[0] == t.column("vec_id")[0].as_py()  # finds self


def test_unigram_logprob_planted():
    """Hand-computable LM scores: corpus 'a a a b' (T=4) with top_vocab
    covering both tokens → p(a)=3/4, p(b)=1/4; an OOV-only doc gets the
    floor; an empty doc scores 0."""
    import math

    from nailray.textops.analysis import unigram_logprob

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["a a a", "b", ""]})
    out = to_arrow(unigram_logprob(rd.from_arrow(t).repartition(2),
                                   "text", "doc_id", top_vocab=2)) \
        .to_pandas().set_index("doc_id")["unigram_logprob"]
    assert abs(out[0] - math.log(3 / 4)) < 1e-12
    assert abs(out[1] - math.log(1 / 4)) < 1e-12
    assert out[2] == 0.0
    # top_vocab=1 keeps only 'a' → 'b' falls to the 0.5/T floor
    out2 = to_arrow(unigram_logprob(rd.from_arrow(t), "text", "doc_id",
                                    top_vocab=1)).to_pandas() \
        .set_index("doc_id")["unigram_logprob"]
    assert abs(out2[1] - math.log(0.5 / 4)) < 1e-12


def test_multimodal_real_codecs_roundtrip():
    """Pure-numpy/stdlib codecs: BMP, PPM, WAV round-trip bit-exact,
    nearest resize hits known pixels — no PIL/soundfile involved."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (multimodal.decode_bmp(multimodal.encode_bmp(img)) == img).all()
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    assert (multimodal.decode_image(multimodal.encode_bmp(img)) == img).all()
    # nearest resize of a 2x scale-up repeats each pixel 2x2
    up = multimodal.resize_nearest(img, 10, 14)
    assert up.shape == (14, 10, 3)
    assert (up[::2, ::2] == img).all() and (up[1::2, 1::2] == img).all()
    pcm = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    out, rate = multimodal.decode_wav(multimodal.encode_wav(pcm, 8000))
    assert rate == 8000 and (out == pcm).all()
    stereo = np.stack([pcm, -pcm], axis=1)
    out2, _ = multimodal.decode_wav(multimodal.encode_wav(stereo, 8000))
    assert out2.shape == (400, 2) and (out2 == stereo).all()


def test_png_roundtrip_and_decode_image():
    """stdlib-zlib PNG codec: encode→decode bit-exact; decode_image
    routes PNG payloads and canonicalizes to RGB."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 6, 3), dtype=np.uint8)
    png = multimodal.encode_png(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert (multimodal.decode_png(png) == img).all()
    assert (multimodal.decode_image(png) == img).all()


def _make_png(w, h, ctype, rows, plte=None):
    """Hand-built PNG with explicit per-row filter bytes (rows =
    list of (filter, FILTERED bytes)) — exercises each unfilter path
    against independently computed expected pixels."""
    import struct
    import zlib

    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    chunks = multimodal._png_chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += multimodal._png_chunk(b"PLTE", bytes(plte))
    chunks += multimodal._png_chunk(b"IDAT", zlib.compress(raw))
    chunks += multimodal._png_chunk(b"IEND", b"")
    return b"\x89PNG\r\n\x1a\n" + chunks


def test_png_all_filters_unfilter_exactly():
    """One grayscale PNG per filter type, filtered bytes derived by
    APPLYING the spec filter to known pixels — decode must return the
    original pixels."""
    # target pixels, 3 rows x 4 cols grayscale
    px = np.array([[10, 20, 30, 40],
                   [15, 25, 200, 250],
                   [7, 130, 129, 128]], np.uint8)

    def filt(row, prev, f):
        out = []
        for x in range(len(row)):
            a = int(row[x - 1]) if x else 0   # left RECON
            b = int(prev[x])                  # up RECON
            c = int(prev[x - 1]) if x else 0  # upper-left RECON
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (int(row[x]) - a) % 256
            elif f == 2:
                v = (int(row[x]) - b) % 256
            elif f == 3:
                v = (int(row[x]) - (a + b) // 2) % 256
            else:  # paeth
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                v = (int(row[x]) - pred) % 256
            out.append(v)
        return out

    for f in range(5):
        rows = []
        prev = np.zeros(4, np.uint8)
        for y in range(3):
            rows.append((f, filt(px[y], prev, f)))
            prev = px[y]
        png = _make_png(4, 3, 0, rows)
        got = multimodal.decode_png(png)
        assert got.shape == (3, 4, 1), f
        assert (got[:, :, 0] == px).all(), f"filter {f}"


def test_png_palette_rgba_and_gray_paths():
    # palette: indices -> PLTE colors
    plte = [255, 0, 0, 0, 255, 0, 0, 0, 255]  # R, G, B entries
    rows = [(0, [0, 1, 2]), (0, [2, 1, 0])]
    img = multimodal.decode_png(_make_png(3, 2, 3, rows, plte=plte))
    assert img.shape == (2, 3, 3)
    assert (img[0] == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]).all()
    # RGBA: decode keeps 4 channels; decode_image drops alpha
    rgba_rows = [(0, [1, 2, 3, 9, 4, 5, 6, 9])]
    raw = multimodal.decode_png(_make_png(2, 1, 6, rgba_rows))
    assert raw.shape == (1, 2, 4)
    rgb = multimodal.decode_image(_make_png(2, 1, 6, rgba_rows))
    assert (rgb == [[[1, 2, 3], [4, 5, 6]]]).all()
    # 16-bit depth must refuse, not corrupt
    import struct as _s
    import zlib as _z
    bad_ihdr = _s.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + multimodal._png_chunk(b"IHDR", bad_ihdr)
           + multimodal._png_chunk(b"IDAT", _z.compress(b"\x00\x00\x00"))
           + multimodal._png_chunk(b"IEND", b""))
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        multimodal.decode_png(bad)


def test_png_pattern_table_matches_bmp_pattern():
    a = multimodal.synthesize_bmp_table_pattern(8)
    b = multimodal.synthesize_png_table_pattern(8)
    for i in range(8):
        pa_ = multimodal.decode_image(a.column("payload")[i].as_py())
        pb_ = multimodal.decode_image(b.column("payload")[i].as_py())
        assert (pa_ == pb_).all()


def test_multimodal_real_pipeline_end_to_end():
    """Real decode → resize → feature pipeline over Ray with planted BMP
    payloads: decoded output pixels and stats match numpy ground truth."""
    t = multimodal.synthesize_bmp_table(40, seed=9)
    ds = rd.from_arrow(t)
    rz = to_arrow(multimodal.resize_images(ds, 8, 6, batch_size=16,
                                           real_decode=True)).to_pandas()
    assert (rz["width"] == 8).all() and (rz["height"] == 6).all()
    for _, row in rz.head(5).iterrows():
        img = multimodal.decode_bmp(row["payload"])
        assert img.shape == (6, 8, 3)
    # pixel ground truth for one known row
    src = multimodal.decode_bmp(t.column("payload")[0].as_py())
    want = multimodal.resize_nearest(src, 8, 6)
    got = multimodal.decode_bmp(
        rz.set_index("media_id").loc[0, "payload"])
    assert (got == want).all()
    # real feature stage: [w, h, means, stds]
    fs = to_arrow(multimodal.image_stats(ds, batch_size=16)).to_pandas()
    f0 = np.asarray(fs.set_index("media_id").loc[0, "features"], np.float64)
    flat = src.reshape(-1, 3).astype(np.float64)
    assert f0[0] == src.shape[1] and f0[1] == src.shape[0]
    assert np.allclose(f0[2:5], flat.mean(axis=0), atol=1e-3)
    assert np.allclose(f0[5:8], flat.std(axis=0), atol=1e-3)
    # real audio stage over planted WAV payloads
    rng = np.random.default_rng(3)
    wavs = [multimodal.encode_wav(
        (rng.normal(0, 0.2, 300) * 32767).astype(np.int16), 16000)
        for _ in range(10)]
    at = pa.table({"media_id": pa.array(range(10), pa.int64()),
                   "payload": pa.array(wavs, pa.large_binary())})
    au = to_arrow(multimodal.audio_stats(rd.from_arrow(at), batch_size=4)).to_pandas()
    a0 = np.asarray(au.set_index("media_id").loc[0, "audio_features"], np.float64)
    s0, r0 = multimodal.decode_wav(wavs[0])
    x = s0.astype(np.float64) / 32768.0
    assert a0[0] == 16000 and a0[1] == 300 and a0[2] == 1
    assert abs(a0[3] - x.mean()) < 1e-4 and abs(a0[4] - x.std()) < 1e-4


def test_multimodal_plumbing():
    t = multimodal.synthesize_media_table(100, seed=3)
    ds = rd.from_arrow(t)
    out = to_arrow(multimodal.extract_features(ds, feature_dim=16, batch_size=16))
    assert out.num_rows == 100
    assert len(out.column("features")[0].as_py()) == 16
    # deterministic: same payload → same features
    f0 = out.to_pandas().set_index("media_id")["features"]
    out2 = to_arrow(multimodal.extract_features(ds, feature_dim=16, batch_size=32)).to_pandas()
    f1 = out2.set_index("media_id")["features"]
    assert list(f0[0]) == list(f1[0])
    sampled = multimodal.frame_sample(ds, every_n=10)
    assert sampled.count() == 10
    # resize: metadata updated, payload deterministically transformed
    rz = to_arrow(multimodal.resize_images(ds, 64, 48, batch_size=32)).to_pandas()
    assert (rz["width"] == 64).all() and (rz["height"] == 48).all()
    assert rz["payload"].map(lambda p: p.startswith(b"resized:64x48:")).all()
    rz2 = to_arrow(multimodal.resize_images(ds, 64, 48, batch_size=16)).to_pandas()
    assert rz.set_index("media_id")["payload"].to_dict() == \
        rz2.set_index("media_id")["payload"].to_dict()
    # audio: fixed-size feature vector, deterministic across batch sizes
    au = to_arrow(multimodal.extract_audio_features(ds, n_mels=8, batch_size=16)).to_pandas()
    assert au["audio_features"].map(len).eq(8).all()
    au2 = to_arrow(multimodal.extract_audio_features(ds, n_mels=8, batch_size=32)).to_pandas()
    assert list(au.set_index("media_id")["audio_features"][0]) == \
        list(au2.set_index("media_id")["audio_features"][0])
    # non-BMP/PPM/WAV formats still gate cleanly without PIL/soundfile
    import pytest
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"notanimage")
    with pytest.raises(NotImplementedError):
        multimodal.ImageResizer(32, 32, real_decode=True)._resize_payload(
            b"\x89PNG not decodable here")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"notaudio")


def test_ann_ivf(sf_dir):
    from nailray import ann as A

    ds = read_parquet(f"{sf_dir}/embeddings.parquet")
    t = to_arrow(ds)
    q = np.asarray(t.column("embedding")[0].as_py(), np.float64)
    cent = A.build_ivf_centroids(ds, n_centroids=16, seed=1)
    assert cent.shape[0] == 16
    bucketed = A.add_ivf_bucket(ds, cent)
    got = A.topk_cosine_ivf(bucketed, cent, q, k=5, nprobe=4)
    assert len(got) == 5
    assert got["vec_id"].iloc[0] == t.column("vec_id")[0].as_py()  # finds self
    # recall vs brute force at nprobe=4/16 should be decent
    exact = set(A.topk_cosine(ds, q, k=5)["vec_id"])
    assert len(set(got["vec_id"]) & exact) >= 2


def test_simhash_trailing_empty_doc():
    """Batch composition must not change a doc's simhash: a batch whose
    LAST rows are empty/whitespace previously stole the preceding doc's
    final token vote (reduceat offset clamping)."""
    texts = ["alpha beta gamma", ""]
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": texts})
    got = np.asarray(dedup.SimHasher("text")(t).column("simhash"), np.uint64)
    assert got[0] == np.uint64(dedup.simhash64(texts[0]))
    assert got[1] == np.uint64(dedup.simhash64(""))


def test_batch_matrix_ragged_guard():
    """Ragged list columns must never silently reshape into a wrong
    matrix — even when the total element count divides the row count."""
    tb = pa.table({"e": pa.array([[1.0, 2.0], [3.0, 4.0, 5.0, 6.0]],
                                 pa.list_(pa.float64()))})
    with pytest.raises(ValueError):
        ann._batch_matrix(tb, "e")
    ok = pa.table({"e": pa.array([[1.0, 2.0], [3.0, 4.0]], pa.list_(pa.float64()))})
    m = ann._batch_matrix(ok, "e")
    assert m.shape == (2, 2) and m[1, 0] == 3.0


def test_token_counts_unicode_and_composition():
    """Unicode words count as single tokens (RE2 \\w is ASCII-only, so
    the kernel spells out \\p{L}\\p{N}), and re-running an analysis
    stage overwrites its columns instead of duplicating fields."""
    import pyarrow as pa
    import ray.data as rd
    from nailray.textops import analysis

    t = pa.table({"doc_id": [1, 2], "text": ["café über", "plain words here."]})
    ds = analysis.token_counts(rd.from_arrow(t), "text")
    out = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")),
                           promote_options="default")
    by_id = {r["doc_id"]: r for r in out.to_pylist()}
    assert by_id[1]["n_tokens"] == 2
    assert by_id[2]["n_tokens"] == 4  # 3 words + final period

    # composition: quality_scores over an already-token_counted dataset
    ds2 = analysis.quality_scores(analysis.token_counts(rd.from_arrow(t), "text"), "text")
    out2 = pa.concat_tables(list(ds2.iter_batches(batch_format="pyarrow")),
                            promote_options="default")
    assert out2.column_names.count("n_tokens") == 1
    assert out2.column_names.count("quality_score") == 1


def test_token_topk_vs_duckdb(sf_dir):
    """Distributed vocab top-k == DuckDB unnest+group+order, including
    the tie-break at the k boundary."""
    import duckdb

    import nailray.io as nio
    from nailray.textops import analysis

    got = nio.to_arrow(analysis.token_topk(
        nio.read_parquet(f"{sf_dir}/documents.parquet"), "text",
        k=25)).to_pandas()
    ora = duckdb.sql(
        "WITH t AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) "
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS count FROM t "
        "WHERE token != '' GROUP BY token "
        "ORDER BY count DESC, token LIMIT 25").df()
    assert got["token"].tolist() == ora["token"].tolist()
    assert got["count"].tolist() == ora["count"].tolist()


def test_token_topk_null_and_empty_docs():
    import pyarrow as pa
    import ray.data as rd

    import nailray.io as nio
    from nailray.textops import analysis

    t = pa.table({"text": pa.array(
        ["a b a", None, "", "  ", "b a"], pa.string())})
    out = nio.to_arrow(analysis.token_topk(
        rd.from_arrow(t).repartition(3), "text", k=10)).to_pylist()
    assert out == [{"token": "a", "count": 3}, {"token": "b", "count": 2}]


def test_repetition_metrics_known_values():
    from nailray.io import to_arrow

    t = pa.table({"text": pa.array(
        ["a a b", "x y z", None, "", "q q q q"], pa.string())})
    out = to_arrow(analysis.repetition_metrics(
        rd.from_arrow(t).repartition(2), "text")).to_pylist()
    got = [(r["rep_dup_frac"], r["rep_top_frac"]) for r in out]
    assert got[0] == (1.0 - 2 / 3, 2 / 3)
    assert got[1] == (0.0, 1.0 / 3)
    assert got[2] == (0.0, 0.0) and got[3] == (0.0, 0.0)
    assert got[4] == (0.75, 1.0)


def test_repetition_metrics_line_unit_and_bad_unit():
    from nailray.io import to_arrow

    t = pa.table({"text": pa.array(["l1\nl2\nl1", "one line"], pa.string())})
    out = to_arrow(analysis.repetition_metrics(
        rd.from_arrow(t), "text", unit="line")).to_pylist()
    assert out[0]["rep_dup_frac"] == pytest.approx(1 / 3)
    assert out[1]["rep_dup_frac"] == 0.0
    with pytest.raises(ValueError):
        analysis.repetition_metrics(rd.from_arrow(t), "text", unit="char")


def test_decontaminate_flag_and_drop():
    from nailray.io import to_arrow
    from nailray.textops import decontam

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(
            ["clean doc", "has SECRET+TOKEN inside", None, "another (clean)"],
            pa.string()),
    })
    ds = rd.from_arrow(t).repartition(2)
    # '+' and '(' must be treated literally, '' ignored, None text never matches
    flags = to_arrow(decontam.flag_contaminated(
        ds, ["SECRET+TOKEN", "", "(clean)"], "text")).to_pandas()
    flags = flags.sort_values("doc_id")["contaminated"].tolist()
    assert flags == [False, True, False, True]

    kept = to_arrow(decontam.decontaminate(
        ds, ["SECRET+TOKEN", "(clean)"], "text")).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 2]
    assert "contaminated" not in kept.columns and "__contam__" not in kept.columns

    # no snippets -> nothing flagged
    none = to_arrow(decontam.flag_contaminated(ds, [], "text")).to_pandas()
    assert not none["contaminated"].any()


def test_decontaminate_chunked_patterns():
    from nailray.io import to_arrow
    from nailray.textops import decontam

    # force >1 alternation chunk: 600 distinct snippets, one of which hits
    snips = [f"needle{i:04d}" for i in range(600)]
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["contains needle0599 here", "nope"],
                                   pa.string())})
    got = to_arrow(decontam.flag_contaminated(
        rd.from_arrow(t), snips, "text")).to_pandas().sort_values("doc_id")
    assert got["contaminated"].tolist() == [True, False]


def test_ngram_decontaminate_planted():
    from nailray.io import to_arrow
    from nailray.textops import decontam

    bench = ["alpha beta gamma delta epsilon",
             "tiny"]  # < n tokens: contributes no shingles
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "prefix beta gamma delta suffix",        # shares a 3-gram
            "alpha beta wrong delta epsilon",        # no shared 3-gram
            None,                                    # null text never flags
            "x  alpha\tbeta gamma y",                # multi-whitespace split
            "tiny tiny tiny",                        # only overlaps 'tiny' 1-grams
        ], pa.string()),
    })
    ds = rd.from_arrow(t).repartition(3)
    got = to_arrow(decontam.flag_contaminated_ngrams(
        ds, bench, n=3, text_col="text")).to_pandas().sort_values("doc_id")
    assert got["contaminated"].tolist() == [True, False, False, True, False]

    kept = to_arrow(decontam.decontaminate_ngrams(
        ds, bench, n=3, text_col="text")).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 2, 4]
    assert "__contam_ng__" not in kept.columns

    # empty benchmark set -> nothing flagged
    none = to_arrow(decontam.flag_contaminated_ngrams(
        ds, [], n=3, text_col="text")).to_pandas()
    assert not none["contaminated"].any()


def test_bm25_scores_planted():
    """Hand-checkable BM25: 3 docs, terms ('a','b'); empty doc excluded."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.analysis import bm25_scores

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a a b", "b c", "c c c", ""], pa.string()),
    })
    out = bm25_scores(rd.from_arrow(docs).repartition(2), ["a", "b"]) \
        .to_pandas().set_index("doc_id")["score"]
    # N=4, tokens: d1=3, d2=2, d3=3, d4=0 -> avgdl=2.0
    # df_a=1, df_b=2; idf_a=ln(1+3.5/1.5), idf_b=ln(1+2.5/2.5)
    k1, b = 1.2, 0.75
    idf_a = math.log(1 + 3.5 / 1.5)
    idf_b = math.log(1 + 2.5 / 2.5)

    def sc(tf, dl, idf):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 2.0))

    assert abs(out[1] - (sc(2, 3, idf_a) + sc(1, 3, idf_b))) < 1e-12
    assert abs(out[2] - sc(1, 2, idf_b)) < 1e-12
    assert 3 not in out.index and 4 not in out.index


def test_bm25_topk_mode():
    import pyarrow as pa
    import ray.data as rd

    from nailray.io import to_arrow
    from nailray.textops.analysis import bm25_scores

    docs = pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array([("x " * (i + 1)).strip() for i in range(10)], pa.string()),
    })
    top = to_arrow(bm25_scores(rd.from_arrow(docs).repartition(3), ["x"], k=3))
    assert top.num_rows == 3
    # higher tf with bounded dl penalty -> longest docs win here
    assert sorted(top.column("doc_id").to_pylist()) == [7, 8, 9]


def test_dedup_lines_planted():
    """Line 'DUP' appears 3x corpus-wide -> stripped everywhere; unique
    lines survive in order; a doc reduced to nothing becomes ''."""
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_lines

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "keep one\nDUP\nkeep two",
            "DUP",
            "solo line\nDUP",
            "unique here",
        ], pa.string()),
    })
    out = dedup_lines(rd.from_arrow(docs).repartition(2), min_count=3) \
        .to_pandas().set_index("doc_id")["text"]
    assert out[1] == "keep one\nkeep two"
    assert out[2] == ""
    assert out[3] == "solo line"
    assert out[4] == "unique here"


def test_dedup_lines_threshold_not_met():
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_lines

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["twice\nx", "twice\ny"], pa.string()),
    })
    out = dedup_lines(rd.from_arrow(docs), min_count=3).to_pandas() \
        .set_index("doc_id")["text"]
    assert out[1] == "twice\nx" and out[2] == "twice\ny"


def test_dedup_spans_planted():
    """k=2, min_count=2: 'alpha beta' repeats across docs -> both tokens
    of every occurrence removed; overlapping hot spans merge coverage."""
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_spans

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta gamma",     # 'alpha beta' hot -> 'gamma' survives
            "x alpha beta y",       # middle span removed
            "unique words only",
        ], pa.string()),
    })
    out = dedup_spans(rd.from_arrow(docs).repartition(2), k=2, min_count=2) \
        .to_pandas().set_index("doc_id")["text"]
    assert out[1] == "gamma"
    assert out[2] == "x y"
    assert out[3] == "unique words only"


def test_dedup_lines_semijoin_matches_broadcast():
    """hot_broadcast_bytes=0 forces the hash-partitioned semi-join path;
    output must equal the broadcast path row for row (incl. a NULL-text
    doc and a doc reduced to '')."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_lines

    rng = np.random.default_rng(5)
    texts = ["keep one\nDUP\nkeep two", "DUP", "solo\nDUP", None, ""]
    texts += ["\n".join(f"l{rng.integers(0, 12)}" for _ in range(6))
              for _ in range(40)]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(docs).repartition(3)
    a = dedup_lines(ds, min_count=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup_lines(ds, min_count=3, hot_broadcast_bytes=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(b) == len(texts)
    assert a.equals(b)


def test_dedup_spans_semijoin_matches_broadcast():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_spans

    rng = np.random.default_rng(6)
    texts = ["alpha beta gamma", "x alpha beta y", "unique words only",
             "a b c tail", "a b c other", None, ""]
    texts += [" ".join(f"w{rng.integers(0, 9)}" for _ in range(8))
              for _ in range(40)]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(docs).repartition(3)
    a = dedup_spans(ds, k=2, min_count=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dedup_spans(ds, k=2, min_count=2, hot_broadcast_bytes=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(b) == len(texts)
    assert a.equals(b)


def test_dedup_spans_overlapping_coverage():
    """'a b c' duplicated as both ('a b') and ('b c') hot 2-grams:
    coverage union removes all three tokens, not just one span."""
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_spans

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b c tail", "a b c other"], pa.string()),
    })
    out = dedup_spans(rd.from_arrow(docs), k=2, min_count=2) \
        .to_pandas().set_index("doc_id")["text"]
    assert out[1] == "tail" and out[2] == "other"


def test_dedup_spans_short_docs_untouched():
    import pyarrow as pa
    import ray.data as rd

    from nailray.textops.dedup import dedup_spans

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["one", "one"], pa.string()),  # < k tokens
    })
    out = dedup_spans(rd.from_arrow(docs), k=3, min_count=2) \
        .to_pandas().set_index("doc_id")["text"]
    assert out[1] == "one" and out[2] == "one"


def test_redact_pii_planted():
    from nailray.textops.clean import redact_pii

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail me at a.b+c@foo-bar.org or b@x.io thanks",
            "server at 10.0.0.1 and 192.168.1.255, ssn 123-45-6789",
            "nothing sensitive here",
        ], pa.string()),
    })
    out = redact_pii(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "mail me at <email> or <email> thanks"
    assert out.loc[1, "n_email"] == 2 and out.loc[1, "n_ipv4"] == 0
    assert out.loc[2, "text"] == "server at <ipv4> and <ipv4>, ssn <ssn>"
    assert out.loc[2, "n_ipv4"] == 2 and out.loc[2, "n_ssn"] == 1
    assert out.loc[3, "text"] == "nothing sensitive here"
    assert list(out.loc[3, ["n_email", "n_ipv4", "n_ssn"]]) == [0, 0, 0]


def test_redact_pii_unknown_kind_rejected():
    from nailray.textops.clean import redact_pii

    docs = pa.table({"text": pa.array(["x"], pa.string())})
    with pytest.raises(ValueError):
        redact_pii(rd.from_arrow(docs), kinds=("email", "nope"))


def test_normalize_text_planted():
    import unicodedata

    from nailray.textops.clean import normalize_text

    decomposed = "Café"  # e + combining acute
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "  Hello\t\tWORLD  ",
            decomposed + "  du Monde\n\nx",
            None,
        ], pa.string()),
    })
    out = normalize_text(rd.from_arrow(docs)).to_pandas().set_index("doc_id")
    assert out.loc[1, "text"] == "hello world"
    got = out.loc[2, "text"]
    assert got == "café du monde x"
    assert unicodedata.is_normalized("NFC", got)  # composed, single codepoint
    assert out.loc[3, "text"] is None


def test_mix_sources_rates_and_determinism():
    from nailray.ops.sampling import mix_sources

    n = 20000
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["web" if i % 2 else "books" for i in range(n)],
                           pa.string()),
    })
    rates = {"web": 0.25, "books": 1.0}
    out = mix_sources(rd.from_arrow(tbl), "source", rates, "doc_id",
                      seed=11).to_pandas()
    by = out.groupby("source").size()
    assert by["books"] == n // 2                      # rate 1.0 keeps all
    assert abs(by["web"] / (n // 2) - 0.25) < 0.02    # ~rate within 2%
    # deterministic: same rows on a re-run regardless of block layout
    out2 = mix_sources(
        rd.from_arrow(tbl).repartition(7), "source", rates, "doc_id",
        seed=11).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])
    # rate 0 drops the group entirely
    out3 = mix_sources(rd.from_arrow(tbl), "source", {"web": 0.0}, "doc_id",
                       seed=11, default_rate=1.0).to_pandas()
    assert (out3["source"] == "books").all()


def test_connected_component_labels_string_ids():
    """Regression: the multi-round exchange's convergence checksum must
    handle string node ids (only the int path existed; string-id
    corpora crashed on the distributed default past the single-task
    threshold)."""
    names = [f"url{i:03d}" for i in range(30)]
    edges = pa.table({"id_a": pa.array(names[1:], pa.string()),
                      "id_b": pa.array(names[:-1], pa.string())})
    for stme in (0, 10**6):  # multi-round exchange AND single-task paths
        lab = dedup.connected_component_labels(
            rd.from_arrow(edges).repartition(3), single_task_max_edges=stme)
        df = to_arrow(lab).to_pandas()
        assert len(df) == 30
        assert (df["label"] == "url000").all()


def test_mix_sources_null_ids_dropped():
    """Null ids must drop deterministically (SQL NULL-comparison
    semantics), not hash NaN garbage."""
    from nailray.ops.sampling import mix_sources

    tbl = pa.table({
        "doc_id": pa.array([1, None, 3, None], pa.int64()),
        "source": pa.array(["a", "a", "b", "b"], pa.string()),
    })
    out = mix_sources(rd.from_arrow(tbl), "source", {"a": 1.0, "b": 1.0},
                      "doc_id", seed=3).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]


def test_explode_lines_planted():
    from nailray.textops.clean import explode_lines

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a\nb\nc", "only", ""], pa.string()),
    })
    out = explode_lines(rd.from_arrow(docs)).to_pandas() \
        .sort_values(["doc_id", "line_no"]).reset_index(drop=True)
    assert list(out["line"]) == ["a", "b", "c", "only", ""]
    assert list(out["line_no"]) == [1, 2, 3, 1, 1]


def test_filter_domains_and_extract():
    from nailray.textops.clean import extract_domain, filter_domains

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "see http://Spam.Example/x now",
            "fine https://good.org/page",
            "no links here",
            "both http://spam.example/a and http://good.org/b",  # first URL decides
        ], pa.string()),
    })
    dom = extract_domain(rd.from_arrow(docs)).to_pandas().set_index("doc_id")["domain"]
    assert dom[1] == "spam.example" and dom[2] == "good.org" and dom[3] == ""
    kept = sorted(filter_domains(rd.from_arrow(docs), {"SPAM.example"})
                  .to_pandas()["doc_id"])
    assert kept == [2, 3]  # 1 and 4 blocked; no-URL doc survives


def test_ngram_topk_respects_document_boundaries(ray_session):
    import pandas as pd
    import ray.data as rd

    from nailray.textops.analysis import ngram_topk

    # "b a" would be counted once if grams leaked across docs
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b", "a b", "c"]}))
    out = {r["gram"]: r["count"]
           for r in ngram_topk(ds, "text", n=2, k=10).take_all()}
    assert out == {"a b": 2}

    tri = {r["gram"]: r["count"] for r in ngram_topk(
        rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x y z x y"]})),
        "text", n=3, k=10).take_all()}
    assert tri == {"x y z": 1, "y z x": 1, "z x y": 1}


def test_minhash_clusters_labels_and_singletons():
    """Cluster labeling: near-dup groups share the min-id label, docs
    with no near-dup label themselves, and every input row comes back
    exactly once."""
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the woods tonight under a pale moon")
    texts = [base, base + " extra", base.replace("quick", "quik"),
             "completely different content about quantum physics " * 3,
             "another unrelated short text snippet entirely ok"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    out = to_arrow(dedup.minhash_clusters(
        rd.from_arrow(t), "text", "doc_id", threshold=0.5,
        num_perm=64, bands=16)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4]
    lab = dict(zip(out["doc_id"], out["cluster_id"]))
    assert lab[0] == 0 and lab[1] == 0 and lab[2] == 0  # near-dup cluster
    assert lab[3] == 3 and lab[4] == 4  # singletons label themselves


def test_minhash_clusters_all_singletons():
    texts = [f"totally unique document number {i} " * 3 + str(i ** 3)
             for i in range(6)]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()), "text": texts})
    out = to_arrow(dedup.minhash_clusters(
        rd.from_arrow(t), "text", "doc_id", threshold=0.9)).to_pandas()
    assert sorted(out["doc_id"]) == list(range(6))
    assert (out["cluster_id"] == out["doc_id"]).all()


def test_embedding_decontamination_flag_and_drop():
    """Semantic decontamination: rows within cosine-threshold of any
    benchmark vector are flagged/dropped; scale is irrelevant to
    cosine; orthogonal rows survive."""
    from nailray.textops import decontam

    rows = [[1.0, 0.0, 0.0],     # = benchmark 0
            [2.0, 0.0, 0.0],     # same direction, different scale
            [0.0, 1.0, 0.0],     # = benchmark 1
            [0.0, 0.0, 1.0],     # orthogonal to both
            [1.0, 1.0, 0.0]]     # cos 0.707 to both — below 0.95
    t = pa.table({"vec_id": pa.array(range(5), pa.int64()),
                  "embedding": pa.array(rows, pa.list_(pa.float32()))})
    bench = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    flags = to_arrow(decontam.flag_contaminated_embeddings(
        rd.from_arrow(t), bench, "embedding", threshold=0.95)).to_pandas()
    assert flags.sort_values("vec_id")["contaminated"].tolist() == \
        [True, True, True, False, False]
    kept = to_arrow(decontam.decontaminate_embeddings(
        rd.from_arrow(t), bench, "embedding", threshold=0.95)).to_pandas()
    assert sorted(kept["vec_id"]) == [3, 4]
    assert set(kept.columns) == {"vec_id", "embedding"}
    # empty benchmark: nothing contaminated
    none = to_arrow(decontam.flag_contaminated_embeddings(
        rd.from_arrow(t), np.zeros((0, 3)), "embedding")).to_pandas()
    assert not none["contaminated"].any()
