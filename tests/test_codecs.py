"""Codec round-trip bit-identity (the core invariant, SURVEY §5c)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from nailray.encode import codecs

ALL = ["plain", "dict", "rle", "fsst", "prefix"]


def roundtrip(name: str, arr: pa.Array) -> pa.Array:
    c = codecs.get(name)
    payload, meta = c.encode(arr)
    return c.decode(payload, meta)


@pytest.mark.parametrize("name", ALL)
def test_string_roundtrip(name, corpus_table):
    for col in ["repo", "path", "commit", "lang", "content"]:
        arr = corpus_table.column(col).combine_chunks()
        assert roundtrip(name, arr).equals(arr), f"{name} on {col}"


@pytest.mark.parametrize("name", ALL)
def test_empty_and_nulls(name):
    for arr in [
        pa.array([], pa.string()),
        pa.array([None, None], pa.string()),
        pa.array(["", "", ""], pa.string()),
        pa.array(["a", None, "", "ab\x00\xff", None], pa.string()),
    ]:
        assert roundtrip(name, arr).equals(arr), f"{name} on {arr}"


@pytest.mark.parametrize("name", ["plain", "dict", "rle", "for"])
def test_int_roundtrip(name):
    rng = np.random.default_rng(0)
    for vals in [
        rng.integers(-(2**62), 2**62, 1000),
        np.sort(rng.integers(0, 10**12, 1000)),
        np.zeros(100, np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0, -1]),
    ]:
        arr = pa.array(vals, pa.int64())
        assert roundtrip(name, arr).equals(arr), f"{name} on ints"


def test_for_delta_mode():
    arr = pa.array(np.cumsum(np.random.default_rng(1).integers(0, 9, 10_000)), pa.int64())
    payload, meta = codecs.get("for").encode(arr)
    assert meta["mode"] == "delta"
    assert len(payload) < arr.nbytes / 4
    assert codecs.get("for").decode(payload, meta).equals(arr)


def test_dict_compresses_low_cardinality(corpus_table):
    arr = corpus_table.column("lang").combine_chunks()
    payload, _ = codecs.get("dict").encode(arr)
    assert len(payload) < arr.nbytes / 5


def test_fsst_compresses_content(corpus_table):
    arr = corpus_table.column("content").combine_chunks()
    payload, meta = codecs.get("fsst").encode(arr)
    assert len(payload) < arr.nbytes * 0.7
    assert meta["table_sha256"]


def test_fsst_table_reuse_and_hash(corpus_table):
    from nailray.encode.codecs import fsst as F

    arr = corpus_table.column("content").combine_chunks()
    data, _ = F.strings_to_buffer(arr)
    t1, t2 = F.build_table(data), F.build_table(data)
    assert t1.sha256() == t2.sha256()  # deterministic
    c = codecs.FsstCodec(table=t1)
    p, m = c.encode(arr)
    assert m["table_sha256"] == t1.sha256()
    assert codecs.get("fsst").decode(p, m).equals(arr)
    # table round-trips through bytes
    assert F.FsstTable.from_bytes(t1.to_bytes()).sha256() == t1.sha256()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=64)), max_size=200))
def test_property_string_roundtrip(vals):
    arr = pa.array(vals, pa.string())
    for name in ALL:
        assert roundtrip(name, arr).equals(arr), name


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
def test_property_int_roundtrip(vals):
    arr = pa.array(vals, pa.int64())
    for name in ["plain", "for", "rle", "dict"]:
        assert roundtrip(name, arr).equals(arr), name


def test_codec_registry_extension():
    """The codec registry is the engine's user-extension surface
    (SURVEY §2.10): register a custom codec by name, round-trip it."""
    import pyarrow as pa

    from nailray.encode.codecs import base

    class ReverseCodec(base.Codec):
        name = "reverse-demo"

        def encode(self, arr):
            vals = [None if v is None else v[::-1] for v in arr.to_pylist()]
            return base.frame([str(vals).encode()]), {"type": str(arr.type)}

        def decode(self, payload, meta):
            import ast

            vals = ast.literal_eval(base.unframe(payload)[0].decode())
            return pa.array([None if v is None else v[::-1] for v in vals], pa.string())

        def estimate(self, arr, stats):
            return float(stats["nbytes"])

    codecs.register(ReverseCodec())
    try:
        assert "reverse-demo" in codecs.names()
        arr = pa.array(["abc", None, "xyz"], pa.string())
        c = codecs.get("reverse-demo")
        p, m = c.encode(arr)
        assert c.decode(p, m).equals(arr)
    finally:
        codecs._REGISTRY.pop("reverse-demo", None)


def test_prefix_beats_plain_on_sorted_paths():
    """Front coding is the chosen design for the sorted path column
    (partitions are written sorted by repo/path/commit)."""
    paths = pa.array(sorted(
        f"api/codec/batch_{i}.{e}"
        for i, e in zip(range(5000), ["py", "cpp", "rs", "java"] * 1250)))
    pl, _ = codecs.get("plain").encode(paths)
    pr, meta = codecs.get("prefix").encode(paths)
    assert len(pr) < len(pl) / 3
    assert meta["suffix_bytes"] < paths.nbytes / 2
    assert roundtrip("prefix", paths).equals(paths)


def test_prefix_binary_and_pathological():
    for arr in [
        pa.array([b"\x00\xff" * 10, b"\x00\xff" * 10 + b"x", b""], pa.binary()),
        pa.array(["x" * 5000, "x" * 5000 + "y", "a"]),  # deep shared prefix
        pa.array(["same"] * 500),                        # lcp == len
    ]:
        assert roundtrip("prefix", arr).equals(arr)


def test_dict_hex_packs_commit_hashes():
    commits = pa.array(
        ["07b08e4ec830e9c99926ba1b32a9eb0d63a0ee84"] * 5
        + ["deadbeef", "00"] * 3 + [None])
    payload, meta = codecs.get("dict").encode(commits)
    assert b"07b08e4ec830" not in payload  # stored nibble-packed, not text
    assert roundtrip("dict", commits).equals(commits)
    # non-hex / odd-length / uppercase values fall back to the plain path
    for vals in [["DEADBEEF"], ["abc"], ["xyz", "deadbeef"]]:
        arr = pa.array(vals)
        assert roundtrip("dict", arr).equals(arr)
    # rle run values go through the dict codec -> same packing applies
    runny = pa.array(["aa" * 20] * 50 + ["bb" * 20] * 50)
    p, _ = codecs.get("rle").encode(runny)
    assert b"aaaa" not in p
    assert roundtrip("rle", runny).equals(runny)
