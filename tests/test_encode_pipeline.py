"""End-to-end encode pipeline: bit identity, size target, manifest,
resume, skew split (SURVEY §5 engine test strategy, items c & d)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nailray.encode import manifest as mf
from nailray.encode import pipeline as pl


@pytest.fixture(scope="module")
def encoded(corpus_dir, tmp_path_factory):
    """Multi-partition encode (tiny partitions — exercises splitting,
    chunking, resume; codec choices at this scale legitimately favor
    plain+zstd for content)."""
    out = str(tmp_path_factory.mktemp("enc"))
    summary = pl.encode_dataset(
        corpus_dir, out, target_partition_bytes=256 << 10, chunk_rows=400, chunk_bytes=1 << 20
    )
    return corpus_dir, out, summary


@pytest.fixture(scope="module")
def encoded_big(corpus_dir, tmp_path_factory):
    """Single-partition encode (realistic partition size relative to the
    corpus — the regime where FSST beats plain+zstd and the size
    criterion is asserted)."""
    out = str(tmp_path_factory.mktemp("encbig"))
    summary = pl.encode_dataset(
        corpus_dir, out, target_partition_bytes=64 << 20, chunk_rows=4000, chunk_bytes=16 << 20
    )
    return corpus_dir, out, summary


def test_encode_summary(encoded):
    _, out, summary = encoded
    assert summary["rows"] == 2000
    assert summary["partitions"] >= 2
    assert summary["newly_encoded"] == summary["partitions"]
    assert summary["encoded_payload_bytes"] < summary["input_bytes"]


def test_manifest_contents(encoded):
    _, out, _ = encoded
    comp = mf.load_completed(out)
    assert comp
    e = next(iter(comp.values()))
    for key in ["repos", "n_rows", "n_chunks", "codec_choices", "fsst_table_sha256",
                "input_bytes", "encoded_bytes", "wall_sec", "status"]:
        assert key in e, key
    plan = mf.load_plan(out)
    assert plan["input_fragments"]
    assert "repos" in plan["plan"]
    all_choices = {}
    for ent in comp.values():
        for col, d in ent["codec_choices"].items():
            for k, v in d.items():
                all_choices.setdefault(col, {}).setdefault(k, 0)
                all_choices[col][k] += v
    assert set(all_choices["lang"]) <= {"dict", "rle", "plain"}


def test_codec_choices_at_scale(encoded_big):
    # at realistic partition sizes the measured trials pick fsst for
    # content and dict/rle for the key columns
    comp = mf.load_completed(encoded_big[1])
    all_choices = {}
    for ent in comp.values():
        for col, d in ent["codec_choices"].items():
            for k, v in d.items():
                all_choices.setdefault(col, {}).setdefault(k, 0)
                all_choices[col][k] += v
    assert "fsst" in all_choices["content"], all_choices
    assert set(all_choices["lang"]) <= {"dict", "rle"}


def test_skew_split(encoded):
    _, out, summary = encoded
    # corpus is zipf-skewed; with a 256 KiB target the giant repo must split
    assert summary["split_repos"], summary


def test_bit_identity(encoded):
    src, out, _ = encoded
    res = pl.verify_bit_identity(src, out)
    assert res["match"], res


def test_skew_split_keeps_commit_runs(encoded, corpus_table):
    """Shards of a split repo are assigned by hash(commit), so a commit's
    rows land in ONE shard: summed per-chunk commit cardinality must stay
    near the global distinct count (a path-hash scatter would multiply it
    by the shard count)."""
    import pyarrow.compute as pc

    _, out, summary = encoded
    assert summary["split_repos"]  # precondition: a repo actually split
    stored = 0
    n_chunks = 0
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(out, f), columns=["commit__meta"])
        for m in t.column("commit__meta").to_pylist():
            meta = json.loads(m)
            vm = meta.get("value_meta") or {}
            stored += vm.get("cardinality", meta.get("cardinality", 0))
            n_chunks += 1
    distinct = len(pc.unique(corpus_table.column("commit")))
    # boundary chunks may re-store one value each; scatter would give ~k×
    assert stored <= distinct + 2 * n_chunks, (stored, distinct, n_chunks)


def test_decode_full_table(encoded, corpus_table):
    _, out, _ = encoded
    from nailray.io import to_arrow

    t = to_arrow(pl.decode_dataset(out))
    assert t.num_rows == corpus_table.num_rows
    # full row multiset equality (not just content)
    key = lambda tb: sorted(zip(*[tb.column(c).to_pylist() for c in
                                  ["repo", "path", "commit", "lang", "content"]]))
    assert key(t.select(["repo", "path", "commit", "lang", "content"])) == key(corpus_table)


def test_size_beats_zstd_baseline(encoded_big, corpus_table, tmp_path):
    """Compressed-size criterion vs reference Parquet (zstd).

    Asserted on the realistically-partitioned encode: payload bytes must
    beat the baseline's data pages; file bytes within the fixed-cost
    envelope (footer/schema per partition). The strict file-level `≤` is
    also tracked at bench scale (bench.py / BASELINE.md)."""
    _, out, summary = encoded_big
    base = str(tmp_path / "baseline.parquet")
    pq.write_table(corpus_table, base, compression="zstd")
    base_size = os.path.getsize(base)
    md = pq.ParquetFile(base).metadata
    base_data = sum(
        md.row_group(rg).column(c).total_compressed_size
        for rg in range(md.num_row_groups)
        for c in range(md.row_group(rg).num_columns)
    )
    enc_size = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert summary["encoded_payload_bytes"] <= base_data, (
        f"payload {summary['encoded_payload_bytes']} > baseline data pages {base_data}"
    )
    assert enc_size <= base_size * 1.3, f"encoded {enc_size} > 1.3× baseline {base_size}"


def test_resume_skips_completed(encoded):
    src, out, _ = encoded
    # re-run: everything complete → nothing re-encoded
    s2 = pl.encode_dataset(src, out, target_partition_bytes=256 << 10,
                           chunk_rows=400, chunk_bytes=1 << 20)
    assert s2["newly_encoded"] == 0
    assert s2["resumed_skipped"] == s2["partitions"]
    # simulate a killed run: drop one partition's manifest entry + file
    victim = sorted(mf.load_completed(out))[0]
    os.remove(mf.entry_path(out, victim))
    os.remove(mf.part_file(out, victim))
    s3 = pl.encode_dataset(src, out, target_partition_bytes=256 << 10,
                           chunk_rows=400, chunk_bytes=1 << 20)
    assert s3["newly_encoded"] == 1  # only the victim re-encoded
    res = pl.verify_bit_identity(src, out)
    assert res["match"], res


def test_resume_reuses_stored_plan(corpus_dir, tmp_path):
    """A resumed run must reuse the persisted _plan.json part_id mapping —
    NOT replan (a replan under a different adaptive target would remap
    part ids while old completed ids are filtered out → silent row
    loss/dup). Changed inputs or target must fail loudly."""
    out = str(tmp_path / "enc")
    pl.encode_dataset(corpus_dir, out, target_partition_bytes=256 << 10,
                      chunk_rows=400, chunk_bytes=1 << 20)
    plan_before = mf.load_plan(out)
    victim = sorted(mf.load_completed(out))[0]
    os.remove(mf.entry_path(out, victim))
    os.remove(mf.part_file(out, victim))
    # resume with target_partition_bytes=None: the adaptive target would
    # differ from 256 KiB — the stored plan must govern anyway
    s = pl.encode_dataset(corpus_dir, out, chunk_rows=400, chunk_bytes=1 << 20)
    assert s["newly_encoded"] == 1
    assert mf.load_plan(out)["plan"] == plan_before["plan"]  # not rewritten
    assert pl.verify_bit_identity(corpus_dir, out)["match"]
    # conflicting explicit target on resume → loud error
    os.remove(mf.entry_path(out, victim))
    os.remove(mf.part_file(out, victim))
    with pytest.raises(RuntimeError, match="target_partition_bytes"):
        pl.encode_dataset(corpus_dir, out, target_partition_bytes=1 << 20,
                          chunk_rows=400, chunk_bytes=1 << 20)
    # changed input set on resume → loud error
    extra = tmp_path / "extra_src"
    extra.mkdir()
    import shutil
    for f in sorted(os.listdir(corpus_dir)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(corpus_dir, f), extra / f)
    shutil.copy(next(str(extra / f) for f in os.listdir(extra)),
                extra / "dup-extra.parquet")
    with pytest.raises(RuntimeError, match="input fragments differ"):
        pl.encode_dataset(str(extra), out, chunk_rows=400, chunk_bytes=1 << 20)


def test_fragment_resume_rejects_changed_inputs(corpus_dir, tmp_path):
    out = str(tmp_path / "encfrag")
    pl.encode_fragments(corpus_dir, out, chunk_rows=400, chunk_bytes=1 << 20)
    assert pl.verify_bit_identity(corpus_dir, out)["match"]
    victim = sorted(mf.load_completed(out))[0]
    os.remove(mf.entry_path(out, victim))
    os.remove(mf.part_file(out, victim))
    import shutil
    extra = tmp_path / "fragsrc2"
    extra.mkdir()
    for f in sorted(os.listdir(corpus_dir)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(corpus_dir, f), extra / f)
    (extra / "zzz-new.parquet").write_bytes(
        (extra / sorted(os.listdir(extra))[0]).read_bytes())
    with pytest.raises(RuntimeError, match="file list differs"):
        pl.encode_fragments(str(extra), out, chunk_rows=400, chunk_bytes=1 << 20)
    # unchanged inputs: resume re-encodes only the victim
    s = pl.encode_fragments(corpus_dir, out, chunk_rows=400, chunk_bytes=1 << 20)
    assert s["newly_encoded"] == 1
    assert pl.verify_bit_identity(corpus_dir, out)["match"]


def test_codec_choice_determinism(encoded):
    src, out, _ = encoded
    comp = mf.load_completed(out)
    victim = sorted(comp)[0]
    before = comp[victim]
    os.remove(mf.entry_path(out, victim))
    os.remove(mf.part_file(out, victim))
    pl.encode_dataset(src, out, target_partition_bytes=256 << 10,
                      chunk_rows=400, chunk_bytes=1 << 20)
    after = mf.load_completed(out)[victim]
    assert before["codec_choices"] == after["codec_choices"]
    assert before["fsst_table_sha256"] == after["fsst_table_sha256"]
    assert before["n_rows"] == after["n_rows"]


def test_empty_input(tmp_path):
    """Empty-input parity (reference: src/utils/io.rs:340-383 writes valid
    empty outputs): encode/verify of a 0-row corpus succeeds."""
    import pyarrow as pa

    d = tmp_path / "empty_src"
    d.mkdir()
    schema = pa.schema([(c, pa.string()) for c in
                        ["repo", "path", "commit", "lang", "content"]])
    pq.write_table(schema.empty_table(), str(d / "empty.parquet"))
    out = str(tmp_path / "empty_enc")
    s = pl.encode_dataset(str(d), out)
    assert s["rows"] == 0 and s["partitions"] == 0
    assert pl.verify_bit_identity(str(d), out)["match"]


def test_verify_partitions(encoded):
    """Partition-level decode verification against manifest digests
    (no input re-read); outcome written back into the manifest."""
    _, out, _ = encoded
    res = pl.verify_partitions(out)
    assert res["partitions"] > 0 and not res["failed"], res
    e = next(iter(mf.load_completed(out).values()))
    assert e["decode_verify"]["ok"] is True
    # corrupt a payload → that partition must fail verification
    victim = sorted(mf.load_completed(out))[0]
    pfile = mf.part_file(out, victim)
    data = open(pfile, "rb").read()
    t = pq.read_table(pfile)
    col = t.column("content__payload").to_pylist()
    col[0] = col[0][:-4] + b"\x00\x00\x00\x00" if len(col[0]) > 4 else col[0]
    t2 = t.set_column(t.column_names.index("content__payload"), "content__payload",
                      pa.array(col, pa.large_binary()))
    pq.write_table(t2, pfile, compression="none", use_dictionary=False,
                   write_statistics=False)
    try:
        res2 = pl.verify_partitions(out)
        assert victim in res2["failed"] or res2["failed"] == [victim] or res2["failed"]
    finally:
        with open(pfile, "wb") as f:
            f.write(data)  # restore for other tests


def test_entropy_coder_is_self_describing(monkeypatch):
    """Payloads record their entropy coder (meta "zc"); archives written
    under NAILRAY_ENTROPY=brotli:7 decode in a default-env process."""
    import pyarrow as pa

    from nailray.encode import pipeline as pl

    raw = b"fn main() { println!(\"hello\"); }" * 100
    monkeypatch.setattr(pl, "_ENTROPY", pa.Codec("brotli", compression_level=7))
    monkeypatch.setattr(pl, "_ENTROPY_NAME", "brotli")
    z, n = pl._zip_payload(raw)
    # a default-configured reader decodes via the recorded coder name
    assert pl._unzip_payload(z, n, "brotli") == raw
    zz, nn = pl._zip_payload(raw)
    assert pl._unzip_payload(zz, nn, "brotli") == raw
    monkeypatch.undo()
    z2, n2 = pl._zip_payload(raw)
    assert pl._unzip_payload(z2, n2) == raw


def test_decode_cache_invalidates_on_reencode(corpus_dir, tmp_path):
    """Worker-level decode cache must not serve stale data after the same
    output dir is re-encoded with different content in one Ray session."""
    import shutil

    from nailray.corpus import write_corpus
    from nailray.io import to_arrow

    out = str(tmp_path / "enc")
    pl.encode_dataset(corpus_dir, out, target_partition_bytes=1 << 20)
    first = to_arrow(pl.decode_dataset(out)).num_rows

    src2 = str(tmp_path / "src2")
    write_corpus(src2, n_rows=first // 2, seed=99)
    shutil.rmtree(out)
    pl.encode_dataset(src2, out, target_partition_bytes=1 << 20)
    decoded = to_arrow(pl.decode_dataset(out))
    assert decoded.num_rows == first // 2
    res = pl.verify_bit_identity(src2, out)
    assert res["match"], res
