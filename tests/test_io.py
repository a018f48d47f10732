"""Minimum end-to-end slice (SURVEY §7.2): corpus → read → write →
re-read, per-row content sha256 unchanged; row_id ingest; fast count."""

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc

from nailray import io as nio


def _content_hashes(table: pa.Table) -> set[tuple]:
    col = table.column("content").to_pylist()
    hashes = [hashlib.sha256(c.encode()).hexdigest() for c in col]
    out = {}
    for h in hashes:
        out[h] = out.get(h, 0) + 1
    return set(out.items())


def test_corpus_shape(corpus_table):
    assert corpus_table.num_rows == 2000
    assert corpus_table.column_names == ["repo", "path", "commit", "lang", "content"]
    # skew: the biggest repo dominates
    counts = corpus_table.group_by("repo").aggregate([("repo", "count")])
    top = max(counts.column("repo_count").to_pylist())
    assert top > 2000 / 40 * 3
    # empties + determinism
    lens = pc.utf8_length(corpus_table.column("content"))
    assert pc.min(lens).as_py() == 0
    from nailray.corpus import make_corpus

    again = make_corpus(200, seed=42)
    assert again.equals(make_corpus(200, seed=42))


def test_roundtrip_sha256(corpus_dir, corpus_table, tmp_path):
    ds = nio.read_parquet(corpus_dir)
    out = str(tmp_path / "out")
    nio.write_parquet(ds, out)
    back = nio.read_parquet(out)
    t = nio.to_arrow(back)
    assert t.num_rows == corpus_table.num_rows
    assert _content_hashes(t) == _content_hashes(corpus_table)


def test_row_id_ingest(corpus_dir, corpus_table):
    ds = nio.read_parquet_with_row_id(corpus_dir)
    t = (
        ds.sort("row_id")
        .to_pandas()
    )
    assert list(t["row_id"]) == list(range(1, 2001))
    # row_id order == file order
    assert list(t["path"]) == corpus_table.column("path").to_pylist()


def test_fast_count(corpus_dir):
    assert nio.parquet_num_rows(corpus_dir) == 2000


def test_count_and_convert(corpus_dir, tmp_path):
    ds = nio.read_parquet(corpus_dir)
    assert ds.count() == 2000
    src = sorted(
        os.path.join(corpus_dir, f) for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )[0]
    out_csv = str(tmp_path / "out_csv")
    nio.convert(src, out_csv + "/x.csv") if False else None
    # parquet -> csv -> parquet
    nio.write_csv(nio.read_parquet(src), out_csv)
    back = nio.read_csv(out_csv)
    assert back.count() == nio.parquet_num_rows(src)


def test_tail_any_streaming(tmp_path):
    """tail_any keeps only a sliding window of batches (bounded driver
    memory) and returns the last N rows in order for any source."""
    import csv

    import ray.data as rd

    p = tmp_path / "t.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["i"])
        for i in range(1000):
            w.writerow([i])
    out = nio.tail_any(rd.read_csv(str(p)), 3)
    assert out.column("i").to_pylist() == [997, 998, 999]
    # n larger than the dataset returns everything
    assert nio.tail_any(rd.read_csv(str(p)), 5000).num_rows == 1000
    # empty dataset
    assert nio.tail_any(rd.read_csv(str(p)).filter(lambda r: False), 3).num_rows == 0
