"""CLI smoke tests (subprocess — each invocation owns its Ray session)
and tests for the extended stats (spearman/kendall), outlier variants,
console formatting, xlsx gating."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*argv: str, timeout: int = 240) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")
    return subprocess.run([sys.executable, "-m", "nailray.cli", *argv],
                          capture_output=True, text=True, timeout=timeout, env=env,
                          cwd=REPO)


@pytest.mark.parametrize("argv,expect", [
    (("count",), "2000"),
    (("headers",), "repo"),
    (("head", "-n", "2"), "Record 1:"),
])
def test_cli_basics(corpus_dir, argv, expect):
    r = run_cli(argv[0], corpus_dir, *argv[1:])
    assert r.returncode == 0, r.stderr[-2000:]
    assert expect in r.stdout


def test_cli_filter_write(corpus_dir, tmp_path):
    out = str(tmp_path / "filtered")
    r = run_cli("filter", corpus_dir, "-c", "lang=py", "-o", out)
    assert r.returncode == 0, r.stderr[-2000:]
    import pyarrow.parquet as pq

    t = pq.read_table(out)
    assert set(t.column("lang").to_pylist()) == {"py"}


def test_cli_encode_verify(corpus_dir, tmp_path):
    enc = str(tmp_path / "enc")
    r = run_cli("encode", corpus_dir, "-o", enc)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout)["rows"] == 2000
    r = run_cli("verify", corpus_dir, "--encoded", enc)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout)["match"] is True


def test_spearman_kendall(sf_dir):
    from nailray.io import read_parquet
    from nailray.ops import aggregates

    ds = read_parquet(f"{sf_dir}/lineitem.parquet")
    # quantity and price are independent in the synthetic data: all three
    # coefficients should agree on "no correlation"
    s = aggregates.spearman(ds, "l_quantity", "l_extendedprice")
    k = aggregates.kendall(ds, "l_quantity", "l_extendedprice", sample_rows=500)
    p = aggregates.pearson(ds, "l_quantity", "l_extendedprice")
    assert abs(s) < 0.1 and abs(k) < 0.1 and abs(p) < 0.1
    # monotone transform invariance: spearman(x, exp(x-ish)) stays high
    t = pa.table({"x": pa.array(np.linspace(0, 10, 500)),
                  "y": pa.array(np.exp(np.linspace(0, 10, 500)))})
    assert aggregates.spearman(rd.from_arrow(t), "x", "y") > 0.99


def test_outlier_variants(sf_dir):
    from nailray.io import read_parquet, to_arrow
    from nailray.ops import aggregates

    ds = read_parquet(f"{sf_dir}/lineitem.parquet")
    for method in ["modified-zscore", "isolation"]:
        out = to_arrow(aggregates.outliers(ds, ["l_extendedprice"], method=method,
                                           factor=2.0)).to_pandas()
        assert "is_outlier" in out.columns
        assert 0 <= out["is_outlier"].sum() < len(out)


def test_format_records():
    from nailray.format import format_records, format_table

    s = format_records([{"id": 1, "name": "Alice"}, {"id": 2, "name": None}])
    assert "Record 1:" in s and "name: Alice" in s and "null" in s
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    g = format_table(t)
    assert "a" in g.splitlines()[0] and len(g.splitlines()) == 3


def test_xlsx_roundtrip(tmp_path):
    """XLSX works with or without openpyxl (the bundled xlsx_lite
    SpreadsheetML subset is the fallback engine): write → read
    round-trips values and the per-column type vote."""
    import ray.data as rd

    from nailray import io as nio

    t = pa.table({
        "ints": pa.array([1, 2, None], pa.int64()),
        "floats": pa.array([1.5, -2.25, 3.0], pa.float64()),
        "strs": ["a", "b <&> c", "multi word"],
    })
    p = str(tmp_path / "x.xlsx")
    nio.write_xlsx(rd.from_arrow(t), p)
    back = nio.to_arrow(nio.read_xlsx(p))
    assert back.column("ints").to_pylist() == [1, 2, None]
    assert back.column("floats").to_pylist() == [1.5, -2.25, 3.0]
    assert back.column("strs").to_pylist() == ["a", "b <&> c", "multi word"]


def test_xlsx_lite_shared_strings(tmp_path):
    """The lite reader resolves sharedStrings-table cells (what other
    writers emit) — exercised by hand-building such a workbook."""
    import zipfile

    from nailray import xlsx_lite

    p = str(tmp_path / "s.xlsx")
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row><c r="A2"><v>7</v></c><c r="B2" t="s"><v>0</v></c></row>'
        "</sheetData></worksheet>")
    shared = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        'org/spreadsheetml/2006/main"><si><t>h1</t></si><si><t>h2</t></si></sst>')
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", shared)
    assert xlsx_lite.read_rows(p) == [["h1", "h2"], [7, "h1"]]


def test_to_rgb_handles_gray_and_rgba():
    """Regression: real_decode resize must survive grayscale / RGBA
    decodes (PIL paths), not just 3-channel numpy BMP/PPM."""
    import numpy as np

    from nailray.multimodal import encode_bmp, resize_nearest, to_rgb

    gray = (np.arange(12, dtype=np.uint8)).reshape(3, 4)
    rgba = np.zeros((3, 4, 4), np.uint8)
    rgba[..., 3] = 255
    for img in (gray, gray[:, :, None], rgba):
        rgb = to_rgb(img)
        assert rgb.shape == (3, 4, 3) and rgb.dtype == np.uint8
        out = encode_bmp(resize_nearest(rgb, 2, 2))
        assert out[:2] == b"BM"
    assert (to_rgb(gray)[..., 0] == gray).all()
    assert (to_rgb(rgba) == rgba[..., :3]).all()


def test_cli_partitioned_parquet_output(tmp_path):
    out = str(tmp_path / "hive")
    r = run_cli("select", "/root/testdata/sf0.001/orders.parquet",
                "-c", "o_orderkey,o_orderstatus",
                "-o", out, "--partition-by", "o_orderstatus")
    assert r.returncode == 0, r.stderr[-2000:]
    import os as _os

    import pyarrow.dataset as pds

    dirs = sorted(d for d in _os.listdir(out) if d.startswith("o_orderstatus="))
    assert len(dirs) >= 2  # one key=value dir per status
    t = pds.dataset(out, partitioning="hive").to_table()
    assert t.num_rows == 1500
