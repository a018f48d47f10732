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


def test_xlsx_gated(tmp_path):
    from nailray import io as nio

    try:
        import openpyxl  # noqa: F401

        has = True
    except ImportError:
        has = False
    if not has:
        with pytest.raises(NotImplementedError):
            nio.read_xlsx(str(tmp_path / "x.xlsx"))
