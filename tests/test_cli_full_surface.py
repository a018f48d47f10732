"""Full CLI surface smoke — the analogue of the reference's
runtime_tests/test_all_commands.sh (399-line shell suite, SURVEY §5.5):
every subcommand runs against a fixture and exits 0.

One subprocess per command is slow; commands are batched into a single
driver script that reuses one Ray session."""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_commands(corpus_dir, sf_dir, tmp_path):
    out = str(tmp_path)
    li = f"{sf_dir}/lineitem.parquet"
    orders = f"{sf_dir}/orders.parquet"
    customer = f"{sf_dir}/customer.parquet"
    # single-file CSV fixture for the non-parquet tail/sample fallbacks
    import pandas as pd

    csvf = f"{out}/orders_flat.csv"
    pd.read_parquet(orders).head(100).to_csv(csvf, index=False)
    cases = [
        ["tail", csvf, "-n", "3"],
        ["count", csvf],
        ["sample", csvf, "-n", "5", "--method", "last"],
        ["count", corpus_dir],
        ["headers", corpus_dir],
        ["headers", corpus_dir, "--filter", "^c"],
        ["schema", corpus_dir],
        ["head", corpus_dir, "-n", "2"],
        ["tail", corpus_dir, "-n", "2"],
        ["metadata", li],
        ["size", corpus_dir],
        ["preview", corpus_dir, "-n", "3", "--random", "7"],
        ["select", corpus_dir, "-c", "repo,lang", "-o", f"{out}/sel"],
        ["select", corpus_dir, "-r", "1-5", "-o", f"{out}/selr"],
        ["drop", corpus_dir, "-c", "content", "-o", f"{out}/drop"],
        ["drop", li, "-r", "l_quantity>10", "-o", f"{out}/dropc"],
        ["filter", li, "-c", "l_quantity>45,l_returnflag=R", "-o", f"{out}/filt"],
        ["filter", li, "--rows-mode", "no-nan", "-o", f"{out}/filtn"],
        ["search", corpus_dir, "--value", "def", "--columns", "content"],
        ["search", corpus_dir, "--value", "def", "--columns", "content", "--rows"],
        ["rename", orders, "-c", "o_orderkey=key", "-o", f"{out}/ren"],
        ["create", li, "-c", "rev=l_extendedprice*(1-l_discount)", "-o", f"{out}/crea"],
        ["id", orders, "--prefix", "row_", "--id-col-name", "uid", "-o", f"{out}/ids"],
        ["sort", orders, "-c", "o_totalprice", "--desc"],
        ["sort", orders, "-c", "o_orderpriority,o_totalprice", "-s",
         "alphabetic,numeric", "--nulls", "last", "--case-insensitive"],
        ["sort", orders, "-c", "o_orderpriority", "--descending", "true"],
        ["shuffle", customer, "--random", "3", "-o", f"{out}/shuf"],
        ["sample", li, "-n", "50", "--random", "5"],
        ["sample", li, "-n", "20", "--method", "first"],
        ["sample", li, "-n", "20", "--method", "last"],
        ["sample", f"{sf_dir}/documents.parquet", "-n", "30", "--method", "stratified",
         "--stratify-by", "lang", "--id-column", "doc_id"],
        ["split", li, "--ratios", "0.8,0.2", "--id-column", "l_orderkey",
         "-o", f"{out}/sp"],
        ["dedup", f"{sf_dir}/events.parquet", "--row-wise", "-c", "user_id,event_id"],
        ["merge", orders, "--right", customer, "--key", "o_custkey",
         "--key-mapping", "o_custkey=c_custkey", "-o", f"{out}/mrg"],
        ["append", f"{sf_dir}/region.parquet", "--others", f"{sf_dir}/region.parquet",
         "-o", f"{out}/app"],
        ["stats", li, "-c", "l_quantity,l_tax"],
        ["stats", li, "-c", "l_quantity", "--stats-type", "exhaustive"],
        ["frequency", li, "-c", "l_returnflag"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice,l_discount",
         "--method", "spearman"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice",
         "--method", "kendall"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice",
         "--method", "kendall", "--p-values", "--exact"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice",
         "--method", "kendall", "--exact"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice",
         "--method", "spearman", "--exact"],
        ["correlations", li, "-c", "l_quantity,l_extendedprice",
         "--method", "spearman", "--p-values", "--exact"],
        ["quantiles", li, "-c", "l_extendedprice", "--q", "0.25,0.5,0.9"],
        ["quantiles", li, "-c", "l_extendedprice", "--q", "0.25,0.5,0.9",
         "--sketch"],
        ["outliers", li, "-c", "l_extendedprice", "--method", "iqr", "--factor", "1.5"],
        ["binning", orders, "-c", "o_totalprice", "--bins", "4"],
        ["pivot", orders, "--index", "o_orderstatus", "--pivot", "o_orderpriority",
         "--values", "o_totalprice", "--agg", "mean"],
        ["fill", f"{sf_dir}/events.parquet", "-c", "value", "--method", "mean"],
        ["optimize-parquet", orders, "-o", f"{out}/opt", "--compression", "zstd",
         "--compression-level", "3", "--sort-by", "o_totalprice", "--validate"],
        ["encode", corpus_dir, "-o", f"{out}/enc", "--fragment-mode"],
        ["decode", f"{out}/enc", "-o", f"{out}/dec"],
        ["verify", corpus_dir, "--encoded", f"{out}/enc"],
        ["dedup-docs", f"{sf_dir}/documents.parquet", "-o", f"{out}/ddocs"],
        ["dedup-lines", f"{sf_dir}/documents.parquet", "--min-count", "3",
         "-o", f"{out}/dlines"],
        ["dedup-spans", f"{sf_dir}/documents.parquet", "-k", "3",
         "--min-count", "2", "-o", f"{out}/dspans"],
        ["bm25", f"{sf_dir}/documents.parquet", "--terms", "data,return",
         "--top-k", "10", "-o", f"{out}/bm25"],
        ["lm-score", f"{sf_dir}/documents.parquet", "--top-vocab", "200",
         "-o", f"{out}/lmscore"],
        ["weighted-sample", orders, "-n", "50", "--weight-col", "o_totalprice",
         "--id-column", "o_orderkey", "-o", f"{out}/wsample"],
        ["explode-lines", f"{sf_dir}/documents.parquet", "-o", f"{out}/lines"],
        ["filter-domains", f"{sf_dir}/documents.parquet", "--blocked",
         "spam.example", "-o", f"{out}/domfiltered"],
        ["redact", f"{sf_dir}/documents.parquet", "-o", f"{out}/redacted"],
        ["normalize", f"{sf_dir}/documents.parquet", "-o", f"{out}/normed"],
        ["mix", f"{sf_dir}/documents.parquet", "--group-col", "source",
         "--rates", "src0=0.2,src1=0.5", "--id-column", "doc_id",
         "-o", f"{out}/mixed"],
        ["bpe-train", f"{sf_dir}/documents.parquet", "--merges", "3",
         "-o", f"{out}/merges"],
        ["bpe-encode", f"{sf_dir}/documents.parquet",
         "--merges-file", f"{out}/merges", "-o", f"{out}/tokens"],
        ["pack", f"{out}/tokens", "--budget", "2048",
         "--count-col", "n_tokens", "-o", f"{out}/packs_bpe"],
        ["pack", f"{sf_dir}/documents.parquet", "--budget", "2048",
         "-o", f"{out}/packs"],
        ["sample-per-group", orders, "--group-by", "o_custkey", "-n", "2",
         "--id-column", "o_orderkey", "-o", f"{out}/spg"],
        ["standardize", f"{sf_dir}/lineitem.parquet", "-c",
         "l_extendedprice,l_quantity", "--by", "l_returnflag",
         "-o", f"{out}/std"],
        ["tfidf", f"{sf_dir}/documents.parquet", "--top-vocab", "100",
         "-o", f"{out}/tfidf"],
        ["kmeans", f"{sf_dir}/embeddings.parquet", "-k", "4", "--iters", "3",
         "-o", f"{out}/kmeans"],
        ["semdedup", f"{sf_dir}/embeddings.parquet", "-k", "4",
         "--threshold", "0.99", "-o", f"{out}/semdedup"],
        ["quantiles", f"{sf_dir}/lineitem.parquet", "-c", "l_extendedprice",
         "--by", "l_returnflag", "--q", "0.5,0.9", "-o", f"{out}/qby"],
        ["minhash-clusters", f"{sf_dir}/documents.parquet",
         "--threshold", "0.8", "-o", f"{out}/mh_clusters"],
        ["decontam-embeddings", f"{sf_dir}/embeddings.parquet",
         f"{sf_dir}/embeddings.parquet", "--threshold", "0.9999",
         "-o", f"{out}/emb_decontam"],
    ]
    script = textwrap.dedent("""
        import sys, io, contextlib, json
        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        sys.argv = ["nailray"]
        from nailray import cli
        cases = json.load(open(sys.argv0 if False else %(cases_file)r))
        failed = []
        for argv in cases:
            buf = io.StringIO()
            try:
                with contextlib.redirect_stdout(buf):
                    rc = cli.main(argv)
                if rc not in (0, None):
                    failed.append((argv, f"rc={rc}"))
            except SystemExit as e:
                if e.code not in (0, None):
                    failed.append((argv, f"exit={e.code}"))
            except Exception as e:
                failed.append((argv, f"{type(e).__name__}: {e}"))
        ray.shutdown()
        print("FAILED_CASES=" + json.dumps(failed))
    """)
    cases_file = str(tmp_path / "cases.json")
    with open(cases_file, "w") as f:
        json.dump(cases, f)
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "-c", script % {"cases_file": cases_file}],
                       capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("FAILED_CASES=")][-1]
    failed = json.loads(line[len("FAILED_CASES="):])
    assert not failed, failed
