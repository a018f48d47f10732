"""``nailray`` CLI — mirrors the reference's command surface
(/root/reference/src/cli.rs:42-61, src/commands/mod.rs:51-148):

    nailray <cmd> INPUT [-o OUTPUT] [-f FORMAT] [-j JOBS] [--verbose] [--random SEED]

plus the engine's own ``encode`` / ``decode`` / ``verify`` (the
distributed successor of ``nail optimize``). The CLI owns the Ray
session (guarded init; nothing library-side initializes Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(jobs: int | None) -> bool:
    """Returns True iff this call created the Ray session (so main() only
    shuts down a session it owns — callers may embed the CLI)."""
    import ray

    created = False
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=jobs or None,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
        created = True
    from .context import configure

    configure(quiet=True)
    return created


def _read(path: str, with_row_id: bool = False):
    from . import io as nio

    fmt = nio.detect_format(path) if not os.path.isdir(path) else "parquet"
    if fmt == "parquet":
        return nio.read_parquet_with_row_id(path) if with_row_id else nio.read_parquet(path)
    if fmt == "csv":
        return nio.read_csv(path)
    if fmt == "json":
        return nio.read_json(path)
    if fmt == "xlsx":
        return nio.read_xlsx(path)
    raise ValueError(f"unsupported input format {fmt}")


def _output(ds, args, default_rows: int = 5):
    """-o → write file (format from -f or extension, default parquet);
    else console record cards (src/utils/output.rs:15-41)."""
    from . import io as nio
    from .format import format_records

    if getattr(args, "output", None):
        out = args.output
        fmt = args.format or (nio.detect_format(out) if "." in os.path.basename(out) else "parquet")
        if hasattr(ds, "schema") and nio.ROW_ID in ds.schema().names:
            ds = ds.drop_columns([nio.ROW_ID])
        if fmt == "parquet":
            pby = getattr(args, "partition_by", None)
            if pby:
                # Hive-style value-partitioned layout (key=value dirs) —
                # the resumable-output shape: a re-run can skip finished
                # key directories
                ds.write_parquet(
                    out, partition_cols=[c.strip() for c in pby.split(",")
                                         if c.strip()])
            else:
                ds.write_parquet(out)
        elif fmt == "csv":
            ds.write_csv(out)
        elif fmt == "json":
            ds.write_json(out)
        elif fmt == "xlsx":
            nio.write_xlsx(ds, out)
        else:
            raise ValueError(f"unsupported output format {fmt}")
        if args.verbose:
            print(f"wrote {out}", file=sys.stderr)
    else:
        rows = ds.take(default_rows) if hasattr(ds, "take") else ds
        print(format_records(rows))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="nailray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, **kw):
        sp = sub.add_parser(name, **kw)
        sp.add_argument("input")
        sp.add_argument("-o", "--output")
        sp.add_argument("-f", "--format")
        sp.add_argument("-j", "--jobs", type=int)
        sp.add_argument("--verbose", action="store_true")
        sp.add_argument("--random", type=int, default=None)
        sp.add_argument("--partition-by", default=None,
                        help="parquet output only: comma-separated columns for "
                             "a Hive-style key=value partitioned layout")
        return sp

    add("convert", help="read any format, write any format")
    sp = add("head"); sp.add_argument("-n", type=int, default=5)
    sp = add("tail"); sp.add_argument("-n", type=int, default=5)
    add("count")
    sp = add("headers"); sp.add_argument("--filter")
    add("schema")
    sp = add("metadata")
    add("size")
    sp = add("preview"); sp.add_argument("-n", type=int, default=5)
    sp = add("select"); sp.add_argument("-c", "--columns"); sp.add_argument("-r", "--rows")
    sp = add("drop"); sp.add_argument("-c", "--columns"); sp.add_argument("-r", "--rows")
    sp = add("filter"); sp.add_argument("-c", "--conditions"); sp.add_argument("--rows-mode", choices=["no-nan", "numeric-only", "char-only", "no-zeros"])
    sp = add("search"); sp.add_argument("--value", required=True); sp.add_argument("--columns"); sp.add_argument("--ignore-case", action="store_true"); sp.add_argument("--exact", action="store_true"); sp.add_argument("--rows", action="store_true")
    sp = add("rename"); sp.add_argument("-c", "--columns", required=True)
    sp = add("create"); sp.add_argument("-c", "--columns", required=True); sp.add_argument("-r", "--row-filter")
    sp = add("id"); sp.add_argument("--prefix", default=""); sp.add_argument("--id-col-name", default="id")
    sp = add("sort"); sp.add_argument("-c", "--columns", required=True); sp.add_argument("--desc", action="store_true"); sp.add_argument("--descending", help="per-column true/false comma list (reference -d)"); sp.add_argument("-s", "--strategy", help="per-column comma list: auto,numeric,alphabetic,date,hour,alphabetic-numeric,numeric-alphabetic"); sp.add_argument("--nulls", default="last", choices=["first", "last", "skip"]); sp.add_argument("--date-format"); sp.add_argument("--hour-format"); sp.add_argument("--case-insensitive", action="store_true")
    add("shuffle")
    sp = add("sample"); sp.add_argument("-n", type=int, default=100); sp.add_argument("--method", default="random", choices=["random", "first", "last", "stratified"]); sp.add_argument("--stratify-by"); sp.add_argument("--id-column")
    sp = add("split"); sp.add_argument("--ratios", default="0.8,0.2"); sp.add_argument("--id-column", required=False); sp.add_argument("--prefix", default="split")
    sp = add("dedup"); sp.add_argument("-c", "--columns"); sp.add_argument("--row-wise", action="store_true"); sp.add_argument("--col-wise", action="store_true"); sp.add_argument("--keep", default="first", choices=["first", "last"])
    sp = add("merge"); sp.add_argument("--right", required=True); sp.add_argument("--key", required=True); sp.add_argument("--key-mapping"); sp.add_argument("--how", default="inner", choices=["inner", "left", "right"])
    sp = add("append"); sp.add_argument("--others", required=True); sp.add_argument("--ignore-schema", action="store_true")
    sp = add("stats"); sp.add_argument("-c", "--columns"); sp.add_argument("--stats-type", default="basic", choices=["basic", "exhaustive"])
    sp = add("frequency"); sp.add_argument("-c", "--columns", required=True); sp.add_argument("--limit", type=int)
    sp = add("correlations"); sp.add_argument("-c", "--columns"); sp.add_argument("--method", default="pearson", choices=["pearson", "spearman", "kendall"]); sp.add_argument("--p-values", action="store_true", help="per-pair t-test and Fisher-z p-values (pearson only)"); sp.add_argument("--exact", action="store_true", help="spearman/kendall: exact distributed estimators (exact global ranks / tau-b over ALL complete pairs) instead of the seeded sample, in both matrix and --p-values modes")
    sp = add("quantiles", help="per-column quantiles (exact multi-pass, or --sketch t-digest one-pass)")
    sp.add_argument("-c", "--column", required=True)
    sp.add_argument("--q", default="0.1,0.25,0.5,0.75,0.9,0.99")
    sp.add_argument("--sketch", action="store_true")
    sp.add_argument("--delta", type=int, default=200)
    sp.add_argument("--by", default=None,
                    help="group column: exact per-group quantiles "
                         "(one row per group x q)")
    sp = add("outliers"); sp.add_argument("-c", "--columns", required=True); sp.add_argument("--method", default="zscore", choices=["zscore", "iqr", "modified-zscore", "isolation"]); sp.add_argument("--factor", type=float, default=3.0); sp.add_argument("--remove", action="store_true")
    sp = add("binning"); sp.add_argument("-c", "--column", required=True); sp.add_argument("--bins", type=int, default=10); sp.add_argument("--method", default="equal-width", choices=["equal-width", "equal-frequency"]); sp.add_argument("--drop-original", action="store_true")
    sp = add("pivot"); sp.add_argument("--index", required=True); sp.add_argument("--pivot", required=True); sp.add_argument("--values", required=True); sp.add_argument("--agg", default="sum", choices=["sum", "mean", "count", "min", "max"])
    sp = add("fill"); sp.add_argument("-c", "--columns", required=True); sp.add_argument("--method", default="value", choices=["value", "mean", "median", "mode", "forward", "backward"]); sp.add_argument("--value")
    sp = add("optimize", help="distributed per-column encode (the engine core; successor of nail optimize)")
    sp.add_argument("--partition-bytes", type=int, default=None)
    sp = add("optimize-parquet", help="rewrite as standard parquet (reference nail optimize: compression/sort/dictionary)")
    sp.add_argument("--compression", default="snappy", choices=["snappy", "gzip", "zstd", "brotli"])
    sp.add_argument("--compression-level", type=int, default=6)
    sp.add_argument("--sort-by")
    sp.add_argument("--row-group-size", type=int, default=1000000)
    sp.add_argument("--dictionary", action="store_true")
    sp.add_argument("--no-dictionary", action="store_true")
    sp.add_argument("--validate", action="store_true")
    sp = add("encode", help="alias of optimize")
    sp.add_argument("--partition-bytes", type=int, default=None)
    sp.add_argument("--fragment-mode", action="store_true")
    sp = add("decode", help="decode an encoded directory back to parquet rows")
    sp = add("verify", help="sha256 bit-identity between source and encoded dir")
    sp.add_argument("--encoded", required=True)
    sp.add_argument("--partitions", action="store_true",
                    help="partition-level verify against manifest digests (no input read)")
    # training-data operators (beyond the reference surface)
    sp = add("dedup-docs", help="exact document dedup (min-id winner per distinct text)")
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp = add("dedup-lines", help="strip lines occurring >= min-count times corpus-wide (C4/CCNet)")
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--min-count", type=int, default=3)
    sp = add("dedup-spans", help="strip duplicated word k-gram spans (substring dedup)")
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("-k", type=int, default=8); sp.add_argument("--min-count", type=int, default=2)
    sp = add("bm25", help="BM25 relevance of documents to fixed query terms")
    sp.add_argument("--terms", required=True, help="comma-separated query terms")
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--top-k", type=int, default=None)
    sp = add("lm-score", help="unigram-LM log-probability quality score per doc")
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--top-vocab", type=int, default=1000)
    sp = add("redact", help="replace PII spans (email/ipv4/ssn/phone) with markers")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--kinds", default="email,ipv4,ssn")
    sp.add_argument("--no-counts", action="store_true")
    sp = add("normalize", help="canonicalize text: NFC + lower + collapse whitespace")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--form", default="NFC", choices=["NFC", "NFKC", "NFD", "NFKD"])
    sp.add_argument("--keep-case", action="store_true")
    sp = add("mix", help="per-group deterministic downsample (domain mixing)")
    sp.add_argument("--group-col", required=True)
    sp.add_argument("--rates", required=True,
                    help="comma-separated group=rate pairs, e.g. web=0.2,books=1.0")
    sp.add_argument("--id-column", required=True)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--default-rate", type=float, default=1.0)
    sp = add("explode-lines", help="one output row per document line")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp = add("filter-domains", help="drop docs whose first URL domain is blocklisted")
    sp.add_argument("--blocked", required=True, help="comma-separated domains")
    sp.add_argument("--text-col", default="text")
    sp = add("weighted-sample", help="A-ES weighted sample without replacement")
    sp.add_argument("-n", type=int, required=True)
    sp.add_argument("--weight-col", required=True)
    sp.add_argument("--id-column", required=True)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--group-by", default=None,
                    help="comma-separated keys: sample n per group instead")
    sp = add("bpe-train", help="train a BPE merge table over the corpus")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--merges", type=int, default=50)
    sp.add_argument("--min-count", type=int, default=2)
    sp = add("bpe-encode", help="tokenize the corpus with a trained merge "
             "table (parquet of left/right rows from bpe-train -o)")
    sp.add_argument("--merges-file", required=True)
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--unk-id", type=int, default=-1)
    sp = add("pack", help="assign documents to fixed token-budget packs")
    sp.add_argument("--budget", type=int, required=True)
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--count-col", default=None,
                    help="precomputed token-count column (e.g. bpe-encode's "
                    "n_tokens) instead of whitespace counts")
    sp = add("sample-per-group", help="cap each group at n rows (deterministic hash order)")
    sp.add_argument("--group-by", required=True); sp.add_argument("-n", type=int, required=True)
    sp.add_argument("--id-column", required=True); sp.add_argument("--seed", type=int, default=42)
    sp = add("ngrams", help="top-k word n-grams with counts")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("-n", type=int, default=2)
    sp.add_argument("-k", type=int, default=100)
    sp = add("distinct-by", help="exact COUNT(DISTINCT col) per group")
    sp.add_argument("--group-by", required=True)
    sp.add_argument("-c", "--column", required=True)
    sp.add_argument("--approx", action="store_true",
                    help="grouped HyperLogLog estimate (bounded state per key)")
    sp.add_argument("-p", type=int, default=12,
                    help="HLL precision: 2^p registers per key")
    sp = add("standardize", help="per-group (or global) z-score / min-max feature scaling")
    sp.add_argument("-c", "--columns", required=True)
    sp.add_argument("--by", default=None, help="comma-separated group keys")
    sp.add_argument("--method", default="zscore", choices=["zscore", "minmax"])
    sp = add("tfidf", help="sparse TF-IDF rows over the corpus's top-V vocabulary")
    sp.add_argument("--text-col", default="text"); sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--top-vocab", type=int, default=1000)
    sp = add("kmeans", help="distributed full-data k-means over an embedding column")
    sp.add_argument("--embedding-col", default="embedding")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("-k", type=int, default=16)
    sp.add_argument("--iters", type=int, default=10)
    sp.add_argument("--euclidean", action="store_true",
                    help="plain Euclidean instead of spherical (cosine)")
    sp = add("semdedup", help="SemDeDup: cluster embeddings, keep one doc per cosine-epsilon ball")
    sp.add_argument("--embedding-col", default="embedding")
    sp.add_argument("--id-col", default="vec_id")
    sp.add_argument("-k", type=int, default=16)
    sp.add_argument("--iters", type=int, default=5)
    sp.add_argument("--threshold", type=float, default=0.95)
    sp = add("minhash-clusters", help="near-dup cluster labeling: every doc "
             "+ its duplicate-cluster id (singletons label themselves)")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--threshold", type=float, default=0.8)
    sp.add_argument("--num-perm", type=int, default=64)
    sp.add_argument("--bands", type=int, default=16)
    sp = add("decontam-embeddings", help="semantic decontamination: drop rows "
             "whose embedding max-cosine vs a benchmark parquet >= threshold")
    sp.add_argument("benchmark", help="parquet of benchmark embeddings")
    sp.add_argument("--embedding-col", default="embedding")
    sp.add_argument("--threshold", type=float, default=0.95)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    owns_ray = _init_ray(args.jobs)
    from . import io as nio
    from .ops import (aggregates, combine, dedup as ddp, filtering, projection,
                      sampling, sorting)

    cmd = args.cmd
    needs_row_id = cmd in ("tail", "id") or (cmd in ("select", "drop") and getattr(args, "rows", None)) \
        or (cmd == "search" and getattr(args, "rows", False)) \
        or (cmd == "dedup" and getattr(args, "row_wise", False)) \
        or (cmd == "sample" and getattr(args, "method", None) == "last")
    is_parquet = cmd not in ("verify", "decode") and (
        os.path.isdir(args.input) or nio.detect_format(args.input) == "parquet")
    needs_row_id = needs_row_id and is_parquet
    ds = None
    if cmd not in ("verify", "decode"):
        ds = _read(args.input, with_row_id=needs_row_id)

    if cmd == "convert":
        _output(ds, args)
    elif cmd == "head":
        _output(projection.head(ds, args.n), args, args.n)
    elif cmd == "tail":
        if is_parquet:  # footer fast path (src/commands/tail.rs:28-78)
            total = nio.parquet_num_rows(args.input)
            _output(projection.tail(ds, total, args.n), args, args.n)
        else:  # CSV/JSON fallback: streaming sliding-window tail (bounded)
            import ray.data as _rd

            _output(_rd.from_arrow(nio.tail_any(ds, args.n)), args, args.n)
    elif cmd == "count":
        print(ds.count())
    elif cmd == "headers":
        print("\n".join(projection.headers(ds, args.filter)))
    elif cmd == "schema":
        print(json.dumps(projection.schema_info(ds), indent=2))
    elif cmd == "metadata":
        print(json.dumps(aggregates.parquet_metadata(args.input), indent=2, default=str))
    elif cmd == "size":
        print(json.dumps(aggregates.size_report(ds), indent=2))
    elif cmd == "preview":
        from .format import format_records

        print(format_records(sampling.preview(ds, args.n, seed=args.random or 42)))
    elif cmd == "select":
        if args.columns:
            ds = projection.select_columns(ds, args.columns)
        if args.rows:
            ds = projection.select_rows(ds, args.rows)
        _output(ds, args)
    elif cmd == "drop":
        if args.columns:
            ds = projection.drop_columns(ds, args.columns)
        if args.rows:
            spec = args.rows
            if any(op in spec for op in ("=", ">", "<")):
                ds = projection.drop_rows_by_conditions(ds, spec)
            else:
                ds = projection.drop_rows(ds, spec)
        _output(ds, args)
    elif cmd == "filter":
        if args.conditions:
            ds = filtering.filter_conditions(ds, args.conditions)
        if args.rows_mode:
            ds = filtering.filter_rows(ds, args.rows_mode)
        _output(ds, args)
    elif cmd == "search":
        cols = args.columns.split(",") if args.columns else None
        out = filtering.search_rows(ds, args.value, columns=cols,
                                    ignore_case=args.ignore_case, exact=args.exact) \
            if args.rows else filtering.search(ds, args.value, columns=cols,
                                               ignore_case=args.ignore_case, exact=args.exact)
        _output(out, args)
    elif cmd == "rename":
        _output(projection.rename_columns(ds, args.columns), args)
    elif cmd == "create":
        _output(projection.create_column(ds, args.columns, args.row_filter), args)
    elif cmd == "id":
        _output(projection.add_id_column(ds, args.prefix, args.id_col_name), args)
    elif cmd == "sort":
        if args.descending:
            desc = [v.strip().lower() in ("true", "1", "yes")
                    for v in args.descending.split(",")]
        else:
            desc = args.desc
        strategies = ([s.strip() for s in args.strategy.split(",")]
                      if args.strategy else None)
        _output(sorting.sort(ds, args.columns, descending=desc,
                             strategies=strategies, nulls=args.nulls,
                             case_insensitive=args.case_insensitive,
                             date_format=args.date_format,
                             hour_format=args.hour_format), args)
    elif cmd == "shuffle":
        _output(sorting.shuffle(ds, seed=args.random), args)
    elif cmd == "sample":
        if args.method == "first":
            out = sampling.sample_first(ds, args.n)
        elif args.method == "last":
            # last-N by file order (reference sample.rs:58-62 limit window)
            if is_parquet:
                total = nio.parquet_num_rows(args.input)
                out = projection.tail(ds, total, args.n)
            else:
                import ray.data as _rd

                out = _rd.from_arrow(nio.tail_any(ds, args.n))
        elif args.method == "stratified":
            out = sampling.sample_stratified(ds, args.stratify_by, args.n,
                                             args.id_column, seed=args.random or 42)
        else:
            out = sampling.sample_random(ds, args.n, seed=args.random or 42)
        _output(out, args)
    elif cmd == "split":
        ratios = [float(x) for x in args.ratios.split(",")]
        if args.id_column:
            parts = sampling.split_hash(ds, ratios, args.id_column, seed=args.random or 42)
        else:
            parts = sampling.split_proportionately(ds, ratios)
        base = args.output or args.prefix
        for i, part in enumerate(parts):
            part.write_parquet(f"{base}_{i}")
            if args.verbose:
                print(f"wrote {base}_{i}", file=sys.stderr)
    elif cmd == "dedup":
        if args.col_wise:
            out = ddp.dedup_columns(ds, keep=args.keep)
        else:
            cols = args.columns.split(",") if args.columns else None
            out = ddp.dedup_rows(ds, cols, keep=args.keep)
        _output(out, args)
    elif cmd == "merge":
        right = _read(args.right)
        lk = args.key
        rk = None
        if args.key_mapping:
            lk, rk = args.key_mapping.split("=", 1)
        _output(combine.merge(ds, right, lk, rk, how=args.how), args)
    elif cmd == "append":
        others = [_read(p) for p in args.others.split(",")]
        _output(combine.append(ds, others, ignore_schema=args.ignore_schema), args)
    elif cmd == "stats":
        cols = args.columns.split(",") if args.columns else None
        print(aggregates.stats(ds, cols, kind=args.stats_type).to_string(index=False))
    elif cmd == "frequency":
        print(aggregates.frequency(ds, args.columns.split(","), args.limit).to_string(index=False))
    elif cmd == "correlations":
        cols = args.columns.split(",") if args.columns else None
        if args.exact and args.method == "pearson":
            raise SystemExit("--exact applies to spearman/kendall "
                             "(pearson is already exact)")
        if args.method == "pearson" and args.p_values:
            for (a, b), r in aggregates.pearson_with_p_all(ds, cols).items():
                print(a, b, round(r["r"], 6), "p_t", round(r["p_value"], 6),
                      "p_fisher", round(r["fisher_p"], 6))
        elif args.method == "pearson":
            print(aggregates.pearson_matrix(ds, cols).to_string())
        elif args.p_values:
            if args.exact:
                import functools

                fn = functools.partial(
                    aggregates.spearman_with_p if args.method == "spearman"
                    else aggregates.kendall_with_p, method="exact")
            else:
                fn = (aggregates.spearman_with_p if args.method == "spearman"
                      else aggregates.kendall_with_p)
            c = cols or aggregates._numeric_cols(aggregates._schema(ds))
            for i, a in enumerate(c):
                for b in c[i + 1:]:
                    r = fn(ds, a, b)
                    stat = r.get("rho", r.get("tau"))
                    print(a, b, round(stat, 6), "p", round(r["p_value"], 6))
        else:
            # full matrix for every method (reference parity:
            # src/utils/stats.rs:344-475 — symmetric matrix output);
            # --exact swaps the sampled estimators for the exact
            # distributed ones
            if args.exact:
                fn = (aggregates.spearman_matrix_exact
                      if args.method == "spearman"
                      else aggregates.kendall_matrix_exact)
            else:
                fn = (aggregates.spearman_matrix
                      if args.method == "spearman"
                      else aggregates.kendall_matrix)
            print(fn(ds, cols).to_string())
    elif cmd == "quantiles":
        qs = [float(x) for x in args.q.split(",") if x]
        if any(not 0.0 <= q <= 1.0 for q in qs):
            raise SystemExit(f"quantiles must be in [0, 1]: {qs}")
        if args.by and args.sketch:
            from .sketch import approx_quantiles_tdigest_by

            _output(approx_quantiles_tdigest_by(ds, args.column, args.by,
                                                qs, delta=args.delta), args)
        elif args.by:
            from .ops.quantile import quantiles_by

            _output(quantiles_by(ds, args.column, args.by, qs=qs), args)
        elif args.sketch:
            from .sketch import approx_quantiles_tdigest

            got = approx_quantiles_tdigest(ds, args.column, qs,
                                           delta=args.delta)
            for q in qs:
                print(q, round(got[q], 6))
        else:
            from .ops.quantile import exact_quantiles

            print(exact_quantiles(ds, args.column, qs).to_string(index=False))
    elif cmd == "outliers":
        out = aggregates.outliers(ds, args.columns.split(","), method=args.method,
                                  factor=args.factor,
                                  action="remove" if args.remove else "flag")
        _output(out, args)
    elif cmd == "binning":
        _output(aggregates.binning(ds, args.column, bins=args.bins, method=args.method,
                                   drop_original=args.drop_original), args)
    elif cmd == "pivot":
        _output(aggregates.pivot(ds, args.index.split(","), args.pivot.split(","),
                                 args.values.split(","), agg=args.agg), args)
    elif cmd == "fill":
        cols = args.columns.split(",")
        if args.method == "value":
            from .expr import infer_literal

            out = aggregates.fill_value(ds, cols, infer_literal(args.value))
        elif args.method in ("mean", "median", "mode"):
            out = aggregates.fill_stat(ds, cols, args.method)
        else:
            ds = _read(args.input, with_row_id=True)
            out = aggregates.fill_directional(ds, cols, args.method)
        _output(out, args)
    elif cmd == "optimize-parquet":
        if args.dictionary and args.no_dictionary:
            raise SystemExit("--dictionary and --no-dictionary are mutually exclusive")
        out_dir = args.output or (args.input.rstrip("/") + ".optimized")
        nio.optimize_parquet(
            ds, out_dir, compression=args.compression,
            compression_level=args.compression_level, sort_by=args.sort_by,
            use_dictionary=not args.no_dictionary,
            row_group_size=args.row_group_size)
        if args.validate:  # row-count check only (optimize.rs:218-233)
            n_out = nio.read_parquet(out_dir).count()
            n_in = _read(args.input).count()
            print(json.dumps({"out": out_dir, "rows_in": n_in, "rows_out": n_out,
                              "validated": n_in == n_out}))
            if n_in != n_out:
                if owns_ray:
                    import ray

                    ray.shutdown()
                return 1
        else:
            print(json.dumps({"out": out_dir}))
    elif cmd in ("optimize", "encode"):
        from .encode import pipeline as epl

        out_dir = args.output or (args.input.rstrip("/") + ".encoded")
        if getattr(args, "fragment_mode", False):
            summary = epl.encode_fragments(args.input, out_dir)
        else:
            summary = epl.encode_dataset(args.input, out_dir,
                                         target_partition_bytes=args.partition_bytes)
        print(json.dumps(summary, indent=2, default=str))
    elif cmd == "decode":
        from .encode import pipeline as epl

        out_dir = args.output or (args.input.rstrip("/") + ".decoded")
        epl.decode_dataset(args.input).write_parquet(out_dir)
        print(f"decoded to {out_dir}")
    elif cmd == "dedup-docs":
        from .textops import dedup as tdedup

        _output(tdedup.exact_dedup(ds, args.text_col, args.id_col), args)
    elif cmd == "dedup-lines":
        from .textops import dedup as tdedup

        _output(tdedup.dedup_lines(ds, text_col=args.text_col,
                                   id_col=args.id_col,
                                   min_count=args.min_count), args)
    elif cmd == "dedup-spans":
        from .textops import dedup as tdedup

        _output(tdedup.dedup_spans(ds, k=args.k, min_count=args.min_count,
                                   text_col=args.text_col,
                                   id_col=args.id_col), args)
    elif cmd == "bm25":
        from .textops.analysis import bm25_scores

        terms = [t for t in args.terms.split(",") if t]
        _output(bm25_scores(ds, terms, text_col=args.text_col,
                            id_col=args.id_col, k=args.top_k), args)
    elif cmd == "lm-score":
        from .textops.analysis import unigram_logprob

        _output(unigram_logprob(ds, text_col=args.text_col,
                                id_col=args.id_col,
                                top_vocab=args.top_vocab), args)
    elif cmd == "redact":
        from .textops.clean import redact_pii

        kinds = tuple(k for k in args.kinds.split(",") if k)
        _output(redact_pii(ds, text_col=args.text_col, kinds=kinds,
                           count=not args.no_counts), args)
    elif cmd == "normalize":
        from .textops.clean import normalize_text

        _output(normalize_text(ds, text_col=args.text_col, form=args.form,
                               lower=not args.keep_case), args)
    elif cmd == "mix":
        rates = {}
        for pair in args.rates.split(","):
            k, _, v = pair.partition("=")
            if k:
                rates[k] = float(v)
        _output(sampling.mix_sources(ds, args.group_col, rates,
                                     args.id_column, seed=args.seed,
                                     default_rate=args.default_rate), args)
    elif cmd == "explode-lines":
        from .textops.clean import explode_lines

        _output(explode_lines(ds, text_col=args.text_col,
                              id_col=args.id_col), args)
    elif cmd == "filter-domains":
        from .textops.clean import filter_domains

        blocked = {d for d in args.blocked.split(",") if d}
        _output(filter_domains(ds, blocked, text_col=args.text_col), args)
    elif cmd == "weighted-sample":
        if args.group_by:
            keys = [k for k in args.group_by.split(",") if k]
            _output(sampling.weighted_sample_per_group(
                ds, keys, args.n, args.weight_col, args.id_column,
                seed=args.seed), args)
        else:
            _output(sampling.weighted_sample(ds, args.n, args.weight_col,
                                             args.id_column, seed=args.seed), args)
    elif cmd == "bpe-train":
        import pyarrow as pa
        import ray.data as rd

        from .textops.bpe import bpe_train

        merges = bpe_train(ds, text_col=args.text_col, n_merges=args.merges,
                           min_count=args.min_count)
        if args.output:
            t = pa.table({
                "merge_idx": pa.array(range(len(merges)), pa.int64()),
                "left": pa.array([m[0] for m in merges], pa.string()),
                "right": pa.array([m[1] for m in merges], pa.string()),
                "cnt": pa.array([m[2] for m in merges], pa.int64()),
            })
            _output(rd.from_arrow(t), args)
        else:
            for i, (a, b, cnt) in enumerate(merges):
                print(i, a, b, cnt)
    elif cmd == "bpe-encode":
        import pyarrow.parquet as _pq

        from .textops.bpe import bpe_encode

        mt = _pq.read_table(args.merges_file)
        if "merge_idx" in mt.column_names:  # merge ORDER is semantic
            mt = mt.sort_by("merge_idx")
        merges = list(zip(mt.column("left").to_pylist(),
                          mt.column("right").to_pylist()))
        _output(bpe_encode(ds, merges, text_col=args.text_col,
                           unk_id=args.unk_id), args)
    elif cmd == "pack":
        from .textops.packing import pack_sequences

        _output(pack_sequences(ds, args.budget, args.id_col,
                               text_col=None if args.count_col else args.text_col,
                               count_col=args.count_col), args)
    elif cmd == "sample-per-group":
        keys = [k for k in args.group_by.split(",") if k]
        _output(sampling.sample_per_group(ds, keys, args.n, args.id_column,
                                          seed=args.seed), args)
    elif cmd == "ngrams":
        from .textops.analysis import ngram_topk

        _output(ngram_topk(ds, args.text_col, n=args.n, k=args.k), args)
    elif cmd == "distinct-by":
        if args.approx:
            from .sketch import approx_distinct_by

            _output(approx_distinct_by(ds, args.group_by, args.column,
                                       p=args.p), args)
        else:
            _output(aggregates.distinct_count_by(ds, args.group_by,
                                                 args.column), args)
    elif cmd == "standardize":
        _output(aggregates.standardize(ds, args.columns, by=args.by,
                                       method=args.method), args)
    elif cmd == "tfidf":
        from .textops.analysis import tfidf_scores

        _output(tfidf_scores(ds, args.text_col, args.id_col,
                             top_vocab=args.top_vocab), args)
    elif cmd == "kmeans":
        from .cluster import kmeans_embeddings

        asg, _cent, _ = kmeans_embeddings(
            ds, k=args.k, n_iter=args.iters,
            embedding_col=args.embedding_col, id_col=args.id_col,
            normalize=not args.euclidean)
        _output(asg, args)
    elif cmd == "semdedup":
        from .cluster import semantic_dedup

        _output(semantic_dedup(ds, k=args.k, threshold=args.threshold,
                               n_iter=args.iters,
                               embedding_col=args.embedding_col,
                               id_col=args.id_col), args)
    elif cmd == "minhash-clusters":
        from .textops import dedup as tdedup

        _output(tdedup.minhash_clusters(ds, args.text_col, args.id_col,
                                        threshold=args.threshold,
                                        num_perm=args.num_perm,
                                        bands=args.bands), args)
    elif cmd == "decontam-embeddings":
        import numpy as np
        import pyarrow.parquet as _pq

        from .ann import _batch_matrix
        from .textops.decontam import decontaminate_embeddings

        bt = _pq.read_table(args.benchmark, columns=[args.embedding_col])
        bench = _batch_matrix(bt, args.embedding_col)
        _output(decontaminate_embeddings(ds, bench,
                                         embedding_col=args.embedding_col,
                                         threshold=args.threshold), args)
    elif cmd == "verify":
        from .encode import pipeline as epl

        if args.partitions:
            res = epl.verify_partitions(args.encoded)
            res["match"] = not res["failed"]
        else:
            res = epl.verify_bit_identity(args.input, args.encoded)
        print(json.dumps(res, indent=2))
        if owns_ray:
            import ray

            ray.shutdown()
        return 0 if res["match"] else 1
    if owns_ray:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
