"""Sources / sinks, and the ``row_id`` ingest.

Reference parity (/root/reference/src/utils/io.rs:14-34, 167-214): read
parquet/CSV/NDJSON(/XLSX) into one logical table, write any of them
back. Ray shape: ``ray.data.read_parquet`` / ``read_csv`` / ``read_json``
→ ``Dataset``; writes via ``ds.write_*``.

Row identity: the reference's row numbers are 1-based physical file
order materialized via ``ROW_NUMBER() OVER ()``
(src/commands/select.rs:190). Ray Data blocks carry no implicit global
order, so operators that need file order (head/tail/row-spec select,
dedup keep-first/last, id, deterministic sampling) read through
:func:`read_parquet_with_row_id`, which assigns ``row_id`` from parquet
row-group offsets — fully parallel (one task per row group), no
driver-side scan, stable across runs.
"""

from __future__ import annotations

import os
from typing import Iterable

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

ROW_ID = "row_id"


def _expand_paths(paths: str | Iterable[str], suffix: str = ".parquet") -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(sorted(os.path.join(p, f) for f in os.listdir(p) if f.endswith(suffix)))
        else:
            out.append(p)
    return out


def _stripped_schema(path: str, columns: list[str] | None) -> pa.Schema | None:
    """Footer schema with key-value metadata removed, pruned to
    ``columns``. pyarrow 16's ``hash(Schema)`` raises on pandas-written
    files (the ``pandas`` metadata dict), which makes every Ray Data
    schema-dedup/unify step log ``Failed to hash the schemas`` across
    shuffles; stripping at the read silences it for the whole plan."""
    try:
        sch = pq.read_schema(path)
    except Exception:
        return None
    if sch.metadata is None and all(f.metadata is None for f in sch):
        return None  # already clean — let Ray infer as usual
    if columns and any(sch.get_field_index(c) < 0 for c in columns):
        return None  # let Ray surface its own missing-column error
    fields = [sch.field(c) for c in columns] if columns else list(sch)
    return pa.schema([f.remove_metadata() for f in fields])


def read_parquet(paths: str | Iterable[str], columns: list[str] | None = None, **kw) -> rd.Dataset:
    """Plain parquet scan with column pruning (no row ids).

    Multi-file reads pin the FIRST file's (metadata-stripped) footer
    schema — a directory is one logical table here, as in the reference
    (io.rs:14-34); pass ``schema=None`` explicitly for schema-evolved
    inputs that need Ray's unification."""
    paths = _expand_paths(paths)
    if "schema" not in kw and paths:
        sch = _stripped_schema(paths[0], columns)
        if sch is not None:
            kw["schema"] = sch
    elif kw.get("schema") is None:
        kw.pop("schema", None)
    return rd.read_parquet(paths, columns=columns, **kw)


def read_csv(paths: str | Iterable[str], **kw) -> rd.Dataset:
    return rd.read_csv(paths, **kw)


def read_json(paths: str | Iterable[str], **kw) -> rd.Dataset:
    return rd.read_json(paths, **kw)


def parquet_num_rows(paths: str | Iterable[str]) -> int:
    """Footer-metadata row count — no data scan.

    Parity: the reference's parquet fast path
    (src/utils/parquet_utils.rs:5-25) sums row-group ``num_rows`` from
    the footer; identical here.
    """
    return sum(pq.ParquetFile(p).metadata.num_rows for p in _expand_paths(paths))


def _row_group_tasks(paths: list[str], columns: list[str] | None) -> list[dict]:
    """(file, row-group, global row offset) work list from footers only."""
    tasks = []
    offset = 0
    for path in paths:
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            tasks.append({"file": path, "rg": rg, "offset": offset, "n": n})
            offset += n
    return tasks


class _RowGroupReader:
    """Reads one parquet row group and attaches the global ``row_id``.

    Used as an actor-pool ``map_batches`` stage over the task list so the
    (cheap) setup is amortized and file handles can be reused.
    """

    def __init__(self, columns: list[str] | None):
        self.columns = columns
        self._open: dict[str, pq.ParquetFile] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for task in batch.to_pylist():
            f = self._open.get(task["file"])
            if f is None:
                f = self._open[task["file"]] = pq.ParquetFile(task["file"])
            t = f.read_row_group(task["rg"], columns=self.columns)
            t = t.replace_schema_metadata(None)  # see _stripped_schema
            rid = pa.array(range(task["offset"] + 1, task["offset"] + 1 + t.num_rows), pa.int64())
            outs.append(t.append_column(ROW_ID, rid))
        return pa.concat_tables(outs, promote_options="default")


def read_parquet_with_row_id(
    paths: str | Iterable[str],
    columns: list[str] | None = None,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Parquet scan that carries a 1-based file-order ``row_id`` column.

    One Ray task per row group; offsets come from footers (driver reads
    metadata only). At 100 TB scale the task list is one small row per
    row group — the data itself never touches the driver.
    """
    paths = _expand_paths(paths)
    tasks = _row_group_tasks(paths, columns)
    # repartition: one block per row-group task (a single from_arrow block
    # would make the whole read run inside one Ray task)
    task_ds = rd.from_arrow(pa.Table.from_pylist(tasks)).repartition(len(tasks))
    # ~1 row group per batch keeps output blocks row-group sized.
    from .shuffle import actor_pool_size

    return task_ds.map_batches(
        _RowGroupReader,
        fn_constructor_args=(columns,),
        batch_size=1,
        batch_format="pyarrow",
        concurrency=actor_pool_size((1, concurrency) if isinstance(concurrency, int)
                                    else concurrency),
    )


def to_arrow(ds: rd.Dataset) -> pa.Table:
    """Stream a (small-result) dataset into one pyarrow Table on the driver.

    For test/driver-side comparisons only — never call on the 100 TB input.
    """
    tables = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not tables:
        return pa.table({})
    tables = [t if isinstance(t, pa.Table) else pa.Table.from_batches([t]) for t in tables]
    return pa.concat_tables(tables, promote_options="default")


def is_plain_file_read(ds: rd.Dataset) -> bool:
    """True when ``ds``'s logical plan is a bare file read (no derived
    transforms). Two-pass operators use this to pick the scale-safe
    default: a plain read is simply re-read from storage for the second
    pass (no object-store pinning), while a derived pipeline is
    materialized once so upstream stages don't re-execute. Inspects
    Ray's logical plan DAG; returns False (→ materialize, always
    correct) when the internals shift."""
    try:
        from ray.data._internal.logical.operators.read_operator import Read

        dag = ds._logical_plan.dag
        return isinstance(dag, Read) and not dag.input_dependencies
    except Exception:
        return False


def resolve_cache_input(ds: rd.Dataset, cache_input) -> bool:
    """Scale-safe default for two-pass operators (dedup_lines,
    dedup_spans, bm25_scores, unigram_logprob): ``"auto"`` re-reads a
    plain file-backed input from storage (nothing pinned in the object
    store — the 100 TB default) and materializes only DERIVED inputs,
    whose upstream pipeline would otherwise re-execute per pass. Lives
    here beside :func:`is_plain_file_read` (its only dependency) so
    operator modules don't import policy from each other."""
    if cache_input == "auto":
        return not is_plain_file_read(ds)
    return bool(cache_input)


def write_parquet(ds: rd.Dataset, path: str, **kw) -> None:
    """Directory-of-part-files parquet sink (resumable layout).

    Empty-input parity (src/utils/io.rs:340-383): Ray writes a valid
    empty part file for an empty dataset.
    """
    ds.write_parquet(path, **kw)


def write_csv(ds: rd.Dataset, path: str, **kw) -> None:
    ds.write_csv(path, **kw)


def write_json(ds: rd.Dataset, path: str, **kw) -> None:
    ds.write_json(path, **kw)


def read_xlsx(path: str) -> rd.Dataset:
    """XLSX ingest (reference: src/utils/io.rs:36-165 — first worksheet,
    headers from row 0, per-column type vote over ≤100 sample rows).

    XLSX is inherently driver-sized (one in-memory workbook). Uses
    openpyxl when available; otherwise the bundled pure-stdlib
    SpreadsheetML subset (:mod:`nailray.xlsx_lite`)."""
    try:
        import openpyxl

        wb = openpyxl.load_workbook(path, read_only=True)
        ws = wb.worksheets[0]
        rows = list(ws.iter_rows(values_only=True))
    except ImportError:
        from . import xlsx_lite

        rows = xlsx_lite.read_rows(path)
    if not rows:
        return rd.from_arrow(pa.table({}))
    headers = [str(h) for h in rows[0]]
    cols: dict[str, list] = {h: [] for h in headers}
    for r in rows[1:]:
        for h, v in zip(headers, r):
            cols[h].append(v)
    # per-column type vote over ≤100 sample rows → Utf8/Int64/Float64
    arrays = {}
    for h, vals in cols.items():
        sample = [v for v in vals[:100] if v is not None]
        if sample and all(isinstance(v, int) for v in sample):
            arrays[h] = pa.array(vals, pa.int64())
        elif sample and all(isinstance(v, (int, float)) for v in sample):
            arrays[h] = pa.array([None if v is None else float(v) for v in vals], pa.float64())
        else:
            arrays[h] = pa.array([None if v is None else str(v) for v in vals], pa.string())
    return rd.from_arrow(pa.table(arrays))


def write_xlsx(ds: rd.Dataset, path: str) -> None:
    """XLSX sink (reference: src/utils/io.rs:216-322) — driver-side full
    collect; bounded outputs only. openpyxl when available, else the
    bundled :mod:`nailray.xlsx_lite` writer."""
    t = to_arrow(ds)
    try:
        import openpyxl

        wb = openpyxl.Workbook()
        ws = wb.active
        ws.append(t.column_names)
        for row in t.to_pylist():
            ws.append([row[c] for c in t.column_names])
        wb.save(path)
    except ImportError:
        from . import xlsx_lite

        xlsx_lite.write_rows(
            path, [t.column_names] + [[row[c] for c in t.column_names]
                                      for row in t.to_pylist()])


def tail_any(ds: rd.Dataset, n: int) -> pa.Table:
    """Last N rows by dataset order for ANY source, with bounded driver
    memory: stream batches keeping only a sliding window of ≥ N rows
    (never materializes the dataset, unlike a to_pandas().tail())."""
    from collections import deque

    kept: deque[pa.Table] = deque()
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        kept.append(b)
        total += b.num_rows
        while kept and total - kept[0].num_rows >= n:
            total -= kept.popleft().num_rows
    if not kept:
        return to_arrow(ds.limit(0))
    t = pa.concat_tables(kept, promote_options="default")
    return t.slice(max(t.num_rows - n, 0))


def optimize_parquet(ds: rd.Dataset, out_path: str, compression: str = "snappy",
                     compression_level: int = 6, sort_by: str | None = None,
                     use_dictionary: bool = True,
                     row_group_size: int = 1_000_000) -> None:
    """Rewrite as standard parquet with chosen compression / optional
    global sort / dictionary encoding — the reference's ``nail optimize``
    semantics (src/commands/optimize.rs:18-135, sort ascending
    nulls-first per optimize.rs:290).

    ``row_group_size`` is accepted for CLI parity only: the reference
    builds WriterProperties from it and then discards them
    (optimize.rs:254-262), so neither engine honors the flag."""
    del row_group_size
    if compression not in ("snappy", "gzip", "zstd", "brotli"):
        raise ValueError(f"unsupported compression {compression!r}")
    if not 1 <= compression_level <= 9:
        raise ValueError("compression level must be 1-9 (optimize.rs:119-126)")
    if sort_by:
        from .ops import sorting

        ds = sorting.sort(ds, sort_by, nulls="first")
    kw: dict = {"compression": compression, "use_dictionary": use_dictionary}
    if compression in ("zstd", "gzip", "brotli"):
        kw["compression_level"] = compression_level
    ds.write_parquet(out_path, **kw)


def detect_format(path: str) -> str:
    """Format by extension only — parity with src/utils/mod.rs:47-57."""
    ext = os.path.splitext(path)[1].lower().lstrip(".")
    if ext in ("parquet", "pqt"):
        return "parquet"
    if ext == "csv":
        return "csv"
    if ext in ("json", "ndjson", "jsonl"):
        return "json"
    if ext == "xlsx":
        return "xlsx"
    raise ValueError(f"unsupported file extension: .{ext}")


def convert(in_path: str, out_path: str) -> None:
    """``nail convert`` (src/commands/convert.rs:30-57): read any → write any."""
    readers = {"parquet": rd.read_parquet, "csv": rd.read_csv, "json": rd.read_json}
    ds = readers[detect_format(in_path)](in_path)
    fmt = detect_format(out_path)
    if fmt == "parquet":
        ds.write_parquet(out_path)
    elif fmt == "csv":
        ds.write_csv(out_path)
    elif fmt == "json":
        ds.write_json(out_path)
    else:
        raise ValueError(f"cannot write format {fmt}")
