"""Projections / schema ops: select, drop, rename, create, id, head,
tail, count, headers, schema (SURVEY §2.2)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..expr import parse_conditions, conditions_mask, parse_expression, resolve_column
from ..io import ROW_ID


def _looks_like_regex(p: str) -> bool:
    # the reference treats a token as regex if it contains * ^ or $
    # (src/commands/select.rs:77-86)
    return any(ch in p for ch in "*^$")


def resolve_column_patterns(names: list[str], spec: str) -> list[str]:
    """Comma list of exact names / regexes → ordered, deduped matches.

    Parity: exact name → case-insensitive → regex (src/commands/select.rs:54-135).
    """
    out: list[str] = []
    for tok in (t.strip() for t in spec.split(",")):
        if not tok:
            continue
        matched: list[str] = []
        if _looks_like_regex(tok):
            rx = re.compile(tok)
            matched = [n for n in names if rx.search(n)]
        else:
            try:
                matched = [resolve_column(names, tok)]
            except KeyError:
                matched = []
        if not matched:
            raise KeyError(f"no columns match {tok!r}")
        for m in matched:
            if m not in out:
                out.append(m)
    return out


def select_columns(ds: rd.Dataset, spec: str) -> rd.Dataset:
    return ds.select_columns(resolve_column_patterns(ds.schema().names, spec))


def drop_columns(ds: rd.Dataset, spec: str) -> rd.Dataset:
    cols = resolve_column_patterns(ds.schema().names, spec)
    return ds.drop_columns(cols)


def parse_row_spec(spec: str) -> list[tuple[int, int]]:
    """'1,3,5-10' → 1-based inclusive ranges (src/commands/select.rs:330-389)."""
    ranges = []
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "-" in tok:
            a, b = tok.split("-", 1)
            ranges.append((int(a), int(b)))
        else:
            ranges.append((int(tok), int(tok)))
    for a, b in ranges:
        if a < 1 or b < a:
            raise ValueError(f"bad row range {a}-{b}")
    return ranges


def _row_spec_mask(batch: pa.Table, ranges: list[tuple[int, int]]) -> pa.Array:
    rid = batch.column(ROW_ID)
    mask = None
    for a, b in ranges:
        m = pc.and_(pc.greater_equal(rid, a), pc.less_equal(rid, b))
        mask = m if mask is None else pc.or_(mask, m)
    return mask


def select_rows(ds: rd.Dataset, spec: str) -> rd.Dataset:
    """Keep rows by 1-based index spec; requires row_id ingest."""
    ranges = parse_row_spec(spec)
    return ds.map_batches(lambda b: b.filter(_row_spec_mask(b, ranges)),
                          batch_format="pyarrow")


def drop_rows(ds: rd.Dataset, spec: str) -> rd.Dataset:
    ranges = parse_row_spec(spec)
    return ds.map_batches(lambda b: b.filter(pc.invert(_row_spec_mask(b, ranges))),
                          batch_format="pyarrow")


def drop_rows_by_conditions(ds: rd.Dataset, cond_spec: str) -> rd.Dataset:
    """Keep NOT(cond1 AND cond2 ...) (src/commands/drop.rs:88-158)."""
    names = ds.schema().names
    conds = parse_conditions(cond_spec, names)
    return ds.map_batches(
        lambda b: b.filter(pc.invert(conditions_mask(b, conds))),
        batch_format="pyarrow",
    )


def rename_columns(ds: rd.Dataset, mapping: dict[str, str] | str) -> rd.Dataset:
    """'before=after' pairs; validates sources exist and no target dup
    (src/commands/rename.rs:17-93)."""
    names = ds.schema().names
    if isinstance(mapping, str):
        pairs = [p.split("=", 1) for p in mapping.split(",") if p.strip()]
        mapping = {a.strip(): b.strip() for a, b in pairs}
    resolved = {resolve_column(names, k): v for k, v in mapping.items()}
    targets = [resolved.get(n, n) for n in names]
    if len(set(targets)) != len(targets):
        raise ValueError(f"rename produces duplicate column names: {targets}")
    return ds.rename_columns(resolved)


def create_column(ds: rd.Dataset, spec: str, row_filter: str | None = None) -> rd.Dataset:
    """'name=expr' derived columns; optional row filter applied first
    (src/commands/create.rs:30-95). Rejects existing names."""
    names = list(ds.schema().names)
    if row_filter:
        conds = parse_conditions(row_filter, names)
        ds = ds.map_batches(lambda b: b.filter(conditions_mask(b, conds)),
                            batch_format="pyarrow")
    exprs = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        name, src = part.split("=", 1)
        name = name.strip()
        if name in names:
            raise ValueError(f"column {name!r} already exists")
        exprs.append((name, parse_expression(src, names)))
        names.append(name)

    def add(batch: pa.Table) -> pa.Table:
        for name, e in exprs:
            v = e.eval(batch)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * batch.num_rows)
            batch = batch.append_column(name, v)
        return batch

    return ds.map_batches(add, batch_format="pyarrow")


def add_id_column(ds: rd.Dataset, prefix: str = "", name: str = "id") -> rd.Dataset:
    """Prepend unique id '<prefix><row_number>' (src/commands/id.rs:41-74).
    Requires row_id ingest for file-order numbering."""
    if name in ds.schema().names and name != ROW_ID:
        raise ValueError(f"column {name!r} already exists")

    def add(batch: pa.Table) -> pa.Table:
        rid = batch.column(ROW_ID)
        if prefix:
            ids = pc.binary_join_element_wise(
                pa.array([prefix] * batch.num_rows), pc.cast(rid, pa.string()), ""
            )
        else:
            ids = pc.cast(rid, pa.string())
        idx = batch.column_names.index(ROW_ID)
        return batch.set_column(idx, name, ids) if name == ROW_ID else \
            batch.append_column(name, ids)

    return ds.map_batches(add, batch_format="pyarrow")


def head(ds: rd.Dataset, n: int = 5) -> rd.Dataset:
    return ds.limit(n)


def tail(ds_with_row_id: rd.Dataset, total_rows: int, n: int = 5) -> rd.Dataset:
    """Last N by file order via metadata count + row_id filter
    (src/commands/tail.rs:28-78 fast path)."""
    lo = total_rows - n
    return ds_with_row_id.map_batches(
        lambda b: b.filter(pc.greater(b.column(ROW_ID), lo)), batch_format="pyarrow"
    )


def count(ds: rd.Dataset) -> int:
    return ds.count()


def headers(ds: rd.Dataset, pattern: str | None = None) -> list[str]:
    names = ds.schema().names
    if pattern:
        rx = re.compile(pattern)
        names = [n for n in names if rx.search(n)]
    return names


def schema_info(ds: rd.Dataset) -> list[dict]:
    sch = ds.schema()
    base = sch.base_schema if hasattr(sch, "base_schema") else sch
    return [
        {"column": f.name, "type": str(f.type), "nullable": f.nullable}
        for f in base
    ]
