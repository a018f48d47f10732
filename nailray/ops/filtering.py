"""filter / search (SURVEY §2.2: src/commands/filter.rs, search.rs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..expr import parse_conditions, conditions_mask
from ..io import ROW_ID


def filter_conditions(ds: rd.Dataset, spec: str) -> rd.Dataset:
    """AND-combined `col OP literal` conditions (src/commands/filter.rs:62-119)."""
    conds = parse_conditions(spec, ds.schema().names)
    return ds.map_batches(lambda b: b.filter(conditions_mask(b, conds)),
                          batch_format="pyarrow")


def _numeric_cols(schema: pa.Schema) -> list[str]:
    return [f.name for f in schema
            if pa.types.is_integer(f.type) or pa.types.is_floating(f.type)]


def _string_cols(schema: pa.Schema) -> list[str]:
    return [f.name for f in schema
            if pa.types.is_string(f.type) or pa.types.is_large_string(f.type)]


def filter_rows(ds: rd.Dataset, mode: str) -> rd.Dataset:
    """Row-class predicates (src/commands/filter.rs:121-205):
    no-nan | numeric-only | char-only | no-zeros."""
    schema = _arrow_schema(ds)
    if mode == "no-nan":
        cols = [f.name for f in schema if f.name != ROW_ID]
        checks = [("notnull", c) for c in cols]
    elif mode == "numeric-only":
        checks = [("notnull", c) for c in _numeric_cols(schema)]
    elif mode == "char-only":
        checks = [("nonempty", c) for c in _string_cols(schema)]
    elif mode == "no-zeros":
        checks = [("nonzero", c) for c in _numeric_cols(schema)]
    else:
        raise ValueError(f"unknown row filter mode {mode!r}")

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for kind, c in checks:
            col = batch.column(c)
            if kind == "notnull":
                m = pc.is_valid(col)
            elif kind == "nonempty":
                m = pc.and_(pc.is_valid(col), pc.not_equal(col, ""))
            else:
                m = pc.and_kleene(pc.is_valid(col), pc.not_equal(col, 0))
                m = pc.fill_null(m, False)
            mask = m if mask is None else pc.and_(mask, m)
        if mask is None:
            return batch
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def _arrow_schema(ds: rd.Dataset) -> pa.Schema:
    sch = ds.schema()
    return sch.base_schema if hasattr(sch, "base_schema") else sch


def search(
    ds: rd.Dataset,
    value: str,
    columns: list[str] | None = None,
    ignore_case: bool = False,
    exact: bool = False,
) -> rd.Dataset:
    """Value match across columns, OR-combined (src/commands/search.rs:59-134).

    Strings: equality (exact) or substring LIKE %v%; numerics: equality
    or cast-to-string substring."""
    schema = _arrow_schema(ds)
    names = columns or [f.name for f in schema if f.name != ROW_ID]

    def fn(batch: pa.Table) -> pa.Table:
        mask = None
        for c in names:
            col = batch.column(c)
            if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)):
                col = pc.cast(col, pa.string())
            hay = pc.utf8_lower(col) if ignore_case else col
            needle = value.lower() if ignore_case else value
            m = pc.equal(hay, needle) if exact else pc.match_substring(hay, needle)
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.or_(mask, m)
        return batch.filter(mask if mask is not None else pa.array([False] * batch.num_rows))

    return ds.map_batches(fn, batch_format="pyarrow")


def search_rows(ds_with_row_id: rd.Dataset, value: str, **kw) -> rd.Dataset:
    """Matching original row numbers (src/commands/search.rs:136-231):
    numbering happens at ingest (row_id), so filter + project."""
    return search(ds_with_row_id, value, **kw).select_columns([ROW_ID])
