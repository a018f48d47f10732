"""Console output: record "cards", JSON array printing, correlation
matrix grid (reference: src/utils/format.rs:34-200, 522-597).

Driver-side only (operates on small `ds.take(n)` results)."""

from __future__ import annotations

import json
from datetime import date, datetime

import pyarrow as pa


def _fmt_value(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    return str(v)


def format_records(rows: list[dict], start: int = 1) -> str:
    """Record-card pretty printer (format.rs:119-200): one card per row,
    'Record N:' header, aligned 'column: value' lines."""
    out = []
    for i, row in enumerate(rows, start):
        out.append(f"Record {i}:")
        width = max((len(k) for k in row), default=0)
        for k, v in row.items():
            out.append(f"  {k.rjust(width)}: {_fmt_value(v)}")
        out.append("")
    return "\n".join(out).rstrip() + ("\n" if rows else "")


def format_json(rows: list[dict]) -> str:
    """JSON array printer (format.rs:84-117)."""
    return json.dumps(rows, default=_fmt_value, indent=2)


def format_table(table: pa.Table, max_rows: int = 20) -> str:
    """Compact grid for small results (correlation matrices etc.)."""
    rows = table.slice(0, max_rows).to_pylist()
    cols = table.column_names
    cells = [[_fmt_value(r[c]) for c in cols] for r in rows]
    widths = [max(len(c), *(len(row[i]) for row in cells)) if cells else len(c)
              for i, c in enumerate(cols)]
    lines = ["  ".join(c.ljust(w) for c, w in zip(cols, widths))]
    lines += ["  ".join(v.ljust(w) for v, w in zip(row, widths)) for row in cells]
    if table.num_rows > max_rows:
        lines.append(f"... ({table.num_rows - max_rows} more rows)")
    return "\n".join(lines)
