"""Corpus hygiene and structure stages: PII redaction,
unicode/whitespace normalization, URL-domain extraction/blocklist
filtering, and line explode. Arrow RE2 / unicode kernels inside
map_batches — the document payload stays zero-copy in the object store
(only Unicode normalization crosses to Python, in one C-level
`unicodedata` pass); no shuffle, no driver state.

These are pre-training corpus passes (C4/CCNet-style): strip
personally-identifiable spans before tokenization, canonicalize text
(NFC, case, whitespace) so downstream dedup/hashing sees one spelling
per logical string, drop documents from blocklisted domains, and
explode documents into per-line rows for line-level scoring. All are
SQL-expressible (DuckDB regexp_* / nfc_normalize / string_split use
the same RE2 / Unicode semantics as the kernels here) so every
operator carries an exact oracle.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .analysis import _upsert_column

# RE2-compatible patterns (identical semantics in pyarrow.compute and
# DuckDB regexp_* — both are RE2). Ordered dict: replacement happens in
# this order, so e.g. emails are consumed before the bare-digit rules
# could touch their host parts.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d[\d\- ]{7,}\d",
}


def redact_pii(
    ds: rd.Dataset,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "ssn"),
    token: str = "<{kind}>",
    count: bool = True,
) -> rd.Dataset:
    """Replace PII spans in ``text_col`` with ``token`` markers.

    One chained `pc.replace_substring_regex` per kind (applied in the
    order given — order matters where patterns could overlap, and the
    SQL oracle chains regexp_replace in the same order). With
    ``count=True`` each kind also emits an ``n_<kind>`` match-count
    column (counted BEFORE replacement, on the original text).
    Per-batch only: scale-safe at any corpus size.
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; have {sorted(PII_PATTERNS)}")

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if count:
            for kind in kinds:
                batch = _upsert_column(
                    batch, f"n_{kind}",
                    pc.cast(pc.count_substring_regex(text, PII_PATTERNS[kind]),
                            pa.int64()))
        out = text
        for kind in kinds:
            out = pc.replace_substring_regex(
                out, pattern=PII_PATTERNS[kind],
                replacement=token.format(kind=kind))
        return _upsert_column(batch, text_col, out)

    return ds.map_batches(fn, batch_format="pyarrow")


# first URL in a document → its host part. RE2 named group (Arrow needs
# named groups; the SQL oracle uses the same pattern with group index 1)
URL_DOMAIN_RE = r"https?://(?P<domain>[A-Za-z0-9.-]+)"


def extract_domain(ds: rd.Dataset, text_col: str = "text",
                   out_col: str = "domain") -> rd.Dataset:
    """Append the first URL's domain per document (lowercased; ``""``
    when the document has no URL — matching DuckDB ``regexp_extract``'s
    no-match result so the oracle can be exact). One `pc.extract_regex`
    per batch, zero-copy, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        d = pc.struct_field(
            pc.extract_regex(pc.fill_null(batch.column(text_col), ""),
                             URL_DOMAIN_RE), "domain")
        return _upsert_column(batch, out_col,
                              pc.utf8_lower(pc.fill_null(d, "")))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_domains(ds: rd.Dataset, blocked: list[str] | set[str],
                   text_col: str = "text") -> rd.Dataset:
    """Drop documents whose first URL's domain is on the blocklist —
    the C4-style URL filtering pass. The blocklist is normalized to
    lowercase once and ships with the UDF (broadcast-once semantics);
    per batch it's one extract + one `pc.is_in`. Documents with no URL
    always survive."""
    blocked_arr = pa.array(sorted({b.lower() for b in blocked}), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        d = pc.struct_field(
            pc.extract_regex(pc.fill_null(batch.column(text_col), ""),
                             URL_DOMAIN_RE), "domain")
        d = pc.utf8_lower(pc.fill_null(d, ""))
        return batch.filter(pc.invert(pc.is_in(d, value_set=blocked_arr)))

    return ds.map_batches(fn, batch_format="pyarrow")


def explode_lines(ds: rd.Dataset, text_col: str = "text",
                  id_col: str = "doc_id",
                  line_col: str = "line") -> rd.Dataset:
    """Explode documents into one row per line: ``(id, line_no, line)``
    with 1-based ``line_no`` — the structural pass before line-level
    scoring/filtering pipelines. Vectorized explode inside map_batches
    (`split_pattern` → `list_flatten` + `list_parent_indices`; NOT a
    per-row ``flat_map``), so output blocks stay Arrow-contiguous and
    the stage streams. A null/empty document yields one empty line,
    same as DuckDB's ``string_split`` on ``''`` (the oracle's shape)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_col), "")
        parts = pc.split_pattern(col, "\n")
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts)
        lens = np.asarray(pc.list_value_length(parts)).astype(np.int64)
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        line_no = (np.arange(starts[-1], dtype=np.int64)
                   - np.repeat(starts[:-1], lens) + 1)
        return pa.table({
            id_col: pc.take(batch.column(id_col), parents),
            "line_no": pa.array(line_no, pa.int64()),
            line_col: flat,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def _normalize_strings(col, form: str) -> pa.Array:
    """Exact Unicode normalization of a string column.

    `pc.utf8_normalize` in this Arrow build decomposes but does NOT
    recompose under NFC/NFKC (E + U+0301 stays two codepoints), so it
    can't match DuckDB/ICU semantics.

    ASCII fast path: pure-ASCII rows are invariant under every
    normalization form (ASCII codepoints are starters with no
    decompositions), so only the non-ASCII MINORITY rows — vanishingly
    few in code/web corpora — cross to Python (`unicodedata` C-level
    pass over a NUL-joined buffer; NUL is a starter that never composes
    with a following mark, so normalization can't leak across row
    boundaries, with an `is_normalized` quick-check making
    already-normalized batches a no-op), then scatter back with one
    `replace_with_mask` kernel."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    non_ascii = pc.fill_null(pc.invert(pc.string_is_ascii(col)), False)
    n_bad = pc.sum(pc.cast(non_ascii, pa.int64())).as_py() or 0
    if n_bad == 0:
        return pc.cast(col, pa.string())
    sub = col.filter(non_ascii)  # all non-null by construction
    vals = sub.to_pylist()
    joined = "\x00".join(vals)
    if unicodedata.is_normalized(form, joined):
        out = vals
    elif joined.count("\x00") == len(vals) - 1:
        out = unicodedata.normalize(form, joined).split("\x00")
    else:  # some payload contains NUL itself — normalize per row
        out = [unicodedata.normalize(form, v) for v in vals]
    return pc.replace_with_mask(pc.cast(col, pa.string()), non_ascii,
                                pa.array(out, pa.string()))


def normalize_text(
    ds: rd.Dataset,
    text_col: str = "text",
    form: str = "NFC",
    lower: bool = True,
    collapse_whitespace: bool = True,
) -> rd.Dataset:
    """Canonicalize ``text_col``: unicode-normalize (NFC/NFKC/NFD/NFKD),
    optionally lowercase, collapse ASCII-whitespace runs (RE2 ``\\s``)
    to single spaces and trim the resulting edge spaces. Whitespace
    handling is deliberately ASCII-only END TO END — Unicode spaces
    (NBSP, ideographic) pass through untouched on both edges and
    interior, exactly like the DuckDB oracle's ``regexp_replace`` +
    ``trim`` — so the two sides can't diverge on exotic whitespace.
    Kernel order is normalize → lower → collapse → trim, and the SQL
    oracle composes nfc_normalize/lower/regexp_replace/trim in the
    same order. Per-batch kernels only — no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        out = _normalize_strings(batch.column(text_col), form)
        if lower:
            out = pc.utf8_lower(out)
        if collapse_whitespace:
            out = pc.replace_substring_regex(out, pattern=r"\s+",
                                             replacement=" ")
            # ASCII space only: the collapse already folded any edge
            # ASCII-ws run into one ' '; trimming Unicode whitespace
            # here would diverge from DuckDB's trim()
            out = pc.utf8_trim(out, characters=" ")
        return _upsert_column(batch, text_col, out)

    return ds.map_batches(fn, batch_format="pyarrow")
