"""Benchmark decontamination: flag or drop documents whose text
contains any snippet from a (small) contamination set — the eval-leak
scrub every training-data pipeline runs before a corpus ships.

Scale shape: the snippet set is the broadcast side — it ships to each
actor ONCE (constructor args travel through the object store, not per
batch) and compiles into chunked RE2 literal-alternation patterns in
``__init__``. Matching is then a single vectorized
``pc.match_substring_regex`` pass per chunk over the zero-copy Arrow
text column — linear in corpus bytes, never per-snippet Python loops
over rows. For snippet sets too large for an alternation (millions),
shard the set and run this stage once per shard, OR-ing the flags
(each pass stays one linear scan)."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .analysis import _upsert_column

# RE2 pattern-size ceiling: literals per alternation chunk
_CHUNK = 512


class Decontaminator:
    """Actor-pool stage: snippet patterns compiled once per actor."""

    def __init__(self, snippets: list[str], text_col: str = "text",
                 out_col: str = "contaminated"):
        self.text_col = text_col
        self.out_col = out_col
        snips = [s for s in snippets if s]  # '' would match every doc
        self.patterns = [
            "|".join(re.escape(s) for s in snips[i:i + _CHUNK])
            for i in range(0, len(snips), _CHUNK)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch.column(self.text_col), "")
        mask = None
        for p in self.patterns:
            hit = pc.match_substring_regex(txt, p)
            mask = hit if mask is None else pc.or_(mask, hit)
        if mask is None:
            mask = pa.array([False] * len(batch), pa.bool_())
        return _upsert_column(batch, self.out_col, mask)


def flag_contaminated(ds: rd.Dataset, snippets: list[str],
                      text_col: str = "text",
                      out_col: str = "contaminated",
                      concurrency=None) -> rd.Dataset:
    """Append a boolean ``out_col``: does the document contain any
    snippet (exact substring match)?"""
    from ..shuffle import actor_pool_size

    concurrency = actor_pool_size(concurrency)
    return ds.map_batches(Decontaminator,
                          fn_constructor_args=(list(snippets), text_col, out_col),
                          batch_format="pyarrow", concurrency=concurrency)


def decontaminate(ds: rd.Dataset, snippets: list[str],
                  text_col: str = "text", concurrency=None) -> rd.Dataset:
    """Drop contaminated documents; schema passes through unchanged."""
    out_col = "__contam__"
    flagged = flag_contaminated(ds, snippets, text_col, out_col, concurrency)

    def keep_clean(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch.column(out_col))
        return batch.filter(mask).drop_columns([out_col])

    return flagged.map_batches(keep_clean, batch_format="pyarrow")
