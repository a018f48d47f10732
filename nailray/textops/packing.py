"""Sequence packing: group documents into fixed token-budget packs —
the batch-construction pass between a cleaned corpus and a trainer
(each pack becomes one training sequence of concatenated documents).

Scale shape: packing is a per-partition decision — documents pack
WITHIN each coarse hash partition (`nailray.shuffle.group_map`), so no
global coordination exists and pack ids stay unique via a partition
prefix. Inside a partition, next-fit-decreasing runs over the (already
vectorized) token counts: sort by length descending, then one linear
scan that opens a new pack when the budget would overflow. The scan is
the only per-row loop in the operator; it touches two int64 arrays (no
strings) at ~10⁷ rows/s, far from the bottleneck next to tokenization.

Documents longer than the budget get a pack of their own (never split
— splitting belongs to the tokenizer's truncation policy, not the
packer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..shuffle import group_map, hash_partition, int_types_mapper, partition_count


def token_counts_col(batch: pa.Table, text_col: str) -> pa.Array:
    """Whitespace token count per row (the shared tokenizer —
    :func:`~nailray.textops.analysis.whitespace_tokens` — so counts agree
    with token_topk / bm25 / dedup_spans and the SQL oracles)."""
    from .analysis import whitespace_tokens

    _flat, parents = whitespace_tokens(batch.column(text_col))
    return pa.array(np.bincount(parents, minlength=batch.num_rows)
                    .astype(np.int64))


def pack_sequences(ds: rd.Dataset, budget: int, id_col: str,
                   text_col: str | None = None, count_col: str | None = None,
                   num_partitions: int | None = None,
                   exchange: str | None = None) -> rd.Dataset:
    """Assign every document to a pack of total token count ≤ ``budget``
    (oversized documents get singleton packs). Returns
    ``(id, n_tokens, pack_id)`` — join ``pack_id`` back to fetch text.

    Exactly one of ``text_col`` (counts computed here) / ``count_col``
    (precomputed counts) must be given.
    """
    if (text_col is None) == (count_col is None):
        raise ValueError("give exactly one of text_col / count_col")
    n_parts = partition_count(num_partitions)

    def project(batch: pa.Table) -> pa.Table:
        n = (token_counts_col(batch, text_col) if text_col
             else pc.cast(batch.column(count_col), pa.int64()))
        t = pa.table({id_col: batch.column(id_col), "n_tokens": n})
        df = t.to_pandas(types_mapper=int_types_mapper)
        df["__part"] = hash_partition(df, [id_col], n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pack_partition(g: pa.Table) -> pa.Table:
        part = int(g.column("__part")[0].as_py())
        ids = g.column(id_col)
        n = np.asarray(g.column("n_tokens"), dtype=np.int64)
        order = np.argsort(-n, kind="stable")  # next-fit decreasing
        pack_of = np.empty(len(n), np.int64)
        cur, fill = 0, 0
        for i in order:
            ni = int(n[i])
            if fill > 0 and fill + ni > budget:
                cur += 1
                fill = 0
            pack_of[i] = cur
            fill += ni  # an oversized doc overflows its own pack only
            if fill >= budget:
                cur += 1
                fill = 0
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(n),
            "pack_id": pa.array(pack_of + (part << 32)),
        })

    projected = ds.map_batches(project, batch_format="pyarrow")
    return group_map(projected, "__part", pack_partition, n_parts,
                     exchange=exchange)
