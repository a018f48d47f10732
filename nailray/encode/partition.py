"""Explicit hash partitioning on ``repo`` with skew splitting.

north_rule: "partitioning / shuffle / skew handled explicitly". The
plan is computed on the driver from a tiny (repo → rows/bytes)
aggregate, broadcast once, and applied as a vectorized ``map_batches``
stage. A repo whose bytes exceed the partition target is split into
``ceil(bytes/target)`` shards; shard assignment hashes ``commit`` so a
commit's files stay together — commit RLE runs survive the split (a
path-hash scatter re-stored every commit in every shard: measured ~21k
stored run values for 12.6k distinct commits on the bench corpus).
The shard key is recorded in the plan (resume keeps the old mapping).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa


def cheap_string_hash(arr: pa.Array) -> np.ndarray:
    """Deterministic vectorized string hash (uint64) without per-row
    Python: byte-sum via ``np.add.reduceat`` over the Arrow data buffer,
    mixed with length and first byte. Quality is adequate for shard
    balancing; NOT for dedup."""
    from .codecs.base import strings_to_buffer

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    data, lengths = strings_to_buffer(arr)
    n = len(lengths)
    if n == 0:
        return np.zeros(0, np.uint64)
    offsets = np.zeros(n, np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    d = data.astype(np.uint32) * np.uint32(2654435761)
    # reduceat needs in-bounds indices; empty strings share the next start
    safe = np.minimum(offsets, max(len(data) - 1, 0))
    sums = np.add.reduceat(d, safe, dtype=np.uint64) if len(data) else np.zeros(n, np.uint64)
    sums[lengths == 0] = 0
    first = np.where(lengths > 0, data[safe], 0).astype(np.uint64)
    h = sums * np.uint64(0x9E3779B97F4A7C15)
    h ^= lengths.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
    h ^= first << np.uint64(17)
    h ^= h >> np.uint64(29)
    return h


@dataclass
class PartitionPlan:
    """repo → (base part id, shard count); small, broadcast to workers."""

    repos: list[str]
    bases: np.ndarray  # int32 per repo
    nshards: np.ndarray  # int32 per repo
    num_partitions: int
    target_bytes: int
    meta: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "num_partitions": self.num_partitions,
            "target_bytes": self.target_bytes,
            "repos": {
                r: {"base": int(b), "shards": int(s)}
                for r, b, s in zip(self.repos, self.bases, self.nshards)
            },
            "meta": self.meta,
        }

    @classmethod
    def from_json(cls, d: dict) -> "PartitionPlan":
        """Rebuild the plan persisted in ``_plan.json`` — resume MUST
        reuse the stored part_id mapping, never replan (a replan on a
        different CPU count would remap part ids while old completed ids
        are still filtered out, silently dropping/duplicating rows)."""
        repos = list(d["repos"])
        return cls(
            repos=repos,
            bases=np.asarray([d["repos"][r]["base"] for r in repos], np.int32),
            nshards=np.asarray([d["repos"][r]["shards"] for r in repos], np.int32),
            num_partitions=int(d["num_partitions"]),
            target_bytes=int(d["target_bytes"]),
            meta=d.get("meta", {}),
        )


def plan_partitions(
    repo_rows: dict[str, int],
    repo_bytes: dict[str, int],
    target_bytes: int = 256 << 20,
    min_partitions: int = 1,
) -> PartitionPlan:
    """Greedy bin-pack small repos; dedicated shard range per giant repo.

    Deterministic: repos processed in descending-bytes (then name) order.
    """
    repos = sorted(repo_bytes, key=lambda r: (-repo_bytes[r], r))
    bases: list[int] = []
    shards: list[int] = []
    next_part = 0
    open_part = -1
    open_fill = 0
    split_info = {}
    for r in repos:
        b = repo_bytes[r]
        if b > target_bytes:  # skew split
            k = int(np.ceil(b / target_bytes))
            bases.append(next_part)
            shards.append(k)
            split_info[r] = {"shards": k, "bytes": int(b)}
            next_part += k
        elif open_part >= 0 and open_fill + b <= target_bytes:
            bases.append(open_part)
            shards.append(1)
            open_fill += b
        else:
            open_part = next_part
            next_part += 1
            open_fill = b
            bases.append(open_part)
            shards.append(1)
    num = max(next_part, min_partitions)
    return PartitionPlan(
        repos=repos,
        bases=np.asarray(bases, np.int32),
        nshards=np.asarray(shards, np.int32),
        num_partitions=num,
        target_bytes=target_bytes,
        meta={"split_repos": split_info, "total_bytes": int(sum(repo_bytes.values())),
              "total_rows": int(sum(repo_rows.values())),
              "shard_key": "commit"},
    )


class PartitionAssigner:
    """``map_batches`` stage adding the int32 ``part_id`` column.

    Vectorized: repo → plan index via ``pc.index_in``; rows of split
    repos get ``base + cheap_string_hash(shard_key) % shards`` where the
    shard key comes from the plan (``commit`` for new plans — keeps each
    commit's run in one shard; ``path`` for plans persisted before the
    key was recorded, so resume reproduces the old row→part mapping).
    """

    def __init__(self, plan: PartitionPlan):
        self.plan = plan
        self.repo_arr = pa.array(plan.repos, pa.string())
        self.shard_key = plan.meta.get("shard_key", "path")

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.index_in(batch.column("repo"), value_set=self.repo_arr)
        idx_np = np.asarray(idx.fill_null(-1), dtype=np.int64)
        base = self.plan.bases[idx_np]
        k = self.plan.nshards[idx_np]
        part = base.astype(np.int64)
        split_mask = k > 1
        if split_mask.any():
            # a wrong fallback column (e.g. the constant repo) would send
            # every row of a split repo to ONE shard — silently undoing
            # the skew split — so fall back only to 'path' (always present
            # on the corpus schema) and otherwise fail loudly
            if self.shard_key in batch.column_names:
                key_col = self.shard_key
            elif "path" in batch.column_names:
                key_col = "path"
            else:
                raise ValueError(
                    f"shard key {self.shard_key!r} (and fallback 'path') "
                    f"not in columns {batch.column_names}; cannot split "
                    "an oversized repo without a row-distinguishing key")
            h = cheap_string_hash(batch.column(key_col).combine_chunks())
            part[split_mask] += (h[split_mask] % k[split_mask].astype(np.uint64)).astype(np.int64)
        return batch.append_column("part_id", pa.array(part.astype(np.int32)))
