"""The encode pipeline: read → stats → partition → actor-pool encode →
write + manifest → decode / verify.

Ray shape (SURVEY §3.3 "Ray shape (per north_star)"):

    read_parquet(cols)                        # streaming scan
      → map_batches(partial repo sizes)       # pre-aggregated combiner
      → groupby("repo").aggregate(Sum)        # tiny shuffle (one row/repo)
    [driver] plan_partitions(...)             # explicit hash partition + skew split
    read_parquet(all cols)
      → map_batches(PartitionAssigner)        # vectorized part_id
      → map_batches(drop completed)           # resume filter BEFORE the shuffle
      → groupby("part_id").map_groups(EncoderGroup, concurrency=N)
                                              # actor pool; per-partition FSST
                                              # table + dict codebooks; writes
                                              # part-XXXXX.parquet + manifest
    decode: read encoded → map_batches(decode_chunks)   # streaming
    verify: order-insensitive per-row sha256(content) aggregate on both sides

No stage materializes the whole dataset; partitions are bounded by
``target_partition_bytes`` (skew split), so the per-group encode holds
at most one partition in heap.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

from . import codecs, manifest as mf
from .codecs import fsst as fsst_mod
from .partition import PartitionAssigner, PartitionPlan, plan_partitions
from .select import _ORDER as _CODEC_ORDER, candidates_for
from .stats import column_stats, entropy_estimate
from ..io import _expand_paths, read_parquet as _read_pq

ENC_VERSION = 1
CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

# Final-stage entropy coder (NAILRAY_ENTROPY="zstd:9" | "brotli:7" ...;
# legacy NAILRAY_ZSTD_LEVEL sets the zstd level). Measured on real FSST
# content payloads (16.3 MB): zstd-3 0.482 @ 110 MB/s/core, zstd-9
# 0.419 @ 28, zstd-12 0.411 @ 12.5, brotli-7 0.405 @ 11.8, brotli-9
# 0.400 @ 7.5, brotli-11 0.362 @ 0.5, zstd-19 0.390 @ 2.0. zstd-9 is
# the throughput knee and the default; brotli:7 is the size-optimized
# mode (~3.3% smaller archive for ~2.4x the entropy-stage CPU). The
# coder is recorded per chunk (meta "zc"), so decode is self-describing
# and archives written under either setting always decode.
ZSTD_LEVEL = int(os.environ.get("NAILRAY_ZSTD_LEVEL", "9"))
_ENTROPY_SPEC = os.environ.get("NAILRAY_ENTROPY", f"zstd:{ZSTD_LEVEL}")
_ENTROPY_NAME, _, _lvl = _ENTROPY_SPEC.partition(":")
_ENTROPY = pa.Codec(_ENTROPY_NAME, compression_level=int(_lvl or 0) or None)
_ZSTD = _ENTROPY if _ENTROPY_NAME == "zstd" else pa.Codec(
    "zstd", compression_level=ZSTD_LEVEL)
_DECODERS: dict[str, pa.Codec] = {}


def _zip_payload(payload: bytes) -> tuple[bytes, int]:
    """Final entropy-coding stage over every codec payload (the analogue
    of parquet page compression, applied explicitly so codec selection
    can measure true output bytes)."""
    return bytes(_ENTROPY.compress(payload)), len(payload)


def _unzip_payload(data: bytes, raw_len: int, coder: str = "zstd") -> bytes:
    if coder not in _DECODERS:
        _DECODERS[coder] = pa.Codec(coder)
    return bytes(_DECODERS[coder].decompress(data, raw_len))


# --------------------------------------------------------------------------
# stats pass
# --------------------------------------------------------------------------

def _repo_partials(batch: pa.Table) -> pa.Table:
    """Per-batch pre-aggregation: one row per repo per batch (combiner
    before the groupby shuffle — SURVEY §4 'pre-aggregate partial')."""
    g = batch.group_by("repo").aggregate([("rows", "sum"), ("bytes", "sum")])
    return g.rename_columns(["repo", "rows", "bytes"])


def _read_blocks() -> int:
    """Read parallelism: enough blocks that no downstream stage (shuffle
    map/reduce, encode actors) serializes on block count."""
    import ray

    # 2 blocks per CPU measured fastest (fewer: shuffle serializes;
    # more: per-block shuffle overhead dominates)
    return int(ray.cluster_resources().get("CPU", 8)) * 2


def _file_stats_impl(path: str) -> dict:
    """One task per input file: repo value counts (column-pruned read),
    footer row count, footer content-bytes, file size — everything the
    planner needs in ONE parallel pass (replaces a Ray Data pipeline
    plus two serial driver footer loops)."""
    t = pq.read_table(path, columns=["repo"])
    vc = pc.value_counts(t.column("repo").combine_chunks())
    repos = {s["values"]: int(s["counts"]) for s in vc.to_pylist()}
    md = pq.ParquetFile(path).metadata
    content_bytes = 0
    for rg in range(md.num_row_groups):
        r = md.row_group(rg)
        for ci in range(r.num_columns):
            c = r.column(ci)
            if c.path_in_schema == "content":
                content_bytes += c.total_uncompressed_size
    return {"file": path, "bytes": os.path.getsize(path),
            "num_rows": md.num_rows, "repo_rows": repos,
            "content_bytes": content_bytes}


def _gather_file_stats(paths) -> list[dict]:
    import ray

    task = ray.remote(num_cpus=1)(_file_stats_impl)
    return ray.get([task.remote(p) for p in paths])


def repo_sizes(input_paths, exact_bytes: bool = False) -> tuple[dict[str, int], dict[str, int]]:
    """Per-repo (rows, bytes) for partition planning.

    Default: one raw task per file reads ONLY the ``repo`` column and
    the footer; per-repo bytes = rows × average content bytes/row from
    the footers — no content scan, no Dataset-pipeline fixed cost.
    ``exact_bytes=True`` scans content lengths too (use when per-repo
    size skew within rows matters more than the extra pass)."""
    paths = _expand_paths(input_paths)
    if exact_bytes:
        ds = _read_pq(paths, columns=["repo", "content"],
                      override_num_blocks=_read_blocks())

        def partial(batch: pa.Table) -> pa.Table:
            lens = pc.binary_length(batch.column("content")).cast(pa.int64())
            t = pa.table({
                "repo": batch.column("repo"),
                "rows": pa.array(np.ones(len(batch), np.int64)),
                "bytes": lens,
            })
            return _repo_partials(t)

        rows: dict[str, int] = {}
        bts: dict[str, int] = {}
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"):
            for r, n, by in zip(b["repo"].to_pylist(), b["rows"].to_pylist(),
                                b["bytes"].to_pylist()):
                rows[r] = rows.get(r, 0) + int(n)
                bts[r] = bts.get(r, 0) + int(by)
        return rows, bts

    stats = _gather_file_stats(paths)
    return _merge_repo_stats(stats)


def _merge_repo_stats(stats: list[dict]) -> tuple[dict[str, int], dict[str, int]]:
    rows: dict[str, int] = {}
    tot_bytes = 0
    tot_rows = 0
    for s in stats:
        for r, n in s["repo_rows"].items():
            rows[r] = rows.get(r, 0) + n
        tot_bytes += s["content_bytes"]
        tot_rows += s["num_rows"]
    avg = tot_bytes / max(tot_rows, 1)
    bts = {r: int(n * avg) for r, n in rows.items()}
    return rows, bts


# --------------------------------------------------------------------------
# encoder actor (per-partition stateful stage)
# --------------------------------------------------------------------------

def _partition_sort_keys(columns) -> list[tuple[str, str]]:
    """Partition-local sort for run formation, path-major by default:
    front-coding wins most on fully-sorted paths, and commit runs are
    already minimal under it (commits are assigned in path order, so the
    A/B measured path-major at 12.6k commit runs globally — equal to the
    distinct count — while commit-major cost +0.12 MB on the path column).
    Override with NAILRAY_SORT_KEYS for corpora with other correlations.
    The env var is read here (once per partition, cost nil) rather than
    at import so driver-side `os.environ` changes and late imports are
    honored in encode workers."""
    spec = os.environ.get("NAILRAY_SORT_KEYS", "repo,path,commit")
    keys = [(k.strip(), "ascending") for k in spec.split(",") if k.strip()]
    return [(k, d) for k, d in keys if k in columns] or [(columns[0], "ascending")]


class EncoderGroup:
    """Callable class for ``groupby("part_id").map_groups`` — runs in an
    actor pool. Per partition: sort rows (default (repo, path, commit),
    see ``_partition_sort_keys``) for run formation, build ONE FSST
    symbol table from a content sample, chunk,
    auto-select + encode each column per chunk, write the partition's
    parquet atomically, record the manifest entry.

    Reference ancestry: ``nail optimize`` (src/commands/optimize.rs) —
    sort-by + compression + dictionary flags; here actually applied,
    per column, distributed.
    """

    def __init__(self, out_dir: str, chunk_rows: int = 16384, chunk_bytes: int = 8 << 20,
                 prefer_tol: float = 1.02):
        self.out_dir = out_dir
        self.chunk_rows = chunk_rows
        self.chunk_bytes = chunk_bytes
        # structured-codec tie-break margin: within this factor of the
        # measured-smallest trial, pick the lighter codec (random access,
        # fewer zstd bytes on decode) over plain+zstd; kept small so the
        # measured-size criterion stays in charge
        self.prefer_tol = prefer_tol

    @staticmethod
    def _candidates(arr: pa.Array, st: dict) -> list[str]:
        """Stats-gated candidate list (guards against overfitting the
        one-chunk measurement: dict on near-unique strings, rle on
        run-free data)."""
        names = candidates_for(arr)
        sample_n = max(st.get("sample_n", 1), 1)
        if "dict" in names and st["distinct"] / sample_n >= 0.5:
            names.remove("dict")
        if "rle" in names and st["runs"] / max(st["n"], 1) >= 0.7:
            names.remove("rle")
        # fsst only pays off on long-string columns (content); short keys
        # (path/commit/lang) are covered by dict/rle and the trial cost of
        # a wasted fsst pass is real CPU at scale
        if "fsst" in names and (st.get("avg_len", 0) < 48 or entropy_estimate(arr, st) > 7.2):
            names.remove("fsst")
        # front coding pays only when adjacent values share prefixes
        # (sorted keys); skip the trial on long free-text columns
        if "prefix" in names and st.get("avg_len", 0) >= 256:
            names.remove("prefix")
        return names

    def _chunk_bounds(self, content: pa.Array) -> list[tuple[int, int]]:
        n = len(content)
        lens = np.asarray(pc.binary_length(content).cast(pa.int64()))
        csum = np.cumsum(lens)
        bounds = []
        start = 0
        while start < n:
            end = min(start + self.chunk_rows, n)
            base = csum[start - 1] if start else 0
            cut = int(np.searchsorted(csum, base + self.chunk_bytes)) + 1
            end = max(start + 1, min(end, cut))
            bounds.append((start, end))
            start = end
        return bounds or [(0, 0)]

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        part_id = int(group.column("part_id")[0].as_py())
        # belt-and-braces resume guard (normally filtered out upstream)
        if os.path.exists(mf.entry_path(self.out_dir, part_id)) and os.path.exists(
            mf.part_file(self.out_dir, part_id)
        ):
            return self._summary_row(part_id, group.num_rows, 0, 0, 0, t0, "skipped")

        group = group.sort_by(_partition_sort_keys(group.column_names))
        data_cols = [c for c in group.column_names if c != "part_id"]
        group = group.select(data_cols)
        _dx, _ds, _dn = _content_digest_of(group.column("content"))

        # per-partition FSST symbol table from the content sample; stored
        # ONCE in the partition file's schema metadata (not per chunk)
        content = group.column("content").combine_chunks()
        sample_data, _ = fsst_mod.strings_to_buffer(content.slice(0, min(len(content), 2048)))
        table = fsst_mod.build_table(sample_data)
        fsst_codec = codecs.FsstCodec(table=table, embed_table=False)

        bounds = self._chunk_bounds(content)
        out_rows: dict[str, list] = {"part_id": [], "chunk_id": [], "n_rows": []}
        for c in data_cols:
            out_rows[f"{c}__codec"] = []
            out_rows[f"{c}__meta"] = []
            out_rows[f"{c}__payload"] = []

        # per-partition codec choice: trial-encode the FIRST chunk with every
        # candidate, zstd included, pick the measured-smallest (deterministic;
        # recorded in the manifest; resume re-derives identically)
        s0, e0 = bounds[0]
        first = group.slice(s0, e0 - s0)
        chosen: dict[str, str] = {}
        # chunk-0 encodings from the trials are kept and reused below —
        # the chosen codec's first chunk is never encoded twice
        trial_cache: dict[tuple[str, str], tuple[bytes, dict]] = {}
        for c in data_cols:
            arr = first.column(c).combine_chunks()
            st = column_stats(arr)
            trials: list[tuple[str, int]] = []
            n_chunks_est = max(len(bounds), 1)
            table_cost = len(_ZSTD.compress(table.to_bytes())) / n_chunks_est
            for name in self._candidates(arr, st):
                codec = fsst_codec if name == "fsst" else codecs.get(name)
                try:
                    payload, meta = codec.encode(arr)
                except Exception:
                    continue
                trial_cache[(c, name)] = (payload, meta)
                sz = len(_zip_payload(payload)[0])
                if name == "fsst":  # charge the shared table, amortized
                    sz += table_cost
                trials.append((name, sz))
            if not trials:
                chosen[c] = "plain"
            else:
                # within 5% of the measured minimum, prefer the structured
                # codec (select._ORDER: dict < rle < for < prefix < fsst <
                # plain): same bytes, but decode touches fewer zstd bytes /
                # enables random access
                pref = _CODEC_ORDER
                min_sz = min(sz for _, sz in trials)
                ok = [(pref[n], n) for n, sz in trials if sz <= min_sz * self.prefer_tol]
                chosen[c] = min(ok)[1]

        codec_counts: dict[str, dict[str, int]] = {c: {} for c in data_cols}
        input_bytes = 0
        encoded_bytes = 0
        for chunk_id, (s, e) in enumerate(bounds):
            chunk = group.slice(s, e - s)
            out_rows["part_id"].append(part_id)
            out_rows["chunk_id"].append(chunk_id)
            out_rows["n_rows"].append(chunk.num_rows)
            for c in data_cols:
                name = chosen[c]
                if chunk_id == 0 and (c, name) in trial_cache:
                    payload, meta = trial_cache[(c, name)]
                else:
                    arr = chunk.column(c).combine_chunks()
                    codec = fsst_codec if name == "fsst" else codecs.get(name)
                    payload, meta = codec.encode(arr)
                zpayload, raw_len = _zip_payload(payload)
                meta["z"] = raw_len
                if _ENTROPY_NAME != "zstd":
                    meta["zc"] = _ENTROPY_NAME
                out_rows[f"{c}__codec"].append(name)
                out_rows[f"{c}__meta"].append(json.dumps(meta))
                out_rows[f"{c}__payload"].append(zpayload)
                codec_counts[c][name] = codec_counts[c].get(name, 0) + 1
                input_bytes += chunk.column(c).nbytes
                encoded_bytes += len(zpayload)

        schema_fields = [
            pa.field("part_id", pa.int32()),
            pa.field("chunk_id", pa.int32()),
            pa.field("n_rows", pa.int32()),
        ]
        arrays = [
            pa.array(out_rows["part_id"], pa.int32()),
            pa.array(out_rows["chunk_id"], pa.int32()),
            pa.array(out_rows["n_rows"], pa.int32()),
        ]
        for c in data_cols:
            schema_fields += [
                pa.field(f"{c}__codec", pa.string()),
                pa.field(f"{c}__meta", pa.string()),
                pa.field(f"{c}__payload", pa.large_binary()),
            ]
            arrays += [
                pa.array(out_rows[f"{c}__codec"], pa.string()),
                pa.array(out_rows[f"{c}__meta"], pa.string()),
                pa.array(out_rows[f"{c}__payload"], pa.large_binary()),
            ]
        enc_table = pa.Table.from_arrays(arrays, schema=pa.schema(schema_fields, metadata={
            b"nailray_columns": json.dumps(data_cols).encode(),
            b"nailray_version": str(ENC_VERSION).encode(),
            b"nailray_fsst_sha256": table.sha256().encode(),
        }))

        # atomic write; payload columns are already zstd-framed, so parquet
        # page compression is off for them (and cheap zstd for the rest)
        final = mf.part_file(self.out_dir, part_id)
        tmp = final + f".tmp-{os.getpid()}"
        comp = {f.name: ("none" if f.name.endswith("__payload") else "zstd")
                for f in schema_fields}
        # write_statistics=False: parquet min/max stats on binary payload
        # columns would duplicate whole payloads (min==max==the value)
        pq.write_table(enc_table, tmp, compression=comp, use_dictionary=False,
                       row_group_size=8, write_statistics=False)
        os.replace(tmp, final)

        import base64

        tbl_raw = table.to_bytes()
        mf.write_entry(self.out_dir, {
            "part_id": part_id,
            "version": ENC_VERSION,
            # the partition's shared FSST symbol table lives in the manifest
            # (single storage; the chunk payloads reference it by sha256)
            "fsst_table_z_b64": base64.b64encode(bytes(_ZSTD.compress(tbl_raw))).decode(),
            "fsst_table_raw_len": len(tbl_raw),
            "repos": sorted(pc.unique(group.column("repo")).to_pylist()),
            "n_rows": group.num_rows,
            "n_chunks": len(bounds),
            "input_bytes": int(input_bytes),
            "encoded_bytes": int(encoded_bytes),
            "file_bytes": os.path.getsize(final),
            "codec_choices": codec_counts,
            "fsst_table_sha256": table.sha256(),
            # per-partition content fingerprint (order-insensitive per-row
            # sha256 aggregate): enables decode verification per partition
            # without re-reading the input
            "content_digest": {
                "xor": format(_dx, "032x"), "sum": format(_ds, "032x"), "rows": _dn,
            },
            "wall_sec": round(time.time() - t0, 3),
            "status": "encoded",
        })
        return self._summary_row(part_id, group.num_rows, len(bounds), input_bytes,
                                 encoded_bytes, t0, "encoded")

    @staticmethod
    def _summary_row(part_id, n_rows, n_chunks, in_b, out_b, t0, status) -> pa.Table:
        return pa.table({
            "part_id": pa.array([part_id], pa.int32()),
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "input_bytes": pa.array([in_b], pa.int64()),
            "encoded_bytes": pa.array([out_b], pa.int64()),
            "wall_sec": pa.array([round(time.time() - t0, 3)], pa.float64()),
            "status": pa.array([status], pa.string()),
        })


def _encode_group(group: pa.Table, out_dir: str, chunk_rows: int, chunk_bytes: int) -> pa.Table:
    return EncoderGroup(out_dir, chunk_rows, chunk_bytes)(group)


# --------------------------------------------------------------------------
# packed exchange (shuffle optimization)
# --------------------------------------------------------------------------

_PACK_ZSTD = pa.Codec("zstd", compression_level=1)

_PACKED_SCHEMA = pa.schema([
    pa.field("part_id", pa.int32()),
    pa.field("n_rows", pa.int32()),
    pa.field("raw_len", pa.int64()),
    pa.field("payload", pa.large_binary()),
])


class PartitionPacker:
    """Map stage for the exchange: assign part ids, then pack each
    block's rows into ONE zstd-1 Arrow-IPC row per (block, part_id).

    The groupby shuffle then moves ~3× fewer bytes (source text
    compresses ~3.3×) and ~10³× fewer rows — the sort-based exchange
    cost scales with both. The per-partition encoder unpacks before
    encoding; zstd-1 packs at ~400 MB/s/core and unpacks at ~1 GB/s/core,
    far below the exchange savings."""

    def __init__(self, plan: PartitionPlan):
        self.assigner = PartitionAssigner(plan)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.assigner(batch)
        part = np.asarray(t.column("part_id"))
        if len(part) == 0:
            return _PACKED_SCHEMA.empty_table()
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        part = part[order]
        cuts = np.flatnonzero(np.diff(part)) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(part)]])
        pids, nrows, raw_lens, payloads = [], [], [], []
        for s, e in zip(starts, ends):
            sub = t.slice(int(s), int(e - s))
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema) as w:
                w.write_table(sub)
            raw = sink.getvalue()
            pids.append(int(part[s]))
            nrows.append(int(e - s))
            raw_lens.append(len(raw))
            payloads.append(bytes(_PACK_ZSTD.compress(raw)))
        return pa.table({
            "part_id": pa.array(pids, pa.int32()),
            "n_rows": pa.array(nrows, pa.int32()),
            "raw_len": pa.array(raw_lens, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
        })


def _unpack_group(group: pa.Table) -> pa.Table:
    tables = []
    payloads = group.column("payload")
    raw_lens = group.column("raw_len")
    for i in range(group.num_rows):
        raw = _PACK_ZSTD.decompress(payloads[i].as_py(), int(raw_lens[i].as_py()))
        tables.append(pa.ipc.open_stream(raw).read_all())
    return pa.concat_tables(tables, promote_options="default")


def _encode_packed_group(group: pa.Table, out_dir: str, chunk_rows: int,
                         chunk_bytes: int) -> pa.Table:
    return EncoderGroup(out_dir, chunk_rows, chunk_bytes)(_unpack_group(group))


# --------------------------------------------------------------------------
# direct exchange (default): route rows to partitions without a sort
# --------------------------------------------------------------------------
# Why raw Ray tasks here: the Dataset-level exchange is
# groupby("part_id"), which Ray implements as a full SORT — every block
# is rewritten twice (SortMap + SortReduce), pure memcpy overhead when
# only GROUPING is needed. The routing task splits each input fragment's
# rows by part_id directly into the object store (one zero-copy slice
# per (fragment, part)), and each per-partition encode task gathers its
# slices. Partitioning assumption: a partition's rows may come from ANY
# input fragment, so encode waits for all routing tasks (the same
# barrier a shuffle has) — but no sort, no second copy. Measured ~1.3×
# end-to-end vs the sort exchange on the bench corpus.


def _route_file_impl(path: str, plan: PartitionPlan, done: frozenset):
    """Dynamic-return routing task: FIRST yield is the (pid, n_rows)
    manifest, then one yield per partition slice, in that order.

    Returning slices as task outputs (num_returns="dynamic") — instead
    of worker-owned ``ray.put`` objects — makes them driver-owned and
    LINEAGE-RECONSTRUCTABLE: if a worker holding a slice dies before the
    encode task consumes it, Ray re-executes this (deterministic) task
    rather than failing the job."""
    t = pq.read_table(path)
    t = PartitionAssigner(plan)(t)
    part = np.asarray(t.column("part_id"))
    slices = []
    metas = []
    if len(part):
        order = np.argsort(part, kind="stable")
        t = t.take(pa.array(order))
        part = part[order]
        cuts = np.flatnonzero(np.diff(part)) + 1
        starts = np.concatenate([[0], cuts])
        ends = np.concatenate([cuts, [len(part)]])
        for s, e in zip(starts, ends):
            pid = int(part[s])
            if pid in done:
                continue
            metas.append((pid, int(e - s)))
            slices.append(t.slice(int(s), int(e - s)))
    yield metas
    for sub in slices:
        yield sub


def _encode_part_impl(out_dir: str, refs: list, chunk_rows: int, chunk_bytes: int):
    import ray

    tables = ray.get(list(refs))
    t = pa.concat_tables(tables, promote_options="default")
    return EncoderGroup(out_dir, chunk_rows, chunk_bytes)(t).to_pylist()[0]


def _direct_exchange_encode(paths, plan, out_dir, completed, chunk_rows,
                            chunk_bytes) -> list[dict]:
    """Route → gather → encode via raw Ray tasks; returns summary rows."""
    import ray

    route = ray.remote(num_cpus=1, num_returns="dynamic")(_route_file_impl)
    encode = ray.remote(num_cpus=1)(_encode_part_impl)
    plan_ref = ray.put(plan)
    done = frozenset(completed)
    gens = ray.get([route.remote(p, plan_ref, done) for p in paths])
    by_pid: dict[int, list] = {}
    sizes: dict[int, int] = {}
    for gen in gens:
        refs = list(gen)
        metas = ray.get(refs[0])
        for (pid, n_rows), ref in zip(metas, refs[1:]):
            by_pid.setdefault(pid, []).append(ref)
            sizes[pid] = sizes.get(pid, 0) + n_rows
    # largest partitions first: longest-processing-time-first scheduling
    # keeps the final wave from being quantized by one big straggler
    order = sorted(by_pid, key=lambda p: -sizes[p])
    futures = [encode.remote(out_dir, by_pid[pid], chunk_rows, chunk_bytes)
               for pid in order]
    return ray.get(futures)


# --------------------------------------------------------------------------
# driver orchestration
# --------------------------------------------------------------------------

def encode_dataset(
    input_paths,
    out_dir: str,
    *,
    target_partition_bytes: int | None = None,
    chunk_rows: int = 16384,
    chunk_bytes: int = 8 << 20,
    concurrency: int | tuple[int, int] | None = None,
    resume: bool = True,
    exchange: str | None = None,
) -> dict:
    """Run the full encode pipeline; returns a summary dict.

    ``target_partition_bytes=None`` sizes partitions adaptively:
    ~3 partitions per CPU (good load balance without tiny-file
    overhead), clamped to [4 MiB, 256 MiB] — at cluster scale the
    256 MiB cap dominates and bounds per-actor memory.

    ``concurrency`` applies to the sort/packed exchanges' map stage;
    the direct exchange schedules one task per fragment / partition
    (capped by cluster CPUs via num_cpus=1).

    ``exchange=None`` (default) auto-selects like
    :func:`nailray.shuffle.group_map`: ``"direct"`` on a single-node
    cluster (raw-task routing, measured 2.7× faster there but the
    driver holds O(blocks × P) refs), ``"sort"`` on multi-node (Ray's
    streaming sort shuffle — driver metadata O(P), spills under
    pressure). ``"packed"`` additionally zstd-packs the exchange
    payload (the network-bound multi-node option; loses on one box
    where plasma transfers are memcpy)."""
    if exchange is None:
        from ..shuffle import default_exchange

        exchange = default_exchange()
    os.makedirs(out_dir, exist_ok=True)
    paths = _expand_paths(input_paths)

    # one parallel per-file pass yields the fragment lineage AND the
    # planner's per-repo stats (no serial footer loops on the driver)
    stats = _gather_file_stats(paths)
    frags = [{"file": s["file"], "bytes": s["bytes"], "num_rows": s["num_rows"]}
             for s in stats]
    completed = mf.load_completed(out_dir) if resume else {}
    skipped = sorted(completed)

    plan: PartitionPlan | None = None
    if completed:
        # Resume with finished partitions: the stored part_id mapping is
        # LAW. Replanning (e.g. on a different CPU count → different
        # adaptive target) would remap part ids while old completed ids
        # are filtered out before the shuffle — silent row loss/dup.
        stored = mf.load_plan(out_dir)
        if stored is None or "repos" not in stored.get("plan", {}):
            raise RuntimeError(
                f"resume: {out_dir} has completed partitions but no usable "
                "_plan.json — cannot recover the part_id mapping; remove the "
                "output dir (or pass resume=False) to re-encode from scratch")
        same_inputs = (
            [(f["file"], f["num_rows"]) for f in stored.get("input_fragments", [])]
            == [(f["file"], f["num_rows"]) for f in frags])
        if not same_inputs:
            raise RuntimeError(
                "resume: input fragments differ from the stored plan in "
                f"{mf.plan_path(out_dir)} — completed partitions were encoded "
                "from a different input set; remove the output dir to re-encode")
        plan = PartitionPlan.from_json(stored["plan"])
        if (target_partition_bytes is not None
                and int(target_partition_bytes) != plan.target_bytes):
            raise RuntimeError(
                f"resume: requested target_partition_bytes={target_partition_bytes} "
                f"differs from the stored plan's {plan.target_bytes}; the stored "
                "plan governs a resumed run — omit the argument or start fresh")

    if plan is None:
        rows, bts = _merge_repo_stats(stats)
        if target_partition_bytes is None:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
            total = max(sum(bts.values()), 1)
            target_partition_bytes = int(min(max(total / (3 * cpus), 4 << 20), 256 << 20))
        plan = plan_partitions(rows, bts, target_bytes=target_partition_bytes)
        mf.write_plan(out_dir, plan.to_json(), frags)

    if exchange == "direct":
        rows_out = _direct_exchange_encode(paths, plan, out_dir, completed,
                                           chunk_rows, chunk_bytes)
        import pandas as _pd

        summary_rows = _pd.DataFrame(rows_out) if rows_out else _pd.DataFrame(
            {"status": []})
    elif exchange in ("sort", "packed"):
        ds = _read_pq(paths, override_num_blocks=max(_read_blocks(), plan.num_partitions))
        stage_cls = PartitionPacker if exchange == "packed" else PartitionAssigner
        ds = ds.map_batches(stage_cls, fn_constructor_args=(plan,),
                            batch_format="pyarrow",
                            concurrency=concurrency or (1, 16))
        if completed:
            done = pa.array(list(completed), pa.int32())

            def drop_done(batch: pa.Table) -> pa.Table:
                keep = pc.invert(pc.is_in(batch.column("part_id"), value_set=done))
                return batch.filter(keep)

            ds = ds.map_batches(drop_done, batch_format="pyarrow")

        # map_groups wraps fn, so pass a (cheap, picklable) configured instance;
        # the per-partition state (FSST table, codebooks) is built inside the
        # group call — one build per partition, reused across its chunks.
        import functools

        group_fn = _encode_packed_group if exchange == "packed" else _encode_group
        enc = ds.groupby("part_id").map_groups(
            functools.partial(group_fn, out_dir=out_dir, chunk_rows=chunk_rows,
                              chunk_bytes=chunk_bytes),
            batch_format="pyarrow",
            num_cpus=1,
        )
        summary_rows = enc.to_pandas()  # one small row per partition
    else:
        raise ValueError(f"unknown exchange strategy {exchange!r}")
    summary = mf.summarize(out_dir)
    summary["newly_encoded"] = int((summary_rows["status"] == "encoded").sum()) if len(summary_rows) else 0
    summary["resumed_skipped"] = len(skipped)
    summary["num_partitions"] = plan.num_partitions
    summary["split_repos"] = plan.meta.get("split_repos", {})
    return summary


def _encode_fragment_impl(path: str, part_id: int, out_dir: str,
                          chunk_rows: int, chunk_bytes: int) -> dict:
    """One task = one input file encoded as its own partition."""
    t = pq.read_table(path)
    t = t.append_column("part_id", pa.array(
        np.full(t.num_rows, part_id, np.int32)))
    return EncoderGroup(out_dir, chunk_rows, chunk_bytes)(t).to_pylist()[0]


def encode_fragments(
    input_paths,
    out_dir: str,
    *,
    chunk_rows: int = 16384,
    chunk_bytes: int = 8 << 20,
    concurrency=None,
    resume: bool = True,
) -> dict:
    """Shuffle-free encode: partition = input fragment (file).

    Use when the input layout already matches the desired partitioning
    (e.g. a crawl dump written one file per repo group): skips the stats
    pass and the all-to-all exchange entirely — embarrassingly parallel,
    scales with CPUs/nodes until storage bandwidth. Same manifest/resume
    contract as :func:`encode_dataset` (partition id = file index)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = _expand_paths(input_paths)
    completed = mf.load_completed(out_dir) if resume else {}
    frags = [{"file": p, "bytes": os.path.getsize(p), "part_id": i}
             for i, p in enumerate(paths)]
    if completed:
        # part_id = file index: the stored file list is the mapping. A
        # changed input list would silently mis-skip — refuse instead.
        stored = mf.load_plan(out_dir)
        stored_files = [f["file"] for f in (stored or {}).get("input_fragments", [])]
        if stored is None or stored.get("plan", {}).get("mode") != "fragment" \
                or stored_files != paths:
            raise RuntimeError(
                "resume: input file list differs from the stored fragment plan "
                f"in {mf.plan_path(out_dir)} (part_id = file index would remap); "
                "remove the output dir to re-encode from scratch")
    tasks = [{"file": p, "part_id": i} for i, p in enumerate(paths)
             if i not in completed]
    mf.write_plan(out_dir, {"mode": "fragment", "num_partitions": len(paths)}, frags)
    if tasks:
        import ray

        # raw tasks, one per file: no actor-pool sizing, no repartition
        # (a pool reserving every CPU used to risk starving its upstream)
        enc = ray.remote(num_cpus=1)(_encode_fragment_impl)
        ray.get([enc.remote(t["file"], t["part_id"], out_dir,
                            chunk_rows, chunk_bytes) for t in tasks])
    summary = mf.summarize(out_dir)
    summary["newly_encoded"] = len(tasks)
    summary["resumed_skipped"] = len(completed)
    summary["num_partitions"] = len(paths)
    summary["split_repos"] = {}
    return summary


# --------------------------------------------------------------------------
# decode + verify
# --------------------------------------------------------------------------

def decode_chunks(batch: pa.Table, fsst_table=None) -> pa.Table:
    """Decode encoded chunk rows → original rows. ``fsst_table`` is the
    partition's shared symbol table (from the file's schema metadata)."""
    meta = batch.schema.metadata or {}
    data_cols = json.loads(meta.get(b"nailray_columns", b'["repo","path","commit","lang","content"]'))
    fsst_codec = codecs.FsstCodec(table=fsst_table)
    outs = []
    for i in range(batch.num_rows):
        cols = {}
        for c in data_cols:
            name = batch.column(f"{c}__codec")[i].as_py()
            m = json.loads(batch.column(f"{c}__meta")[i].as_py())
            payload = batch.column(f"{c}__payload")[i].as_py()
            if "z" in m:
                payload = _unzip_payload(payload, m["z"], m.get("zc", "zstd"))
            codec = fsst_codec if name == "fsst" else codecs.get(name)
            cols[c] = codec.decode(payload, m)
        outs.append(pa.table(cols))
    return pa.concat_tables(outs, promote_options="default") if outs else pa.table({})


def _table_from_entry(entry: dict | None) -> "fsst_mod.FsstTable | None":
    import base64

    if not entry or "fsst_table_z_b64" not in entry:
        return None
    raw = _unzip_payload(
        base64.b64decode(entry["fsst_table_z_b64"]), int(entry["fsst_table_raw_len"])
    )
    return fsst_mod.FsstTable.from_bytes(raw)


# worker-process-level cache: (open ParquetFile, FSST table) per part
# file. Plain tasks reuse Ray's warm default workers, so this amortizes
# exactly like actor state did — without the actor pool's per-invocation
# startup (a fresh pool re-imports everything: measured 6.7 s vs 2.3 s
# warm for a full sf0.1 decode). Bounded so long-lived workers that see
# thousands of part files don't accumulate open handles.
_DECODE_CACHE: dict[str, tuple] = {}
_DECODE_CACHE_MAX = 64


def _decode_task_batch(batch: pa.Table) -> pa.Table:
    """Stateless decode kernel: one input row = one (file, row-group);
    reads the chunk rows with pyarrow (schema metadata — and thus the
    partition's FSST table — reliably preserved) and decodes them.
    Streaming and distributed: a row group holds a handful of chunks."""
    outs = []
    for task in batch.to_pylist():
        path = task["file"]
        # cache key includes (mtime_ns, size): the cache outlives one
        # decode job (warm workers), so a re-encode to the SAME path in
        # the same Ray session must invalidate the pinned file handle
        # and FSST table or later decodes would serve the old archive
        st = os.stat(path)
        stamp = (st.st_mtime_ns, st.st_size)
        hit = _DECODE_CACHE.get(path)
        if hit is None or hit[0] != stamp:
            if len(_DECODE_CACHE) >= _DECODE_CACHE_MAX:
                _DECODE_CACHE.pop(next(iter(_DECODE_CACHE)))
            out_dir = os.path.dirname(path)
            part_id = int(os.path.basename(path)[len("part-"):-len(".parquet")])
            entry = None
            ep = mf.entry_path(out_dir, part_id)
            if os.path.exists(ep):
                with open(ep) as fh:
                    entry = json.load(fh)
            hit = _DECODE_CACHE[path] = (
                stamp, pq.ParquetFile(path), _table_from_entry(entry))
        _, pf, tab = hit
        t = pf.read_row_group(task["rg"])
        outs.append(decode_chunks(t, fsst_table=tab))
    return pa.concat_tables(outs, promote_options="default")


def decode_dataset(enc_dir: str, concurrency=None) -> rd.Dataset:
    files = sorted(
        os.path.join(enc_dir, f) for f in os.listdir(enc_dir) if f.endswith(".parquet")
    )
    tasks = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            tasks.append({"file": f, "rg": rg})
    task_ds = rd.from_arrow(pa.Table.from_pylist(tasks)).repartition(len(tasks))
    kw = {"concurrency": concurrency} if concurrency else {}
    return task_ds.map_batches(
        _decode_task_batch,
        batch_size=1,
        batch_format="pyarrow",
        **kw,
    )


def _content_digest_of(col: pa.ChunkedArray | pa.Array) -> tuple[int, int, int]:
    """(xor, sum, rows) of per-row sha256 prefixes over a content column."""
    from .codecs.base import strings_to_buffer

    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    col = pc.if_else(pc.is_valid(col), col, "")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    data, lengths = strings_to_buffer(col)
    mv = memoryview(data)
    offsets = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    x = 0
    s = 0
    for i in range(len(lengths)):
        h = int.from_bytes(hashlib.sha256(mv[offsets[i]:offsets[i + 1]]).digest()[:16], "big")
        x ^= h
        s = (s + h) % (1 << 128)
    return x, s, len(lengths)


def _sha_digest_partial(batch: pa.Table) -> pa.Table:
    """Order-insensitive content fingerprint: XOR + sum of per-row
    sha256(content) prefixes, plus row count — mergeable across blocks.

    Hashes the Arrow utf-8 data buffer directly (memoryview slices) —
    no per-row Python string materialization/re-encode."""
    x, s, _n = _content_digest_of(batch.column("content"))
    return pa.table({
        "xor": pa.array([format(x, "032x")]),
        "sum": pa.array([format(s, "032x")]),
        "rows": pa.array([batch.num_rows], pa.int64()),
    })


def content_digest(ds: rd.Dataset) -> dict:
    x = 0
    s = 0
    rows = 0
    parts = ds.map_batches(_sha_digest_partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for xs, ss, n in zip(b["xor"].to_pylist(), b["sum"].to_pylist(), b["rows"].to_pylist()):
            x ^= int(xs, 16)
            s = (s + int(ss, 16)) % (1 << 128)
            rows += int(n)
    return {"xor": format(x, "032x"), "sum": format(s, "032x"), "rows": rows}


def verify_bit_identity(input_paths, enc_dir: str) -> dict:
    """decode(encode(T)).content ≡ T.content as a multiset of per-row
    sha256 — the north_rule invariant, computed streaming on both sides."""
    din = content_digest(_read_pq(input_paths, columns=["content"]))
    dout = content_digest(decode_dataset(enc_dir))
    ok = din == dout
    return {"match": ok, "input": din, "decoded": dout}


def verify_partitions(enc_dir: str) -> dict:
    """Partition-level decode verification against the manifest digests
    recorded at encode time — no input re-read needed.

    Decodes every partition file, recomputes the order-insensitive
    per-row sha256 aggregate, compares it to the partition's manifest
    ``content_digest``, and writes the outcome (+decode wall) back into
    the manifest entry (the north_rule's "encode/decode metrics")."""
    completed = mf.load_completed(enc_dir)
    files = {pid: mf.part_file(enc_dir, pid) for pid in completed}

    class _VerifyPart:
        def __init__(self):
            self._dec = _decode_task_batch

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows = []
            for task in batch.to_pylist():
                t0 = time.time()
                pid = task["part_id"]
                sub = pa.table({"file": pa.array([task["file"]] * task["n_rg"]),
                                "rg": pa.array(list(range(task["n_rg"])))})
                try:
                    decoded = self._dec(sub)
                    x, s, n = _content_digest_of(decoded.column("content"))
                    row = {"part_id": pid, "xor": format(x, "032x"),
                           "sum": format(s, "032x"), "rows": n}
                except Exception as e:  # corrupt payload → verification failure
                    row = {"part_id": pid, "xor": "", "sum": "", "rows": -1,
                           "error": f"{type(e).__name__}: {e}"[:200]}
                row.setdefault("error", "")
                row["decode_sec"] = round(time.time() - t0, 3)
                rows.append(row)
            return pa.Table.from_pylist(rows)

    tasks = [{"part_id": pid, "file": f,
              "n_rg": pq.ParquetFile(f).metadata.num_row_groups}
             for pid, f in files.items()]
    if not tasks:
        return {"partitions": 0, "verified": 0, "failed": []}
    task_ds = rd.from_arrow(pa.Table.from_pylist(tasks)).repartition(len(tasks))
    results = task_ds.map_batches(_VerifyPart, batch_size=1, batch_format="pyarrow",
                                  concurrency=(1, 8)).take_all()
    failed = []
    for r in results:
        e = completed[r["part_id"]]
        want = e.get("content_digest", {})
        ok = (not r.get("error") and want.get("xor") == r["xor"]
              and want.get("sum") == r["sum"] and want.get("rows") == r["rows"])
        e["decode_verify"] = {"ok": bool(ok), "decode_sec": r["decode_sec"],
                              "error": r.get("error", "")}
        mf.write_entry(enc_dir, e)
        if not ok:
            failed.append(r["part_id"])
    return {"partitions": len(results), "verified": len(results) - len(failed),
            "failed": failed}
