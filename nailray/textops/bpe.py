"""Distributed BPE (byte-pair-encoding) vocabulary training.

Classic BPE (Sennrich et al. 2016) trains on the DISTINCT-WORD
frequency table, not the raw corpus — so the iterated state here is a
Dataset of ``(symbols: list<string>, cnt)`` rows, one per distinct
word (Zipf-small next to the corpus; still sharded, never collected).
Each merge round is:

1. pair counts: per-block vectorized adjacent-pair extraction over the
   flattened symbol buffer → ``grouped_agg`` sum (the only exchange —
   one row per (block, distinct pair) moves);
2. winner: partial top-1 by (count DESC, pair ASC) — one row to the
   driver (the merge table is the ONLY driver state, n_merges rows);
3. apply: one vectorized pass rewrites the symbol lists (run-aware
   non-overlapping left-to-right merge, the same semantics as the
   sequential reference) and re-materializes the word table.

Rounds are O(n_merges) narrow exchanges; nothing per-word ever lands
on the driver. Equivalence with a sequential reference implementation
(identical merge SEQUENCE, not just the final vocab) is asserted in
tests/test_bpe.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def words_with_counts(ds: rd.Dataset, text_col: str = "text",
                      num_partitions: int | None = None) -> rd.Dataset:
    """Distinct-word frequency table ``(word, cnt)`` — whitespace
    tokenization shared with :func:`~.analysis.whitespace_tokens`'
    identity (split on ``\\s+``, empty tokens dropped)."""
    from ..shuffle import grouped_agg
    from .analysis import whitespace_tokens

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = whitespace_tokens(b.column(text_col))
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.select_columns([text_col]) \
                 .map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, ["word"], {"cnt": ("cnt", "sum")},
                       num_partitions=num_partitions)


def _explode_chars(b: pa.Table) -> pa.Table:
    """(word, cnt) → (symbols=list<codepoint>, cnt). ASCII words (the
    common case after whitespace tokenization of web text) split via a
    zero-copy byte-buffer view ('S1' → 'U1', one numpy pass); words
    with multi-byte codepoints fall back to a per-word Python split —
    this runs ONCE per training job over the distinct-word table."""
    w = pc.fill_null(b.column("word"), "")
    w = w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w
    n = len(w)
    lens_np = np.asarray(pc.utf8_length(w)).astype(np.int64)

    from ..encode.codecs.base import strings_to_buffer

    data, byte_lens = strings_to_buffer(w)
    # fast path requires one char == one byte AND no NUL bytes (numpy
    # 'S1'→'U1' silently maps b'\\x00' to '', which would corrupt the
    # symbol stream and break merge-sequence identity)
    if (byte_lens == lens_np).all() and not (data == 0).any():
        chars = pa.array(data.view("S1").astype("U1"), pa.string())
    else:
        chars = pa.array([c for word in w.to_pylist() for c in word],
                         pa.string())
    starts = np.zeros(n + 1, np.int64)
    np.cumsum(lens_np, out=starts[1:])
    sym = pa.ListArray.from_arrays(pa.array(starts, pa.int32()), chars)
    return pa.table({"symbols": sym, "cnt": b.column("cnt")})


def _pair_counts(b: pa.Table) -> pa.Table:
    """Adjacent-symbol pair rows for one block — one (a, b, word_cnt)
    row per pair occurrence, fully vectorized over the flattened symbol
    buffer; the downstream grouped_agg partial pre-combines per block."""
    col = b.column("symbols")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = pc.list_flatten(col)
    parents = np.asarray(pc.list_parent_indices(col)).astype(np.int64)
    nf = len(flat)
    if nf < 2:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    same = parents[1:] == parents[:-1]
    cnt = np.asarray(b.column("cnt")).astype(np.int64)[parents[:-1]]
    a = flat.slice(0, nf - 1).filter(pa.array(same))
    bb = flat.slice(1, nf - 1).filter(pa.array(same))
    # raw (a, b, cnt) rows — grouped_agg's partial stage pre-combines
    # per block anyway (Ray fuses the two map stages into one task), so
    # a groupby here would just group the same stream twice
    return pa.table({"a": a, "b": bb,
                     "cnt": pa.array(cnt[same], pa.int64())})


def _apply_merge(b: pa.Table, left: str, right: str,
                 return_affected: bool = False):
    """Rewrite symbol lists merging non-overlapping left-to-right
    occurrences of (left, right) — vectorized run resolution: in a run
    of consecutive matches (e.g. 'aaaa' under merge ('a','a')), keep
    every other match starting from the run head, exactly like the
    sequential scan. With ``return_affected`` also returns the np array
    of row indices whose symbol list changed (None if none did) — the
    hook the incremental delta pass builds on."""
    col = b.column("symbols")
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = pc.list_flatten(col)
    parents = np.asarray(pc.list_parent_indices(col)).astype(np.int64)
    nf = len(flat)
    n_rows = len(col)
    if nf < 2:
        return (b, None) if return_affected else b
    same = parents[1:] == parents[:-1]
    m = (np.asarray(pc.equal(flat.slice(0, nf - 1), left)).astype(bool)
         & np.asarray(pc.equal(flat.slice(1, nf - 1), right)).astype(bool)
         & same)
    if not m.any():
        return (b, None) if return_affected else b
    # left-to-right non-overlap: position within each run of consecutive
    # matches; keep even positions
    idx = np.arange(nf - 1)
    run_start = m & ~np.concatenate([[False], m[:-1]])
    last_start = np.maximum.accumulate(np.where(run_start, idx, -1))
    keep_merge = m & ((idx - last_start) % 2 == 0)
    # within a run, a kept merge at i consumes i+1, so the NEXT kept
    # candidate must be i+2 — even positions achieve exactly that
    merged_at = np.flatnonzero(keep_merge)
    drop = np.zeros(nf, bool)
    drop[merged_at + 1] = True
    is_merged = np.zeros(nf, bool)
    is_merged[merged_at] = True
    new_flat = pc.if_else(pa.array(is_merged), pa.scalar(left + right),
                          flat).filter(pa.array(~drop))
    new_parents = parents[~drop]
    counts = np.bincount(new_parents, minlength=n_rows)
    offsets = np.zeros(n_rows + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    sym = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                   new_flat.combine_chunks()
                                   if isinstance(new_flat, pa.ChunkedArray)
                                   else new_flat)
    out = pa.table({"symbols": sym, "cnt": b.column("cnt")})
    if return_affected:
        return out, np.unique(parents[merged_at])
    return out


def _apply_merge_with_delta(b: pa.Table, left: str, right: str):
    """One merge over a block plus the EXACT pair-count delta it causes:
    ``(new_table, delta_table(a, b, cnt) | None)``. Only the words whose
    symbol list actually changed are diffed (pair counts before vs after
    over that small subset) — the vectorized form of Sennrich's
    incremental update, where a merge touches only words containing the
    pair."""
    new_b, affected = _apply_merge(b, left, right, return_affected=True)
    if affected is None:
        return b, None
    mask = np.zeros(b.num_rows, bool)
    mask[affected] = True
    am = pa.array(mask)
    before = _pair_counts(b.filter(am))
    neg = before.set_column(
        before.column_names.index("cnt"), "cnt",
        pc.negate(before.column("cnt")))
    # Arrow group_by, NOT pandas: pandas' string-key hash truncates at
    # the first NUL byte, silently folding e.g. ('a','\\x00') with
    # ('a','\\x00b'); Arrow strings are length-prefixed
    d = pa.concat_tables([_pair_counts(new_b.filter(am)), neg]) \
          .group_by(["a", "b"]).aggregate([("cnt", "sum")])
    d = d.filter(pc.not_equal(d.column("cnt_sum"), 0))
    if d.num_rows == 0:
        return new_b, None
    return new_b, pa.table({"a": d.column("a"), "b": d.column("b"),
                            "cnt": pc.cast(d.column("cnt_sum"), pa.int64())})


_SYM_T = pa.list_(pa.string())


def _batch_apply_kernel(b: pa.Table, merges: list[tuple[str, str]],
                        want_deltas: bool) -> pa.Table:
    """Apply ``merges`` SEQUENTIALLY to one block (per-word semantics
    make local sequential application equal global sequential
    application). With ``want_deltas`` the output is a tagged union:
    word rows (symbols, cnt; step null) plus per-step pair-delta rows
    (step, a, b, delta; symbols null) — one heavy pass produces both the
    new table and the evidence the driver needs to validate the
    speculative batch."""
    tbl = (b.select(["symbols", "cnt"])
           if b.column_names != ["symbols", "cnt"] else b)
    parts: list[pa.Table] = []
    for step, (l, r) in enumerate(merges):
        if want_deltas:
            tbl, delta = _apply_merge_with_delta(tbl, l, r)
            if delta is not None:
                parts.append(delta.append_column(
                    "step", pa.array([step] * delta.num_rows, pa.int64())))
        else:
            tbl = _apply_merge(tbl, l, r)
    if not want_deltas:
        return tbl
    n = tbl.num_rows
    sym = tbl.column("symbols")
    sym = sym.combine_chunks() if isinstance(sym, pa.ChunkedArray) else sym
    words_u = pa.table({
        "symbols": sym.cast(_SYM_T),
        "cnt": pc.cast(tbl.column("cnt"), pa.int64()),
        "step": pa.nulls(n, pa.int64()),
        "a": pa.nulls(n, pa.string()),
        "b": pa.nulls(n, pa.string()),
        "delta": pa.nulls(n, pa.int64()),
    })
    if not parts:
        return words_u
    d = pa.concat_tables(parts)
    m = d.num_rows
    delta_u = pa.table({
        "symbols": pa.nulls(m, _SYM_T),
        "cnt": pa.nulls(m, pa.int64()),
        "step": d.column("step"),
        "a": d.column("a"),
        "b": d.column("b"),
        "delta": d.column("cnt"),
    })
    return pa.concat_tables([words_u, delta_u])


def _union_words(t: pa.Table) -> pa.Table:
    w = t.filter(pc.is_null(t.column("step")))
    return pa.table({"symbols": w.column("symbols"), "cnt": w.column("cnt")})


def _union_deltas(t: pa.Table) -> pa.Table:
    d = t.filter(pc.is_valid(t.column("step")))
    return pa.table({"step": d.column("step"), "a": d.column("a"),
                     "b": d.column("b"), "delta": d.column("delta")})


class _BPEShard:
    """One shard of the distinct-word table held in an actor for the
    merge-round loop of :func:`bpe_train`.  BPE training is thousands
    of tiny global-argmax rounds; a ``map_batches`` stage costs ~0.2 s
    of fixed scheduling per round regardless of data size, so the
    iterated state lives in an actor pool instead (the one shape the
    Dataset API can't express: shared mutable state across rounds) and
    each round is ONE actor round-trip of a few ms.  The driver only
    ever sees pair-count DELTAS (bounded by affected pair types), never
    word rows — the same wire contract as the Dataset path.

    ``probe(merges, commit_prev)`` first commits the validated prefix
    of the PREVIOUS probe (fusing commit+probe into one round-trip),
    then speculatively applies ``merges`` sequentially to its shard and
    returns the per-step exact pair-count deltas
    (:func:`_apply_merge_with_delta`); the driver replays them against
    its counts dict to find the longest prefix that preserves the exact
    greedy order.

    Correctness note: shards receive PER-BLOCK word-count partials, so
    the same word can appear in several shards (each shard dedups only
    its own slice).  Pair counts and per-merge deltas are ADDITIVE
    across duplicate word rows and merges apply per word, so the folded
    global counts — and hence the greedy merge sequence — are identical
    to the fully-deduped table.  Skipping the global distinct-word
    exchange removes the dominant fixed setup cost (~5 s at sf0.1)."""

    def __init__(self):
        self.tbl = pa.table({"symbols": pa.array([], _SYM_T),
                             "cnt": pa.array([], pa.int64())})
        self._probe_merges: list | None = None
        self._probe_tbl: pa.Table | None = None

    def release(self) -> None:
        """Drop shard state so a pooled (session-cached) actor holds no
        memory between trainings."""
        self.__init__()

    def load(self, refs) -> pa.Table | None:
        """Take (word, cnt) partial blocks, dedup locally, explode to
        symbol lists, and return this shard's grouped pair-count
        partial (the driver folds these instead of running a global
        pair exchange)."""
        import ray

        self._probe_merges = None
        self._probe_tbl = None
        tables = [t for t in ray.get(list(refs)) if t.num_rows]
        if not tables:
            return None
        w = pa.concat_tables(tables).group_by(["word"]) \
              .aggregate([("cnt", "sum")])
        self.tbl = _explode_chars(pa.table({
            "word": w.column("word"),
            "cnt": pc.cast(w.column("cnt_sum"), pa.int64())}))
        p = _pair_counts(self.tbl).group_by(["a", "b"]) \
                                  .aggregate([("cnt", "sum")])
        return pa.table({"a": p.column("a"), "b": p.column("b"),
                         "cnt": pc.cast(p.column("cnt_sum"), pa.int64())})

    def _commit(self, k: int) -> None:
        if self._probe_merges is None:
            return
        if k >= len(self._probe_merges):
            self.tbl = self._probe_tbl
        elif k > 0:
            # misprediction: re-apply just the validated prefix locally
            # (no Ray round-trip; typical mispredict prefixes are short)
            self.tbl = _batch_apply_kernel(self.tbl,
                                           self._probe_merges[:k],
                                           want_deltas=False)
        self._probe_merges = None
        self._probe_tbl = None

    def probe(self, merges: list[tuple[str, str]],
              commit_prev: int | None = None) -> pa.Table | None:
        if commit_prev is not None:
            self._commit(commit_prev)
        tbl = self.tbl
        parts: list[pa.Table] = []
        for step, (left, right) in enumerate(merges):
            tbl, delta = _apply_merge_with_delta(tbl, left, right)
            if delta is not None:
                parts.append(delta.append_column(
                    "step", pa.array([step] * delta.num_rows, pa.int64())))
        self._probe_merges = list(merges)
        self._probe_tbl = tbl
        return pa.concat_tables(parts) if parts else None


_SHARD_POOL: list = []


def _shard_pool(n: int) -> list:
    """Session-cached :class:`_BPEShard` actors — spawning a fresh
    actor process costs ~0.1 s each, which dominates small trainings
    if paid per call; a long-lived cluster amortizes the pool the same
    way.  Grows to the largest ``n`` ever requested; ``load`` resets
    per-training state, ``release`` frees shard memory between calls.
    The pool dies with the Ray session."""
    import ray

    while len(_SHARD_POOL) < n:
        Shard = ray.remote(num_cpus=0)(_BPEShard)
        _SHARD_POOL.append(Shard.remote())
    return _SHARD_POOL[:n]


def _drop_shard_pool() -> None:
    import ray

    while _SHARD_POOL:
        try:
            ray.kill(_SHARD_POOL.pop())
        except Exception:
            pass


def _heap_best(counts: dict, heap: list):
    """Exact argmax under (count DESC, pair ASC) via the lazy max-heap —
    stale entries (count changed or pair deleted) are discarded on pop."""
    import heapq

    while heap:
        c, a, b = heap[0]
        if counts.get((a, b)) == -c:
            return a, b
        heapq.heappop(heap)
    return None


def _heap_top_k(counts: dict, heap: list, k: int) -> list[tuple[str, str, int]]:
    import heapq

    out, stash = [], []
    while heap and len(out) < k:
        c, a, b = heapq.heappop(heap)
        if counts.get((a, b)) == -c:
            out.append((a, b, -c))
            stash.append((c, a, b))
        # stale entries are dropped for good
    for e in stash:
        heapq.heappush(heap, e)
    return out


def bpe_train(ds: rd.Dataset, text_col: str = "text", n_merges: int = 50,
              min_count: int = 2, num_partitions: int | None = None,
              batch_merges: int = 16, use_actors: bool = True,
              driver_pairs_budget: int = 5_000_000) -> list[tuple[str, str, int]]:
    """Train a BPE merge table over the corpus: returns
    ``[(left, right, count), ...]`` in merge order (deterministic
    tie-break: count DESC, then (left, right) ascending — the merge
    SEQUENCE is identical to the sequential reference, asserted in
    tests/test_bpe.py).  Stops early when the best pair's count falls
    below ``min_count``.

    Incremental + batched (the fix for full-recount-per-merge): pair
    counts are exchanged ONCE, then held on the driver as a dict + lazy
    max-heap (size = distinct adjacent-pair TYPES — alphabet² + O(new
    pairs per merge), orders of magnitude below the distinct-word
    table; guarded by ``driver_pairs_budget`` with fallback to the
    per-round-recount path).  Each round speculatively picks the top-K
    candidates from exact current counts and runs ONE distributed pass
    that applies them sequentially per block while emitting exact
    per-step pair-count deltas from only the affected words
    (:func:`_apply_merge_with_delta`).  The driver then replays the
    steps, checking each candidate is still the true argmax after the
    previous steps' deltas — a full-valid batch costs ~2 Ray stages for
    K merges; a misprediction (a newly created pair outranking the next
    candidate) re-applies just the valid prefix from the kept old
    table.  K adapts (doubles on full success, halves on misprediction)
    so the per-merge stage cost is amortized ~K-fold while the merge
    sequence stays EXACTLY sequential.

    With ``use_actors`` (the default) the iterated word table lives
    SHARDED IN AN ACTOR POOL (:class:`_BPEShard`) instead of a Dataset:
    profiling showed the Dataset round costs ~0.2 s of fixed stage
    scheduling regardless of data size, and natural-language corpora
    mispredict constantly (each merge creates the next argmax —
    ('t','h') → ('th','e')), so rounds can't amortize below ~1.3
    merges each.  An actor round-trip is a few ms, cutting the
    per-merge fixed cost ~20×; mispredictions become nearly free (the
    validated prefix re-applies inside the actor, no extra stage).
    The pool is SESSION-CACHED (:func:`_shard_pool`) — process spawn
    (~1-3 s for a full pool) is paid once, not per training — and a
    cold call asking for ≤12 merges takes the pure-Dataset path
    instead, which beats a cold spawn.  ``use_actors=False`` forces
    the pure-Dataset union path.

    Scale shape: the word table stays sharded (actors or Dataset
    blocks); per round one delta exchange (O(affected pair types)) and
    a few KB of delta rows to the driver."""
    import functools
    import heapq

    from ..shuffle import grouped_agg

    merges: list[tuple[str, str, int]] = []
    counts: dict[tuple[str, str], int] = {}
    actors: list = []
    # Cold-start policy: a fresh actor pool costs ~1-3 s of process
    # spawn; a tiny training (few merges) is cheaper through the pure-
    # Dataset path unless the session pool is already warm.
    if use_actors and not _SHARD_POOL and n_merges <= 12:
        use_actors = False
    if use_actors:
        import ray

        from .analysis import whitespace_tokens

        # acquire shard actors FIRST (session-cached pool — spawn once
        # per session; any fresh process startup overlaps the tokenize
        # pass below).  num_cpus=0: the shards must NEVER hold CPU
        # slots, or they starve the Dataset tokenize pass (deadlock on
        # small clusters).  Per-round probe work is ms-scale; the one
        # heavy call (load) tolerates oversubscription.
        n_act = max(1, min(64, int(ray.cluster_resources()
                                   .get("CPU", 8))))
        actors = _shard_pool(n_act)

        def word_partial(b: pa.Table) -> pa.Table:
            flat, _ = whitespace_tokens(b.column(text_col))
            vc = pc.value_counts(flat)
            return pa.table({"word": vc.field("values"),
                             "cnt": pc.cast(vc.field("counts"),
                                            pa.int64())})

        refs = ds.select_columns([text_col]) \
                 .map_batches(word_partial, batch_format="pyarrow") \
                 .to_arrow_refs()
        if len(refs) < len(actors):
            actors = actors[:max(1, len(refs))]
        for attempt in (0, 1):
            try:
                pair_parts = ray.get([a.load.remote(refs[i::len(actors)])
                                      for i, a in enumerate(actors)])
                break
            except Exception:
                # dead actors — e.g. the cached pool outlived a
                # ray.shutdown()/ray.init() cycle. Drop it; on the
                # first failure respawn fresh and retry once.
                _drop_shard_pool()
                if attempt:
                    raise
                actors = _shard_pool(n_act)
                if len(refs) < len(actors):
                    actors = actors[:max(1, len(refs))]
        for p in pair_parts:
            if p is None:
                continue
            for a, b, c in zip(p.column("a").to_pylist(),
                               p.column("b").to_pylist(),
                               p.column("cnt").to_pylist()):
                counts[(a, b)] = counts.get((a, b), 0) + int(c)
            if len(counts) > driver_pairs_budget:
                break
        if not counts:
            for a in actors:
                a.release.remote()
            return merges
        if len(counts) > driver_pairs_budget:
            # pathological alphabet (pair-type table too big for the
            # driver): per-round recount + partial top-1 over a Dataset
            for a in actors:
                a.release.remote()
            table = words_with_counts(ds, text_col,
                                      num_partitions=num_partitions) \
                .map_batches(_explode_chars,
                             batch_format="pyarrow").materialize()
            return _bpe_train_recount(table, n_merges, min_count,
                                      num_partitions)
    if not use_actors:
        words = words_with_counts(ds, text_col,
                                  num_partitions=num_partitions)
        table = words.map_batches(_explode_chars,
                                  batch_format="pyarrow").materialize()
        if table.count() == 0:
            return merges
        counts_ds = grouped_agg(
            table.map_batches(_pair_counts, batch_format="pyarrow"),
            ["a", "b"], {"cnt": ("cnt", "sum")},
            num_partitions=num_partitions).materialize()
        if counts_ds.count() > driver_pairs_budget:
            return _bpe_train_recount(table, n_merges, min_count,
                                      num_partitions)
        for blk in counts_ds.iter_batches(batch_format="pyarrow"):
            for a, b, c in zip(blk.column("a").to_pylist(),
                               blk.column("b").to_pylist(),
                               blk.column("cnt").to_pylist()):
                counts[(a, b)] = int(c)
    heap = [(-c, a, b) for (a, b), c in counts.items()]
    heapq.heapify(heap)

    def fold_delta(rows) -> None:
        for a, b, d in rows:
            key = (a, b)
            nc = counts.get(key, 0) + int(d)
            if nc <= 0:
                counts.pop(key, None)
            else:
                counts[key] = nc
                heapq.heappush(heap, (-nc, a, b))

    def validate(cands: list[tuple[str, str]], by_step: dict[int, list]):
        """Longest candidate prefix that preserves exact greedy order,
        folding each accepted step's deltas into the counts dict."""
        accepted, exhausted = 0, False
        for i, (l, r) in enumerate(cands):
            best = _heap_best(counts, heap)
            if best is None or counts[best] < min_count:
                exhausted = True
                break
            if best != (l, r):
                break  # a created pair outranked this candidate
            merges.append((l, r, counts[best]))
            fold_delta(by_step.get(i, []))
            accepted += 1
        return accepted, exhausted

    k = max(1, batch_merges)
    if use_actors:
        commit_prev: int | None = None
        try:
            while len(merges) < n_merges:
                cands = _heap_top_k(counts, heap,
                                    min(k, n_merges - len(merges)))
                cands = [(a, b) for a, b, c in cands if c >= min_count]
                if not cands:
                    break
                deltas = ray.get([a.probe.remote(cands, commit_prev)
                                  for a in actors])
                by_step: dict[int, list] = {}
                for d in deltas:
                    if d is None:
                        continue
                    for s, a, b, dd in zip(d.column("step").to_pylist(),
                                           d.column("a").to_pylist(),
                                           d.column("b").to_pylist(),
                                           d.column("cnt").to_pylist()):
                        by_step.setdefault(int(s), []).append((a, b, dd))
                accepted, exhausted = validate(cands, by_step)
                if exhausted:
                    return merges
                commit_prev = accepted
                k = (min(k * 2, 64) if accepted == len(cands)
                     else max(1, k // 2))
        except Exception:
            _drop_shard_pool()
            raise
        finally:
            if _SHARD_POOL:
                for a in actors:
                    a.release.remote()
        return merges

    while len(merges) < n_merges:
        cands = _heap_top_k(counts, heap, min(k, n_merges - len(merges)))
        cands = [(a, b) for a, b, c in cands if c >= min_count]
        if not cands:
            break
        union = table.map_batches(
            functools.partial(_batch_apply_kernel, merges=cands,
                              want_deltas=True),
            batch_format="pyarrow").materialize()
        by_step: dict[int, list] = {}
        for blk in union.map_batches(_union_deltas, batch_format="pyarrow") \
                        .iter_batches(batch_format="pyarrow"):
            for s, a, b, d in zip(blk.column("step").to_pylist(),
                                  blk.column("a").to_pylist(),
                                  blk.column("b").to_pylist(),
                                  blk.column("delta").to_pylist()):
                by_step.setdefault(int(s), []).append((a, b, d))
        accepted, exhausted = validate(cands, by_step)
        if exhausted:
            return merges
        if accepted == len(cands):
            table = union.map_batches(_union_words,
                                      batch_format="pyarrow")
            k = min(k * 2, 64)
        else:
            # misprediction: re-apply only the validated prefix from
            # the kept pre-batch table
            if accepted:
                table = table.map_batches(
                    functools.partial(_batch_apply_kernel,
                                      merges=cands[:accepted],
                                      want_deltas=False),
                    batch_format="pyarrow").materialize()
            k = max(1, k // 2)
    return merges


def _bpe_train_recount(table: rd.Dataset, n_merges: int, min_count: int,
                       num_partitions: int | None) -> list[tuple[str, str, int]]:
    """Per-round full pair recount + partial top-1 — the pre-incremental
    loop, kept as the fallback when the pair-type table exceeds the
    driver budget. One exchange per merge; data-scale-safe (nothing
    per-word on the driver) but with a fixed per-merge stage cost."""
    import functools

    from ..ops.sorting import topk
    from ..shuffle import grouped_agg

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = grouped_agg(
            table.map_batches(_pair_counts, batch_format="pyarrow"),
            ["a", "b"], {"cnt": ("cnt", "sum")},
            num_partitions=num_partitions)
        top = topk(counts, ["cnt", "a", "b"], 1,
                   descending=[True, False, False]).take_all()
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((left, right, cnt))
        table = table.map_batches(
            functools.partial(_apply_merge, left=left, right=right),
            batch_format="pyarrow").materialize()
    return merges


def bpe_pair_counts(ds: rd.Dataset, text_col: str = "text", k: int = 20,
                    num_partitions: int | None = None) -> rd.Dataset:
    """Top-``k`` adjacent-CHARACTER pairs over the distinct-word
    frequency table (count DESC, pair ASC) — round 0 of BPE training as
    a standalone oracled query (the full iterative trainer is
    :func:`bpe_train`; its later rounds depend on applied merges and
    are checked against the sequential reference instead)."""
    from ..ops.sorting import topk
    from ..shuffle import grouped_agg

    words = words_with_counts(ds, text_col,
                              num_partitions=num_partitions).materialize()
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})
    if words.count() == 0:  # empty corpus: no schema for topk to sort
        return rd.from_arrow(empty)
    pairs = words.map_batches(_explode_chars, batch_format="pyarrow") \
                 .map_batches(_pair_counts, batch_format="pyarrow")
    counts = grouped_agg(pairs, ["a", "b"], {"cnt": ("cnt", "sum")},
                         num_partitions=num_partitions)
    return topk(counts, ["cnt", "a", "b"], k, descending=[True, False, False])


def bpe_alphabet(ds: rd.Dataset, text_col: str = "text",
                 num_partitions: int | None = None) -> list[str]:
    """Sorted distinct characters appearing in the corpus's whitespace
    tokens — the base vocabulary for :func:`bpe_encode` when the caller
    doesn't pin one.  One distributed distinct exchange; the result is
    bounded by the alphabet size (|Unicode| worst case, dozens
    typically), so collecting it on the driver is safe."""
    from ..shuffle import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        flat, _ = whitespace_tokens_of(b, text_col)
        # distinct words first: a char's presence is all we need, and
        # the distinct-word table is far smaller than the token stream
        dwords = pc.unique(flat)
        chars = _explode_chars(pa.table({
            "word": dwords,
            "cnt": pa.array(np.ones(len(dwords), np.int64))}))
        dchars = pc.unique(pc.list_flatten(chars.column("symbols")))
        return pa.table({"ch": dchars})

    distinct = grouped_agg(
        ds.select_columns([text_col]).map_batches(partial,
                                                  batch_format="pyarrow"),
        ["ch"], {"n": ("ch", "size")}, num_partitions=num_partitions)
    out: list[str] = []
    for b in distinct.iter_batches(batch_format="pyarrow"):
        out.extend(b.column("ch").to_pylist())
    return sorted(out)


def whitespace_tokens_of(b: pa.Table, text_col: str):
    from .analysis import whitespace_tokens

    return whitespace_tokens(b.column(text_col))


def bpe_vocab(merges, alphabet: list[str]) -> tuple[dict[str, int], list[str]]:
    """Token-string → id mapping: base characters (in the given order)
    take ids ``0..len(alphabet)-1``, merge products take
    ``len(alphabet) + merge_index``.  Two merges producing the same
    STRING (e.g. ('a','bc') and ('ab','c') → 'abc') share the first
    id — token identity is the string, the GPT-2/Sennrich convention.
    Returns ``(str → id, id → str list)``."""
    vocab: dict[str, int] = {}
    id2tok: list[str] = []
    for ch in alphabet:
        if ch not in vocab:
            vocab[ch] = len(id2tok)
            id2tok.append(ch)
    for m in merges:
        prod = m[0] + m[1]
        if prod not in vocab:
            vocab[prod] = len(id2tok)
            id2tok.append(prod)
    return vocab, id2tok


def bpe_encode(ds: rd.Dataset, merges, alphabet: list[str] | None = None,
               text_col: str = "text", unk_id: int = -1,
               out_ids: str = "token_ids", out_count: str = "n_tokens",
               num_partitions: int | None = None) -> rd.Dataset:
    """Tokenize the corpus with a trained BPE merge table — the APPLY
    half of the train→tokenize→pack chain: appends ``token_ids``
    (``list<int32>``) and ``n_tokens`` (``int64``) to every row.

    ``merges`` is :func:`bpe_train`'s output (``(left, right[, cnt])``
    rows in merge order); ``alphabet`` pins the base vocabulary ids
    (default: :func:`bpe_alphabet` over this corpus).  Ids follow
    :func:`bpe_vocab`; symbols outside the vocabulary (chars absent
    from ``alphabet``) encode as ``unk_id``.

    Per-doc semantics: whitespace tokenization
    (:func:`~.analysis.whitespace_tokens`), each word BPE-merged
    independently left-to-right per merge (exactly
    :func:`bpe_train_reference`'s apply), the doc's token stream is
    the in-order concatenation of its words' tokens.

    Scale shape: the merge table + vocab broadcast once via
    ``ray.put``; each batch dictionary-encodes its words so the merge
    kernel (:func:`_batch_apply_kernel`, vectorized Arrow passes) runs
    over DISTINCT words only — Zipf makes that 10-50× smaller than the
    token stream; the per-doc regroup is one numpy gather.  No
    exchange, no driver state: a pure streaming ``map_batches`` stage.
    """
    import functools

    import ray

    if alphabet is None:
        alphabet = bpe_alphabet(ds, text_col,
                                num_partitions=num_partitions)
    pairs = [(m[0], m[1]) for m in merges]
    vocab, _ = bpe_vocab(pairs, alphabet)
    ctx_ref = ray.put((pairs, vocab))

    def encode(batch: pa.Table, ctx=None) -> pa.Table:
        mg, vb = ray.get(ctx)
        flat, parents = whitespace_tokens_of(batch, text_col)
        flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        n_rows = batch.num_rows
        if len(flat) == 0:
            empty_ids = pa.ListArray.from_arrays(
                pa.array(np.zeros(n_rows + 1, np.int32)),
                pa.array([], pa.int32()))
            return batch.append_column(out_ids, empty_ids).append_column(
                out_count, pa.array(np.zeros(n_rows, np.int64)))
        de = pc.dictionary_encode(flat)
        codes = np.asarray(de.indices).astype(np.int64)
        dwords = de.dictionary
        # merge kernel over DISTINCT words only
        exploded = _explode_chars(pa.table({
            "word": dwords,
            "cnt": pa.array(np.ones(len(dwords), np.int64))}))
        sym = _batch_apply_kernel(exploded, mg,
                                  want_deltas=False).column("symbols")
        sym = sym.combine_chunks() if isinstance(sym, pa.ChunkedArray) else sym
        flat_syms = pc.list_flatten(sym)
        word_off = np.asarray(sym.offsets).astype(np.int64)
        word_len = word_off[1:] - word_off[:-1]
        # symbol → id: lookup only the DISTINCT symbols of this batch
        sde = pc.dictionary_encode(flat_syms)
        lut = np.fromiter((vb.get(s, unk_id)
                           for s in sde.dictionary.to_pylist()),
                          np.int32, len(sde.dictionary))
        ids_flat = lut[np.asarray(sde.indices)]
        # regroup: word occurrence i (code c) contributes the slice
        # [word_off[c], word_off[c]+word_len[c]) of ids_flat, in order
        occ_len = word_len[codes]
        total = int(occ_len.sum())
        out_start = np.zeros(len(codes) + 1, np.int64)
        np.cumsum(occ_len, out=out_start[1:])
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(out_start[:-1], occ_len)
               + np.repeat(word_off[codes], occ_len))
        doc_of_tok = np.repeat(parents.astype(np.int64), occ_len)
        per_doc = np.bincount(doc_of_tok, minlength=n_rows)
        offsets = np.zeros(n_rows + 1, np.int64)
        np.cumsum(per_doc, out=offsets[1:])
        if total > np.iinfo(np.int32).max:
            raise ValueError(
                f"bpe_encode: {total} tokens in one batch overflows int32 "
                "list offsets — lower batch_size / raise num blocks")
        ids_col = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(ids_flat[pos], pa.int32()))
        return batch.append_column(out_ids, ids_col).append_column(
            out_count, pa.array(per_doc.astype(np.int64)))

    return ds.map_batches(functools.partial(encode, ctx=ctx_ref),
                          batch_format="pyarrow")


def bpe_encode_reference(text: str, merges, alphabet: list[str],
                         unk_id: int = -1) -> list[int]:
    """Sequential reference tokenizer (per-word merge loop) asserted
    identical to :func:`bpe_encode` in tests/test_bpe.py."""
    vocab, _ = bpe_vocab([(m[0], m[1]) for m in merges], alphabet)
    out: list[int] = []
    for word in (text or "").split():
        sym = list(word)
        for m in merges:
            a, b = m[0], m[1]
            new: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(sym[i])
                    i += 1
            sym = new
        out.extend(vocab.get(s, unk_id) for s in sym)
    return out


def bpe_train_reference(word_counts: dict[str, int], n_merges: int = 50,
                        min_count: int = 2) -> list[tuple[str, str, int]]:
    """Sequential reference implementation (the classic dict-based BPE
    loop) used to assert the distributed trainer's merge sequence is
    IDENTICAL — same tie-break (count DESC, pair ASC)."""
    words = {tuple(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                pairs[sym[i], sym[i + 1]] = pairs.get((sym[i], sym[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        new_words: dict[tuple, int] = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return merges
