"""FSST-style symbol-table compression for string content columns.

True FSST (Boncz, Neumann, Leis: "FSST: Fast Random Access String
Compression", VLDB 2020) does greedy longest-match against a table of
up-to-8-byte symbols — inherently sequential per byte, which pure
Python cannot run at GB/s. This codec keeps FSST's architecture (build
a small symbol table from a sample; encode every chunk with it; decode
is a table lookup; bit-exact) but replaces the matcher with **vectorized
recursive pairing** (Re-Pair, Larsson & Moffat 1999): R rounds of
byte-pair merging, each round fully vectorized in numpy (pair hashing →
sorted-key lookup → run-parity greedy overlap resolution → scatter
rebuild). After R=3 rounds a symbol covers up to 2^R = 8 source bytes —
the same maximum symbol length as FSST.

Final serialization is escape-free and decode-vectorizable: a byte
stream of the 255 most frequent symbols (code 255 = "take next from the
wide stream") plus a uint16 side stream, so decode never scans
byte-by-byte.

The whole column chunk is compressed as ONE concatenated buffer (string
boundaries carried as FOR-packed lengths), so short strings share the
symbol table and pairs may span boundaries harmlessly.

Symbol tables are built once per partition by the encoder actor and
reused across chunks (SURVEY §2.3 "engine's new stateful stages"); the
table is also embedded in each chunk payload so every chunk is
self-decoding, and its sha256 goes to the partition manifest.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from .base import Codec, apply_nulls, buffer_to_strings, frame, split_nulls, strings_to_buffer, unframe
from .bitpack import ForCodec

_ROUNDS = 3
_PAIRS_PER_ROUND = 320
_MIN_PAIR_COUNT = 4
_SAMPLE_BYTES = 1 << 18
# 256 literals + ≤3×320 merged symbols (≤8-byte expansions, FSST's cap).
# Chosen by measurement (see BASELINE.md): with the uint16 final coding
# below, 3×320 still beats plain+zstd on source text (~2%) while doing
# 25% less memory traffic than 4 rounds — the encode kernel is memory-
# bandwidth-bound under a full actor pool.
MAXSYM = 1216


class FsstTable:
    """rules (uint16 left/right per new symbol, grouped in rounds) + the
    byte-code assignment for the final stream."""

    __slots__ = ("rules_l", "rules_r", "round_sizes", "top_syms", "_lookup", "_expansion")

    def __init__(self, rules_l: np.ndarray, rules_r: np.ndarray, round_sizes: list[int], top_syms: np.ndarray):
        self.rules_l = rules_l.astype(np.uint16)
        self.rules_r = rules_r.astype(np.uint16)
        self.round_sizes = list(round_sizes)
        self.top_syms = top_syms.astype(np.uint16)
        self._lookup = None  # per-round pair→code LUTs, built lazily
        self._expansion = None  # (n_syms×8 uint8 matrix, len per symbol)

    def expansion(self) -> tuple[np.ndarray, np.ndarray]:
        """Full byte expansion of every symbol id (≤ 2^rounds bytes each):
        decode becomes one cumsum + max-symbol-length masked scatters."""
        if self._expansion is None:
            n_ids = 256 + len(self.rules_l)
            max_len = 1 << len(self.round_sizes)
            exp: list[bytes] = [bytes([i]) for i in range(256)]
            for i in range(len(self.rules_l)):
                exp.append(exp[self.rules_l[i]] + exp[self.rules_r[i]])
            lens = np.fromiter((len(e) for e in exp), np.int64, n_ids)
            mat = np.zeros((n_ids, max_len), np.uint8)
            for i, e in enumerate(exp):
                mat[i, : len(e)] = np.frombuffer(e, np.uint8)
            self._expansion = (mat, lens)
        return self._expansion

    def lookups(self):
        """Per-round dense LUTs: pair (hi*alph+lo) → merged code (0 = no
        rule), sized to that round's input alphabet. Round 1's table is
        256×256 (64 KiB — cache resident, and its keys fit uint16); later
        rounds grow with the alphabet. One gather per element replaces a
        binary search."""
        if self._lookup is None:
            out = []
            base = 256
            off = 0
            for sz in self.round_sizes:
                alph = base  # input alphabet size of this round
                lut = np.zeros(alph * alph, np.uint16)
                keys = self.rules_l[off : off + sz].astype(np.int64) * alph + self.rules_r[off : off + sz]
                lut[keys] = np.arange(base, base + sz, dtype=np.uint16)
                out.append((lut, alph))
                base += sz
                off += sz
            self._lookup = out
        return self._lookup

    def to_bytes(self) -> bytes:
        head = struct.pack("<B", len(self.round_sizes)) + struct.pack(
            f"<{len(self.round_sizes)}H", *self.round_sizes
        ) + struct.pack("<H", len(self.top_syms))
        return head + self.rules_l.tobytes() + self.rules_r.tobytes() + self.top_syms.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FsstTable":
        nr = blob[0]
        sizes = list(struct.unpack_from(f"<{nr}H", blob, 1))
        off = 1 + 2 * nr
        (ntop,) = struct.unpack_from("<H", blob, off)
        off += 2
        total = sum(sizes)
        rl = np.frombuffer(blob, np.uint16, total, off)
        rr = np.frombuffer(blob, np.uint16, total, off + 2 * total)
        top = np.frombuffer(blob, np.uint16, ntop, off + 4 * total)
        return cls(rl.copy(), rr.copy(), sizes, top.copy())

    def sha256(self) -> str:
        return hashlib.sha256(self.to_bytes()).hexdigest()


_IDX_CACHE = np.arange(1 << 20, dtype=np.int32)


def _idx(n: int) -> np.ndarray:
    global _IDX_CACHE
    if len(_IDX_CACHE) < n:
        _IDX_CACHE = np.arange(max(n, 2 * len(_IDX_CACHE)), dtype=np.int32)
    return _IDX_CACHE[:n]


_TILE = 1 << 16  # elements per window: keeps all round temporaries
# (~1 MiB) cache-resident so the kernel does ~2 DRAM passes per round
# instead of ~17 — the encode stage is memory-bound under an actor pool


def _window_round(win: np.ndarray, lut: np.ndarray, alph: int,
                  carry_in: bool, has_lookahead: bool) -> tuple[np.ndarray, bool]:
    """Greedy pair-merge over one window.

    ``win`` holds the window's elements plus (when ``has_lookahead``) one
    element of the next window, so the pair bridging the boundary is
    decided here; ``carry_in`` = this window's first element was consumed
    by the previous window's bridging pair."""
    L = len(win) - 1 if has_lookahead else len(win)
    npairs = len(win) - 1
    if npairs <= 0 or L <= 0:
        out = win[1:L] if carry_in else win[:L]
        return out, False
    if alph <= 256:
        # byte round: keys fit uint16, LUT is 64 KiB (L1-resident)
        key = win[:-1] << np.uint16(8)
        key |= win[1:]
    else:
        key = win[:-1].astype(np.int32)
        key *= alph
        key += win[1:]
    code = lut[key]
    match = code != 0
    if carry_in:
        match[0] = False
    if not match.any():
        out = win[1:L] if carry_in else win[:L]
        return out.copy(), False
    # greedy left-to-right within runs of consecutive matches = keep even
    # offsets from each run start (vectorized parity trick): the last
    # non-match position before i fixes the run start.
    idx = _idx(npairs)
    w = idx.copy()
    w[match] = -1
    last_nomatch = np.maximum.accumulate(w)
    last_nomatch -= idx  # now -(i - last_nomatch); odd diff ⇔ keep
    keep = match & ((last_nomatch & 1) == 1)
    out_vals = win[:L].copy()
    out_vals[:npairs][keep] = code[keep]
    drop = np.empty(L, bool)
    drop[0] = carry_in
    drop[1:] = keep[: L - 1]
    carry_out = bool(keep[L - 1]) if has_lookahead else False
    return out_vals[~drop], carry_out


def _apply_round(seq: np.ndarray, lut: np.ndarray, alph: int = MAXSYM) -> np.ndarray:
    """One vectorized merge round: replace greedy non-overlapping pair
    matches with their symbol codes. ``lut`` maps hi*alph+lo → code
    (0 = no rule); symbols ≥ alph (added by later rounds) cannot occur
    in this round's input. Processed in cache-sized tiles; the greedy
    parse carries across tile boundaries exactly."""
    n = len(seq)
    if n < 2 or lut is None:
        return seq
    if n <= _TILE + (_TILE >> 1):
        out, _ = _window_round(seq, lut, alph, False, False)
        return out
    parts = []
    carry = False
    s = 0
    while s < n:
        e = min(s + _TILE, n)
        look = e < n
        out, carry = _window_round(seq[s : e + 1] if look else seq[s:n],
                                   lut, alph, carry, look)
        parts.append(out)
        s = e
    return np.concatenate(parts)


def build_table(sample: np.ndarray, rounds: int = _ROUNDS, pairs_per_round: int = _PAIRS_PER_ROUND) -> FsstTable:
    """Deterministic symbol-table construction from a byte sample."""
    seq = sample[:_SAMPLE_BYTES].astype(np.uint16)
    rules_l: list[np.ndarray] = []
    rules_r: list[np.ndarray] = []
    sizes: list[int] = []
    next_id = 256
    for _ in range(rounds):
        if len(seq) < 2:
            sizes.append(0)
            continue
        pairs = (seq[:-1].astype(np.uint32) << np.uint32(16)) | seq[1:]
        uniq, counts = np.unique(pairs, return_counts=True)
        ok = counts >= _MIN_PAIR_COUNT
        uniq, counts = uniq[ok], counts[ok]
        order = np.lexsort((uniq, -counts))  # count desc, key asc → deterministic
        top = uniq[order[:pairs_per_round]]
        sizes.append(len(top))
        rules_l.append((top >> 16).astype(np.uint16))
        rules_r.append((top & 0xFFFF).astype(np.uint16))
        if len(top):
            alph = next_id  # alphabet size entering this round
            lut = np.zeros(alph * alph, np.uint16)
            lut[(top >> 16).astype(np.int64) * alph + (top & 0xFFFF)] = np.arange(
                next_id, next_id + len(top), dtype=np.uint16
            )
            seq = _apply_round(seq, lut, alph)
        next_id += len(top)
    rl = np.concatenate(rules_l) if rules_l else np.zeros(0, np.uint16)
    rr = np.concatenate(rules_r) if rules_r else np.zeros(0, np.uint16)
    # top_syms kept (empty) for table-format compatibility; the final
    # coding is the raw uint16 stream (see compress())
    return FsstTable(rl, rr, sizes, np.zeros(0, np.uint16))


def compress(data: np.ndarray, table: FsstTable) -> bytes:
    """uint8 buffer → little-endian uint16 symbol stream.

    The final entropy coding is deliberately left to the downstream zstd
    stage: measured on source text, zstd over the raw uint16 symbols
    beats a 255-code escape byte-packing by 3-8% (the packing destroys
    symbol-boundary alignment zstd models well)."""
    seq = data.astype(np.uint16)
    for lut, alph in table.lookups():
        seq = _apply_round(seq, lut, alph)
    return seq.astype("<u2", copy=False).tobytes()


def decompress(stream: bytes, table: FsstTable, n_out: int) -> np.ndarray:
    """uint16 symbol stream → original uint8 buffer, bit-exact."""
    seq = np.frombuffer(stream, "<u2")
    # expand symbols via the precomputed expansion matrix
    mat, lens = table.expansion()
    L = lens[seq]
    starts = np.empty(len(seq), np.int64)
    if len(seq):
        starts[0] = 0
        np.cumsum(L[:-1], out=starts[1:])
    total = int(starts[-1] + L[-1]) if len(seq) else 0
    assert total == n_out, f"fsst decode length mismatch: {total} != {n_out}"
    # repeat-gather: one pass building (symbol, offset) per OUTPUT byte
    # beats per-byte-position masked scatters (those re-scan the whole
    # symbol stream once per expansion position)
    sym_idx = np.repeat(np.arange(len(seq), dtype=np.int64), L)
    within = np.arange(total, dtype=np.int64) - starts[sym_idx]
    return mat[seq[sym_idx], within]


class FsstCodec(Codec):
    name = "fsst"

    def __init__(self, table: FsstTable | None = None, embed_table: bool = True):
        self.table = table  # per-partition table injected by the encoder actor
        self.embed_table = embed_table  # False → table stored once per
        # partition file (parquet schema metadata), not in every chunk payload
        self._for = ForCodec()

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        typ = str(arr.type)
        filled, validity = split_nulls(arr)
        data, lengths = strings_to_buffer(filled)
        table = self.table if self.table is not None else build_table(data)
        stream = compress(data, table)
        len_payload, _ = self._for.encode(pa.array(lengths))
        tbl = table.to_bytes() if self.embed_table else b""
        head = struct.pack("<QI", int(len(data)), len(arr))
        payload = frame([head, tbl, stream, len_payload, validity])
        return payload, {
            "type": typ,
            "table_sha256": table.sha256(),
            "raw_bytes": int(len(data)),
            "stream_bytes": len(stream),
        }

    def decode(self, payload: bytes, meta: dict) -> pa.Array:
        head, tbl, stream, len_payload, validity = unframe(payload)
        n_bytes, n_rows = struct.unpack_from("<QI", head)
        if tbl:
            table = FsstTable.from_bytes(tbl)
        else:
            table = self.table
            if table is None:
                raise ValueError(
                    "fsst payload has no embedded table; decode requires the "
                    f"partition table {meta.get('table_sha256')} (from the "
                    "partition file's schema metadata)"
                )
            if meta.get("table_sha256") not in (None, table.sha256()):
                raise ValueError("fsst table hash mismatch on decode")
        data = decompress(stream, table, n_bytes)
        lengths = np.asarray(self._for.decode(len_payload, {"type": "int64"}), dtype=np.int64)
        typ = pa.large_string() if meta["type"] == "large_string" else pa.string()
        out = buffer_to_strings(data, lengths, typ)
        return apply_nulls(out, validity)

    def estimate(self, arr: pa.Array, stats: dict) -> float:
        # code text typically merges ~half the positions over 3 rounds
        return stats["nbytes"] * 0.55 + 4096
