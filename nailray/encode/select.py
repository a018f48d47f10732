"""Codec auto-selection: pick the codec with the smallest estimated
encoded size from sampled chunk statistics (SURVEY §7.3.6b).

Deterministic: pure function of the stats dict; ties broken by fixed
codec preference order.
"""

from __future__ import annotations

import pyarrow as pa

from . import codecs
from .stats import entropy_estimate

# preference order for ties (cheapest decode first)
_ORDER = {"dict": 0, "rle": 1, "for": 2, "prefix": 3, "fsst": 4, "plain": 5}


def candidates_for(arr: pa.Array) -> list[str]:
    t = arr.type
    if pa.types.is_integer(t):
        return ["dict", "rle", "for", "plain"]
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ["dict", "rle", "prefix", "fsst", "plain"]
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ["prefix", "plain"]
    return ["plain"]


def choose_codec(arr: pa.Array, stats: dict) -> str:
    names = candidates_for(arr)
    if "fsst" in names:
        # high-entropy payloads (already compressed) don't pair-merge well
        if entropy_estimate(arr, stats) > 7.2:
            names.remove("fsst")
    best, best_size = "plain", float("inf")
    for name in names:
        est = codecs.get(name).estimate(arr, stats)
        if est < best_size or (est == best_size and _ORDER[name] < _ORDER[best]):
            best, best_size = name, est
    return best
