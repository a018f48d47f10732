"""Per-partition checkpoint manifest: lineage + metrics + resume.

Layout under the encode output directory:

    out_dir/
      _plan.json                  # partition plan + input fragment lineage
      _manifest/part-00007.json   # one entry per completed partition
      part-00007.parquet          # that partition's encoded chunks

A partition is COMPLETE iff both its manifest entry and its data file
exist (the data file is written to a temp name and renamed first, the
manifest entry second — so a crash between the two re-encodes, never
corrupts). A resumed run loads the completed set, filters those rows
out *before* the shuffle, and skips straight to the remaining
partitions (north_rule: "resumable from checkpoint with per-partition
lineage + metrics").
"""

from __future__ import annotations

import json
import os


def plan_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_plan.json")


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def part_file(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, f"part-{part_id:05d}.parquet")


def entry_path(out_dir: str, part_id: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{part_id:05d}.json")


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def write_plan(out_dir: str, plan_json: dict, input_fragments: list[dict]) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    _atomic_write_json(plan_path(out_dir), {"plan": plan_json, "input_fragments": input_fragments})


def load_plan(out_dir: str) -> dict | None:
    p = plan_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_entry(out_dir: str, entry: dict) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    _atomic_write_json(entry_path(out_dir, entry["part_id"]), entry)


def load_completed(out_dir: str) -> dict[int, dict]:
    """part_id → manifest entry, only for partitions whose data file exists."""
    mdir = manifest_dir(out_dir)
    out: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                e = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn write → treat as incomplete
        if os.path.exists(part_file(out_dir, e["part_id"])):
            out[e["part_id"]] = e
    return out


def summarize(out_dir: str) -> dict:
    entries = load_completed(out_dir)
    enc = sum(e["encoded_bytes"] for e in entries.values())
    raw = sum(e["input_bytes"] for e in entries.values())
    files = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    return {
        "partitions": len(entries),
        "rows": sum(e["n_rows"] for e in entries.values()),
        "chunks": sum(e["n_chunks"] for e in entries.values()),
        "input_bytes": raw,
        "encoded_payload_bytes": enc,
        "encoded_file_bytes": files,
        "ratio_payload": raw / enc if enc else None,
        "ratio_files": raw / files if files else None,
    }
