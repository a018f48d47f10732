"""Deterministic synthetic source-code corpus (the F0 fixture).

Schema fixed by ``BASELINE.json.input_hint``:
    repo:string, path:string, commit:string, lang:string, content:string

Properties engineered for the encode pipeline (see FIXTURES.md F0):
- ``repo``: low cardinality, zipf-skewed so one giant repo exercises
  skew splitting; format ``org{i}/project{j}``.
- ``path``: hierarchical, many shared prefixes, sorted runs within a
  repo (RLE/dict-friendly).
- ``commit``: 40-char lowercase hex, repeated in runs (many consecutive
  rows share a commit).
- ``lang``: ~12 values (dictionary-friendly), consistent with the path
  extension.
- ``content``: synthetic source text with heavily repeated
  keywords/identifiers/substrings (FSST-friendly), variable length
  including empty strings, unicode, embedded newlines/tabs.

Everything is a pure function of (n_rows, seed, knobs) — no wall clock,
no external data.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa

LANGS = ["py", "rs", "c", "cpp", "js", "ts", "go", "java", "rb", "sh", "md", "toml"]

_KEYWORDS = {
    "py": ["def ", "return ", "import ", "self.", "class ", "None", "for ", "in ", "if ", "elif ", "lambda ", "yield "],
    "rs": ["fn ", "let mut ", "impl ", "pub fn ", "match ", "Some(", "None", "&self", "-> Result<", "use ", "struct "],
    "c": ["int ", "void ", "return ", "static ", "const char *", "#include <", "struct ", "sizeof(", "NULL", "for ("],
    "cpp": ["template <", "std::", "auto ", "return ", "const ", "namespace ", "void ", "class ", "&&", "::"],
    "js": ["function ", "const ", "=> ", "return ", "await ", "async ", "let ", "this.", "export ", "require("],
    "ts": ["interface ", "const ", ": string", ": number", "export ", "async ", "await ", "return ", "type ", "=> "],
    "go": ["func ", "return ", "err != nil", "package ", "import ", "defer ", "go ", "chan ", "struct {", ":= "],
    "java": ["public ", "private ", "static ", "void ", "return ", "new ", "final ", "class ", "extends ", "@Override"],
    "rb": ["def ", "end", "do |", "require ", "module ", "class ", "puts ", "nil", "attr_", "=> "],
    "sh": ["#!/bin/bash", "echo ", "if [ ", "fi", "for ", "done", "export ", "$(", "|| ", "&& "],
    "md": ["## ", "### ", "```", "- ", "[", "](", "**", "> ", "# ", "*"],
    "toml": ["[package]", "version = ", "name = ", "[dependencies]", "features = [", "= true", "= false", '"', "[[", "]]"],
}

_IDENTS = [
    "result", "value", "index", "buffer", "config", "context", "handler", "stream",
    "batch", "offset", "length", "count", "parse", "encode", "decode", "table",
    "column", "record", "schema", "writer", "reader", "partition", "manifest",
]

_DIRS = ["src", "lib", "core", "utils", "internal", "pkg", "tests", "cmd", "api", "common"]
_SUBDIRS = ["io", "net", "data", "model", "codec", "store", "exec", "plan", "fmt", "sys"]

_UNICODE_SNIPPETS = ["→", "π", "λ", "✓", "müller", "naïve", "été", "数据", "🚀"]


def _line_pool(lang: str, rng: np.random.Generator, n: int = 160) -> list[str]:
    """Deterministic pool of code-ish lines for one language."""
    kws = _KEYWORDS[lang]
    lines: list[str] = []
    for i in range(n):
        kw = kws[int(rng.integers(0, len(kws)))]
        a = _IDENTS[int(rng.integers(0, len(_IDENTS)))]
        b = _IDENTS[int(rng.integers(0, len(_IDENTS)))]
        indent = "    " * int(rng.integers(0, 3))
        style = int(rng.integers(0, 5))
        if style == 0:
            ln = f"{indent}{kw}{a}_{b}({a}, {b})"
        elif style == 1:
            ln = f"{indent}{a} = {kw}{b}[{int(rng.integers(0, 100))}]"
        elif style == 2:
            ln = f"{indent}// {kw}{a} {b} {int(rng.integers(0, 1000))}"
        elif style == 3:
            ln = f"{indent}{kw}{a}.{b}(\t{b!r})"
        else:
            uni = _UNICODE_SNIPPETS[int(rng.integers(0, len(_UNICODE_SNIPPETS)))] if rng.random() < 0.08 else ""
            ln = f"{indent}{a}_{i % 17} = {b} + {a}  {uni}"
        lines.append(ln + "\n")
    return lines


def make_corpus(
    n_rows: int,
    seed: int = 42,
    n_repos: int = 40,
    avg_lines: int = 12,
    max_content_len: int = 65536,
    outlier_docs: int = 0,
    outlier_bytes: int = 2 << 20,
) -> pa.Table:
    """Build the deterministic corpus table (small/medium scale).

    ``outlier_docs`` appends a few multi-MB generated files (FIXTURES F0:
    "a few multi-MB outliers at bench scale") — exercises the wide-row
    path: byte-capped chunking, small batch sizing, skew splitting."""
    rng = np.random.default_rng(seed)

    # --- repos: zipf-skewed sizes; repo 0 is the giant one -------------
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    weights = 1.0 / ranks**1.2
    weights /= weights.sum()
    counts = rng.multinomial(n_rows, weights)

    pools = {lang: _line_pool(lang, np.random.default_rng(seed * 1000 + i)) for i, lang in enumerate(LANGS)}
    lang_weights = np.array([8, 5, 4, 4, 7, 5, 4, 4, 2, 2, 3, 2], dtype=np.float64)
    lang_weights /= lang_weights.sum()

    repos: list[str] = []
    paths: list[str] = []
    commits: list[str] = []
    langs: list[str] = []
    contents: list[str] = []

    for r in range(n_repos):
        c = int(counts[r])
        if c == 0:
            continue
        repo = f"org{r % 7}/project{r}"
        rrng = np.random.default_rng(seed * 7919 + r)

        # paths: hierarchical, generated sorted (run formation for RLE)
        d1 = rrng.integers(0, len(_DIRS), c)
        d2 = rrng.integers(0, len(_SUBDIRS), c)
        lidx = rrng.choice(len(LANGS), size=c, p=lang_weights)
        fno = rrng.integers(0, max(2, c // 3), c)
        row_paths = sorted(
            f"{_DIRS[d1[i]]}/{_SUBDIRS[d2[i]]}/{_IDENTS[int(fno[i]) % len(_IDENTS)]}_{int(fno[i])}.{LANGS[lidx[i]]}"
            for i in range(c)
        )
        # commit runs: new commit roughly every 8 files
        bump = rrng.random(c) < (1.0 / 8.0)
        bump[0] = True
        commit_ids = np.cumsum(bump)
        commit_strs = {
            cid: hashlib.sha1(f"{repo}:{seed}:{cid}".encode()).hexdigest() + "0" * 0
            for cid in np.unique(commit_ids)
        }
        # pad sha1 (40 hex) — already 40 chars

        n_lines = np.maximum(0, rrng.poisson(avg_lines, c)).astype(np.int64)
        # ~1.5% empty files
        n_lines[rrng.random(c) < 0.015] = 0

        total_lines = int(n_lines.sum())
        # pre-drawn randomness for line composition (vectorized):
        # ~35% boilerplate pool lines (realistic repetition), the rest are
        # fresh parameterized lines (realistic per-line entropy)
        use_pool = rrng.random(total_lines) < 0.35
        pool_pick = rrng.integers(0, 160, total_lines)
        kw_pick = rrng.integers(0, 12, total_lines)
        a_pick = rrng.integers(0, len(_IDENTS), total_lines)
        b_pick = rrng.integers(0, len(_IDENTS), total_lines)
        num1 = rrng.integers(0, 1_000_000, total_lines)
        sfx = rrng.integers(0, 10_000, total_lines)
        ind = rrng.integers(0, 3, total_lines)
        style = rrng.integers(0, 4, total_lines)

        li = 0
        for i in range(c):
            p = row_paths[i]
            lang = p.rsplit(".", 1)[1]
            pool = pools[lang]
            kws = _KEYWORDS[lang]
            k = int(n_lines[i])
            parts = []
            for j in range(li, li + k):
                if use_pool[j]:
                    parts.append(pool[pool_pick[j] % len(pool)])
                else:
                    kw = kws[kw_pick[j] % len(kws)]
                    a = _IDENTS[a_pick[j]]
                    b = _IDENTS[b_pick[j]]
                    pad = "    " * int(ind[j])
                    st = style[j]
                    if st == 0:
                        parts.append(f"{pad}{kw}{a}_{sfx[j]}({b}, {num1[j]})\n")
                    elif st == 1:
                        parts.append(f"{pad}{a}_{sfx[j]} = {b}[{num1[j] % 997}] + 0x{num1[j]:x}\n")
                    elif st == 2:
                        parts.append(f"{pad}// {a} {b} case {sfx[j]}: offset={num1[j]}\n")
                    else:
                        parts.append(f'{pad}{kw}{b}.{a}("{a}_{sfx[j]}", {num1[j] % 4096})\n')
            li += k
            body = "".join(parts)
            if len(body) > max_content_len:
                body = body[:max_content_len]
            repos.append(repo)
            paths.append(p)
            commits.append(commit_strs[int(commit_ids[i])])
            langs.append(lang)
            contents.append(body)

    if outlier_docs:
        orng = np.random.default_rng(seed * 31 + 7)
        pool = pools["c"]
        for i in range(outlier_docs):
            n_lines_big = outlier_bytes // 40
            pick = orng.integers(0, len(pool), n_lines_big)
            nums = orng.integers(0, 1 << 30, n_lines_big)
            body = "".join(f"{pool[p][:-1]} /* {v:08x} */\n" for p, v in zip(pick, nums))
            repos.append("org0/megarepo")
            paths.append(f"generated/bundle_{i}.c")
            commits.append(hashlib.sha1(f"outlier:{seed}:{i}".encode()).hexdigest())
            langs.append("c")
            contents.append(body)

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    n_repos: int = 40,
    avg_lines: int = 12,
    row_group_size: int = 20_000,
    n_files: int = 1,
    outlier_docs: int = 0,
) -> str:
    """Write the corpus as parquet under ``out_dir`` (cached by params).

    Returns the directory containing ``corpus-*.parquet`` part files.
    Caching: a ``_meta.json`` with the exact params guards reuse, so
    bench runs at two parallelism levels read identical bytes.
    """
    import pyarrow.parquet as pq

    params = {
        "n_rows": n_rows, "seed": seed, "n_repos": n_repos,
        "avg_lines": avg_lines, "row_group_size": row_group_size,
        "n_files": n_files, "outlier_docs": outlier_docs, "v": 5,
    }
    meta_path = os.path.join(out_dir, "_meta.json")
    if os.path.exists(meta_path):
        try:
            if json.load(open(meta_path)) == params:
                return out_dir
        except Exception:
            pass
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(out_dir, f))
    table = make_corpus(n_rows, seed=seed, n_repos=n_repos, avg_lines=avg_lines,
                        outlier_docs=outlier_docs)
    # split into n_files contiguous slices (keeps repo grouping / runs)
    per = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        sl = table.slice(i * per, per)
        if sl.num_rows == 0:
            break
        pq.write_table(sl, os.path.join(out_dir, f"corpus-{i:04d}.parquet"),
                       row_group_size=row_group_size)
    with open(meta_path, "w") as fh:
        json.dump(params, fh)
    return out_dir
