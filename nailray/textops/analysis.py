"""Text analysis stages: token counting, quality scoring, language id,
document fingerprinting. Vectorized (pandas str kernels / numpy) inside
map_batches; stateful pattern compilation lives in actor __init__."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# tiny per-language stopword seed sets (public common words) for the
# n-gram/stopword-ratio language heuristic
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "pas", "un", "une", "des", "que"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "de", "que"},
    "it": {"il", "la", "di", "e", "che", "non", "un", "una", "per", "sono"},
}


class TextAnalyzer:
    """Actor-pool stage: compiled regexes + stopword tables built once."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"\S+")
        self.token_re = re.compile(r"\w+|[^\w\s]")  # BPE-ish: words + punct marks
        self.punct_re = re.compile(r"[.,;:!?]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["n_chars_calc"] = s.str.len().astype("int64")
        batch["n_words"] = s.str.count(self.word_re).astype("int64")
        batch["n_tokens"] = s.str.count(self.token_re).astype("int64")
        batch["punct_ratio"] = (
            s.str.count(self.punct_re) / batch["n_chars_calc"].clip(lower=1)
        ).astype("float64")
        return batch

    def quality(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = TextAnalyzer.__call__(self, batch)
        s = batch[self.text_col].fillna("")
        words = s.str.lower().str.findall(self.word_re)
        # vectorized stopword ratio: explode + isin + per-row mean (no
        # Python loop over documents)
        lens = words.str.len().clip(lower=1)
        ex = words.explode()
        hits = ex.isin(_LANG_STOPWORDS["en"]).groupby(level=0).sum()
        batch["stopword_ratio"] = (hits.reindex(words.index, fill_value=0)
                                   / lens).astype("float64")
        mean_wl = (batch["n_chars_calc"] - batch["n_words"] + 1).clip(lower=0) / \
            batch["n_words"].clip(lower=1)
        # composite heuristic: reasonable length, some punctuation, plausible words
        batch["quality_score"] = (
            np.clip(batch["n_words"] / 100.0, 0, 1) * 0.4
            + np.clip(batch["punct_ratio"] * 20, 0, 1) * 0.2
            + np.clip(batch["stopword_ratio"] * 4, 0, 1) * 0.2
            + np.clip(2.0 / (1.0 + np.abs(mean_wl - 5.0)), 0, 1) * 0.2
        )
        return batch


def token_counts(ds: rd.Dataset, text_col: str = "text", concurrency=None) -> rd.Dataset:
    from ..shuffle import actor_pool_size

    concurrency = actor_pool_size(concurrency)
    return ds.map_batches(TextAnalyzer, fn_constructor_args=(text_col,),
                          batch_format="pandas", concurrency=concurrency)


class QualityAnalyzer(TextAnalyzer):
    def __call__(self, batch):
        return self.quality(batch)


def quality_scores(ds: rd.Dataset, text_col: str = "text", concurrency=None) -> rd.Dataset:
    from ..shuffle import actor_pool_size

    concurrency = actor_pool_size(concurrency)
    return ds.map_batches(QualityAnalyzer, fn_constructor_args=(text_col,),
                          batch_format="pandas", concurrency=concurrency)


class LangId:
    """n-gram/stopword heuristic language id — stateful actor stage."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word_re = re.compile(r"[a-zA-ZäöüéèêàçñìÄÖÜ]+")
        self.tables = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized: findall → cap 200 words → explode once → one isin
        # per language → per-row hit counts (pandas C kernels; no Python
        # loop over documents)
        words = (batch[self.text_col].fillna("").str.lower()
                 .str.findall(self.word_re).str.slice(0, 200))
        lens = words.str.len()
        ex = words.explode()
        scores = pd.DataFrame(index=words.index)
        for lang, sw in self.tables.items():
            hits = ex.isin(sw).groupby(level=0).sum()
            scores[lang] = hits.reindex(words.index, fill_value=0)
        scores = scores.div(lens.clip(lower=1), axis=0)
        best = scores.idxmax(axis=1)  # first language wins ties (table order)
        best_score = scores.max(axis=1)
        pred = best.where((best_score > 0.02) & (lens > 0), "unknown")
        batch["lang_pred"] = pred.astype(str)
        return batch


def language_id(ds: rd.Dataset, text_col: str = "text", concurrency=None) -> rd.Dataset:
    from ..shuffle import actor_pool_size

    concurrency = actor_pool_size(concurrency)
    return ds.map_batches(LangId, fn_constructor_args=(text_col,),
                          batch_format="pandas", concurrency=concurrency)


def fingerprint(ds: rd.Dataset, text_col: str = "text",
                out_col: str = "fingerprint") -> rd.Dataset:
    """Deterministic 64-bit rolling-hash document fingerprint over
    whitespace-normalized text (casefolded)."""
    ws = re.compile(r"\s+")

    def fn(batch: pa.Table) -> pa.Table:
        vals = []
        for t in batch.column(text_col).to_pylist():
            norm = ws.sub(" ", (t or "").strip().lower())
            vals.append(hashlib.blake2b(norm.encode(), digest_size=8).hexdigest())
        return batch.append_column(out_col, pa.array(vals))

    return ds.map_batches(fn, batch_format="pyarrow")
