"""Text analysis ops for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` transforms (pandas/numpy string
kernels — no per-row Python in the hot path except where a compiled regex
must walk each string once). Each op has a ``queries()`` entry; token/quality
stats also have DuckDB oracles.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

# BPE-ish tokenizer: words / numbers / punctuation runs (GPT-2-style coarse split)
_BPEISH = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_WS = re.compile(r"\s+")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "on", "with", "as"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu", "den", "für"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans", "que", "des"},
    "es": {"el", "la", "los", "las", "y", "de", "un", "una", "es", "por", "que", "con"},
}


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens_ws, n_tokens_bpeish) — whitespace + BPE-ish counts."""
    texts = batch["text"].to_pandas().fillna("")
    stripped = texts.str.strip()
    n_ws = stripped.str.split().str.len().fillna(0).astype("int64")
    n_bpe = texts.map(lambda t: len(_BPEISH.findall(t)))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens_ws": pa.array(n_ws, type=pa.int64()),
            "n_tokens_bpeish": pa.array(n_bpe, type=pa.int64()),
        }
    )


def quality_stats(batch: pa.Table) -> pa.Table:
    """Length / punctuation / alpha / stopword-ratio quality signals."""
    texts = batch["text"].to_pandas().fillna("")
    n_chars = texts.str.len().astype("int64")
    n_alpha = texts.str.count(r"[A-Za-z]").astype("int64")
    n_punct = texts.str.count(r"[^\w\s]").astype("int64")
    n_digit = texts.str.count(r"\d").astype("int64")
    words = texts.str.lower().str.findall(r"[a-z]+")
    n_words = words.str.len().astype("int64")
    en = _STOPWORDS["en"]
    n_stop = words.map(lambda ws: sum(1 for w in ws if w in en))
    denom_c = n_chars.replace(0, 1)
    denom_w = n_words.replace(0, 1)
    # no rounding: int/int → float64 division is IEEE-identical to the SQL
    # oracle, while round() differs (banker's vs half-up) on exact ties
    alpha_ratio = n_alpha / denom_c
    punct_ratio = n_punct / denom_c
    digit_ratio = n_digit / denom_c
    stop_ratio = pd.Series(n_stop, index=texts.index) / denom_w
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
            "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
            "digit_ratio": pa.array(digit_ratio, type=pa.float64()),
            "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
        }
    )


class LangId:
    """Stopword + character n-gram language heuristic (actor-pool stage:
    profiles built once per actor)."""

    def __init__(self):
        self.profiles = {lang: sw for lang, sw in _STOPWORDS.items()}
        self.word_re = re.compile(r"[a-zà-ÿäöüß]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs, scores = [], []
        for t in texts:
            words = self.word_re.findall((t or "").lower())
            best, best_score = "unknown", 0.0
            denom = max(1, len(words))
            for lang, sw in self.profiles.items():
                score = sum(1 for w in words if w in sw) / denom
                if score > best_score:
                    best, best_score = lang, score
            # raw IEEE division — no rounding, so the DuckDB oracle's
            # count/denom double division matches bit-for-bit
            langs.append(best if best_score > 0.02 else "unknown")
            scores.append(best_score)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs, type=pa.string()),
                "lang_score": pa.array(scores, type=pa.float64()),
            }
        )


def fingerprint(batch: pa.Table, window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: rolling crc32 over word 4-grams,
    min-sampled per window, xor-folded to one stable 64-bit id."""
    texts = batch["text"].to_pylist()
    out = []
    for t in texts:
        words = _WS.split((t or "").strip().lower())
        grams = [" ".join(words[i:i + 4]) for i in range(max(1, len(words) - 3))]
        hashes = np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.uint64)
        if len(hashes) >= window:
            view = np.lib.stride_tricks.sliding_window_view(hashes, window)
            mins = view.min(axis=1)
        else:
            mins = hashes
        fp = np.uint64(0)
        for i, m in enumerate(np.unique(mins)):
            fp ^= np.uint64(m) << np.uint64(i % 32)
        out.append(int(fp & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprint": pa.array(out, type=pa.int64()),
        }
    )
