"""Tokenizer protocol for packing / token accounting.

Training-stack packing must count tokens with the SAME tokenizer the
trainer uses, or bin boundaries drift. This module defines the minimal
protocol the packing ops consume and three implementations:

- ``WhitespaceTokenizer`` — the engine default (strip + split on ``\\s+``),
  SQL-expressible, so the live DuckDB oracles stay byte-exact.
- ``ByteBPETokenizer`` — a REAL byte-level BPE (the GPT-2 merge algorithm:
  greedy lowest-rank pair merging over a fixed merge table) with a
  deterministic built-in fixture vocabulary. Not SQL-expressible — queries
  using it are golden-pinned. Per-word LRU caching keeps the hot path out
  of Python for the repetitive head of a natural-language corpus.
- ``load_hf_tokenizer`` — optional real trained tokenizer via the
  ``tokenizers``/``tiktoken`` wheels, gated behind an import-try (neither
  is installed in this sandbox; the call site raises a clearly marked
  NotImplementedError, everything around it is real and tested via the
  fixture BPE).

A tokenizer instance is pickled into each ``map_batches`` task once (plain
dict state, no locks); the per-worker cache warms over the worker's life.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Protocol, runtime_checkable

import numpy as np
import pandas as pd


@runtime_checkable
class Tokenizer(Protocol):
    """What packing needs: ids for one text, and vectorized counts."""

    def encode(self, text: str) -> list[int]: ...

    def count_series(self, texts: "pd.Series") -> np.ndarray: ...


class WhitespaceTokenizer:
    """strip + split on ``\\s+`` — matches ``ops.text.token_stats`` and the
    live SQL oracles (``len(regexp_split_to_array(trim(text), '\\s+'))``)."""

    def encode(self, text: str) -> list[int]:
        # ids are per-call word indices — whitespace "tokens" have no vocab
        return list(range(len((text or "").split())))

    def count_series(self, texts: "pd.Series") -> np.ndarray:
        return (
            texts.fillna("").str.strip().str.split().str.len()
            .fillna(0).to_numpy(np.int64)
        )


# Fixture merge table: common English digraphs/trigraphs in a fixed,
# hand-written order (this IS the vocabulary — deterministic across
# machines, no RNG, no network). Ranks are list positions, exactly like a
# trained BPE's merges.txt.
_FIXTURE_MERGES: list[tuple[bytes, bytes]] = [
    (b"t", b"h"), (b"th", b"e"), (b"i", b"n"), (b"a", b"n"), (b"e", b"r"),
    (b"o", b"n"), (b"r", b"e"), (b"an", b"d"), (b"e", b"n"), (b"o", b"r"),
    (b"e", b"s"), (b"t", b"i"), (b"a", b"t"), (b"s", b"t"), (b"a", b"r"),
    (b"o", b"u"), (b"in", b"g"), (b"i", b"s"), (b"i", b"t"), (b"a", b"l"),
    (b"l", b"e"), (b"c", b"o"), (b"d", b"e"), (b"r", b"o"), (b"e", b"d"),
    (b"ti", b"on"), (b"er", b"s"), (b"o", b"f"), (b"t", b"o"), (b"m", b"a"),
    (b"s", b"e"), (b"h", b"a"), (b"u", b"r"), (b"l", b"i"), (b"l", b"l"),
    (b"c", b"h"), (b"w", b"h"), (b"f", b"or"), (b"w", b"i"), (b"n", b"o"),
    (b"s", b"h"), (b"wi", b"th"), (b"the", b"r"), (b"p", b"a"), (b"p", b"ro"),
    (b"b", b"e"), (b"u", b"s"), (b"en", b"t"), (b"c", b"a"), (b"c", b"e"),
]


class ByteBPETokenizer:
    """Byte-level BPE with a fixed merge table (the GPT-2 algorithm).

    A word's tokens start as its UTF-8 bytes; the adjacent pair with the
    LOWEST merge rank is merged repeatedly until no ranked pair remains.
    Pre-tokenization is the whitespace split (strip + ``\\s+``) so the
    whole-document count is the sum of per-word BPE lengths — words never
    merge across whitespace. Token ids: 0..255 = raw bytes, 256+i = merge i.
    """

    def __init__(self, merges: list[tuple[bytes, bytes]] | None = None,
                 cache_size: int = 65_536):
        merges = list(_FIXTURE_MERGES) if merges is None else list(merges)
        self.ranks: dict[tuple[bytes, bytes], int] = {
            m: i for i, m in enumerate(merges)
        }
        self.token_ids: dict[bytes, int] = {bytes([b]): b for b in range(256)}
        for i, (a, b) in enumerate(merges):
            self.token_ids[a + b] = 256 + i
        self._cache_size = cache_size
        self._word_tokens = lru_cache(maxsize=cache_size)(self._word_tokens_raw)

    # lru_cache-wrapped closures don't pickle; rebuild the cache on unpickle
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_word_tokens", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._word_tokens = lru_cache(maxsize=self._cache_size)(
            self._word_tokens_raw
        )

    def _word_tokens_raw(self, word: str) -> tuple[bytes, ...]:
        parts = [bytes([b]) for b in word.encode("utf-8")]
        ranks = self.ranks
        while len(parts) > 1:
            best_rank, best_i = None, -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            parts[best_i:best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        return tuple(parts)

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in (text or "").split():
            out.extend(self.token_ids[p] for p in self._word_tokens(w))
        return out

    def count_series(self, texts: "pd.Series") -> np.ndarray:
        wt = self._word_tokens
        return np.fromiter(
            (
                sum(len(wt(w)) for w in (t or "").split())
                for t in texts.fillna("")
            ),
            dtype=np.int64,
            count=len(texts),
        )


def load_hf_tokenizer(name: str = "gpt2") -> "Tokenizer":
    """Real trained tokenizer via the ``tokenizers`` or ``tiktoken`` wheel.

    Neither wheel ships in this sandbox, so this raises a clearly marked
    NotImplementedError at the exact library call; the protocol plumbing is
    exercised end-to-end by ``ByteBPETokenizer`` (same algorithm, fixture
    merges)."""
    try:
        from tokenizers import Tokenizer as HFTok  # type: ignore
    except ImportError:
        try:
            import tiktoken  # type: ignore
        except ImportError as exc:
            raise NotImplementedError(
                "no tokenizer wheel installed (`tokenizers` or `tiktoken`); "
                "use ByteBPETokenizer or WhitespaceTokenizer"
            ) from exc

        enc = tiktoken.get_encoding(name)

        class _TikTok:
            def encode(self, text: str) -> list[int]:
                return enc.encode(text or "")

            def count_series(self, texts: "pd.Series") -> np.ndarray:
                return np.fromiter(
                    (len(enc.encode(t or "")) for t in texts.fillna("")),
                    dtype=np.int64, count=len(texts),
                )

        return _TikTok()

    tok = HFTok.from_pretrained(name)

    class _HF:
        def encode(self, text: str) -> list[int]:
            return tok.encode(text or "").ids

        def count_series(self, texts: "pd.Series") -> np.ndarray:
            encs = tok.encode_batch(list(texts.fillna("")))
            return np.asarray([len(e.ids) for e in encs], dtype=np.int64)

    return _HF()
