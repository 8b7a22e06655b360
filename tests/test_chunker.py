"""Unit tests for the semantic chunker math (port of ref chunk/util.py +
chunker.py — windows, breakpoints, merge-forward, recursive re-split)."""

import numpy as np

from ontocast_ray.stages.chunking import (
    HashingEmbedder,
    SemanticSplitter,
    recursive_chunk,
)


class ConstantEmbedder:
    """All windows identical → zero distances → no breakpoints."""

    def embed(self, texts):
        return np.ones((len(texts), 4))


class AlternatingEmbedder:
    """Alternating orthogonal embeddings → large distance at every boundary."""

    def embed(self, texts):
        out = np.zeros((len(texts), 2))
        for i in range(len(texts)):
            out[i, i % 2] = 1.0
        return out


def test_single_sentence_returns_as_is():
    sp = SemanticSplitter(ConstantEmbedder(), min_chunk_size=None)
    assert sp.split_text("No split markers here") == ["No split markers here"]


def test_no_breakpoints_one_chunk():
    sp = SemanticSplitter(
        ConstantEmbedder(), min_chunk_size=None, sentence_split_regex=r"(?<=\.)\s+"
    )
    text = "One. Two. Three. Four."
    chunks = sp.split_text(text)
    assert chunks == ["One. Two. Three. Four."]


def test_merge_forward_small_chunks():
    """Chunks under min_chunk_size are merged into the following chunk
    (ref util.py:181-186: `continue` without advancing start_index)."""
    sp = SemanticSplitter(
        AlternatingEmbedder(),
        buffer_size=0,
        breakpoint_percentile=50,
        min_chunk_size=12,
        sentence_split_regex=r"(?<=\.)\s+",
    )
    chunks = sp.split_text("Aaaa. Bbbb. Cccc. Dddd. Eeee.")
    # every boundary is a breakpoint, but chunks < 12 chars merge forward
    assert all(len(c) >= 11 for c in chunks[:-1])
    assert " ".join(chunks).split() == ["Aaaa.", "Bbbb.", "Cccc.", "Dddd.", "Eeee."]


def test_buffer_window_join_semantics():
    """Reference joins preceding buffer sentences with NO separator and
    following ones with a single space (util.py:262-301)."""
    sp = SemanticSplitter(ConstantEmbedder(), buffer_size=1)
    combined = sp._combine_sentences(["a", "b", "c"])
    assert combined == ["a b", "ab c", "bc"]


def test_recursive_chunk_bounds_and_trailing_merge():
    # HashingEmbedder over varied sentences → varied distances → the strict
    # `distance > percentile` breakpoint rule actually fires (all-equal
    # distances produce NO breakpoints — reference behavior)
    sp = SemanticSplitter(
        HashingEmbedder(),
        buffer_size=0,
        breakpoint_percentile=10,
        min_chunk_size=None,
        sentence_split_regex=r"(?<=\.)\s+",
    )
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    text = " ".join(
        f"Topic {words[i % 6]} sentence {i} discusses {words[(i * 2) % 6]} matters."
        for i in range(100)
    )
    chunks = recursive_chunk(text, sp, min_chunk_size=50, max_chunk_size=300)
    assert len(chunks) >= 2
    # reconstruction: all sentences present in order
    joined = " ".join(chunks)
    assert joined.count("sentence") == 100


def test_hashing_embedder_deterministic_and_discriminative():
    e = HashingEmbedder()
    a = e.embed(["the quick brown fox", "the quick brown fox", "totally different words"])
    assert np.allclose(a[0], a[1])
    # cosine of identical texts = 1; different texts < 1
    cos = float(a[0] @ a[2])
    assert cos < 0.99
