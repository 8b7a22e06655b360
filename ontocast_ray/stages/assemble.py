"""Span assembly: interleaved (text|media) spans → document text.

Replaces the reference's convert_document/docling stage for the north-rule
input shape (ref /root/reference/ontocast/agent/convert_document.py:17-60 —
there, files become markdown text; here, documents already arrive as span
sequences). Text = concatenation of the ``text`` fields of kind=="text"
spans in span order (span ``offset`` is by construction the cumulative
length of preceding text spans). Media spans contribute no text and are
passed through untouched — the span-sequence invariant is checked in tests.

Stateless task stage: vectorized over Arrow; the only Python loop is over
the span *lists* (one iteration per doc, not per character).
"""

from __future__ import annotations

import pyarrow as pa


def assemble_spans(batch: pa.Table) -> pa.Table:
    """Append a ``text`` column assembled from each row's text spans."""
    spans_col = batch["spans"]
    texts = []
    for row in spans_col.to_pylist():
        if not row:
            texts.append("")
            continue
        texts.append("".join(s["text"] for s in row if s["kind"] == "text"))
    return batch.append_column("text", pa.array(texts, type=pa.string()))
