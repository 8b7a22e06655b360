"""Content hashing kernels.

Semantics match the reference (``/root/reference/ontocast/util.py:33-44``):
document/chunk ids are the first 12 hex digits of the sha256 of the utf-8
text. Both a scalar form and a vectorized (numpy-over-Arrow) form are
provided; the vectorized form is what pipeline stages use inside
``map_batches``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def render_text_hash(text: str, digits: int = 12) -> str:
    """sha256(text)[:digits] — ref util.py:33-44."""
    return hashlib.sha256(text.encode()).hexdigest()[:digits]


def render_text_hash_array(texts, digits: int = 12) -> pa.Array:
    """Vectorized render_text_hash over an Arrow/nd array of strings.

    hashlib releases the GIL per call; for short strings a tight Python loop
    is the practical optimum without a C extension. Returns a pyarrow string
    array suitable for zero-copy append to a batch.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        it = (t.as_py() for t in texts)
    else:
        it = iter(np.asarray(texts, dtype=object))
    sha = hashlib.sha256
    out = [sha(t.encode()).hexdigest()[:digits] if t is not None else None for t in it]
    return pa.array(out, type=pa.string())
