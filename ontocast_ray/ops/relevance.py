"""BM25 keyword relevance scoring + global top-k retrieval.

A minimal distributed search primitive for corpus triage ("find the docs
most about X"): score every document against a small bag of query terms
with BM25 and return the global top-k.

Execution shape at 100 TB:

- Pass 1 (corpus statistics) is a pure-map partial aggregate: each batch
  emits ONE row of (n_docs, total_len, df per term); a single C-implemented
  ``Sum`` aggregate reduces it to O(|terms|) driver-side scalars. The text
  never shuffles.
- Pass 2 re-reads the corpus, scores each batch vectorized (one
  ``findall`` + one explode + one ``bincount`` per term), then PRUNES to
  the batch-local top-k before the only wide step — the final
  ``sort + limit`` therefore sees at most k × n_blocks rows, not the
  corpus.
- The idf/avgdl constants are a few floats closed over the scoring kernel
  (no broadcast machinery needed).

Float-determinism contract with the SQL oracle: k1/b default to exactly
representable doubles (1.5, 0.75), the score accumulates term-by-term in
query order (matching SQL's left-to-right ``+``), and every expression is
written with the same association as the oracle — so scores match DuckDB
bit-for-bit, not just within tolerance. Tokenization is the
``quality_stats`` word rule (``[a-z]+`` over lowercased text).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ontocast_ray.ops.text import _explode_words

_WORD_RE = r"[a-z]+"


def corpus_term_stats(
    docs: "ray.data.Dataset",
    terms: list[str],
    text_col: str = "text",
) -> tuple[int, int, np.ndarray]:
    """One streaming pass → (n_docs, total_token_len, df per term)."""
    from ray.data.aggregate import Sum

    terms = list(terms)

    def _stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        words = texts.str.lower().str.findall(_WORD_RE)
        lens = words.str.len().to_numpy().astype(np.int64)
        idx, vals = _explode_words(words)
        out = {
            "n_docs": pa.array([len(texts)], type=pa.int64()),
            "total_len": pa.array([int(lens.sum())], type=pa.int64()),
        }
        for ti, t in enumerate(terms):
            hit = np.bincount(idx[vals == t], minlength=len(texts)) > 0
            out[f"df_{ti}"] = pa.array([int(hit.sum())], type=pa.int64())
        return pa.table(out)

    aggs = [Sum("n_docs", alias_name="n_docs"), Sum("total_len", alias_name="total_len")]
    aggs += [Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    res = docs.map_batches(_stats, batch_format="pyarrow").aggregate(*aggs)
    n = int(res["n_docs"] or 0)
    total = int(res["total_len"] or 0)
    dfs = np.array([int(res[f"df_{i}"] or 0) for i in range(len(terms))], dtype=np.float64)
    return n, total, dfs


def bm25_topk(
    docs: "ray.data.Dataset",
    terms: list[str],
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ (doc_id, bm25): the global top-``k`` documents by BM25 score
    against ``terms``, ties broken by ascending ``doc_id``.

    idf is the always-positive Lucene variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``.
    """
    import math

    terms = list(terms)
    n, total, dfs = corpus_term_stats(docs, terms, text_col)
    avgdl = total / max(n, 1)
    # math.log (libm), NOT np.log: numpy's vectorized log deviates from
    # libm by 1 ulp on some inputs, while DuckDB's ln is libm — this keeps
    # scores bit-identical to the SQL oracle
    idf = np.array(
        [math.log(1.0 + (n - df + 0.5) / (df + 0.5)) for df in dfs],
        dtype=np.float64,
    )
    k1_plus_1 = k1 + 1.0

    def _score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas().fillna("")
        nrows = len(texts)
        words = texts.str.lower().str.findall(_WORD_RE)
        dl = words.str.len().to_numpy().astype(np.float64)
        idx, vals = _explode_words(words)
        denom_norm = k1 * (1.0 - b + b * (dl / avgdl))
        score = np.zeros(nrows, dtype=np.float64)
        for ti in range(len(terms)):
            tf = np.bincount(idx[vals == terms[ti]], minlength=nrows).astype(
                np.float64
            )
            score = score + idf[ti] * (tf * k1_plus_1) / (tf + denom_norm)
        out = pa.table(
            {
                id_col: batch[id_col],
                "bm25": pa.array(score, type=pa.float64()),
            }
        )
        if nrows > k:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -score))[:k]
            out = out.take(pa.array(np.sort(order)))
        return out

    partial = docs.map_batches(_score, batch_format="pyarrow")
    return partial.sort(["bm25", id_col], descending=[True, False]).limit(k)


def reciprocal_rank_fusion(
    rankings: "list",
    id_col: str = "doc_id",
    rank_col: str = "r",
    k0: int = 60,
    k: int = 10,
) -> "ray.data.Dataset":
    """→ (doc_id, rrf, rank≤k): Reciprocal Rank Fusion (Cormack et al.
    2009) of several ranked lists — THE standard hybrid-retrieval merge
    (BM25 ⊕ dense kNN): ``rrf(d) = Σ_lists 1/(k0 + rank_list(d))``,
    absent-from-a-list contributes 0.

    Ranked lists are top-k retrieval outputs — bounded by k per list BY
    CONTRACT — so the fuse is a driver-side exact merge of a few hundred
    rows (the corpus never appears here; it was scanned by the upstream
    retrievers). The float sum is a FIXED left-to-right fold over the
    lists (list order is part of the spec), so the SQL mirror
    (COALESCE-chain in the same order) is bit-exact.
    """
    import numpy as np
    import pyarrow as pa

    import ray.data

    scores: dict[int, float] = {}
    for ds in rankings:
        for row in ds.take_all():
            d = int(row[id_col])
            scores[d] = scores.get(d, 0.0) + 1.0 / (k0 + int(row[rank_col]))
    order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ray.data.from_arrow(
        pa.table(
            {
                id_col: pa.array([d for d, _ in order], type=pa.int64()),
                "rrf": pa.array([s for _, s in order], type=pa.float64()),
                "rank": pa.array(
                    np.arange(1, len(order) + 1, dtype=np.int64)
                ),
            }
        )
    )
