"""Distributed k-means over an embedding column (``list<float>``).

SemDeDup-style semantic clustering (Abbas et al. 2023) runs k-means over
document embeddings, then dedups / curates within clusters. The engine
primitive is Lloyd's algorithm expressed as Ray Data passes:

- **init** — the vectors of the ``k`` smallest ids, found with a per-batch
  partial top-k (never a full sort): deterministic and SQL-expressible.
- **each iteration** — centroids broadcast once (``ray.put``); one
  ``map_batches`` pass assigns every vector to its nearest centroid
  (vectorized ``|x|² - 2x·Cᵀ + |c|²`` argmin) and emits per-batch PARTIAL
  sums (≤k rows per batch: cluster, count, sum-vector blob). Partials are
  tree-reduced — ``repartition(reduce_parts)`` + per-block combine — so the
  driver only ever folds ``reduce_parts × k`` rows regardless of corpus
  size. Empty clusters keep their previous centroid.
- **final pass** — assignment only: (id, cluster).

The corpus is re-read once per pass (iters + 1 passes total); callers
looping many iterations over hot data should ``materialize()`` the
projected input first. Distances and sums are float64 end to end so the
result is reproducible against a DuckDB ``list_distance`` oracle (argmin
flips require distance gaps at the 1e-13 float-noise floor — the same
risk class as the knn_cosine oracles).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ontocast_ray.util import vectors_2d

_PARTIAL_SCHEMA = pa.schema(
    [
        ("cluster", pa.int64()),
        ("count", pa.int64()),
        ("vec_sum", pa.binary()),
    ]
)


def _k_smallest_vectors(
    emb: "ray.data.Dataset", k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Vectors of the k smallest ids — per-batch partial top-k, then a
    driver-side merge of ≤ k rows per block (no full sort shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.select([id_col, vec_col])
        idx = np.argsort(np.asarray(batch[id_col].to_pylist()))[:k]
        return batch.select([id_col, vec_col]).take(pa.array(idx))

    rows = emb.map_batches(partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    return np.asarray([r[vec_col] for r in rows[:k]], dtype=np.float64)


def _assign_ids(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid ids; ties break to the lowest cluster (argmin)."""
    d2 = (
        (vecs * vecs).sum(axis=1, keepdims=True)
        - 2.0 * (vecs @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1)


def _partial_sums_factory(cents_ref, vec_col: str):
    def _partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _PARTIAL_SCHEMA.empty_table()
        cents = ray.get(cents_ref)
        vecs = vectors_2d(batch[vec_col], dtype=np.float64)
        assign = _assign_ids(vecs, cents)
        clusters, counts, blobs = [], [], []
        for c in np.unique(assign):
            members = vecs[assign == c]
            clusters.append(int(c))
            counts.append(len(members))
            blobs.append(members.sum(axis=0).tobytes())
        return pa.table(
            {
                "cluster": pa.array(clusters, type=pa.int64()),
                "count": pa.array(counts, type=pa.int64()),
                "vec_sum": pa.array(blobs, type=pa.binary()),
            }
        )

    return _partials


def _combine_partials(batch: pa.Table) -> pa.Table:
    """Fold one block of partials down to ≤ k rows (tree-reduce step)."""
    if len(batch) == 0:
        return _PARTIAL_SCHEMA.empty_table()
    clusters = np.asarray(batch["cluster"].to_pylist())
    counts = np.asarray(batch["count"].to_pylist())
    blobs = batch["vec_sum"].to_pylist()
    out_c, out_n, out_b = [], [], []
    for c in np.unique(clusters):
        mask = clusters == c
        total = np.zeros_like(np.frombuffer(blobs[0], dtype=np.float64))
        for b in np.flatnonzero(mask):
            total = total + np.frombuffer(blobs[b], dtype=np.float64)
        out_c.append(int(c))
        out_n.append(int(counts[mask].sum()))
        out_b.append(total.tobytes())
    return pa.table(
        {
            "cluster": pa.array(out_c, type=pa.int64()),
            "count": pa.array(out_n, type=pa.int64()),
            "vec_sum": pa.array(out_b, type=pa.binary()),
        }
    )


def kmeans_fit(
    emb: "ray.data.Dataset",
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reduce_parts: int = 16,
) -> np.ndarray:
    """Lloyd's k-means → (k, dim) float64 centroid matrix."""
    cents = _k_smallest_vectors(emb, k, id_col, vec_col)
    for _ in range(n_iters):
        cents_ref = ray.put(cents)
        partials = emb.map_batches(
            _partial_sums_factory(cents_ref, vec_col), batch_format="pyarrow"
        )
        rows = (
            partials.repartition(reduce_parts)
            .map_batches(_combine_partials, batch_format="pyarrow")
            .take_all()
        )
        nxt = cents.copy()  # empty cluster keeps its previous centroid
        sums = {}
        counts = {}
        for r in rows:
            c = r["cluster"]
            vec = np.frombuffer(r["vec_sum"], dtype=np.float64)
            sums[c] = sums.get(c, 0.0) + vec
            counts[c] = counts.get(c, 0) + r["count"]
        for c, total in sorted(sums.items()):
            nxt[c] = total / counts[c]
        cents = nxt
    return cents


def kmeans_assign(
    emb: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """→ (id_col, cluster): nearest-centroid assignment, one pure map."""
    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def _assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {id_col: batch[id_col], "cluster": pa.array([], type=pa.int64())}
            )
        vecs = vectors_2d(batch[vec_col], dtype=np.float64)
        assign = _assign_ids(vecs, ray.get(cents_ref))
        return pa.table(
            {id_col: batch[id_col], "cluster": pa.array(assign, type=pa.int64())}
        )

    return emb.map_batches(_assign, batch_format="pyarrow")


def kmeans_fit_predict(
    emb: "ray.data.Dataset",
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reduce_parts: int = 16,
) -> "ray.data.Dataset":
    """fit + assign → (id_col, cluster)."""
    cents = kmeans_fit(emb, k, n_iters, id_col, vec_col, reduce_parts)
    return kmeans_assign(emb, cents, id_col, vec_col)


def semdedup(
    emb: "ray.data.Dataset",
    k: int = 8,
    n_iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reduce_parts: int = 16,
    chunk: int = 512,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023): k-means, then within each cluster drop
    every vector that has a LOWER-id member with cosine ≥ threshold.

    → (id_col, cluster, keep). The keep rule is order-free (a pure
    predicate on the pair set, not a sequential greedy scan) so it is
    parallelism-invariant and SQL-expressible. One shuffle moves each
    vector to its cluster's reducer; within a cluster the scan is a
    chunked matmul (peak memory ``chunk × cluster_size`` floats). The
    per-cluster reducer bound is the documented SemDeDup contract: pick k
    so n/k fits one worker (the paper uses k ≈ n/10⁴)."""
    import pandas as pd

    cents = kmeans_fit(emb, k, n_iters, id_col, vec_col, reduce_parts)
    cents_ref = ray.put(cents)

    def _with_cluster(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("cluster", pa.array([], type=pa.int64()))
        vecs = vectors_2d(batch[vec_col], dtype=np.float64)
        assign = _assign_ids(vecs, ray.get(cents_ref))
        return batch.append_column("cluster", pa.array(assign, type=pa.int64()))

    def _cluster_keep(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col, kind="stable")
        vecs = np.asarray(list(group[vec_col]), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        nv = vecs / norms
        n = len(nv)
        keep = np.ones(n, dtype=bool)
        for lo in range(1, n, chunk):
            hi = min(lo + chunk, n)
            # rows lo..hi vs ALL earlier rows: any lower-id near neighbor?
            sims = nv[lo:hi] @ nv[:hi].T
            tril = np.tril(sims >= threshold, k=lo - 1)
            keep[lo:hi] = ~tril.any(axis=1)
        return pd.DataFrame(
            {
                id_col: group[id_col].to_numpy(),
                "cluster": group["cluster"].to_numpy(),
                "keep": keep,
            }
        )

    return (
        emb.map_batches(_with_cluster, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_cluster_keep, batch_format="pandas")
    )
