"""Distributed connected components over duplicate-pair edges.

The dedup end-game: pair lists (exact / MinHash / SimHash / embedding)
become KEEP-LISTS by grouping pairs into components and keeping each
component's min doc_id. Components need transitive closure, which no
single groupby expresses — this is the alternating large-star / small-star
map-reduce algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SOCC'14): every round is two edge-scale groupbys, converging
in O(log n) rounds; nothing corpus-sized is touched and the driver only
sees per-round COUNTS for the convergence check.

Edge rows are two int64s — at 100 TB the edge set (candidate pairs) is
orders of magnitude smaller than the corpus, so each round's shuffle is
cheap relative to a single corpus pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _large_star(group: pd.DataFrame) -> pa.Table:
    """For each u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u."""
    out_u, out_v = [], []
    for u, rows in group.groupby("u", sort=False):
        neigh = rows["v"].to_numpy()
        m = min(int(neigh.min()), int(u))
        big = neigh[neigh > u]
        out_u.extend(int(v) for v in big)
        out_v.extend([m] * len(big))
    return pa.table({"u": pa.array(out_u, type=pa.int64()),
                     "v": pa.array(out_v, type=pa.int64())})


def _small_star(group: pd.DataFrame) -> pa.Table:
    """For each u over edges (u, v≤u): m = min(N ∪ {u});
    emit (v, m) for v in N ∪ {u}, v != m."""
    out_u, out_v = [], []
    for u, rows in group.groupby("u", sort=False):
        neigh = rows["v"].to_numpy()
        m = min(int(neigh.min()), int(u))
        nodes = set(int(v) for v in neigh)
        nodes.add(int(u))
        nodes.discard(m)
        out_u.extend(nodes)
        out_v.extend([m] * len(nodes))
    return pa.table({"u": pa.array(out_u, type=pa.int64()),
                     "v": pa.array(out_v, type=pa.int64())})


def _both_directions(batch: pa.Table) -> pa.Table:
    u = batch["u"].combine_chunks()
    v = batch["v"].combine_chunks()
    return pa.Table.from_arrays(
        [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])], schema=_EDGE_SCHEMA
    )


def _as_max_min(batch: pa.Table) -> pa.Table:
    u = batch["u"].to_numpy(zero_copy_only=False)
    v = batch["v"].to_numpy(zero_copy_only=False)
    return pa.table({"u": pa.array(np.maximum(u, v)), "v": pa.array(np.minimum(u, v))})


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    max_rounds: int = 50,
    n_blocks: int = 8,
) -> "ray.data.Dataset":
    """→ (doc_id, component): every node of the pair graph labeled with its
    component's min id. Alternating star rounds until the edge multiset is
    stable (checked via count + checksum aggregates — tiny driver values).

    ``n_blocks`` bounds the per-round shuffle grid: edges are pair-scale
    (tiny next to the corpus), so each round's two groupbys run over a few
    coalesced blocks instead of inheriting the previous round's reducer
    count — raise it only for edge sets that exceed worker memory / 8.
    """
    from ray.data.aggregate import Count, Sum

    edges = pairs.map_batches(
        lambda b: pa.table(
            {"u": b[a_col].cast(pa.int64()), "v": b[b_col].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).map_batches(_as_max_min, batch_format="pyarrow").repartition(n_blocks).materialize()

    def _signature(ds) -> tuple[int, int]:
        def _chk(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                mix = (u * np.uint64(0x9E3779B97F4A7C15)) ^ v
            # small modulus: per-block values must SUM within int64 range
            return pa.table({"n": pa.array([len(u)], type=pa.int64()),
                             "chk": pa.array([int(mix.sum() % (1 << 40))], type=pa.int64())})

        agg = ds.map_batches(_chk, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"), Sum("chk", alias_name="chk")
        )
        return (agg.get("n") or 0, agg.get("chk") or 0)

    prev = None
    for _ in range(max_rounds):
        large = (
            edges.map_batches(_both_directions, batch_format="pyarrow")
            .groupby("u")
            .map_groups(_large_star, batch_format="pandas")
        )
        merged = large.union(edges).map_batches(_as_max_min, batch_format="pyarrow")
        edges = (
            merged.groupby("u")
            .map_groups(_small_star, batch_format="pandas")
            .map_batches(_as_max_min, batch_format="pyarrow")
        )
        # distinct: star rounds re-derive the same edge from many paths
        edges = (
            edges.groupby(["u", "v"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["u", "v"])
            .repartition(n_blocks)
            .materialize()
        )
        sig = _signature(edges)
        if sig == prev:
            break
        prev = sig

    # converged: every remaining edge is (node, component_min); add the
    # representatives themselves
    def finalize(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([u, v])),
                "component": pa.array(np.concatenate([v, v])),
            }
        )

    from ray.data.aggregate import Min

    return (
        edges.map_batches(finalize, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Min("component", alias_name="component"))
    )


def apply_keep_list(
    docs: "ray.data.Dataset",
    keep_list: "ray.data.Dataset",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Drop non-representative duplicates from the corpus.

    The DROPPED side (components minus their representatives) is the small
    side — candidates are rare — so it broadcasts once via ray.put and the
    corpus filters map-side: no corpus shuffle, the classic broadcast
    anti-join.
    """
    import ray

    dropped_rows = keep_list.map_batches(
        lambda b: b.filter(pa.compute.invert(b["keep"])).select(["doc_id"]),
        batch_format="pyarrow",
    ).take_all()
    dropped = {r["doc_id"] for r in dropped_rows}
    dropped_ref = ray.put(dropped)

    class Filter:
        def __init__(self):
            self.dropped = ray.get(dropped_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            mask = ~pd.Series(ids).isin(self.dropped).to_numpy()
            return batch.filter(pa.array(mask))

    return docs.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 4))


def dedup_keep_list(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
) -> "ray.data.Dataset":
    """→ (doc_id, keep_id, keep): keep_id = component min; keep = doc IS the
    representative. Docs absent from the pair graph are implicitly kept."""
    comp = connected_components(pairs, a_col=a_col, b_col=b_col)

    def mark(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        c = batch["component"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "keep_id": batch["component"],
                "keep": pa.array(d == c),
            }
        )

    return comp.map_batches(mark, batch_format="pyarrow")
