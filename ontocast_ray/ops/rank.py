"""Per-group top-k — the 'best N documents per source/domain' selector a
curation pipeline runs before sampling.

Scale shape: every batch computes a PARTIAL top-k per group (vectorized
pandas sort + groupby.head), so the shuffle moves at most k rows per
(group, batch); the final pass groups on a coarse hash partition and loops
groups inside one kernel (the engine-wide fine-key pattern)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ontocast_ray.util import hash_partition


def topk_per_group(
    ds: "ray.data.Dataset",
    group_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    descending: bool = True,
    n_parts: int = 64,
) -> "ray.data.Dataset":
    """→ input columns + rank (1-based within group, ordered by order_col
    desc/asc with tiebreak_col asc)."""
    by = [order_col, tiebreak_col]
    ascending = [not descending, True]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        top = (
            df.sort_values(by, ascending=ascending)
            .groupby(group_col, sort=False)
            .head(k)
        )
        top = top.assign(part=hash_partition(top[group_col].to_numpy(), n_parts))
        return pa.Table.from_pandas(top, preserve_index=False)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, rows in group.groupby(group_col, sort=False):
            top = rows.sort_values(by, ascending=ascending).head(k).copy()
            top["rank"] = range(1, len(top) + 1)
            frames.append(top)
        out = pd.concat(frames, ignore_index=True) if frames else group.assign(rank=[])
        return out.drop(columns=["part"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pandas")
    )
