"""Broadcast (map-side) joins for small dimension tables.

The scale rule: a join whose small side fits in memory must NOT shuffle the
big side — put the small side in the object store once (``ray.put``), read
it in every map task, and map keys to values inside ``map_batches``. The
classic star-schema case (customer → nation → region) is the demo: nation
and region are tiny, customer streams through untouched.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def collect_lookup(ds: "ray.data.Dataset", key_col: str, value_col: str) -> dict:
    """Materialize a small dimension table into a {key: value} dict."""
    return {r[key_col]: r[value_col] for r in ds.take_all()}


class BroadcastLookup:
    """map_batches stage: append ``out_col`` = lookup[batch[key_col]].

    The dict ships via the object store once per actor/worker, not per batch.
    """

    def __init__(self, lookup_ref, key_col: str, out_col: str):
        self.lookup = ray.get(lookup_ref)
        self.key_col = key_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        values = [self.lookup.get(k) for k in keys]
        return batch.append_column(self.out_col, pa.array(values))


def broadcast_join(
    big: "ray.data.Dataset",
    small: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    out_col: str,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """big ⋈ small on key_col, small side broadcast (no shuffle of big)."""
    from ontocast_ray.util import pool

    lookup_ref = ray.put(collect_lookup(small, key_col, value_col))
    return big.map_batches(
        BroadcastLookup,
        fn_constructor_kwargs={
            "lookup_ref": lookup_ref,
            "key_col": key_col,
            "out_col": out_col,
        },
        batch_format="pyarrow",
        concurrency=pool(concurrency),
    )
