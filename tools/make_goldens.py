#!/usr/bin/env python
"""Regenerate pinned golden parquet for the seed-deterministic driver queries.

These queries compute hash/model/pipeline outputs that ANSI SQL cannot
re-derive, but every one of them is a pure function of (input parquet,
seeds baked into the code) — verified invariant across parallelism levels
(see .claude/skills/verify/SKILL.md). The golden file pins the full value
set; the driver's oracle is `SELECT * FROM read_parquet(<golden>)`, turning
the former rows-only checks into rows+schema+value-hash checks.

Regenerate after any intentional kernel change:
    python tools/make_goldens.py            # sf0.01 (the driver's gate SF)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _golden_queries():
    """Single source of truth: the driver contract's golden-backed list."""
    import __ray_entry__ as entry

    return entry._GOLDEN_QUERIES


def _empty_schema(name):
    import pyarrow as pa

    # schema() is None for fully-empty pandas-block datasets
    fallbacks = {
        "embedding_dedup_pairs": pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
        ),
    }
    return fallbacks[name]


def collect_arrow(ds, name):
    import pyarrow as pa

    if isinstance(ds, pa.Table):  # queries may return arrow directly
        return ds
    batches = list(ds.iter_batches(batch_size=4096, batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches, promote_options="default")
    sch = ds.schema()
    if sch is None:
        return _empty_schema(name).empty_table()
    return pa.schema(list(zip(sch.names, sch.types))).empty_table()


def main(sf_dir: str = "/root/testdata/sf0.01", label: str = "sf0.01") -> None:
    import pyarrow.parquet as pq
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entry

    out_dir = os.path.join(REPO, "goldens", label)
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    for name in _golden_queries():
        tbl = collect_arrow(qs[name](sf_dir), name)
        try:  # stable on-disk row order → reviewable git diffs on regen
            tbl = tbl.sort_by([(c, "ascending") for c in tbl.column_names])
        except Exception:
            pass  # unsortable column types (lists/binary); order is irrelevant
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"{name}: {tbl.num_rows} rows -> {path}")
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
