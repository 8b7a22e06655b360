"""Per-stage execution diagnostics for any driver-contract query.

``python -m ontocast_ray.diag <query> [--sf DIR] [--num-cpus N]`` runs one
`queries()` entry, materializes the result, and prints Ray Data's
per-operator stats (`ds.stats()`) plus wall time and row count — the
"read ds.stats() and iterate until wall-time is useful compute" loop as a
command. Use it to spot a stage that starves the pipeline (task-submit
overhead on tiny blocks, one hot reducer, an accidental AllToAll) before
touching any code.

Owns a Ray session only when run as a script (the driver contract: library
code never calls ray.init()).
"""

from __future__ import annotations

import time


def run(query: str, sf_dir: str) -> dict:
    """Execute one query and return {rows, seconds, stats}. Assumes Ray is
    already initialized (the driver/import contract)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    import __ray_entry__ as entry

    fn = entry.queries()[query]
    t0 = time.perf_counter()
    out = fn(sf_dir)
    if isinstance(out, ray.data.Dataset):
        m = out.materialize()
        rows = m.count()
        stats = m.stats()
    elif isinstance(out, (pa.Table, pd.DataFrame)):
        rows = len(out)
        stats = "(driver-side result — no Ray Data lineage to report)"
    else:  # pragma: no cover - contract guards the return types
        rows = -1
        stats = f"(unexpected result type {type(out).__name__})"
    return {
        "query": query,
        "rows": rows,
        "seconds": round(time.perf_counter() - t0, 3),
        "stats": stats,
    }


def main(argv=None) -> None:
    import argparse

    import ray

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", help="a queries() key (see OPERATORS.md)")
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("--num-cpus", type=int, default=8)
    args = p.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
        )
    r = run(args.query, args.sf)
    print(f"{r['query']}: {r['rows']} rows in {r['seconds']}s")
    print(r["stats"])
    ray.shutdown()


if __name__ == "__main__":
    main()
