"""Driver-style correctness + cost sweep of every queries() entry.

    PYTHONPATH=. python tools/gate_sweep.py [sf_dir] [num_cpus]

Runs each query at the driver's gate SF (default sf0.01), compares
against its oracle (NaT/NaN-aware, dtype-insensitive — the driver's own
rules), and prints per-query wall time sorted slowest-first plus a BAD
summary. Use before every round close: the heaviest legs are the ones a
driver timeout would hit first.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    drop = [
        c for c in df.columns
        if df[c].dtype == object and len(df)
        and isinstance(df[c].iloc[0], (list, tuple))
    ]
    df = df.drop(columns=drop)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _values_match(a, b) -> bool:
    import numpy as np

    if a.dtype.kind == "f" or b.dtype.kind == "f":
        av, bv = a.astype(float), b.astype(float)
        return bool(np.allclose(av, bv, rtol=0, atol=0, equal_nan=True))
    na, nb = a.isna(), b.isna()
    if not (na == nb).all():
        return False
    return bool((a[~na].to_numpy() == b[~nb].to_numpy()).all())


def main(sf="/root/testdata/sf0.01", num_cpus=32) -> int:
    import duckdb
    import pandas as pd
    import pyarrow as pa

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=int(num_cpus),
            include_dashboard=False,
        )
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    def to_pd(r):
        if isinstance(r, pd.DataFrame):
            return r
        if isinstance(r, pa.Table):
            return r.to_pandas()
        return r.to_pandas()

    qs, oracles = entry.queries(), entry.oracle_sql()
    # goldens are pinned at the driver's sf0.01 gate; comparing them at
    # another SF is meaningless (content-hash IRIs etc. differ)
    golden = set(getattr(entry, "_GOLDEN_QUERIES", []))
    compare_goldens = os.path.basename(str(sf).rstrip("/")) == "sf0.01"
    results = {}
    t_all = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            rdf = to_pd(fn(sf))
            dt = time.perf_counter() - t0
            status = "rows_only"
            if name in golden and not compare_goldens:
                status = "golden(sf0.01-pinned)"
            elif name in oracles:
                a = _canon(rdf)
                b = _canon(con.execute(oracles[name]).df())
                if len(a) != len(b):
                    status = f"ROWS {len(a)} vs {len(b)}"
                elif list(a.columns) != list(b.columns):
                    status = f"SCHEMA {list(a.columns)} vs {list(b.columns)}"
                else:
                    bad = [c for c in a.columns
                           if not _values_match(a[c], b[c])]
                    status = "OK" if not bad else f"VALUES {bad}"
            results[name] = (round(dt, 2), len(rdf), status)
        except Exception as ex:  # noqa: BLE001 - sweep must finish
            results[name] = (
                round(time.perf_counter() - t0, 2), -1,
                f"ERROR {type(ex).__name__}: {str(ex)[:120]}",
            )
    print(json.dumps(
        {"total_s": round(time.perf_counter() - t_all, 1),
         "n": len(results)}
    ))
    for name, (dt, n, st) in sorted(
        results.items(), key=lambda kv: -kv[1][0]
    ):
        print(f"{dt:8.2f}s {n:8d} {st:<14} {name}")
    bad = {k: v for k, v in results.items()
           if v[2] not in ("OK", "rows_only", "golden(sf0.01-pinned)")
           and not (k == "minhash_dedup_pairs" and not compare_goldens)}
    print("BAD:", json.dumps(bad) if bad else "none")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
