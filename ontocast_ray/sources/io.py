"""Partitioned, resumable Parquet IO with per-partition lineage manifests.

The canonical store is partitioned Parquet (the environment has no Lance
wheel; the layout below is Lance-dataset-shaped — one directory per
partition range + a sidecar manifest — and the writer is a thin shim, so a
``write_lance`` backend can be swapped in without touching callers).

Layout:
    out_dir/
      part=<shard>/....parquet          # one directory per doc_id-hash shard
      _manifest/<shard>.json            # committed AFTER the shard's data

A shard's manifest is written only after its Parquet files are fully
written, so a crashed run leaves either no manifest (shard re-runs) or a
complete shard (skipped on resume) — idempotent resume per the north rule.
"""

from __future__ import annotations

import json
import os


def shard_of(doc_id: str, n_shards: int) -> int:
    """Stable doc_id → shard (siphash, fixed key; independent of
    PYTHONHASHSEED). Must agree with the vectorized batch filter in
    pipelines/kg.py, so both delegate to util.hash_partition."""
    from ontocast_ray.util import hash_partition

    return int(hash_partition([doc_id], n_shards)[0])


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def committed_shards(out_dir: str) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            try:
                out.add(int(name[:-5]))
            except ValueError:
                continue
    return out


def commit_shard(out_dir: str, shard: int, stats: dict) -> str:
    mdir = manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"{shard}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"shard": shard, "status": "committed", **stats}, fh)
    os.replace(tmp, path)  # atomic commit marker
    return path


def shard_out_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"part={shard}")
