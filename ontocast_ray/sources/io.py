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


def is_lance_dataset(path: str) -> bool:
    """Lance dataset layout probe: a directory with a ``_versions`` (or
    ``_latest.manifest``) sidecar and ``data/*.lance`` fragments."""
    if not os.path.isdir(path):
        return False
    if os.path.isdir(os.path.join(path, "_versions")):
        return True
    import glob

    return bool(glob.glob(os.path.join(path, "data", "*.lance")))


def read_documents(path: str, columns: list | None = None):
    """The engine's contract input (north rule: Lance tables of interleaved
    documents): a Lance dataset directory streams via ``ray.data.read_lance``
    when the pylance wheel is present; everything else reads as Parquet.
    This sandbox has no lance wheel, so the Lance branch raises a clearly
    marked NotImplementedError at the exact library call — the dispatch,
    detection, and parquet fallback are real and tested."""
    import ray.data

    if is_lance_dataset(path):
        try:
            import lance  # noqa: F401  (presence gate)
        except ImportError as exc:
            raise NotImplementedError(
                "input is a Lance dataset but the pylance wheel is not "
                "installed; install `pylance` or convert to parquet"
            ) from exc
        return ray.data.read_lance(path, columns=columns)
    if path.endswith((".csv", ".csv.gz", ".tsv", ".tsv.gz")):
        import pyarrow.csv as pacsv

        parse_opts = (
            pacsv.ParseOptions(delimiter="\t")
            if path.endswith((".tsv", ".tsv.gz"))
            else None
        )
        ds = ray.data.read_csv(
            path,
            arrow_open_stream_args=(
                {"compression": "gzip"} if path.endswith(".gz") else None
            ),
            **({"parse_options": parse_opts} if parse_opts else {}),
        )
        return ds.select_columns(columns) if columns else ds
    if path.endswith((".jsonl", ".json", ".jsonl.gz", ".json.gz", ".ndjson")):
        # web corpora usually arrive as (gzipped) JSONL; Ray's JSON reader
        # streams it block-wise — project client-side (no pushdown in JSON)
        ds = ray.data.read_json(
            path,
            arrow_open_stream_args=(
                {"compression": "gzip"} if path.endswith(".gz") else None
            ),
        )
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns)


def write_documents(ds, path: str, fmt: str = "parquet", **kwargs):
    """Sink shim mirroring read_documents: fmt="lance" uses
    ``Dataset.write_lance`` when the wheel exists, else raises the same
    marked NotImplementedError; parquet is the canonical store here."""
    if fmt == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "fmt='lance' requires the pylance wheel; use fmt='parquet'"
            ) from exc
        return ds.write_lance(path, **kwargs)
    if fmt == "jsonl":
        return ds.write_json(path, **kwargs)
    if fmt != "parquet":
        raise ValueError(f"unknown format {fmt!r}")
    return ds.write_parquet(path, **kwargs)


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


def write_bucketed(
    ds,
    out_dir: str,
    key_col: str,
    n_buckets: int = 16,
    sort_within: bool = True,
    min_rows_per_file: int = 50_000,
) -> dict:
    """Hash-bucketed sink: ``out_dir/bucket=NN/*.parquet`` where every row
    of bucket NN satisfies ``hash(key) % n_buckets == NN``, sorted by key
    within the bucket when ``sort_within``. The payoff at scale: two
    tables bucketed the same way co-locate join keys per directory (a
    bucket join reads one directory pair at a time, no shuffle), and a
    failed run re-runs only buckets missing a manifest entry (same
    commit-after-data protocol as the sharded KG sink above).

    Resume: buckets already holding a commit marker are SKIPPED on re-run
    (rows filtered map-side before the shuffle), so a partially-failed run
    re-executes only the missing buckets — same idempotence contract as
    the sharded KG sink. Uncommitted ``bucket=NN`` directories (a crash
    between write_parquet and commit_shard leaves orphan files) are
    removed before re-writing, so resume is file-idempotent: re-runs never
    append duplicate rows to a half-written bucket. Returns the manifest
    dict {bucket: n_rows} including previously-committed buckets. One
    groupby shuffle; bucket sort + row counting run inside the per-bucket
    kernel, never on the driver.
    """
    import json
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ontocast_ray.util import hash_partition

    done = committed_shards(out_dir)
    # file-idempotence: purge orphan data from buckets that never committed
    if os.path.isdir(out_dir):
        for name in os.listdir(out_dir):
            if not name.startswith("bucket="):
                continue
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if b not in done:
                shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    prior: dict[int, int] = {}
    for b in sorted(done):
        with open(os.path.join(manifest_dir(out_dir), f"{b}.json"), encoding="utf-8") as fh:
            prior[b] = int(json.load(fh).get("rows", 0))
    if len(done) >= n_buckets:
        return prior

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = hash_partition(batch[key_col], n_buckets)
        out = batch.append_column("bucket", pa.array(buckets))
        if done:  # resume: committed buckets never cross the shuffle
            keep = ~np.isin(buckets, list(done))
            out = out.filter(pa.array(keep))
        return out

    def bucket_kernel(df: "pd.DataFrame") -> "pd.DataFrame":
        if sort_within and len(df):
            df = df.sort_values(key_col, kind="mergesort")
        return df.reset_index(drop=True)

    bucketed = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_kernel, batch_format="pandas")
        .materialize()
    )
    if bucketed.count() > 0:
        bucketed.write_parquet(
            out_dir,
            partition_cols=["bucket"],
            min_rows_per_file=min_rows_per_file,
        )
    # per-bucket lineage: counts are a tiny aggregate over the materialized
    # dataset (never the rows themselves); commit markers AFTER the data
    counts: dict[int, int] = {}
    for b in bucketed.select_columns(["bucket"]).iter_batches(batch_format="pandas"):
        for k, v in b["bucket"].value_counts().items():
            counts[int(k)] = counts.get(int(k), 0) + int(v)
    for b, n in sorted(counts.items()):
        commit_shard(out_dir, b, {"rows": n, "key_col": key_col})
    counts.update(prior)
    return counts


def read_bucket(out_dir: str, bucket: int, columns: list | None = None):
    """Read ONE bucket directory of a ``write_bucketed`` layout — the
    pruned-read half of a bucket join."""
    import ray.data

    return ray.data.read_parquet(
        os.path.join(out_dir, f"bucket={bucket}"), columns=columns
    )


def compact_parquet(
    in_path: str,
    out_dir: str,
    min_rows_per_file: int = 262_144,
    columns: list | None = None,
) -> dict:
    """Rewrite a parquet dataset with consolidated files — the tiny-files
    remedy as a standalone tool. Shuffle-heavy stages leave hundreds of
    near-empty files whose metadata alone costs ~10 s per session to
    read (measured here); running this once after such a job makes every
    later read cheap. Streaming read → streaming write, ``columns=``
    prunes at the source; returns {rows, files_in, files_out}.
    """
    import glob as _glob
    import os as _os

    import ray.data

    files_in = len(_glob.glob(_os.path.join(in_path, "**", "*.parquet"),
                              recursive=True)) or 1
    ds = ray.data.read_parquet(in_path, columns=columns)
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    files_out = len(_glob.glob(_os.path.join(out_dir, "**", "*.parquet"),
                               recursive=True))
    return {
        "rows": ray.data.read_parquet(out_dir).count(),
        "files_in": files_in,
        "files_out": files_out,
    }
