"""Job entry point for the similarity side: build the cluster-partitioned
IVF ANN index layout from an embeddings table, idempotently.

    ray job submit --working-dir . -- python jobs/ann_index_job.py \
        --embeddings /path/to/embeddings_parquet \
        --index-dir /data/ivf_index --clusters 256 --sample 20000

Runs `ops.similarity.build_ivf_index`: k-means centroids from a bounded
sample, then one full-corpus assignment pass writing hive-partitioned
parquet (`cluster=NN/`) that `knn_ivf_search` / `knn_join_ivf` probe with
column- and partition-pruned reads. A `_MANIFEST.json` (centroids shape,
row count, params) is written LAST, so a re-run can detect a completed
build and skip it (`--force` rebuilds); a crash mid-build leaves no
manifest and the re-run starts clean. Prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--embeddings", required=True,
                        help="parquet dir/file of (vec_id, embedding)")
    parser.add_argument("--index-dir", required=True)
    parser.add_argument("--clusters", type=int, default=64)
    parser.add_argument("--sample", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=3)
    parser.add_argument("--force", action="store_true")
    args = parser.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(ignore_reinit_error=True, logging_level="ERROR")

    manifest_path = os.path.join(args.index_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path) and not args.force:
        with open(manifest_path) as f:
            prev = json.load(f)
        print(json.dumps({**prev, "status": "exists"}))
        if owns_session:
            ray.shutdown()
        return 0

    # a crashed build (no manifest) or --force leaves stale parquet in
    # cluster=NN/ dirs; write_parquet APPENDS uniquely-named files, so
    # stale partitions must be removed or the index holds duplicates
    import glob as _glob
    import shutil as _shutil

    for stale in _glob.glob(os.path.join(args.index_dir, "cluster=*")):
        _shutil.rmtree(stale)
    if os.path.exists(manifest_path):
        os.remove(manifest_path)

    from ontocast_ray.ops.similarity import build_ivf_index
    from ontocast_ray.sources.io import read_documents

    emb = read_documents(args.embeddings, columns=["vec_id", "embedding"])
    t0 = time.time()
    centroids = build_ivf_index(
        emb, args.index_dir,
        n_clusters=args.clusters, sample_size=args.sample, seed=args.seed,
    )
    from ontocast_ray.ops.similarity import ivf_probe_paths

    paths, _ = ivf_probe_paths(
        args.index_dir, set(range(int(centroids.shape[0])))
    )
    n_rows = ray.data.read_parquet(paths).count()
    stats = {
        "status": "built",
        "rows": n_rows,
        "clusters": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
        "sample": args.sample,
        "seed": args.seed,
        "seconds": round(time.time() - t0, 2),
    }
    with open(manifest_path, "w") as f:
        json.dump(stats, f)
    print(json.dumps(stats))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
