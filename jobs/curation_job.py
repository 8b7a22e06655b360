"""Job entry point for the training-data side: curate a document corpus and
write the packed-sequence placement table as a resumable bucketed layout.

    ray job submit --working-dir . -- python jobs/curation_job.py \
        --docs /path/to/documents_parquet \
        --out /tmp/curated --lang en --capacity 2048 --buckets 64

Runs the curation pipeline (language gate → quality gate → exact dedup →
concat-and-split packing; `pipelines/curation.py`) and sinks the placements
with `write_bucketed` — one `bucket=NN/` directory per doc-hash bucket plus
per-bucket lineage manifests, so a re-run of a partially-failed job can
verify which buckets committed. Prints a one-line JSON summary. On a real
cluster the same script is submitted unchanged (`ray.init()` with no address
joins the cluster from inside a job).
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
    parser.add_argument("--docs", required=True, help="parquet dir/file of (doc_id, text)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--lang", default="en")
    parser.add_argument("--min-alpha-ratio", type=float, default=0.75)
    parser.add_argument("--capacity", type=int, default=2048)
    parser.add_argument("--buckets", type=int, default=64)
    args = parser.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(ignore_reinit_error=True, logging_level="ERROR")

    from ontocast_ray.pipelines.curation import curate_corpus
    from ontocast_ray.sources.io import read_documents, write_bucketed

    docs = read_documents(args.docs, columns=["doc_id", "text"])
    t0 = time.time()
    placements = curate_corpus(
        docs,
        lang=args.lang,
        min_alpha_ratio=args.min_alpha_ratio,
        capacity=args.capacity,
    )
    counts = write_bucketed(
        placements, args.out, key_col="doc_id", n_buckets=args.buckets
    )
    stats = {
        "docs_kept": sum(counts.values()),
        "buckets": len(counts),
        "capacity": args.capacity,
        "out": args.out,
        "wall_sec": round(time.time() - t0, 2),
    }
    print(json.dumps(stats))
    if owns_session:  # don't tear down a caller-owned (test/driver) session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
