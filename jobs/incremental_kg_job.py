"""Job entry point for the DAILY-CRAWL incremental KG update
(``ray job submit`` contract, like jobs/kg_job.py):

    ray job submit --working-dir . -- python jobs/incremental_kg_job.py \
        --new-docs /path/to/todays_interleaved_docs \
        --entities /state/entities_parquet_dir \
        --out /state/entities_parquet_dir_v2 --triples-out /tmp/day2_triples

Runs the flagship extraction over TODAY'S batch only, merges the new
entity aggregates into yesterday's global entity table with
``incremental_global_entities`` (merge rules are associative — the result
equals a full-batch recompute over old∪new; property-tested in
tests/test_crossdoc.py), and writes the updated table + the new batch's
triples. IDEMPOTENT: if --out already holds a committed manifest for this
input digest, the job exits 0 without recomputation (the curation_job
manifest rule). Yesterday's table is never reprocessed and never shipped
through a shuffle — only the new batch's aggregates move.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--new-docs", required=True,
                        help="parquet dir/file of today's (doc_id, spans)")
    parser.add_argument("--entities", required=True,
                        help="yesterday's entity table (parquet dir)")
    parser.add_argument("--out", required=True,
                        help="output dir for the updated entity table")
    parser.add_argument("--triples-out", default=None,
                        help="optional output dir for today's triples")
    parser.add_argument("--min-chunk-size", type=int, default=2000)
    parser.add_argument("--max-chunk-size", type=int, default=20000)
    args = parser.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    from ontocast_ray.pipelines.crossdoc import incremental_global_entities
    from ontocast_ray.pipelines.kg import build_kg_pipeline
    from ontocast_ray.sources.io import read_documents

    digest = hashlib.sha256(
        json.dumps([os.path.abspath(args.new_docs),
                    os.path.abspath(args.entities)]).encode()
    ).hexdigest()[:16]
    manifest = os.path.join(args.out, f"_COMMITTED.{digest}.json")
    if os.path.exists(manifest):
        print(json.dumps({"skipped": True, "manifest": manifest}))
        if owns_session:
            ray.shutdown()
        return 0

    t0 = time.time()
    new_docs = read_documents(args.new_docs)
    triples = build_kg_pipeline(
        new_docs,
        min_chunk_size=args.min_chunk_size,
        max_chunk_size=args.max_chunk_size,
    ).materialize()  # consumed by the merge and (optionally) the sink
    old_table = ray.data.read_parquet(args.entities)
    updated = incremental_global_entities(old_table, triples).materialize()

    tmp = args.out + ".tmp"
    updated.write_parquet(tmp, min_rows_per_file=65_536)
    # atomic-ish publish: write to .tmp, rename files into place, commit
    os.makedirs(args.out, exist_ok=True)
    for f in sorted(os.listdir(tmp)):
        os.replace(os.path.join(tmp, f), os.path.join(args.out, f))
    os.rmdir(tmp)
    n_triples = None
    if args.triples_out:
        triples.write_parquet(args.triples_out, min_rows_per_file=65_536)
        n_triples = triples.count()

    stats = {
        "new_docs": new_docs.count(),
        "entities": updated.count(),
        "triples_written": n_triples,
        "wall_sec": round(time.time() - t0, 2),
        "manifest": manifest,
    }
    with open(manifest, "w") as fh:
        json.dump(stats, fh)
    print(json.dumps(stats))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
