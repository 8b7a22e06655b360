"""Ray stage wrapper for per-document canonicalization.

``groupby("doc_id").map_groups(canonicalize_doc_group)`` — shuffle #1 of the
pipeline (key: doc_id, matching the reference's strictly-per-document
aggregation scope, ref /root/reference/ontocast/agent/aggregate_facts.py:23-25).
Chunk rows are re-ordered by chunk_idx inside the group before the fold —
the greedy disambiguation is insertion-order dependent (SURVEY §7).

Non-fact rows (ontology addendum, status) pass through unchanged, so the
whole triple stream takes exactly one shuffle.
"""

from __future__ import annotations

import pyarrow as pa

from ontocast_ray.functions.uris import iri2namespace
from ontocast_ray.model import TRIPLES_SCHEMA, graph_to_rows, rows_to_graph
from ontocast_ray.stages.canonicalize import ChunkGraph, ChunkGraphAggregator


def canonicalize_doc_group(group: pa.Table) -> pa.Table:
    """Aggregate one document's fact triples; pass other scopes through."""
    scope = group["graph_scope"].to_pylist()
    fact_idx = [i for i, s in enumerate(scope) if s == "facts"]
    other_idx = [i for i, s in enumerate(scope) if s != "facts"]

    out_parts = []
    if other_idx:
        out_parts.append(group.take(other_idx))

    if fact_idx:
        facts = group.take(fact_idx)
        doc_id = facts["doc_id"][0].as_py()
        doc_iri = facts["doc_iri"][0].as_py()
        doc_namespace = iri2namespace(doc_iri)

        # split into per-chunk graphs, ordered by chunk_idx (determinism!)
        chunk_idxs = facts["chunk_idx"].to_pylist()
        chunk_hids = facts["chunk_hid"].to_pylist()
        per_chunk: dict[tuple, list[int]] = {}
        for i, (cidx, chid) in enumerate(zip(chunk_idxs, chunk_hids)):
            per_chunk.setdefault((cidx, chid), []).append(i)

        chunks = []
        for (cidx, chid) in sorted(per_chunk.keys()):
            rows = facts.take(per_chunk[(cidx, chid)])
            graph = rows_to_graph(
                rows["subject"].to_pylist(),
                rows["predicate"].to_pylist(),
                rows["object"].to_pylist(),
                rows["object_is_literal"].to_pylist(),
                rows["object_datatype"].to_pylist(),
                rows["object_lang"].to_pylist(),
            )
            chunk = ChunkGraph(hid=chid, doc_iri=doc_iri, graph=graph)
            chunk.sanitize()  # ref aggregate_facts.py:20-21
            chunks.append(chunk)

        aggregator = ChunkGraphAggregator()
        aggregated = aggregator.aggregate_graphs(chunks, doc_namespace)
        cols = graph_to_rows(
            aggregated,
            doc_id=doc_id,
            doc_iri=doc_iri,
            chunk_hid="",
            chunk_idx=-1,
            graph_scope="facts",
        )
        out_parts.append(
            pa.table(
                {
                    name: pa.array(cols[name], type=TRIPLES_SCHEMA.field(name).type)
                    for name in TRIPLES_SCHEMA.names
                }
            )
        )

    if not out_parts:
        return TRIPLES_SCHEMA.empty_table()
    return pa.concat_tables(out_parts, promote_options="default")
