"""Sublimation: split a chunk graph into ontology-addendum vs pure-fact triples.

Port of the reference's two SPARQL SELECT filters
(/root/reference/ontocast/agent/sublimate_ontology.py:31-74): a triple is a
**fact** iff its subject or predicate starts with the chunk namespace, or its
object is an IRI starting with the chunk namespace; everything else is an
**ontology addendum** triple.

The split runs *inside* the extraction loop, once per chunk, where all
triples share one namespace — so it is a per-chunk graph kernel by design
(a cross-chunk Arrow filter would need a per-row namespace comparison, which
has no vectorized kernel and no call site in this engine).
"""

from __future__ import annotations

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
