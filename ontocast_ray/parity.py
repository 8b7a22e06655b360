"""Triple-set precision/recall utilities (the BASELINE gate metric).

P/R is computed on expanded-URI triple sets (the reference also compares on
expanded URIs internally — ref /root/reference/ontocast/tool/
aggregate.py:427-442). Blank nodes are compared structurally-blind (label
ignored) by replacing bnode ids with a fixed marker — fixture graphs contain
no bnodes, so this only matters for user graphs.
"""

from __future__ import annotations

from ontocast_ray.rdf.graph import TripleGraph
from ontocast_ray.rdf.terms import BNode


def _norm(term):
    if isinstance(term, BNode):
        return BNode("_")
    return term


def triple_set(graph: TripleGraph) -> set:
    return {(_norm(s), _norm(p), _norm(o)) for s, p, o in graph}


def precision_recall(predicted: TripleGraph, reference: TripleGraph) -> tuple[float, float]:
    pred = triple_set(predicted)
    ref = triple_set(reference)
    if not pred and not ref:
        return 1.0, 1.0
    tp = len(pred & ref)
    precision = tp / len(pred) if pred else 0.0
    recall = tp / len(ref) if ref else 1.0
    return precision, recall
