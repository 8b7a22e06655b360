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


def _load_graph(path: str) -> TripleGraph:
    """Load a graph from .ttl or a triples .parquet file/dir."""
    import glob
    import os

    if path.endswith(".ttl"):
        from ontocast_ray.rdf.turtle import parse_turtle

        with open(path, "r", encoding="utf-8") as fh:
            return parse_turtle(fh.read())
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ontocast_ray.model import table_to_graph

    files = [path] if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    return table_to_graph(pa.concat_tables([pq.read_table(f) for f in files]))


def main(argv=None) -> int:
    """CLI: triple-set P/R diff between two graphs (ttl or triples parquet).

    The engine-side analogue of the reference's cmp_states diff CLI
    (ref /root/reference/ontocast/cli/cmp_states.py:20-86), operating on
    graphs rather than AgentState dumps.
    """
    import argparse
    import json

    parser = argparse.ArgumentParser(prog="ontocast_ray.parity")
    parser.add_argument("predicted", help=".ttl file or triples parquet file/dir")
    parser.add_argument("reference", help=".ttl file or triples parquet file/dir")
    parser.add_argument("--show-diff", type=int, default=0, metavar="N",
                        help="print up to N missing/extra triples")
    args = parser.parse_args(argv)
    pred = _load_graph(args.predicted)
    ref = _load_graph(args.reference)
    p, r = precision_recall(pred, ref)
    out = {"precision": round(p, 6), "recall": round(r, 6),
           "predicted_triples": len(pred), "reference_triples": len(ref)}
    print(json.dumps(out))
    if args.show_diff:
        ps, rs = triple_set(pred), triple_set(ref)
        for t in list(rs - ps)[: args.show_diff]:
            print("MISSING", t)
        for t in list(ps - rs)[: args.show_diff]:
            print("EXTRA  ", t)
    return 0 if (p >= 0.95 and r >= 0.95) else 1


if __name__ == "__main__":
    raise SystemExit(main())
