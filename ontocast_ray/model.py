"""Arrow schemas for the engine's tables + triple-row ↔ graph converters.

The engine's wire format between Ray Data stages is columnar Arrow — RDF
graphs never cross stage boundaries as Python objects. A "graph" is a group
of triple rows sharing (doc_id[, chunk_hid]); URIs are stored **expanded**
(the reference also compares on expanded URIs internally — ref
/root/reference/ontocast/tool/aggregate.py:427-442).

Input table shape is the north-rule input_hint:
    doc_id: string,
    spans: list<struct<kind: string, text: string, media_ref: string, offset: int32>>
"""

from __future__ import annotations

from typing import Iterable, Sequence

import pyarrow as pa

from ontocast_ray.rdf.graph import TripleGraph
from ontocast_ray.rdf.terms import BNode, Literal, URI

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

CHUNKS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("doc_hid", pa.string()),
        pa.field("doc_iri", pa.string()),
        pa.field("chunk_idx", pa.int32()),
        pa.field("chunk_hid", pa.string()),
        pa.field("text", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("subject", pa.string()),
        pa.field("predicate", pa.string()),
        pa.field("object", pa.string()),
        pa.field("object_is_literal", pa.bool_()),
        pa.field("object_datatype", pa.string()),
        pa.field("object_lang", pa.string()),
        pa.field("doc_id", pa.string()),
        pa.field("doc_iri", pa.string()),
        pa.field("chunk_hid", pa.string()),
        pa.field("chunk_idx", pa.int32()),
        pa.field("graph_scope", pa.string()),  # "facts" | "ontology"
    ]
)

_BNODE_MARK = "_:"


def term_to_cell(term) -> tuple[str, bool, str | None, str | None]:
    """Encode an RDF term into (value, is_literal, datatype, lang) columns."""
    if isinstance(term, Literal):
        return str(term), True, term.datatype, term.lang
    if isinstance(term, BNode):
        return _BNODE_MARK + str(term), False, None, None
    return str(term), False, None, None


def cell_to_term(value: str, is_literal: bool, datatype: str | None, lang: str | None):
    if is_literal:
        return Literal(value, datatype=datatype, lang=lang)
    if value.startswith(_BNODE_MARK):
        return BNode(value[len(_BNODE_MARK):])
    return URI(value)


def node_to_cell(term) -> str:
    """Encode a subject/predicate (URI or BNode) as a string cell."""
    if isinstance(term, BNode):
        return _BNODE_MARK + str(term)
    return str(term)


def cell_to_node(value: str):
    if value.startswith(_BNODE_MARK):
        return BNode(value[len(_BNODE_MARK):])
    return URI(value)


def graph_to_rows(
    graph: TripleGraph,
    doc_id: str = "",
    doc_iri: str = "",
    chunk_hid: str = "",
    chunk_idx: int = 0,
    graph_scope: str = "facts",
) -> dict[str, list]:
    """TripleGraph → dict-of-columns matching TRIPLES_SCHEMA (insertion order kept)."""
    cols: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}
    for s, p, o in graph:
        ov, is_lit, dt, lang = term_to_cell(o)
        cols["subject"].append(node_to_cell(s))
        cols["predicate"].append(node_to_cell(p))
        cols["object"].append(ov)
        cols["object_is_literal"].append(is_lit)
        cols["object_datatype"].append(dt)
        cols["object_lang"].append(lang)
        cols["doc_id"].append(doc_id)
        cols["doc_iri"].append(doc_iri)
        cols["chunk_hid"].append(chunk_hid)
        cols["chunk_idx"].append(chunk_idx)
        cols["graph_scope"].append(graph_scope)
    return cols


def rows_to_graph(
    subjects: Sequence[str],
    predicates: Sequence[str],
    objects: Sequence[str],
    object_is_literal: Sequence[bool],
    object_datatype: Sequence[str | None],
    object_lang: Sequence[str | None],
) -> TripleGraph:
    """Column slices → TripleGraph, preserving row order."""
    g = TripleGraph()
    for s, p, o, lit, dt, lang in zip(
        subjects, predicates, objects, object_is_literal, object_datatype, object_lang
    ):
        g.add((cell_to_node(s), cell_to_node(p), cell_to_term(o, lit, dt, lang)))
    return g


def table_to_graph(table: pa.Table) -> TripleGraph:
    return rows_to_graph(
        table["subject"].to_pylist(),
        table["predicate"].to_pylist(),
        table["object"].to_pylist(),
        table["object_is_literal"].to_pylist(),
        table["object_datatype"].to_pylist(),
        table["object_lang"].to_pylist(),
    )


def columns_to_table(cols: dict[str, list]) -> pa.Table:
    return pa.table(
        {name: pa.array(cols[name], type=TRIPLES_SCHEMA.field(name).type) for name in TRIPLES_SCHEMA.names}
    )


def empty_triples_table() -> pa.Table:
    return TRIPLES_SCHEMA.empty_table()


def concat_triple_columns(parts: Iterable[dict[str, list]]) -> dict[str, list]:
    out: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}
    for part in parts:
        for name in TRIPLES_SCHEMA.names:
            out[name].extend(part[name])
    return out
