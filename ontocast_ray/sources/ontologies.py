"""Ontology store: load/serialize seed ontologies from a directory of Turtle files.

Port of the reference's filesystem triple-store manager semantics
(/root/reference/ontocast/tool/triple_manager/filesystem_manager.py:60-146):
- ``fetch_ontologies``: sorted glob of ``*.ttl``, one Ontology per file;
- metadata synced from the ``owl:Ontology``-typed subject: title ←
  rdfs:label, description ← dcterms:description, version ← owl:versionInfo,
  id derived from the IRI (ref onto.py:659-769, 26-53);
- ``serialize_ontology`` writes ``ontology_{id}_{version}.ttl``;
- facts sink is the engine's partitioned Parquet writer (sources/io.py) —
  Turtle export kept for parity/debugging.
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass, field

from ontocast_ray.functions.uris import (
    ONTOLOGY_NULL_ID,
    ONTOLOGY_NULL_IRI,
    derive_ontology_id,
)
from ontocast_ray.rdf import OWL, RDF, RDFS, TripleGraph, parse_turtle, serialize_turtle
from ontocast_ray.rdf.namespaces import DCTERMS
from ontocast_ray.rdf.terms import URI


@dataclass
class OntologyRecord:
    ontology_id: str = ONTOLOGY_NULL_ID
    title: str = "null title"
    description: str = "null description"
    version: str = "1.0"
    iri: str = ONTOLOGY_NULL_IRI
    graph: TripleGraph = field(default_factory=TripleGraph)

    @property
    def is_null(self) -> bool:
        return self.iri == ONTOLOGY_NULL_IRI

    def describe(self) -> str:
        """Selection digest (ref ontology_manager digest → select prompt)."""
        return (
            f"ontology_id: {self.ontology_id}\niri: {self.iri}\n"
            f"title: {self.title}\ndescription: {self.description}"
        )


NULL_ONTOLOGY = OntologyRecord()


def ontology_from_graph(graph: TripleGraph) -> OntologyRecord:
    """Extract ontology metadata from owl:Ontology-typed triples (ref onto.py:659-769)."""
    iri = None
    for s, p, o in graph:
        if p == RDF.type and o == OWL.Ontology and isinstance(s, URI):
            iri = str(s)
            break
    rec = OntologyRecord(graph=graph)
    if iri is None:
        return rec
    rec.iri = iri
    rec.ontology_id = derive_ontology_id(iri)
    subj = URI(iri)
    for s, p, o in graph:
        if s == subj:
            if p == RDFS.label:
                rec.title = str(o)
            elif p == DCTERMS.description:
                rec.description = str(o)
            elif p == OWL.versionInfo:
                rec.version = str(o)
    return rec


def fetch_ontologies(ontology_dir: str) -> list[OntologyRecord]:
    """Sorted *.ttl glob → ontology records (ref filesystem_manager.py:60-85)."""
    records = []
    for path in sorted(glob.glob(os.path.join(ontology_dir, "*.ttl"))):
        with open(path, "r", encoding="utf-8") as fh:
            graph = parse_turtle(fh.read())
        records.append(ontology_from_graph(graph))
    return records


def serialize_ontology(record: OntologyRecord, out_dir: str) -> str:
    """Write ontology_{id}_{version}.ttl (ref filesystem_manager.py:87-107)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"ontology_{record.ontology_id}_{record.version}.ttl")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(serialize_turtle(record.graph))
    return path


def serialize_facts(graph: TripleGraph, out_dir: str, spec: str | None = None) -> str:
    """Turtle facts export with the reference's naming rule
    (ref filesystem_manager.py:109-146): spec=None → current.ttl, else
    facts_{last-two-path-segments '_'-joined}.ttl. The engine's canonical
    facts sink is partitioned Parquet (sources/io.py); this exporter exists
    for parity diffs and interop."""
    if spec is None:
        fname = "current.ttl"
    elif isinstance(spec, str):
        s = spec.split("/")[-2:]
        fname = f"facts_{'_'.join(x for x in s if x)}.ttl"
    else:
        raise TypeError(f"string expected for spec {spec}")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, fname)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(serialize_turtle(graph))
    return path
