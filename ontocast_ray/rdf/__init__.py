from ontocast_ray.rdf.terms import BNode, Literal, URI
from ontocast_ray.rdf.namespaces import (
    COMMON_PREFIXES,
    OWL,
    PROV,
    RDF,
    RDFS,
    SCHEMA,
    XSD,
)
from ontocast_ray.rdf.graph import TripleGraph
from ontocast_ray.rdf.turtle import parse_turtle, serialize_turtle

__all__ = [
    "URI",
    "Literal",
    "BNode",
    "TripleGraph",
    "parse_turtle",
    "serialize_turtle",
    "RDF",
    "RDFS",
    "OWL",
    "XSD",
    "PROV",
    "SCHEMA",
    "COMMON_PREFIXES",
]
