from ontocast_ray.functions.hashing import render_text_hash
from ontocast_ray.functions.uris import (
    clean_derived_id,
    clean_local_name,
    derive_ontology_id,
    iri2namespace,
)
from ontocast_ray.functions.fuzz import ratio

__all__ = [
    "render_text_hash",
    "iri2namespace",
    "derive_ontology_id",
    "clean_derived_id",
    "clean_local_name",
    "ratio",
]
