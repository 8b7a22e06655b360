"""Unit tests for the scalar kernel library (URI/id/hash/fuzz rules).

Golden values derived from the reference implementations by rule inspection
(/root/reference/ontocast/util.py, onto.py:26-53, tool/aggregate.py:635-646).
"""

import hashlib

from ontocast_ray.functions import (
    clean_derived_id,
    clean_local_name,
    derive_ontology_id,
    iri2namespace,
    ratio,
    render_text_hash,
)


def test_render_text_hash():
    assert render_text_hash("hello") == hashlib.sha256(b"hello").hexdigest()[:12]
    assert len(render_text_hash("x")) == 12
    assert render_text_hash("x", digits=8) == hashlib.sha256(b"x").hexdigest()[:8]


def test_iri2namespace():
    assert iri2namespace("https://example.com/doc/abc") == "https://example.com/doc/abc/"
    assert iri2namespace("https://example.com/fsec#", ontology=True) == "https://example.com/fsec#"
    assert iri2namespace("https://example.com/fsec", ontology=True) == "https://example.com/fsec#"


def test_derive_ontology_id():
    # last path segment, cleaned + lowercased
    assert derive_ontology_id("https://example.com/doc/123/chunk/abc/person1") == "person1"
    # trailing /# stripped first
    assert derive_ontology_id("https://example.com/fsec#") == "fsec"
    # fragment IRIs: urlparse keeps the fragment out of path → last path segment
    assert derive_ontology_id("https://example.com/fsec#Security") == "fsec"
    # netloc-only IRIs: first dotted token
    assert derive_ontology_id("https://example.com") == "example"
    # extension and case stripping
    assert derive_ontology_id("https://host.org/onts/criminal.ttl") == "criminal"
    # empty → NULL id
    assert derive_ontology_id("") == "_void_ontology_name"
    assert derive_ontology_id("   ") == "_void_ontology_name"


def test_clean_derived_id():
    assert clean_derived_id("MyOnt.owl") == "myont"
    assert clean_derived_id("example.com") == "example"
    assert clean_derived_id("Weird !! Name") == "weirdname"
    assert clean_derived_id("!!!") == "_void_ontology_name"


def test_clean_local_name():
    assert clean_local_name("John Doe") == "John_Doe"
    assert clean_local_name("a  b!!c") == "a_b_c"
    assert clean_local_name("__x__") == "x"
    assert clean_local_name("!!") == "entity"
    # \w keeps unicode word chars (ref uses \w in aggregate.py:641)
    assert clean_local_name("café_owner") == "café_owner"


def test_fuzz_ratio_matches_rapidfuzz_semantics():
    # indel similarity: 100 * 2*LCS / (len1+len2)
    assert ratio("", "") == 100.0
    assert ratio("abc", "abc") == 100.0
    assert ratio("abc", "") == 0.0
    assert ratio("john doe", "john d.") == 80.0
    assert abs(ratio("this is a test", "this is a test!") - 96.5517241379) < 1e-6
    # symmetric
    assert ratio("acme corp", "acme corporation") == ratio("acme corporation", "acme corp")
