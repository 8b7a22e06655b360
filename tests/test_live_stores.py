"""Service-gated LIVE triple-store integration legs (ref test/conftest.py:
252-319). Skipped unless FUSEKI_URI / NEO4J_URI (+auth) point at running
services — the sandbox has none, but any environment that does immediately
verifies the real HTTP/bolt paths end-to-end: store → discover → fetch →
graph round-trip."""

import os

import pytest

ONTO_TTL = """@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix dcterms: <http://purl.org/dc/terms/> .
@prefix to: <https://example.com/liveto#> .
<https://example.com/liveto#> a owl:Ontology ;
    rdfs:label "Live Test Ontology" ;
    dcterms:description "round-trip fixture" ;
    owl:versionInfo "1.0" .
to:Thing a rdfs:Class ; rdfs:label "Thing" .
"""

FACTS_TTL = """@prefix ex: <https://example.com/livefacts/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
ex:John a ex:Person ; rdfs:label "John Doe" ; ex:knows ex:Jane .
ex:Jane a ex:Person ; rdfs:label "Jane Smith" .
"""


@pytest.fixture(scope="module")
def live_fuseki():
    uri = os.environ.get("FUSEKI_URI")
    if not uri:
        pytest.skip("FUSEKI_URI not set — live Fuseki leg gated off")
    from ontocast_ray.sources.triple_store import FusekiTripleStoreManager

    return FusekiTripleStoreManager(
        uri=uri, auth=os.environ.get("FUSEKI_AUTH"), dataset="live_test", clean=True
    )


@pytest.fixture(scope="module")
def live_neo4j():
    uri = os.environ.get("NEO4J_URI")
    auth = os.environ.get("NEO4J_AUTH")
    if not (uri and auth):
        pytest.skip("NEO4J_URI/NEO4J_AUTH not set — live Neo4j leg gated off")
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    return Neo4jTripleStoreManager(uri=uri, auth=auth, clean=True)


def _roundtrip(manager):
    from ontocast_ray.rdf import parse_turtle
    from ontocast_ray.sources.ontologies import ontology_from_graph

    record = ontology_from_graph(parse_turtle(ONTO_TTL))
    manager.serialize_ontology(record)
    fetched = manager.fetch_ontologies()
    match = [o for o in fetched if o.ontology_id == "liveto"]
    assert match, f"stored ontology not discovered; got {[o.iri for o in fetched]}"
    assert len(match[0].graph) == len(record.graph)


def _facts(manager):
    from ontocast_ray.rdf import parse_turtle

    facts = parse_turtle(FACTS_TTL)
    assert len(facts) == 5
    assert manager.serialize_facts(facts) is not None


def test_fuseki_live_roundtrip(live_fuseki):
    _roundtrip(live_fuseki)


def test_fuseki_live_facts(live_fuseki):
    _facts(live_fuseki)


def test_neo4j_live_roundtrip(live_neo4j):
    _roundtrip(live_neo4j)


def test_neo4j_live_facts(live_neo4j):
    _facts(live_neo4j)


def test_neo4j_live_reconnect(live_neo4j):
    """Second connect to the now-populated store must not raise (graphconfig
    refuses re-init once RDF data exists — the swallow path)."""
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    Neo4jTripleStoreManager(
        uri=os.environ["NEO4J_URI"], auth=os.environ["NEO4J_AUTH"], clean=False
    )
