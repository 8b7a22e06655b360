"""Reference conformance goldens for validation + aggregation.

Reproduces /root/reference/test/test_00_validation.py:15-97 with our engine:
- two sample chunks sanitize+connect to exactly [10, 10] triples;
- aggregating them yields exactly 22 triples in 1 connected component.
"""

from ontocast_ray.rdf import parse_turtle
from ontocast_ray.stages.canonicalize import ChunkGraph, ChunkGraphAggregator
from ontocast_ray.stages.validate import (
    connectivity_report,
    validate_and_connect,
)

CURRENT_DOMAIN = "https://example.com"


def make_sample_chunk(chunk_id: str) -> ChunkGraph:
    ttl = f"""
        @prefix ns1: <https://example.com/doc/123/chunk/{chunk_id}/> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        ns1:person1 rdfs:label "John Doe" ;
            ns1:knows ns1:person2 .
        ns1:person3 rdfs:label "Alexander Bell" .
        ns1:person2 rdfs:label "Jane Smith" .
    """
    g = parse_turtle(ttl)
    return ChunkGraph(hid=chunk_id, doc_iri=f"{CURRENT_DOMAIN}/doc/123", graph=g)


def test_validation_golden_10_10():
    sizes = []
    for cid in ("abc123", "def456"):
        chunk = make_sample_chunk(cid)
        chunk.sanitize()
        chunk.graph = validate_and_connect(chunk.graph, chunk.iri, auto_connect=True)
        sizes.append(len(chunk.graph))
    assert sizes == [10, 10]


def test_aggregation_golden_22_triples_1_component():
    chunks = []
    for cid in ("abc123", "def456"):
        chunk = make_sample_chunk(cid)
        chunk.graph = validate_and_connect(chunk.graph, chunk.iri, auto_connect=True)
        chunk.sanitize()
        chunks.append(chunk)
    aggregator = ChunkGraphAggregator()
    aggregated = aggregator.aggregate_graphs(
        chunks=chunks, doc_namespace=f"{CURRENT_DOMAIN}/123/"
    )
    report = connectivity_report(aggregated)
    assert len(aggregated) == 22
    assert report["num_components"] == 1


def test_aggregation_merges_label_variants():
    """Scenario from ref test_00_validation.py:99-177 (basic similarity smoke)."""
    from ontocast_ray.rdf import RDF, RDFS, TripleGraph
    from ontocast_ray.rdf.terms import Literal, URI

    doc_iri = f"{CURRENT_DOMAIN}/doc/test1"
    foaf_person = URI("http://xmlns.com/foaf/0.1/Person")

    def chunk(hid):
        return ChunkGraph(hid=hid, doc_iri=doc_iri, graph=TripleGraph())

    c1, c2 = chunk("chunk_001"), chunk("chunk_002")
    p1 = URI(c1.namespace + "john_doe")
    comp1 = URI(c1.namespace + "acme_corp")
    c1.graph.add((p1, RDFS.label, Literal("John Doe")))
    c1.graph.add((p1, RDF.type, foaf_person))
    c1.graph.add((comp1, RDFS.label, Literal("ACME Corporation")))

    p1v = URI(c2.namespace + "john_doe")  # same local name → exact-match merge
    comp1v = URI(c2.namespace + "acme_corporation")
    c2.graph.add((p1v, RDFS.label, Literal("John Doe")))
    c2.graph.add((p1v, RDF.type, foaf_person))
    c2.graph.add((comp1v, RDFS.label, Literal("ACME Corporation")))

    aggregator = ChunkGraphAggregator()
    agg = aggregator.aggregate_graphs([c1, c2], doc_namespace=f"{CURRENT_DOMAIN}/test1/")

    subjects = {str(s) for s, _, _ in agg}
    # john_doe canonicalized into doc namespace
    assert f"{CURRENT_DOMAIN}/test1/john_doe" in subjects
    # original chunk-namespace URIs no longer appear as subjects
    assert str(p1) not in subjects and str(p1v) not in subjects


def test_type_conflict_blocks_merge():
    """Apple-the-person vs Apple-the-company must not merge (ref :435-520 scenario)."""
    from ontocast_ray.rdf import RDF, RDFS, TripleGraph
    from ontocast_ray.rdf.terms import Literal, URI

    doc_iri = f"{CURRENT_DOMAIN}/doc/apple"
    c1 = ChunkGraph(hid="c1", doc_iri=doc_iri, graph=TripleGraph())
    person = URI(c1.namespace + "apple_person")
    company = URI(c1.namespace + "apple_company")
    c1.graph.add((person, RDFS.label, Literal("Apple")))
    c1.graph.add((person, RDF.type, URI("http://xmlns.com/foaf/0.1/Person")))
    c1.graph.add((company, RDFS.label, Literal("Apple")))
    c1.graph.add((company, RDF.type, URI("https://schema.org/Organization")))

    aggregator = ChunkGraphAggregator()
    disamb = aggregator.disambiguator
    labels = disamb.extract_entity_labels(c1.graph)
    types = {
        person: {URI("http://xmlns.com/foaf/0.1/Person")},
        company: {URI("https://schema.org/Organization")},
    }
    groups = disamb.find_similar_entities(labels, types)
    grouped = {e for g in groups for e in g}
    assert not (person in grouped and company in grouped and any(
        person in g and company in g for g in groups
    ))
