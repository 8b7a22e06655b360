"""Structural invariants of the reference's REAL end-to-end output
(demo/ttl/response.json) that our aggregator also produces — cross-checking
our provenance/aggregation rules against live-run reference data, not just
the synthetic goldens."""

import json
import os

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "demo", "ttl", "response.json")),
    reason="reference demo not present",
)

PROV = "http://www.w3.org/ns/prov#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def demo_facts():
    from ontocast_ray.rdf.turtle import from_turtle_str

    with open(os.path.join(REF, "demo", "ttl", "response.json")) as fh:
        resp = json.load(fh)
    return from_turtle_str(resp["data"]["facts"])


def test_chunk_provenance_shape(demo_facts):
    """Every chunk IRI is typed prov:Entity and linked prov:wasPartOf to the
    doc (our aggregator emits the same triples — ref aggregate.py:239-243)."""
    chunk_iris = {
        str(s) for s, p, o in demo_facts
        if str(p) == RDF_TYPE and str(o) == PROV + "Entity"
    }
    assert chunk_iris, "no prov:Entity chunks in demo output"
    was_part_of = {
        str(s) for s, p, _ in demo_facts if str(p) == PROV + "wasPartOf"
    }
    assert chunk_iris == was_part_of
    for iri in chunk_iris:
        assert "/chunk/" in iri


def test_generated_by_points_at_chunks(demo_facts):
    """prov:wasGeneratedBy objects are chunk IRIs; subjects live in the doc
    namespace (ref aggregate.py:262-265)."""
    pairs = [
        (str(s), str(o)) for s, p, o in demo_facts
        if str(p) == PROV + "wasGeneratedBy"
    ]
    assert pairs
    for subj, obj in pairs:
        assert "/chunk/" in obj
        assert "/doc/" in subj


def test_facts_fixture_graph_stable_across_critique():
    """criticise_facts does not mutate the graph: state_facts_{failed,success}
    carry the same triples as state_sublimated (ref criticise_facts.py)."""
    from ontocast_ray.rdf.turtle import from_turtle_str

    def load(name):
        with open(os.path.join(REF, "test", "data", name)) as fh:
            return from_turtle_str(json.load(fh)["current_chunk"]["graph"]).triples_set()

    sublimated = load("state_sublimated.json")
    assert load("state_facts_failed.json") == sublimated
    assert load("state_facts_success.json") == sublimated
