"""OntologyHub integration + fused vs staged execution-mode equivalence."""

import pytest

from ontocast_ray.corpus import generate_corpus


def _triple_set(rows):
    return {
        (r["subject"], r["predicate"], r["object"], r["object_is_literal"],
         r["graph_scope"])
        for r in rows
    }


def test_fused_and_staged_modes_agree(ray_session):
    import ray.data

    from ontocast_ray.pipelines.kg import build_kg_pipeline

    corpus = generate_corpus(n_docs=12, seed=7)
    docs = ray.data.from_arrow(corpus)
    kwargs = dict(
        chunk_concurrency=2, extract_concurrency=2,
        min_chunk_size=200, max_chunk_size=2000,
    )
    fused = build_kg_pipeline(docs, mode="fused", **kwargs).take_all()
    staged = build_kg_pipeline(docs, mode="staged", **kwargs).take_all()
    assert _triple_set(fused) == _triple_set(staged)
    assert len(fused) == len(staged)


def test_ontology_hub_receives_deltas(ray_session):
    import ray
    import ray.data

    from ontocast_ray.pipelines.kg import build_kg_pipeline
    from ontocast_ray.state.ontology_hub import get_or_create_hub

    hub_name = "test_hub_deltas"
    corpus = generate_corpus(n_docs=6, seed=9)
    docs = ray.data.from_arrow(corpus)
    triples = build_kg_pipeline(
        docs, hub_name=hub_name,
        chunk_concurrency=2, extract_concurrency=2,
        min_chunk_size=200, max_chunk_size=2000,
    )
    n = triples.count()
    assert n > 0
    hub = ray.get_actor(hub_name)
    snapshot = ray.get(hub.get_snapshot.remote())
    # seeds present
    assert "corp" in snapshot["ontologies"]
    # extraction merged novel term definitions into some ontology
    assert snapshot["version"] >= 1
    total = sum(len(o["triples"]) for o in snapshot["ontologies"].values())
    assert total > 0
    ray.kill(hub)


def test_hub_merge_is_commutative_and_idempotent(ray_session):
    import ray

    from ontocast_ray.state.ontology_hub import OntologyHub

    hub = OntologyHub.remote([])
    rows_a = [("s1", "p", "o", False, None, None)]
    rows_b = [("s2", "p", "o", False, None, None)]
    ray.get(hub.merge_delta.remote("x", None, rows_a))
    ray.get(hub.merge_delta.remote("x", None, rows_b))
    ray.get(hub.merge_delta.remote("x", None, rows_a))  # idempotent
    assert ray.get(hub.triple_count.remote("x")) == 2

    hub2 = OntologyHub.remote([])
    ray.get(hub2.merge_delta.remote("x", None, rows_b))
    ray.get(hub2.merge_delta.remote("x", None, rows_a))
    s1 = ray.get(hub.get_snapshot.remote())
    s2 = ray.get(hub2.get_snapshot.remote())
    assert set(map(tuple, s1["ontologies"]["x"]["triples"])) == set(
        map(tuple, s2["ontologies"]["x"]["triples"])
    )
    ray.kill(hub)
    ray.kill(hub2)
