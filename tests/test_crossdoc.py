"""Cross-document entity merge: salted two-phase groupby + pure-map rewrite."""

import pyarrow as pa
import pytest

from ontocast_ray.corpus import generate_corpus
from ontocast_ray.pipelines.crossdoc import (
    entity_key_of,
    global_uri_of,
    merge_cross_doc,
    rewrite_to_global,
)
from ontocast_ray.pipelines.kg import build_kg_pipeline


def test_entity_key_and_global_uri():
    uri = "https://example.com/doc/0123456789ab/ACME_Corporation"
    assert entity_key_of(uri) == "acme_corporation"
    assert global_uri_of(uri) == "https://example.com/entity/acme_corporation"
    # non-doc URIs pass through
    assert entity_key_of("https://schema.org/Person") is None
    assert entity_key_of("https://example.com/doc/0123456789ab/chunk/abc/x") is None


def test_cross_doc_merge_end_to_end(ray_session):
    import ray.data

    corpus = generate_corpus(n_docs=20, seed=42, head_entity_fraction=0.5)
    docs = ray.data.from_arrow(corpus)
    triples = build_kg_pipeline(
        docs, chunk_concurrency=2, extract_concurrency=2,
        min_chunk_size=200, max_chunk_size=2000,
    )
    rewritten, entities = merge_cross_doc(triples)
    ent_rows = entities.take_all()
    by_key = {r["entity_key"]: r for r in ent_rows}

    # the head entity appears across many docs and merges to ONE global row
    head = [r for r in ent_rows if r["entity_key"].startswith("acme_")]
    assert head, "head entity missing"
    assert max(r["n_docs"] for r in head) >= 3
    # longest label variant wins
    best = max(head, key=lambda r: r["n_docs"])
    assert best["label"] in ("ACME Corporation", "ACME Corp")

    rew = rewritten.take_all()
    # rewritten facts reference global entity URIs
    assert any("/entity/" in r["subject"] for r in rew if r["graph_scope"] == "facts")
    # sameAs lineage present and consistent
    sameas = [r for r in rew if r["graph_scope"] == "sameas"]
    assert sameas
    for r in sameas[:20]:
        assert global_uri_of(r["subject"]) == r["object"]


def test_salting_is_result_invariant(ray_session):
    """The salted two-phase merge must produce the same entity table as an
    unsalted single-phase one (n_salt=1) — salting redistributes work, never
    changes results. Run on an extreme-skew corpus (head entity in ~all docs)."""
    import ray.data

    from ontocast_ray.pipelines.crossdoc import global_entity_table

    corpus = generate_corpus(n_docs=16, seed=3, head_entity_fraction=1.0)
    docs = ray.data.from_arrow(corpus)
    triples = build_kg_pipeline(
        docs, chunk_concurrency=2, extract_concurrency=2,
        min_chunk_size=200, max_chunk_size=2000,
    ).materialize()

    def table_of(n_salt):
        rows = global_entity_table(triples, n_salt=n_salt).take_all()
        return {
            r["entity_key"]: (r["label"], tuple(r["types"]), r["n_docs"], r["n_mentions"])
            for r in rows
        }

    assert table_of(1) == table_of(8)


def test_rewrite_is_pure_map():
    """The rewrite needs no shuffle: global URI is a function of the row."""
    batch = pa.table(
        {
            "subject": ["https://example.com/doc/aaaaaaaaaaaa/John_Doe"],
            "predicate": ["https://example.com/corp#worksAt"],
            "object": ["https://example.com/doc/aaaaaaaaaaaa/ACME_Corp"],
            "object_is_literal": [False],
            "object_datatype": pa.array([None], type=pa.string()),
            "object_lang": pa.array([None], type=pa.string()),
            "doc_id": ["d1"],
            "doc_iri": ["https://example.com/doc/aaaaaaaaaaaa"],
            "chunk_hid": [""],
            "chunk_idx": pa.array([-1], type=pa.int32()),
            "graph_scope": ["facts"],
        }
    )
    out = rewrite_to_global(batch)
    rows = out.to_pylist()
    fact = rows[0]
    assert fact["subject"] == "https://example.com/entity/john_doe"
    assert fact["object"] == "https://example.com/entity/acme_corp"
    sameas = [r for r in rows if r["graph_scope"] == "sameas"]
    assert len(sameas) == 2
