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


def test_incremental_equals_full_batch(ray_session):
    """The associativity contract: merging a new batch into yesterday's
    table must equal full-batch recomputation over old∪new, row for row
    (modulo the status column) — the property that makes the incremental
    op safe to run daily without drift."""
    import pyarrow.compute as pc
    import ray.data

    from ontocast_ray.pipelines.crossdoc import (
        global_entity_table,
        incremental_global_entities,
    )

    corpus = generate_corpus(n_docs=24, seed=7, head_entity_fraction=0.4)
    docs = ray.data.from_arrow(corpus)
    triples = build_kg_pipeline(
        docs, chunk_concurrency=2, extract_concurrency=2,
        min_chunk_size=200, max_chunk_size=2000,
    ).materialize()

    # split on the zero-padded doc-id string (corpus ids sort lexically);
    # sameas/"" rows carry no mentions either way
    def part_of(b, lo, hi):
        ids = b["doc_id"].to_pylist()
        keep = [lo <= (d or "") < hi for d in ids]
        return b.filter(pa.array(keep))

    old_t = triples.map_batches(
        lambda b: part_of(b, "doc-000000", "doc-000012"),
        batch_format="pyarrow")
    new_t = triples.map_batches(
        lambda b: part_of(b, "doc-000012", "doc-999999"),
        batch_format="pyarrow")

    old_table = global_entity_table(old_t, n_parts=4)
    inc = incremental_global_entities(old_table, new_t, n_parts=4).to_pandas()
    full = global_entity_table(
        triples.map_batches(
            lambda b: part_of(b, "doc-000000", "doc-999999"),
            batch_format="pyarrow"),
        n_parts=4,
    ).to_pandas()

    cols = ["entity_uri", "entity_key", "label", "n_docs", "n_mentions"]
    a = inc[cols].sort_values("entity_key").reset_index(drop=True)
    b = full[cols].sort_values("entity_key").reset_index(drop=True)
    assert a.equals(b), (len(a), len(b))
    # status sanity: every row is labeled, and old-only keys say unchanged
    assert set(inc["status"]) <= {"new", "updated", "unchanged"}
    old_keys = set(old_table.to_pandas()["entity_key"])
    new_keys = set(
        incremental_global_entities(
            global_entity_table(old_t, n_parts=4), new_t, n_parts=4
        ).to_pandas()
        .query("status == 'new'")["entity_key"]
    )
    assert new_keys.isdisjoint(old_keys)
    # types merge is a set union
    ti = inc.set_index("entity_key")["types"]
    tf = full.set_index("entity_key")["types"]
    assert all(list(ti[k]) == list(tf[k]) for k in ti.index)
