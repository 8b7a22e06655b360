"""End-to-end pipeline tests: corpus → chunks → triples → canonicalized graph.

Checks the north-rule per-row invariant (span-sequence equality) and the
structural properties of the flagship pipeline output.
"""

import pyarrow as pa
import pytest

from ontocast_ray.corpus import generate_corpus
from ontocast_ray.model import DOCS_SCHEMA
from ontocast_ray.pipelines.kg import build_kg_pipeline, run_resumable
from ontocast_ray.stages.assemble import assemble_spans
from ontocast_ray.stages.chunking import ChunkDocuments


@pytest.fixture(scope="module")
def corpus() -> pa.Table:
    return generate_corpus(n_docs=30, seed=42)


def test_corpus_schema(corpus):
    assert corpus.schema.equals(DOCS_SCHEMA)
    assert corpus.num_rows == 30
    # determinism
    again = generate_corpus(n_docs=30, seed=42)
    assert corpus.equals(again)


def test_span_sequence_invariant(corpus):
    """Concatenating chunk rows' span lists reproduces each doc's span sequence
    exactly (kind, text, media_ref, order) — the north-rule invariant."""
    with_text = assemble_spans(corpus)
    chunker = ChunkDocuments(min_chunk_size=200, max_chunk_size=2000)
    chunks = chunker(with_text)

    originals = {
        d: s for d, s in zip(corpus["doc_id"].to_pylist(), corpus["spans"].to_pylist())
    }
    rebuilt: dict[str, list] = {}
    order_ok = True
    last_idx: dict[str, int] = {}
    for doc_id, cidx, spans in zip(
        chunks["doc_id"].to_pylist(),
        chunks["chunk_idx"].to_pylist(),
        chunks["spans"].to_pylist(),
    ):
        if doc_id in last_idx and cidx != last_idx[doc_id] + 1:
            order_ok = False
        last_idx[doc_id] = cidx
        rebuilt.setdefault(doc_id, []).extend(spans)
    assert order_ok
    for doc_id, spans in originals.items():
        got = rebuilt.get(doc_id, [])
        assert [(s["kind"], s["text"], s["media_ref"]) for s in got] == [
            (s["kind"], s["text"], s["media_ref"]) for s in spans
        ], f"span sequence broken for {doc_id}"


def test_assemble_text_is_text_span_concat(corpus):
    with_text = assemble_spans(corpus)
    for text, spans in zip(
        with_text["text"].to_pylist(), with_text["spans"].to_pylist()
    ):
        assert text == "".join(s["text"] for s in spans if s["kind"] == "text")


def test_kg_pipeline_end_to_end(ray_session, corpus, tmp_path):
    import ray.data

    docs = ray.data.from_arrow(corpus)
    triples = build_kg_pipeline(
        docs,
        chunk_concurrency=2,
        extract_concurrency=2,
        min_chunk_size=200,
        max_chunk_size=2000,
    )
    table = triples.take_all()
    assert len(table) > 0
    scopes = {r["graph_scope"] for r in table}
    assert "facts" in scopes and "status" in scopes
    facts = [r for r in table if r["graph_scope"] == "facts"]
    # aggregated rows are doc-level (chunk_hid cleared)
    assert all(r["chunk_hid"] == "" for r in facts)
    # canonical entities live in doc namespaces
    assert any("/doc/" in r["subject"] for r in facts)
    # provenance triples present
    assert any(r["predicate"].endswith("wasGeneratedBy") for r in facts)
    assert any(r["predicate"].endswith("wasPartOf") for r in facts)
    # every doc produced a connected aggregated graph
    from collections import defaultdict

    from ontocast_ray.model import rows_to_graph
    from ontocast_ray.stages.validate import connectivity_report

    by_doc = defaultdict(list)
    for r in facts:
        by_doc[r["doc_id"]].append(r)
    assert len(by_doc) == corpus.num_rows
    some = list(by_doc.values())[0]
    g = rows_to_graph(
        [r["subject"] for r in some],
        [r["predicate"] for r in some],
        [r["object"] for r in some],
        [r["object_is_literal"] for r in some],
        [r["object_datatype"] for r in some],
        [r["object_lang"] for r in some],
    )
    assert connectivity_report(g)["num_components"] == 1


def test_resumable_writes(ray_session, corpus, tmp_path):
    import ray.data

    out = str(tmp_path / "triples")
    docs = ray.data.from_arrow(corpus)
    stats1 = run_resumable(
        docs, out, n_shards=4, min_chunk_size=200, max_chunk_size=2000,
        chunk_concurrency=2, extract_concurrency=2,
    )
    assert stats1["shards_run"] == 4 and stats1["shards_skipped"] == 0
    # second run: everything skipped (idempotent resume)
    stats2 = run_resumable(
        docs, out, n_shards=4, min_chunk_size=200, max_chunk_size=2000,
        chunk_concurrency=2, extract_concurrency=2,
    )
    assert stats2["shards_run"] == 0 and stats2["shards_skipped"] == 4

    # the written store round-trips: schema intact, rows readable
    import glob

    import pyarrow.parquet as pq

    from ontocast_ray.model import TRIPLES_SCHEMA

    files = glob.glob(out + "/part=*/*.parquet")
    assert files
    table = pq.read_table(files[0])
    for name in TRIPLES_SCHEMA.names:
        assert table.schema.field(name).type == TRIPLES_SCHEMA.field(name).type, name
    # readable back as a Dataset keyed by the same doc_id partitioning
    ds = ray.data.read_parquet(out + "/part=0")
    assert ds.count() >= 0
