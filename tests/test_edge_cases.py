"""Edge-case robustness: empty docs, media-only docs, empty batches."""

import pyarrow as pa

from ontocast_ray.model import DOCS_SCHEMA
from ontocast_ray.stages.assemble import assemble_spans
from ontocast_ray.pipelines.kg import KGProcessDocs


def _docs(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.string()),
            "spans": pa.array([r[1] for r in rows], type=DOCS_SCHEMA.field("spans").type),
        }
    )


def test_pipeline_handles_degenerate_docs():
    batch = _docs(
        [
            ("empty", []),
            ("media-only", [
                {"kind": "image", "text": "", "media_ref": "media://x/1", "offset": 0}
            ]),
            ("whitespace", [
                {"kind": "text", "text": "   \n  ", "media_ref": "", "offset": 0}
            ]),
            ("normal", [
                {"kind": "text",
                 "text": "Ann Lee is a person. Ann Lee works at Foo Labs. Foo Labs is a company.",
                 "media_ref": "", "offset": 0}
            ]),
        ]
    )
    proc = KGProcessDocs(ontology_seeds=[], min_chunk_size=10, max_chunk_size=2000)
    out = proc(assemble_spans(batch))
    # degenerate docs produce no rows but must not crash; the normal one works
    doc_ids = set(out["doc_id"].to_pylist())
    assert "normal" in doc_ids
    facts = out.filter(pa.compute.equal(out["graph_scope"], pa.scalar("facts")))
    assert facts.num_rows > 0


def test_empty_batch():
    proc = KGProcessDocs(ontology_seeds=[])
    out = proc(assemble_spans(_docs([])))
    assert out.num_rows == 0
    from ontocast_ray.model import TRIPLES_SCHEMA

    assert out.schema.equals(TRIPLES_SCHEMA)


def test_chunker_empty_text():
    from ontocast_ray.stages.chunking import ChunkDocuments

    batch = _docs([("e", [{"kind": "text", "text": "", "media_ref": "", "offset": 0}])])
    chunks = ChunkDocuments()(assemble_spans(batch))
    # one empty chunk survives — mirrors the reference's ChunkerTool, which
    # also passes an empty doc through as a single empty chunk; it then
    # yields zero facts plus a status row downstream
    assert chunks.num_rows == 1
    assert chunks["text"][0].as_py() == ""
    assert chunks["spans"][0].as_py()[0]["kind"] == "text"
