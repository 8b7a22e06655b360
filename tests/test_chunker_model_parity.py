"""Reference chunk-boundary parity — requires the real embedding model.

The reference's golden chunk files (/root/reference/data/chunks/*.json, e.g.
apple 10-Q → 10 chunks sized 4951/16311/...) were produced with
sentence-transformers/paraphrase-multilingual-mpnet-base-v2. That model is
not installed in this container, so this test SKIPS here; in an environment
with the model it verifies our chunker math reproduces the reference's
boundaries end-to-end (the math itself is unit-tested model-free in
test_chunker.py).
"""

import json
import os

import pytest

REF = "/root/reference"
GOLDEN = os.path.join(REF, "data", "chunks", "fin.10Q.apple.json")
SOURCE = os.path.join(REF, "data", "json", "fin.10Q.apple.json")

sentence_transformers = pytest.importorskip(
    "sentence_transformers", reason="real embedding model not installed"
)


@pytest.mark.skipif(not os.path.isfile(GOLDEN), reason="reference goldens absent")
def test_apple_10q_chunk_boundaries():
    from ontocast_ray.stages.chunking import SemanticSplitter, recursive_chunk

    class STEmbedder:
        def __init__(self):
            self.model = sentence_transformers.SentenceTransformer(
                "sentence-transformers/paraphrase-multilingual-mpnet-base-v2"
            )

        def embed(self, texts):
            return self.model.encode(list(texts), normalize_embeddings=False)

    with open(SOURCE) as fh:
        text = json.load(fh)["text"]
    with open(GOLDEN) as fh:
        golden = json.load(fh)["chunks"]

    splitter = SemanticSplitter(STEmbedder())
    chunks = recursive_chunk(text, splitter)
    assert len(chunks) == len(golden) == 10
    assert [len(c) for c in chunks] == [len(c) for c in golden]
