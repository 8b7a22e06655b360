"""End-to-end curation pipeline: lang filter → quality gate → exact dedup
→ packing (pipelines/curation.py) — hand-checked micro corpus plus
parallelism determinism. The sf0.01 chained SQL oracle lives in
test_driver_contract.py / the driver gate."""

import pandas as pd
import pytest

import ray.data

from ontocast_ray.pipelines.curation import curate_corpus

DOCS = [
    # en, high alpha, 11 tokens → kept
    {"doc_id": 0, "text": "the cat and the dog is on the mat with it"},
    # de → dropped by the language gate
    {"doc_id": 1, "text": "der hund und die katze ist von dem haus"},
    # digits only: lang unknown AND alpha 0 → dropped
    {"doc_id": 2, "text": "1234 5678 9012 3456 7890 1234"},
    # exact duplicate of doc 0 → collapsed to doc 0
    {"doc_id": 3, "text": "the cat and the dog is on the mat with it"},
    # en, 11 tokens → kept
    {"doc_id": 4, "text": "it is that the bird and the fish for a tree"},
]


def _run(n_parts):
    ds = ray.data.from_items(DOCS)
    out = curate_corpus(
        ds,
        lang="en",
        min_alpha_ratio=0.5,
        capacity=8,
        shard_span=2,
        n_parts=n_parts,
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_curate_corpus_micro(ray_session):
    df = _run(2)
    assert list(df["doc_id"]) == [0, 4]
    assert list(df["n_tokens"]) == [11, 11]
    assert list(df["global_offset"]) == [0, 11]
    # capacity 8: doc 0 spans bins 0..1, doc 4 starts at offset 11 → bin 1
    assert list(df["first_bin"]) == [0, 1]
    assert list(df["last_bin"]) == [1, 2]
    assert list(df["offset_in_bin"]) == [0, 3]
    assert list(df["shard"]) == [0, 2]


def test_curate_corpus_parallelism_invariant(ray_session):
    a, b = _run(1), _run(4)
    pd.testing.assert_frame_equal(a, b)


def test_curate_corpus_all_filtered(ray_session):
    ds = ray.data.from_items(
        [{"doc_id": 7, "text": "der hund und die katze ist von dem haus"}]
    )
    out = curate_corpus(ds, capacity=8, shard_span=2, n_parts=2)
    assert out.count() == 0
