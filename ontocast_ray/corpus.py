"""Deterministic synthetic interleaved-corpus generator (north-rule input shape).

Produces the Lance-shaped documents table
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset:int32>>)``
per the driver's input_hint. Everything is seeded — no wall clock, no
external data. Two generators:

- ``generate_corpus``: fully synthetic; text spans drawn from a template
  corpus with controlled entity mentions (label variants such as
  "ACME Corp" / "ACME Corporation" to exercise fuzzy grouping, mirroring the
  scenarios in /root/reference/test/test_00_validation.py:99-658). A head
  entity appears in ~30% of docs — the skew knob for salted partitioning.
- ``spanify_documents``: deterministically wraps an existing flat text table
  (the driver's documents.parquet) into the span-struct shape: text split
  into 2-8 text spans with media spans interleaved every 3rd-5th span.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

from ontocast_ray.model import DOCS_SCHEMA

FIRST = ["Alice", "Robert", "Jane", "John", "Maria", "Wei", "Fatima", "Carlos",
         "Yuki", "Elena", "Omar", "Priya", "Lars", "Amara", "Diego"]
LAST = ["Johnson", "Smith", "Doe", "Bell", "Garcia", "Chen", "Okafor", "Tanaka",
        "Novak", "Haddad", "Kumar", "Berg", "Rossi", "Nakamura", "Weber"]
ORG_BASE = ["ACME", "Globex", "Initech", "Umbrella", "Stark", "Wayne", "Cyberdyne",
            "Tyrell", "Aperture", "Vandelay"]
ORG_SUFFIX = ["Corporation", "Corp", "Industries", "Labs", "Holdings", "Group"]
CITY = ["Springfield", "Riverton", "Lakeside", "Hillview", "Brookfield", "Fairmont"]
SKILL = ["Programming", "Accounting", "Litigation", "Negotiation", "Research", "Design"]

HEAD_ENTITY = ("ACME Corporation", "ACME Corp")  # label variants of the head org


def _person(rng: random.Random) -> str:
    return f"{rng.choice(FIRST)} {rng.choice(LAST)}"


def _org(rng: random.Random) -> str:
    return f"{rng.choice(ORG_BASE)} {rng.choice(ORG_SUFFIX)}"


def _sentences_for_doc(rng: random.Random, doc_idx: int, with_head: bool) -> list[str]:
    people = [_person(rng) for _ in range(rng.randint(2, 4))]
    orgs = [_org(rng) for _ in range(rng.randint(1, 2))]
    if with_head:
        orgs.append(HEAD_ENTITY[rng.randint(0, 1)])
    city = rng.choice(CITY)
    skill = rng.choice(SKILL)
    sents = []
    p0 = people[0]
    sents.append(f"{p0} is a person. {p0} works at {orgs[0]}.")
    for p in people[1:]:
        sents.append(f"{p} is a person. {p0} knows {p}.")
        if rng.random() < 0.5:
            sents.append(f"{p} works at {rng.choice(orgs)}.")
    for o in orgs:
        sents.append(f"{o} is a company. {o} is located in {city}.")
        sents.append(f"{o} employs {rng.randint(10, 5000)} people.")
    sents.append(f"{p0} has skill {skill}. {skill} is a concept.")
    sents.append(
        f"The report was filed on 20{rng.randint(10, 24):02d}-"
        f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}."
    )
    rng.shuffle(sents)
    return sents


def generate_corpus(
    n_docs: int = 200,
    seed: int = 42,
    head_entity_fraction: float = 0.3,
    target_doc_chars: int = 4000,
) -> pa.Table:
    """Deterministic interleaved corpus in DOCS_SCHEMA shape."""
    rng = random.Random(seed)
    doc_ids, spans_rows = [], []
    for i in range(n_docs):
        with_head = rng.random() < head_entity_fraction
        sents = _sentences_for_doc(rng, i, with_head)
        # pad with extra relation sentences until target size
        while sum(len(s) for s in sents) < target_doc_chars:
            sents.extend(_sentences_for_doc(rng, i, False))
        spans = []
        offset = 0
        media_gap = rng.randint(3, 5)
        span_texts: list[str] = []
        k = max(3, min(12, len(sents) // 4))
        per = max(1, len(sents) // k)
        for j in range(0, len(sents), per):
            span_texts.append(" ".join(sents[j:j + per]) + " ")
        n_media = 0
        for j, st in enumerate(span_texts):
            if j > 0 and j % media_gap == 0:
                n_media += 1
                spans.append(
                    {
                        "kind": rng.choice(["image", "table", "audio"]),
                        "text": "",
                        "media_ref": f"media://doc-{i:06d}/{n_media}",
                        "offset": offset,
                    }
                )
            spans.append({"kind": "text", "text": st, "media_ref": "", "offset": offset})
            offset += len(st)
        doc_ids.append(f"doc-{i:06d}")
        spans_rows.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "spans": pa.array(spans_rows, type=DOCS_SCHEMA.field("spans").type),
        }
    )


def spanify_documents(
    doc_ids,
    texts,
    seed: int = 42,
    inject_entities: bool = False,
) -> pa.Table:
    """Wrap flat (doc_id, text) rows into the span-struct shape, deterministically.

    The per-doc split depends only on (seed, doc_id) so the result is stable
    regardless of row order or batching. With ``inject_entities=True`` each
    doc additionally gets deterministic entity sentences appended (seeded by
    doc_id) — the driver's flat text is keyword soup with nothing to extract,
    and the north-rule span table is synthesized by us anyway (FIXTURES.md §1).
    """
    out_ids, spans_rows = [], []
    for doc_id, text in zip(doc_ids, texts):
        rng = random.Random(f"{seed}:{doc_id}")
        text = text or ""
        if inject_entities:
            sents = _sentences_for_doc(rng, 0, rng.random() < 0.3)
            text = text + " " + " ".join(sents)
        n_spans = rng.randint(2, 8)
        cut_points = sorted(rng.sample(range(1, max(2, len(text))), min(n_spans - 1, max(1, len(text) - 1)))) if len(text) > n_spans else []
        pieces = []
        prev = 0
        for c in cut_points:
            pieces.append(text[prev:c])
            prev = c
        pieces.append(text[prev:])
        spans = []
        offset = 0
        media_gap = rng.randint(3, 5)
        n_media = 0
        for j, piece in enumerate(pieces):
            if j > 0 and j % media_gap == 0:
                n_media += 1
                spans.append(
                    {
                        "kind": rng.choice(["image", "table", "audio"]),
                        "text": "",
                        "media_ref": f"media://{doc_id}/{n_media}",
                        "offset": offset,
                    }
                )
            spans.append({"kind": "text", "text": piece, "media_ref": "", "offset": offset})
            offset += len(piece)
        out_ids.append(str(doc_id))
        spans_rows.append(spans)
    return pa.table(
        {
            "doc_id": pa.array(out_ids, type=pa.string()),
            "spans": pa.array(spans_rows, type=DOCS_SCHEMA.field("spans").type),
        }
    )


def spanify_batch(batch: pa.Table, seed: int = 42, inject_entities: bool = False) -> pa.Table:
    """map_batches wrapper for spanify_documents over a flat documents table."""
    return spanify_documents(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        seed=seed,
        inject_entities=inject_entities,
    )
