"""Property-based tests (hypothesis) for the engine's core invariants."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ontocast_ray.functions.fuzz import _lcs_length, ratio, ratio_at_least
from ontocast_ray.rdf import TripleGraph, parse_turtle, serialize_turtle
from ontocast_ray.rdf.terms import Literal, URI

text_st = st.text(alphabet=string.ascii_lowercase + " ", max_size=30)


@given(text_st, text_st)
@settings(max_examples=200, deadline=None)
def test_ratio_properties(a, b):
    r = ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert ratio(a, b) == ratio(b, a)
    assert ratio(a, a) == 100.0
    # fast-path equivalence with the plain computation at several thresholds
    for thr in (50.0, 85.0, 90.0):
        assert ratio_at_least(a, b, thr) == (r >= thr)


@given(text_st, text_st, text_st)
@settings(max_examples=100, deadline=None)
def test_lcs_triangle(a, b, c):
    # LCS length bounded by min length; monotone under concatenation
    assert _lcs_length(a, b) <= min(len(a), len(b))
    assert _lcs_length(a + c, b + c) >= _lcs_length(a, b) + 0  # sanity, no crash


_local = st.text(alphabet=string.ascii_letters + string.digits + "_", min_size=1, max_size=12)
_lit_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:!?\"'\\\n\t()[]#@/-_",
    max_size=40,
)


@st.composite
def graphs(draw):
    g = TripleGraph()
    g.bind("ex", "http://example.org/")
    n = draw(st.integers(min_value=0, max_value=12))
    for _ in range(n):
        s = URI("http://example.org/" + draw(_local))
        p = URI("http://example.org/" + draw(_local))
        if draw(st.booleans()):
            o = URI("http://example.org/" + draw(_local))
        else:
            kind = draw(st.integers(min_value=0, max_value=2))
            if kind == 0:
                o = Literal(draw(_lit_text))
            elif kind == 1:
                o = Literal(draw(_lit_text), datatype="http://www.w3.org/2001/XMLSchema#string")
            else:
                o = Literal(draw(_lit_text), lang="en")
        g.add((s, p, o))
    return g


@given(graphs())
@settings(max_examples=100, deadline=None)
def test_turtle_roundtrip_is_lossless(g):
    reparsed = parse_turtle(serialize_turtle(g))
    assert reparsed.triples_set() == g.triples_set()


@given(graphs(), graphs())
@settings(max_examples=50, deadline=None)
def test_graph_union_semantics(a, b):
    u = a + b
    assert u.triples_set() == a.triples_set() | b.triples_set()
    # commutative as a set
    assert (b + a).triples_set() == u.triples_set()


@given(st.lists(st.tuples(st.sampled_from(["text", "image"]), st.text(max_size=15)), max_size=20),
       st.integers(min_value=1, max_value=5))
@settings(max_examples=100, deadline=None)
def test_span_assignment_partitions_sequence(span_spec, n_chunks):
    from ontocast_ray.stages.chunking import assign_spans_to_chunks

    spans = []
    for kind, txt in span_spec:
        spans.append(
            {"kind": kind, "text": txt if kind == "text" else "",
             "media_ref": "m" if kind != "text" else "", "offset": 0}
        )
    chunk_texts = ["x" * 10] * n_chunks
    parts = assign_spans_to_chunks(spans, chunk_texts)
    flat = [s for part in parts for s in part]
    assert flat == spans  # contiguous partition reproduces the sequence exactly


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=5, deadline=None)  # each example is a full Ray CC run
def test_connected_components_equals_union_find(ray_session, edges):
    """Star-rounds CC == classic union-find on arbitrary random graphs."""
    import pyarrow as pa
    import ray.data

    from ontocast_ray.ops.graph_cc import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    tbl = pa.table(
        {
            "doc_id_a": pa.array([a for a, b in edges], type=pa.int64()),
            "doc_id_b": pa.array([b for a, b in edges], type=pa.int64()),
        }
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(ray.data.from_arrow(tbl)).take_all()
    }

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    assert got == expected
