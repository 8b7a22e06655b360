"""Triple extraction: the select→render→critique→sublimate→validate chunk loop.

Restructures the reference's LangGraph agent cycle
(/root/reference/ontocast/stategraph/create.py:82-144 — SELECT_ONTOLOGY →
TEXT_TO_ONTOLOGY → CRITICISE_ONTOLOGY → TEXT_TO_FACTS → SUBLIMATE_ONTOLOGY →
CRITICISE_FACTS, with bounded retries) into ONE actor-pool ``map_batches``
stage: one actor call runs the whole loop for each chunk row in the batch.

The extractor backend is pluggable (``ExtractorModel`` protocol). The default
``DeterministicExtractor`` is a rule-based stand-in for the LLM (the
reference's tests require live OpenAI keys; ours must not): it selects an
ontology by token overlap on the chunk's first 1000 chars (ref
agent/select_ontology.py:57 uses the same excerpt window), extracts
entity/relation/typed-literal triples into the chunk namespace with
ontology-namespace predicates (matching the shape of the reference's
render_facts outputs, e.g. test/data/state_rendered_facts.json), and emits
class/property definition triples for novel terms (the ontology addendum).

Retry semantics reproduce L7 (ref stategraph/util.py:8-30): per-node visit
counters, at most ``max_visits`` attempts per node per chunk, and on
exhaustion the chunk is **force-completed with partial results** (status
SUCCESS, failure stage/reason recorded in the emitted status columns).

Ontology deltas are merged into the OntologyHub named actor once per batch
(commutative union — order-insensitive), and the snapshot version used is
recorded per chunk for lineage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Protocol

from ontocast_ray.functions.hashing import render_text_hash
from ontocast_ray.functions.uris import clean_local_name, iri2namespace
from ontocast_ray.model import TRIPLES_SCHEMA, graph_to_rows
from ontocast_ray.rdf import RDF, RDFS, TripleGraph
from ontocast_ray.rdf.namespaces import XSD
from ontocast_ray.rdf.terms import Literal, URI
from ontocast_ray.stages.sublimate import sublimate_graph
from ontocast_ray.stages.validate import validate_and_connect

ENGINE_NS = "https://ontocast-ray.dev/meta#"

# workflow stage names (ref onto.py:831-843) — used in status columns
STAGE_FACTS_CRITIQUE = "FACTS_CRITIQUE"
STAGE_ONTOLOGY_CRITIQUE = "ONTOLOGY_CRITIQUE"


@dataclass
class OntologyView:
    """Broadcast-side snapshot of one ontology (descriptions + term labels)."""

    ontology_id: str
    iri: str
    title: str = ""
    description: str = ""
    known_terms: set = field(default_factory=set)  # lowercased class/property labels


@dataclass
class ChunkResult:
    facts: TripleGraph
    ontology_addendum: TripleGraph
    ontology_id: str
    ontology_iri: str
    status: str
    success_score: float
    failure_stage: Optional[str]
    attempts: int


class ExtractorModel(Protocol):
    def process_chunk(
        self, text: str, doc_iri: str, chunk_hid: str, max_visits: int
    ) -> ChunkResult: ...


_WORD_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> set:
    return set(_WORD_RE.findall(text.lower()))


def _camel(label: str) -> str:
    return "".join(w.capitalize() for w in re.split(r"\W+", label) if w)


_ENT = r"[A-Z][A-Za-z0-9'&.-]*(?: [A-Z][A-Za-z0-9'&.-]*)*"


class DeterministicExtractor:
    """Rule-based extraction model (LLM stand-in; deterministic, vector-friendly).

    Patterns are compiled once (per actor). Relation vocabulary mirrors the
    synthetic corpus and the reference's validation scenarios (worksAt /
    knows / locatedIn / hasSkill / employs / filedOn).
    """

    RELATIONS = [
        # (regex, predicate local, predicate label, domain local, range local)
        (re.compile(rf"(?P<a>{_ENT}) works at (?P<b>{_ENT})\."), "worksAt", "works at", "Person", "Company"),
        (re.compile(rf"(?P<a>{_ENT}) knows (?P<b>{_ENT})\."), "knows", "knows", "Person", "Person"),
        (re.compile(rf"(?P<a>{_ENT}) is located in (?P<b>{_ENT})\."), "locatedIn", "located in", "Company", None),
        (re.compile(rf"(?P<a>{_ENT}) has skill (?P<b>{_ENT})\."), "hasSkill", "has skill", "Person", None),
    ]
    TYPE_RE = re.compile(rf"(?P<a>{_ENT}) is an? (?P<t>[a-z]+)\.")
    EMPLOYS_RE = re.compile(rf"(?P<a>{_ENT}) employs (?P<n>\d+) people\.")
    FILED_RE = re.compile(r"filed on (?P<d>\d{4}-\d{2}-\d{2})\.")

    def __init__(
        self,
        ontologies: list[OntologyView],
        domain: str = "https://example.com",
        min_select_overlap: int = 3,
    ):
        self.ontologies = ontologies
        self.domain = domain
        self.min_select_overlap = min_select_overlap
        self._onto_tokens = [
            (_tokens(o.title) | _tokens(o.description), o) for o in ontologies
        ]

    # -- L1: ontology selection (token-overlap scoring over the excerpt) ----
    def select_ontology(self, text: str) -> Optional[OntologyView]:
        excerpt_tokens = _tokens(text[:1000])  # ref select_ontology.py:57
        best, best_score = None, 0
        for tokens, view in self._onto_tokens:
            score = len(tokens & excerpt_tokens)
            if score > best_score:
                best, best_score = view, score
        if best is not None and best_score >= self.min_select_overlap:
            return best
        return None  # → NULL ontology (ref select_ontology.py:78-81)

    # -- L2+L4: render semantic graph (facts + novel-term definitions) ------
    def render_graph(
        self, text: str, chunk_ns: str, onto_ns: str, known_terms: set
    ) -> TripleGraph:
        g = TripleGraph()
        g.bind("cd", chunk_ns)

        def ent(phrase: str) -> URI:
            return URI(chunk_ns + clean_local_name(phrase))

        def ensure_label(e: URI, phrase: str) -> None:
            g.add((e, RDFS.label, Literal(phrase)))

        def ensure_class(local: str, label: str) -> URI:
            c = URI(onto_ns + local)
            if label.lower() not in known_terms:
                g.add((c, RDF.type, RDFS.Class))
                g.add((c, RDFS.label, Literal(label)))
            return c

        def ensure_property(local: str, label: str, dom: Optional[str], rng: Optional[str]) -> URI:
            p = URI(onto_ns + local)
            if label.lower() not in known_terms:
                g.add((p, RDF.type, RDF.Property))
                g.add((p, RDFS.label, Literal(label)))
                if dom:
                    g.add((p, RDFS.domain, URI(onto_ns + dom)))
                if rng:
                    g.add((p, RDFS.range, URI(onto_ns + rng)))
            return p

        for m in self.TYPE_RE.finditer(text):
            phrase, type_word = m.group("a"), m.group("t")
            e = ent(phrase)
            ensure_label(e, phrase)
            cls = ensure_class(_camel(type_word), type_word.capitalize())
            g.add((e, RDF.type, cls))

        for rx, local, label, dom, rng in self.RELATIONS:
            pred: Optional[URI] = None
            for m in rx.finditer(text):
                if pred is None:
                    pred = ensure_property(local, label, dom, rng)
                a, b = ent(m.group("a")), ent(m.group("b"))
                ensure_label(a, m.group("a"))
                ensure_label(b, m.group("b"))
                g.add((a, pred, b))

        emp_pred: Optional[URI] = None
        for m in self.EMPLOYS_RE.finditer(text):
            if emp_pred is None:
                emp_pred = ensure_property("employeeCount", "employee count", "Company", None)
            a = ent(m.group("a"))
            ensure_label(a, m.group("a"))
            g.add((a, emp_pred, Literal(m.group("n"), datatype=str(XSD) + "integer")))

        filed_pred: Optional[URI] = None
        for m in self.FILED_RE.finditer(text):
            if filed_pred is None:
                filed_pred = ensure_property("filedOn", "filed on", "Document", None)
            report = ent("Report")
            ensure_label(report, "Report")
            g.add((report, filed_pred, Literal(m.group("d"), datatype=str(XSD) + "date")))

        return g

    # -- L3/L5: deterministic critics ---------------------------------------
    @staticmethod
    def critique_facts(facts: TripleGraph, chunk_ns: str) -> tuple[bool, float]:
        """Pass iff at least one chunk-namespace fact triple exists."""
        for s, _, _ in facts:
            if str(s).startswith(chunk_ns):
                return True, 0.9
        return False, 0.0

    @staticmethod
    def critique_ontology(addendum: TripleGraph) -> tuple[bool, float]:
        """Deterministic pass (definitions are well-formed by construction)."""
        return True, 0.9

    # -- the full per-chunk loop (L1→L7) ------------------------------------
    def process_chunk(
        self,
        text: str,
        doc_iri: str,
        chunk_hid: str,
        max_visits: int = 3,
        extra_known: Optional[set] = None,
    ) -> ChunkResult:
        """``extra_known``: term labels added by EARLIER chunks of the same
        document — the reference mutates the shared ontology manager
        mid-document so chunk i+1 sees chunk i's addendum (ref
        criticise_ontology.py:82-92); the caller threads this per-doc set."""
        chunk_iri = f"{doc_iri}/chunk/{chunk_hid}"
        chunk_ns = iri2namespace(chunk_iri)

        selected = self.select_ontology(text)
        if selected is not None:
            onto_iri, onto_id = selected.iri, selected.ontology_id
            known = selected.known_terms
        else:
            doc_hid = doc_iri.rsplit("/", 1)[-1]
            onto_iri = f"{self.domain}/ontology/{doc_hid}"
            onto_id = f"onto_{doc_hid}"
            known = set()
        if extra_known:
            known = known | extra_known
        onto_ns = iri2namespace(onto_iri, ontology=True)

        status, failure_stage, score = "success", None, 0.0
        attempts = 0
        facts = TripleGraph()
        addendum = TripleGraph()
        for attempt in range(1, max_visits + 1):
            attempts = attempt
            graph = self.render_graph(text, chunk_ns, onto_ns, known)
            ok_onto, onto_score = self.critique_ontology(graph)
            if not ok_onto:
                failure_stage, score = STAGE_ONTOLOGY_CRITIQUE, onto_score
                continue
            addendum, facts = sublimate_graph(graph, chunk_ns)
            facts = validate_and_connect(facts, chunk_iri, auto_connect=True)
            ok_facts, facts_score = self.critique_facts(facts, chunk_ns)
            score = facts_score
            if ok_facts:
                failure_stage = None
                break
            failure_stage = STAGE_FACTS_CRITIQUE
        else:
            # max_visits exhausted: force SUCCESS, keep partials (ref util.py:25-29)
            status = "success"

        return ChunkResult(
            facts=facts,
            ontology_addendum=addendum,
            ontology_id=onto_id,
            ontology_iri=onto_iri,
            status=status,
            success_score=score,
            failure_stage=failure_stage,
            attempts=attempts,
        )


def views_from_hub_snapshot(snapshot: dict) -> list[OntologyView]:
    """Hub snapshot → OntologyView list (labels of classes/properties as known terms)."""
    rdfs_label = str(RDFS.label)
    views = []
    for oid, entry in snapshot["ontologies"].items():
        meta = entry["meta"]
        known = set()
        for row in entry["triples"]:
            s, p, o, is_lit = row[0], row[1], row[2], row[3]
            if p == rdfs_label and is_lit:
                known.add(str(o).lower())
        views.append(
            OntologyView(
                ontology_id=oid,
                iri=meta.get("iri", ""),
                title=meta.get("title", ""),
                description=meta.get("description", ""),
                known_terms=known,
            )
        )
    return views


def status_graph(result: ChunkResult, chunk_iri: str, hub_version: int) -> TripleGraph:
    """Chunk-level metrics as queryable triples (scope 'status')."""
    g = TripleGraph()
    iri = URI(chunk_iri)
    g.add((iri, URI(ENGINE_NS + "status"), Literal(result.status)))
    g.add(
        (iri, URI(ENGINE_NS + "successScore"),
         Literal(repr(result.success_score), datatype=str(XSD) + "double"))
    )
    g.add(
        (iri, URI(ENGINE_NS + "attempts"),
         Literal(str(result.attempts), datatype=str(XSD) + "integer"))
    )
    g.add((iri, URI(ENGINE_NS + "ontologyUsed"), Literal(result.ontology_id)))
    g.add(
        (iri, URI(ENGINE_NS + "hubVersion"),
         Literal(str(hub_version), datatype=str(XSD) + "integer"))
    )
    if result.failure_stage:
        g.add((iri, URI(ENGINE_NS + "failureStage"), Literal(result.failure_stage)))
    return g


def addendum_delta_rows(addendum: TripleGraph) -> list:
    from ontocast_ray.model import node_to_cell, term_to_cell

    rows = []
    for s, p, o in addendum:
        ov, is_lit, dt, lang = term_to_cell(o)
        rows.append((node_to_cell(s), node_to_cell(p), ov, is_lit, dt, lang))
    return rows


class ExtractTriples:
    """Actor-pool map_batches stage: chunk rows → triple rows.

    Stateful: the extractor model (compiled patterns + ontology snapshot) is
    built once per actor. Per batch: one optional hub-snapshot refresh, one
    batched delta merge back to the hub (not per row).
    """

    def __init__(
        self,
        ontology_seeds: Optional[list[dict]] = None,
        hub_name: Optional[str] = None,
        domain: str = "https://example.com",
        max_visits: int = 3,
        merge_to_hub: bool = True,
        extractor_factory=None,
    ):
        """``extractor_factory``: optional callable ``(views, domain) ->
        ExtractorModel`` — e.g. an LLMExtractor builder (stages/llm_extract.py).
        Default: the deterministic rule-based model."""
        self.domain = domain
        self.max_visits = max_visits
        self.hub_name = hub_name
        self.merge_to_hub = merge_to_hub
        self._hub = None
        self._snapshot_version = -1
        views: list[OntologyView] = []
        if hub_name is not None:
            import ray

            self._hub = ray.get_actor(hub_name)
            snapshot = ray.get(self._hub.get_snapshot.remote())
            self._snapshot_version = snapshot["version"]
            views = views_from_hub_snapshot(snapshot)
        elif ontology_seeds:
            views = views_from_hub_snapshot(
                {"ontologies": {s["ontology_id"]: {"meta": s, "triples": s.get("triples", [])} for s in ontology_seeds}, "version": 0}
            )
        if extractor_factory is not None:
            self.extractor = extractor_factory(views, domain)
        else:
            self.extractor = DeterministicExtractor(views, domain=domain)

    def __call__(self, batch):
        import pyarrow as pa

        doc_ids = batch["doc_id"].to_pylist()
        doc_iris = batch["doc_iri"].to_pylist()
        chunk_idxs = batch["chunk_idx"].to_pylist()
        chunk_hids = batch["chunk_hid"].to_pylist()
        texts = batch["text"].to_pylist()

        parts = []
        deltas: dict[str, list] = {}
        from ontocast_ray.model import node_to_cell, term_to_cell
        from ontocast_ray.rdf.namespaces import RDFS as _RDFS
        from ontocast_ray.rdf.terms import Literal as _Literal

        # per-document evolving term set: chunk i+1 sees chunk i's addendum
        # (chunk rows of one doc arrive contiguously, in chunk_idx order)
        doc_known: dict[str, set] = {}
        import inspect as _inspect

        supports_extra = "extra_known" in _inspect.signature(
            self.extractor.process_chunk
        ).parameters

        for doc_id, doc_iri, chunk_idx, chunk_hid, text in zip(
            doc_ids, doc_iris, chunk_idxs, chunk_hids, texts
        ):
            extra = doc_known.setdefault(doc_id, set())
            if supports_extra:
                result = self.extractor.process_chunk(
                    text, doc_iri, chunk_hid, max_visits=self.max_visits,
                    extra_known=extra,
                )
            else:
                result = self.extractor.process_chunk(
                    text, doc_iri, chunk_hid, max_visits=self.max_visits
                )
            for s, p, o in result.ontology_addendum:
                if p == _RDFS.label and isinstance(o, _Literal):
                    extra.add(str(o).lower())
            parts.append(
                graph_to_rows(
                    result.facts,
                    doc_id=doc_id,
                    doc_iri=doc_iri,
                    chunk_hid=chunk_hid,
                    chunk_idx=chunk_idx,
                    graph_scope="facts",
                )
            )
            parts.append(
                graph_to_rows(
                    result.ontology_addendum,
                    doc_id=doc_id,
                    doc_iri=doc_iri,
                    chunk_hid=chunk_hid,
                    chunk_idx=chunk_idx,
                    graph_scope="ontology",
                )
            )
            # status rows: chunk-level metrics as queryable triples
            status_g = status_graph(
                result, f"{doc_iri}/chunk/{chunk_hid}", self._snapshot_version
            )
            parts.append(
                graph_to_rows(
                    status_g,
                    doc_id=doc_id,
                    doc_iri=doc_iri,
                    chunk_hid=chunk_hid,
                    chunk_idx=chunk_idx,
                    graph_scope="status",
                )
            )
            if result.ontology_addendum is not None and len(result.ontology_addendum):
                deltas.setdefault(result.ontology_id, []).extend(
                    addendum_delta_rows(result.ontology_addendum)
                )

        if self.merge_to_hub and self._hub is not None and deltas:
            import ray

            refs = [
                self._hub.merge_delta.remote(oid, None, rows)
                for oid, rows in deltas.items()
            ]
            ray.wait(refs, num_returns=len(refs))

        from ontocast_ray.model import concat_triple_columns

        cols = concat_triple_columns(parts)
        return pa.table(
            {
                name: pa.array(cols[name], type=TRIPLES_SCHEMA.field(name).type)
                for name in TRIPLES_SCHEMA.names
            }
        )
