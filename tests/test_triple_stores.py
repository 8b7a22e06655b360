"""Fuseki / Neo4j triple-store managers against in-process fakes.

The Fuseki fake is a stdlib HTTP server speaking the same REST surface the
reference exercises (ref test/conftest.py:252-319 runs a live Fuseki; here
the protocol is replayed without the service): dataset admin POST,
named-graph PUT/GET/DELETE, SPARQL discovery. The Neo4j fake records the
cypher the manager issues (n10s payload construction — the bolt service is
unavailable in this container).
"""

from __future__ import annotations

import functools
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

ONTO_TTL = """@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix dcterms: <http://purl.org/dc/terms/> .
@prefix fsec: <https://example.com/fsec#> .

fsec: a owl:Ontology ;
    rdfs:label "Financial Securities Ontology" ;
    dcterms:description "Test ontology" ;
    owl:versionInfo "1.0" .

fsec:Security a owl:Class ;
    rdfs:label "Security" .
"""


class _FusekiState:
    def __init__(self):
        self.graphs: dict[str, str] = {}
        self.datasets: list[str] = []
        self.auth_headers: list[str | None] = []
        self.default_cleared = 0


_STATES: dict[int, _FusekiState] = {}


class _FusekiHandler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    @property
    def state(self) -> _FusekiState:
        return _STATES[self.server.server_address[1]]

    def _graph_param(self):
        q = urllib.parse.urlparse(self.path).query
        params = urllib.parse.parse_qs(q)
        return params.get("graph", [None])[0]

    def _reply(self, status: int, body: bytes = b"", ctype: str = "text/plain"):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        self.state.auth_headers.append(self.headers.get("Authorization"))
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        if self.path.startswith("/$/datasets"):
            params = urllib.parse.parse_qs(body)
            self.state.datasets.append(params.get("dbName", [""])[0])
            self._reply(200)
            return
        if self.path.endswith("/sparql"):
            query = urllib.parse.parse_qs(body).get("query", [""])[0]
            if "owl#Ontology" in query:
                iris = [
                    uri for uri, ttl in self.state.graphs.items()
                    if "owl:Ontology" in ttl or "owl#Ontology" in ttl
                ]
                bindings = [{"s": {"type": "uri", "value": iri}} for iri in iris]
            else:  # DISTINCT ?g listing for clean
                bindings = [
                    {"g": {"type": "uri", "value": uri}} for uri in self.state.graphs
                ]
            payload = json.dumps({"results": {"bindings": bindings}}).encode()
            self._reply(200, payload, "application/sparql-results+json")
            return
        self._reply(404)

    def do_PUT(self):
        self.state.auth_headers.append(self.headers.get("Authorization"))
        length = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(length).decode()
        graph = self._graph_param()
        if graph is None:
            self._reply(400)
            return
        self.state.graphs[graph] = body
        self._reply(201)

    def do_GET(self):
        graph = self._graph_param()
        ttl = self.state.graphs.get(graph)
        if ttl is None:
            self._reply(404)
            return
        self._reply(200, ttl.encode(), "text/turtle")

    def do_DELETE(self):
        graph = self._graph_param()
        if graph is None:
            self.state.default_cleared += 1
            self._reply(204)
            return
        self.state.graphs.pop(graph, None)
        self._reply(204)


@pytest.fixture()
def fuseki_server():
    server = ThreadingHTTPServer(("127.0.0.1", 0), _FusekiHandler)
    port = server.server_address[1]
    _STATES[port] = _FusekiState()
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", _STATES[port]
    server.shutdown()
    _STATES.pop(port, None)


def test_fuseki_round_trip(fuseki_server):
    from ontocast_ray.rdf import parse_turtle
    from ontocast_ray.sources.ontologies import ontology_from_graph
    from ontocast_ray.sources.triple_store import FusekiTripleStoreManager

    base, state = fuseki_server
    mgr = FusekiTripleStoreManager(uri=base, dataset="test", auth=("admin", "pw"))
    assert state.datasets == ["test"]  # tdb2 dataset created on init

    record = ontology_from_graph(parse_turtle(ONTO_TTL))
    assert mgr.serialize_ontology(record)
    assert "https://example.com/fsec#" in state.graphs

    fetched = mgr.fetch_ontologies()
    assert len(fetched) == 1
    got = fetched[0]
    assert got.iri == "https://example.com/fsec#"
    assert got.ontology_id == "fsec"
    assert got.title == "Financial Securities Ontology"
    assert got.version == "1.0"
    # triple-set round trip through serialize → PUT → GET → parse
    assert set(got.graph) == set(record.graph)
    # basic auth actually sent
    assert any(h and h.startswith("Basic ") for h in state.auth_headers)


def test_fuseki_facts_and_clean(fuseki_server):
    from ontocast_ray.rdf import parse_turtle
    from ontocast_ray.sources.triple_store import FusekiTripleStoreManager

    base, state = fuseki_server
    mgr = FusekiTripleStoreManager(uri=base, dataset="test")
    facts = parse_turtle(
        "@prefix ex: <https://example.com/> .\nex:a ex:b ex:c .\n"
    )
    assert mgr.serialize_facts(facts, chunk_uri="https://example.com/doc/1/chunk/2")
    assert mgr.serialize_facts(facts)  # default graph name
    assert "https://example.com/doc/1/chunk/2" in state.graphs
    assert "urn:chunk:default" in state.graphs

    FusekiTripleStoreManager(uri=base, dataset="test", clean=True)
    assert state.graphs == {}  # every named graph deleted
    assert state.default_cleared >= 1


def test_fuseki_dataset_from_uri_and_env(fuseki_server, monkeypatch):
    from ontocast_ray.sources.triple_store import FusekiTripleStoreManager

    base, state = fuseki_server
    mgr = FusekiTripleStoreManager(uri=f"{base}/mydata")
    assert mgr.dataset == "mydata" and mgr.uri == base

    monkeypatch.setenv("FUSEKI_URI", f"{base}/envdata")
    monkeypatch.setenv("FUSEKI_AUTH", "user/secret")
    mgr2 = FusekiTripleStoreManager()
    assert mgr2.dataset == "envdata" and mgr2.auth == ("user", "secret")

    with pytest.raises(ValueError):
        FusekiTripleStoreManager(uri=base, auth="not-a-pair", dataset="x")


# --- Neo4j (n10s payload construction, session injected) -------------------


class _FakeNeo4jSession:
    def __init__(self, log):
        self.log = log

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def run(self, query, **params):
        self.log.append((query, params))
        return []


def test_neo4j_n10s_payloads():
    from ontocast_ray.rdf import parse_turtle
    from ontocast_ray.sources.ontologies import ontology_from_graph
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    log: list = []
    mgr = Neo4jTripleStoreManager(
        uri="bolt://localhost:7687", auth=("neo4j", "pw"), clean=True,
        session_factory=lambda: _FakeNeo4jSession(log),
    )
    # init: clean, graphconfig probe, n10s graphconfig, constraint — in order
    assert log[0][0] == "MATCH (n) DETACH DELETE n"
    assert "n10s.graphconfig.show" in log[1][0]
    assert "n10s.graphconfig.init" in log[2][0]
    # reference store format: KEEP vocab URIs, rdf:type as NODES edges
    assert "'KEEP'" in log[2][0] and "'NODES'" in log[2][0]
    assert "CREATE CONSTRAINT n10s_unique_uri" in log[3][0]

    record = ontology_from_graph(parse_turtle(ONTO_TTL))
    mgr.serialize_ontology(record)
    query, params = log[4]
    assert query == "CALL n10s.rdf.import.inline($ttl, 'Turtle')"
    assert "owl:Ontology" in params["ttl"] or "owl#Ontology" in params["ttl"]

    facts = parse_turtle("@prefix ex: <https://example.com/> .\nex:s ex:p ex:o .\n")
    mgr.serialize_facts(facts)
    query, params = log[5]
    assert query == "CALL n10s.rdf.import.inline($ttl, 'Turtle')"
    assert "ex:s" in params["ttl"] or "https://example.com/s" in params["ttl"]


def test_neo4j_reconnect_to_configured_store():
    """n10s rejects graphconfig.init once RDF data exists — reconnecting to
    a populated database must not raise (ref neo4j.py:97-128)."""
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    log: list = []

    class _ConfiguredSession(_FakeNeo4jSession):
        def run(self, query, **params):
            self.log.append((query, params))
            if "n10s.graphconfig.init" in query or "CREATE CONSTRAINT" in query:
                raise RuntimeError("n10s: config frozen, RDF data present")
            return []

    mgr = Neo4jTripleStoreManager(
        uri="bolt://localhost:7687", auth=("neo4j", "pw"),
        session_factory=lambda: _ConfiguredSession(log),
    )
    assert any("graphconfig.init" in q for q, _ in log)  # attempted, swallowed


def test_neo4j_export_namespace_escapes_cypher():
    """A namespace IRI containing quotes must not break out of the inner
    Cypher string literal (injection via stored data)."""
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    log: list = []
    mgr = Neo4jTripleStoreManager(
        uri="bolt://localhost:7687", auth=("neo4j", "pw"),
        session_factory=lambda: _FakeNeo4jSession(log),
    )
    with mgr._session_factory() as session:
        mgr._export_namespace(session, 'https://e.com/x" RETURN 1 //#')
    query = log[-1][0]
    assert '\\"' in query and 'x" RETURN 1' not in query


def test_neo4j_without_driver_raises():
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    with pytest.raises(NotImplementedError):
        Neo4jTripleStoreManager(uri="bolt://localhost:7687", auth=("a", "b"))


# --- distributed store sink -------------------------------------------------


def _fuseki_factory(base: str):
    from ontocast_ray.sources.triple_store import FusekiTripleStoreManager

    return FusekiTripleStoreManager(uri=base, dataset="test")


def test_write_facts_to_store_sink(ray_session, fuseki_server):
    import pyarrow as pa
    import ray.data

    from ontocast_ray.sources.triple_store import write_facts_to_store

    base, state = fuseki_server
    n = 6
    tbl = pa.table(
        {
            "subject": [f"https://example.com/s{i}" for i in range(n)],
            "predicate": ["https://example.com/p"] * n,
            "object": [f"o{i}" for i in range(n)],
            "object_is_literal": [True] * n,
            "object_datatype": [None] * n,
            "object_lang": [None] * n,
            "doc_iri": [f"https://example.com/doc/{i % 2}" for i in range(n)],
        }
    )
    receipts = write_facts_to_store(
        ray.data.from_arrow(tbl), functools.partial(_fuseki_factory, base)
    ).take_all()
    assert len(receipts) == 2 and all(r["ok"] for r in receipts)
    assert {r["graph_uri"] for r in receipts} == {
        "https://example.com/doc/0", "https://example.com/doc/1",
    }
    assert sum(r["n_triples"] for r in receipts) == n
    assert set(state.graphs) >= {
        "https://example.com/doc/0", "https://example.com/doc/1",
    }


def test_select_store_manager_policy(fuseki_server, tmp_path, monkeypatch):
    """Fuseki preferred over Neo4j, filesystem fallback (ref toolbox.py:98)."""
    from ontocast_ray.sources.triple_store import (
        FilesystemTripleStoreManager,
        FusekiTripleStoreManager,
        select_store_manager,
    )

    monkeypatch.delenv("FUSEKI_URI", raising=False)
    monkeypatch.delenv("NEO4J_URI", raising=False)
    base, _ = fuseki_server
    mgr = select_store_manager(fuseki_uri=f"{base}/ds", neo4j_uri="bolt://x")
    assert isinstance(mgr, FusekiTripleStoreManager)
    mgr = select_store_manager(working_directory=str(tmp_path))
    assert isinstance(mgr, FilesystemTripleStoreManager)
    with pytest.raises(ValueError):
        select_store_manager()


def test_filesystem_manager_round_trip(tmp_path):
    from ontocast_ray.rdf import parse_turtle
    from ontocast_ray.sources.ontologies import ontology_from_graph
    from ontocast_ray.sources.triple_store import FilesystemTripleStoreManager

    onto_dir = tmp_path / "ontologies"
    onto_dir.mkdir()
    (onto_dir / "fsec.ttl").write_text(ONTO_TTL)
    work = tmp_path / "work"
    work.mkdir()
    mgr = FilesystemTripleStoreManager(str(work), str(onto_dir))
    fetched = mgr.fetch_ontologies()
    assert [r.ontology_id for r in fetched] == ["fsec"]
    assert mgr.serialize_ontology(fetched[0])
    assert (work / "ontology_fsec_1.0.ttl").exists()
    facts = parse_turtle("@prefix ex: <https://example.com/> .\nex:a ex:b ex:c .\n")
    assert mgr.serialize_facts(facts, chunk_uri="https://example.com/doc/7/chunk/3")
    assert (work / "facts_7_chunk").exists() or list(work.glob("facts_*"))


def test_cli_run_pushes_to_fuseki(ray_session, fuseki_server, tmp_path):
    """End-to-end: run pipeline over a doc dir and push facts to the store."""
    from ontocast_ray.cli import main

    base, state = fuseki_server
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    (docs_dir / "a.txt").write_text(
        "Apple Inc. reported revenue. Tim Cook is the CEO of Apple Inc."
    )
    out_dir = tmp_path / "out"
    rc = main([
        "run", "--input-path", str(docs_dir),
        "--working-directory", str(out_dir),
        "--fuseki-uri", f"{base}/kg",
    ])
    assert rc == 0
    assert len(state.graphs) >= 1  # named graphs PUT per doc_iri
    assert any(g.startswith("https://") for g in state.graphs)


class _FakeNeo4jSessionWithData(_FakeNeo4jSession):
    """Serves discovery + n10s-export rows like a live n10s instance."""

    EXPORT_ROWS = [
        {"subject": "https://example.com/fsec#", "predicate": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "object": "http://www.w3.org/2002/07/owl#Ontology", "isLiteral": False, "literalType": None, "literalLang": None},
        {"subject": "https://example.com/fsec#", "predicate": "http://www.w3.org/2000/01/rdf-schema#label",
         "object": "Financial Securities Ontology", "isLiteral": True, "literalType": None, "literalLang": None},
        {"subject": "https://example.com/fsec#", "predicate": "http://www.w3.org/2002/07/owl#versionInfo",
         "object": "1.0", "isLiteral": True, "literalType": None, "literalLang": None},
        {"subject": "https://example.com/fsec#Security", "predicate": "http://www.w3.org/2000/01/rdf-schema#label",
         "object": "Wertpapier", "isLiteral": True, "literalType": None, "literalLang": "de"},
        {"subject": "https://example.com/fsec#Security", "predicate": "https://example.com/fsec#count",
         "object": "3", "isLiteral": True, "literalType": "http://www.w3.org/2001/XMLSchema#integer", "literalLang": None},
    ]

    def run(self, query, **params):
        self.log.append((query, params))
        if "RETURN o.uri AS uri" in query:
            return [{"uri": "https://example.com/fsec#"}]
        if "n10s.rdf.export.cypher" in query:
            assert 'STARTS WITH "https://example.com/fsec#"' in query
            return list(self.EXPORT_ROWS)
        return []


def test_neo4j_fetch_reconstructs_via_n10s_export():
    from ontocast_ray.rdf.terms import Literal, URI
    from ontocast_ray.sources.triple_store import Neo4jTripleStoreManager

    log: list = []
    mgr = Neo4jTripleStoreManager(
        uri="bolt://localhost:7687", auth=("neo4j", "pw"),
        session_factory=lambda: _FakeNeo4jSessionWithData(log),
    )
    out = mgr.fetch_ontologies()
    assert len(out) == 1
    rec = out[0]
    assert rec.iri == "https://example.com/fsec#"
    assert rec.ontology_id == "fsec"
    assert rec.title == "Financial Securities Ontology"
    assert rec.version == "1.0"
    assert len(rec.graph) == 5
    # literal typing/lang survives reconstruction
    triples = set(rec.graph)
    assert (URI("https://example.com/fsec#Security"),
            URI("https://example.com/fsec#count"),
            Literal("3", datatype="http://www.w3.org/2001/XMLSchema#integer")) in triples
    lit = [o for s, p, o in triples if str(p).endswith("rdf-schema#label") and str(s).endswith("#Security")][0]
    assert lit.lang == "de"
