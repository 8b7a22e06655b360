"""Remote triple-store managers: Fuseki (SPARQL/HTTP) and Neo4j (n10s).

Re-expression of the reference's store backends on our TripleGraph model
(ref /root/reference/ontocast/tool/triple_manager/core.py:18-140,
fuseki.py:22-334, neo4j.py:28-445):

- ``TripleStoreManager`` protocol: fetch_ontologies / serialize_ontology /
  serialize_facts — the store-selection policy (S10) binds one of the
  backends below per pipeline run;
- ``FusekiTripleStoreManager``: dataset create (admin API, tdb2), named-graph
  Turtle PUT (graph = ontology IRI / chunk URI), SPARQL ``owl:Ontology``
  discovery + per-graph fetch, optional clean. stdlib urllib — no client
  library dependency;
- ``Neo4jTripleStoreManager``: n10s-based — ontologies/facts are imported
  with ``CALL n10s.rdf.import.inline($ttl, 'Turtle')``; graph config and
  uniqueness constraints issued on init. The bolt session is injectable
  (the container has no neo4j driver; with the real driver installed,
  ``session_factory`` defaults to it).
- ``write_facts_to_store``: the Ray-side sink — a task-based ``map_batches``
  stage that groups triple rows by chunk and serializes each chunk graph
  through a per-worker-cached manager (one connection per worker, not per
  batch).

At 100 TB the store write is the bottleneck by design (remote HTTP/bolt);
the sink keeps Ray-side work embarrassingly parallel and the payloads
chunk-granular so a failed POST retries one chunk, not a partition.
"""

from __future__ import annotations

import base64
import json
import os
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable, Protocol

from ontocast_ray.functions.uris import derive_ontology_id
from ontocast_ray.rdf import OWL, RDF, TripleGraph, parse_turtle, serialize_turtle
from ontocast_ray.rdf.terms import URI
from ontocast_ray.sources.ontologies import OntologyRecord, ontology_from_graph


class TripleStoreManager(Protocol):
    """Store protocol (ref core.py:18-76)."""

    def fetch_ontologies(self) -> list[OntologyRecord]: ...

    def serialize_ontology(self, record: OntologyRecord, **kwargs) -> bool: ...

    def serialize_facts(self, graph: TripleGraph, **kwargs) -> bool: ...


def parse_auth(auth) -> tuple[str, str] | None:
    """'user/password' string → tuple (ref core.py:120-135)."""
    if auth is None or isinstance(auth, tuple):
        return auth
    if "/" in auth:
        user, password = auth.split("/", 1)
        return (user, password)
    raise ValueError("auth must be in 'user/password' format")


def _env_or(value, env_name):
    return value if value is not None else os.getenv(env_name)


class FusekiTripleStoreManager:
    """Fuseki named-graph store over the REST API (ref fuseki.py:22-334)."""

    def __init__(
        self,
        uri: str | None = None,
        auth=None,
        dataset: str | None = None,
        clean: bool = False,
        opener: Callable | None = None,
    ):
        self.uri = _env_or(uri, "FUSEKI_URI")
        self.auth = parse_auth(_env_or(auth, "FUSEKI_AUTH"))
        if self.uri is None:
            raise ValueError("Fuseki uri must be given or set via FUSEKI_URI")
        self.uri = self.uri.rstrip("/")
        if dataset is None:
            # ref fuseki.py:166-178: dataset may ride the URI's last path segment
            parsed = urllib.parse.urlparse(self.uri)
            seg = parsed.path.rstrip("/").split("/")[-1] if parsed.path.strip("/") else None
            if seg:
                dataset = seg
                self.uri = self.uri[: -(len(seg) + 1)]
        if dataset is None:
            raise ValueError("Dataset must be specified in FUSEKI_URI or as argument")
        self.dataset = dataset
        self._opener = opener or urllib.request.urlopen
        self.init_dataset(dataset)
        if clean:
            self._clean_dataset()

    # -- low-level HTTP ----------------------------------------------------

    def _request(self, method: str, url: str, data: bytes | None = None, headers=None):
        req = urllib.request.Request(url, data=data, method=method)
        for k, v in (headers or {}).items():
            req.add_header(k, v)
        if self.auth:
            token = base64.b64encode(f"{self.auth[0]}:{self.auth[1]}".encode()).decode()
            req.add_header("Authorization", f"Basic {token}")
        try:
            with self._opener(req) as resp:
                return resp.status, resp.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as exc:  # non-2xx is a result, not a crash
            return exc.code, exc.read().decode("utf-8", "replace")

    def _dataset_url(self) -> str:
        return f"{self.uri}/{self.dataset}"

    def _sparql(self, query: str) -> dict:
        body = urllib.parse.urlencode(
            {"query": query, "format": "application/sparql-results+json"}
        ).encode()
        status, text = self._request(
            "POST",
            f"{self._dataset_url()}/sparql",
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        if status != 200:
            return {}
        return json.loads(text)

    # -- management --------------------------------------------------------

    def init_dataset(self, dataset_name: str) -> bool:
        """Create the tdb2 dataset via the admin API; exists-already is fine
        (ref fuseki.py:139-164)."""
        body = urllib.parse.urlencode({"dbName": dataset_name, "dbType": "tdb2"}).encode()
        status, _ = self._request(
            "POST",
            f"{self.uri}/$/datasets",
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        return status in (200, 201, 409)

    def _clean_dataset(self) -> None:
        """Delete every named graph, then clear the default graph
        (ref fuseki.py:80-135)."""
        results = self._sparql("SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s ?p ?o } }")
        for binding in results.get("results", {}).get("bindings", []):
            graph_uri = binding["g"]["value"]
            self._request(
                "DELETE",
                f"{self._dataset_url()}/data?graph={urllib.parse.quote(graph_uri, safe='')}",
            )
        self._request("DELETE", f"{self._dataset_url()}/data")

    # -- protocol ----------------------------------------------------------

    def _put_graph(self, graph_uri: str, turtle: str) -> bool:
        status, _ = self._request(
            "PUT",
            f"{self._dataset_url()}/data?graph={urllib.parse.quote(graph_uri, safe='')}",
            data=turtle.encode("utf-8"),
            headers={"Content-Type": "text/turtle;charset=utf-8"},
        )
        return status in (200, 201, 204)

    def serialize_ontology(self, record: OntologyRecord, **kwargs) -> bool:
        """Ontology → named graph keyed by its IRI (ref fuseki.py:272-303)."""
        graph_uri = record.iri or f"urn:ontology:{record.ontology_id}"
        return self._put_graph(graph_uri, serialize_turtle(record.graph))

    def serialize_facts(self, graph: TripleGraph, **kwargs) -> bool:
        """Facts → named graph keyed by chunk URI (ref fuseki.py:305-334)."""
        chunk_uri = kwargs.get("chunk_uri", "urn:chunk:default")
        return self._put_graph(chunk_uri, serialize_turtle(graph))

    def fetch_ontologies(self) -> list[OntologyRecord]:
        """Two-step discovery: SPARQL for owl:Ontology subjects (named +
        default graphs), then fetch each named graph and verify the typing
        triple is present (ref fuseki.py:188-270)."""
        results = self._sparql(
            "SELECT DISTINCT ?s WHERE {"
            " { GRAPH ?g { ?s a <http://www.w3.org/2002/07/owl#Ontology> } }"
            " UNION"
            " { ?s a <http://www.w3.org/2002/07/owl#Ontology> } }"
        )
        iris = [
            b["s"]["value"] for b in results.get("results", {}).get("bindings", [])
        ]
        out = []
        for iri in iris:
            status, text = self._request(
                "GET",
                f"{self._dataset_url()}/get?graph={urllib.parse.quote(iri, safe='')}",
                headers={"Accept": "text/turtle"},
            )
            if status != 200:
                continue
            graph = parse_turtle(text)
            if (URI(iri), RDF.type, OWL.Ontology) not in graph:
                continue
            record = ontology_from_graph(graph)
            record.iri = iri
            record.ontology_id = derive_ontology_id(iri)
            out.append(record)
        return out


class Neo4jTripleStoreManager:
    """n10s-backed store (ref neo4j.py:28-445). The cypher surface is real;
    the bolt session comes from ``session_factory`` (defaults to the neo4j
    driver when installed — absent in this container, so tests inject a
    recorder and service-gated runs plug the real one)."""

    # store format mirrors the reference exactly (ref neo4j.py:115-127):
    # KEEP vocab URIs + rdf:type as NODES edges, so a database written by
    # either implementation is discoverable by the other
    N10S_INIT = (
        "CALL n10s.graphconfig.init({handleVocabUris: 'KEEP', "
        "handleMultival: 'OVERWRITE', typesToLabels: false, "
        "keepLangTag: false, keepCustomDataTypes: true, handleRDFTypes: 'NODES'})"
    )
    N10S_SHOW = "CALL n10s.graphconfig.show()"
    CONSTRAINT = (
        "CREATE CONSTRAINT n10s_unique_uri IF NOT EXISTS "
        "FOR (r:Resource) REQUIRE r.uri IS UNIQUE"
    )
    IMPORT_INLINE = "CALL n10s.rdf.import.inline($ttl, 'Turtle')"

    def __init__(
        self,
        uri: str | None = None,
        auth=None,
        clean: bool = False,
        session_factory: Callable | None = None,
    ):
        self.uri = _env_or(uri, "NEO4J_URI")
        self.auth = parse_auth(_env_or(auth, "NEO4J_AUTH"))
        if session_factory is None:
            try:
                from neo4j import GraphDatabase
            except ImportError as exc:  # ref neo4j.py:16-19,78-79
                raise NotImplementedError(
                    "neo4j driver not installed; pass session_factory"
                ) from exc
            driver = GraphDatabase.driver(self.uri, auth=self.auth)
            session_factory = driver.session
        self._session_factory = session_factory
        with self._session_factory() as session:
            if clean:
                session.run("MATCH (n) DETACH DELETE n")
            # n10s rejects (re)configuration once RDF data exists; mirror the
            # reference (neo4j.py:97-128): probe graphconfig.show() and
            # swallow init/constraint errors on an already-configured store
            try:
                session.run(self.N10S_SHOW)
            except Exception:
                pass
            try:
                session.run(self.N10S_INIT)
            except Exception:
                pass
            try:
                session.run(self.CONSTRAINT)
            except Exception:
                pass

    def serialize_ontology(self, record: OntologyRecord, **kwargs):
        """Inline n10s Turtle import (ref neo4j.py:389-412)."""
        with self._session_factory() as session:
            return session.run(
                self.IMPORT_INLINE, ttl=serialize_turtle(record.graph)
            )

    def serialize_facts(self, graph: TripleGraph, **kwargs):
        """Inline n10s Turtle import (ref neo4j.py:414-436)."""
        with self._session_factory() as session:
            return session.run(self.IMPORT_INLINE, ttl=serialize_turtle(graph))

    # rdf:type-EDGE discovery, matching the KEEP + NODES store format
    # (ref neo4j.py:255-270): ontologies are Resources with an explicit
    # rdf:type edge to the owl:Ontology node, not label-typed
    DISCOVER = (
        "MATCH (o)-[:`http://www.w3.org/1999/02/22-rdf-syntax-ns#type`]->"
        '(t:Resource { uri: "http://www.w3.org/2002/07/owl#Ontology" }) '
        "RETURN o.uri AS uri"
    )

    @staticmethod
    def _extract_namespace(iri: str) -> str:
        """IRI → its namespace prefix (ref neo4j.py:152-175): keep through
        the '#' when present, else through the last '/'."""
        if "#" in iri:
            return iri.split("#", 1)[0] + "#"
        if "/" in iri:
            return iri.rsplit("/", 1)[0] + "/"
        return iri

    def _export_namespace(self, session, namespace_uri: str) -> TripleGraph:
        """n10s cypher export of every triple whose subject lives in the
        namespace → TripleGraph (ref neo4j.py:299-372; terms are built
        directly instead of printing-and-reparsing N-Triples)."""
        from ontocast_ray.rdf.terms import Literal

        # escape store-controlled content before interpolating into the
        # inner Cypher string — an IRI containing a quote or backslash must
        # not break out of the literal (Cypher injection via stored data)
        safe_ns = namespace_uri.replace("\\", "\\\\").replace('"', '\\"').replace("'", "\\'")
        query = (
            "CALL n10s.rdf.export.cypher("
            f"'MATCH (n)-[r]->(m) WHERE n.uri STARTS WITH \"{safe_ns}\" RETURN n,r,m', "
            "{format: 'Turtle'}) "
            "YIELD subject, predicate, object, isLiteral, literalType, literalLang "
            "RETURN subject, predicate, object, isLiteral, literalType, literalLang"
        )
        graph = TripleGraph()
        for rec in session.run(query):
            get = rec.get if hasattr(rec, "get") else rec.__getitem__
            obj = (
                Literal(
                    str(get("object")),
                    datatype=get("literalType") or None,
                    lang=get("literalLang") or None,
                )
                if get("isLiteral")
                else URI(str(get("object")))
            )
            graph.add((URI(str(get("subject"))), URI(str(get("predicate"))), obj))
        return graph

    def fetch_ontologies(self) -> list[OntologyRecord]:
        """owl:Ontology resources → full records: discovery + per-namespace
        n10s export reconstruction with metadata sync
        (ref neo4j.py:211-372)."""
        out = []
        with self._session_factory() as session:
            iris = []
            for rec in session.run(self.DISCOVER):
                iri = rec["uri"] if isinstance(rec, dict) else rec.get("uri")
                if iri:
                    iris.append(iri)
            for iri in iris:
                graph = self._export_namespace(session, self._extract_namespace(iri))
                if len(graph):
                    record = ontology_from_graph(graph)
                else:
                    record = OntologyRecord()
                record.iri = iri
                record.ontology_id = derive_ontology_id(iri)
                out.append(record)
        return out


class FilesystemTripleStoreManager:
    """Local-directory store (ref filesystem_manager.py:60-146) behind the
    same protocol, so the selection policy below is uniform."""

    def __init__(self, working_directory: str, ontology_directory: str | None = None):
        self.working_directory = working_directory
        self.ontology_directory = ontology_directory

    def fetch_ontologies(self) -> list[OntologyRecord]:
        from ontocast_ray.sources.ontologies import fetch_ontologies

        if self.ontology_directory is None:
            return []
        return fetch_ontologies(self.ontology_directory)

    def serialize_ontology(self, record: OntologyRecord, **kwargs) -> bool:
        from ontocast_ray.sources.ontologies import serialize_ontology

        serialize_ontology(record, self.working_directory)
        return True

    def serialize_facts(self, graph: TripleGraph, **kwargs) -> bool:
        from ontocast_ray.sources.ontologies import serialize_facts

        serialize_facts(
            graph, self.working_directory, spec=kwargs.get("chunk_uri") or kwargs.get("spec")
        )
        return True


def select_store_manager(
    working_directory: str | None = None,
    ontology_directory: str | None = None,
    fuseki_uri: str | None = None,
    fuseki_auth=None,
    neo4j_uri: str | None = None,
    neo4j_auth=None,
    clean: bool = False,
) -> TripleStoreManager:
    """The reference's store-selection policy (ref toolbox.py:61-98):
    Fuseki when configured (preferred), else Neo4j, else filesystem.
    Env fallbacks (FUSEKI_URI/AUTH, NEO4J_URI/AUTH) apply inside each manager.
    """
    fuseki_uri = _env_or(fuseki_uri, "FUSEKI_URI")
    neo4j_uri = _env_or(neo4j_uri, "NEO4J_URI")
    if fuseki_uri:
        return FusekiTripleStoreManager(uri=fuseki_uri, auth=fuseki_auth, clean=clean)
    if neo4j_uri:
        return Neo4jTripleStoreManager(uri=neo4j_uri, auth=neo4j_auth, clean=clean)
    if working_directory is None:
        raise ValueError("no store configured: need a working_directory fallback")
    return FilesystemTripleStoreManager(working_directory, ontology_directory)


# --------------------------------------------------------------------------
# Ray-side sink

_MANAGER_CACHE: dict[int, object] = {}


def write_facts_to_store(
    triples,
    manager_factory: Callable[[], TripleStoreManager],
    graph_col: str = "doc_iri",
):
    """Distributed store sink: per batch, group triple rows by ``graph_col``
    and serialize each group's graph via a per-worker-cached manager.

    Returns a Dataset of (graph_uri, n_triples, ok) receipts — consuming it
    drives the writes; the manager (HTTP session / bolt driver) is built
    once per worker, not per batch.
    """
    import pyarrow as pa

    from ontocast_ray.model import rows_to_graph

    def sink(batch: pa.Table) -> pa.Table:
        key = id(manager_factory)
        cached = _MANAGER_CACHE.get(key)
        # holding the factory in the entry pins its id (no GC reuse aliasing)
        if cached is None or cached[0] is not manager_factory:
            _MANAGER_CACHE[key] = (manager_factory, manager_factory())
        manager = _MANAGER_CACHE[key][1]
        uris, counts, oks = [], [], []
        df = batch.to_pandas()
        for uri, rows in df.groupby(graph_col, sort=False):
            graph = rows_to_graph(
                rows["subject"], rows["predicate"], rows["object"],
                rows["object_is_literal"], rows["object_datatype"],
                rows["object_lang"],
            )
            ok = manager.serialize_facts(graph, chunk_uri=str(uri))
            uris.append(str(uri))
            counts.append(len(graph))
            oks.append(bool(ok))
        return pa.table(
            {
                "graph_uri": pa.array(uris, type=pa.string()),
                "n_triples": pa.array(counts, type=pa.int64()),
                "ok": pa.array(oks, type=pa.bool_()),
            }
        )

    return triples.map_batches(sink, batch_format="pyarrow")
