"""HTTP serve mode — the reference's ``POST /process`` surface (stdlib-only).

Mirrors the Robyn app (/root/reference/ontocast/cli/serve.py:67-227):
- ``POST /process``: JSON body ``{"text": ...}`` (or raw text) → runs the KG
  pipeline on that one document → ``{status, data: {facts, ontology},
  metadata: {status, chunks_processed, chunks_remaining}}`` with Turtle
  payloads (golden shape: /root/reference/demo/ttl/response.json);
- ``GET /health`` and ``GET /info``.

Unlike the reference (shared mutable ToolBox → effectively single-tenant),
each request runs through the stateless pipeline kernels; the ontology
evolves through the OntologyHub actor, so concurrent requests are safe
(commutative merges).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ontocast_ray import __version__


def process_text(text: str, domain: str = "https://example.com") -> dict:
    """One document through chunk→extract→canonicalize, driver-side (no Ray
    needed for a single doc — the same kernels the distributed stages run)."""
    import pyarrow as pa

    from ontocast_ray.model import DOCS_SCHEMA, table_to_graph
    from ontocast_ray.pipelines.kg import KGProcessDocs, default_ontology_records
    from ontocast_ray.rdf import serialize_turtle
    from ontocast_ray.state.ontology_hub import seed_from_records

    batch = pa.table(
        {
            "doc_id": pa.array(["request-0"], type=pa.string()),
            "spans": pa.array(
                [[{"kind": "text", "text": text, "media_ref": "", "offset": 0}]],
                type=DOCS_SCHEMA.field("spans").type,
            ),
        }
    )
    from ontocast_ray.stages.assemble import assemble_spans

    processor = KGProcessDocs(
        ontology_seeds=seed_from_records(default_ontology_records())
    )
    triples = processor(assemble_spans(batch))
    import pyarrow.compute as pc

    facts = triples.filter(pc.equal(triples["graph_scope"], pa.scalar("facts")))
    onto = triples.filter(pc.equal(triples["graph_scope"], pa.scalar("ontology")))
    status_rows = triples.filter(pc.equal(triples["graph_scope"], pa.scalar("status")))
    n_chunks = len(set(status_rows["chunk_hid"].to_pylist()))
    return {
        "status": "success",
        "data": {
            "facts": serialize_turtle(table_to_graph(facts)),
            "ontology": serialize_turtle(table_to_graph(onto)),
        },
        "metadata": {
            "status": "success",
            "chunks_processed": n_chunks,
            "chunks_remaining": 0,
        },
    }


class _Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path == "/health":
            self._send(200, {"status": "healthy"})
        elif self.path == "/info":
            self._send(
                200,
                {
                    "name": "ontocast_ray",
                    "version": __version__,
                    "endpoints": ["/health", "/info", "/process"],
                },
            )
        else:
            self._send(404, {"error": "not found"})

    def do_POST(self):  # noqa: N802
        if self.path != "/process":
            self._send(404, {"error": "not found"})
            return
        length = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(length)
        try:
            try:
                payload = json.loads(raw.decode("utf-8"))
                text = payload["text"] if isinstance(payload, dict) else str(payload)
            except (json.JSONDecodeError, KeyError):
                text = raw.decode("utf-8", "replace")
            self._send(200, process_text(text))
        except Exception as exc:  # mirror ref: report failure, keep serving
            self._send(500, {"status": "failed", "error": str(exc)})

    def log_message(self, fmt, *args):  # quiet
        pass


def serve(host: str = "127.0.0.1", port: int = 8999) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), _Handler)
    return server


if __name__ == "__main__":
    import sys

    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8999
    srv = serve(port=port)
    print(f"serving on :{port}")
    srv.serve_forever()
