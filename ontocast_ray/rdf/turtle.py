"""Minimal Turtle parser / serializer.

Covers the Turtle subset that appears in the reference's fixtures, seed
ontologies and model-emitted graphs (verified by sweep): @prefix/PREFIX
directives, 'a', ';' and ',' continuations, IRIs, prefixed names, plain /
typed / language-tagged literals (short and long quoted), numeric + boolean
shorthand, named and anonymous blank nodes, comments. RDF collections are
not supported (absent from the corpus) and raise.

Also reproduces the reference's LLM-output patching behavior:
``from_turtle_str`` = unicode-unescape + inject missing COMMON_PREFIXES +
parse (ref /root/reference/ontocast/onto.py:220-264).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ontocast_ray.rdf.graph import TripleGraph
from ontocast_ray.rdf.namespaces import COMMON_PREFIXES, RDF, XSD
from ontocast_ray.rdf.terms import BNode, Literal, URI

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<COMMENT>\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<STRING_LONG2>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\")
  | (?P<STRING_LONG1>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING2>"(?:[^"\\\n]|\\.)*")
  | (?P<STRING1>'(?:[^'\\\n]|\\.)*')
  | (?P<PREFIX_DIR>@prefix\b|PREFIX\b)
  | (?P<BASE_DIR>@base\b|BASE\b)
  | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<DTYPE>\^\^)
  | (?P<BLANK>_:[A-Za-z0-9_.-]+)
  | (?P<DOUBLE>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
  | (?P<DECIMAL>[+-]?\d*\.\d+)
  | (?P<INTEGER>[+-]?\d+)
  | (?P<PNAME>(?:[A-Za-z_][A-Za-z0-9_.-]*)?:(?:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?)
  | (?P<BOOL>\b(?:true|false)\b)
  | (?P<KW_A>\ba\b)
  | (?P<PUNCT>[.;,\[\]()])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}

_STRING_ESCAPE_RE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|.)")


def _unescape(s: str) -> str:
    def repl(m: re.Match) -> str:
        esc = m.group(1)
        if esc[0] in "uU" and len(esc) > 1:
            return chr(int(esc[1:], 16))
        return _ESCAPES.get(esc, esc)

    return _STRING_ESCAPE_RE.sub(repl, s)


class TurtleParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.tokens: List[Tuple[str, str]] = []
        pos = 0
        n = len(text)
        while pos < n:
            m = _TOKEN_RE.match(text, pos)
            if m is None or m.end() == pos:
                raise TurtleParseError(
                    f"Unrecognized Turtle at offset {pos}: {text[pos:pos + 40]!r}"
                )
            kind = m.lastgroup
            if kind not in ("WS", "COMMENT"):
                self.tokens.append((kind, m.group(0)))
            pos = m.end()
        self.i = 0
        self.graph = TripleGraph()
        self.base: Optional[str] = None
        self._bnode_counter = 0

    # -- token helpers -----------------------------------------------------
    def _peek(self) -> Optional[Tuple[str, str]]:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def _next(self) -> Tuple[str, str]:
        tok = self._peek()
        if tok is None:
            raise TurtleParseError("Unexpected end of input")
        self.i += 1
        return tok

    def _expect_punct(self, ch: str) -> None:
        kind, val = self._next()
        if kind != "PUNCT" or val != ch:
            raise TurtleParseError(f"Expected {ch!r}, got {val!r}")

    # -- grammar -----------------------------------------------------------
    def parse(self) -> TripleGraph:
        while self._peek() is not None:
            kind, val = self._peek()
            if kind == "PREFIX_DIR":
                self._next()
                self._parse_prefix(needs_dot=val.startswith("@"))
            elif kind == "BASE_DIR":
                self._next()
                k, v = self._next()
                if k != "IRIREF":
                    raise TurtleParseError("Expected IRI after @base")
                self.base = v[1:-1]
                if val.startswith("@"):
                    self._expect_punct(".")
            else:
                self._parse_statement()
        return self.graph

    def _parse_prefix(self, needs_dot: bool) -> None:
        kind, val = self._next()
        if kind != "PNAME":
            raise TurtleParseError(f"Expected prefix name, got {val!r}")
        prefix = val[: val.index(":")]
        kind, val = self._next()
        if kind != "IRIREF":
            raise TurtleParseError(f"Expected IRI in @prefix, got {val!r}")
        self.graph.bind(prefix, _unescape(val[1:-1]))
        if needs_dot:
            self._expect_punct(".")

    def _parse_statement(self) -> None:
        subj = self._parse_term()
        self._parse_predicate_object_list(subj)
        self._expect_punct(".")

    def _parse_predicate_object_list(self, subj) -> None:
        while True:
            pred = self._parse_verb()
            while True:
                obj = self._parse_term()
                self.graph.add((subj, pred, obj))
                tok = self._peek()
                if tok == ("PUNCT", ","):
                    self._next()
                    continue
                break
            tok = self._peek()
            if tok == ("PUNCT", ";"):
                self._next()
                nxt = self._peek()
                if nxt is not None and nxt[0] == "PUNCT" and nxt[1] in ".]":
                    return
                continue
            return

    def _parse_verb(self):
        kind, _ = self._peek()
        if kind == "KW_A":
            self._next()
            return RDF.type
        return self._parse_term()

    def _resolve_pname(self, val: str) -> URI:
        prefix, _, local = val.partition(":")
        pm = self.graph.prefix_map()
        if prefix not in pm:
            raise TurtleParseError(f"Unknown prefix {prefix!r} in {val!r}")
        return URI(pm[prefix] + local)

    def _parse_term(self):
        kind, val = self._next()
        if kind == "IRIREF":
            iri = _unescape(val[1:-1])
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = self.base + iri
            return URI(iri)
        if kind == "PNAME":
            return self._resolve_pname(val)
        if kind == "BLANK":
            return BNode(val[2:])
        if kind == "PUNCT" and val == "[":
            self._bnode_counter += 1
            node = BNode(f"anon{self._bnode_counter}")
            tok = self._peek()
            if tok == ("PUNCT", "]"):
                self._next()
                return node
            self._parse_predicate_object_list(node)
            self._expect_punct("]")
            return node
        if kind == "PUNCT" and val == "(":
            # RDF collection → rdf:first/rdf:rest chain ending in rdf:nil.
            items = []
            while True:
                tok = self._peek()
                if tok is None:
                    raise TurtleParseError("Unterminated collection")
                if tok == ("PUNCT", ")"):
                    self._next()
                    break
                items.append(self._parse_term())
            if not items:
                return RDF.nil
            head = None
            prev = None
            for item in items:
                self._bnode_counter += 1
                node = BNode(f"list{self._bnode_counter}")
                if head is None:
                    head = node
                else:
                    self.graph.add((prev, RDF.rest, node))
                self.graph.add((node, RDF.first, item))
                prev = node
            self.graph.add((prev, RDF.rest, RDF.nil))
            return head
        if kind in ("STRING2", "STRING1", "STRING_LONG2", "STRING_LONG1"):
            raw = val[3:-3] if kind.startswith("STRING_LONG") else val[1:-1]
            value = _unescape(raw)
            tok = self._peek()
            if tok is not None and tok[0] == "LANGTAG":
                self._next()
                return Literal(value, lang=tok[1][1:])
            if tok is not None and tok[0] == "DTYPE":
                self._next()
                dkind, dval = self._next()
                if dkind == "IRIREF":
                    dt = _unescape(dval[1:-1])
                elif dkind == "PNAME":
                    dt = str(self._resolve_pname(dval))
                else:
                    raise TurtleParseError(f"Bad datatype token {dval!r}")
                return Literal(value, datatype=dt)
            return Literal(value)
        if kind == "INTEGER":
            return Literal(val, datatype=str(XSD) + "integer")
        if kind == "DECIMAL":
            return Literal(val, datatype=str(XSD) + "decimal")
        if kind == "DOUBLE":
            return Literal(val, datatype=str(XSD) + "double")
        if kind == "BOOL":
            return Literal(val, datatype=str(XSD) + "boolean")
        raise TurtleParseError(f"Unexpected token {val!r} ({kind})")


def parse_turtle(text: str) -> TripleGraph:
    """Parse a Turtle document into a TripleGraph."""
    return _Parser(text).parse()


_PREFIX_PATTERN = re.compile(r"@prefix\s+(\w+):\s+<[^>]+>\s+\.")  # ref onto.py:102


def ensure_prefixes(turtle_str: str) -> str:
    """Inject any missing COMMON_PREFIXES declarations (ref onto.py:220-248)."""
    declared = set(m.group(1) for m in _PREFIX_PATTERN.finditer(turtle_str))
    missing = {p: u for p, u in COMMON_PREFIXES.items() if p not in declared}
    if not missing:
        return turtle_str
    block = "\n".join(f"@prefix {p}: <{u}> ." for p, u in missing.items()) + "\n\n"
    return block + turtle_str


def from_turtle_str(turtle_str: str) -> TripleGraph:
    """Reference-parity LLM-Turtle ingestion: unicode-unescape, patch prefixes, parse.

    Mirrors RDFGraph._from_turtle_str (ref onto.py:250-264).
    """
    turtle_str = bytes(turtle_str, "utf-8").decode("unicode_escape")
    return parse_turtle(ensure_prefixes(turtle_str))


# ---------------------------------------------------------------------------
# Serializer

_PN_LOCAL_OK = re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_-]*$")
_LITERAL_ESCAPE = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _escape_literal(value: str) -> str:
    return "".join(_LITERAL_ESCAPE.get(ch, ch) for ch in value)


def _qname(uri: str, prefixes: dict) -> Optional[str]:
    best_prefix = None
    best_len = -1
    for prefix, ns in prefixes.items():
        if len(ns) > best_len and uri.startswith(ns):
            local = uri[len(ns):]
            if local == "" or _PN_LOCAL_OK.match(local):
                best_prefix, best_len = prefix, len(ns)
    if best_prefix is None:
        return None
    local = uri[best_len:]
    return f"{best_prefix}:{local}"


def _term_str(term, prefixes: dict) -> str:
    if isinstance(term, Literal):
        base = f'"{_escape_literal(str(term))}"'
        if term.lang:
            return f"{base}@{term.lang}"
        if term.datatype:
            q = _qname(term.datatype, prefixes)
            return f"{base}^^{q if q else f'<{term.datatype}>'}"
        return base
    if isinstance(term, BNode):
        return f"_:{term}"
    q = _qname(str(term), prefixes)
    return q if q else f"<{term}>"


def serialize_turtle(graph: TripleGraph) -> str:
    """Serialize to Turtle: sorted prefixes, subject-grouped, ';'-chained."""
    prefixes = dict(graph.namespaces())
    lines = [f"@prefix {p}: <{u}> ." for p, u in sorted(prefixes.items())]
    if lines:
        lines.append("")
    by_subject: dict = {}
    order: list = []
    for s, p, o in graph:
        if s not in by_subject:
            by_subject[s] = []
            order.append(s)
        by_subject[s].append((p, o))
    for s in order:
        subj_txt = _term_str(s, prefixes)
        parts = [f"{_term_str(p, prefixes)} {_term_str(o, prefixes)}" for p, o in by_subject[s]]
        lines.append(subj_txt + " " + " ;\n    ".join(parts) + " .")
    return "\n".join(lines) + "\n"
