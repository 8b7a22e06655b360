"""RDF term model: lightweight, hashable, Arrow-friendly.

Replaces the reference's rdflib ``URIRef``/``Literal`` (not available here and
deliberately not a dependency — triples cross stage boundaries as Arrow
columns, these objects exist only inside per-chunk/per-doc Python kernels).

Like rdflib, terms subclass ``str`` so the lexical form is the string value,
but equality/hashing are type-aware: ``URI("x") != Literal("x")`` and
literals compare on (value, datatype, lang).
"""

from __future__ import annotations

from typing import Optional


class URI(str):
    """An IRI term."""

    __slots__ = ()

    def __eq__(self, other) -> bool:
        if isinstance(other, URI):
            return str.__eq__(self, other)
        return NotImplemented if not isinstance(other, str) else False

    def __ne__(self, other) -> bool:
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __hash__(self) -> int:
        # hot path (canonicalization dict ops): plain str hash xor a type tag
        # — no tuple allocation per call
        return str.__hash__(self) ^ 0x75BCD15

    def __repr__(self) -> str:  # pragma: no cover
        return f"URI({str.__repr__(self)})"


class BNode(str):
    """A blank node (label-identified)."""

    __slots__ = ()

    def __eq__(self, other) -> bool:
        if isinstance(other, BNode):
            return str.__eq__(self, other)
        return NotImplemented if not isinstance(other, str) else False

    def __ne__(self, other) -> bool:
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __hash__(self) -> int:
        return str.__hash__(self) ^ 0x3ADE68B1

    def __repr__(self) -> str:  # pragma: no cover
        return f"BNode({str.__repr__(self)})"


class Literal(str):
    """A literal term with optional datatype IRI and language tag."""

    __slots__ = ("datatype", "lang", "_hash")

    datatype: Optional[str]
    lang: Optional[str]

    def __new__(cls, value: str, datatype: Optional[str] = None, lang: Optional[str] = None):
        obj = str.__new__(cls, value)
        obj.datatype = datatype or None
        obj.lang = lang or None
        obj._hash = None
        return obj

    def __eq__(self, other) -> bool:
        if isinstance(other, Literal):
            return (
                str.__eq__(self, other)
                and self.datatype == other.datatype
                and self.lang == other.lang
            )
        return NotImplemented if not isinstance(other, str) else False

    def __ne__(self, other) -> bool:
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    def __hash__(self) -> int:
        h = self._hash
        if h is None:
            h = str.__hash__(self) ^ hash((self.datatype, self.lang)) ^ 0x1B873593
            self._hash = h
        return h

    def __repr__(self) -> str:  # pragma: no cover
        return f"Literal({str.__repr__(self)}, datatype={self.datatype}, lang={self.lang})"
