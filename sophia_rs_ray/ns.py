"""Standard and custom namespaces (reference ``api/src/ns.rs``).

The reference exposes a ``Namespace`` type (validated base IRI +
``get(suffix)`` term construction), a ``namespace!`` macro that
pre-builds constant-term modules for the common vocabularies, and the
``"lex" * xsd::date`` sugar for datatyped literals
(``api/src/ns.rs:22-34``, generated modules ``api/src/ns/_term.rs``).

Here the same surface is three things:

- :class:`Namespace` — validated base, ``ns.get("name")`` /
  ``ns.name`` / ``ns["name"]`` all return an IRI :data:`Term`;
- prebuilt namespaces ``rdf``, ``rdfs``, ``xsd``, ``owl``, ``foaf``,
  ``schema``, ``dc`` (the set the reference generates);
- :func:`typed` — ``typed("2023-11-15", xsd.date)``, the functional
  spelling of the reference's ``*`` operator.

Everything returns the engine's plain :data:`Term` tuples, so the
results drop straight into batch builders and SPARQL ASTs.
"""

from __future__ import annotations

from .iri import is_absolute_iri
from .terms import KIND_IRI, Term, iri, literal


class InvalidIriError(ValueError):
    """Raised when a namespace base or suffix yields an invalid IRI
    (mirror of ``sophia_iri::InvalidIri``)."""


class Namespace:
    """A validated IRI prefix that mints terms.

    >>> s = Namespace("http://schema.org/")
    >>> s.get("name")        # explicit (api/src/ns/_namespace.rs get())
    >>> s.name               # attribute sugar
    >>> s["@type-like"]      # suffixes that aren't identifiers
    """

    __slots__ = ("_base",)

    def __init__(self, base: str):
        if not is_absolute_iri(base):
            raise InvalidIriError(f"invalid namespace base: {base!r}")
        object.__setattr__(self, "_base", base)

    @property
    def base(self) -> str:
        return self._base

    def get(self, suffix: str) -> Term:
        """Validated term construction — the full IRI must be an
        absolute RFC-3987 IRI (reference validates the suffix too)."""
        full = self._base + suffix
        if not is_absolute_iri(full):
            raise InvalidIriError(f"invalid IRI: {full!r}")
        return iri(full)

    def __getattr__(self, suffix: str) -> Term:
        # trailing underscore escapes Python keywords: rdf.type_
        if suffix.startswith("_"):
            raise AttributeError(suffix)
        return self.get(suffix[:-1] if suffix.endswith("_") else suffix)

    def __getitem__(self, suffix: str) -> Term:
        return self.get(suffix)

    def __repr__(self) -> str:
        return f"Namespace({self._base!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Namespace) and other._base == self._base

    def __hash__(self) -> int:
        return hash(("Namespace", self._base))


def typed(lex: str, datatype: Term) -> Term:
    """Datatyped literal from a namespace term —
    ``typed("2023-11-15", xsd.date)`` ≙ the reference's
    ``"2023-11-15" * xsd::date`` (api/src/ns.rs:28-34)."""
    if datatype[0] != KIND_IRI:
        raise InvalidIriError("datatype must be an IRI term")
    return literal(lex, datatype[1])


#: the vocabularies the reference pre-generates (api/src/ns.rs bottom)
rdf = Namespace("http://www.w3.org/1999/02/22-rdf-syntax-ns#")
rdfs = Namespace("http://www.w3.org/2000/01/rdf-schema#")
xsd = Namespace("http://www.w3.org/2001/XMLSchema#")
owl = Namespace("http://www.w3.org/2002/07/owl#")
foaf = Namespace("http://xmlns.com/foaf/0.1/")
schema = Namespace("https://schema.org/")
dc = Namespace("http://purl.org/dc/terms/")
