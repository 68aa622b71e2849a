"""Resource-centric API: node-scoped getters over a graph.

Parity target: the reference's resource crate —
``resource/src/resource/_struct.rs`` (getters / predecessors / list
ladder / check_literal), ``resource/src/resource/_typed.rs`` (typed
conversion), ``resource/src/loader/_local.rs`` (LocalLoader with
content-negotiation emulation) and ``resource/src/resource/_iter.rs``
(ladder iterators).  Tests mirrored from
``resource/src/resource/test.rs``.

Two layers:

* **Per-document layer** (this module's ``Resource``): app-developer
  convenience over a small in-memory ``LocalGraph`` — one web page /
  document's triples, the same granularity the reference loads per
  file.  A ``Loader`` fetches neighbouring documents on demand
  (``DictLoader`` from an in-memory map, ``DirLoader`` from a local
  directory mirror — no network in this engine).
* **Distributed layer** (``resource_view``): the Ray-Data-native
  counterpart — a batch pivot turning a triple Dataset into one row
  per subject with one column per requested predicate, built on the
  raw-task hash exchange so hub subjects cost O(blocks), not a
  straggler.  Use this when you want getter semantics for *every*
  resource at corpus scale instead of one node at a time.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional, Tuple, Union

from .ntriples import parse_term_text
from .terms import (
    KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF, Term, XSD_BOOLEAN,
    XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER, XSD_STRING, format_term, iri,
)

RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

TermLike = Union[Term, str]


def _as_term(t: TermLike) -> Term:
    """str → IRI term convenience (``<…>``-wrapped NT text also ok)."""
    if isinstance(t, tuple):
        return t
    if t.startswith(("<", '"', "_:")):
        return parse_term_text(t)
    return iri(t)


# ---------------------------------------------------------------------------
# errors (resource/src/resource/_error.rs kinds)
# ---------------------------------------------------------------------------

class ResourceError(Exception):
    """Base of all resource-API errors."""


class NoValueFor(ResourceError):
    def __init__(self, id_: Term, predicate: Term):
        super().__init__(f"no value for {format_term(predicate)} "
                         f"on {format_term(id_)}")
        self.id, self.predicate = id_, predicate


class UnexpectedMultipleValueFor(ResourceError):
    def __init__(self, id_: Term, predicate: Term):
        super().__init__(f"multiple values for {format_term(predicate)} "
                         f"on {format_term(id_)}")
        self.id, self.predicate = id_, predicate


class IriNotAbsolute(ResourceError):
    pass


class LoaderError(ResourceError):
    pass


class UnexpectedKind(ResourceError):
    pass


class UnexpectedDatatype(ResourceError):
    pass


class UnexpectedValue(ResourceError):
    pass


# ---------------------------------------------------------------------------
# LocalGraph: small in-memory triple index (one document's graph)
# ---------------------------------------------------------------------------

class LocalGraph:
    """Hash-indexed triples of ONE document (spo + reverse ops) — the
    in-memory graph a ``Resource`` walks.  Term tuples are hashable, so
    the index is two nested dicts; build cost is O(n)."""

    __slots__ = ("spo", "ops", "size")

    def __init__(self, triples: Iterable[Tuple[Term, Term, Term]] = ()):
        self.spo: Dict[Term, Dict[Term, List[Term]]] = {}
        self.ops: Dict[Term, Dict[Term, List[Term]]] = {}
        self.size = 0
        for s, p, o in triples:
            self.spo.setdefault(s, {}).setdefault(p, []).append(o)
            self.ops.setdefault(o, {}).setdefault(p, []).append(s)
            self.size += 1

    @classmethod
    def from_nt_rows(cls, rows: Iterable[dict]) -> "LocalGraph":
        """From (s,p,o) NT-text dict rows (e.g. ``Dataset.take_all()``
        of a small per-document slice)."""
        return cls((parse_term_text(r["s"]), parse_term_text(r["p"]),
                    parse_term_text(r["o"])) for r in rows)

    def objects(self, s: Term, p: Term) -> List[Term]:
        return self.spo.get(s, {}).get(p, [])

    def subjects(self, p: Term, o: Term) -> List[Term]:
        return self.ops.get(o, {}).get(p, [])

    def __len__(self) -> int:
        return self.size


# ---------------------------------------------------------------------------
# loaders (resource/src/loader/)
# ---------------------------------------------------------------------------

_PARSE_BY_EXT = None


def _parsers():
    global _PARSE_BY_EXT
    if _PARSE_BY_EXT is None:
        from .jsonld import jsonld_to_triples
        from .ntriples import parse_document
        from .rdfxml import parse_rdfxml
        from .turtle import parse_trig, parse_turtle

        def nt(text, base):
            return [t[:3] for t in parse_document(text)]

        def nq(text, base):
            return [t[:3] for t in parse_document(text, quads=True)]

        def trig(text, base):
            return [t[:3] for t in parse_trig(text, base=base)]

        def jsonld(text, base):
            triples, err = jsonld_to_triples(text, base=base)
            if err:
                raise ValueError(err)
            return [t[:3] for t in triples]

        _PARSE_BY_EXT = {
            ".ttl": lambda t, b: parse_turtle(t, base=b),
            ".nt": nt,
            ".nq": nq,
            ".trig": trig,
            ".jsonld": jsonld,
            ".rdf": lambda t, b: parse_rdfxml(t, base=b),
        }
    return _PARSE_BY_EXT


class Loader:
    """Fetch the graph of a document IRI.  Subclasses implement
    ``fetch(url) -> (text, url)`` returning the document source and the
    resolved url (content-negotiation may append an extension)."""

    def fetch(self, url: str) -> Tuple[str, str]:
        raise LoaderError(f"cannot load {url}")

    # -- shared logic -------------------------------------------------

    def load_graph(self, url: str) -> LocalGraph:
        text, resolved = self.fetch(url)
        ext = "." + resolved.rsplit(".", 1)[-1] if "." in \
            resolved.rsplit("/", 1)[-1] else ""
        parse = _parsers().get(ext)
        if parse is None:
            raise LoaderError(f"unknown content type for {resolved}")
        try:
            return LocalGraph(parse(text, url))
        except Exception as e:  # parse error surfaces as LoaderError
            raise LoaderError(f"parsing {resolved}: {e}") from e

    def get_resource(self, iri_text: str) -> "Resource":
        """Load the document of ``iri_text`` (fragment stripped) and
        return the resource it identifies."""
        if ":" not in iri_text.split("#", 1)[0].split("/", 1)[0] \
                and "//" not in iri_text:
            raise IriNotAbsolute(iri_text)
        base = iri_text.split("#", 1)[0]
        graph = self.load_graph(base)
        return Resource(iri(iri_text), base, graph, self)


class NoLoader(Loader):
    """Never loads anything (resource/src/loader/_no.rs)."""


# conneg emulation order (loader/_local.rs: try well-known extensions)
_CONNEG_EXTS = (".ttl", ".nt", ".jsonld", ".rdf", ".nq", ".trig")


class DictLoader(Loader):
    """In-memory url → document-text map with the reference
    LocalLoader's content-negotiation emulation: an extension-less url
    retries with well-known extensions."""

    def __init__(self, docs: Dict[str, str]):
        self.docs = docs

    def fetch(self, url: str) -> Tuple[str, str]:
        if url in self.docs:
            return self.docs[url], url
        for ext in _CONNEG_EXTS:
            if url + ext in self.docs:
                return self.docs[url + ext], url + ext
        raise LoaderError(f"not found: {url}")


class DirLoader(Loader):
    """(iri_prefix, directory) mirror pairs, like the reference's
    LocalLoader; iri prefix must end with '/'."""

    def __init__(self, caches: List[Tuple[str, str]]):
        import os

        for pfx, path in caches:
            if not pfx.endswith("/"):
                raise ValueError(f"iri prefix must end with '/': {pfx}")
            if not os.path.isdir(path):
                raise ValueError(f"not a directory: {path}")
        self.caches = list(caches)

    def fetch(self, url: str) -> Tuple[str, str]:
        import os

        for pfx, root in self.caches:
            if not url.startswith(pfx):
                continue
            rel = url[len(pfx):]
            if ".." in rel.split("/"):
                raise LoaderError(f"path escape: {url}")
            for cand in (rel,) + tuple(rel + e for e in _CONNEG_EXTS):
                fp = os.path.join(root, cand)
                if os.path.isfile(fp):
                    with open(fp, encoding="utf-8") as f:
                        return f.read(), url + cand[len(rel):]
        raise LoaderError(f"not found: {url}")


# ---------------------------------------------------------------------------
# Resource
# ---------------------------------------------------------------------------

class Resource:
    """A specific node in a graph, with getter / predecessor /
    list-ladder accessors (resource/src/resource/_struct.rs:20)."""

    __slots__ = ("id", "base", "graph", "loader")

    def __init__(self, id_: TermLike, base: Optional[str],
                 graph: LocalGraph, loader: Optional[Loader] = None):
        self.id = _as_term(id_)
        self.base = base
        self.graph = graph
        self.loader = loader if loader is not None else NoLoader()

    def __repr__(self):
        return f"Resource({format_term(self.id)})"

    def __eq__(self, other):
        return isinstance(other, Resource) and self.id == other.id

    def __hash__(self):
        return hash(self.id)

    # -- term getters -------------------------------------------------

    def get_all_terms(self, predicate: TermLike) -> List[Term]:
        return list(self.graph.objects(self.id, _as_term(predicate)))

    def get_any_term(self, predicate: TermLike) -> Optional[Term]:
        vals = self.get_all_terms(predicate)
        return vals[0] if vals else None

    def get_term(self, predicate: TermLike) -> Term:
        p = _as_term(predicate)
        vals = self.graph.objects(self.id, p)
        if not vals:
            raise NoValueFor(self.id, p)
        if len(vals) > 1:
            raise UnexpectedMultipleValueFor(self.id, p)
        return vals[0]

    # -- predecessors (reverse traversal) -----------------------------

    def pred_all_terms(self, predicate: TermLike) -> List[Term]:
        return list(self.graph.subjects(_as_term(predicate), self.id))

    def pred_any_term(self, predicate: TermLike) -> Optional[Term]:
        vals = self.pred_all_terms(predicate)
        return vals[0] if vals else None

    def pred_term(self, predicate: TermLike) -> Term:
        p = _as_term(predicate)
        vals = self.graph.subjects(p, self.id)
        if not vals:
            raise NoValueFor(self.id, p)
        if len(vals) > 1:
            raise UnexpectedMultipleValueFor(self.id, p)
        return vals[0]

    # -- resource getters ---------------------------------------------

    def _neighbour(self, t: Term) -> "Resource":
        """Same-document terms reuse this graph; a foreign IRI (its
        document url ≠ base) goes through the loader
        (_struct.rs:577 get_neighbour)."""
        if t[0] == KIND_IRI and self.base is not None:
            doc = t[1].split("#", 1)[0]
            if doc != self.base:
                return self.loader.get_resource(t[1])
        return Resource(t, self.base, self.graph, self.loader)

    def get_resource(self, predicate: TermLike) -> "Resource":
        return self._neighbour(self.get_term(predicate))

    def get_any_resource(self, predicate: TermLike) -> Optional["Resource"]:
        t = self.get_any_term(predicate)
        return self._neighbour(t) if t is not None else None

    def get_all_resources(self, predicate: TermLike) -> List["Resource"]:
        return [self._neighbour(t) for t in self.get_all_terms(predicate)]

    def pred_resource(self, predicate: TermLike) -> "Resource":
        return self._neighbour(self.pred_term(predicate))

    def pred_any_resource(self, predicate: TermLike) -> Optional["Resource"]:
        t = self.pred_any_term(predicate)
        return self._neighbour(t) if t is not None else None

    def pred_all_resources(self, predicate: TermLike) -> List["Resource"]:
        return [self._neighbour(t) for t in self.pred_all_terms(predicate)]

    # -- rdf:List ladder ----------------------------------------------

    def get_term_items(self, predicate: TermLike) -> List[Term]:
        """Elements of the rdf:List value of ``predicate``.  Lenient
        like the reference (_struct.rs:441): stops at the first node
        without rdf:first/rdf:rest (even a non-nil one); ambiguous
        nodes (several first/rest) raise; absent value = empty list.
        Circular lists raise after a poison cap instead of looping."""
        p = _as_term(predicate)
        try:
            cur = self.get_term(p)
        except NoValueFor:
            return []
        out: List[Term] = []
        first_t, rest_t = iri(RDF_FIRST), iri(RDF_REST)
        for _ in range(1_000_000):
            if cur == (KIND_IRI, RDF_NIL, "", "", 0):
                return out
            firsts = self.graph.objects(cur, first_t)
            rests = self.graph.objects(cur, rest_t)
            if len(firsts) > 1 or len(rests) > 1:
                raise UnexpectedMultipleValueFor(cur, first_t if
                                                 len(firsts) > 1 else rest_t)
            if not firsts or not rests:
                return out  # lenient: malformed tail ends the list
            out.append(firsts[0])
            cur = rests[0]
        raise ResourceError("circular rdf:List")

    def get_resource_items(self, predicate: TermLike) -> List["Resource"]:
        return [self._neighbour(t) for t in self.get_term_items(predicate)]

    def get_typed_items(self, predicate: TermLike,
                        conv: Callable[["Resource"], object]) -> List[object]:
        return [conv(r) for r in self.get_resource_items(predicate)]

    # -- typed getters (TypedResource via converter callables) --------

    def get_typed(self, predicate: TermLike,
                  conv: Callable[["Resource"], object]) -> object:
        return conv(self.get_resource(predicate))

    def get_any_typed(self, predicate: TermLike,
                      conv: Callable[["Resource"], object]
                      ) -> Optional[object]:
        r = self.get_any_resource(predicate)
        return conv(r) if r is not None else None

    def get_all_typed(self, predicate: TermLike,
                      conv: Callable[["Resource"], object]) -> List[object]:
        return [conv(r) for r in self.get_all_resources(predicate)]

    def pred_typed(self, predicate: TermLike,
                   conv: Callable[["Resource"], object]) -> object:
        return conv(self.pred_resource(predicate))

    def pred_any_typed(self, predicate: TermLike,
                       conv: Callable[["Resource"], object]
                       ) -> Optional[object]:
        r = self.pred_any_resource(predicate)
        return conv(r) if r is not None else None

    def pred_all_typed(self, predicate: TermLike,
                       conv: Callable[["Resource"], object]) -> List[object]:
        return [conv(r) for r in self.pred_all_resources(predicate)]

    # -- literal checking (_struct.rs:542) ----------------------------

    def check_literal(self, value: Term, datatype: TermLike,
                      lexical_forms: Tuple[str, ...] = (),
                      predicate: TermLike = "") -> str:
        p = _as_term(predicate) if predicate else self.id
        if value[0] != KIND_LITERAL:
            raise UnexpectedKind(
                f"expected literal for {format_term(p)}, got kind "
                f"{value[0]}")
        dt = _as_term(datatype)
        if value[2] != dt[1]:
            raise UnexpectedDatatype(
                f"expected {dt[1]} for {format_term(p)}, got {value[2]}")
        if lexical_forms and value[1] not in lexical_forms:
            raise UnexpectedValue(
                f"unexpected value {value[1]!r} for {format_term(p)}")
        return value[1]


# -- literal converters (resource/src/resource/_typed.rs analogues) ---

def as_term(r: Resource) -> Term:
    return r.id


def as_iri(r: Resource) -> str:
    if r.id[0] != KIND_IRI:
        raise UnexpectedKind(f"not an IRI: {format_term(r.id)}")
    return r.id[1]


def as_str(r: Resource) -> str:
    t = r.id
    if t[0] != KIND_LITERAL:
        raise UnexpectedKind(f"not a literal: {format_term(t)}")
    return t[1]


def _numeric(r: Resource, dts: Tuple[str, ...]):
    t = r.id
    if t[0] != KIND_LITERAL:
        raise UnexpectedKind(f"not a literal: {format_term(t)}")
    if t[2] not in dts:
        raise UnexpectedDatatype(f"datatype {t[2]} not in {dts}")
    return t[1]


def as_int(r: Resource) -> int:
    return int(_numeric(r, (XSD_INTEGER,)))


def as_float(r: Resource) -> float:
    return float(_numeric(r, (XSD_DOUBLE, XSD_DECIMAL, XSD_INTEGER,
                              "http://www.w3.org/2001/XMLSchema#float")))


def as_bool(r: Resource) -> bool:
    lex = _numeric(r, (XSD_BOOLEAN,))
    if lex in ("true", "1"):
        return True
    if lex in ("false", "0"):
        return False
    raise UnexpectedValue(f"bad boolean lexical {lex!r}")


# ---------------------------------------------------------------------------
# distributed layer
# ---------------------------------------------------------------------------

def resource_view(nt_ds, predicates: Dict[str, str], *,
                  num_partitions: int = 16, multi: bool = False):
    """Corpus-scale getter pivot: triple Dataset (NT-text ``s,p,o``
    columns) → one row per subject, one column per requested predicate
    (``{out_col: predicate_iri}``).

    Single-value semantics (``multi=False``): the minimum NT text per
    (subject, predicate) — deterministic, and the natural distributed
    reading of ``get_any_term`` (which the reference documents as "any
    value").  ``multi=True`` emits ``;``-free sorted list columns
    (large_list<string>) like ``get_all_terms``.

    Built on the raw-task hash exchange: per-block partial pivot (one
    row per subject per block) then a per-partition final merge, so a
    hub subject costs O(blocks) rows, never a straggler group.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .functions.exchange import hash_aggregate

    pred_nts = {out: format_term(iri(p)) for out, p in predicates.items()}

    def combine(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b["p"],
                        value_set=pa.array(list(pred_nts.values())))
        t = b.filter(mask)
        # every subject is a resource, even with none of the requested
        # predicates: carry block-distinct subjects as null-pred rows
        all_s = pc.unique(b["s"]).cast(pa.large_string())
        if multi:
            # partial: per-subject sorted list per predicate
            agg = t.group_by(["s", "p"]).aggregate([("o", "list")])
            part = pa.table({"s": agg["s"].cast(pa.large_string()),
                             "p": agg["p"].cast(pa.large_string()),
                             "o_list": agg["o_list"].cast(
                                 pa.large_list(pa.large_string()))})
            pad = pa.table({
                "s": all_s,
                "p": pa.array([None] * len(all_s), pa.large_string()),
                "o_list": pa.array([[] for _ in range(len(all_s))],
                                   pa.large_list(pa.large_string()))})
            return pa.concat_tables([part, pad])
        agg = t.group_by(["s", "p"]).aggregate([("o", "min")])
        part = pa.table({"s": agg["s"].cast(pa.large_string()),
                         "p": agg["p"].cast(pa.large_string()),
                         "o_min": agg["o_min"].cast(pa.large_string())})
        pad = pa.table({
            "s": all_s,
            "p": pa.array([None] * len(all_s), pa.large_string()),
            "o_min": pa.array([None] * len(all_s), pa.large_string())})
        return pa.concat_tables([part, pad])

    def finalize(t: pa.Table) -> pa.Table:
        if multi:
            # merge block-partial lists, sort for determinism
            rows: Dict[str, Dict[str, list]] = {}
            s_col = t["s"].to_pylist()
            p_col = t["p"].to_pylist()
            o_col = t["o_list"].to_pylist()
            for s, p, ol in zip(s_col, p_col, o_col):
                rows.setdefault(s, {}).setdefault(p, []).extend(ol)
            subjects = sorted(rows)
            data = {"s": pa.array(subjects, pa.large_string())}
            for out, pnt in pred_nts.items():
                data[out] = pa.array(
                    [sorted(rows[s].get(pnt, [])) for s in subjects],
                    pa.large_list(pa.large_string()))
            return pa.table(data)
        agg = t.group_by(["s", "p"]).aggregate([("o_min", "min")])
        agg = pa.table({"s": agg["s"], "p": agg["p"],
                        "v": agg["o_min_min"]})
        # pivot p → columns via per-predicate filtered joins (few
        # predicates, vectorized each)
        out_tbl = pa.table({"s": pc.unique(agg["s"])})
        for out, pnt in pred_nts.items():
            part = agg.filter(pc.equal(agg["p"], pnt)) \
                .select(["s", "v"]).rename_columns(["s", out])
            out_tbl = out_tbl.join(part, keys=["s"], join_type="left outer")
        return out_tbl.sort_by("s")

    return hash_aggregate(nt_ds, ["s"], combine, finalize,
                          num_partitions=num_partitions)
