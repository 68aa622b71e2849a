"""RDF/XML parser + serializer (reference ``xml/src/parser.rs:15``,
``xml/src/serializer.rs:49`` — oxrdfxml-backed there; stdlib
ElementTree here, same emitted-triple semantics).

Supported RDF/XML constructs: ``rdf:RDF`` roots and bare node elements,
``rdf:Description`` / typed node elements, ``rdf:about`` / ``rdf:ID`` /
``rdf:nodeID``, property elements with ``rdf:resource`` /
``rdf:nodeID`` / ``rdf:datatype`` / text content, property *attributes*,
``xml:lang`` inheritance, ``xml:base``, ``rdf:parseType="Resource"`` and
``"Collection"``, ``rdf:li`` counters.  ``parseType="Literal"`` yields
an ``rdf:XMLLiteral`` with the inner XML serialized canonically enough
for round-tripping.  Reification (``rdf:ID`` on property elements) is
not emitted (the reference's oxrdfxml is also non-reifying by default).

Batch adapters mirror turtle.py: one document per row (RDF/XML is
document-scoped like Turtle prefixes — SURVEY §2.1).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Dict, Iterator, List, Optional, Tuple

from .iri import BaseIri
from .ntriples import parse_term_text
from .terms import (
    KIND_BNODE, KIND_IRI, KIND_LITERAL, RDF, Term, bnode, format_term, iri,
    langlit, literal,
)

RDF_NS = RDF
XML_NS = "http://www.w3.org/XML/1998/namespace"
XMLLITERAL = RDF + "XMLLiteral"

_RDF_DESCRIPTION = f"{{{RDF_NS}}}Description"
_SYNTAX_ATTRS = {f"{{{RDF_NS}}}about", f"{{{RDF_NS}}}ID",
                 f"{{{RDF_NS}}}nodeID", f"{{{RDF_NS}}}resource",
                 f"{{{RDF_NS}}}datatype", f"{{{RDF_NS}}}parseType",
                 f"{{{RDF_NS}}}RDF"}
_OLD_TERMS = {f"{{{RDF_NS}}}aboutEach", f"{{{RDF_NS}}}aboutEachPrefix",
              f"{{{RDF_NS}}}bagID"}
#: rdf:li is an ELEMENT-only term — forbidden as an attribute
#: (RDF/XML §7.2.5 propertyAttr excludes li; oxrdfxml rejects it too)
_LI_ATTR = f"{{{RDF_NS}}}li"
#: pragmatic XML NCName: letter/underscore start, then letters /
#: digits / . - _ (no colon) — the rdf:ID production (RDF/XML §7.2.34)
_NCNAME_RE = re.compile(r"[^\W\d][\w.\-]*\Z")


class RdfXmlParseError(ValueError):
    pass


def _check_attrs(el) -> None:
    """Reject the RDF-2004-removed terms (aboutEach/aboutEachPrefix/
    bagID) and rdf:li used as an attribute — oxrdfxml parity
    (reference xml/src/parser.rs:15 delegates there)."""
    for k in el.attrib:
        if k in _OLD_TERMS:
            raise RdfXmlParseError(
                f"removed RDF attribute not allowed: {_split(k)}")
        if k == _LI_ATTR:
            raise RdfXmlParseError("rdf:li is not allowed as an attribute")


def _split(tag: str) -> str:
    """'{ns}local' → ns+local IRI text."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class _Parser:
    def __init__(self, base: Optional[str]):
        self.base = BaseIri(base) if base else None
        self.counter = 0
        self.out: List[Tuple[Term, Term, Term]] = []

    def fresh(self) -> Term:
        self.counter += 1
        return bnode(f"rx{self.counter}")

    def resolve(self, ref: str, base: Optional[BaseIri]) -> Term:
        b = base or self.base
        if b is not None:
            return iri(b.resolve(ref))
        return iri(ref)

    # -- node elements ------------------------------------------------

    def node_element(self, el: ET.Element, lang: str,
                     base: Optional[BaseIri]) -> Term:
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        xb = el.get(f"{{{XML_NS}}}base")
        if xb:
            base = BaseIri(xb)
        _check_attrs(el)
        about = el.get(f"{{{RDF_NS}}}about")
        rid = el.get(f"{{{RDF_NS}}}ID")
        nid = el.get(f"{{{RDF_NS}}}nodeID")
        if sum(x is not None for x in (about, rid, nid)) > 1:
            raise RdfXmlParseError("conflicting subject attributes")
        if rid is not None and not _NCNAME_RE.match(rid):
            raise RdfXmlParseError(f"rdf:ID is not an NCName: {rid!r}")
        if nid is not None and not _NCNAME_RE.match(nid):
            raise RdfXmlParseError(f"rdf:nodeID is not an NCName: {nid!r}")
        if about is not None:
            subj = self.resolve(about, base)
        elif rid is not None:
            subj = self.resolve("#" + rid, base)
        elif nid is not None:
            subj = bnode(nid)
        else:
            subj = self.fresh()
        tag_iri = _split(el.tag)
        if el.tag != _RDF_DESCRIPTION:
            self.out.append((subj, iri(RDF_NS + "type"), iri(tag_iri)))
        # property attributes
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k in _OLD_TERMS or \
                    k.startswith(f"{{{XML_NS}}}") or not k.startswith("{"):
                continue
            p = _split(k)
            if p == RDF_NS + "type":
                self.out.append((subj, iri(p), self.resolve(v, base)))
            else:
                o = langlit(v, lang) if lang else literal(v)
                self.out.append((subj, iri(p), o))
        li = [0]
        for child in el:
            self.property_element(subj, child, lang, base, li)
        return subj

    # -- property elements --------------------------------------------

    def property_element(self, subj: Term, el: ET.Element, lang: str,
                         base: Optional[BaseIri], li: List[int]) -> None:
        lang = el.get(f"{{{XML_NS}}}lang", lang)
        xb = el.get(f"{{{XML_NS}}}base")
        if xb:
            base = BaseIri(xb)
        p_iri = _split(el.tag)
        if p_iri == RDF_NS + "li":
            li[0] += 1
            p_iri = f"{RDF_NS}_{li[0]}"
        pred = iri(p_iri)

        _check_attrs(el)
        ptype = el.get(f"{{{RDF_NS}}}parseType")
        res = el.get(f"{{{RDF_NS}}}resource")
        nid = el.get(f"{{{RDF_NS}}}nodeID")
        dt = el.get(f"{{{RDF_NS}}}datatype")
        if res is not None and nid is not None:
            raise RdfXmlParseError(
                "rdf:resource and rdf:nodeID on one property element")
        if nid is not None and not _NCNAME_RE.match(nid):
            raise RdfXmlParseError(f"rdf:nodeID is not an NCName: {nid!r}")

        if ptype == "Resource":
            node = self.fresh()
            self.out.append((subj, pred, node))
            li2 = [0]
            for child in el:
                self.property_element(node, child, lang, base, li2)
            return
        if ptype == "Collection":
            items = [self.node_element(c, lang, base) for c in el]
            head: Term = iri(RDF_NS + "nil")
            for item in reversed(items):
                cell = self.fresh()
                self.out.append((cell, iri(RDF_NS + "first"), item))
                self.out.append((cell, iri(RDF_NS + "rest"), head))
                head = cell
            self.out.append((subj, pred, head))
            return
        if ptype == "Literal":
            inner = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in el)
            self.out.append((subj, pred,
                             literal(inner, XMLLITERAL)))
            return
        if res is not None or nid is not None:
            if (el.text or "").strip() or len(el):
                raise RdfXmlParseError(
                    "property element with rdf:resource/rdf:nodeID "
                    "must be empty")
            obj = self.resolve(res, base) if res is not None else bnode(nid)
            # property attributes on an empty property element apply to obj
            extra = [(k, v) for k, v in el.attrib.items()
                     if k not in _SYNTAX_ATTRS and k.startswith("{")
                     and not k.startswith(f"{{{XML_NS}}}")]
            for k, v in extra:
                o = langlit(v, lang) if lang else literal(v)
                self.out.append((obj, iri(_split(k)), o))
            self.out.append((subj, pred, obj))
            return
        children = list(el)
        if children:
            if len(children) != 1:
                raise RdfXmlParseError("property element with >1 node child")
            obj = self.node_element(children[0], lang, base)
            self.out.append((subj, pred, obj))
            return
        text = el.text or ""
        extra = [(k, v) for k, v in el.attrib.items()
                 if k not in _SYNTAX_ATTRS and k.startswith("{")
                 and not k.startswith(f"{{{XML_NS}}}")]
        if extra and not text.strip():
            node = self.fresh()
            for k, v in extra:
                o = langlit(v, lang) if lang else literal(v)
                self.out.append((node, iri(_split(k)), o))
            self.out.append((subj, pred, node))
            return
        if dt is not None:
            self.out.append((subj, pred, literal(text, dt)))
        elif lang:
            self.out.append((subj, pred, langlit(text, lang)))
        else:
            self.out.append((subj, pred, literal(text)))


def parse_rdfxml(text: str, base: Optional[str] = None
                 ) -> List[Tuple[Term, Term, Term]]:
    """RDF/XML document → list of (s, p, o) Terms."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlParseError(f"xml: {e}") from e
    p = _Parser(base)
    lang = root.get(f"{{{XML_NS}}}lang", "")
    xb = root.get(f"{{{XML_NS}}}base")
    rbase = BaseIri(xb) if xb else None
    if root.tag == f"{{{RDF_NS}}}RDF":
        for child in root:
            p.node_element(child, lang, rbase)
    else:
        p.node_element(root, lang, rbase)
    return p.out


# ---------------------------------------------------------------------------
# serializer (xml/src/serializer.rs:49 — subject-grouped Descriptions)
# ---------------------------------------------------------------------------

_LOCAL_RX = re.compile(r"[A-Za-z_][A-Za-z0-9_.-]*$")


def _split_iri(text: str) -> Optional[Tuple[str, str]]:
    for cut in ("#", "/", ":"):
        idx = text.rfind(cut)
        if idx >= 0:
            local = text[idx + 1:]
            if local and _LOCAL_RX.fullmatch(local):
                return text[:idx + 1], local
    return None


#: chars XML 1.0 cannot carry even as character references (§2.2 Char)
_XML_UNREPRESENTABLE = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")


def _xml_escape(s: str, attr: bool = False) -> str:
    if _XML_UNREPRESENTABLE.search(s):
        raise ValueError(
            "value contains characters not representable in XML 1.0")
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    # \r must be a charref: XML parsers normalize raw CR/CRLF to LF
    # (XML 1.0 §2.11), which would silently alter the literal
    s = s.replace("\r", "&#13;")
    if attr:
        s = s.replace('"', "&quot;").replace("\t", "&#9;") \
            .replace("\n", "&#10;")
    return s


def _ncname_label(label: str) -> str:
    """rdf:nodeID values must be NCNames; labels that are not (NT
    allows digit-start/odd chars) are renamed deterministically and
    injectively (``b<utf8-hex>``) so co-reference survives the
    round-trip — the same strategy oxrdfxml's serializer uses for
    invalid labels."""
    if _NCNAME_RE.match(label):
        return label
    return "b" + label.encode("utf-8").hex()


def serialize_rdfxml(triples, *, indent: int = 2) -> str:
    """Triples (Term tuples) → RDF/XML document string.  Subjects are
    grouped; predicates must be splittable into (namespace, XML local
    name) — true for real-world vocabularies."""
    triples = list(triples)
    ns_of: Dict[str, str] = {RDF_NS: "rdf"}
    order: List[str] = []

    def prefix_for(ns: str) -> str:
        if ns not in ns_of:
            ns_of[ns] = f"ns{len(ns_of)}"
            order.append(ns)
        return ns_of[ns]

    by_subj: Dict[Term, List[Tuple[Term, Term]]] = {}
    subj_order: List[Term] = []
    for s, p, o in triples:
        if s not in by_subj:
            by_subj[s] = []
            subj_order.append(s)
        by_subj[s].append((p, o))
        split = _split_iri(p[1])
        if split is None:
            raise ValueError(f"predicate not XML-splittable: {p[1]}")
        prefix_for(split[0])

    pad = " " * indent
    body: List[str] = []
    for s in subj_order:
        if s[0] == KIND_IRI:
            open_tag = f'{pad}<rdf:Description rdf:about="{_xml_escape(s[1], True)}">'
        else:
            open_tag = (f'{pad}<rdf:Description '
                        f'rdf:nodeID="{_xml_escape(_ncname_label(s[1]), True)}">')
        body.append(open_tag)
        for p, o in by_subj[s]:
            ns, local = _split_iri(p[1])
            tag = f"{ns_of[ns]}:{local}"
            if o[0] == KIND_IRI:
                body.append(f'{pad * 2}<{tag} rdf:resource="{_xml_escape(o[1], True)}"/>')
            elif o[0] == KIND_BNODE:
                body.append(f'{pad * 2}<{tag} rdf:nodeID='
                            f'"{_xml_escape(_ncname_label(o[1]), True)}"/>')
            elif o[0] == KIND_LITERAL:
                lex = _xml_escape(o[1])
                if o[3]:
                    body.append(f'{pad * 2}<{tag} xml:lang="{o[3]}">{lex}</{tag}>')
                elif o[2] and o[2] != "http://www.w3.org/2001/XMLSchema#string":
                    body.append(f'{pad * 2}<{tag} rdf:datatype="{_xml_escape(o[2], True)}">{lex}</{tag}>')
                else:
                    body.append(f"{pad * 2}<{tag}>{lex}</{tag}>")
            else:
                raise ValueError(f"RDF/XML cannot serialize term kind {o[0]}")
        body.append(f"{pad}</rdf:Description>")

    decls = ['xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"']
    decls += [f'xmlns:{ns_of[ns]}="{_xml_escape(ns, True)}"' for ns in order]
    head = "<rdf:RDF " + " ".join(decls) + ">"
    return "\n".join(['<?xml version="1.0" encoding="UTF-8"?>', head,
                      *body, "</rdf:RDF>"]) + "\n"


# ---------------------------------------------------------------------------
# batch adapters (one document per row)
# ---------------------------------------------------------------------------

def parse_rdfxml_batch(docs, urls=None):
    """list of document strings → dict of NT-text columns (s, p, o[,
    url]); parse errors become error rows (two-sided error semantics)."""
    s_out: List[str] = []
    p_out: List[str] = []
    o_out: List[str] = []
    u_out: List[str] = []
    e_out: List[str] = []
    urls = urls or [""] * len(docs)
    for doc, url in zip(docs, urls):
        try:
            BaseIri(url)
            base = url
        except ValueError:
            base = None  # non-IRI provenance key: parse without a base
        try:
            trs = parse_rdfxml(doc, base=base)
        except (RdfXmlParseError, ValueError) as e:
            s_out.append("")
            p_out.append("")
            o_out.append("")
            u_out.append(url)
            e_out.append(str(e))
            continue
        for s, p, o in trs:
            s_out.append(format_term(s))
            p_out.append(format_term(p))
            o_out.append(format_term(o))
            u_out.append(url)
            e_out.append("")
    return {"s": s_out, "p": p_out, "o": o_out, "url": u_out,
            "error": e_out}


def format_rdfxml_batch(batch) -> Dict[str, List[str]]:
    """NT-text (s, p, o) batch → one RDF/XML document per batch."""

    trs = [(parse_term_text(s), parse_term_text(p), parse_term_text(o))
           for s, p, o in zip(batch["s"], batch["p"], batch["o"])]
    return {"xml": [serialize_rdfxml(trs)]}
