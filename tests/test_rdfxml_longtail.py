"""RDF/XML long tail pinned against oxrdfxml behavior (VERDICT r4
"what's missing" #3; reference ``xml/src/parser.rs:15`` delegates to
oxrdfxml): RDF-2004-removed attributes, attribute-position rules,
conflicting object attributes, NCName validation, and DOCTYPE/entity
handling (internal entities resolve, amplification bombs and external
entities error — expat's built-in limits)."""

import pytest

from sophia_rs_ray.c14n import isomorphic
from sophia_rs_ray.rdfxml import (
    RdfXmlParseError, parse_rdfxml, serialize_rdfxml,
)
from sophia_rs_ray.terms import bnode, iri, literal

RDF_X = 'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
EX_X = 'xmlns:ex="http://ex.org/"'


def _doc(inner: str) -> str:
    return f"<rdf:RDF {RDF_X} {EX_X}>{inner}</rdf:RDF>"


# --- removed 2004 terms ------------------------------------------------

@pytest.mark.parametrize("attr", ["aboutEach", "aboutEachPrefix", "bagID"])
def test_removed_attrs_rejected_on_node_elements(attr):
    doc = _doc(f'<rdf:Description rdf:{attr}="#x">'
               f"<ex:p>v</ex:p></rdf:Description>")
    with pytest.raises(RdfXmlParseError, match="removed"):
        parse_rdfxml(doc)


def test_removed_attrs_rejected_on_property_elements():
    doc = _doc('<rdf:Description rdf:about="http://ex.org/a">'
               '<ex:p rdf:bagID="b">v</ex:p></rdf:Description>')
    with pytest.raises(RdfXmlParseError, match="removed"):
        parse_rdfxml(doc)


def test_li_as_attribute_rejected():
    doc = _doc('<rdf:Description rdf:about="http://ex.org/a" rdf:li="x"/>')
    with pytest.raises(RdfXmlParseError, match="rdf:li"):
        parse_rdfxml(doc)


# --- conflicting / malformed attributes --------------------------------

def test_about_plus_nodeid_rejected():
    doc = _doc('<rdf:Description rdf:about="http://ex.org/a" '
               'rdf:nodeID="n"><ex:p>v</ex:p></rdf:Description>')
    with pytest.raises(RdfXmlParseError, match="conflicting"):
        parse_rdfxml(doc)


def test_resource_plus_nodeid_rejected():
    doc = _doc('<rdf:Description rdf:about="http://ex.org/a">'
               '<ex:p rdf:resource="http://ex.org/b" rdf:nodeID="n"/>'
               "</rdf:Description>")
    with pytest.raises(RdfXmlParseError, match="rdf:resource and"):
        parse_rdfxml(doc)


def test_resource_with_text_content_rejected():
    doc = _doc('<rdf:Description rdf:about="http://ex.org/a">'
               '<ex:p rdf:resource="http://ex.org/b">text</ex:p>'
               "</rdf:Description>")
    with pytest.raises(RdfXmlParseError, match="must be empty"):
        parse_rdfxml(doc)


@pytest.mark.parametrize("bad", ["3bad", "has colon:x", "-dash", ".dot"])
def test_non_ncname_id_rejected(bad):
    doc = _doc(f'<rdf:Description rdf:ID="{bad}" '
               f'xml:base="http://ex.org/"><ex:p>v</ex:p>'
               f"</rdf:Description>")
    with pytest.raises(RdfXmlParseError, match="NCName"):
        parse_rdfxml(doc)


def test_valid_ncnames_accepted():
    doc = _doc('<rdf:Description rdf:ID="ok-Name_1.x" '
               'xml:base="http://ex.org/"><ex:p>v</ex:p>'
               "</rdf:Description>")
    out = parse_rdfxml(doc)
    assert out[0][0][1] == "http://ex.org/#ok-Name_1.x"


def test_non_ncname_nodeid_rejected():
    doc = _doc('<rdf:Description rdf:nodeID="0digit">'
               "<ex:p>v</ex:p></rdf:Description>")
    with pytest.raises(RdfXmlParseError, match="NCName"):
        parse_rdfxml(doc)


# --- DOCTYPE / entities --------------------------------------------------

def test_internal_entity_resolves():
    doc = ('<?xml version="1.0"?><!DOCTYPE rdf:RDF '
           '[<!ENTITY ex "http://ex.org/">]>'
           f"<rdf:RDF {RDF_X} {EX_X}>"
           '<rdf:Description rdf:about="&ex;a"><ex:p>v</ex:p>'
           "</rdf:Description></rdf:RDF>")
    out = parse_rdfxml(doc)
    assert out == [(iri("http://ex.org/a"), iri("http://ex.org/p"),
                    literal("v"))]


def test_undefined_entity_errors():
    doc = _doc('<rdf:Description rdf:about="http://ex.org/a">'
               "<ex:p>&undef;</ex:p></rdf:Description>")
    with pytest.raises(RdfXmlParseError, match="entity"):
        parse_rdfxml(doc)


def test_entity_amplification_bomb_errors():
    ents = ['<!ENTITY a "aaaaaaaaaa">']
    for prev, cur in zip("abcdefg", "bcdefgh"):
        ents.append(f'<!ENTITY {cur} "' + f"&{prev};" * 10 + '">')
    doc = ('<?xml version="1.0"?><!DOCTYPE x [' + "".join(ents) + "]>"
           f"<rdf:RDF {RDF_X} {EX_X}>"
           '<rdf:Description rdf:about="http://ex.org/a">'
           "<ex:p>&h;</ex:p></rdf:Description></rdf:RDF>")
    with pytest.raises(RdfXmlParseError):
        parse_rdfxml(doc)


def test_external_entity_never_fetched():
    doc = ('<?xml version="1.0"?><!DOCTYPE x '
           '[<!ENTITY xxe SYSTEM "file:///etc/passwd">]>'
           f"<rdf:RDF {RDF_X} {EX_X}>"
           '<rdf:Description rdf:about="http://ex.org/a">'
           "<ex:p>&xxe;</ex:p></rdf:Description></rdf:RDF>")
    with pytest.raises(RdfXmlParseError):
        parse_rdfxml(doc)


# --- serializer renames non-NCName bnode labels --------------------------

def test_serializer_roundtrips_non_ncname_bnode_labels():
    t = [(bnode("0digit"), iri("http://ex.org/p"), literal("v")),
         (bnode("0digit"), iri("http://ex.org/q"), bnode("0digit")),
         (bnode("ok"), iri("http://ex.org/p"), bnode("0digit"))]
    back = parse_rdfxml(serialize_rdfxml(t))
    assert isomorphic([(s, p, o, None) for s, p, o in t],
                      [(s, p, o, None) for s, p, o in back])
