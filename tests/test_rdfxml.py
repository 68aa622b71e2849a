"""RDF/XML parser + serializer tests (reference xml/src/parser.rs,
xml/src/serializer.rs; golden expectations follow the RDF/XML spec
constructs the reference supports)."""

import pytest

from sophia_rs_ray.rdfxml import (
    RdfXmlParseError, parse_rdfxml, parse_rdfxml_batch, serialize_rdfxml,
)
from sophia_rs_ray.terms import bnode, format_term, iri, langlit, literal

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
EX = "http://ex.org/"


def nt(trs):
    return {(format_term(s), format_term(p), format_term(o))
            for s, p, o in trs}


def test_description_about_and_properties():
    doc = f'''<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:name>Alice</ex:name>
        <ex:knows rdf:resource="{EX}b"/>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
      </rdf:Description>
    </rdf:RDF>'''
    got = nt(parse_rdfxml(doc))
    assert got == {
        (f"<{EX}a>", f"<{EX}name>", '"Alice"'),
        (f"<{EX}a>", f"<{EX}knows>", f"<{EX}b>"),
        (f"<{EX}a>", f"<{EX}age>",
         '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    }


def test_typed_node_lang_and_property_attributes():
    doc = f'''<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}" xml:lang="en">
      <ex:Person rdf:about="{EX}a" ex:nick="Al">
        <ex:label xml:lang="fr">bonjour</ex:label>
        <ex:note>hi</ex:note>
      </ex:Person>
    </rdf:RDF>'''
    got = nt(parse_rdfxml(doc))
    assert (f"<{EX}a>", f"<{RDF}type>", f"<{EX}Person>") in got
    assert (f"<{EX}a>", f"<{EX}nick>", '"Al"@en') in got
    assert (f"<{EX}a>", f"<{EX}label>", '"bonjour"@fr') in got
    assert (f"<{EX}a>", f"<{EX}note>", '"hi"@en') in got


def test_nested_node_and_nodeid():
    doc = f'''<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:knows>
          <rdf:Description rdf:nodeID="b1">
            <ex:name>Bob</ex:name>
          </rdf:Description>
        </ex:knows>
      </rdf:Description>
    </rdf:RDF>'''
    got = nt(parse_rdfxml(doc))
    assert (f"<{EX}a>", f"<{EX}knows>", "_:b1") in got
    assert ("_:b1", f"<{EX}name>", '"Bob"') in got


def test_parsetype_resource_and_collection_and_li():
    doc = f'''<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:addr rdf:parseType="Resource">
          <ex:city>Rome</ex:city>
        </ex:addr>
        <ex:list rdf:parseType="Collection">
          <rdf:Description rdf:about="{EX}x"/>
          <rdf:Description rdf:about="{EX}y"/>
        </ex:list>
        <rdf:li>one</rdf:li>
        <rdf:li>two</rdf:li>
      </rdf:Description>
    </rdf:RDF>'''
    got = nt(parse_rdfxml(doc))
    # parseType=Resource bnode carries the city
    addr = [o for s, p, o in got if p == f"<{EX}addr>"]
    assert len(addr) == 1 and addr[0].startswith("_:")
    assert (addr[0], f"<{EX}city>", '"Rome"') in got
    # collection: a list of x, y ending in rdf:nil
    firsts = [(s, o) for s, p, o in got if p == f"<{RDF}first>"]
    assert {o for _s, o in firsts} == {f"<{EX}x>", f"<{EX}y>"}
    assert any(o == f"<{RDF}nil>" for s, p, o in got if p == f"<{RDF}rest>")
    # li counters
    assert (f"<{EX}a>", f"<{RDF}_1>", '"one"') in got
    assert (f"<{EX}a>", f"<{RDF}_2>", '"two"') in got


def test_base_resolution():
    doc = f'''<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="{EX}"
                xml:base="http://base.org/dir/">
      <rdf:Description rdf:about="rel">
        <ex:p rdf:resource="../other"/>
        <ex:q rdf:ID="frag"/>
      </rdf:Description>
    </rdf:RDF>'''
    got = nt(parse_rdfxml(doc))
    subs = {s for s, _p, _o in got}
    assert "<http://base.org/dir/rel>" in subs
    assert any(o == "<http://base.org/other>" for _s, p, o in got
               if p == f"<{EX}p>")


def test_parse_errors_are_rows_in_batch():
    out = parse_rdfxml_batch(["<not-xml", "<rdf:RDF xmlns:rdf='%s'/>" % RDF],
                             urls=["u1", "u2"])
    assert out["error"][0].startswith("xml:")
    assert len(out["s"]) == 1  # only the error row (second doc is empty)


def test_roundtrip_serialize_parse():
    trs = [
        (iri(EX + "a"), iri(EX + "name"), literal('Al "quoted" <tag>')),
        (iri(EX + "a"), iri(EX + "knows"), bnode("b7")),
        (bnode("b7"), iri(EX + "name"), langlit("Bob", "en")),
        (iri(EX + "a"), iri(EX + "age"),
         literal("30", "http://www.w3.org/2001/XMLSchema#integer")),
        (iri(EX + "a"), iri(RDF + "type"), iri(EX + "Person")),
    ]
    doc = serialize_rdfxml(trs)
    assert nt(parse_rdfxml(doc)) == nt(trs)
