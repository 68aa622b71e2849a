"""JSON-LD serializer round-trip tests (reference
jsonld/src/serializer.rs — flattened expanded output re-parsed by our
own expander must yield the identical triple set)."""

import json

from sophia_rs_ray.jsonld import jsonld_to_triples, serialize_jsonld
from sophia_rs_ray.terms import (
    bnode, format_term, int_literal, iri, langlit, literal,
)

EX = "http://ex.org/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def nt(trs):
    return {(format_term(s), format_term(p), format_term(o))
            for s, p, o in trs}


def _roundtrip(trs):
    doc = serialize_jsonld(trs)
    got, err = jsonld_to_triples(doc)
    assert err is None
    return {(format_term(s), format_term(p), format_term(o))
            for s, p, o, _g in got}


def test_roundtrip_mixed_terms():
    trs = [
        (iri(EX + "a"), iri(RDF + "type"), iri(EX + "Person")),
        (iri(EX + "a"), iri(EX + "name"), literal('Al "q" \n x')),
        (iri(EX + "a"), iri(EX + "label"), langlit("bonjour", "fr")),
        (iri(EX + "a"), iri(EX + "age"), int_literal(30)),
        (iri(EX + "a"), iri(EX + "knows"), bnode("b1")),
        (bnode("b1"), iri(EX + "name"), literal("Bob")),
        (iri(EX + "a"), iri(EX + "knows"), iri(EX + "c")),
    ]
    assert _roundtrip(trs) == nt(trs)


def test_output_shape_is_flattened_expanded():
    trs = [(iri(EX + "a"), iri(RDF + "type"), iri(EX + "T")),
           (iri(EX + "a"), iri(EX + "p"), literal("v"))]
    doc = json.loads(serialize_jsonld(trs))
    assert isinstance(doc, list) and len(doc) == 1
    node = doc[0]
    assert node["@id"] == EX + "a"
    assert node["@type"] == [EX + "T"]
    assert node[EX + "p"] == [{"@value": "v"}]


def test_deterministic_output():
    trs = [(iri(EX + "a"), iri(EX + "p"), literal("1")),
           (iri(EX + "b"), iri(EX + "p"), literal("2"))]
    assert serialize_jsonld(trs) == serialize_jsonld(trs)
