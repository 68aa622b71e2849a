"""Property-based roundtrips for the other serializers: expanded and
COMPACTED JSON-LD, and RDF/XML, over random graphs (shared bnodes,
typed/lang literals)."""

import string

from hypothesis import given, settings, strategies as st

from sophia_rs_ray.terms import bnode, iri, langlit, literal

XSD = "http://www.w3.org/2001/XMLSchema#"

_iris = st.builds(
    lambda s: iri(f"http://ex.org/{s}"),
    st.text(alphabet=string.ascii_lowercase + string.digits,
            min_size=1, max_size=8))
_bnodes = st.builds(lambda i: bnode(f"b{i}"), st.integers(0, 4))
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\x00"),
    max_size=10)
_lits = st.one_of(
    st.builds(literal, _text),
    st.builds(lambda n: literal(str(n), XSD + "integer"),
              st.integers(-999, 999)),
    st.builds(langlit, _text, st.sampled_from(["en", "fr", "de-CH"])),
)
_preds = st.builds(lambda s: iri(f"http://ex.org/ns#{s}"),
                   st.sampled_from(["a", "b", "c", "name", "next"]))
_triples = st.lists(
    st.tuples(st.one_of(_iris, _bnodes), _preds,
              st.one_of(_iris, _bnodes, _lits)),
    min_size=0, max_size=20)

CTX = {"@vocab": "http://ex.org/ns#",
       "next": {"@id": "http://ex.org/ns#next", "@type": "@id"},
       "c": {"@id": "http://ex.org/ns#c", "@type": XSD + "integer"}}


def _quads(ts):
    return [(s, p, o, None) for (s, p, o) in ts]


@settings(max_examples=100, deadline=None)
@given(_triples)
def test_jsonld_expanded_roundtrip(ts):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.jsonld import jsonld_to_triples, serialize_jsonld

    got, err = jsonld_to_triples(serialize_jsonld(ts), None)
    assert err is None
    assert isomorphic(_quads(ts), got)


@settings(max_examples=100, deadline=None)
@given(_triples)
def test_jsonld_compacted_roundtrip(ts):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.jsonld import jsonld_to_triples, serialize_jsonld

    text = serialize_jsonld(ts, context=CTX)
    got, err = jsonld_to_triples(text, None)
    assert err is None, (err, text)
    assert isomorphic(_quads(ts), got), text


# XML 1.0 cannot carry most control chars even as charrefs (the
# serializer raises on them — covered below); restrict the XML
# generator to representable text
_xml_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="".join(
                               map(chr, [*range(0x00, 0x09), 0x0B, 0x0C,
                                         *range(0x0E, 0x20),
                                         0xFFFE, 0xFFFF]))),
    max_size=10)
_xml_lits = st.one_of(
    st.builds(literal, _xml_text),
    st.builds(lambda n: literal(str(n), XSD + "integer"),
              st.integers(-999, 999)),
    st.builds(langlit, _xml_text, st.sampled_from(["en", "fr"])),
)
_xml_triples = st.lists(
    st.tuples(st.one_of(_iris, _bnodes), _preds,
              st.one_of(_iris, _bnodes, _xml_lits)),
    min_size=0, max_size=20)


@settings(max_examples=100, deadline=None)
@given(_xml_triples)
def test_rdfxml_roundtrip(ts):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.rdfxml import parse_rdfxml, serialize_rdfxml

    back = parse_rdfxml(serialize_rdfxml(ts))
    assert isomorphic(_quads(ts), _quads(back))


def test_rdfxml_unrepresentable_literal_raises():
    import pytest

    from sophia_rs_ray.rdfxml import serialize_rdfxml

    with pytest.raises(ValueError, match="XML 1.0"):
        serialize_rdfxml([(iri("http://e/s"), iri("http://ex.org/ns#a"),
                           literal("\x1f"))])


def test_rdfxml_carriage_return_survives():
    from sophia_rs_ray.rdfxml import parse_rdfxml, serialize_rdfxml

    ts = [(iri("http://e/s"), iri("http://ex.org/ns#a"),
           literal("a\rb\r\nc"))]
    back = parse_rdfxml(serialize_rdfxml(ts))
    assert back[0][2][1] == "a\rb\r\nc"
