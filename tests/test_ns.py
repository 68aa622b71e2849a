"""Namespace API (reference api/src/ns.rs + generated vocab modules)."""
import pytest

from sophia_rs_ray.ns import (InvalidIriError, Namespace, dc, foaf, rdf,
                              rdfs, typed, xsd)
from sophia_rs_ray.terms import KIND_IRI, KIND_LITERAL, format_term


def test_custom_namespace_get():
    s = Namespace("http://schema.org/")
    t = s.get("name")
    assert t[0] == KIND_IRI and t[1] == "http://schema.org/name"


def test_attribute_and_item_sugar():
    s = Namespace("http://schema.org/")
    assert s.name == s.get("name") == s["name"]
    # trailing underscore escapes keywords (reference rdf::type_)
    assert rdf.type_[1].endswith("22-rdf-syntax-ns#type")


def test_invalid_base_rejected():
    with pytest.raises(InvalidIriError):
        Namespace("not an iri")


def test_invalid_suffix_rejected():
    s = Namespace("http://schema.org/")
    with pytest.raises(InvalidIriError):
        s.get("spa ce")


def test_prebuilt_vocabularies():
    assert rdfs.range[1] == "http://www.w3.org/2000/01/rdf-schema#range"
    assert xsd.string[1] == "http://www.w3.org/2001/XMLSchema#string"
    assert foaf.name[1] == "http://xmlns.com/foaf/0.1/name"
    assert dc.title[1] == "http://purl.org/dc/terms/title"


def test_typed_literal():
    t = typed("2023-11-15", xsd.date)
    assert t[0] == KIND_LITERAL
    assert format_term(t) == \
        '"2023-11-15"^^<http://www.w3.org/2001/XMLSchema#date>'


def test_typed_rejects_non_iri_datatype():
    with pytest.raises(InvalidIriError):
        typed("x", typed("y", xsd.string))


def test_namespace_equality_hash():
    assert Namespace("http://a/") == Namespace("http://a/")
    assert len({Namespace("http://a/"), Namespace("http://a/")}) == 1
