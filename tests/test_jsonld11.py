"""JSON-LD 1.1 expansion keywords closed in r5: @included, @protected,
@propagate, and the toRdf/fromRdf options rdfDirection / useNativeTypes
/ useRdfType (reference jsonld/src/options.rs:117-142; the reference
delegates the algorithms to the json_ld crate, jsonld/src/parser.rs:42).

Cases transcribed from the W3C json-ld-api test suite shapes
(https://w3c.github.io/json-ld-api/tests/ — in16..in40 expand tests,
tdi01..tdi11 toRdf tests), re-expressed against this expander's term
output."""

import json

import pytest

from sophia_rs_ray.jsonld import (JsonLdOptions, jsonld_to_triples,
                                  serialize_jsonld)
from sophia_rs_ray.ntriples import parse_term_text
from sophia_rs_ray.terms import format_term


def nt(doc, options=None, base=None):
    trs, err = jsonld_to_triples(json.dumps(doc), base=base,
                                 options=options)
    assert err is None, err
    return sorted(" ".join(format_term(t) for t in tr[:3]) for tr in trs)


def expand_err(doc, options=None):
    trs, err = jsonld_to_triples(json.dumps(doc), options=options)
    return err


# ---------------------------------------------------------------------------
# @included (expand in16/in40 family)
# ---------------------------------------------------------------------------

def test_included_basic():
    doc = {"@context": {"@vocab": "http://example.org/"},
           "@id": "http://e/a", "prop": "v1",
           "@included": [{"@id": "http://e/b", "prop": "v2"},
                         {"@id": "http://e/c", "prop": "v3"}]}
    assert nt(doc) == sorted([
        '<http://e/a> <http://example.org/prop> "v1"',
        '<http://e/b> <http://example.org/prop> "v2"',
        '<http://e/c> <http://example.org/prop> "v3"'])


def test_included_alias_and_nesting():
    doc = {"@context": {"@vocab": "http://e/", "incl": "@included"},
           "@id": "http://e/a", "p": "x",
           "incl": {"@id": "http://e/b", "p": "y",
                    "@included": {"@id": "http://e/c", "p": "z"}}}
    assert nt(doc) == sorted([
        '<http://e/a> <http://e/p> "x"',
        '<http://e/b> <http://e/p> "y"',
        '<http://e/c> <http://e/p> "z"'])


def test_included_only_document():
    # a document that is NOTHING but an @included block still yields
    # the included nodes
    doc = {"@included": [{"@id": "http://e/b",
                          "http://e/p": {"@value": "y"}}]}
    assert nt(doc) == ['<http://e/b> <http://e/p> "y"']


def test_included_same_graph():
    doc = {"@id": "http://e/g", "@graph": [
        {"@id": "http://e/a", "http://e/p": "v",
         "@included": [{"@id": "http://e/b", "http://e/p": "w"}]}]}
    trs, err = jsonld_to_triples(json.dumps(doc))
    assert err is None
    graphs = {format_term(g) for (_s, _p, _o, g) in trs if g is not None}
    assert graphs == {"<http://e/g>"}
    assert len(trs) == 2


# ---------------------------------------------------------------------------
# @protected (expand tpr family)
# ---------------------------------------------------------------------------

PROT_CTX = {"@protected": True, "name": "http://ex/name"}


def test_protected_redefinition_errors():
    doc = {"@context": PROT_CTX, "@id": "http://e/a",
           "http://ex/friend": {
               "@context": {"name": "http://OTHER/name"},
               "@id": "http://e/b", "name": "B"}}
    err = expand_err(doc)
    assert err is not None and "protected" in err


def test_protected_identical_redefinition_ok():
    doc = {"@context": PROT_CTX, "@id": "http://e/a",
           "http://ex/friend": {
               "@context": {"name": "http://ex/name"},
               "@id": "http://e/b", "name": "B"}}
    assert '<http://e/b> <http://ex/name> "B"' in nt(doc)


def test_protected_removal_errors():
    doc = {"@context": PROT_CTX, "@id": "http://e/a",
           "http://ex/friend": {
               "@context": {"name": None},
               "@id": "http://e/b", "http://ex/p": "B"}}
    err = expand_err(doc)
    assert err is not None and "protected" in err


def test_protected_nullification_errors():
    doc = {"@context": PROT_CTX, "@id": "http://e/a",
           "http://ex/friend": {"@context": None, "@id": "http://e/b"}}
    err = expand_err(doc)
    assert err is not None and "nullification" in err


def test_protected_per_term_optout():
    doc = {"@context": {"@protected": True,
                        "name": "http://ex/name",
                        "nick": {"@id": "http://ex/nick",
                                 "@protected": False}},
           "@id": "http://e/a",
           "http://ex/friend": {
               "@context": {"nick": "http://OTHER/nick"},
               "@id": "http://e/b", "nick": "B"}}
    assert '<http://e/b> <http://OTHER/nick> "B"' in nt(doc)


def test_per_term_protected_without_context_flag():
    doc = {"@context": {"name": {"@id": "http://ex/name",
                                 "@protected": True}},
           "@id": "http://e/a",
           "http://ex/friend": {
               "@context": {"name": "http://OTHER/name"},
               "@id": "http://e/b", "name": "B"}}
    err = expand_err(doc)
    assert err is not None and "protected" in err


def test_unprotected_terms_still_overridable():
    doc = {"@context": {"name": "http://ex/name"},
           "@id": "http://e/a",
           "http://ex/friend": {
               "@context": {"name": "http://OTHER/name"},
               "@id": "http://e/b", "name": "B"}}
    assert '<http://e/b> <http://OTHER/name> "B"' in nt(doc)


# ---------------------------------------------------------------------------
# @propagate (expand c032..c038 family)
# ---------------------------------------------------------------------------

def test_propagate_false_reverts_in_nested_nodes():
    doc = {"@context": {"@vocab": "http://outer/"},
           "@id": "http://e/a",
           "p": {"@context": {"@vocab": "http://inner/",
                              "@propagate": False},
                 "@id": "http://e/b",
                 "q": {"@id": "http://e/c", "r": "deep"}}}
    got = nt(doc)
    # the non-propagating vocab applies to b's own keys only; c's keys
    # expand against the reverted outer vocab
    assert '<http://e/b> <http://inner/q> <http://e/c>' in got
    assert '<http://e/c> <http://outer/r> "deep"' in got


def test_propagate_true_is_default():
    doc = {"@context": {"@vocab": "http://outer/"},
           "@id": "http://e/a",
           "p": {"@context": {"@vocab": "http://inner/"},
                 "@id": "http://e/b",
                 "q": {"@id": "http://e/c", "r": "deep"}}}
    assert '<http://e/c> <http://inner/r> "deep"' in nt(doc)


def test_propagate_invalid_value_errors():
    doc = {"@context": {"@propagate": "nope", "@vocab": "http://v/"},
           "@id": "http://e/a", "p": "x"}
    err = expand_err(doc)
    assert err is not None and "@propagate" in err


def test_propagate_requires_1_1():
    doc = {"@context": {"@propagate": False, "@vocab": "http://v/"},
           "@id": "http://e/a", "p": "x"}
    err = expand_err(doc, JsonLdOptions(processing_mode="json-ld-1.0"))
    assert err is not None and "1.1" in err


# ---------------------------------------------------------------------------
# rdfDirection (toRdf tdi01..tdi11 family)
# ---------------------------------------------------------------------------

DIR_DOC = {"@id": "http://e/a",
           "http://ex/t": {"@value": "arabic", "@language": "AR",
                           "@direction": "rtl"}}


def test_rdf_direction_default_native():
    got = nt(DIR_DOC)
    assert got == ['<http://e/a> <http://ex/t> "arabic"@ar--rtl']


def test_rdf_direction_i18n_datatype():
    got = nt(DIR_DOC, JsonLdOptions(rdf_direction="i18n-datatype"))
    assert got == ['<http://e/a> <http://ex/t> '
                   '"arabic"^^<https://www.w3.org/ns/i18n#ar_rtl>']


def test_rdf_direction_compound_literal():
    got = nt(DIR_DOC, JsonLdOptions(rdf_direction="compound-literal"))
    rdfns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert sorted(got) == sorted([
        f'_:b0 <{rdfns}value> "arabic"',
        f'_:b0 <{rdfns}language> "ar"',
        f'_:b0 <{rdfns}direction> "rtl"',
        '<http://e/a> <http://ex/t> _:b0'])


def test_rdf_direction_invalid_option():
    with pytest.raises(ValueError):
        JsonLdOptions(rdf_direction="bogus")


# ---------------------------------------------------------------------------
# useNativeTypes / useRdfType (fromRdf family)
# ---------------------------------------------------------------------------

def _trs(*nt_rows):
    return [tuple(parse_term_text(t) for t in row) for row in nt_rows]


def test_use_native_types():
    trs = _trs(
        ("<http://e/a>", "<http://e/n>",
         '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://e/a>", "<http://e/b>",
         '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'),
        ("<http://e/a>", "<http://e/d>",
         '"5.5E0"^^<http://www.w3.org/2001/XMLSchema#double>'),
        ("<http://e/a>", "<http://e/s>", '"keep"'))
    doc = json.loads(serialize_jsonld(trs, use_native_types=True))
    node = doc[0]
    assert node["http://e/n"] == [{"@value": 42}]
    assert node["http://e/b"] == [{"@value": True}]
    assert node["http://e/d"] == [{"@value": 5.5}]
    assert node["http://e/s"] == [{"@value": "keep"}]


def test_use_native_types_keeps_noncanonical():
    trs = _trs(("<http://e/a>", "<http://e/n>",
                '"007"^^<http://www.w3.org/2001/XMLSchema#double>'))
    doc = json.loads(serialize_jsonld(trs, use_native_types=True))
    # "007" is not the canonical double form — stays a typed string
    assert doc[0]["http://e/n"] == [{
        "@value": "007",
        "@type": "http://www.w3.org/2001/XMLSchema#double"}]


def test_use_rdf_type():
    rdfns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    trs = _trs(("<http://e/a>", f"<{rdfns}type>", "<http://e/T>"))
    plain = json.loads(serialize_jsonld(trs))
    assert plain[0]["@type"] == ["http://e/T"]
    kept = json.loads(serialize_jsonld(trs, use_rdf_type=True))
    assert kept[0][f"{rdfns}type"] == [{"@id": "http://e/T"}]
    assert "@type" not in kept[0]


def test_native_types_roundtrip_through_expander():
    trs = _trs(
        ("<http://e/a>", "<http://e/n>",
         '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://e/a>", "<http://e/d>",
         '"5.5E0"^^<http://www.w3.org/2001/XMLSchema#double>'))
    text = serialize_jsonld(trs, use_native_types=True)
    back, err = jsonld_to_triples(text)
    assert err is None
    got = sorted(" ".join(format_term(t) for t in tr[:3]) for tr in back)
    want = sorted(" ".join(format_term(t) for t in tr) for tr in trs)
    assert got == want
