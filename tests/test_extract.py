"""End-to-end extraction tests: visible-text byte-identity, triple P/R
vs the template oracle, JSON-LD subset semantics, microdata/RDFa."""

from sophia_rs_ray.extract.html_page import extract_page
from sophia_rs_ray.jsonld import canonical_double, jsonld_to_triples
from sophia_rs_ray.sources.pages import (
    expected_triples,
    gen_pages_batch,
    oracle_table,
    page_record,
)
from sophia_rs_ray.stages.extract import (
    extract_text_batch,
    extract_triples_batch,
    format_triples_batch,
)
from sophia_rs_ray.terms import format_term

N = 150  # covers escape (i%13==5), no-jsonld (i%11==7), bad-jsonld (i%29==13)


def _batch(n=N):
    return gen_pages_batch({"id": list(range(n))}, n)


def test_visible_text_byte_identical():
    b = _batch()
    tb = extract_text_batch(b)
    assert tb["text"].to_pylist() == b["text"].to_pylist()
    assert tb["url"].to_pylist() == b["url"].to_pylist()


def test_triple_precision_recall_1():
    b = _batch()
    nt = format_triples_batch(extract_triples_batch(b))
    got = set(zip(nt["s"].to_pylist(), nt["p"].to_pylist(), nt["o"].to_pylist()))
    ora = oracle_table(N)
    want = set(zip(ora["s"].to_pylist(), ora["p"].to_pylist(), ora["o"].to_pylist()))
    tp = len(got & want)
    assert tp / len(got) == 1.0, list(got - want)[:3]
    assert tp / len(want) == 1.0, list(want - got)[:3]


def test_bad_jsonld_becomes_error_row():
    b = _batch()
    t = extract_triples_batch(b)
    errs = [e for e in t["error"].to_pylist() if e]
    assert errs and all(e.startswith("json") for e in errs)
    # formatting drops error rows
    nt = format_triples_batch(t)
    assert len(nt) == len(t) - len(errs)


def test_jsonld_value_semantics():
    trs, err = jsonld_to_triples(
        '{"@context": {"@vocab": "http://s.org/"},'
        ' "@id": "http://x.org/a", "name": {"@value": "x", "@language": "EN",'
        ' "@direction": "rtl"}, "n": 1, "d": 2.5, "b": true,'
        ' "list": {"@list": ["a", "b"]},'
        ' "nested": {"name": "inner"}}',
        base="http://x.org/")
    assert err is None
    nt = {(format_term(s), format_term(p), format_term(o)) for s, p, o, _ in trs}
    assert ('<http://x.org/a>', '<http://s.org/name>', '"x"@en--rtl') in nt
    assert ('<http://x.org/a>', '<http://s.org/n>',
            '"1"^^<http://www.w3.org/2001/XMLSchema#integer>') in nt
    assert ('<http://x.org/a>', '<http://s.org/d>',
            '"2.5E0"^^<http://www.w3.org/2001/XMLSchema#double>') in nt
    assert ('<http://x.org/a>', '<http://s.org/b>',
            '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>') in nt
    # rdf:list chain
    firsts = [t for t in nt if t[1].endswith("22-rdf-syntax-ns#first>")]
    rests = [t for t in nt if t[1].endswith("22-rdf-syntax-ns#rest>")]
    assert len(firsts) == 2 and len(rests) == 2
    # nested bnode got a doc-scoped label
    assert any(t[2].startswith("_:b") for t in nt)


def test_canonical_double():
    assert canonical_double(5.5) == "5.5E0"
    assert canonical_double(1.75) == "1.75E0"
    assert canonical_double(-0.75) == "-7.5E-1"
    assert canonical_double(100.0) == "1.0E2"
    assert canonical_double(0.001) == "1.0E-3"


def test_schema_org_remote_context_stub():
    trs, err = jsonld_to_triples(
        '{"@context": "https://schema.org", "@id": "http://x/a",'
        ' "@type": "Person", "name": "N"}')
    nt = {(format_term(s), format_term(p), format_term(o)) for s, p, o, _ in trs}
    assert ('<http://x/a>',
            '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>',
            '<http://schema.org/Person>') in nt


def test_extractor_robustness_garbage():
    text, ld, micro, rdfa = extract_page("<p>a<div><b>b</p></div></html><<<&&;")
    assert isinstance(text, str)
    text2, *_ = extract_page("")
    assert text2 == ""


def test_page_record_deterministic():
    a = page_record(42, 500)
    b = page_record(42, 500)
    assert a == b
    assert expected_triples(42, 500) == expected_triples(42, 500)
