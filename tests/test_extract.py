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


def test_fused_nt_kernel_equals_two_stage():
    """extract_nt_batch must be byte-identical to
    format_triples_batch(extract_triples_batch(b)) — the fused flagship
    kernel vs the generic two-stage path, with and without the url
    carry column (covers escape-case pages i%13==5, missing-jsonld
    i%11==7, and bad-jsonld error rows i%29==13, which the NT surface
    must DROP exactly like the format stage does)."""
    from sophia_rs_ray.stages.extract import extract_nt_batch

    b = _batch(120)
    two_stage = format_triples_batch(extract_triples_batch(b), keep=())
    fused = extract_nt_batch(b, keep=())
    assert fused.schema == two_stage.schema
    assert fused.equals(two_stage)

    two_url = format_triples_batch(extract_triples_batch(b))
    fused_url = extract_nt_batch(b, keep=("url",))
    assert fused_url.equals(two_url)

    # empty batch keeps the schema
    import pyarrow as pa
    empty = pa.table({"url": pa.array([], pa.large_string()),
                      "html": pa.array([], pa.large_string())})
    fe = extract_nt_batch(empty, keep=())
    assert fe.num_rows == 0 and fe.column_names == ["s", "p", "o"]


def test_fused_nt_kernel_mutation_gauntlet():
    """Fused == two-stage on adversarially mutated pages (truncations,
    splices, attribute damage) — the same corpus discipline as the
    fast-vs-stdlib tokenizer gate."""
    import random

    from sophia_rs_ray.stages.extract import extract_nt_batch
    import pyarrow as pa

    rng = random.Random("fused-nt-gauntlet")
    pages = []
    for i in range(60):
        html = page_record(i, 600)["html"]
        mode = i % 4
        if mode == 1 and len(html) > 10:       # truncate mid-document
            html = html[:rng.randrange(5, len(html))]
        elif mode == 2:                        # splice two pages
            other = page_record((i * 7 + 3) % 600, 600)["html"]
            cut = rng.randrange(len(html))
            html = html[:cut] + other[rng.randrange(len(other)):]
        elif mode == 3 and len(html) > 20:     # delete a random span
            a = rng.randrange(len(html) - 10)
            html = html[:a] + html[a + rng.randrange(1, 10):]
        pages.append((f"https://mut{i}.example/p/{i}", html))
    b = pa.table({"url": pa.array([u for u, _ in pages], pa.large_string()),
                  "html": pa.array([h for _, h in pages], pa.large_string())})
    two_stage = format_triples_batch(extract_triples_batch(b), keep=())
    fused = extract_nt_batch(b, keep=())
    assert fused.equals(two_stage)
