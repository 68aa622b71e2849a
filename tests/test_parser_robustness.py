"""Parser robustness fuzz: random MUTATIONS of valid documents
(truncation, slice deletion/duplication, hostile character injection)
must either parse or raise the parser's DOCUMENTED error type
(ValueError subclasses; JSON-LD returns its error) — never an internal
IndexError/KeyError/TypeError/RecursionError.  A 100-TB crawl feed
delivers exactly this kind of garbage, and one internal exception in a
map_batches body kills the whole job."""

import random

import pytest

from sophia_rs_ray.jsonld import jsonld_to_triples
from sophia_rs_ray.ntriples import parse_document, serialize_triple
from sophia_rs_ray.rdfxml import parse_rdfxml, serialize_rdfxml
from sophia_rs_ray.turtle import parse_trig, parse_turtle

NASTY = list('<>"\\@.{};,^^__:#()[]') + ["\x00", "‮", "é", "\ud800"
                                         .encode("utf-16", "surrogatepass")
                                         .decode("utf-16",
                                                 "surrogatepass")]


def _valid_turtle(rng):
    lines = ["@prefix ex: <http://ex.org/> .",
             "@base <http://base.org/> ."]
    for i in range(rng.randint(2, 8)):
        kind = rng.random()
        if kind < 0.3:
            lines.append(f"ex:s{i} ex:p ex:o{i} , ex:o{i+1} ; ex:q \"v{i}\" .")
        elif kind < 0.5:
            lines.append(f"ex:s{i} ex:list ( ex:a ex:b \"{i}\" ) .")
        elif kind < 0.7:
            lines.append(f"ex:s{i} ex:bn [ ex:inner \"x\"@en ] .")
        else:
            lines.append(f"<rel/{i}> a ex:T{i} ; ex:n {i} .")
    return "\n".join(lines)


def _valid_rdfxml(rng):
    triples = []
    for i in range(rng.randint(1, 5)):
        triples.append(((1, f"http://ex.org/s{i}", "", "", 0),
                        (1, "http://ex.org/p", "", "", 0),
                        (2, f"val{i}", "http://www.w3.org/2001/XMLSchema#string", "", 0)))
    return serialize_rdfxml(triples)


def _valid_jsonld(rng):
    return ('{"@context": {"ex": "http://ex.org/"}, "@id": "ex:s", '
            '"ex:p": [{"@value": "v", "@language": "en"}, '
            '{"@id": "ex:o"}], "ex:n": %d}' % rng.randint(0, 99))


def _mutate(rng, doc):
    kind = rng.random()
    if kind < 0.3:
        return doc[:rng.randrange(max(len(doc), 1))]  # truncate
    if kind < 0.5:
        i = rng.randrange(max(len(doc), 1))
        j = min(len(doc), i + rng.randint(1, 12))
        return doc[:i] + doc[j:]  # delete slice
    if kind < 0.75:
        i = rng.randrange(max(len(doc), 1))
        return doc[:i] + rng.choice(NASTY) + doc[i:]  # inject
    i = rng.randrange(max(len(doc), 1))
    j = min(len(doc), i + rng.randint(1, 20))
    return doc[:i] + doc[i:j] + doc[i:]  # duplicate slice


@pytest.mark.parametrize("seed", range(120))
def test_turtle_parser_never_crashes_internally(seed):
    rng = random.Random(11000 + seed)
    doc = _mutate(rng, _valid_turtle(rng))
    try:
        parse_turtle(doc)
        parse_trig(doc)
    except ValueError:
        pass  # documented (TurtleParseError subclasses ValueError)


@pytest.mark.parametrize("seed", range(80))
def test_ntriples_parser_never_crashes_internally(seed):
    rng = random.Random(12000 + seed)
    base = "\n".join(
        serialize_triple(*q) for q in parse_document(
            '<x:s> <x:p> "o" .\n_:b <x:p> "tab\\there"@en-GB .'))
    doc = _mutate(rng, base)
    for strict in (True, False):
        try:
            parse_document(doc, strict=strict)
            parse_document(doc, quads=True, strict=strict)
        except ValueError:
            pass


@pytest.mark.parametrize("seed", range(80))
def test_rdfxml_parser_never_crashes_internally(seed):
    rng = random.Random(13000 + seed)
    doc = _mutate(rng, _valid_rdfxml(rng))
    try:
        parse_rdfxml(doc)
    except ValueError:
        pass


@pytest.mark.parametrize("seed", range(80))
def test_jsonld_parser_returns_errors_not_raises(seed):
    rng = random.Random(14000 + seed)
    doc = _mutate(rng, _valid_jsonld(rng))
    trs, err = jsonld_to_triples(doc)  # must NEVER raise
    assert err is None or isinstance(err, str)


def _valid_html(rng):
    blocks = ["<!DOCTYPE html><html><head><title>T</title>",
              '<script type="application/ld+json">{"@id": "x:s"}</script>',
              "</head><body>"]
    for i in range(rng.randint(1, 6)):
        blocks.append(rng.choice([
            f"<p>para {i} <b>bold</b> tail</p>",
            f'<div itemscope itemtype="x:T"><span itemprop="n">{i}</span></div>',
            f'<section vocab="x:" typeof="T"><em property="p">{i}</em></section>',
            f"<ul><li>a{i}<li>b{i}</ul>",
            "<table><tr><td>c</td></tr></table>",
        ]))
    blocks.append("</body></html>")
    return "".join(blocks)


@pytest.mark.parametrize("seed", range(120))
def test_extract_page_never_raises_and_engines_agree(seed):
    """extract_page is the flagship's entry point for raw crawl bytes:
    it must never raise on mutated garbage, and the fast tokenizer's
    fallback contract means both engines stay callable on any input."""
    from sophia_rs_ray.extract.html_page import extract_page

    rng = random.Random(15000 + seed)
    doc = _mutate(rng, _valid_html(rng))
    for engine in ("fast", "stdlib"):
        text, jsonld, micro, rdfa = extract_page(doc, engine=engine)
        assert isinstance(text, str)


@pytest.mark.parametrize("seed", range(80))
def test_sparql_parser_never_crashes_internally(seed):
    from sophia_rs_ray.sparql.parser import parse_query

    rng = random.Random(16000 + seed)
    base = ("PREFIX ex: <http://ex.org/> "
            "SELECT DISTINCT ?s (COUNT(*) AS ?c) WHERE { "
            "?s ex:p ?o . OPTIONAL { ?o ex:q ?z } "
            "FILTER (?c > 3 || REGEX(STR(?s), \"x\")) } "
            "GROUP BY ?s HAVING (COUNT(*) > 1) ORDER BY DESC(?c) LIMIT 5")
    doc = _mutate(rng, base)
    try:
        parse_query(doc)
    except ValueError:
        pass  # SparqlParseError subclasses ValueError
