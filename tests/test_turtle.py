"""Turtle parser/serializer conformance: grammar features, round-trip
via isomorphism (reference test style, ``turtle/src/serializer/nt.rs:
328-379``), NT-sample cross-parse."""

import pytest

from sophia_rs_ray.c14n import isomorphic
from sophia_rs_ray.ntriples import parse_document
from sophia_rs_ray.terms import (
    RDF,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    format_term,
)
from sophia_rs_ray.turtle import (
    TurtleParseError,
    parse_turtle,
    serialize_turtle,
)


def nt(triples):
    return {(format_term(s), format_term(p), format_term(o))
            for (s, p, o) in triples}


def test_prefixes_and_a():
    got = nt(parse_turtle(
        "@prefix s: <https://schema.org/> .\n"
        "<http://e.com/x> a s:Person ; s:name \"Ann\" ."))
    assert got == {
        ("<http://e.com/x>",
         f"<{RDF_TYPE}>", "<https://schema.org/Person>"),
        ("<http://e.com/x>", "<https://schema.org/name>", '"Ann"'),
    }


def test_sparql_style_directives_and_base():
    got = nt(parse_turtle(
        "PREFIX ex: <http://ex.org/>\n"
        "BASE <http://base.org/dir/>\n"
        "<rel> ex:p <../up> ."))
    assert got == {("<http://base.org/dir/rel>", "<http://ex.org/p>",
                    "<http://base.org/up>")}


def test_object_and_predicate_lists():
    got = nt(parse_turtle(
        "@prefix : <tag:> .\n:s :p :o1, :o2 ; :q :o3 ."))
    assert got == {("<tag:s>", "<tag:p>", "<tag:o1>"),
                   ("<tag:s>", "<tag:p>", "<tag:o2>"),
                   ("<tag:s>", "<tag:q>", "<tag:o3>")}


def test_literal_sugar():
    got = nt(parse_turtle(
        "@prefix : <tag:> .\n"
        ":s :i 42 ; :d 3.14 ; :e 1.0e3 ; :b true ; :f false ."))
    assert ('"42"^^<' + XSD_INTEGER + ">") in {o for _, _, o in got}
    assert ('"3.14"^^<' + XSD_DECIMAL + ">") in {o for _, _, o in got}
    assert ('"1.0e3"^^<' + XSD_DOUBLE + ">") in {o for _, _, o in got}
    assert ('"true"^^<' + XSD_BOOLEAN + ">") in {o for _, _, o in got}
    assert ('"false"^^<' + XSD_BOOLEAN + ">") in {o for _, _, o in got}


def test_long_strings_and_lang_dir():
    got = nt(parse_turtle(
        '@prefix : <tag:> .\n'
        ':s :p """multi\nline "quoted" text""" ;\n'
        "   :q 'single' ;\n"
        "   :r '''long\nsingle''' ;\n"
        '   :l "chat"@FR ;\n'
        '   :m "x"@ar--rtl .'))
    objs = {o for _, _, o in got}
    assert '"multi\\nline \\"quoted\\" text"' in objs
    assert '"single"' in objs
    assert '"long\\nsingle"' in objs
    assert '"chat"@fr' in objs
    assert '"x"@ar--rtl' in objs


def test_bnode_property_list_and_anon():
    triples = parse_turtle(
        "@prefix : <tag:> .\n"
        ":s :knows [ :name \"Bob\" ; :age 7 ] ; :other [] .")
    got = nt(triples)
    bn = [o for _, p, o in got if p == "<tag:knows>"][0]
    assert bn.startswith("_:")
    assert (bn, "<tag:name>", '"Bob"') in got
    assert len([o for _, p, o in got if p == "<tag:other>"]) == 1


def test_collections():
    got = nt(parse_turtle(
        "@prefix : <tag:> .\n:s :list (1 2) ; :empty () ."))
    first = f"<{RDF}first>"
    rest = f"<{RDF}rest>"
    nil = f"<{RDF}nil>"
    # empty list is rdf:nil directly
    assert ("<tag:s>", "<tag:empty>", nil) in got
    head = [o for _, p, o in got if p == "<tag:list>"][0]
    chain = {s: (p, o) for s, p, o in got if s == head and p == first}
    assert chain[head] == (first, f'"1"^^<{XSD_INTEGER}>')
    rests = {s: o for s, p, o in got if p == rest}
    assert rests[head] != nil and rests[rests[head]] == nil


def test_triple_term_object():
    got = nt(parse_turtle(
        '@prefix : <tag:> .\n:s :p <<( :a :b "c" )>> .'))
    assert ("<tag:s>", "<tag:p>",
            '<<( <tag:a> <tag:b> "c" )>>') in got


def test_pn_local_escapes_and_percent():
    got = nt(parse_turtle(
        "@prefix ex: <http://ex.org/> .\n"
        "ex:with\\~tilde ex:p ex:a%20b ."))
    assert got == {("<http://ex.org/with~tilde>", "<http://ex.org/p>",
                    "<http://ex.org/a%20b>")}


def test_bnode_suffix_freshening():
    a = parse_turtle("@prefix : <tag:> .\n_:x :p :o .", bnode_suffix="_d1")
    assert format_term(a[0][0]) == "_:x_d1"


def test_parse_errors_have_position():
    with pytest.raises(TurtleParseError) as ei:
        parse_turtle("@prefix : <tag:> .\n:s :p ???")
    assert "at 2:" in str(ei.value)
    with pytest.raises(TurtleParseError):
        parse_turtle("<x:s> <x:p> <rel> .")  # relative IRI, no base


def test_version_directive():
    assert parse_turtle('VERSION "1.2"\n<x:s> <x:p> <x:o> .') \
        == parse_turtle("<x:s> <x:p> <x:o> .")


ROUND_TRIP_DOCS = [
    # NT samples also valid Turtle (turtle/src/test.rs NT_SAMPLES)
    '<x:s> <x:p> <x:o>.',
    '_:s   <x:p> _:o.',
    '<x:s> <x:p> "o"^^<x:d>.',
    '<x:s> <x:p> "o"@en-UK.',
    '<x:s> <x:p> "o"@en-UK--ltr.',
    '<x:s> <x:p> <<(_:a <x:b> "c")>>.',
    # richer Turtle
    '@prefix s: <https://schema.org/> .\n'
    '<http://e.com/p1> a s:Person ; s:name "Ann"@en ; s:age 41 ; '
    's:knows [ s:name "Bob" ], <http://e.com/p2> .',
    '@prefix : <tag:> .\n:s :l (1 2 3) ; :t true ; :d 2.5 .',
]


@pytest.mark.parametrize("doc", ROUND_TRIP_DOCS)
def test_round_trip_isomorphic(doc):
    t1 = parse_turtle(doc)
    ttl = serialize_turtle(t1)
    t2 = parse_turtle(ttl)
    if "<<(" in doc:
        # triple terms are outside strict RDFC-1.0 (rdfc10.rs:193-207);
        # labels survive both parses verbatim → exact comparison
        assert nt(t1) == nt(t2), f"round-trip broke:\n{ttl}"
        return
    q1 = [(s, p, o, None) for (s, p, o) in t1]
    q2 = [(s, p, o, None) for (s, p, o) in t2]
    assert isomorphic(q1, q2), f"round-trip broke:\n{ttl}"


def test_serializer_sugar_and_abbreviation():
    t = parse_turtle(
        "@prefix s: <https://schema.org/> .\n"
        "<http://e.com/x> a s:Person ; s:age 41 ; s:ok true .")
    out = serialize_turtle(t)
    assert "a schema:Person" in out
    assert "schema:age 41" in out
    assert "schema:ok true" in out


def test_nt_parser_agrees_with_turtle_parser():
    doc = '<x:s> <x:p> "o"@en-UK--rtl .'
    a = parse_document(doc)
    b = parse_turtle(doc)
    assert [(s, p, o) for (s, p, o, _g) in a] == b


# ---------------------------------------------------------------------------
# TriG
# ---------------------------------------------------------------------------

def nq(quads):
    return {(format_term(s), format_term(p), format_term(o),
             format_term(g) if g is not None else None)
            for (s, p, o, g) in quads}


def test_trig_graph_blocks():
    from sophia_rs_ray.turtle import parse_trig

    got = nq(parse_trig(
        "@prefix : <tag:> .\n"
        ":s :p :o .\n"
        "GRAPH :g1 { :a :b :c ; :d :e . }\n"
        ":g2 { :x :y :z . }\n"
        "{ :m :n :q . }"))
    assert got == {
        ("<tag:s>", "<tag:p>", "<tag:o>", None),
        ("<tag:a>", "<tag:b>", "<tag:c>", "<tag:g1>"),
        ("<tag:a>", "<tag:d>", "<tag:e>", "<tag:g1>"),
        ("<tag:x>", "<tag:y>", "<tag:z>", "<tag:g2>"),
        ("<tag:m>", "<tag:n>", "<tag:q>", None),
    }


def test_trig_round_trip():
    from sophia_rs_ray.turtle import parse_trig, serialize_trig

    doc = ("@prefix : <tag:> .\n:s :p :o .\n"
           "GRAPH :g1 { :a :b 42, \"x\"@en . }\n"
           "_:g { :h :i :j . }")
    q1 = parse_trig(doc)
    out = serialize_trig(sorted(q1, key=lambda q: (q[3] is not None,
                                                   format_term(q[3]) if q[3] else "",
                                                   format_term(q[0]))))
    q2 = parse_trig(out)
    assert isomorphic(q1, q2), out


def test_trig_bnode_graph_name():
    from sophia_rs_ray.turtle import parse_trig

    got = nq(parse_trig("@prefix : <tag:> .\n_:g { :x :y :z . }",
                        bnode_suffix="_s"))
    assert got == {("<tag:x>", "<tag:y>", "<tag:z>", "_:g_s")}
