"""Pretty-Turtle inlining parity: the reference pretty engine
(turtle/src/serializer/_pretty.rs) inlines single-use bnodes as
``[ … ]`` and rdf:first/rest chains as ``( … )``.  Test inputs are
transcribed from the reference's serializer test corpus
(turtle/src/test.rs TURTLE_SAMPLES, turtle/src/serializer/turtle/
test.rs roundtrip_pretty) — conformance data, cited; the assertions
mirror the reference tests: parse → pretty-serialize → reparse →
isomorphic, plus sugar-presence checks."""

import pytest

PREFIXES_TTL = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    PREFIX : <http://example.org/ns/>
"""

# (name, turtle, expected_triple_count) — turtle/src/test.rs:88-180
SAMPLES = [
    ("factorized triples", """
        :alice a :Person; :name "Alice"; :age 42.
        :bob a :Person, :Man; :nick "bob"@fr, "bobby"@en; :admin true.
        """, 8),
    ("pretty literals", """
        [] <x:p> 42, 3.14, 0.314e1, true, "foo".
        """, 5),
    ("unpretty literals", """
        [] <x:p> "a"^^xsd:integer, "12"^^xsd:decimal,
                 "1.2"^^xsd:double, "1"^^xsd:boolean.
        """, 4),
    ("lists", """
        <x:alice> <x:likes> ( 1 2 ( 3 4 ) 5 6 ), ("a" "b").
        """, 20),
    ("subject list", """
        (1 2 3) a <tag:List>.
        """, 7),
    ("malformed list", """
        _:a rdf:first 42, 43; rdf:rest (44 45).
        _:b rdf:first 42; rdf:rest (43), (44).
        """, 14),
    ("bnode cycles", """
        _:a :n "a"; :p [ :q [ :r _:a ]].
        _:b :n "b"; :s [ :s _:b ].
        _:c :b "c"; :t _:c.
        """, 9),
    ("reified subject", """
        << :s :p :o >> :q :r.
        """, 2),
    ("reified object", """
        :s :p << :t :q :r >>.
        """, 2),
    ("anon in list", ":s :p ( [:p :o] [:p :o;] [] ).", 9),
    ("rdf:nil in reified triple", "<< :s :p rdf:nil >> .", 1),
]


def _parse(ttl):
    from sophia_rs_ray.turtle import parse_turtle

    return parse_turtle(PREFIXES_TTL + ttl)


def _quads(triples):
    return [(s, p, o, None) for (s, p, o) in triples]


@pytest.mark.parametrize("name,ttl,n", SAMPLES,
                         ids=[s[0] for s in SAMPLES])
def test_pretty_roundtrip_isomorphic(name, ttl, n):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.turtle import parse_turtle, serialize_turtle

    g1 = _parse(ttl)
    assert len(g1) == n, f"{name}: parsed {len(g1)} != {n}"
    pretty = serialize_turtle(g1, prefixes={
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "xsd": "http://www.w3.org/2001/XMLSchema#"})
    g2 = parse_turtle(pretty)
    assert isomorphic(_quads(g1), _quads(g2), strict=False), \
        f"{name}: pretty output not isomorphic\n{pretty}"


def test_lists_render_as_collections():
    from sophia_rs_ray.turtle import serialize_turtle

    out = serialize_turtle(_parse(
        "<x:alice> <x:likes> ( 1 2 ( 3 4 ) 5 6 ), (\"a\" \"b\")."))
    assert "( 1 2 ( 3 4 ) 5 6 )" in out
    assert '( "a" "b" )' in out
    assert "_:" not in out
    assert "rdf:first" not in out and "first>" not in out


def test_single_use_bnode_inlines_as_property_list():
    from sophia_rs_ray.turtle import serialize_turtle

    out = serialize_turtle(_parse(':s :p [ :q "v" ; :r 42 ] .'))
    assert "[ " in out and " ]" in out
    assert "_:" not in out


def test_shared_bnode_keeps_label():
    from sophia_rs_ray.turtle import serialize_turtle

    out = serialize_turtle(_parse(":s1 :p _:x . :s2 :p _:x . "
                                  "_:x :q 1 ."))
    assert out.count("_:") >= 3      # two refs + one subject


def test_subject_list_sugar():
    from sophia_rs_ray.turtle import serialize_turtle

    out = serialize_turtle(_parse("(1 2 3) a <tag:List>."))
    assert "( 1 2 3 )" in out
    assert "_:" not in out


def test_anonymous_subject_renders_empty_brackets():
    from sophia_rs_ray.turtle import serialize_turtle

    out = serialize_turtle(_parse('[] <x:p> 42, true, "foo".'),
                           emit_prefixes=False)
    assert out.lstrip().startswith("[]")
    assert "_:" not in out


def test_cycles_fall_back_to_labels_nothing_lost():
    from sophia_rs_ray.turtle import serialize_turtle

    g = _parse("""
        _:a :n "a"; :p [ :q [ :r _:a ]].
        _:b :n "b"; :s [ :s _:b ].
        _:c :b "c"; :t _:c.
        """)
    out = serialize_turtle(g)
    from sophia_rs_ray.turtle import parse_turtle

    assert len(parse_turtle(out)) == 9      # every triple survives
    assert "[ " in out                      # acyclic parts still inline


def test_triple_term_bnodes_disqualify_inlining():
    from sophia_rs_ray.turtle import parse_turtle, serialize_turtle

    # _:x occurs inside a triple term: it must keep its label
    g = _parse(":s :p <<( _:x :q 1 )>> . _:x :r 2 . :t :u _:x .")
    out = serialize_turtle(g)
    assert len(parse_turtle(out)) == 3


def test_inline_false_keeps_plain_grouping():
    from sophia_rs_ray.turtle import serialize_turtle

    out = serialize_turtle(_parse(':s :p [ :q "v" ] .'), inline=False)
    assert "_:" in out and "[ " not in out
