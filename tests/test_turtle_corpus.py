"""Reference Turtle/TriG sample corpus, ported from
``turtle/src/test.rs`` (NT_SAMPLES / TURTLE_SAMPLES / TRIG_SAMPLES) and
``turtle/src/parser/turtle/test.rs`` (reified-triple expansions):
each sample must parse to the reference's exact triple/quad count, and
the RDF 1.2 reifier forms must expand to the same graph as their
explicit ``rdf:reifies`` spellings."""
import pytest

from sophia_rs_ray.turtle import parse_trig, parse_turtle

PREFIXES = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    PREFIX : <http://example.org/ns/>
"""

TURTLE_SAMPLES = [
    ("factorized triples",
     ':alice a :Person; :name "Alice"; :age 42.\n'
     ':bob a :Person, :Man; :nick "bob"@fr, "bobby"@en; :admin true.', 8),
    ("pretty literals", '[] <x:p> 42, 3.14, 0.314e1, true, "foo".', 5),
    ("unpretty literals",
     '[] <x:p> "a"^^xsd:integer, "12"^^xsd:decimal, "1.2"^^xsd:double, '
     '"1"^^xsd:boolean.', 4),
    ("lists", '<x:alice> <x:likes> ( 1 2 ( 3 4 ) 5 6 ), ("a" "b").', 20),
    ("subject list", '(1 2 3) a <tag:List>.', 7),
    ("malformed list",
     '_:a rdf:first 42, 43; rdf:rest (44 45).\n'
     '_:b rdf:first 42; rdf:rest (43), (44).', 14),
    ("bnode cycles",
     '_:a :n "a"; :p [ :q [ :r _:a ]].\n_:b :n "b"; :s [ :s _:b ].\n'
     '_:c :b "c"; :t _:c.', 9),
    ("reified subject", '<< :s :p :o >> :q :r.', 2),
    ("reified object", ':s :p << :t :q :r >>.', 2),
    ("reified nested", '<< << :a :b :c >> :d << :e :f :g >> >> :h :i.', 4),
    ("annotation", ':s :p :o {| :a :b, :c; :d :e |}.', 5),
    ("annotation nested",
     ':s :p :o {| :a :b {| :x :y1 |}, :c {| :x :y2 |}; :d :e '
     '{| :x :y3 |} |}.', 11),
    ("anon in list", ':s :p ( [:p :o] [:p :o;] [] ).', 9),
    ("rdf:nil in reified triple", '<< :s :p rdf:nil >> .', 1),
    ("named reifier statement", '<< :s :p :o ~ :r >> .', 1),
    ("object reifier", ':s :p :o ~ :r .', 2),
    ("bare reifier", ':s :p :o ~ .', 2),
    ("reifier then annotation", ':s :p :o ~ :r {| :a :b |}.', 3),
    ("triple term object", '<x:s> <x:p> <<(_:a <x:b> "c")>>.', 1),
    ("version directive", 'VERSION "1.2"', 0),
]


@pytest.mark.parametrize("name,src,want",
                         TURTLE_SAMPLES, ids=[s[0] for s in TURTLE_SAMPLES])
def test_turtle_sample_counts(name, src, want):
    assert len(parse_turtle(PREFIXES + src)) == want


TRIG_SAMPLES = [
    ("implicitly named graph iri", "<x:g> { :s :p :o }", 1),
    ("implicitly named graph pname", ":g { :s :p :o }", 1),
    ("implicitly named graph bnode", "_:g { :s :p :o }", 1),
    ("implicitly named graph anon", "[] { :s :p :o }", 1),
    ("explicitly named graph iri", "GRAPH <x:g> { :s :p :o }", 1),
    ("explicitly named graph pname", "GRAPH :g { :s :p :o }", 1),
    ("explicitly named graph bnode", "GRAPH _:g { :s :p :o }", 1),
    ("explicitly named graph anon", "GRAPH [] { :s :p :o }", 1),
    ("default graph", "{ :s :p :o } :s2 :p2 :o2.", 2),
    ("annotation in graph", ":g { :s :p :o {| :a :b |} }", 3),
]


@pytest.mark.parametrize("name,src,want",
                         TRIG_SAMPLES, ids=[s[0] for s in TRIG_SAMPLES])
def test_trig_sample_counts(name, src, want):
    assert len(parse_trig(PREFIXES + src)) == want


def test_nested_named_reifiers_expand_exactly():
    """turtle/src/parser/turtle/test.rs:644-660 nested_reified_triple."""
    a = parse_turtle(PREFIXES + """
        << << :a :b :c ~ :d >> :e << :f :g :h ~ :i >> ~ :j >> :k :l .
    """)
    b = parse_turtle(PREFIXES + """
        :d rdf:reifies <<( :a :b :c )>>.
        :i rdf:reifies <<( :f :g :h )>>.
        :j rdf:reifies <<( :d :e :i )>>.
        :j :k :l.
    """)
    assert sorted(a) == sorted(b)


def test_anonymous_reifier_is_fresh_bnode():
    trs = parse_turtle(PREFIXES + "<< :s :p :o >> :q :r.")
    reifies = [t for t in trs if t[1][1].endswith("#reifies")]
    (r, _p, tt), = reifies
    assert r[0] == 0  # KIND_BNODE
    assert tt[0] == 3  # KIND_TRIPLE
    main = [t for t in trs if t is not reifies[0]]
    assert main[0][0] == r  # reifier used as subject


def test_annotation_reifier_receives_annotations():
    trs = parse_turtle(PREFIXES + ':s :p :o ~ :r {| :a :b |}.')
    by_pred = {t[1][1].rsplit("/", 1)[-1]: t for t in trs}
    r = by_pred["a"][0]
    assert r[1].endswith("/r")  # the named reifier carries the block


# --- serializer roundtrips over the same corpus -------------------------
# (reference: turtle/src/serializer/turtle/test.rs roundtrip /
#  roundtrip_pretty — serialize, reparse, isomorphism check)

def _iso_triples(t1, t2):
    from sophia_rs_ray.c14n import isomorphic

    return isomorphic([(s, p, o, None) for (s, p, o) in t1],
                      [(s, p, o, None) for (s, p, o) in t2])


@pytest.mark.parametrize("name,src,want",
                         TURTLE_SAMPLES, ids=[s[0] for s in TURTLE_SAMPLES])
def test_turtle_roundtrip_corpus(name, src, want):
    from sophia_rs_ray.turtle import serialize_turtle

    g1 = parse_turtle(PREFIXES + src)
    out = serialize_turtle(g1)
    g2 = parse_turtle(out)
    assert len(g2) == want
    assert _iso_triples(g1, g2), f"{name}:\n{out}"


@pytest.mark.parametrize("name,src,want",
                         TURTLE_SAMPLES, ids=[s[0] for s in TURTLE_SAMPLES])
def test_turtle_roundtrip_plain(name, src, want):
    """Non-pretty path: no prefix emission, no sugar dependence."""
    from sophia_rs_ray.turtle import serialize_turtle

    g1 = parse_turtle(PREFIXES + src)
    out = serialize_turtle(g1, prefixes={}, emit_prefixes=False)
    g2 = parse_turtle(out)
    assert _iso_triples(g1, g2), f"{name}:\n{out}"


@pytest.mark.parametrize("name,src,want",
                         TRIG_SAMPLES, ids=[s[0] for s in TRIG_SAMPLES])
def test_trig_roundtrip_corpus(name, src, want):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.turtle import serialize_trig

    q1 = parse_trig(PREFIXES + src)
    out = serialize_trig(q1)
    q2 = parse_trig(out)
    assert len(q2) == want
    assert isomorphic(q1, q2), f"{name}:\n{out}"
