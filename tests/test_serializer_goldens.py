"""Byte-exact serializer goldens (VERDICT r03 item 7).

Two flavors:

* **Reference-transcribed goldens** — the reference's NT and NQ
  serializer tests carry byte-exact expected strings
  (``turtle/src/serializer/nt.rs:284-304`` and ``nq.rs:200-218``); both
  the default (tab-separated) and canonical (space-separated) forms are
  asserted here byte-for-byte.
* **Snapshot goldens for pretty Turtle** — the reference's OWN pretty
  tests assert roundtrip isomorphism only, never bytes
  (``turtle/src/serializer/turtle/test.rs:45-122``,
  ``_pretty.rs:726-741``), so there is no reference byte string to
  transcribe.  These snapshots pin OUR serializer's exact output over
  the reference sample corpus (``turtle/src/test.rs`` TURTLE_SAMPLES)
  so any formatting drift is a visible, deliberate diff — and each
  snapshot must still re-parse to an isomorphic graph.
"""
import pytest

from sophia_rs_ray.c14n import isomorphic
from sophia_rs_ray.ntriples import parse_document, serialize_document
from sophia_rs_ray.turtle import parse_turtle, serialize_turtle

# --- NT golden, transcribed from nt.rs graph() (expected string at
# nt.rs:284-292; default mode tab-separated, canonical = tabs→spaces) --

_NT_INPUT = (
    '_:me <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
    '<http://schema.org/Person> .\n'
    '_:me <http://schema.org/name> "Pierre-Antoine" .\n'
    '_:me <http://example.org/value> '
    '"42"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    '_:me <http://example.org/message> "hello\\nworld"@en .\n'
    '_:r <http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies> '
    '<<( _:me <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
    '<http://schema.org/Person> )>> .\n'
    '_:r <http://schema.org/creator> ?x .\n'
)

_NT_EXP = (
    '_:me\t<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>\t'
    '<http://schema.org/Person>\t.\n'
    '_:me\t<http://schema.org/name>\t"Pierre-Antoine"\t.\n'
    '_:me\t<http://example.org/value>\t'
    '"42"^^<http://www.w3.org/2001/XMLSchema#integer>\t.\n'
    '_:me\t<http://example.org/message>\t"hello\\nworld"@en\t.\n'
    '_:r\t<http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies>\t'
    '<<( _:me <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
    '<http://schema.org/Person> )>>\t.\n'
    '_:r\t<http://schema.org/creator>\t?x\t.\n'
)


def test_nt_golden_default_and_canonical():
    g = parse_document(_NT_INPUT, strict=False)
    assert serialize_document(g, canonical=False) == _NT_EXP
    assert serialize_document(g, canonical=True) \
        == _NT_EXP.replace("\t", " ")


# --- NQ golden, transcribed from nq.rs graph() (expected string at
# nq.rs:200-207; default-graph rows keep an EMPTY graph slot →
# "\t\t." terminator; canonical collapses it to " .") ------------------

_NQ_INPUT = (
    '_:me <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
    '<http://schema.org/Person> .\n'
    '_:me <http://schema.org/name> "Pierre-Antoine" _:me .\n'
    '_:me <http://example.org/value> '
    '"42"^^<http://www.w3.org/2001/XMLSchema#integer> _:me .\n'
    '_:me <http://example.org/message> "hello\\nworld"@en <tag:g1> .\n'
    '_:r <http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies> '
    '<<( _:me <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
    '<http://schema.org/Person> )>> .\n'
    '_:r <http://schema.org/creator> ?x .\n'
)

_NQ_EXP = (
    '_:me\t<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>\t'
    '<http://schema.org/Person>\t\t.\n'
    '_:me\t<http://schema.org/name>\t"Pierre-Antoine"\t_:me\t.\n'
    '_:me\t<http://example.org/value>\t'
    '"42"^^<http://www.w3.org/2001/XMLSchema#integer>\t_:me\t.\n'
    '_:me\t<http://example.org/message>\t"hello\\nworld"@en\t<tag:g1>\t.\n'
    '_:r\t<http://www.w3.org/1999/02/22-rdf-syntax-ns#reifies>\t'
    '<<( _:me <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> '
    '<http://schema.org/Person> )>>\t\t.\n'
    '_:r\t<http://schema.org/creator>\t?x\t\t.\n'
)


def test_nq_golden_default_and_canonical():
    d = parse_document(_NQ_INPUT, quads=True, strict=False)
    assert serialize_document(d, canonical=False, as_quad=True) == _NQ_EXP
    assert serialize_document(d, canonical=True, as_quad=True) \
        == _NQ_EXP.replace("\t\t.", " .").replace("\t", " ")


# --- pretty-Turtle snapshots over the reference corpus ----------------

_PFX = """
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
    PREFIX : <http://example.org/ns/>
"""

#: prefix map the reference's roundtrip_pretty test builds
#: (turtle/test.rs:101-108): defaults + (:, http://example.org/ns/)
_PM = {"rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
       "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
       "xsd": "http://www.w3.org/2001/XMLSchema#",
       "": "http://example.org/ns/"}

SNAPSHOTS = [
    ("factorized triples",
     ':alice a :Person; :name "Alice"; :age 42.\n'
     ':bob a :Person, :Man; :nick "bob"@fr, "bobby"@en; :admin true.',
     ':alice\n'
     '  a :Person ;\n'
     '  :name "Alice" ;\n'
     '  :age 42 .\n'
     ':bob\n'
     '  a :Person, :Man ;\n'
     '  :nick "bob"@fr, "bobby"@en ;\n'
     '  :admin true .\n'),
    ("pretty literals",
     '[] <x:p> 42, 3.14, 0.314e1, true, "foo".',
     '[]\n'
     '  <x:p> 42, 3.14, 0.314e1, true, "foo" .\n'),
    ("unpretty literals",
     '[] <x:p> "a"^^xsd:integer, "12"^^xsd:decimal, "1.2"^^xsd:double, '
     '"1"^^xsd:boolean.',
     '[]\n'
     '  <x:p> "a"^^xsd:integer, "12"^^xsd:decimal, "1.2"^^xsd:double, '
     '"1"^^xsd:boolean .\n'),
    ("lists",
     '<x:alice> <x:likes> ( 1 2 ( 3 4 ) 5 6 ), ("a" "b").',
     '<x:alice>\n'
     '  <x:likes> ( 1 2 ( 3 4 ) 5 6 ), ( "a" "b" ) .\n'),
    ("subject list",
     '(1 2 3) a <tag:List>.',
     '( 1 2 3 )\n'
     '  a <tag:List> .\n'),
    ("anon in list",
     ':s :p ( [:p :o] [:p :o;] [] ).',
     ':s\n'
     '  :p ( [ :p :o ] [ :p :o ] [] ) .\n'),
    ("annotation",
     ':s :p :o {| :a :b, :c; :d :e |}.',
     ':s\n'
     '  :p :o .\n'
     '[]\n'
     '  rdf:reifies <<( :s :p :o )>> ;\n'
     '  :a :b, :c ;\n'
     '  :d :e .\n'),
    ("reified object",
     ':s :p << :t :q :r >>.',
     ':s\n'
     '  :p [ rdf:reifies <<( :t :q :r )>> ] .\n'),
    ("triple term object",
     '<x:s> <x:p> <<(_:a <x:b> "c")>>.',
     '<x:s>\n'
     '  <x:p> <<( _:a <x:b> "c" )>> .\n'),
    ("bnode cycles",
     '_:a :n "a"; :p [ :q [ :r _:a ]].\n'
     '_:b :n "b"; :s [ :s _:b ].\n'
     '_:c :b "c"; :t _:c.',
     '_:a\n'
     '  :n "a" ;\n'
     '  :p [ :q [ :r _:a ] ] .\n'
     '_:b\n'
     '  :n "b" ;\n'
     '  :s [ :s _:b ] .\n'
     '_:c\n'
     '  :b "c" ;\n'
     '  :t _:c .\n'),
]


@pytest.mark.parametrize("name,src,expected", SNAPSHOTS,
                         ids=[s[0] for s in SNAPSHOTS])
def test_pretty_turtle_snapshot(name, src, expected):
    g1 = parse_turtle(_PFX + src)
    out = serialize_turtle(g1, prefixes=_PM, emit_prefixes=False)
    assert out == expected
    # the snapshot must stay a faithful serialization, not just a string
    g2 = parse_turtle(
        "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in _PM.items())
        + out)
    quads = lambda g: [(s, p, o, None) for (s, p, o) in g]  # noqa: E731
    assert isomorphic(quads(g1), quads(g2))


def test_pretty_turtle_prefix_header():
    g = parse_turtle(_PFX + ":s :p :o .")
    out = serialize_turtle(g, prefixes=_PM)
    header = "".join(f"@prefix {p}: <{ns}> .\n" for p, ns in _PM.items())
    assert out.startswith(header + "\n")
    assert out.endswith(":s\n  :p :o .\n")
