"""Property-based roundtrip gates (hypothesis): ANY generated graph —
shared/cyclic bnodes, lists, language/datatype literals, triple terms —
must survive pretty-Turtle serialize → parse with isomorphism, and
canonicalization must be invariant under bnode relabeling."""

import string

from hypothesis import given, settings, strategies as st

from sophia_rs_ray.terms import bnode, iri, langlit, literal

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_iris = st.builds(
    lambda s: iri(f"http://ex.org/{s}"),
    st.text(alphabet=string.ascii_lowercase + string.digits,
            min_size=1, max_size=8))
_bnodes = st.builds(lambda i: bnode(f"b{i}"), st.integers(0, 5))
_lits = st.one_of(
    st.builds(literal, st.text(max_size=12)),
    st.builds(lambda n: literal(str(n), XSD + "integer"),
              st.integers(-999, 999)),
    st.builds(langlit, st.text(max_size=8), st.sampled_from(
        ["en", "fr", "en-US", "de-CH"])),
)
_subjects = st.one_of(_iris, _bnodes)
_objects = st.one_of(_iris, _bnodes, _lits)
_preds = st.builds(lambda s: iri(f"http://ex.org/p/{s}"),
                   st.sampled_from(["a", "b", "c", "first", "rest"]))

# rdf:first/rest as REAL predicates sometimes — exercises list
# detection against malformed chains
_rdf_preds = st.sampled_from([iri(RDF + "first"), iri(RDF + "rest"),
                              iri(RDF + "type")])
_any_pred = st.one_of(_preds, _rdf_preds)

_triples = st.lists(st.tuples(_subjects, _any_pred, _objects),
                    min_size=0, max_size=25)


def _quads(ts):
    return [(s, p, o, None) for (s, p, o) in ts]


@settings(max_examples=150, deadline=None)
@given(_triples)
def test_pretty_turtle_roundtrip_isomorphic(ts):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.turtle import parse_turtle, serialize_turtle

    out = serialize_turtle(ts)
    back = parse_turtle(out)
    assert isomorphic(_quads(ts), _quads(back)), out


@settings(max_examples=100, deadline=None)
@given(_triples)
def test_plain_turtle_roundtrip_isomorphic(ts):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.turtle import parse_turtle, serialize_turtle

    out = serialize_turtle(ts, inline=False)
    assert isomorphic(_quads(ts), _quads(parse_turtle(out))), out


@settings(max_examples=75, deadline=None)
@given(_triples, st.integers(1, 1000))
def test_c14n_invariant_under_relabeling(ts, salt):
    from sophia_rs_ray.c14n import normalize_quads

    def relabel(t):
        if t[0] == 0:  # KIND_BNODE
            return bnode(f"x{salt}_{t[1]}")
        return t

    ts2 = [(relabel(s), p, relabel(o)) for (s, p, o) in ts]
    assert normalize_quads(_quads(ts)) == normalize_quads(_quads(ts2))


@settings(max_examples=75, deadline=None)
@given(_triples)
def test_nt_roundtrip_exact(ts):
    from sophia_rs_ray.ntriples import parse_document, serialize_document
    from sophia_rs_ray.terms import format_term

    doc = serialize_document(_quads(ts), canonical=True)
    back = parse_document(doc)
    got = [(format_term(s), format_term(p), format_term(o))
           for (s, p, o, _g) in back]
    want = [(format_term(s), format_term(p), format_term(o))
            for (s, p, o) in ts]
    assert got == want
