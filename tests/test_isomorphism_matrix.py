"""Reference isomorphism test matrix, transcribed case-for-case from
``isomorphism/src/test.rs`` (sophia_rs): ground-term datasets, bnode
relabelings, triple terms, chains/cycles/cliques/trees, the
pathological twin-cycle case the c14n-based implementation now
handles, and bnodes in predicate/graph-name position."""

import pytest

from sophia_rs_ray.c14n import isomorphic
from sophia_rs_ray.terms import bnode, iri, literal, triple_term

FOAF_KNOWS = iri("http://xmlns.com/foaf/0.1/knows")
FOAF_MBOX = iri("http://xmlns.com/foaf/0.1/mbox")
FOAF_NAME = iri("http://xmlns.com/foaf/0.1/name")
MBOX_ALICE = iri("mailto:alice@work.example")
LIT_ALICE = literal("alice")
LIT_BOB = literal("bob")
REL = iri("tag:rel")


def _both(a, b, want):
    assert isomorphic(a, b) is want
    assert isomorphic(b, a) is want


def test_no_bnode():
    def make(i1, i2):
        i1, i2 = iri(i1), iri(i2)
        return [
            (i1, FOAF_NAME, LIT_ALICE, None),
            (i1, FOAF_MBOX, MBOX_ALICE, None),
            (i1, FOAF_KNOWS, i2, None),
            (i2, FOAF_NAME, LIT_BOB, i1),
        ]

    d1 = make("http://ex/#alice", "http://ex/#bob")
    assert isomorphic(d1, d1)
    _both(d1, make("http://ex/#a", "http://ex/#b"), False)
    _both(d1, d1[1:], False)
    d4 = list(d1)
    d4[3] = (iri("http://ex/#bobby"),) + d4[3][1:]
    _both(d1, d4, False)
    d5 = list(d1)
    d5[3] = d5[3][:3] + (iri("http://ex/#bob"),)
    _both(d1, d5, False)


def test_simple():
    def make(b1, b2):
        b1, b2 = bnode(b1), bnode(b2)
        return [
            (b1, FOAF_NAME, LIT_ALICE, None),
            (b1, FOAF_MBOX, MBOX_ALICE, None),
            (b1, FOAF_KNOWS, b2, None),
            (b2, FOAF_NAME, LIT_BOB, b1),
        ]

    d1 = make("alice", "bob")
    assert isomorphic(d1, d1)
    _both(d1, make("a", "b"), True)
    _both(d1, d1[1:], False)
    d4 = list(d1)
    d4[3] = (bnode("bobby"),) + d4[3][1:]
    _both(d1, d4, False)
    d5 = list(d1)
    d5[3] = d5[3][:3] + (bnode("bob"),)
    _both(d1, d5, False)


def test_no_bnode_triple_term():
    a, b, c, d, e = (iri(f"http://ex/#{x}") for x in "abcde")
    d1 = [(a, b, c, None), (triple_term(a, b, c), d, e, a)]
    assert isomorphic(d1, d1)
    _both(d1, d1[1:], False)
    d3 = [(a, b, c, None), (triple_term(a, b, c), b, e, a)]
    _both(d1, d3, False)
    d4 = [(a, b, c, None), (a, b, triple_term(c, d, e), a)]
    _both(d1, d4, False)


def test_triple_term():
    a, b, c, d, e = (bnode(x) for x in "abcde")
    d1 = [(a, b, c, None), (triple_term(a, b, c), d, e, a)]
    assert isomorphic(d1, d1)
    _both(d1, d1[1:], False)
    d3 = [(a, b, c, None), (triple_term(a, b, c), b, e, a)]
    _both(d1, d3, False)
    d4 = [(a, b, c, None), (a, b, triple_term(c, d, e), a)]
    _both(d1, d4, False)


def _chain(ids):
    nodes = [bnode(ch) for ch in ids]
    return [(nodes[i - 1], REL, nodes[i], nodes[i - 1])
            for i in range(1, len(nodes))]


def test_chain():
    d1 = _chain("abcdefghij")
    assert isomorphic(d1, d1)
    _both(d1, _chain("EDCBAJIHGF"), True)
    assert not isomorphic(d1, _chain("abcdefghijk"))


def test_cycle2():
    d1 = _chain("aba")
    assert isomorphic(d1, d1)
    _both(d1, _chain("BAB"), True)


def test_cycle_long():
    d1 = _chain("abcdefghia")
    assert isomorphic(d1, d1)
    _both(d1, _chain("EBCDAIGHFE"), True)
    assert not isomorphic(d1, _chain("abcdefghija"))


def test_cycle_pathological():
    # two 3+4 cycles vs one 7-cycle: every bnode locally identical;
    # the c14n-based implementation must still distinguish them
    d1 = _chain("abca") + _chain("defgd")
    d2 = _chain("abcdefga")
    assert not isomorphic(d1, d2)


def test_cycle_almost_pathological():
    typ, dist = iri("tag:type"), iri("tag:Distinguished")
    d1 = _chain("abca") + _chain("defgd")
    d1.append((d1[0][0], typ, dist, d1[0][0]))
    d2 = _chain("abcdefga")
    d2.append((d2[0][0], typ, dist, d2[0][0]))
    assert not isomorphic(d1, d2)


def _clique(ids):
    nodes = [bnode(ch) for ch in ids]
    return [(n1, REL, n2, n1) for n1 in nodes for n2 in nodes]


def test_clique():
    d1 = _clique("abcde")
    assert isomorphic(d1, d1)
    _both(d1, _clique("ABCDE"), True)
    assert not isomorphic(d1, _clique("abcd"))


def _tree(ids):
    nodes = [bnode(ch) for ch in ids]
    out, i = [], 0
    while 2 * i < len(nodes):
        out.append((nodes[i], REL, nodes[2 * i], nodes[i]))
        if 2 * i + 1 < len(nodes):
            out.append((nodes[i], REL, nodes[2 * i + 1], nodes[i]))
        i += 1
    return out


def test_tree():
    d1 = _tree("abcdefghij")
    assert isomorphic(d1, d1)
    _both(d1, _tree("ABCDEFGHIJ"), True)
    assert not isomorphic(d1, _tree("abcdefghijk"))


def test_predicate_and_gname():
    b1, b2, b3, b4 = (bnode(f"b{i}") for i in (1, 2, 3, 4))
    d1 = [(b1, REL, b2, b3), (b2, REL, b3, b4), (REL, b1, b4, b3)]
    assert isomorphic(d1, d1)
    d2 = [(b2, REL, b3, b4), (b3, REL, b4, b1), (REL, b2, b1, b4)]
    _both(d1, d2, True)
    d3 = [(b1, REL, b2, b3), (b2, REL, b3, b4), (REL, b2, b4, b3)]
    _both(d2, d3, False)
    _both(d1, d3, False)
    d4 = [(b1, REL, b2, b3), (b2, REL, b3, b4), (REL, b1, b4, b2)]
    _both(d2, d4, False)
    _both(d1, d4, False)
