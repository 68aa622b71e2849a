"""RDFC-1.0 conformance — golden outputs lifted from the reference's
test suite (``c14n/src/rdfc10.rs:612-980``, W3C rdf-canon examples) and
isomorphism semantics (``isomorphism/src/dataset.rs:24-63``).

Pure-module tests: no Ray needed.
"""

import pytest

from sophia_rs_ray.c14n import (
    DEFAULT_PERMUTATION_LIMIT,
    ToxicGraphError,
    UnsupportedError,
    c14n_digest,
    isomorphic,
    normalize_quads,
)
from sophia_rs_ray.ntriples import parse_document


def quads(*lines):
    return parse_document("\n".join(lines), quads=True)


def test_example2():
    ds = quads(
        "<http://example.com/#p> <http://example.com/#q> _:e0 .",
        "<http://example.com/#p> <http://example.com/#r> _:e1 .",
        "_:e0 <http://example.com/#s> <http://example.com/#u> .",
        "_:e1 <http://example.com/#t> <http://example.com/#u> .",
    )
    exp = (
        "<http://example.com/#p> <http://example.com/#q> _:c14n0 .\n"
        "<http://example.com/#p> <http://example.com/#r> _:c14n1 .\n"
        "_:c14n0 <http://example.com/#s> <http://example.com/#u> .\n"
        "_:c14n1 <http://example.com/#t> <http://example.com/#u> .\n"
    )
    assert normalize_quads(ds) == exp


def test_example2_sha384():
    ds = quads(
        "<http://example.com/#p> <http://example.com/#q> _:e0 .",
        "<http://example.com/#p> <http://example.com/#r> _:e1 .",
        "_:e0 <http://example.com/#s> <http://example.com/#u> .",
        "_:e1 <http://example.com/#t> <http://example.com/#u> .",
    )
    exp = (
        "<http://example.com/#p> <http://example.com/#q> _:c14n1 .\n"
        "<http://example.com/#p> <http://example.com/#r> _:c14n0 .\n"
        "_:c14n0 <http://example.com/#t> <http://example.com/#u> .\n"
        "_:c14n1 <http://example.com/#s> <http://example.com/#u> .\n"
    )
    assert normalize_quads(ds, hash_name="sha384") == exp


def test_example3():
    ds = quads(
        "<http://example.com/#p> <http://example.com/#q> _:e0 .",
        "<http://example.com/#p> <http://example.com/#q> _:e1 .",
        "_:e0 <http://example.com/#p> _:e2 .",
        "_:e1 <http://example.com/#p> _:e3 .",
        "_:e2 <http://example.com/#r> _:e3 .",
    )
    exp = (
        "<http://example.com/#p> <http://example.com/#q> _:c14n2 .\n"
        "<http://example.com/#p> <http://example.com/#q> _:c14n3 .\n"
        "_:c14n0 <http://example.com/#r> _:c14n1 .\n"
        "_:c14n2 <http://example.com/#p> _:c14n1 .\n"
        "_:c14n3 <http://example.com/#p> _:c14n0 .\n"
    )
    assert normalize_quads(ds) == exp


CYCLE5 = [
    "_:e0 <http://example.com/#p> _:e1 .",
    "_:e1 <http://example.com/#p> _:e2 .",
    "_:e2 <http://example.com/#p> _:e3 .",
    "_:e3 <http://example.com/#p> _:e4 .",
    "_:e4 <http://example.com/#p> _:e0 .",
]


def test_cycle5():
    exp = (
        "_:c14n0 <http://example.com/#p> _:c14n4 .\n"
        "_:c14n1 <http://example.com/#p> _:c14n0 .\n"
        "_:c14n2 <http://example.com/#p> _:c14n1 .\n"
        "_:c14n3 <http://example.com/#p> _:c14n2 .\n"
        "_:c14n4 <http://example.com/#p> _:c14n3 .\n"
    )
    assert normalize_quads(quads(*CYCLE5)) == exp


def test_cycle5_toxic():
    with pytest.raises(ToxicGraphError):
        normalize_quads(quads(*CYCLE5), depth_factor=0.5,
                        permutation_limit=2 * DEFAULT_PERMUTATION_LIMIT)


def _clique5(graph=None):
    g = f" _:{graph}" if graph else ""
    return [
        f"_:e{i} <http://example.com/#p> _:e{j}{g} ."
        for i in range(5) for j in range(5) if i != j
    ]


def test_clique5():
    exp = "".join(
        f"_:c14n{i} <http://example.com/#p> _:c14n{j} .\n"
        for i in range(5) for j in range(5) if i != j
    )
    assert normalize_quads(quads(*_clique5())) == exp


def test_clique5_named_graphs():
    exp = "".join(
        f"_:c14n{i} <http://example.com/#p> _:c14n{j} _:c14n0 .\n"
        for i in range(5) for j in range(5) if i != j
    )
    assert normalize_quads(quads(*_clique5("e0"))) == exp


def test_clique5_toxic():
    with pytest.raises(ToxicGraphError):
        normalize_quads(quads(*_clique5()), depth_factor=2.0,
                        permutation_limit=3)


def test_cycle2plus3():
    ds = quads(
        "_:e0 <http://example.com/#p> _:e1 .",
        "_:e1 <http://example.com/#p> _:e0 .",
        "_:e2 <http://example.com/#p> _:e3 .",
        "_:e3 <http://example.com/#p> _:e4 .",
        "_:e4 <http://example.com/#p> _:e2 .",
    )
    exp = (
        "_:c14n0 <http://example.com/#p> _:c14n1 .\n"
        "_:c14n1 <http://example.com/#p> _:c14n0 .\n"
        "_:c14n2 <http://example.com/#p> _:c14n4 .\n"
        "_:c14n3 <http://example.com/#p> _:c14n2 .\n"
        "_:c14n4 <http://example.com/#p> _:c14n3 .\n"
    )
    assert normalize_quads(ds) == exp


def test_tricky_order():
    ds = quads(
        "<tag:a> <tag:p> _:a .",
        "<tag:a> <tag:p> <tag:a> .",
        '<tag:a> <tag:p> "a" .',
        '<tag:a> <tag:p> "a!" .',
        '<tag:a9> <tag:p> "a!" .',
    )
    exp = (
        '<tag:a9> <tag:p> "a!" .\n'
        '<tag:a> <tag:p> "a!" .\n'
        '<tag:a> <tag:p> "a" .\n'
        "<tag:a> <tag:p> <tag:a> .\n"
        "<tag:a> <tag:p> _:c14n0 .\n"
    )
    assert normalize_quads(ds) == exp


def test_named_graph_and_lang_literals():
    ds = quads(
        '_:b <tag:p> "chat"@FR <tag:g> .',
        "<tag:s> <tag:p> _:b <tag:g> .",
    )
    out = normalize_quads(ds)
    # canonical NQ lowercases the language tag
    assert '"chat"@fr' in out
    assert "_:c14n0" in out


def test_strict_rejects_bnode_predicate():
    ds = [(("" or q)[0], q[1], q[2], q[3]) for q in quads("_:s <tag:p> <tag:o> .")]
    bad = [(ds[0][0], (0, "pb", "", "", 0), ds[0][2], None)]
    with pytest.raises(UnsupportedError):
        normalize_quads(bad)
    # generalized mode accepts it
    assert "_:c14n" in normalize_quads(bad, strict=False)


def test_isomorphic_relabeled():
    a = quads(*CYCLE5)
    b = quads(*[l.replace("_:e", "_:x") for l in CYCLE5])
    assert isomorphic(a, b)
    # a different shape (chord added) is not isomorphic
    c = quads(*CYCLE5, "_:e0 <http://example.com/#p> _:e2 .")
    assert not isomorphic(a, c)


def test_isomorphic_ignores_duplicates_and_order():
    a = quads(
        "<tag:s> <tag:p> _:x .",
        "_:x <tag:q> <tag:o> .",
    )
    b = list(reversed(quads(
        "<tag:s> <tag:p> _:y .",
        "_:y <tag:q> <tag:o> .",
        "<tag:s> <tag:p> _:y .",  # duplicate
    )))
    assert isomorphic(a, b)


def test_digest_stable():
    a = quads("<tag:s> <tag:p> <tag:o> .")
    assert c14n_digest(a) == c14n_digest(list(a))
