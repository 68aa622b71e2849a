"""The reference's SPARQL expression matrix (sparql/src/test.rs
test_expr, 803 cases) run against our parser + evaluator.

Mirrors the reference harness eval_expr (test.rs:2263-2274): each side
is wrapped in ``SELECT ((E) AS ?x) {}`` and evaluated; the empty group
pattern contributes the unit solution.  Comparison is by term equality,
relaxed to value+datatype equality for numerics (the reference compares
its own canonical serializations, so "42.0" vs "4.2e1" both denote the
same double value — we assert the VALUE and the datatype, not the
engine-specific lexical form).  No Ray session needed: the Extend
expression is evaluated directly, which is exactly what the distributed
Extend/Filter stages do per row.
"""

import pytest

from data_expr_matrix import CASES, SKIP

from sophia_rs_ray.sparql.algebra import Extend
from sophia_rs_ray.sparql.expr import eval_expr, value_of
from sophia_rs_ray.sparql.parser import SparqlParseError, parse_query
from sophia_rs_ray.terms import KIND_LITERAL, format_term

PROLOG = ("PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
          "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> ")


def _eval(expr_text):
    """→ Term or None (None = error/unbound, the reference's '')."""
    q = parse_query(PROLOG + f"SELECT (({expr_text}) AS ?x) {{}}")
    node = q.node
    while node is not None:
        if isinstance(node, Extend) and node.var == "x":
            return eval_expr(node.expr, {})
        node = getattr(node, "child", None)
    raise AssertionError("no Extend node for ?x")


def _same(got, want) -> bool:
    if got is None or want is None:
        return got is None and want is None
    if got == want:
        return True
    if got[0] == KIND_LITERAL and want[0] == KIND_LITERAL \
            and got[2] == want[2]:
        vg, vw = value_of(got), value_of(want)
        return vg is not None and vw is not None and vg == vw
    return False


@pytest.mark.parametrize("expr,expected", CASES,
                         ids=[f"{i}:{c[0][:40]}" for i, c in enumerate(CASES)])
def test_expr_matrix(expr, expected):
    if expr in SKIP:
        pytest.skip(SKIP[expr])
    try:
        got = _eval(expr)
    except SparqlParseError as e:
        pytest.fail(f"parse error for {expr!r}: {e}")
    if expected == "":
        assert got is None, \
            f"{expr!r} should be an error, got {format_term(got)}"
    else:
        want = _eval(expected)
        assert want is not None, f"expected-side {expected!r} errored"
        assert _same(got, want), (
            f"{expr!r}: got "
            f"{None if got is None else format_term(got)!r}, want "
            f"{format_term(want)!r}")
