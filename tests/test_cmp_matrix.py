"""The reference's value-comparison matrices (sparql/src/test.rs
test_expr_eq_literal / test_expr_eq_matrix / test_expr_lt) against our
evaluator — SPARQL `=`/`!=` value-vs-term equality split, the `< <= >
>=` comparison set, and the term-kind equality matrix over IRIs,
bnodes, (dir-)lang strings, unrecognized datatypes, ill-formed
literals and RDF 1.2 triple terms."""

import pytest

from data_cmp_matrix import EQ_LITERAL, EQ_MATRIX, FIXTURE, LT

from sophia_rs_ray.ntriples import parse_term_text
from sophia_rs_ray.sparql.algebra import Extend
from sophia_rs_ray.sparql.expr import FnCall, Var, eval_expr
from sophia_rs_ray.sparql.parser import parse_query
from sophia_rs_ray.terms import format_term

PROLOG = ("PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> "
          "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> ")
TRUE = '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
FALSE = '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>'


def _eval(expr_text):
    q = parse_query(PROLOG + f"SELECT (({expr_text}) AS ?x) {{}}")
    node = q.node
    while node is not None:
        if isinstance(node, Extend) and node.var == "x":
            t = eval_expr(node.expr, {})
            return None if t is None else format_term(t)
        node = getattr(node, "child", None)
    raise AssertionError("no Extend node")


@pytest.mark.parametrize("e1,e2,exp", EQ_LITERAL,
                         ids=[f"{a}≟{b}" for a, b, _ in EQ_LITERAL])
def test_eq_literal(e1, e2, exp):
    # control: every term equals itself (test.rs:2050-2055)
    assert _eval(f"{e1} = {e1}") == TRUE
    assert _eval(f"{e1} != {e1}") == FALSE
    assert _eval(f"{e2} = {e2}") == TRUE
    assert _eval(f"{e2} != {e2}") == FALSE
    # control: recognized values are orderable vs themselves (:2057-2067)
    if "xyz" not in e1:
        for e in (e1, e2):
            assert _eval(f"{e} <= {e}") == TRUE
            assert _eval(f"{e} >= {e}") == TRUE
            assert _eval(f"{e} < {e}") == FALSE
            assert _eval(f"{e} > {e}") == FALSE
    if exp is None:
        assert _eval(f"{e1} = {e2}") is None
        assert _eval(f"{e1} != {e2}") is None
    else:
        assert _eval(f"{e1} = {e2}") == (TRUE if exp else FALSE)
        assert _eval(f"{e1} != {e2}") == (FALSE if exp else TRUE)


@pytest.mark.parametrize("x1,x2,exp", EQ_MATRIX,
                         ids=[f"{a}≟{b}" for a, b, _ in EQ_MATRIX])
def test_eq_matrix(x1, x2, exp):
    """Term-kind equality matrix: the reference binds the fixture terms
    via a dataset; we bind them directly as row variables (same
    evaluation path the distributed Extend stage takes per row)."""
    row = {"v1": parse_term_text(FIXTURE[x1]),
           "v2": parse_term_text(FIXTURE[x2])}
    eq = eval_expr(FnCall("=", Var("v1"), Var("v2")), row)
    neq = eval_expr(FnCall("!=", Var("v1"), Var("v2")), row)
    if exp is None:
        assert eq is None and neq is None
    else:
        assert eq is not None and neq is not None
        assert format_term(eq) == (TRUE if exp else FALSE)
        assert format_term(neq) == (FALSE if exp else TRUE)


@pytest.mark.parametrize("e1,e2", LT, ids=[f"{a}<{b}" for a, b in LT])
def test_lt(e1, e2):
    assert _eval(f"{e1} < {e2}") == TRUE
    assert _eval(f"{e1} <= {e2}") == TRUE
    assert _eval(f"{e1} != {e2}") == TRUE
    assert _eval(f"{e1} > {e2}") == FALSE
    assert _eval(f"{e1} >= {e2}") == FALSE
    assert _eval(f"{e1} = {e2}") == FALSE
    assert _eval(f"{e2} < {e1}") == FALSE
    assert _eval(f"{e2} <= {e1}") == FALSE
    assert _eval(f"{e2} != {e1}") == TRUE
    assert _eval(f"{e2} > {e1}") == TRUE
    assert _eval(f"{e2} >= {e1}") == TRUE
    assert _eval(f"{e2} = {e1}") == FALSE
