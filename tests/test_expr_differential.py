"""Generative expression differential gate: random arithmetic /
comparison / boolean expression STRINGS — deliberately NOT fully
parenthesized — evaluated by the engine (``VALUES … BIND(e AS ?r)``)
and by DuckDB over the same integer bindings.  SPARQL and SQL share
the operator precedence table (unary > mul > add > cmp > && > ||), so
any disagreement is a parser-precedence or evaluator bug.  Division is
excluded (SPARQL integer ``/`` yields xsd:decimal; SQL differs), as
are type-error shapes — the transcribed 803-case matrix owns those."""

import random

import pytest

XSD = "http://www.w3.org/2001/XMLSchema#"
VARS = ["?x", "?y", "?z"]


class _Gen:
    """Random expression in the SPARQL∩SQL precedence-compatible
    subset.  Returns (sparql_text, sql_text, kind) with kind in
    {'num', 'bool'}.  Parentheses are inserted only sometimes, so flat
    chains like ``?x + ?y * 2 - ?z < ?z * 3`` exercise precedence."""

    def __init__(self, rng):
        self.rng = rng

    def atom(self):
        if self.rng.random() < 0.6:
            v = self.rng.choice(VARS)
            return v, v[1:], "num"
        k = self.rng.randint(-3, 12)
        return str(k), str(k), "num"

    def unary(self, depth):
        if depth > 0 and self.rng.random() < 0.15:
            s, q, _ = self.unary(depth - 1)
            # SPARQL unary minus binds a primary expression
            return f"-({s})", f"-({q})", "num"
        return self.atom()

    def mul(self, depth):
        s, q, _ = self.unary(depth)
        while depth > 0 and self.rng.random() < 0.35:
            s2, q2, _ = self.unary(depth - 1)
            s, q = f"{s} * {s2}", f"{q} * {q2}"
        return s, q, "num"

    def add(self, depth):
        s, q, _ = self.mul(depth)
        while depth > 0 and self.rng.random() < 0.45:
            op = self.rng.choice(["+", "-"])
            s2, q2, _ = self.mul(depth - 1)
            s, q = f"{s} {op} {s2}", f"{q} {op} {q2}"
        if depth > 0 and self.rng.random() < 0.2:
            s, q = f"({s})", f"({q})"
        return s, q, "num"

    def cmp(self, depth):
        s, q, _ = self.add(depth)
        op = self.rng.choice(["<", "<=", "=", "!=", ">=", ">"])
        s2, q2, _ = self.add(depth)
        return (f"{s} {op} {s2}",
                f"{q} {'<>' if op == '!=' else op} {q2}", "bool")

    def boolean(self, depth):
        s, q, _ = self.cmp(depth)
        while depth > 0 and self.rng.random() < 0.4:
            op = self.rng.choice(["&&", "||"])
            if self.rng.random() < 0.3:
                s2, q2, _ = self.boolean(depth - 1)
                s2, q2 = f"({s2})", f"({q2})"
            else:
                s2, q2, _ = self.cmp(depth - 1)
            s = f"{s} {op} {s2}"
            q = f"{q} {'AND' if op == '&&' else 'OR'} {q2}"
        if depth > 0 and self.rng.random() < 0.25:
            s, q = f"!({s})", f"NOT ({q})"
        return s, q, "bool"

    def expr(self, depth=3):
        r = self.rng.random()
        if r < 0.25:
            # IF(cond, a, b) ↔ CASE WHEN cond THEN a ELSE b END
            cs, cq, _ = self.boolean(depth - 1)
            as_, aq, _ = self.add(depth - 1)
            bs, bq, _ = self.add(depth - 1)
            return (f"IF({cs}, {as_}, {bs})",
                    f"CASE WHEN {cq} THEN {aq} ELSE {bq} END", "num")
        if r < 0.6:
            return self.boolean(depth)
        return self.add(depth)


def _parse_result(nt):
    if nt is None:
        return None
    assert nt.startswith('"'), nt
    end = nt.rindex('"')
    lex, dt = nt[1:end], nt[end + 4:-1]
    if dt == f"{XSD}boolean":
        return lex == "true"
    assert dt == f"{XSD}integer", nt
    return int(lex)


@pytest.mark.parametrize("seed", range(40))
def test_random_expression_matches_duckdb(seed, ray_session):
    import duckdb

    from sophia_rs_ray.sparql import select

    rng = random.Random(5500 + seed)
    g = _Gen(rng)
    sparql_e, sql_e, _kind = g.expr()

    # distinct integer bindings for (?x ?y ?z)
    rows = set()
    while len(rows) < 8:
        rows.add((rng.randint(-4, 9), rng.randint(-4, 9),
                  rng.randint(-4, 9)))
    rows = sorted(rows)

    def lit(n):
        return f'"{n}"^^<{XSD}integer>'

    vals = " ".join(f"({lit(x)} {lit(y)} {lit(z)})" for x, y, z in rows)
    q = (f"SELECT ?x ?y ?z ?r WHERE {{ "
         f"VALUES (?x ?y ?z) {{ {vals} }} "
         f"BIND({sparql_e} AS ?r) }}")

    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "s": pa.array([], pa.large_string()),
        "p": pa.array([], pa.large_string()),
        "o": pa.array([], pa.large_string()),
    }))
    out = select(q, empty).take_all()
    got = sorted(
        ((_parse_result(r["x"]), _parse_result(r["y"]),
          _parse_result(r["z"])), _parse_result(r["r"])) for r in out)

    con = duckdb.connect()
    vrows = ", ".join(f"({x}, {y}, {z})" for x, y, z in rows)
    cur = con.execute(
        f"SELECT x, y, z, {sql_e} AS r FROM (VALUES {vrows}) t(x, y, z)")
    want = sorted(((x, y, z), r if not isinstance(r, bool) else r)
                  for x, y, z, r in cur.fetchall())

    assert len(got) == len(want) == 8, f"seed={seed} q={q}"
    for (kg, vg), (kw, vw) in zip(got, want):
        assert kg == kw, f"seed={seed} binding drift: {kg} vs {kw}"
        # DuckDB returns ints for CASE/arith, bools for predicates
        assert vg == vw and isinstance(vg, type(vw)) or vg == vw, (
            f"seed={seed}\nexpr: {sparql_e}\nsql: {sql_e}\n"
            f"at {kg}: engine={vg!r} duckdb={vw!r}")
