"""Generative aggregate differential gate: random GROUP BY queries
(COUNT/SUM/MIN/MAX/AVG, DISTINCT variants, optional HAVING) over
random integer-valued graphs, checked against DuckDB on the same data.
AVG compares exactly via Fraction(sum, count) — SPARQL integer AVG is
exact xsd:decimal, DuckDB's is a double, so the SQL returns the raw
sum+count ingredients instead."""

import random
import re
from fractions import Fraction

import pyarrow as pa
import pytest

EX = "http://ex.org/"
CATS = [f"<{EX}cat{i}>" for i in range(4)]
_LEX = re.compile(r'^"([^"]*)"')


def _lex(term):
    m = _LEX.match(term or "")
    assert m, f"not a literal: {term!r}"
    return m.group(1)


def _random_graph(rng):
    triples = []
    for i in range(rng.randint(8, 25)):
        s = f"<{EX}s{i}>"
        triples.append((s, f"<{EX}cat>", rng.choice(CATS)))
        for _ in range(rng.randint(0, 3)):
            v = rng.randint(-4, 9)
            triples.append((
                s, f"<{EX}val>",
                f'"{v}"^^<http://www.w3.org/2001/XMLSchema#integer>'))
    return sorted(set(triples))


AGGS = ["COUNT", "SUM", "MIN", "MAX", "AVG", "COUNT*"]


@pytest.mark.parametrize("seed", range(25))
def test_random_group_agg_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    from sophia_rs_ray.sparql import select

    rng = random.Random(3000 + seed)
    triples = _random_graph(rng)
    agg = rng.choice(AGGS)
    distinct = agg in ("COUNT", "SUM", "AVG") and rng.random() < 0.4
    grouped = rng.random() < 0.8
    having = grouped and rng.random() < 0.3 and rng.randint(1, 3)

    d = "DISTINCT " if distinct else ""
    expr = "COUNT(*)" if agg == "COUNT*" else f"{agg}({d}?v)"
    head = ("?c (%s AS ?a)" % expr) if grouped else f"({expr} AS ?a)"
    qtext = (f"SELECT {head} WHERE {{ ?x <{EX}cat> ?c . "
             f"?x <{EX}val> ?v }}")
    if grouped:
        qtext += " GROUP BY ?c"
        if having:
            qtext += f" HAVING (COUNT(?v) > {having})"

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    rows = select(qtext, ds).take_all()

    # SQL returns the raw ingredients per group
    vexpr = "CAST(regexp_extract(t1.o, '\"(-?[0-9]+)\"', 1) AS BIGINT)"
    dv = f"DISTINCT {vexpr}" if distinct else vexpr
    sql = (f"SELECT t0.o AS c, count({dv}) AS n, sum({dv}) AS sm, "
           f"min({vexpr}) AS mn, max({vexpr}) AS mx, "
           f"count(*) AS nstar, count({vexpr}) AS nv "
           f"FROM quads t0 CROSS JOIN quads t1 "
           f"WHERE t0.p = '<{EX}cat>' AND t1.p = '<{EX}val>' "
           f"AND t0.s = t1.s GROUP BY t0.o")
    con = duckdb.connect()
    con.register("quads", pa.table({
        "s": pa.array([t[0] for t in triples]),
        "p": pa.array([t[1] for t in triples]),
        "o": pa.array([t[2] for t in triples]),
    }))
    groups = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    if having:
        groups = {c: g for c, g in groups.items() if g[5] > having}

    def expected(g):
        n, sm, mn, mx, nstar, _nv = g
        if agg == "COUNT":
            return Fraction(n)
        if agg == "COUNT*":
            return Fraction(nstar)
        if agg == "SUM":
            return Fraction(int(sm))
        if agg == "MIN":
            return Fraction(int(mn))
        if agg == "MAX":
            return Fraction(int(mx))
        return Fraction(int(sm), int(n))  # AVG over the distinct set
        # NB: for AVG DISTINCT, sm/n are already over the distinct set

    if grouped:
        got = {r["c"]: Fraction(_lex(r["a"])) for r in rows}
        want = {c: expected(g) for c, g in groups.items()}
    else:
        assert len(rows) == 1
        got = {None: Fraction(_lex(rows[0]["a"]))}
        # single implicit group = union of all groups; recompute
        allq = sql.replace("GROUP BY t0.o", "").replace(
            "t0.o AS c, ", "")
        g = con.execute(allq).fetchone()
        want = {None: expected(g)}
    assert set(got) == set(want), (
        f"seed={seed}\nquery: {qtext}\ngroups {set(got)} != {set(want)}")
    for c in want:
        if agg == "AVG":
            # xsd:decimal division precision is implementation-defined
            # (XSD 1.1 requires >=18 digits); the engine truncates at 28
            assert abs(got[c] - want[c]) < Fraction(1, 10**18), (
                f"seed={seed} group={c}: {got[c]} != {want[c]}")
        else:
            assert got[c] == want[c], (
                f"seed={seed}\nquery: {qtext}\n"
                f"group={c}: {got[c]} != {want[c]}")
