"""Generative GRAPH-scoping differential gate: random QUAD tables
(default graph '' + three named graphs) and random queries mixing a
default-graph pattern with GRAPH ?g / GRAPH <iri> blocks, checked
against a mechanical SQL compilation over quads(s, p, o, g).  The
scoping rules under test: a plain BGP sees ONLY the default graph;
GRAPH ?g ranges over named graphs only; all patterns inside one GRAPH
block share the same graph binding."""

import random

import pyarrow as pa
import pytest

EX = "http://ex.org/"
NODES = [f"<{EX}n{i}>" for i in range(8)]
PREDICATES = [f"<{EX}p{i}>" for i in range(3)]
GRAPH_NAMES = ["", f"<{EX}g1>", f"<{EX}g2>", f"<{EX}g3>"]


def _random_quads(rng):
    quads = set()
    for _ in range(rng.randint(30, 70)):
        quads.add((rng.choice(NODES), rng.choice(PREDICATES),
                   rng.choice(NODES), rng.choice(GRAPH_NAMES)))
    return sorted(quads)


def _quads_ds(quads):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "s": pa.array([q[0] for q in quads], pa.large_string()),
        "p": pa.array([q[1] for q in quads], pa.large_string()),
        "o": pa.array([q[2] for q in quads], pa.large_string()),
        "g": pa.array([q[3] for q in quads], pa.large_string()),
    }))


@pytest.mark.parametrize("seed", range(25))
def test_random_graph_query_matches_duckdb(seed, ray_session):
    import duckdb

    from sophia_rs_ray.sparql import select

    rng = random.Random(8800 + seed)
    quads = _random_quads(rng)

    vs = []

    def var():
        v = f"?v{len(vs)}"
        vs.append(v)
        return v

    def term(var_p):
        if vs and rng.random() < 0.35:
            return rng.choice(vs)
        if rng.random() < var_p:
            return var()
        return rng.choice(NODES)

    # named part: GRAPH ?g { 1-2 patterns } or GRAPH <iri> { pattern }
    const_graph = rng.random() < 0.35
    gterm = rng.choice(GRAPH_NAMES[1:]) if const_graph else "?g"
    inner = [(term(0.8), rng.choice(PREDICATES), term(0.7))
             for _ in range(rng.randint(1, 2))]
    # optional default-graph pattern joined on whatever vars repeat
    with_default = rng.random() < 0.6
    default_pat = ((term(0.8), rng.choice(PREDICATES), term(0.7))
                   if with_default else None)

    if not vs:  # force at least one variable for the projection
        inner[0] = (var(), inner[0][1], inner[0][2])

    proj_pool = vs + ([] if const_graph else ["?g"])
    proj = sorted(rng.sample(proj_pool,
                             rng.randint(1, min(3, len(proj_pool)))))
    distinct = rng.random() < 0.4

    body = "GRAPH %s { %s }" % (
        gterm, " . ".join(" ".join(p) for p in inner))
    if default_pat:
        body += " . " + " ".join(default_pat)
    q = (f"SELECT {'DISTINCT ' if distinct else ''}{' '.join(proj)} "
         f"WHERE {{ {body} }}")

    # --- mechanical SQL over quads(s,p,o,g) ---
    aliases, conds, bound = [], [], {}

    def bind(alias, col, t):
        if t.startswith("?"):
            if t in bound:
                conds.append(f"{bound[t]} = {alias}.{col}")
            else:
                bound[t] = f"{alias}.{col}"
        else:
            conds.append(f"{alias}.{col} = '{t}'")

    for i, pat in enumerate(inner):
        a = f"n{i}"
        aliases.append(f"quads {a}")
        for col, t in zip("spo", pat):
            bind(a, col, t)
        conds.append(f"{a}.g <> ''")  # named graphs only
        bind(a, "g", gterm)  # shared graph binding / constant
    if default_pat:
        a = "d0"
        aliases.append(f"quads {a}")
        for col, t in zip("spo", default_pat):
            bind(a, col, t)
        conds.append(f"{a}.g = ''")

    cols = ", ".join(f"{bound[v]} AS c{i}" for i, v in enumerate(proj))
    sql = (f"SELECT {'DISTINCT ' if distinct else ''}{cols} "
           f"FROM {' CROSS JOIN '.join(aliases)} "
           f"WHERE {' AND '.join(conds)}")

    rows = select(q, _quads_ds(quads)).take_all()
    got = sorted(tuple(r[v[1:]] or "" for v in proj) for r in rows)

    con = duckdb.connect()
    con.register("quads_src", pa.table({
        "s": pa.array([x[0] for x in quads]),
        "p": pa.array([x[1] for x in quads]),
        "o": pa.array([x[2] for x in quads]),
        "g": pa.array([x[3] for x in quads]),
    }))
    con.execute("CREATE VIEW quads AS SELECT * FROM quads_src")
    want = sorted(tuple(c or "" for c in row)
                  for row in con.execute(sql).fetchall())

    assert got == want, (
        f"seed={seed}\nquery: {q}\nsql: {sql}\n"
        f"got {len(got)}, want {len(want)}")


@pytest.mark.parametrize("seed", range(15))
def test_random_dataset_clause_matches_duckdb(seed, ray_session):
    """FROM / FROM NAMED semantics: the plain BGP sees the UNION of
    the FROM graphs (not the stored default graph), and GRAPH ?g
    ranges over exactly the FROM NAMED graphs."""
    import duckdb

    from sophia_rs_ray.sparql import select

    rng = random.Random(9900 + seed)
    quads = _random_quads(rng)
    named = GRAPH_NAMES[1:]

    from_gs = rng.sample(named, rng.randint(1, 2))
    named_gs = rng.sample(named, rng.randint(1, 2))

    p1 = rng.choice(PREDICATES)
    p2 = rng.choice(PREDICATES)
    with_graph = rng.random() < 0.7
    clause = " ".join(f"FROM {g}" for g in from_gs) + " " + \
        " ".join(f"FROM NAMED {g}" for g in named_gs)
    if with_graph:
        q = (f"SELECT ?a ?b ?g ?c {clause} WHERE "
             f"{{ ?a {p1} ?b . GRAPH ?g {{ ?b {p2} ?c }} }}")
    else:
        q = f"SELECT ?a ?b {clause} WHERE {{ ?a {p1} ?b }}"

    in_from = ", ".join(f"'{g}'" for g in from_gs)
    in_named = ", ".join(f"'{g}'" for g in named_gs)
    if with_graph:
        sql = (
            "SELECT DISTINCT d.s AS a, d.o AS b, n.g AS g, n.o AS c "
            "FROM quads d JOIN quads n ON d.o = n.s "
            f"WHERE d.p = '{p1}' AND d.g IN ({in_from}) "
            f"AND n.p = '{p2}' AND n.g IN ({in_named})")
    else:
        # FROM-union is a set union: duplicates across graphs collapse
        sql = (f"SELECT DISTINCT s AS a, o AS b FROM quads "
               f"WHERE p = '{p1}' AND g IN ({in_from})")

    rows = select(q, _quads_ds(quads)).take_all()
    cols = ("a", "b", "g", "c") if with_graph else ("a", "b")
    # the FROM default graph is a graph UNION (set semantics): dedup
    # the engine rows the same way the SQL's DISTINCT does
    got = sorted({tuple(r[c] or "" for c in cols) for r in rows})

    con = duckdb.connect()
    con.register("quads_src", pa.table({
        "s": pa.array([x[0] for x in quads]),
        "p": pa.array([x[1] for x in quads]),
        "o": pa.array([x[2] for x in quads]),
        "g": pa.array([x[3] for x in quads]),
    }))
    con.execute("CREATE VIEW quads AS SELECT * FROM quads_src")
    want = sorted(tuple(c or "" for c in row)
                  for row in con.execute(sql).fetchall())

    assert got == want, (
        f"seed={seed}\nquery: {q}\nsql: {sql}\n"
        f"got {len(got)}, want {len(want)}")
