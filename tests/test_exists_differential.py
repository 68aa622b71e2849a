"""Generative differential gate for FILTER (NOT) EXISTS and VALUES —
the two algebra paths the seeded BGP/UNION/MINUS gate doesn't reach.
Each seeded query is evaluated by the engine and by a mechanical SQL
compilation (correlated EXISTS subquery / VALUES join) over the same
quad table in DuckDB.  Terms are NT-encoded on both sides."""

import random

import pyarrow as pa
import pytest

EX = "http://ex.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

SUBJECTS = [f"<{EX}s{i}>" for i in range(6)]
PREDICATES = [f"<{EX}p{i}>" for i in range(4)]
OBJ_IRIS = [f"<{EX}o{i}>" for i in range(4)]
NODES = SUBJECTS + OBJ_IRIS


def _random_graph(rng):
    triples = set()
    for _ in range(rng.randint(25, 60)):
        s = rng.choice(NODES)
        p = rng.choice(PREDICATES)
        if rng.random() < 0.3:
            o = f'"{rng.randint(-5, 20)}"^^<{XSD_INT}>'
        else:
            o = rng.choice(NODES)
        triples.add((s, p, o))
    return sorted(triples)


def _quads_ds(triples):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))


def _register(con, triples):
    con.register("quads_src", pa.table({
        "s": pa.array([t[0] for t in triples]),
        "p": pa.array([t[1] for t in triples]),
        "o": pa.array([t[2] for t in triples]),
    }))
    con.execute("CREATE VIEW quads AS SELECT * FROM quads_src")


def _compile_required(patterns):
    aliases, conds, bound = [], [], {}
    for i, (s, p, o) in enumerate(patterns):
        a = f"t{i}"
        aliases.append(f"quads {a}")
        for col, term in zip("spo", (s, p, o)):
            if term.startswith("?"):
                if term in bound:
                    conds.append(f"{bound[term]} = {a}.{col}")
                else:
                    bound[term] = f"{a}.{col}"
            else:
                conds.append(f"{a}.{col} = '{term}'")
    return " CROSS JOIN ".join(aliases), conds, bound


def _norm(rows, proj):
    return sorted(tuple(r[i] or "" for i in range(len(proj)))
                  for r in rows)


@pytest.mark.parametrize("seed", range(25))
def test_random_exists_matches_duckdb(seed, ray_session):
    import duckdb

    from sophia_rs_ray.sparql import select

    rng = random.Random(9300 + seed)
    triples = _random_graph(rng)

    # required BGP with 1-2 patterns, all-var-ish
    nreq = rng.randint(1, 2)
    required, vs = [], []

    def term(pool, var_p, fresh):
        if vs and rng.random() < 0.4:
            return rng.choice(vs)
        if rng.random() < var_p:
            v = f"?v{len(vs)}"
            vs.append(v)
            return v
        return rng.choice(pool)

    for _ in range(nreq):
        s = term(NODES, 0.8, True)
        p = rng.choice(PREDICATES)
        o = term(NODES, 0.7, True)
        required.append((s, p, o))
    if not vs:
        required[0] = ("?v0", required[0][1], required[0][2])
        vs.append("?v0")

    # EXISTS block: one pattern sharing >=1 required var; inner-only
    # vars are existential
    shared = rng.choice(vs)
    inner_new = f"?w{rng.randint(0, 9)}"
    if rng.random() < 0.5:
        ex_pat = (shared, rng.choice(PREDICATES),
                  inner_new if rng.random() < 0.6 else rng.choice(NODES))
    else:
        ex_pat = (inner_new if rng.random() < 0.6 else rng.choice(NODES),
                  rng.choice(PREDICATES), shared)
    negate = rng.random() < 0.5
    distinct = rng.random() < 0.4
    proj = sorted(rng.sample(vs, rng.randint(1, min(2, len(vs)))))

    kw = "NOT EXISTS" if negate else "EXISTS"
    body = " . ".join(" ".join(p) for p in required)
    q = (f"SELECT {'DISTINCT ' if distinct else ''}{' '.join(proj)} "
         f"WHERE {{ {body} FILTER {kw} {{ {' '.join(ex_pat)} }} }}")

    join, conds, bound = _compile_required(required)
    ex_conds = []
    for col, t in zip("spo", ex_pat):
        if t.startswith("?") and t in bound:
            ex_conds.append(f"ex.{col} = {bound[t]}")
        elif not t.startswith("?"):
            ex_conds.append(f"ex.{col} = '{t}'")
    sub = f"SELECT 1 FROM quads ex WHERE {' AND '.join(ex_conds)}"
    where = conds + [f"{'NOT ' if negate else ''}EXISTS ({sub})"]
    cols = ", ".join(f"{bound[v]} AS {v[1:]}" for v in proj)
    sql = (f"SELECT {'DISTINCT ' if distinct else ''}{cols} "
           f"FROM {join} WHERE {' AND '.join(where)}")

    rows = select(q, _quads_ds(triples)).take_all()
    got = _norm([[r[v[1:]] for v in proj] for r in rows], proj)

    con = duckdb.connect()
    _register(con, triples)
    want = _norm(con.execute(sql).fetchall(), proj)
    assert got == want, f"seed={seed}\nquery: {q}\nsql: {sql}"


@pytest.mark.parametrize("seed", range(15))
def test_random_values_matches_duckdb(seed, ray_session):
    import duckdb

    from sophia_rs_ray.sparql import select

    rng = random.Random(9800 + seed)
    triples = _random_graph(rng)

    # BGP ?a p ?b joined with inline VALUES over one or both vars
    p = rng.choice(PREDICATES)
    two_col = rng.random() < 0.4
    n_rows = rng.randint(1, 4)
    if two_col:
        data = [(rng.choice(NODES), rng.choice(NODES))
                for _ in range(n_rows)]
        vals = " ".join(f"({a} {b})" for a, b in data)
        q = (f"SELECT ?a ?b WHERE {{ ?a {p} ?b "
             f"VALUES (?a ?b) {{ {vals} }} }}")
        vrows = ", ".join(f"('{a}', '{b}')" for a, b in data)
        sql = (f"SELECT t.s AS a, t.o AS b FROM quads t "
               f"JOIN (VALUES {vrows}) v(a, b) "
               f"ON t.s = v.a AND t.o = v.b WHERE t.p = '{p}'")
    else:
        data = [rng.choice(NODES) for _ in range(n_rows)]
        vals = " ".join(data)  # single-var form: bare values, no parens
        q = (f"SELECT ?a ?b WHERE {{ ?a {p} ?b "
             f"VALUES ?a {{ {vals} }} }}")
        vrows = ", ".join(f"('{a}')" for a in data)
        sql = (f"SELECT t.s AS a, t.o AS b FROM quads t "
               f"JOIN (VALUES {vrows}) v(a) ON t.s = v.a "
               f"WHERE t.p = '{p}'")

    rows = select(q, _quads_ds(triples)).take_all()
    got = sorted((r["a"] or "", r["b"] or "") for r in rows)

    con = duckdb.connect()
    _register(con, triples)
    want = sorted((a or "", b or "")
                  for a, b in con.execute(sql).fetchall())
    assert got == want, f"seed={seed}\nquery: {q}\nsql: {sql}"
