"""Generative subquery differential gate: outer BGP joined with a
nested aggregate `{ SELECT ?x (COUNT(*) AS ?c) … GROUP BY ?x }`, with
an optional outer numeric FILTER on the aggregate — the projection-
scoping path (only the subselect's projected vars join the outer
scope).  Mirrored by a GROUP BY subquery join in DuckDB."""

import random

import pyarrow as pa
import pytest

EX = "http://ex.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
NODES = [f"<{EX}n{i}>" for i in range(8)]
PREDICATES = [f"<{EX}p{i}>" for i in range(3)]


def _random_graph(rng):
    triples = set()
    for _ in range(rng.randint(25, 70)):
        triples.add((rng.choice(NODES), rng.choice(PREDICATES),
                     rng.choice(NODES)))
    return sorted(triples)


@pytest.mark.parametrize("seed", range(20))
def test_random_subquery_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    from sophia_rs_ray.sparql import select

    rng = random.Random(6200 + seed)
    triples = _random_graph(rng)

    p_out = rng.choice(PREDICATES)
    p_in = rng.choice(PREDICATES)
    # subselect groups on subject or object of the inner pattern
    on_subject = rng.random() < 0.5
    inner = "?x %s ?y" % p_in if on_subject else "?y %s ?x" % p_in
    inner_col = "s" if on_subject else "o"
    thresh = rng.choice([None, 1, 2, 3])

    body = (f"?x {p_out} ?z "
            f"{{ SELECT ?x (COUNT(*) AS ?c) WHERE {{ {inner} }} "
            f"GROUP BY ?x }}")
    if thresh is not None:
        body += f" FILTER (?c > {thresh})"
    q = f"SELECT ?x ?z ?c WHERE {{ {body} }}"

    having = f"HAVING count(*) > {thresh}" if thresh is not None else ""
    sql = f"""
        SELECT t.s AS x, t.o AS z,
               '"' || g.c || '"^^<{XSD_INT}>' AS c
        FROM quads t
        JOIN (SELECT {inner_col} AS x, count(*) AS c FROM quads
              WHERE p = '{p_in}' GROUP BY 1 {having}) g
          ON t.s = g.x
        WHERE t.p = '{p_out}'
    """

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    rows = select(q, ds).take_all()
    got = sorted((r["x"], r["z"], r["c"]) for r in rows)

    con = duckdb.connect()
    con.register("quads_src", pa.table({
        "s": pa.array([t[0] for t in triples]),
        "p": pa.array([t[1] for t in triples]),
        "o": pa.array([t[2] for t in triples]),
    }))
    con.execute("CREATE VIEW quads AS SELECT * FROM quads_src")
    want = sorted(map(tuple, con.execute(sql).fetchall()))

    assert got == want, (
        f"seed={seed}\nquery: {q}\nsql: {sql}\n"
        f"got {len(got)}, want {len(want)}")
