"""Generative SPARQL differential gate: seeded random graphs and
random BGP/FILTER/OPTIONAL/DISTINCT queries, evaluated BOTH by the
engine and by a mechanical SQL compilation of the same algebra over
the same quad table in DuckDB.  Complements the transcribed reference
query matrix with join/filter shapes nobody hand-picked.

Term strings are NT-encoded in both systems, so joins compare equal
byte-for-byte; integer literals are generated in canonical form only.
FILTER (?v < k) drops type-error rows in SPARQL — the SQL mirrors that
by requiring the term to BE an integer literal before comparing."""

import random

import pyarrow as pa
import pytest

EX = "http://ex.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

SUBJECTS = [f"<{EX}s{i}>" for i in range(6)]
PREDICATES = [f"<{EX}p{i}>" for i in range(4)]
OBJ_IRIS = [f"<{EX}o{i}>" for i in range(4)]


def _random_graph(rng):
    triples = set()
    for _ in range(rng.randint(25, 60)):
        s = rng.choice(SUBJECTS + OBJ_IRIS)
        p = rng.choice(PREDICATES)
        if rng.random() < 0.4:
            o = f'"{rng.randint(-5, 20)}"^^<{XSD_INT}>'
        else:
            o = rng.choice(SUBJECTS + OBJ_IRIS)
        triples.add((s, p, o))
    return sorted(triples)


class _Gen:
    """One random query = patterns + optional-block + filter + proj."""

    def __init__(self, rng):
        self.rng = rng
        self.nvar = 0
        self.vars = []

    def fresh_var(self):
        v = f"?v{self.nvar}"
        self.nvar += 1
        self.vars.append(v)
        return v

    def term(self, pool, var_p):
        if self.vars and self.rng.random() < 0.45:
            return self.rng.choice(self.vars)
        if self.rng.random() < var_p:
            return self.fresh_var()
        return self.rng.choice(pool)

    def pattern(self):
        s = self.term(SUBJECTS + OBJ_IRIS, 0.7)
        p = self.term(PREDICATES, 0.3) if self.rng.random() < 0.3 \
            else self.rng.choice(PREDICATES)
        o = self.term(SUBJECTS + OBJ_IRIS, 0.7)
        return (s, p, o)


def _gen_query(rng):
    g = _Gen(rng)
    n_req = rng.randint(1, 3)
    required = [g.pattern() for _ in range(n_req)]
    req_vars = list(dict.fromkeys(
        t for pat in required for t in pat if t.startswith("?")))
    if not req_vars:  # degenerate all-constant query; force one var
        required[0] = ("?v0", required[0][1], required[0][2])
        g.vars.append("?v0")
        req_vars = ["?v0"]

    # optional single-pattern block sharing >=1 required var
    optional = None
    if rng.random() < 0.4:
        shared = rng.choice(req_vars)
        new = f"?w{rng.randint(0, 99)}"
        if rng.random() < 0.5:
            optional = (shared, rng.choice(PREDICATES), new)
        else:
            optional = (new, rng.choice(PREDICATES), shared)

    # numeric filter on a required var (engine: type errors drop rows)
    filt = None
    if rng.random() < 0.5:
        filt = (rng.choice(req_vars), rng.choice("<>"),
                rng.randint(-2, 15))

    distinct = rng.random() < 0.5
    proj = sorted(rng.sample(req_vars,
                             rng.randint(1, min(3, len(req_vars)))))
    return required, optional, filt, distinct, proj


def _to_sparql(required, optional, filt, distinct, proj):
    body = " . ".join(" ".join(p) for p in required)
    if optional:
        body += " OPTIONAL { %s } " % " ".join(optional)
    if filt:
        v, op, k = filt
        body += f" FILTER ({v} {op} {k})"
    d = "DISTINCT " if distinct else ""
    return f"SELECT {d}{' '.join(proj)} WHERE {{ {body} }}"


def _to_sql(required, optional, filt, distinct, proj):
    """Mechanical SQL compilation over quads(s, p, o)."""
    aliases, conds, bound = [], [], {}

    def bind(alias, col, term, conds, bound):
        if term.startswith("?"):
            if term in bound:
                conds.append(f"{bound[term]} = {alias}.{col}")
            else:
                bound[term] = f"{alias}.{col}"
        else:
            lit = term.replace("'", "''")
            conds.append(f"{alias}.{col} = '{lit}'")

    for i, (s, p, o) in enumerate(required):
        a = f"t{i}"
        aliases.append(f"quads {a}")
        bind(a, "s", s, conds, bound)
        bind(a, "p", p, conds, bound)
        bind(a, "o", o, conds, bound)

    join = " CROSS JOIN ".join(aliases)
    where = (" WHERE " + " AND ".join(conds)) if conds else ""

    opt_join = ""
    if optional:
        oconds, obound = [], {}
        for col, term in zip("spo", optional):
            if term.startswith("?") and term in bound:
                oconds.append(f"opt.{col} = {bound[term]}")
            elif term.startswith("?"):
                obound[term] = f"opt.{col}"
            else:
                lit = term.replace("'", "''")
                oconds.append(f"opt.{col} = '{lit}'")
        opt_join = (" LEFT JOIN quads opt ON " + " AND ".join(oconds))
        bound.update(obound)

    if filt:
        v, op, k = filt
        col = bound[v]
        where += (" AND " if where else " WHERE ") + (
            f"({col} LIKE '\"%\"^^<{XSD_INT}>' AND "
            f"CAST(regexp_extract({col}, '\"(-?[0-9]+)\"', 1) AS BIGINT)"
            f" {op} {k})")

    cols = ", ".join(f"{bound[v]} AS {v[1:]}" for v in proj)
    d = "DISTINCT " if distinct else ""
    return f"SELECT {d}{cols} FROM {join}{opt_join}{where}"


def _norm_rows(rows, proj):
    out = []
    for r in rows:
        out.append(tuple(
            (r.get(v[1:]) if r.get(v[1:]) is not None else "")
            for v in proj))
    return sorted(out)


@pytest.mark.parametrize("seed", range(30))
def test_random_query_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    rng = random.Random(1000 + seed)
    triples = _random_graph(rng)
    required, optional, filt, distinct, proj = _gen_query(rng)
    qtext = _to_sparql(required, optional, filt, distinct, proj)
    sql = _to_sql(required, optional, filt, distinct, proj)

    from sophia_rs_ray.sparql import select

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    got = _norm_rows(select(qtext, ds).take_all(), proj)

    con = duckdb.connect()
    con.register("quads_src", pa.table({
        "s": pa.array([t[0] for t in triples]),
        "p": pa.array([t[1] for t in triples]),
        "o": pa.array([t[2] for t in triples]),
    }))
    con.execute("CREATE VIEW quads AS SELECT * FROM quads_src")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    want = sorted(
        tuple((row[cols.index(v[1:])] or "") for v in proj)
        for row in cur.fetchall())

    assert got == want, (
        f"seed={seed}\nquery: {qtext}\nsql: {sql}\n"
        f"got {len(got)} rows, want {len(want)}")


# ---------------------------------------------------------------------------
# UNION and MINUS shapes (separate algebra paths)
# ---------------------------------------------------------------------------

def _compile_bgp(patterns, prefix):
    """(from_sql, conds, bound) for a BGP, aliases prefixed uniquely."""
    aliases, conds, bound = [], [], {}
    for i, (s, p, o) in enumerate(patterns):
        a = f"{prefix}{i}"
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


def _bgp_vars(patterns):
    return list(dict.fromkeys(
        t for pat in patterns for t in pat if t.startswith("?")))


@pytest.mark.parametrize("seed", range(15))
def test_random_union_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    rng = random.Random(7000 + seed)
    triples = _random_graph(rng)
    ga = _Gen(rng)
    left = [ga.pattern() for _ in range(rng.randint(1, 2))]
    gb = _Gen(rng)
    gb.nvar = 50  # distinct var namespace unless we force overlap
    right = [gb.pattern() for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.5 and _bgp_vars(left) and _bgp_vars(right):
        # rename one right var onto a left var: shared projection col
        src = rng.choice(_bgp_vars(right))
        dst = rng.choice(_bgp_vars(left))
        right = [tuple(dst if t == src else t for t in pat)
                 for pat in right]
    lv, rv = _bgp_vars(left), _bgp_vars(right)
    if not lv or not rv:
        pytest.skip("degenerate constant-only side")
    allv = sorted(set(lv) | set(rv))
    proj = sorted(rng.sample(allv, rng.randint(1, min(3, len(allv)))))

    body_l = " . ".join(" ".join(p) for p in left)
    body_r = " . ".join(" ".join(p) for p in right)
    qtext = (f"SELECT {' '.join(proj)} WHERE "
             f"{{ {{ {body_l} }} UNION {{ {body_r} }} }}")

    def side_sql(patterns, bound_vars, prefix):
        frm, conds, bound = _compile_bgp(patterns, prefix)
        cols = ", ".join(
            (f"{bound[v]} AS {v[1:]}" if v in bound
             else f"CAST(NULL AS VARCHAR) AS {v[1:]}") for v in proj)
        where = (" WHERE " + " AND ".join(conds)) if conds else ""
        return f"SELECT {cols} FROM {frm}{where}"

    sql = (side_sql(left, lv, "a") + " UNION ALL " +
           side_sql(right, rv, "b"))

    from sophia_rs_ray.sparql import select

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    got = _norm_rows(select(qtext, ds).take_all(), proj)

    con = duckdb.connect()
    con.register("quads", pa.table({
        "s": pa.array([t[0] for t in triples]),
        "p": pa.array([t[1] for t in triples]),
        "o": pa.array([t[2] for t in triples]),
    }))
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    want = sorted(
        tuple((row[cols.index(v[1:])] or "") for v in proj)
        for row in cur.fetchall())
    assert got == want, f"seed={seed}\nquery: {qtext}\nsql: {sql}"


@pytest.mark.parametrize("seed", range(15))
def test_random_minus_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    rng = random.Random(9000 + seed)
    triples = _random_graph(rng)
    g = _Gen(rng)
    left = [g.pattern() for _ in range(rng.randint(1, 2))]
    lv = _bgp_vars(left)
    if not lv:
        pytest.skip("degenerate constant-only left")
    # MINUS right: one pattern sharing >=1 left var, all vars bound on
    # both sides -> anti-join on the shared vars
    shared = rng.choice(lv)
    other = f"?m{rng.randint(0, 9)}"
    minus_pat = (shared, rng.choice(PREDICATES), other) \
        if rng.random() < 0.5 else (other, rng.choice(PREDICATES), shared)
    proj = sorted(rng.sample(lv, rng.randint(1, min(3, len(lv)))))

    body_l = " . ".join(" ".join(p) for p in left)
    qtext = (f"SELECT {' '.join(proj)} WHERE "
             f"{{ {body_l} MINUS {{ {' '.join(minus_pat)} }} }}")

    frm, conds, bound = _compile_bgp(left, "l")
    mconds = []
    for col, term in zip("spo", minus_pat):
        if term == shared:
            mconds.append(f"m.{col} = {bound[shared]}")
        elif term.startswith("?"):
            pass  # free var on the minus side
        else:
            mconds.append(f"m.{col} = '{term}'")
    where = (" WHERE " + " AND ".join(conds)) if conds else " WHERE 1=1"
    where += (" AND NOT EXISTS (SELECT 1 FROM quads m WHERE "
              + " AND ".join(mconds) + ")")
    cols = ", ".join(f"{bound[v]} AS {v[1:]}" for v in proj)
    sql = f"SELECT {cols} FROM {frm}{where}"

    from sophia_rs_ray.sparql import select

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    got = _norm_rows(select(qtext, ds).take_all(), proj)

    con = duckdb.connect()
    con.register("quads", pa.table({
        "s": pa.array([t[0] for t in triples]),
        "p": pa.array([t[1] for t in triples]),
        "o": pa.array([t[2] for t in triples]),
    }))
    cur = con.execute(sql)
    colnames = [d[0] for d in cur.description]
    want = sorted(
        tuple((row[colnames.index(v[1:])] or "") for v in proj)
        for row in cur.fetchall())
    assert got == want, f"seed={seed}\nquery: {qtext}\nsql: {sql}"
