"""Generative ORDER BY differential gate.

Random graphs whose objects span every term category (bnodes, IRIs,
simple / lang-tagged / typed literals, mixed numeric types, booleans,
dateTimes, unknown datatypes) are sorted by the engine
(``ORDER BY [ASC|DESC](?o) ?s``), and the output order is verified
against an INDEPENDENT comparator written straight from the W3C spec
(SPARQL 1.1 §15.1 + operator mapping):

  unbound < blank nodes < IRIs < literals, and within literals ``<``
  is defined for numerics (by value, across integer/decimal/double),
  simple/xsd:string strings (codepoint), booleans and dateTimes.

Pairs the spec leaves implementation-defined (lang-tagged vs anything,
unknown datatypes, cross-type literals) are skipped — the gate checks
every comparable pair i<j for an inversion, not just adjacent rows, so
incomparable "spacers" cannot mask a violation.

A second check drives the top-k pushdown path: ``... LIMIT k`` must
equal the first k rows of the full sort (keys cover the whole row, so
the engine's total order leaves no ties — any drift means the
pushdown and the full sort disagree).
"""

import random
from fractions import Fraction

import pyarrow as pa
import pytest

EX = "http://ex.org/"
XSD = "http://www.w3.org/2001/XMLSchema#"

SUBJECTS = [f"<{EX}s{i}>" for i in range(5)]
PRED = f"<{EX}p>"


def _random_object(rng):
    r = rng.random()
    if r < 0.10:
        return f"_:b{rng.randint(0, 3)}"
    if r < 0.25:
        return f"<{EX}o{rng.randint(0, 5)}>"
    if r < 0.40:
        return '"%s"' % rng.choice(["", "a", "ab", "abc", "b", "Z"])
    if r < 0.48:
        return '"%s"@%s' % (rng.choice(["a", "b"]), rng.choice(["en", "fr"]))
    if r < 0.62:
        return f'"{rng.randint(-9, 20)}"^^<{XSD}integer>'
    if r < 0.72:
        return f'"{rng.randint(-40, 80) / 4}"^^<{XSD}decimal>'
    if r < 0.80:
        return f'"{rng.choice(["-1.5E0", "2.5E1", "4.0E-1", "0.0E0"])}"^^<{XSD}double>'
    if r < 0.87:
        return f'"{rng.choice(["true", "false"])}"^^<{XSD}boolean>'
    if r < 0.95:
        d = rng.randint(1, 28)
        h = rng.randint(0, 23)
        return f'"2024-03-{d:02d}T{h:02d}:00:00Z"^^<{XSD}dateTime>'
    return f'"x{rng.randint(0, 3)}"^^<{EX}dt>'


def _random_graph(rng, n):
    triples = set()
    while len(triples) < n:
        triples.add((rng.choice(SUBJECTS), PRED, _random_object(rng)))
    return sorted(triples)


# ---------------------------------------------------------------------------
# independent spec comparator: returns -1 / 0 / +1, or None (incomparable /
# implementation-defined)
# ---------------------------------------------------------------------------

_NUMERIC = {f"{XSD}integer", f"{XSD}decimal", f"{XSD}double", f"{XSD}float"}


def _parse_literal(t):
    """NT literal → (lexical, lang, datatype_iri)."""
    assert t.startswith('"')
    end = t.rindex('"')
    lex = t[1:end]
    rest = t[end + 1:]
    if rest.startswith("@"):
        return lex, rest[1:], None
    if rest.startswith("^^<"):
        return lex, None, rest[3:-1]
    return lex, None, None


def _lit_value(lex, dt):
    if dt in (f"{XSD}integer", f"{XSD}decimal"):
        return ("num", Fraction(lex))
    if dt in (f"{XSD}double", f"{XSD}float"):
        return ("num", Fraction(float(lex)))
    if dt == f"{XSD}boolean":
        return ("bool", lex == "true")
    if dt == f"{XSD}dateTime":
        return ("dt", lex)  # all generated with Z + same format: lexicographic
    if dt is None or dt == f"{XSD}string":
        return ("str", lex)
    return None  # unknown datatype: no spec `<`


def _spec_cmp(a, b):
    def category(t):
        if t is None or t == "":
            return 0
        if t.startswith("_:"):
            return 1
        if t.startswith("<"):
            return 2
        return 3

    ca, cb = category(a), category(b)
    if ca != cb:
        return -1 if ca < cb else 1
    if ca in (0,):
        return 0
    if ca in (1, 2):
        return None  # bnode/IRI internal order is implementation-defined
    la, lla, dta = _parse_literal(a)
    lb, llb, dtb = _parse_literal(b)
    if lla is not None or llb is not None:
        return None  # lang-tagged: `<` undefined
    va, vb = _lit_value(la, dta), _lit_value(lb, dtb)
    if va is None or vb is None or va[0] != vb[0]:
        return None  # unknown datatype or cross-type literal
    if va[1] == vb[1]:
        return 0
    return -1 if va[1] < vb[1] else 1


def _check_no_inversion(rows, desc):
    """All comparable pairs i<j must not be spec-inverted on ?o.
    (Tie-breaks among IRIs/bnodes are implementation-defined, so the
    ?s secondary key is covered by the determinism + LIMIT-prefix
    checks rather than a spec comparison.)"""
    sign = -1 if desc else 1
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            c = _spec_cmp(rows[i], rows[j])
            if c is not None and c != 0:
                assert sign * c <= 0, (
                    f"inversion at {i},{j}: {rows[i]!r} vs {rows[j]!r} "
                    f"(desc={desc})")


@pytest.mark.parametrize("seed", range(25))
def test_order_by_respects_spec_order(seed, ray_session):
    import ray.data as rd

    from sophia_rs_ray.sparql import select

    rng = random.Random(4200 + seed)
    triples = _random_graph(rng, rng.randint(20, 45))
    desc = rng.random() < 0.5
    key = "DESC(?o)" if desc else "?o"
    q = f"SELECT ?s ?o WHERE {{ ?s <{EX}p> ?o }} ORDER BY {key} ?s"

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    rows = select(q, ds).take_all()

    # permutation of the unordered solutions
    assert sorted((r["s"], r["o"]) for r in rows) == \
        sorted((t[0], t[2]) for t in triples)

    _check_no_inversion([r["o"] for r in rows], desc)

    # equal-?o groups must order ?s ascending by the engine's own rule
    # deterministically; verified via the LIMIT-prefix check below and
    # by re-running the same query (same input → same output order)
    rows2 = select(q, ds).take_all()
    assert rows == rows2, "ORDER BY output is nondeterministic"


@pytest.mark.parametrize("seed", range(12))
def test_order_by_limit_is_prefix_of_full_sort(seed, ray_session):
    """Drives the top-k pushdown against the full-sort path: with sort
    keys covering the whole row there are no ties, so LIMIT k must be
    byte-identical to the first k rows of the unbounded query."""
    import ray.data as rd

    from sophia_rs_ray.sparql import select

    rng = random.Random(6100 + seed)
    triples = _random_graph(rng, rng.randint(25, 50))
    desc = rng.random() < 0.5
    key = "DESC(?o)" if desc else "?o"
    k = rng.randint(1, 12)
    base = f"SELECT ?s ?o WHERE {{ ?s <{EX}p> ?o }} ORDER BY {key} ?s"

    ds = rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in triples], pa.large_string()),
        "p": pa.array([t[1] for t in triples], pa.large_string()),
        "o": pa.array([t[2] for t in triples], pa.large_string()),
    }))
    full = [(r["s"], r["o"]) for r in select(base, ds).take_all()]
    lim = [(r["s"], r["o"])
           for r in select(base + f" LIMIT {k}", ds).take_all()]
    assert lim == full[:min(k, len(full))], (
        f"LIMIT {k} disagrees with full sort prefix (desc={desc})")
