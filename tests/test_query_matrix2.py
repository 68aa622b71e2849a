"""More reference query families (sparql/src/test.rs): CONSTRUCT
templates (bnodes/collections/triple terms, generalized-triple
filtering, test.rs:2296-2345), the 14-case symmetric-description
DESCRIBE matrix (:2346-2456), BOUND (:2276-2292), disjoint-domain
UNION (:725-762), multi-aggregate and GROUP BY rows (:880-997)."""

import pyarrow as pa
import pytest

from sophia_rs_ray.c14n import isomorphic
from sophia_rs_ray.ntriples import parse_term_text
from sophia_rs_ray.sparql.run import construct, describe, select
from sophia_rs_ray.terms import format_term
from sophia_rs_ray.turtle import parse_trig, parse_turtle

from test_query_matrix import DATASET_101, DATASET_PPATH, _quads_table

PROLOG = "BASE <https://example.org/test> PREFIX : <x:> "


def _graph_of(out):
    """construct/describe result Dataset → list of (s,p,o) Terms."""
    return [(parse_term_text(r["s"]), parse_term_text(r["p"]),
             parse_term_text(r["o"])) for r in out.take_all()]


def _iso(out, expected_turtle: str) -> bool:
    want = [(s, p, o, None)
            for s, p, o in parse_turtle(PROLOG + expected_turtle)]
    got = [(s, p, o, None) for s, p, o in _graph_of(out)]
    # generalized (Sophia-C14N) mode: RDF 1.2 triple terms allowed
    return isomorphic(got, want, strict=False)


CONSTRUCT_CASES = [
    ("CONSTRUCT { <x:s> <x:p> <x:o> } {}",
     "<x:s> <x:p> <x:o>."),
    ("CONSTRUCT { [] a ?o } { VALUES ?o {1 2} }",
     "_:b1 a 1. _:b2 a 2."),
    ("""CONSTRUCT {
          <x:ALL> <x:value> (?s ?p ?o).
          <x:TRIPLE_TERM> <x:value> <<( ?s ?p ?o )>>.
          ?s ?p ?o.
        } WHERE {
          VALUES ?s {<x:s> "s"}
          VALUES ?p {<x:p> "p"}
          VALUES ?o {<x:o> "o"}
        }""",
     """<x:ALL> <x:value>
          (<x:s> <x:p> <x:o>),
          (<x:s> <x:p> "o"  ),
          (<x:s> "p"   <x:o>),
          (<x:s> "p"   "o"  ),
          ("s"   <x:p> <x:o>),
          ("s"   <x:p> "o"  ),
          ("s"   "p"   <x:o>),
          ("s"   "p"   "o"  ).
        <x:TRIPLE_TERM> <x:value>
          <<( <x:s> <x:p> <x:o> )>>,
          <<( <x:s> <x:p> "o"   )>>.
        <x:s> <x:p> <x:o>, "o"."""),
]


@pytest.mark.parametrize("query,exp", CONSTRUCT_CASES,
                         ids=["simple", "bnodes", "generalized-filter"])
def test_construct(query, exp, ray_session):
    ds = _quads_table(DATASET_PPATH)
    out = construct(PROLOG + query, ds)
    assert _iso(out, exp)


DESCRIBE_CASES = [
    (":a :b :c. :c :d :e, :e2. :e :f :g. :g :h :a.",
     "DESCRIBE :z", ""),
    (":a :b :c. :c :d :e, :e2. :e :f :g. :g :h :a.",
     "DESCRIBE :c", ":a :b :c. :c :d :e, :e2."),
    (":a :b _:c. _:c :d :e. :e :f _:g. _:g :h :i. :i :j :a.",
     "DESCRIBE :e", ":a :b _:c. _:c :d :e. :e :f _:g. _:g :h :i."),
    (":a :b _:c. _:c :d _:e. _:e :f :g. :g :h _:i. _:i :j _:k. "
     "_:k :l :m. :m :n :a.",
     "DESCRIBE :g",
     ":a :b _:c. _:c :d _:e. _:e :f :g. :g :h _:i. _:i :j _:k. _:k :l :m."),
    (":a :b (:c :d _:e).   _:e :f :g.   :d :h (:i :j).   :j :k :l.",
     "DESCRIBE :d",
     ":a :b (:c :d _:e).   _:e :f :g.   :d :h (:i :j)."),
    (":a :b :c {| :d :e {| :f :g |} |}.    "
     ":c :h :i {| :j :k {| :l :m |} |}.   :i :n :a.",
     "DESCRIBE :c",
     ":a :b :c {| :d :e {| :f :g |} |}.    :c :h :i {| :j :k {| :l :m |} |}."),
    (":a :b :c ~ :r1 {| :d :e ~ :r2 {| :f :g |} |}.    "
     ":c :h :i ~ :r3 {| :j :k ~ :r4 {| :l :m |} |}.   :i :n :a.",
     "DESCRIBE :c",
     ":a :b :c ~ :r1 .    :c :h :i ~ :r3 ."),
    (":a :b :c.   :c :d :e.   :f :g <<(:c :h :i)>>.",
     "DESCRIBE :c", ":a :b :c.   :c :d :e."),
    (":a :b <<(_:c :d :e)>>. _:c :f :g. :g :h :i.",
     "DESCRIBE :a", ":a :b <<(_:c :d :e)>>. _:c :f :g."),
    (":a :b _:c. _:c :d _:e. _:e :f :g. :g :h :a.",
     "DESCRIBE ?o { ?s :b ?o }", ":a :b _:c. _:c :d _:e. _:e :f :g."),
    (":a :p _:b. _:b :c :d.   :e :p _:f. :g :h _:f.   :i :j :k.",
     "DESCRIBE ?s { ?s :p ?o }",
     ":a :p _:b. _:b :c :d.   :e :p _:f. :g :h _:f."),
    (":a :b :c. :c :d :e. :e :f :g. :g :h :i. :i :j :k. :k :d :l. "
     ":l :m :n.",
     "DESCRIBE ?s ?o { ?s :d ?o }",
     ":a :b :c. :c :d :e. :e :f :g.           :i :j :k. :k :d :l. :l :m :n."),
    (":a :b :c. GRAPH :g1 { :a :d :e }",
     "DESCRIBE :a", ":a :b :c."),
    (":a :b :c. GRAPH :g1 { :a :d :e } GRAPH :g2 { :a :f :g } "
     "GRAPH :g3 { :a :h :i }",
     "DESCRIBE :a FROM :g1 FROM :g3", ":a :d :e; :h :i."),
]


@pytest.mark.parametrize("data,query,exp", DESCRIBE_CASES,
                         ids=[q[9:45] for _, q, _ in DESCRIBE_CASES])
def test_describe(data, query, exp, ray_session):
    import ray.data as rd

    quads = parse_trig(PROLOG + "\n" + data)
    cols = {"s": [], "p": [], "o": [], "g": []}
    for s, p, o, g in quads:
        cols["s"].append(format_term(s))
        cols["p"].append(format_term(p))
        cols["o"].append(format_term(o))
        cols["g"].append(format_term(g) if g is not None else "")
    ds = rd.from_arrow(pa.table(
        {k: pa.array(v, pa.large_string()) for k, v in cols.items()}))
    out = describe(PROLOG + query, ds)
    assert _iso(out, exp)


BOUND_CASES = [
    ("BIND(42 as ?x)", True),
    ("", False),
    ("BIND(42 as ?x2)", False),
    ("BIND(42/0 as ?x)", False),
]


@pytest.mark.parametrize("body,exp", BOUND_CASES,
                         ids=["bound", "nothing", "other-var", "error"])
def test_bound(body, exp, ray_session):
    ds = _quads_table(DATASET_101)
    rows = select(f"SELECT (BOUND(?x) as ?b) {{ {body} }}", ds).take_all()
    assert len(rows) == 1
    want = ('"true"' if exp else '"false"') + \
        "^^<http://www.w3.org/2001/XMLSchema#boolean>"
    assert rows[0]["b"] == want


def test_union_disjoint_domains(ray_session):
    """test.rs:725-762 — UNION of patterns with disjoint variables:
    each solution binds one var and leaves the other unbound."""
    ds = _quads_table(DATASET_101)
    rows = select(
        "PREFIX s: <http://schema.org/> "
        "SELECT ?p ?e { { ?p a s:Person } UNION { ?e a s:Event } }",
        ds).take_all()
    assert len(rows) == 2
    got = sorted(((r.get("p"), r.get("e")) for r in rows),
                 key=lambda t: (t[0] is not None, t[0] or "", t[1] or ""))
    assert got[0][0] is None and got[0][1].startswith("_:")
    assert got[1][0] == "<https://example.org/test#a>" \
        and got[1][1] is None


def test_count_in_graph(ray_session):
    """test.rs:1025-1071 — GRAPH ?g over an aggregating subquery:
    per-graph grouping; FROM NAMED declares graphs so even an empty
    one yields its COUNT(*) = 0 row."""
    ds = _quads_table(DATASET_101)
    got = select(
        "SELECT (iri(?g) as ?h) ?c "
        "{ GRAPH ?g { SELECT (COUNT(*) as ?c) { ?s ?p ?o } } } "
        "ORDER BY ?g", ds).take_all()
    INT = '^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert [(r["h"], r["c"]) for r in got] == [
        (None, f'"1"{INT}'),
        ("<https://example.org/test#g>", f'"2"{INT}')]
    got = select(
        "BASE <https://example.org/test> SELECT ?g ?c "
        "FROM NAMED <#g> FROM NAMED <#h> "
        "{ GRAPH ?g { SELECT (COUNT(*) as ?c) { ?s ?p ?o } } } "
        "ORDER BY ?g", ds).take_all()
    assert [(r["g"], r["c"]) for r in got] == [
        ("<https://example.org/test#g>", f'"2"{INT}'),
        ("<https://example.org/test#h>", f'"0"{INT}')]


def test_multiple_aggregates(ray_session):
    """test.rs:880-914 — six aggregates over one implicit group."""
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "s": pa.array([], pa.large_string()),
        "p": pa.array([], pa.large_string()),
        "o": pa.array([], pa.large_string())}))
    rows = select("""
        SELECT (count(?y) as ?cy) (count(distinct ?y) as ?cdy)
               (avg(?y) as ?ay) (avg(distinct ?y) as ?ady)
               (min(?y) as ?miny) (max(?y) as ?maxy)
        { VALUES (?x ?y) { (1 10) (2 14) (1 16) (2 16) (2 12) (1 10) (1 13) } }
        """, empty).take_all()
    assert len(rows) == 1
    vals = {k: parse_term_text(v)[1] for k, v in rows[0].items()}
    assert vals == {"cy": "7", "cdy": "5", "ay": "13.0", "ady": "13.0",
                    "miny": "10", "maxy": "16"}


def test_group_by_rows(ray_session):
    """test.rs:916-997 — GROUP BY ?x with six aggregates per group."""
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "s": pa.array([], pa.large_string()),
        "p": pa.array([], pa.large_string()),
        "o": pa.array([], pa.large_string())}))
    rows = select("""
        SELECT ?x (count(?y) as ?cy) (count(distinct ?y) as ?cdy)
               (avg(?y) as ?ay) (avg(distinct ?y) as ?ady)
               (min(?y) as ?miny) (max(?y) as ?maxy)
        { VALUES (?x ?y) { (1 10) (2 14) (1 16) (2 16) (2 12) (1 10) (1 13) } }
        GROUP BY ?x ORDER BY ?x
        """, empty).take_all()
    got = [[parse_term_text(r[k])[1] for k in
            ("x", "cy", "cdy", "ay", "ady", "miny", "maxy")]
           for r in rows]
    assert got == [["1", "4", "3", "12.25", "13.0", "10", "16"],
                   ["2", "3", "3", "14.0", "14.0", "12", "16"]]
