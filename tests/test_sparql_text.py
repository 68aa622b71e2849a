"""SPARQL text queries end-to-end: parse → algebra → Dataset, with
results checked against hand-computed expectations on a small graph
(reference behavior: sparql/src/test.rs query-string → result-list
tables)."""

import pyarrow as pa
import pytest

from sophia_rs_ray.sparql import (
    SparqlParseError, ask, construct, parse_query, select,
)

EX = "http://example.org/"
FOAF = "http://xmlns.com/foaf/0.1/"

TRIPLES = [
    (f"<{EX}alice>", f"<{FOAF}name>", '"Alice"'),
    (f"<{EX}alice>", f"<{FOAF}age>",
     '"30"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    (f"<{EX}alice>", f"<{FOAF}knows>", f"<{EX}bob>"),
    (f"<{EX}bob>", f"<{FOAF}name>", '"Bob"'),
    (f"<{EX}bob>", f"<{FOAF}age>",
     '"25"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    (f"<{EX}bob>", f"<{FOAF}knows>", f"<{EX}carol>"),
    (f"<{EX}carol>", f"<{FOAF}name>", '"Carol"'),
    (f"<{EX}alice>",
     "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
     f"<{FOAF}Person>"),
]


@pytest.fixture()
def graph(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in TRIPLES], pa.large_string()),
        "p": pa.array([t[1] for t in TRIPLES], pa.large_string()),
        "o": pa.array([t[2] for t in TRIPLES], pa.large_string()),
    }))


def rows(ds):
    return sorted(tuple(sorted(r.items())) for r in ds.take_all())


def test_select_bgp(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?n WHERE {{ ?x foaf:knows ?y . ?y foaf:name ?n }}
    """, graph)
    got = sorted(r["n"] for r in out.take_all())
    assert got == ['"Bob"', '"Carol"']


def test_select_filter_expr(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?a WHERE {{
            ?x foaf:age ?a .
            FILTER (?a > 26 && BOUND(?x))
        }}
    """, graph)
    got = [(r["x"], r["a"]) for r in out.take_all()]
    assert got == [(f"<{EX}alice>",
                    '"30"^^<http://www.w3.org/2001/XMLSchema#integer>')]


def test_select_optional_and_order(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?other WHERE {{
            ?x foaf:name ?n .
            OPTIONAL {{ ?x foaf:knows ?other }}
        }} ORDER BY ?x
    """, graph)
    got = [(r["x"], r["other"]) for r in out.take_all()]
    assert got == [
        (f"<{EX}alice>", f"<{EX}bob>"),
        (f"<{EX}bob>", f"<{EX}carol>"),
        (f"<{EX}carol>", None),
    ]


def test_select_union_distinct_limit(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT DISTINCT ?p WHERE {{
            {{ <{EX}alice> ?p ?o }} UNION {{ <{EX}bob> ?p ?o }}
        }} ORDER BY ?p LIMIT 3
    """, graph)
    got = [r["p"] for r in out.take_all()]
    assert got == [
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
        f"<{FOAF}age>", f"<{FOAF}knows>"]


def test_select_group_agg(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x (COUNT(*) AS ?cnt) WHERE {{ ?x ?p ?o }}
        GROUP BY ?x ORDER BY ?x
    """, graph)
    got = [(r["x"], r["cnt"]) for r in out.take_all()]
    it = "^^<http://www.w3.org/2001/XMLSchema#integer>"
    assert got == [(f"<{EX}alice>", f'"4"{it}'),
                   (f"<{EX}bob>", f'"3"{it}'),
                   (f"<{EX}carol>", f'"1"{it}')]


def test_select_bind_and_values(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?up WHERE {{
            VALUES ?x {{ <{EX}alice> <{EX}bob> }}
            ?x foaf:name ?n .
            BIND (UCASE(STR(?n)) AS ?up)
        }} ORDER BY ?x
    """, graph)
    got = [(r["x"], r["up"]) for r in out.take_all()]
    assert got == [(f"<{EX}alice>", '"ALICE"'), (f"<{EX}bob>", '"BOB"')]


def test_minus_and_not_exists(graph):
    q = f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x WHERE {{
            ?x foaf:name ?n .
            FILTER NOT EXISTS {{ ?x foaf:knows ?y }}
        }}
    """
    got = [r["x"] for r in select(q, graph).take_all()]
    assert got == [f"<{EX}carol>"]

    q2 = f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x WHERE {{
            ?x foaf:name ?n .
            MINUS {{ ?x foaf:age ?a }}
        }}
    """
    got2 = [r["x"] for r in select(q2, graph).take_all()]
    assert got2 == [f"<{EX}carol>"]


def test_property_path_plus(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?o WHERE {{ <{EX}alice> foaf:knows+ ?o }}
    """, graph)
    got = sorted(r["o"] for r in out.take_all())
    assert got == [f"<{EX}bob>", f"<{EX}carol>"]


def test_ask(graph):
    assert ask(f"ASK {{ <{EX}alice> <{FOAF}knows> ?x }}", graph) is True
    assert ask(f"ASK {{ <{EX}carol> <{FOAF}knows> ?x }}", graph) is False


def test_construct(graph):
    out = construct(f"""
        PREFIX foaf: <{FOAF}>
        CONSTRUCT {{ ?y <{EX}knownBy> ?x }}
        WHERE {{ ?x foaf:knows ?y }}
    """, graph)
    got = sorted((r["s"], r["p"], r["o"]) for r in out.take_all())
    assert got == [
        (f"<{EX}bob>", f"<{EX}knownBy>", f"<{EX}alice>"),
        (f"<{EX}carol>", f"<{EX}knownBy>", f"<{EX}bob>"),
    ]


def test_construct_bnode_template(graph):
    out = construct(f"""
        PREFIX foaf: <{FOAF}>
        CONSTRUCT {{ _:m <{EX}of> ?x . _:m <{EX}label> ?n }}
        WHERE {{ ?x foaf:name ?n }}
    """, graph)
    got = out.take_all()
    # 2 triples per solution; the _:m label is shared within a solution
    # and distinct across solutions
    assert len(got) == 6
    by_s = {}
    for r in got:
        by_s.setdefault(r["s"], set()).add(r["p"])
    assert len(by_s) == 3
    for preds in by_s.values():
        assert preds == {f"<{EX}of>", f"<{EX}label>"}


def test_parse_errors():
    with pytest.raises(SparqlParseError):
        parse_query("SELECT ?x WHERE { ?x }")
    with pytest.raises(SparqlParseError):
        parse_query("FROB ?x")
    with pytest.raises(SparqlParseError):
        parse_query("SELECT ?x WHERE { ?x <p> ?y } trailing")
    with pytest.raises(SparqlParseError):
        parse_query("PREFIX f <x>\nSELECT ?x WHERE { ?x f:p ?y }")


def test_parse_forms():
    q = parse_query("SELECT DISTINCT ?x WHERE { ?x <urn:p> 3.5 } LIMIT 2")
    assert q.vars == ["x"]
    q2 = parse_query('ASK { ?x <urn:p> "lit"@en }')
    assert q2.__class__.__name__ == "AskQuery"


GRAPHS = [
    ("<urn:x>", "<urn:p>", '"default"', ""),
    ("<urn:x>", "<urn:p>", '"one"', "<urn:g1>"),
    ("<urn:y>", "<urn:p>", '"two"', "<urn:g2>"),
]


@pytest.fixture()
def quadset(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in GRAPHS], pa.large_string()),
        "p": pa.array([t[1] for t in GRAPHS], pa.large_string()),
        "o": pa.array([t[2] for t in GRAPHS], pa.large_string()),
        "g": pa.array([t[3] for t in GRAPHS], pa.large_string()),
    }))


def test_default_graph_only_bgp(quadset):
    got = select("SELECT ?o WHERE { ?s <urn:p> ?o }", quadset).take_all()
    assert [r["o"] for r in got] == ['"default"']


def test_graph_var(quadset):
    out = select("""
        SELECT ?g ?o WHERE { GRAPH ?g { ?s <urn:p> ?o } } ORDER BY ?g
    """, quadset)
    got = [(r["g"], r["o"]) for r in out.take_all()]
    assert got == [("<urn:g1>", '"one"'), ("<urn:g2>", '"two"')]


def test_graph_const(quadset):
    out = select("""
        SELECT ?o WHERE { GRAPH <urn:g2> { ?s <urn:p> ?o } }
    """, quadset)
    assert [r["o"] for r in out.take_all()] == ['"two"']


def test_graph_join_default(quadset):
    # join a named-graph binding with a default-graph pattern on ?s
    out = select("""
        SELECT ?o ?d WHERE {
            GRAPH <urn:g1> { ?s <urn:p> ?o }
            ?s <urn:p> ?d
        }
    """, quadset)
    got = [(r["o"], r["d"]) for r in out.take_all()]
    assert got == [('"one"', '"default"')]


def test_path_inverse(graph):
    # <carol> ^knows ?x  ⟺  ?x knows <carol>  → bob
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x WHERE {{ <{EX}carol> ^foaf:knows ?x }}
    """, graph)
    assert [r["x"] for r in out.take_all()] == [f"<{EX}bob>"]


def test_path_sequence(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?n WHERE {{ <{EX}alice> foaf:knows/foaf:name ?n }}
    """, graph)
    assert [r["n"] for r in out.take_all()] == ['"Bob"']


def test_path_alternative(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?v WHERE {{ <{EX}bob> foaf:name|foaf:age ?v }}
    """, graph)
    got = sorted(r["v"] for r in out.take_all())
    assert got == ['"25"^^<http://www.w3.org/2001/XMLSchema#integer>',
                   '"Bob"']


def test_path_seq_of_alt(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?v WHERE {{ <{EX}alice> foaf:knows/(foaf:name|foaf:knows) ?v }}
    """, graph)
    got = sorted(r["v"] for r in out.take_all())
    assert got == ['"Bob"', f"<{EX}carol>"]


def test_describe_const_and_var(graph):
    from sophia_rs_ray.sparql import describe

    # symmetric bounded description (test.rs test_describe semantics):
    # triples where the resource is subject OR object
    out = describe(f"DESCRIBE <{EX}carol>", graph)
    got = {(r["s"], r["p"], r["o"]) for r in out.take_all()}
    assert got == {(f"<{EX}carol>", f"<{FOAF}name>", '"Carol"'),
                   (f"<{EX}bob>", f"<{FOAF}knows>", f"<{EX}carol>")}

    out2 = describe(f"""
        PREFIX foaf: <{FOAF}>
        DESCRIBE ?x WHERE {{ ?x foaf:age ?a . FILTER (?a < 26) }}
    """, graph)
    got2 = {(r["s"], r["p"], r["o"]) for r in out2.take_all()}
    assert got2 == {
        (f"<{EX}bob>", f"<{FOAF}name>", '"Bob"'),
        (f"<{EX}bob>", f"<{FOAF}age>",
         '"25"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        (f"<{EX}bob>", f"<{FOAF}knows>", f"<{EX}carol>"),
        (f"<{EX}alice>", f"<{FOAF}knows>", f"<{EX}bob>"),
    }


def test_hash_fns_and_cast(graph):
    import hashlib

    out = select(f"""
        PREFIX foaf: <{FOAF}>
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?h ?d WHERE {{
            <{EX}alice> foaf:name ?n .
            BIND (MD5(?n) AS ?h)
            BIND (xsd:double(<{EX}alice> = <{EX}alice>) AS ?d)
        }}
    """, graph)
    r = out.take_all()[0]
    assert r["h"] == f'"{hashlib.md5(b"Alice").hexdigest()}"'
    assert r["d"] == '"1.0E0"^^<http://www.w3.org/2001/XMLSchema#double>' \
        or r["d"].startswith('"1')


def test_now_pinned(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?t WHERE {{ <{EX}alice> foaf:name ?n . BIND (NOW() AS ?t) }}
    """, graph)
    r = out.take_all()[0]
    assert r["t"] == ('"2000-01-01T00:00:00Z"'
                      '^^<http://www.w3.org/2001/XMLSchema#dateTime>')


def test_dir_lang_functions(ray_session):
    import ray.data as rd

    nt = rd.from_arrow(pa.table({
        "s": pa.array(["<urn:a>"], pa.large_string()),
        "p": pa.array(["<urn:p>"], pa.large_string()),
        "o": pa.array(['"shalom"@he--rtl'], pa.large_string())}))
    out = select("""
        SELECT ?ld ?h ?dt WHERE {
            ?s <urn:p> ?o .
            BIND (LANGDIR(?o) AS ?ld)
            BIND (HASLANGDIR(?o) AS ?h)
            BIND (DATATYPE(?o) AS ?dt)
        }
    """, nt)
    r = out.take_all()[0]
    # LANGDIR returns the base direction alone (function.rs:60;
    # test.rs: langDir("chat"@en--ltr) = "ltr")
    assert r["ld"] == '"rtl"'
    assert r["h"] == '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'
    assert r["dt"] == \
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#dirLangString>"
    out2 = select("""
        SELECT ?x WHERE {
            ?s <urn:p> ?o . BIND (STRLANGDIR("hi", "en", "ltr") AS ?x)
        }
    """, nt)
    assert out2.take_all()[0]["x"] == '"hi"@en--ltr'


def test_values_multi_var(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?expect ?n WHERE {{
            VALUES (?x ?expect) {{
                (<{EX}alice> "Alice") (<{EX}bob> "Bob")
            }}
            ?x foaf:name ?n .
        }} ORDER BY ?x
    """, graph)
    got = [(r["x"], r["expect"], r["n"]) for r in out.take_all()]
    assert got == [(f"<{EX}alice>", '"Alice"', '"Alice"'),
                   (f"<{EX}bob>", '"Bob"', '"Bob"')]


def test_bnode_fn(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?b WHERE {{ ?x foaf:name ?n . BIND (BNODE() AS ?b) }}
    """, graph)
    got = [r["b"] for r in out.take_all()]
    assert len(got) == 3 and len(set(got)) == 3
    assert all(b.startswith("_:") for b in got)


def test_path_zero_or_one(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?o WHERE {{ <{EX}alice> foaf:knows? ?o }}
    """, graph)
    got = sorted(r["o"] for r in out.take_all())
    assert got == [f"<{EX}alice>", f"<{EX}bob>"]


def test_from_named_clauses(quadset):
    # FROM <urn:g1> merges g1 into the query default graph
    out = select("""
        SELECT ?o FROM <urn:g1> WHERE { ?s <urn:p> ?o }
    """, quadset)
    assert [r["o"] for r in out.take_all()] == ['"one"']
    # FROM NAMED restricts which graphs GRAPH ?g ranges over
    out2 = select("""
        SELECT ?g ?o FROM NAMED <urn:g2>
        WHERE { GRAPH ?g { ?s <urn:p> ?o } }
    """, quadset)
    got = [(r["g"], r["o"]) for r in out2.take_all()]
    assert got == [("<urn:g2>", '"two"')]


def test_path_plus_var_subject(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?o WHERE {{ ?x foaf:knows+ ?o }} ORDER BY ?x ?o
    """, graph)
    got = [(r["x"], r["o"]) for r in out.take_all()]
    assert got == [
        (f"<{EX}alice>", f"<{EX}bob>"),
        (f"<{EX}alice>", f"<{EX}carol>"),
        (f"<{EX}bob>", f"<{EX}carol>"),
    ]


def test_path_plus_var_subject_joined(graph):
    # closure pairs must join with other patterns on the subject var
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?n ?o WHERE {{ ?x foaf:knows+ ?o . ?x foaf:name ?n }}
        ORDER BY ?n ?o
    """, graph)
    got = [(r["n"], r["o"]) for r in out.take_all()]
    assert got == [
        ('"Alice"', f"<{EX}bob>"),
        ('"Alice"', f"<{EX}carol>"),
        ('"Bob"', f"<{EX}carol>"),
    ]


def test_bnode_property_list(graph):
    # object-position list: who knows someone named Carol
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x WHERE {{ ?x foaf:knows [ foaf:name "Carol" ] }}
    """, graph)
    assert [r["x"] for r in out.take_all()] == [f"<{EX}bob>"]
    # subject-position list
    out2 = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?n WHERE {{ [ foaf:age 25 ; foaf:name ?n ] }}
    """, graph)
    assert [r["n"] for r in out2.take_all()] == ['"Bob"']


def test_collection_pattern(ray_session):
    import ray.data as rd

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = [
        ("<urn:s>", "<urn:vals>", "_:l1"),
        ("_:l1", f"<{RDF}first>", '"a"'),
        ("_:l1", f"<{RDF}rest>", "_:l2"),
        ("_:l2", f"<{RDF}first>", '"b"'),
        ("_:l2", f"<{RDF}rest>", f"<{RDF}nil>"),
    ]
    nt = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.large_string()),
        "p": pa.array([r[1] for r in rows], pa.large_string()),
        "o": pa.array([r[2] for r in rows], pa.large_string())}))
    out = select('SELECT ?x ?y WHERE { ?s <urn:vals> ( ?x ?y ) }', nt)
    assert [(r["x"], r["y"]) for r in out.take_all()] == [('"a"', '"b"')]
    # constant collection that is NOT in the graph matches nothing
    out2 = select('SELECT ?s WHERE { ?s <urn:vals> ( "a" "z" ) }', nt)
    assert out2.take_all() == []


# ---------------------------------------------------------------------------
# round-2: general property paths (negated sets, free-endpoint closures)
# ---------------------------------------------------------------------------

@pytest.fixture()
def path_graph(ray_session):
    import ray.data as rd

    rows = []

    def add(s, p, o):
        rows.append((f"<urn:{s}>", f"<urn:{p}>", f"<urn:{o}>"))

    for u, v in (("a", "b"), ("b", "c"), ("c", "d")):
        add(u, "knows", v)
    add("a", "likes", "x")
    add("b", "hates", "y")
    return rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.large_string()),
        "p": pa.array([r[1] for r in rows], pa.large_string()),
        "o": pa.array([r[2] for r in rows], pa.large_string())}))


def _pairs(ds):
    return sorted((r.get("s"), r.get("o")) for r in ds.take_all())


def test_path_negated_set(path_graph):
    out = select("SELECT ?s ?o WHERE { ?s !<urn:knows> ?o }", path_graph)
    assert _pairs(out) == [("<urn:a>", "<urn:x>"), ("<urn:b>", "<urn:y>")]


def test_path_negated_set_mixed(path_graph):
    # !(likes|^hates): forward minus likes, union inverse minus hates
    out = select("SELECT ?s ?o WHERE { ?s !(<urn:likes>|^<urn:hates>) ?o }",
                 path_graph)
    assert len(_pairs(out)) == 8


def test_path_star_free_subject(path_graph):
    # zero-length identity over every term + the plus closure
    out = select("SELECT ?s ?o WHERE { ?s <urn:knows>* ?o }", path_graph)
    got = _pairs(out)
    assert ("<urn:a>", "<urn:a>") in got      # identity
    assert ("<urn:x>", "<urn:x>") in got      # identity of a non-subject
    assert ("<urn:a>", "<urn:d>") in got      # 3-hop closure
    assert len(got) == 12


def test_path_plus_free_subject(path_graph):
    out = select("SELECT ?s ?o WHERE { ?s <urn:knows>+ ?o }", path_graph)
    assert len(_pairs(out)) == 6  # a→{b,c,d}, b→{c,d}, c→{d}


def test_path_nested_alt_plus(path_graph):
    out = select(
        "SELECT ?o WHERE { <urn:a> (<urn:knows>|<urn:likes>)+ ?o }",
        path_graph)
    assert sorted(r["o"] for r in out.take_all()) == \
        ["<urn:b>", "<urn:c>", "<urn:d>", "<urn:x>"]


def test_path_seq_with_opt(path_graph):
    out = select("SELECT ?o WHERE { <urn:a> <urn:knows>/<urn:knows>? ?o }",
                 path_graph)
    assert sorted(r["o"] for r in out.take_all()) == ["<urn:b>", "<urn:c>"]


def test_path_inverse_plus(path_graph):
    # constant OBJECT seeds the inverted closure
    out = select("SELECT ?s WHERE { ?s <urn:knows>+ <urn:d> }", path_graph)
    assert sorted(r["s"] for r in out.take_all()) == \
        ["<urn:a>", "<urn:b>", "<urn:c>"]


def test_path_star_joins_with_bgp(path_graph):
    # closure bindings must join with ordinary patterns
    out = select("""
        SELECT ?s ?y WHERE { ?s <urn:knows>+ ?m . ?m <urn:hates> ?y }
    """, path_graph)
    assert _pairs(select(
        "SELECT ?s ?o WHERE { ?s <urn:knows>+ ?o }", path_graph))
    rows = sorted((r["s"], r["y"]) for r in out.take_all())
    assert rows == [("<urn:a>", "<urn:y>")]


# -- SERVICE federation (sparql_client parity; resolver-injected) -----

def test_service_join(graph):
    from sophia_rs_ray.sparql.algebra import set_service_resolver
    from sophia_rs_ray.sparql.results import bindings_to_json

    calls = []

    def resolver(endpoint, query):
        calls.append((endpoint, query))
        # remote endpoint knows emails for alice/bob
        return bindings_to_json([
            {"x": f"<{EX}alice>", "mail": '"alice@example.org"'},
            {"x": f"<{EX}bob>", "mail": '"bob@example.org"'},
        ], vars=["x", "mail"])

    set_service_resolver(resolver)
    try:
        out = select(f"""
            PREFIX foaf: <{FOAF}>
            SELECT ?n ?mail WHERE {{
                ?x foaf:name ?n .
                SERVICE <http://remote.example/sparql> {{
                    ?x foaf:mbox ?mail
                }}
            }}
        """, graph)
        got = rows(out)
    finally:
        set_service_resolver(None)
    assert got == [
        (("mail", '"alice@example.org"'), ("n", '"Alice"')),
        (("mail", '"bob@example.org"'), ("n", '"Bob"')),
    ]
    (endpoint, query), = calls
    assert endpoint == "http://remote.example/sparql"
    # PNAME expanded, group forwarded verbatim as SELECT *
    assert query == (
        "SELECT * WHERE { ?x <http://xmlns.com/foaf/0.1/mbox> ?mail }")


def test_service_silent_failure_is_identity(graph):
    from sophia_rs_ray.sparql.algebra import set_service_resolver

    def resolver(endpoint, query):
        raise OSError("endpoint down")

    set_service_resolver(resolver)
    try:
        out = select(f"""
            PREFIX foaf: <{FOAF}>
            SELECT ?n ?mail WHERE {{
                ?x foaf:name ?n .
                SERVICE SILENT <http://remote.example/sparql> {{
                    ?x foaf:mbox ?mail
                }}
            }}
        """, graph)
        got = sorted((r["n"], r["mail"]) for r in out.take_all())
    finally:
        set_service_resolver(None)
    # every name survives, mail unbound
    assert got == [('"Alice"', None), ('"Bob"', None), ('"Carol"', None)]


def test_service_loud_failure_raises(graph):
    from sophia_rs_ray.sparql.algebra import set_service_resolver

    set_service_resolver(None)
    with pytest.raises(Exception):
        select(f"""
            SELECT ?mail WHERE {{
                SERVICE <http://remote.example/sparql> {{
                    ?x <{FOAF}mbox> ?mail
                }}
            }}
        """, graph).take_all()


def test_service_variable_endpoint_rejected(graph):
    with pytest.raises(SparqlParseError):
        parse_query("SELECT ?m WHERE { SERVICE ?e { ?x ?p ?m } }")


# -- RDF 1.2 triple terms / reified triple patterns --------------------

@pytest.fixture()
def reified_graph(ray_session):
    """Graph built from annotated Turtle: the annotation expands to
    rdf:reifies + annotation triples (turtle corpus semantics)."""
    import ray.data as rd

    from sophia_rs_ray.terms import format_term
    from sophia_rs_ray.turtle import parse_turtle

    trs = parse_turtle("""
        PREFIX : <http://example.org/>
        :alice :knows :bob ~ :r1 {| :since "2020" |}.
        :bob :knows :carol {| :since "2021" |}.
    """)
    rows_ = [(format_term(s), format_term(p), format_term(o))
             for (s, p, o) in trs]
    return rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows_], pa.large_string()),
        "p": pa.array([r[1] for r in rows_], pa.large_string()),
        "o": pa.array([r[2] for r in rows_], pa.large_string()),
    }))


def test_constant_triple_term_object(reified_graph):
    out = select(f"""
        PREFIX : <{EX}>
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?r WHERE {{
            ?r rdf:reifies <<( :alice :knows :bob )>>
        }}
    """, reified_graph)
    assert [r["r"] for r in out.take_all()] == [f"<{EX}r1>"]


def test_reified_triple_pattern_named_reifier(reified_graph):
    out = select(f"""
        PREFIX : <{EX}>
        SELECT ?r ?since WHERE {{
            << :alice :knows :bob ~ ?r >> :since ?since
        }}
    """, reified_graph)
    got = [(r["r"], r["since"]) for r in out.take_all()]
    assert got == [(f"<{EX}r1>", '"2020"')]


def test_reified_triple_pattern_anonymous(reified_graph):
    out = select(f"""
        PREFIX : <{EX}>
        SELECT ?since WHERE {{
            << :bob :knows :carol >> :since ?since
        }}
    """, reified_graph)
    assert sorted(r["since"] for r in out.take_all()) == ['"2021"']


def test_triple_term_vars(ray_session):
    # variables INSIDE a triple-term pattern destructure the matched
    # term (SPARQL 1.2; algebra.TripleTermPattern)
    import ray.data as rd

    tt = '<<( <x:a> <x:b> <x:c> )>>'
    nt = rd.from_arrow(pa.table({
        "s": pa.array(["<x:r>"], pa.large_string()),
        "p": pa.array(["<x:q>"], pa.large_string()),
        "o": pa.array([tt], pa.large_string())}))
    out = select("SELECT ?a WHERE { ?r ?p <<( ?a <x:b> <x:c> )>> }", nt)
    assert out.take_all() == [{"a": "<x:a>"}]
    # …but the reified shorthand << … >> still requires constants
    with pytest.raises(SparqlParseError):
        parse_query("SELECT ?r WHERE { << ?a <x:b> <x:c> >> ?p ?r }")


# --- SubSelect (SPARQL 1.1 §18.2.2.11; spargebra desugars `{ SELECT … }`
# into nested Project/Group algebra, executed by the same dispatch at
# sparql/src/exec.rs:125-180) -------------------------------------------------

def test_subselect_aggregate_join(graph):
    """Outer BGP joined against an aggregating subquery on the shared
    projected variable."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?cnt WHERE {{
            ?x foaf:name ?n .
            {{ SELECT ?x (COUNT(*) AS ?cnt)
               WHERE {{ ?x foaf:knows ?y }} GROUP BY ?x }}
        }}
    """, graph)
    got = sorted((r["x"], r["cnt"]) for r in out.take_all())
    one = '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert got == [(f"<{EX}alice>", one), (f"<{EX}bob>", one)]


def test_subselect_scoping_hides_unprojected_vars(graph):
    """Variables not projected by the subquery are out of scope outside:
    the outer ?y must NOT join with the subquery's internal ?y."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?y WHERE {{
            {{ SELECT ?x WHERE {{ ?x foaf:knows ?y }} }}
            ?x foaf:age ?y .
        }}
    """, graph)
    got = sorted((r["x"], r["y"]) for r in out.take_all())
    xsd_int = "<http://www.w3.org/2001/XMLSchema#integer>"
    assert got == [(f"<{EX}alice>", f'"30"^^{xsd_int}'),
                   (f"<{EX}bob>", f'"25"^^{xsd_int}')]


def test_subselect_limit_order(graph):
    """ORDER BY + LIMIT inside the subquery apply before the outer join."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?n WHERE {{
            ?x foaf:name ?n .
            {{ SELECT ?x WHERE {{ ?x foaf:age ?a }} ORDER BY ?a LIMIT 1 }}
        }}
    """, graph)
    assert [r["n"] for r in out.take_all()] == ['"Bob"']


def test_subselect_in_union_arm(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x WHERE {{
            {{ SELECT ?x WHERE {{ ?x foaf:age ?a }}
               ORDER BY DESC(?a) LIMIT 1 }}
            UNION
            {{ ?x foaf:name "Carol" }}
        }}
    """, graph)
    got = sorted(r["x"] for r in out.take_all())
    assert got == [f"<{EX}alice>", f"<{EX}carol>"]


def test_subselect_distinct_star(graph):
    """SELECT * subselect projects every inner variable (no-op wrapper)."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?y WHERE {{ {{ SELECT DISTINCT * WHERE
            {{ ?x foaf:knows ?y }} }} }}
    """, graph)
    assert sorted(r["y"] for r in out.take_all()) == [
        f"<{EX}bob>", f"<{EX}carol>"]


def test_subselect_trailing_values(graph):
    """SubSelect ::= SelectClause WhereClause SolutionModifier ValuesClause."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?n WHERE {{
            {{ SELECT ?x ?n WHERE {{ ?x foaf:name ?n }}
               VALUES ?n {{ "Alice" "Carol" }} }}
        }}
    """, graph)
    got = sorted(r["n"] for r in out.take_all())
    assert got == ['"Alice"', '"Carol"']


def test_min_max_numeric_by_value(graph):
    """MIN/MAX fold through the SPARQL ORDER BY comparator, i.e. by
    VALUE for numbers (aggregate_iter.rs:276-308 routes through
    sparql_order_by) — "25" < "30" numerically even though "30" < "9"
    would hold lexically."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT (MIN(?a) AS ?lo) (MAX(?a) AS ?hi)
        WHERE {{ ?x foaf:age ?a }}
    """, graph)
    xsd_int = "<http://www.w3.org/2001/XMLSchema#integer>"
    r = out.take_all()[0]
    assert r["lo"] == f'"25"^^{xsd_int}'
    assert r["hi"] == f'"30"^^{xsd_int}'


def test_max_value_vs_lexical(ray_session):
    """Explicit lexical-trap case: max(9, 554) = 554 (lexically "95"
    style traps: "9…" > "5…")."""
    import ray.data as rd

    xsd_int = "<http://www.w3.org/2001/XMLSchema#integer>"
    g = rd.from_arrow(pa.table({
        "s": pa.array(["<u:a>", "<u:b>"], pa.large_string()),
        "p": pa.array(["<p:n>", "<p:n>"], pa.large_string()),
        "o": pa.array([f'"9"^^{xsd_int}', f'"554"^^{xsd_int}'],
                      pa.large_string()),
    }))
    out = select("SELECT (MAX(?n) AS ?mx) (MIN(?n) AS ?mn) "
                 "WHERE { ?s <p:n> ?n }", g)
    r = out.take_all()[0]
    assert r["mx"] == f'"554"^^{xsd_int}'
    assert r["mn"] == f'"9"^^{xsd_int}'


def test_order_by_unprojected_var(graph):
    """ORDER BY may reference variables absent from the projection
    (SPARQL 1.1 §18.2.5) — the sort must run BEFORE Project."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x WHERE {{ ?x foaf:age ?a }} ORDER BY ?a LIMIT 1
    """, graph)
    assert [r["x"] for r in out.take_all()] == [f"<{EX}bob>"]


def test_order_by_distinct_unprojected_rejected():
    with pytest.raises(SparqlParseError):
        parse_query("SELECT DISTINCT ?x WHERE { ?x <p:a> ?a } "
                    "ORDER BY ?a")


# --- HAVING / GROUP BY expressions / CONSTRUCT WHERE (round-2 additions) ---

XSD_INT = "<http://www.w3.org/2001/XMLSchema#integer>"


def test_having_with_aggregate(graph):
    """Aggregates inside HAVING are hoisted into the Group under a
    synthetic alias (SPARQL 1.1 §11.1); only groups passing the
    post-group filter survive."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x (COUNT(*) AS ?n)
        WHERE {{ ?x ?p ?o }}
        GROUP BY ?x
        HAVING (COUNT(*) > 3)
    """, graph)
    rows = out.take_all()
    assert [r["x"] for r in rows] == [f"<{EX}alice>"]
    assert rows[0]["n"] == f'"4"^^{XSD_INT}'


def test_having_references_select_alias(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x (COUNT(*) AS ?n)
        WHERE {{ ?x ?p ?o }}
        GROUP BY ?x
        HAVING (?n = 3)
    """, graph)
    assert sorted(r["x"] for r in out.take_all()) == [f"<{EX}bob>"]


def test_having_multiple_conditions(graph):
    """HavingCondition+ chains as a conjunction."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x (MIN(?o) AS ?mn)
        WHERE {{ ?x foaf:name ?o }}
        GROUP BY ?x
        HAVING (COUNT(*) > 0) (MIN(?o) != "Alice")
    """, graph)
    assert sorted(r["x"] for r in out.take_all()) == [
        f"<{EX}bob>", f"<{EX}carol>"]


def test_having_empty_result_groups(graph):
    out = select(f"""
        SELECT ?x (COUNT(*) AS ?n) WHERE {{ ?x ?p ?o }}
        GROUP BY ?x HAVING (COUNT(*) > 100)
    """, graph)
    assert out.take_all() == []


def test_group_by_expression_with_alias(graph):
    """GROUP BY (expr AS ?var) binds the key before grouping and the
    alias is selectable."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?decade (COUNT(*) AS ?n)
        WHERE {{ ?x foaf:age ?a }}
        GROUP BY (FLOOR(?a / 10) AS ?decade)
    """, graph)
    got = {r["decade"]: r["n"] for r in out.take_all()}
    xsd_dec = "<http://www.w3.org/2001/XMLSchema#decimal>"
    assert got == {f'"2.0"^^{xsd_dec}': f'"1"^^{XSD_INT}',
                   f'"3.0"^^{xsd_dec}': f'"1"^^{XSD_INT}'}


def test_group_by_expression_anonymous(graph):
    """An AS-less GroupCondition groups on a synthetic pruned column."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT (COUNT(*) AS ?n)
        WHERE {{ ?x foaf:age ?a }}
        GROUP BY (FLOOR(?a / 10))
    """, graph)
    rows = out.take_all()
    assert sorted(r["n"] for r in rows) == [f'"1"^^{XSD_INT}'] * 2
    assert set(rows[0].keys()) == {"n"}


def test_construct_where_shorthand(graph):
    """CONSTRUCT WHERE { tmpl } (§10.2.3): pattern doubles as template."""
    out = construct(f"""
        PREFIX foaf: <{FOAF}>
        CONSTRUCT WHERE {{ ?x foaf:knows ?y }}
    """, graph)
    rows = {(r["s"], r["p"], r["o"]) for r in out.take_all()}
    assert rows == {
        (f"<{EX}alice>", f"<{FOAF}knows>", f"<{EX}bob>"),
        (f"<{EX}bob>", f"<{FOAF}knows>", f"<{EX}carol>"),
    }


def test_construct_where_bnode_as_variable(graph):
    """A blank node in the shorthand acts as a variable in the pattern
    and its binding feeds the template."""
    out = construct(f"""
        PREFIX foaf: <{FOAF}>
        CONSTRUCT WHERE {{ ?x foaf:knows [ foaf:name ?n ] }}
    """, graph)
    rows = {(r["s"], r["p"], r["o"]) for r in out.take_all()}
    assert (f"<{EX}alice>", f"<{FOAF}knows>", f"<{EX}bob>") in rows
    assert (f"<{EX}bob>", f"<{FOAF}name>", '"Bob"') in rows


def test_aggregate_outside_select_having_still_rejected():
    with pytest.raises(SparqlParseError):
        parse_query("SELECT ?x WHERE { ?x <p:a> ?o "
                    "FILTER(SUM(?o) > 2) }")


def test_group_by_expression_empty_input(graph):
    """Grouping on an extended key over an empty pattern: Ray passes
    0-row blocks through map_batches without adding the Extend column,
    so the exchange must fall back to a driver-built combined empty
    instead of failing the partition."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?b (COUNT(*) AS ?n)
        WHERE {{ ?x <u:nonexistent> ?a }}
        GROUP BY (FLOOR(?a / 10) AS ?b)
    """, graph)
    assert out.take_all() == []


def test_aggregate_inside_select_expression(graph):
    """((COUNT(*) + 1) AS ?n): the aggregate is hoisted into the Group
    and the arithmetic runs as a post-group Extend."""
    out = select("SELECT ((COUNT(*) + 1) AS ?n) WHERE { ?s ?p ?o }",
                 graph)
    assert out.take_all() == [{"n": f'"9"^^{XSD_INT}'}]


def test_aggregate_not_first_operand(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ((1 + SUM(?a)) AS ?t) WHERE {{ ?x foaf:age ?a }}
    """, graph)
    assert out.take_all() == [{"t": f'"56"^^{XSD_INT}'}]


def test_two_aggregates_one_expression(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ((SUM(?a) + COUNT(*)) AS ?t)
        WHERE {{ ?x foaf:age ?a }} GROUP BY ?x
    """, graph)
    got = {r["x"]: r["t"] for r in out.take_all()}
    assert got == {f"<{EX}alice>": f'"31"^^{XSD_INT}',
                   f"<{EX}bob>": f'"26"^^{XSD_INT}'}


def test_trailing_values_clause(graph):
    """Top-level ValuesClause (§18.2.1) joins the complete result and
    contributes its variables."""
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?n WHERE {{ ?x foaf:name ?n }}
        VALUES ?x {{ <{EX}bob> }}
    """, graph)
    assert out.take_all() == [{"x": f"<{EX}bob>", "n": '"Bob"'}]


def test_trailing_values_multi_var_adds_columns(graph):
    out = select(f"""
        PREFIX foaf: <{FOAF}>
        SELECT ?x ?tag WHERE {{ ?x foaf:name ?n }}
        VALUES (?x ?tag) {{ (<{EX}carol> "c") }}
    """, graph)
    assert out.take_all() == [{"x": f"<{EX}carol>", "tag": '"c"'}]
