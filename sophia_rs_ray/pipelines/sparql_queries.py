"""SPARQL-algebra registry entries with DuckDB oracles.

Each entry runs a programmatic algebra tree (sophia_rs_ray.sparql)
against the doc-triples table and is checked by the driver against an
equivalent SQL statement over the raw ``documents`` view.  Column values
are canonical-NT term texts on BOTH sides (safe string building: lang /
source / n_chars contain no escapable characters — see doc_triples).
"""

from __future__ import annotations

from ..sparql import (
    BGP, Const, Distinct, Extend, Filter, FnCall, Group, LeftJoin, Minus,
    OrderBy, PathPlus, Project, Slice, Union, Var, evaluate,
)
from ..sparql.algebra import Agg
from ..terms import int_literal, iri, literal
from .doc_triples import (
    DC_LANGUAGE, DC_SOURCE, DOC, DOC_TYPE, EX_NCHARS, doc_triples,
)

RDF_TYPE_IRI = iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
INT_DT = "^^<http://www.w3.org/2001/XMLSchema#integer>"
_D = f"'<{DOC}' || doc_id || '>'"


def sparql_bgp_filter(sf_dir: str):
    """BGP join + FILTER(?n > 300 && ?lang = "en") — exec.rs BGP +
    expression guard."""
    q = Project(["d", "lang", "n"], Filter(
        FnCall("&&",
               FnCall(">", Var("n"), Const(int_literal(300))),
               FnCall("=", Var("lang"), Const(literal("en")))),
        BGP([(Var("d"), iri(DC_LANGUAGE), Var("lang")),
             (Var("d"), iri(EX_NCHARS), Var("n"))])))
    return evaluate(q, doc_triples(sf_dir))


SPARQL_BGP_FILTER_SQL = f"""
SELECT {_D} AS d, '"' || lang || '"' AS lang,
       '"' || n_chars || '"{INT_DT}' AS n
FROM documents
WHERE cast(n_chars AS BIGINT) > 300 AND lang = 'en'
"""


def sparql_group_agg(sf_dir: str):
    """GROUP BY ?src with COUNT(*) + SUM(?n) (aggregate_iter.rs)."""
    q = Group(["src"], [Agg("COUNT", None, "cnt"),
                        Agg("SUM", Var("n"), "sum_n")],
              BGP([(Var("d"), iri(DC_SOURCE), Var("src")),
                   (Var("d"), iri(EX_NCHARS), Var("n"))]))
    return evaluate(q, doc_triples(sf_dir))


SPARQL_GROUP_AGG_SQL = f"""
SELECT '"' || source || '"' AS src,
       '"' || count(*) || '"{INT_DT}' AS cnt,
       '"' || sum(cast(n_chars AS BIGINT)) || '"{INT_DT}' AS sum_n
FROM documents GROUP BY source
"""


def sparql_optional(sf_dir: str):
    """OPTIONAL {?d dc:language "en" bound as ?l} (left join,
    exec.rs:520-551): ?l null for non-English docs."""
    q = LeftJoin(
        BGP([(Var("d"), RDF_TYPE_IRI, iri(DOC_TYPE))]),
        Filter(FnCall("=", Var("l"), Const(literal("en"))),
               BGP([(Var("d"), iri(DC_LANGUAGE), Var("l"))])))
    return evaluate(q, doc_triples(sf_dir))


SPARQL_OPTIONAL_SQL = f"""
SELECT {_D} AS d, CASE WHEN lang = 'en' THEN '"en"' END AS l
FROM documents
"""


def sparql_union_distinct(sf_dir: str):
    """DISTINCT over a UNION of two pattern branches (exec.rs:627/553)."""
    en = BGP([(Var("d"), iri(DC_LANGUAGE), literal("en"))])
    big = Filter(FnCall(">", Var("n"), Const(int_literal(400))),
                 BGP([(Var("d"), iri(EX_NCHARS), Var("n"))]))
    q = Distinct(Project(["d"], Union(en, Project(["d"], big))))
    return evaluate(q, doc_triples(sf_dir))


SPARQL_UNION_DISTINCT_SQL = f"""
SELECT DISTINCT d FROM (
  SELECT {_D} AS d FROM documents WHERE lang = 'en'
  UNION ALL
  SELECT {_D} AS d FROM documents WHERE cast(n_chars AS BIGINT) > 400
)
"""


def sparql_minus(sf_dir: str):
    """MINUS (anti-join on shared vars, exec.rs:754-790)."""
    q = Minus(Project(["d"], BGP([(Var("d"), RDF_TYPE_IRI, iri(DOC_TYPE))])),
              Project(["d"], BGP([(Var("d"), iri(DC_LANGUAGE),
                                   literal("en"))])))
    return evaluate(q, doc_triples(sf_dir))


SPARQL_MINUS_SQL = f"""
SELECT {_D} AS d FROM documents WHERE lang <> 'en'
"""


def sparql_order_slice(sf_dir: str):
    """ORDER BY ?n DESC, ?d ASC + LIMIT/OFFSET (exec.rs:826-941);
    numeric keys order by VALUE."""
    q = Slice(OrderBy([(Var("n"), False), (Var("d"), True)],
                      BGP([(Var("d"), iri(EX_NCHARS), Var("n"))])),
              offset=5, limit=20)
    return evaluate(q, doc_triples(sf_dir))


SPARQL_ORDER_SLICE_SQL = f"""
SELECT {_D} AS d, '"' || n_chars || '"{INT_DT}' AS n
FROM documents
ORDER BY cast(n_chars AS BIGINT) DESC, {_D} ASC
LIMIT 20 OFFSET 5
"""


def sparql_extend_fns(sf_dir: str):
    """Extend chain exercising the scalar function library
    (function.rs: STR/UCASE/STRLEN/CONCAT/CONTAINS)."""
    base = BGP([(Var("d"), iri(DC_SOURCE), Var("src")),
                (Var("d"), iri(DC_LANGUAGE), Var("lang"))])
    q = Project(["d", "usrc", "slen", "tag"],
                Extend("tag", FnCall("CONCAT", Var("lang"),
                                     Const(literal("-")), Var("src")),
                Extend("slen", FnCall("STRLEN", Var("src")),
                Extend("usrc", FnCall("UCASE", Var("src")),
                Filter(FnCall("CONTAINS", Var("src"), Const(literal("src"))),
                       base)))))
    return evaluate(q, doc_triples(sf_dir))


SPARQL_EXTEND_SQL = f"""
SELECT {_D} AS d,
       '"' || upper(source) || '"' AS usrc,
       '"' || length(source) || '"{INT_DT}' AS slen,
       '"' || lang || '-' || source || '"' AS tag
FROM documents WHERE source LIKE '%src%'
"""


_KNOWS = "http://schema.org/knows"
_CUST = "http://kg.example/cust/"
_PARENT = "http://kg.example/parent"


def _knows_triples(sf_dir: str):
    """Fan-out ``schema:knows`` edges — each hierarchy parent "knows"
    its children (child(k) has parent k // 10) — derived from the
    customer parquet table so DuckDB can reconstruct the exact graph."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    def body(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["c_custkey"], pa.scalar(10)))
        k = b["c_custkey"].to_pylist()
        return pa.table({
            "s": pa.array([f"<{_CUST}{x // 10}>" for x in k],
                          pa.large_string()),
            "p": pa.array([f"<{_KNOWS}>"] * len(k), pa.large_string()),
            "o": pa.array([f"<{_CUST}{x}>" for x in k], pa.large_string()),
        })

    return cust.map_batches(body, batch_format="pyarrow")


def sparql_path_knows(sf_dir: str):
    """``schema:knows+`` transitive closure from a FIXED hub subject —
    driver fixpoint of join+dedup rounds with a constant start frontier
    (exec.rs:274-482 path_or_more, bound subject). The page-KG variant
    of this closure is exercised by tests/test_sparql_queries.py; this
    registry entry runs over parquet-derivable edges so the recursive
    CTE oracle below checks it exactly."""
    from ..sparql.run import select

    q = f"SELECT ?reached WHERE {{ <{_CUST}1> <{_KNOWS}>+ ?reached }}"
    return select(q, _knows_triples(sf_dir))


SPARQL_PATH_KNOWS_SQL = f"""
WITH RECURSIVE des(node) AS (
  SELECT c_custkey FROM customer
  WHERE c_custkey >= 10 AND c_custkey // 10 = 1
  UNION
  SELECT c.c_custkey FROM customer c, des d
  WHERE c.c_custkey >= 10 AND c.c_custkey // 10 = d.node
)
SELECT '<{_CUST}' || node || '>' AS reached FROM des
"""


def sparql_text_select(sf_dir: str):
    """Query-string front end (parser.py → algebra → Dataset): grouped
    aggregate over doc triples, parsed from SPARQL text like the
    reference's prepare_query (api/src/sparql.rs:39-70)."""
    from ..sparql.run import select

    q = f"""
      PREFIX dc: <http://purl.org/dc/terms/>
      PREFIX ex: <http://kg.example/>
      SELECT ?src (COUNT(*) AS ?cnt) (MIN(?lang) AS ?min_lang)
      WHERE {{ ?d dc:language ?lang ; dc:source ?src }}
      GROUP BY ?src
    """
    return select(q, doc_triples(sf_dir))


SPARQL_TEXT_SELECT_SQL = f"""
SELECT '"' || source || '"' AS src,
       '"' || count(*) || '"{INT_DT}' AS cnt,
       '"' || min(lang) || '"' AS min_lang
FROM documents GROUP BY source
"""


def sparql_text_construct(sf_dir: str):
    """CONSTRUCT from query text: rewrite dc:language links into a new
    predicate; output is canonical-NT (s, p, o) rows."""
    from ..sparql.run import construct

    q = """
      PREFIX dc: <http://purl.org/dc/terms/>
      PREFIX ex: <http://kg.example/>
      CONSTRUCT { ?d ex:inLanguage ?lang }
      WHERE { ?d dc:language ?lang }
    """
    return construct(q, doc_triples(sf_dir))


SPARQL_TEXT_CONSTRUCT_SQL = f"""
SELECT DISTINCT {_D} AS s,
       '<http://kg.example/inLanguage>' AS p,
       '"' || lang || '"' AS o
FROM documents
"""


def sparql_agg_noexplicit_group(sf_dir: str):
    """Aggregates with NO GROUP BY (the single implicit group,
    exec.rs:943-1006): runs as distributed per-block partial states
    through the hash exchange — no driver materialization (r1 VERDICT
    item 1)."""
    from ..sparql.run import select

    q = """
      PREFIX dc: <http://purl.org/dc/terms/>
      PREFIX ex: <http://kg.example/>
      SELECT (COUNT(*) AS ?cnt) (SUM(?n) AS ?sum_n) (MIN(?lang) AS ?lo)
             (COUNT(DISTINCT ?lang) AS ?nlang)
      WHERE { ?d dc:language ?lang ; ex:nchars ?n }
    """
    return select(q, doc_triples(sf_dir))


SPARQL_AGG_NOGROUP_SQL = f"""
SELECT '"' || count(*) || '"{INT_DT}' AS cnt,
       '"' || sum(cast(n_chars AS BIGINT)) || '"{INT_DT}' AS sum_n,
       '"' || min(lang) || '"' AS lo,
       '"' || count(DISTINCT lang) || '"{INT_DT}' AS nlang
FROM documents
"""


def sparql_path_negated(sf_dir: str):
    """Negated property set ``!(rdf:type|ex:nchars)`` (SPARQL 1.1 §9.1,
    exec.rs path negation): all doc triples EXCEPT the excluded
    predicates — matches dc:language and dc:source rows."""
    from ..sparql.run import select

    q = """
      PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
      PREFIX ex: <http://kg.example/>
      SELECT ?d ?o WHERE { ?d !(rdf:type|ex:nchars) ?o }
    """
    return select(q, doc_triples(sf_dir))


SPARQL_PATH_NEGATED_SQL = f"""
SELECT {_D} AS d, '"' || lang || '"' AS o FROM documents
UNION ALL
SELECT {_D} AS d, '"' || source || '"' AS o FROM documents
"""


def _parent_triples(sf_dir: str):
    """Deterministic customer hierarchy (parent(k) = k // 10) as NT
    triples — the graph under the recursive-CTE path oracles."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])

    def body(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["c_custkey"], pa.scalar(10)))
        k = b["c_custkey"].to_pylist()
        return pa.table({
            "s": pa.array([f"<{_CUST}{x}>" for x in k], pa.large_string()),
            "p": pa.array([f"<{_PARENT}>"] * len(k), pa.large_string()),
            "o": pa.array([f"<{_CUST}{x // 10}>" for x in k],
                          pa.large_string())})

    return cust.map_batches(body, batch_format="pyarrow")


def sparql_path_plus_var(sf_dir: str):
    """``?s ex:parent+ ?o`` with a FREE subject — full transitive
    closure via semi-naive iteration (driver BFS below the edge limit,
    distributed Dataset frontiers above; exec.rs path_or_more with both
    endpoints open)."""
    from ..sparql.run import select

    q = f"SELECT ?s ?o WHERE {{ ?s <{_PARENT}>+ ?o }}"
    return select(q, _parent_triples(sf_dir))


SPARQL_PATH_PLUS_VAR_SQL = f"""
WITH RECURSIVE anc(node, ancestor) AS (
  SELECT c_custkey, c_custkey // 10 FROM customer WHERE c_custkey >= 10
  UNION
  SELECT a.node, a.ancestor // 10 FROM anc a WHERE a.ancestor >= 10
)
SELECT '<{_CUST}' || node || '>' AS s,
       '<{_CUST}' || ancestor || '>' AS o
FROM anc
"""


def sparql_path_star_var(sf_dir: str):
    """``?s ex:parent* ?o`` with BOTH endpoints free: the plus closure
    UNION the zero-length identity over every term of the graph
    (SPARQL 1.1 §9.3 ZeroLengthPath)."""
    from ..sparql.run import select

    q = f"SELECT ?s ?o WHERE {{ ?s <{_PARENT}>* ?o }}"
    return select(q, _parent_triples(sf_dir))


SPARQL_PATH_STAR_VAR_SQL = f"""
WITH RECURSIVE anc(node, ancestor) AS (
  SELECT c_custkey, c_custkey // 10 FROM customer WHERE c_custkey >= 10
  UNION
  SELECT a.node, a.ancestor // 10 FROM anc a WHERE a.ancestor >= 10
),
terms(t) AS (
  SELECT c_custkey FROM customer WHERE c_custkey >= 10
  UNION
  SELECT c_custkey // 10 FROM customer WHERE c_custkey >= 10
)
SELECT '<{_CUST}' || node || '>' AS s,
       '<{_CUST}' || ancestor || '>' AS o FROM anc
UNION
SELECT '<{_CUST}' || t || '>' AS s, '<{_CUST}' || t || '>' AS o
FROM terms
"""


def sparql_subquery(sf_dir: str):
    """SubSelect (`{ SELECT … }`, SPARQL 1.1 §18.2.2.11; desugared by
    the reference's spargebra into nested Project/Group algebra —
    sparql/src/exec.rs:125-180): per-source MAX via an aggregating
    subquery joined back on the shared projected variable, filtered to
    the row(s) attaining the max."""
    from ..sparql.run import select

    q = """
      PREFIX dc: <http://purl.org/dc/terms/>
      PREFIX ex: <http://kg.example/>
      SELECT ?d ?src ?maxn WHERE {
        ?d dc:source ?src ; ex:nchars ?n .
        { SELECT ?src (MAX(?n2) AS ?maxn)
          WHERE { ?x dc:source ?src ; ex:nchars ?n2 } GROUP BY ?src }
        FILTER(?n = ?maxn)
      }
    """
    return select(q, doc_triples(sf_dir))


SPARQL_SUBQUERY_SQL = f"""
SELECT {_D.replace("doc_id", "d.doc_id")} AS d,
       '"' || d.source || '"' AS src,
       '"' || m.maxn || '"{INT_DT}' AS maxn
FROM documents d
JOIN (SELECT source, max(cast(n_chars AS BIGINT)) AS maxn
      FROM documents GROUP BY source) m
  ON d.source = m.source AND cast(d.n_chars AS BIGINT) = m.maxn
"""


def sparql_having(sf_dir: str):
    """HAVING with an in-condition aggregate, from query text: the
    aggregate is hoisted into the Group under a synthetic alias and the
    filter runs post-grouping (exec.rs group→having pipeline)."""
    from ..sparql.run import select

    q = """
      PREFIX dc: <http://purl.org/dc/terms/>
      PREFIX ex: <http://kg.example/>
      SELECT ?src (COUNT(*) AS ?cnt) (SUM(?n) AS ?sum_n)
      WHERE { ?d dc:source ?src ; ex:nchars ?n }
      GROUP BY ?src
      HAVING (SUM(?n) > 8000) (COUNT(*) > 1)
    """
    return select(q, doc_triples(sf_dir))


SPARQL_HAVING_SQL = f"""
SELECT '"' || source || '"' AS src,
       '"' || count(*) || '"{INT_DT}' AS cnt,
       '"' || sum(cast(n_chars AS BIGINT)) || '"{INT_DT}' AS sum_n
FROM documents GROUP BY source
HAVING sum(cast(n_chars AS BIGINT)) > 8000 AND count(*) > 1
"""


def sparql_group_expr(sf_dir: str):
    """GROUP BY on a computed key ``(FLOOR(?n/100) AS ?bucket)`` —
    GroupCondition expression grammar (§11.1), bound via Extend before
    the grouping exchange."""
    from ..sparql.run import select

    q = """
      PREFIX ex: <http://kg.example/>
      SELECT ?bucket (COUNT(*) AS ?cnt)
      WHERE { ?d ex:nchars ?n }
      GROUP BY (FLOOR(?n / 100) AS ?bucket)
    """
    return select(q, doc_triples(sf_dir))


SPARQL_GROUP_EXPR_SQL = f"""
SELECT '"' || CAST(floor(cast(n_chars AS BIGINT) / 100.0) AS BIGINT)
           || '.0"^^<http://www.w3.org/2001/XMLSchema#decimal>' AS bucket,
       '"' || count(*) || '"{INT_DT}' AS cnt
FROM documents GROUP BY 1
"""


def sparql_construct_where(sf_dir: str):
    """``CONSTRUCT WHERE`` shorthand (§10.2.3): template = pattern."""
    from ..sparql.run import construct

    q = """
      PREFIX dc: <http://purl.org/dc/terms/>
      CONSTRUCT WHERE { ?d dc:language ?lang }
    """
    return construct(q, doc_triples(sf_dir))


SPARQL_CONSTRUCT_WHERE_SQL = f"""
SELECT {_D} AS s, '<http://purl.org/dc/terms/language>' AS p,
       '"' || lang || '"' AS o
FROM documents
"""


REGISTRY = {
    "sparql_bgp_filter": (sparql_bgp_filter, SPARQL_BGP_FILTER_SQL),
    "sparql_subquery": (sparql_subquery, SPARQL_SUBQUERY_SQL),
    "sparql_group_agg": (sparql_group_agg, SPARQL_GROUP_AGG_SQL),
    "sparql_optional": (sparql_optional, SPARQL_OPTIONAL_SQL),
    "sparql_union_distinct": (sparql_union_distinct, SPARQL_UNION_DISTINCT_SQL),
    "sparql_minus": (sparql_minus, SPARQL_MINUS_SQL),
    "sparql_order_slice": (sparql_order_slice, SPARQL_ORDER_SLICE_SQL),
    "sparql_extend_fns": (sparql_extend_fns, SPARQL_EXTEND_SQL),
    "sparql_path_knows": (sparql_path_knows, SPARQL_PATH_KNOWS_SQL),
    "sparql_text_select": (sparql_text_select, SPARQL_TEXT_SELECT_SQL),
    "sparql_text_construct": (sparql_text_construct,
                              SPARQL_TEXT_CONSTRUCT_SQL),
    "sparql_agg_noexplicit_group": (sparql_agg_noexplicit_group,
                                    SPARQL_AGG_NOGROUP_SQL),
    "sparql_path_negated": (sparql_path_negated, SPARQL_PATH_NEGATED_SQL),
    "sparql_path_plus_var": (sparql_path_plus_var,
                             SPARQL_PATH_PLUS_VAR_SQL),
    "sparql_path_star_var": (sparql_path_star_var,
                             SPARQL_PATH_STAR_VAR_SQL),
    "sparql_having": (sparql_having, SPARQL_HAVING_SQL),
    "sparql_group_expr": (sparql_group_expr, SPARQL_GROUP_EXPR_SQL),
    "sparql_construct_where": (sparql_construct_where,
                               SPARQL_CONSTRUCT_WHERE_SQL),
}
