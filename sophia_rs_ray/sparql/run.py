"""Execute SPARQL query text over an NT triples Dataset.

The user-facing equivalent of the reference's
``SparqlWrapper(&dataset).query(text)`` (`api/src/sparql.rs:39-70`,
`sophia/examples/sparql.rs:13-52`): parse → algebra → Dataset DAG.

- ``select()``  → Dataset of bindings (one column per projected var)
- ``ask()``     → bool (LIMIT-1 probe, driver-side)
- ``construct()`` → Dataset of canonical-NT (s, p, o) rows built from
  the template; template bnodes get per-solution deterministic labels
  (hash of the binding row — reproducible, unlike the reference's
  UUID-suffixed labels, per SURVEY §7.0 determinism invariant).
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Tuple

import pyarrow as pa

from ..terms import KIND_BNODE, KIND_IRI, format_term
from .algebra import evaluate
from .expr import Var
from .parser import (
    AskQuery, ConstructQuery, DescribeQuery, SelectQuery, SparqlParseError,
    parse_query,
)

__all__ = ["select", "ask", "construct", "describe", "sparql"]


def _apply_dataset_clause(triples_ds, dataset):
    """FROM / FROM NAMED (SPARQL 1.1 §13.2) over a quad table: rows of
    the FROM graphs merge into the query's default graph (g → ''),
    rows of the FROM NAMED graphs stay named, everything else drops."""
    froms, named = dataset
    if not froms and not named:
        return triples_ds
    f_set, n_set = set(froms), set(named)

    def body(b: pa.Table) -> pa.Table:
        if "g" not in b.column_names:
            raise ValueError("FROM/FROM NAMED need a quad table (g column)")
        import pyarrow.compute as pc

        g = b["g"]
        keep_default = pc.is_in(g, value_set=pa.array(sorted(f_set),
                                                      g.type)) \
            if f_set else pa.array([False] * b.num_rows)
        keep_named = pc.is_in(g, value_set=pa.array(sorted(n_set),
                                                    g.type)) \
            if n_set else pa.array([False] * b.num_rows)
        dflt = b.filter(keep_default)
        gi = dflt.column_names.index("g")
        dflt = dflt.set_column(gi, "g", pa.array([""] * dflt.num_rows,
                                                 g.type))
        return pa.concat_tables([dflt, b.filter(keep_named)])

    return triples_ds.map_batches(body, batch_format="pyarrow")


def select(text: str, triples_ds, *, num_partitions: int = 8):
    q = parse_query(text)
    if not isinstance(q, SelectQuery):
        raise SparqlParseError("not a SELECT query")
    triples_ds = _apply_dataset_clause(triples_ds, q.dataset)
    out = evaluate(q.node, triples_ds, num_partitions=num_partitions)

    def drop_internal(b: pa.Table) -> pa.Table:
        # SELECT * must not expose path chain vars (_path_N) or the
        # empty-group unit column (_unit) — but a zero-column Arrow
        # table cannot carry rows, so when _unit is the ONLY column the
        # solution rows keep it (empty solutions still count)
        drop = [c for c in b.column_names
                if c.startswith("_path_") or c == "_unit"]
        if len(drop) == len(b.column_names):
            drop = [c for c in drop if c != "_unit"]
        return b.drop_columns(drop) if drop else b

    return out.map_batches(drop_internal, batch_format="pyarrow")


def ask(text: str, triples_ds, *, num_partitions: int = 8) -> bool:
    q = parse_query(text)
    if not isinstance(q, AskQuery):
        raise SparqlParseError("not an ASK query")
    triples_ds = _apply_dataset_clause(triples_ds, q.dataset)
    out = evaluate(q.node, triples_ds, num_partitions=num_partitions)
    # stream + early-exit rather than take(1): Ray 2.49's limit
    # push-down over a Union logical op trips a planner assertion
    # (plan_union_op children<2), and iter_batches stops execution as
    # soon as the first non-empty batch arrives anyway
    for b in out.iter_batches(batch_size=64, batch_format="pyarrow"):
        if b.num_rows:
            return True
    return False


def construct(text: str, triples_ds, *, num_partitions: int = 8):
    q = parse_query(text)
    if not isinstance(q, ConstructQuery):
        raise SparqlParseError("not a CONSTRUCT query")
    triples_ds = _apply_dataset_clause(triples_ds, q.dataset)
    bindings = evaluate(q.node, triples_ds, num_partitions=num_partitions)

    # pre-format the template: each position is either a fixed NT string,
    # a variable name, or a bnode label to freshen per solution
    tmpl: List[Tuple[Tuple[str, str], ...]] = []
    for (s, p, o) in q.template:
        row = []
        for t in (s, p, o):
            if isinstance(t, Var):
                row.append(("var", t.name))
            elif t[0] == KIND_BNODE:
                row.append(("bnode", t[1]))
            else:
                row.append(("const", format_term(t)))
        tmpl.append(tuple(row))

    def instantiate(b: pa.Table) -> pa.Table:
        cols = {c: b[c].to_pylist() for c in b.column_names}
        n = b.num_rows
        s_out: List[str] = []
        p_out: List[str] = []
        o_out: List[str] = []
        for i in range(n):
            # deterministic per-solution bnode scope: hash the binding row
            key = None
            for (kind_s, val_s), (kind_p, val_p), (kind_o, val_o) in tmpl:
                vals = []
                ok = True
                for kind, val in ((kind_s, val_s), (kind_p, val_p),
                                  (kind_o, val_o)):
                    if kind == "const":
                        vals.append(val)
                    elif kind == "var":
                        x = cols.get(val, [None] * n)[i]
                        if x is None:
                            ok = False
                            break
                        vals.append(x)
                    else:  # bnode — freshen per solution
                        if key is None:
                            key = zlib.crc32("\x1f".join(
                                str(cols[c][i]) for c in sorted(cols)
                            ).encode())
                        vals.append(f"_:{val}_{key:08x}")
                if ok:
                    s_out.append(vals[0])
                    p_out.append(vals[1])
                    o_out.append(vals[2])
        return pa.table({"s": pa.array(s_out, pa.large_string()),
                         "p": pa.array(p_out, pa.large_string()),
                         "o": pa.array(o_out, pa.large_string())})

    out = bindings.map_batches(instantiate, batch_format="pyarrow")
    from ..stages.dedup import dedup_triples
    return dedup_triples(out, carry_min=())


def describe(text: str, triples_ds, *, num_partitions: int = 8):
    """DESCRIBE: all triples whose subject is a described resource
    (simple subject-scan form of the spec's implementation-defined
    description; no bnode closure).  Resources = the constant IRIs
    plus bindings of the DESCRIBE variables from the WHERE clause."""
    q = parse_query(text)
    if not isinstance(q, DescribeQuery):
        raise SparqlParseError("not a DESCRIBE query")
    resources = {format_term(t) for t in q.terms}
    if q.node is not None and q.vars:
        bindings = evaluate(q.node, triples_ds,
                            num_partitions=num_partitions)
        cols = [v for v in q.vars if v in bindings.schema().names]
        for r in bindings.select_columns(cols).take_all():
            for v in cols:
                if r[v] is not None:
                    resources.add(r[v])
    from ..graph import triples_matching
    return triples_matching(triples_ds, s=sorted(resources))


def sparql(text: str, triples_ds, *, num_partitions: int = 8):
    """Dispatch on query form (SELECT → Dataset, ASK → bool,
    CONSTRUCT/DESCRIBE → triples Dataset)."""
    q = parse_query(text)
    if isinstance(q, SelectQuery):
        return select(text, triples_ds, num_partitions=num_partitions)
    if isinstance(q, AskQuery):
        return ask(text, triples_ds, num_partitions=num_partitions)
    if isinstance(q, DescribeQuery):
        return describe(text, triples_ds, num_partitions=num_partitions)
    return construct(text, triples_ds, num_partitions=num_partitions)
