"""SPARQL algebra nodes → Ray Data operator DAGs.

The reference compiles a spargebra tree into nested lazy iterators over
FastDataset index scans (``sparql/src/exec.rs:125-181``).  Here the same
algebra compiles bottom-up into Dataset transformations (SURVEY §2.5-2.7
mapping table):

    BGP          pattern scans (filtered map_batches) + chained hash
                 joins on shared variables          (exec.rs:484-518)
    LeftJoin     left_outer join                    (exec.rs:520-551)
    Minus        anti join via marker               (exec.rs:754-790)
    Union        aligned union (bag)                (exec.rs:627-650)
    Filter/Extend expression map_batches            (expression.rs)
    Distinct     full-row dedup shuffle             (exec.rs:553-573)
    OrderBy      sort on encoded term-order key     (exec.rs:826-893)
    Slice        LIMIT/OFFSET                       (exec.rs:916-941)
    Group        groupby + aggregate state machine  (aggregate_iter.rs)
    PathPlus     p+ transitive closure: driver fixpoint of join+dedup
                 rounds                             (exec.rs:274-482)

Bindings = Dataset with one large_string column per variable (canonical
NT text; null = unbound).  Algebra nodes are built programmatically (the
spargebra-equivalent IR); a text front-end is out of scope — the
reference itself delegates text→algebra to the external spargebra crate.

Scale notes: every join/groupby/sort below is an explicit shuffle whose
key is the shared-variable tuple; pattern scans push constant positions
into Arrow filters (and can be served by the materialized shard layouts
via stages/materialize.triples_matching for bound leading terms).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union as U

import pyarrow as pa
import pyarrow.compute as pc

from ..terms import (XSD, XSD_DOUBLE, XSD_INTEGER, Term, format_term,
                     sort_key)
from ..util import safe_join
from .expr import (Const, Expr, FnCall, Var, _parse, ebv, eval_expr_batch,
                   order_key_batch, value_of)

TermOrVar = U[Term, Var]


@dataclass
class BGP:
    patterns: Sequence[Tuple[TermOrVar, TermOrVar, TermOrVar]]


@dataclass
class Join:
    left: "Node"
    right: "Node"


@dataclass
class LeftJoin:
    left: "Node"
    right: "Node"
    # NB: an OPTIONAL-internal FILTER expression guard is not supported;
    # apply Filter inside `right` when it only references right-side vars.


@dataclass
class Union:
    left: "Node"
    right: "Node"


@dataclass
class Minus:
    left: "Node"
    right: "Node"


@dataclass
class Filter:
    expr: Expr
    child: "Node"


@dataclass
class Extend:
    var: str
    expr: Expr
    child: "Node"


@dataclass
class Project:
    vars: Sequence[str]
    child: "Node"


@dataclass
class Distinct:
    child: "Node"


@dataclass
class OrderBy:
    keys: Sequence[Tuple[Expr, bool]]  # (expr, ascending)
    child: "Node"


@dataclass
class Slice:
    child: "Node"
    offset: int = 0
    limit: Optional[int] = None


@dataclass
class Agg:
    """COUNT/SUM/AVG/MIN/MAX/GROUP_CONCAT/SAMPLE over an expression
    (None = COUNT(*)) — reference aggregate_iter.rs:80-190."""
    fn: str
    expr: Optional[Expr] = None
    alias: str = "agg"
    distinct: bool = False
    separator: str = " "


@dataclass
class Group:
    group_vars: Sequence[str]
    aggs: Sequence[Agg]
    child: "Node"


@dataclass
class PathPlus:
    """pred+ closure.  ``seeds`` = fixed subject Terms (bounded frontier
    loop, emits o_var only); ``seeds=None`` = variable subject — the
    full closure, emitting (s_var, o_var) pairs (driver BFS per source
    over the pred-pruned edge list; errors above the local edge limit)."""
    pred: Term
    seeds: Optional[Sequence[Term]]
    s_var: str = "s"
    o_var: str = "o"
    max_rounds: int = 32


@dataclass
class PathStar:
    """pred* — reflexive-transitive: the seeds themselves plus the
    pred+ closure (exec.rs path_zero + path_or_more)."""
    pred: Term
    seeds: Sequence[Term]
    o_var: str = "o"
    max_rounds: int = 32


@dataclass
class Exists:
    """Semi-join: keep left rows with ≥1 compatible right row — the
    EXISTS expression probe (sparql/src/expression.rs:60)."""
    left: "Node"
    right: "Node"
    negated: bool = False


@dataclass
class InlineData:
    """VALUES — inline binding table.  Single-var form: ``var`` +
    ``rows`` of Terms.  Multi-var form: ``var`` is a list of names and
    ``rows`` holds same-length tuples (None = UNDEF)."""
    var: U[str, Sequence[str]]
    rows: Sequence


@dataclass
class GraphPattern:
    """GRAPH ?g { … } / GRAPH <iri> { … } (exec.rs:652-707).

    Dataset semantics over a quad table (g column, '' = default graph):
    plain BGPs match ONLY the default graph; GraphPattern scopes its
    child to one named graph (constant) or iterates all named graphs
    binding the name (variable — threaded through every scan as an
    extra binding column so joins unify on it)."""
    name: U["Var", Term]
    child: "Node"


Node = U[BGP, Join, LeftJoin, Union, Minus, Filter, Extend, Project,
         Distinct, OrderBy, Slice, Group, PathPlus, PathStar, Exists,
         InlineData, GraphPattern]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _vars_of(ds) -> List[str]:
    sch = ds.schema()
    if sch is None:  # Ray loses the schema of empty datasets
        return []
    return [c for c in sch.names if not c.startswith("__")]


def _cols_of(ds) -> List[str]:
    sch = ds.schema()
    return [] if sch is None else list(sch.names)


def _empty_bindings(names: Sequence[str]):
    """1-block empty bindings table — every bindings column is a string
    (module invariant), so a lost schema is reconstructible by name."""
    import ray.data as rd

    return rd.from_arrow(pa.table(
        {c: pa.array([], pa.string()) for c in names}))


def _join_bindings(a, b, how: str, num_partitions: int, on):
    """Join two bindings Datasets with the empty-side handling Ray's
    join operator lacks: a side with NO non-empty blocks never
    broadcasts its schema, so the hash-shuffle aggregators crash
    (see util.safe_join).  Bindings semantics let us short-circuit:
    inner/empty ⇒ empty; left_outer with empty right ⇒ left + null
    columns.  Inputs and output are materialized (joins are barriers;
    this also serializes nested joins, avoiding actor-pool deadlock)."""
    a, b = a.materialize(), b.materialize()
    an, bn = _cols_of(a), _cols_of(b)
    union = list(dict.fromkeys(an + bn))
    if a.count() == 0:
        return _empty_bindings(union)
    if b.count() == 0:
        if how == "left_outer":
            extra = [c for c in bn if c not in an]

            def pad(t: pa.Table) -> pa.Table:
                for c in extra:
                    t = t.append_column(
                        c, pa.array([None] * t.num_rows, pa.string()))
                return t

            return a.map_batches(pad, batch_format="pyarrow")
        return _empty_bindings(union)
    out = safe_join(a, b, how, num_partitions, on=tuple(on)).materialize()
    if out.schema() is None:  # empty join result lost its schema
        return _empty_bindings(union)
    return out


def _norm_cols(b: pa.Table) -> pa.Table:
    """Pin binding columns to plain string for join-key compatibility."""
    for i, c in enumerate(b.column_names):
        if pa.types.is_large_string(b.schema.field(i).type):
            b = b.set_column(i, c, pc.cast(b[c], pa.string()))
    return b


def _scan(triples_ds, pattern, graph_var: Optional[str] = None
          ) -> "ray.data.Dataset":
    """One triple pattern → bindings: constant positions filter, variable
    positions project+rename; repeated variables add equality filters.

    Quad-table semantics: with a ``g`` column present, plain scans match
    only the default graph (``g == ''``); with ``graph_var`` set, scans
    match only NAMED graphs and emit the graph name as that variable."""
    pos_cols = ("s", "p", "o")
    consts: List[Tuple[str, str]] = []
    var_pos: Dict[str, List[str]] = {}
    for col, item in zip(pos_cols, pattern):
        if isinstance(item, Var):
            var_pos.setdefault(item.name, []).append(col)
        else:
            consts.append((col, format_term(item)))

    def body(b: pa.Table) -> pa.Table:
        mask = None
        for col, txt in consts:
            m = pc.equal(b[col], pa.scalar(txt))
            mask = m if mask is None else pc.and_(mask, m)
        for name, cols in var_pos.items():
            for extra in cols[1:]:
                m = pc.equal(b[cols[0]], b[extra])
                mask = m if mask is None else pc.and_(mask, m)
        if "g" in b.column_names:
            if graph_var is None:
                m = pc.equal(b["g"], pa.scalar(""))
            else:
                m = pc.not_equal(b["g"], pa.scalar(""))
                if graph_var in var_pos:  # GRAPH ?g { ?g … }
                    m = pc.and_(m, pc.equal(
                        b["g"], b[var_pos[graph_var][0]]))
            mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            b = b.filter(mask)
        out = {name: pc.cast(b[cols[0]], pa.string())
               for name, cols in var_pos.items()}
        if graph_var is not None and graph_var not in out \
                and "g" in b.column_names:
            out[graph_var] = pc.cast(b["g"], pa.string())
        if not out:  # all-constant pattern: emit a marker row per match
            return pa.table({"__match": pa.array([1] * b.num_rows, pa.int64())})
        return pa.table(out)

    if hasattr(triples_ds, "scan"):
        # MaterializedGraph backend: constant positions prune to one
        # shard + pushed-down parquet filter before the scan body runs
        kw = dict(consts)
        src = triples_ds.scan(**{k: v for k, v in kw.items()
                                 if k in ("s", "p", "o")})
        return src.map_batches(body, batch_format="pyarrow")
    return triples_ds.map_batches(body, batch_format="pyarrow")


def _eval_order_by(node: "OrderBy", child, *, limit: Optional[int]):
    """Sort bindings on order-preserving encoded keys; with ``limit``,
    each block is pruned to its local top-``limit`` first."""
    keys = list(node.keys)

    def add_keys(b: pa.Table) -> pa.Table:
        cols = {c: b[c].to_pylist() for c in b.column_names}
        for i, (e, _asc) in enumerate(keys):
            kb = order_key_batch(e, cols, b.num_rows)
            b = b.append_column(f"__o{i}",
                                pa.array([k.hex() for k in kb], pa.string()))
        return b

    sort_cols = [f"__o{i}" for i in range(len(keys))]
    desc = [not asc for (_e, asc) in keys]
    keyed = child.map_batches(add_keys, batch_format="pyarrow")
    if limit is not None:
        order = [(c, "descending" if d else "ascending")
                 for c, d in zip(sort_cols, desc)]

        def local(b: pa.Table) -> pa.Table:
            if b.num_rows <= limit:
                return b
            return b.sort_by(order).slice(0, limit)

        keyed = keyed.map_batches(local, batch_format="pyarrow")
    out = keyed.sort(sort_cols, descending=desc)
    return out.map_batches(lambda b: b.drop_columns(sort_cols),
                           batch_format="pyarrow")


def _cross_or_join(a, b, *, how: str = "inner", num_partitions: int = 8):
    """Hash join on shared vars; no shared vars → small-side cross
    product (only sensible when one side is tiny, e.g. a VALUES row)."""
    shared = sorted(set(_vars_of(a)) & set(_vars_of(b)))
    if shared:
        return _join_bindings(a, b, how, num_partitions, tuple(shared))
    bt = pa.Table.from_pylist(b.take_all())

    def cross(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or bt.num_rows == 0:
            cols = {c: pa.array([], pa.string()) for c in
                    list(batch.column_names) + list(bt.column_names)}
            return pa.table(cols)
        left = batch.take(pa.array([i for i in range(batch.num_rows)
                                    for _ in range(bt.num_rows)]))
        right = pa.concat_tables([bt] * batch.num_rows)
        for name in right.column_names:
            left = left.append_column(name, right[name])
        return left

    return a.map_batches(cross, batch_format="pyarrow")


def _expr_batch_eval(e: Expr, b: pa.Table) -> List[Optional[str]]:
    cols = {c: b[c].to_pylist() for c in b.column_names
            if not c.startswith("__")}
    return eval_expr_batch(e, cols, b.num_rows)


def _distinct(ds, num_partitions: int = 8):
    """Exact distinct over all binding columns (null-safe: key is the
    escaped row text)."""
    cols = _vars_of(ds)

    def key(b: pa.Table) -> pa.Table:
        import hashlib
        parts = [b[c].to_pylist() for c in cols]
        keys = [hashlib.sha256(
            "\x1e".join("\x00" if x is None else "1" + x for x in row)
            .encode()).hexdigest() for row in zip(*parts)]
        return b.append_column("__k", pa.array(keys, pa.string()))

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1).drop_columns(["__k"])

    return (ds.map_batches(key, batch_format="pyarrow")
            .groupby("__k").map_groups(first, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

def evaluate(node: Node, triples_ds, *, num_partitions: int = 8,
             graph_var: Optional[str] = None):
    """Compile-and-run: algebra node → Dataset of bindings."""
    ev = lambda n: evaluate(n, triples_ds, num_partitions=num_partitions,  # noqa: E731
                            graph_var=graph_var)

    if isinstance(node, GraphPattern):
        if isinstance(node.name, Var):
            return evaluate(node.child, triples_ds,
                            num_partitions=num_partitions,
                            graph_var=node.name.name)
        name_txt = format_term(node.name)
        scoped = triples_ds.map_batches(
            lambda b: b.filter(pc.equal(b["g"], pa.scalar(name_txt)))
            .drop_columns(["g"]),
            batch_format="pyarrow")
        return evaluate(node.child, scoped,
                        num_partitions=num_partitions)

    if isinstance(node, InlineData):
        import ray.data as rd

        if isinstance(node.var, str):
            return rd.from_arrow(pa.table({
                node.var: pa.array([format_term(t) for t in node.rows],
                                   pa.string())}))
        cols = {v: pa.array(
            [None if row[i] is None else format_term(row[i])
             for row in node.rows], pa.string())
            for i, v in enumerate(node.var)}
        return rd.from_arrow(pa.table(cols))

    if isinstance(node, BGP):
        parts = [_scan(triples_ds, p, graph_var=graph_var)
                 for p in node.patterns]
        out = parts[0]
        for nxt in parts[1:]:
            out = _cross_or_join(out, nxt, num_partitions=num_partitions)
        return out

    if isinstance(node, Join):
        return _cross_or_join(ev(node.left), ev(node.right),
                              num_partitions=num_partitions)

    if isinstance(node, LeftJoin):
        left, right = ev(node.left), ev(node.right)
        shared = sorted(set(_vars_of(left)) & set(_vars_of(right)))
        if not shared:
            raise ValueError("LeftJoin without shared variables")
        return _join_bindings(left, right, "left_outer",
                              num_partitions, tuple(shared))

    if isinstance(node, Union):
        left, right = ev(node.left), ev(node.right)
        lv, rv = _vars_of(left), _vars_of(right)
        allv = sorted(set(lv) | set(rv))

        def align(b: pa.Table, have: List[str]) -> pa.Table:
            cols = {}
            for c in allv:
                cols[c] = b[c] if c in have else \
                    pa.array([None] * b.num_rows, pa.string())
            return pa.table(cols)

        return left.map_batches(lambda b: align(b, lv), batch_format="pyarrow") \
            .union(right.map_batches(lambda b: align(b, rv),
                                     batch_format="pyarrow"))

    if isinstance(node, Minus):
        left, right = ev(node.left), ev(node.right)
        shared = sorted(set(_vars_of(left)) & set(_vars_of(right)))
        if not shared:
            return left
        marker = _distinct(
            right.map_batches(
                lambda b: pa.table({c: b[c] for c in shared}),
                batch_format="pyarrow"),
            num_partitions)
        marker = marker.map_batches(
            lambda b: b.append_column("__m", pa.array([1] * b.num_rows,
                                                      pa.int64())),
            batch_format="pyarrow")
        joined = _join_bindings(left, marker, "left_outer",
                                num_partitions, tuple(shared))
        return joined.map_batches(
            lambda b: b.filter(pc.is_null(b["__m"])).drop_columns(["__m"]),
            batch_format="pyarrow")

    if isinstance(node, Filter):
        child = ev(node.child)

        def filt(b: pa.Table) -> pa.Table:
            res = _expr_batch_eval(node.expr, b)
            keep = [i for i, r in enumerate(res)
                    if r is not None and ebv(_parse(r)) is True]
            return b.take(pa.array(keep, pa.int64()))

        return child.map_batches(filt, batch_format="pyarrow")

    if isinstance(node, Extend):
        child = ev(node.child)

        def ext(b: pa.Table) -> pa.Table:
            res = _expr_batch_eval(node.expr, b)
            return b.append_column(node.var, pa.array(res, pa.string()))

        return child.map_batches(ext, batch_format="pyarrow")

    if isinstance(node, Project):
        child = ev(node.child)
        keep = list(node.vars)
        return child.map_batches(
            lambda b: pa.table({c: b[c] for c in keep}),
            batch_format="pyarrow")

    if isinstance(node, Distinct):
        return _distinct(ev(node.child), num_partitions)

    if isinstance(node, OrderBy):
        return _eval_order_by(node, ev(node.child), limit=None)

    if isinstance(node, Slice):
        # top-k push-down: ORDER BY + LIMIT keeps a per-block local
        # top-k before the sort exchange (exec.rs sorts everything; at
        # scale only k×blocks rows need to move)
        if node.limit is not None and isinstance(node.child, OrderBy):
            inner = ev(node.child.child)
            k = node.offset + node.limit
            child = _eval_order_by(node.child, inner, limit=k)
            if node.offset == 0:
                return child.limit(node.limit)
        else:
            child = ev(node.child)
        if node.offset == 0:
            return child if node.limit is None else child.limit(node.limit)
        # OFFSET: driver-side skip of a small sorted prefix
        import ray.data as rd
        n = node.offset + (node.limit or 0)
        rows = child.limit(n).take_all() if node.limit else child.take_all()
        rows = rows[node.offset:]
        if not rows:
            return child.limit(0)
        return rd.from_arrow(pa.Table.from_pylist(rows))

    if isinstance(node, Group):
        child = ev(node.child)
        gv = list(node.group_vars)
        aggs = list(node.aggs)

        def agg_group(group: pa.Table) -> pa.Table:
            out = {c: [group[c][0].as_py()] for c in gv}
            for a in aggs:
                out[a.alias] = [_run_agg(a, group)]
            return pa.table(out)

        if gv:
            return child.groupby(gv).map_groups(agg_group,
                                                batch_format="pyarrow")
        # single implicit group: reduce driver-side (small)
        whole = pa.Table.from_pylist(child.take_all())
        if whole.num_rows == 0:
            whole = pa.table({c: pa.array([], pa.string())
                              for c in _vars_of(child)})
        import ray.data as rd
        return rd.from_arrow(agg_group(whole))

    if isinstance(node, PathPlus):
        return _path_plus(node, triples_ds, num_partitions)

    if isinstance(node, PathStar):
        import ray.data as rd

        plus = _path_plus(
            PathPlus(node.pred, node.seeds, o_var=node.o_var,
                     max_rounds=node.max_rounds),
            triples_ds, num_partitions)
        seeds = pa.table({node.o_var: pa.array(
            sorted({format_term(s) for s in node.seeds}), pa.string())})
        return _distinct(plus.union(rd.from_arrow(seeds)), num_partitions)

    if isinstance(node, Exists):
        left, right = ev(node.left), ev(node.right)
        shared = sorted(set(_vars_of(left)) & set(_vars_of(right)))
        if not shared:
            raise ValueError("Exists without shared variables")
        marker = _distinct(
            right.map_batches(lambda b: pa.table({c: b[c] for c in shared}),
                              batch_format="pyarrow"),
            num_partitions)
        marker = marker.map_batches(
            lambda b: b.append_column("__m", pa.array([1] * b.num_rows,
                                                      pa.int64())),
            batch_format="pyarrow")
        joined = _join_bindings(left, marker, "left_outer",
                                num_partitions, tuple(shared))
        pred = pc.is_null if node.negated else pc.is_valid
        return joined.map_batches(
            lambda b: b.filter(pred(b["__m"])).drop_columns(["__m"]),
            batch_format="pyarrow")

    raise TypeError(f"unknown algebra node {type(node)}")


def _run_agg(a: Agg, group: pa.Table) -> Optional[str]:
    """One aggregate over one group (aggregate_iter.rs:80-190)."""
    if a.fn == "COUNT" and a.expr is None:
        return format_term((2, str(group.num_rows), XSD_INTEGER, "", 0))
    vals = [v for v in _expr_batch_eval(a.expr, group) if v is not None]
    if a.distinct:
        vals = sorted(set(vals))
    if a.fn == "COUNT":
        return format_term((2, str(len(vals)), XSD_INTEGER, "", 0))
    if a.fn == "SAMPLE":
        return min(vals) if vals else None
    if a.fn == "GROUP_CONCAT":
        parts = []
        for v in vals:
            t = _parse(v)
            parts.append(t[1] if t and t[0] == 2 else v)
        return format_term((2, a.separator.join(parts), XSD + "string", "", 0))
    terms = [_parse(v) for v in vals]
    terms = [t for t in terms if t is not None]
    if not terms:
        return None
    if a.fn in ("MIN", "MAX"):
        pick = min(terms, key=sort_key) if a.fn == "MIN" else \
            max(terms, key=sort_key)
        return format_term(pick)
    nums = [value_of(t) for t in terms]
    if any(v is None or v[0] != "num" for v in nums):
        return None  # type error → aggregate error
    xs = [v[1] for v in nums]
    if a.fn == "SUM":
        s = sum(xs)
        return format_term(_num_term(s))
    if a.fn == "AVG":
        s = sum(xs) / len(xs)
        return format_term(_num_term(s))
    raise ValueError(f"unknown aggregate {a.fn}")


def _num_term(x) -> Term:
    if isinstance(x, int):
        return (2, str(x), XSD_INTEGER, "", 0)
    if float(x).is_integer():
        return (2, str(int(x)), XSD_INTEGER, "", 0)
    return (2, repr(float(x)), XSD_DOUBLE, "", 0)


def _path_plus(node: PathPlus, triples_ds, num_partitions: int):
    """Transitive closure pred+ from seed subjects: frontier loop of
    hash joins with per-round dedup (exec.rs:274-482 / path_or_more.rs;
    same shape as the reasoner fixpoint, SURVEY §2.10)."""
    import ray.data as rd

    pred_txt = format_term(node.pred)
    src_ds = triples_ds.scan(p=pred_txt) \
        if hasattr(triples_ds, "scan") else triples_ds  # pruned POS read
    edges = src_ds.map_batches(
        lambda b: (lambda f: pa.table({
            "src": pc.cast(f["s"], pa.string()),
            "dst": pc.cast(f["o"], pa.string())}))(
            b.filter(pc.equal(b["p"], pa.scalar(pred_txt)))),
        batch_format="pyarrow").materialize()

    n_edges = edges.count()
    if node.seeds is None:
        # variable subject: full closure as (s_var, o_var) pairs
        if n_edges > _PATH_LOCAL_EDGE_LIMIT:
            raise ValueError(
                f"?s {format_term(node.pred)}+ ?o closure over {n_edges} "
                "edges exceeds the local limit — bind the subject or "
                "materialize the closure explicitly")
        adj: Dict[str, List[str]] = {}
        for b in edges.iter_batches(batch_format="pyarrow"):
            for a, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
                adj.setdefault(a, []).append(d)
        s_out: List[str] = []
        o_out: List[str] = []
        for start in sorted(adj):
            seen: set = set()
            frontier = set(adj[start])
            for _ in range(node.max_rounds):
                if not frontier:
                    break
                seen |= frontier
                frontier = {d for a in frontier
                            for d in adj.get(a, ())} - seen
            for d in sorted(seen):
                s_out.append(start)
                o_out.append(d)
        return rd.from_arrow(pa.table({
            node.s_var: pa.array(s_out, pa.string()),
            node.o_var: pa.array(o_out, pa.string())}))

    seeds = {format_term(s) for s in node.seeds}
    reached: set = set()
    frontier = set(seeds)
    if n_edges <= _PATH_LOCAL_EDGE_LIMIT:
        # adaptive: per-predicate edge sets are usually tiny relative
        # to the corpus — a driver-side BFS beats paying the per-round
        # join+shuffle fixed cost max_rounds times.  Large edge sets
        # fall through to the distributed frontier loop.
        adj: Dict[str, List[str]] = {}
        for b in edges.iter_batches(batch_format="pyarrow"):
            for a, d in zip(b["src"].to_pylist(), b["dst"].to_pylist()):
                adj.setdefault(a, []).append(d)
        for _ in range(node.max_rounds):
            if not frontier:
                break
            nxt = {d for a in frontier for d in adj.get(a, ())}
            frontier = nxt - reached - seeds
            reached |= nxt
    else:
        for _ in range(node.max_rounds):
            if not frontier:
                break
            fr = rd.from_arrow(pa.table({"src": pa.array(sorted(frontier),
                                                         pa.string())}))
            step = _join_bindings(fr, edges, "inner", num_partitions,
                                  ("src",))
            nxt = {r["dst"]
                   for r in step.select_columns(["dst"]).take_all()}
            frontier = nxt - reached - seeds
            reached |= nxt
    rows = sorted(reached)
    tbl = pa.table({node.o_var: pa.array(rows, pa.string())})
    return rd.from_arrow(tbl)


#: edge-count threshold below which pred+/pred* closure runs as a
#: driver-side BFS over the (already pred-pruned) edge list
_PATH_LOCAL_EDGE_LIMIT = 2_000_000
