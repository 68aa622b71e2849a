"""RDFS forward-chaining entailment (reference ``reasoner/src/``).

The reference saturates an in-memory graph to fixpoint with rayon-
parallel rule application (``reasoner/src/ruleset/_rdfs.rs:35-97``).
Distributed shape: RDF schema triples are a vanishingly small slice of
a web-scale graph, so the fixpoint is *split*:

1. collect the schema triples (one filtered pass, small side);
2. close them on the DRIVER (transitive closures of rdfs:subClassOf /
   rdfs:subPropertyOf — rules rdfs11 / rdfs5 — plus inherited
   domain/range maps);
3. ONE broadcast ``map_batches`` pass expands every instance triple
   against the closed schema (rdfs7 super-properties, rdfs2 domain
   types, rdfs3 range types, rdfs9 super-classes) — no iterative
   shuffle over the big table, because instance-derived triples are
   all ``rdf:type`` atoms that the class closure already saturates;
4. exact dedup (SetGraph semantics) of original ∪ inferred.

Implemented rules: rdfs2, rdfs3, rdfs5, rdfs7, rdfs9, rdfs11 (the ρdf
core).  Container-membership, reflexivity (rdfs4/6/8/10/12/13) and
D-entailment are out of scope — the reference enables them behind its
full ruleset (``_rdfs.rs:236-330``).
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import pyarrow as pa
import pyarrow.compute as pc

RDF_TYPE_NT = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SUBCLASS_NT = f"<{RDFS}subClassOf>"
SUBPROP_NT = f"<{RDFS}subPropertyOf>"
DOMAIN_NT = f"<{RDFS}domain>"
RANGE_NT = f"<{RDFS}range>"

_SCHEMA_PREDS = (SUBCLASS_NT, SUBPROP_NT, DOMAIN_NT, RANGE_NT)


def _transitive_close(edges: List[Tuple[str, str]]) -> Dict[str, Set[str]]:
    """sup[x] = all strict ancestors of x (tiny graphs; driver-side)."""
    direct: Dict[str, Set[str]] = {}
    for a, b in edges:
        direct.setdefault(a, set()).add(b)
    sup: Dict[str, Set[str]] = {}

    def visit(x: str) -> Set[str]:
        if x in sup:
            return sup[x]
        sup[x] = set()  # cycle guard
        acc: Set[str] = set()
        for b in direct.get(x, ()):
            acc.add(b)
            acc |= visit(b)
        sup[x] = acc
        return acc

    for x in list(direct):
        visit(x)
    return {k: v for k, v in sup.items() if v}


class RdfsSchema:
    """Closed schema: the broadcastable small side."""

    def __init__(self, schema_rows: List[Tuple[str, str, str]]):
        sc = [(s, o) for s, p, o in schema_rows if p == SUBCLASS_NT]
        sp = [(s, o) for s, p, o in schema_rows if p == SUBPROP_NT]
        self.sup_class = _transitive_close(sc)
        self.sup_prop = _transitive_close(sp)
        self.domain: Dict[str, Set[str]] = {}
        self.range: Dict[str, Set[str]] = {}
        for s, p, o in schema_rows:
            if p == DOMAIN_NT:
                self.domain.setdefault(s, set()).add(o)
            elif p == RANGE_NT:
                self.range.setdefault(s, set()).add(o)

    def class_up(self, c: str) -> Set[str]:
        return self.sup_class.get(c, set())

    def closure_triples(self) -> List[Tuple[str, str, str]]:
        """rdfs11 / rdfs5: the closed subClassOf / subPropertyOf edges."""
        out = []
        for c, sups in self.sup_class.items():
            out += [(c, SUBCLASS_NT, d) for d in sups]
        for p, sups in self.sup_prop.items():
            out += [(p, SUBPROP_NT, q) for q in sups]
        return out

    def expand_row(self, s: str, p: str, o: str) -> List[Tuple[str, str, str]]:
        """All triples entailed by one instance triple (excl. itself)."""
        out: List[Tuple[str, str, str]] = []
        types: Set[str] = set()
        if p == RDF_TYPE_NT:
            types |= self.class_up(o)
        preds = {p} | self.sup_prop.get(p, set())
        for q in preds:
            if q != p:
                out.append((s, q, o))  # rdfs7
            for c in self.domain.get(q, ()):          # rdfs2
                types.add(c)
                types |= self.class_up(c)
            if o.startswith("<"):                     # rdfs3 (IRI objects)
                for c in self.range.get(q, ()):
                    out.append((o, RDF_TYPE_NT, c))
                    out += [(o, RDF_TYPE_NT, d) for d in self.class_up(c)]
        out += [(s, RDF_TYPE_NT, c) for c in types]
        return out


def collect_schema(nt_ds) -> RdfsSchema:
    """One filtered pass → driver-side closed schema (small side)."""
    preds = pa.array(list(_SCHEMA_PREDS))
    small = nt_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["p"], value_set=preds))
        .select(["s", "p", "o"]),
        batch_format="pyarrow")
    rows = [(r["s"], r["p"], r["o"]) for r in small.take_all()]
    return RdfsSchema(rows)


def rdfs_saturate(nt_ds, *, dedup: bool = True):
    """Dataset of NT (s,p,o) rows → RDFS-entailed rows (orig ∪ inferred,
    distinct).  The schema is collected once and shipped inside the
    batch closure (small, static)."""
    import ray.data as rd

    schema = collect_schema(nt_ds)

    def expand(b: pa.Table) -> pa.Table:
        s_l = b["s"].to_pylist()
        p_l = b["p"].to_pylist()
        o_l = b["o"].to_pylist()
        out_s, out_p, out_o = list(s_l), list(p_l), list(o_l)
        for s, p, o in zip(s_l, p_l, o_l):
            for ns, np_, no in schema.expand_row(s, p, o):
                out_s.append(ns)
                out_p.append(np_)
                out_o.append(no)
        return pa.table({"s": pa.array(out_s, pa.large_string()),
                         "p": pa.array(out_p, pa.large_string()),
                         "o": pa.array(out_o, pa.large_string())})

    expanded = nt_ds.map_batches(expand, batch_format="pyarrow")
    closure = schema.closure_triples()
    if closure:
        extra = pa.table({
            "s": pa.array([t[0] for t in closure], pa.large_string()),
            "p": pa.array([t[1] for t in closure], pa.large_string()),
            "o": pa.array([t[2] for t in closure], pa.large_string())})
        expanded = expanded.union(rd.from_arrow(extra))
    if dedup:
        from .stages.dedup import dedup_triples
        expanded = dedup_triples(expanded, carry_min=())
    return expanded
