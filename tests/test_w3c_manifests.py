"""W3C-format conformance manifests (VERDICT r4 next-round #5).

Runs every ``manifest.ttl`` under ``tests/w3c/`` using the repo's OWN
Turtle parser to read the manifest (dogfooding), dispatching on the
official rdf-tests / rdf-canon test types:

- ``rdfc:RDFC10EvalTest``      — canonicalize input .nq, byte-compare
- ``rdfc:RDFC10MapTest``       — issued-identifier map vs JSON result
- ``rdfc:RDFC10NegativeEvalTest`` — must raise ToxicGraphError under
  the manifest's pinned work limits (``sx:`` params)
- ``rdft:TestNTriplesPositiveSyntax`` / ``…NegativeSyntax``
- ``rdft:TestTurtleEval`` (isomorphism compare) / ``…NegativeSyntax``

The vendored slice transcribes the cases the reference embeds inline
(c14n/src/rdfc10.rs:612-860) plus spec-derived syntax cases; the
published suites' files drop into the same directories unchanged.
Unknown test types are SKIPPED (documented optional features), so a
full published manifest can be vendored without breaking the run.
"""

import json
import os
from typing import Dict, List, Optional, Tuple

import pytest

from sophia_rs_ray.c14n import (
    C14nError, isomorphic, normalize_quads, relabel_quads,
)
from sophia_rs_ray.ntriples import parse_document
from sophia_rs_ray.terms import KIND_IRI, Term
from sophia_rs_ray.turtle import parse_turtle

W3C_DIR = os.path.join(os.path.dirname(__file__), "w3c")

MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFC = "https://w3c.github.io/rdf-canon/tests/vocab#"
RDFT = "http://www.w3.org/ns/rdftest#"
SX = "https://example.org/sophia-rs-ray/test-params#"


def _load_manifest(path: str):
    """manifest.ttl → list of entry dicts {type, name, action, result,
    params}, traversing the mf:entries rdf:List with the repo's own
    Turtle machinery."""
    base = "file://" + os.path.abspath(path)
    with open(path, encoding="utf-8") as f:
        triples = parse_turtle(f.read(), base=base)
    spo: Dict[Tuple, List[Tuple[Term, Term]]] = {}
    for s, p, o in triples:
        spo.setdefault(s, []).append((p, o))

    def prop(subj: Term, pred_iri: str) -> Optional[Term]:
        for p, o in spo.get(subj, ()):
            if p[0] == KIND_IRI and p[1] == pred_iri:
                return o
        return None

    manifest = next(s for s in spo
                    if prop(s, RDF + "type")
                    and prop(s, RDF + "type")[1] == MF + "Manifest")
    entries = []
    node = prop(manifest, MF + "entries")
    while node is not None and not (node[0] == KIND_IRI
                                    and node[1] == RDF + "nil"):
        entry = prop(node, RDF + "first")
        node = prop(node, RDF + "rest")
        if entry is None:
            break
        typ = prop(entry, RDF + "type")
        action = prop(entry, MF + "action")
        result = prop(entry, MF + "result")
        name = prop(entry, MF + "name")
        params = {}
        for p, o in spo.get(entry, ()):
            if p[0] == KIND_IRI and p[1].startswith(SX):
                params[p[1][len(SX):]] = float(o[1])
        entries.append({
            "id": entry[1],
            "type": typ[1] if typ else "",
            "name": name[1] if name else entry[1],
            "action": _to_path(action),
            "result": _to_path(result),
            "params": params,
        })
    return entries


def _to_path(term: Optional[Term]) -> Optional[str]:
    if term is None:
        return None
    assert term[1].startswith("file://"), term
    return term[1][len("file://"):]


def _read(path: str) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read()


def _collect_cases():
    cases = []
    for sub in sorted(os.listdir(W3C_DIR)):
        mpath = os.path.join(W3C_DIR, sub, "manifest.ttl")
        if os.path.exists(mpath):
            for e in _load_manifest(mpath):
                cases.append(pytest.param(
                    e, id=f"{sub}:{e['name'][:48]}"))
    return cases


@pytest.mark.parametrize("entry", _collect_cases())
def test_w3c_manifest_entry(entry):
    typ = entry["type"]
    action = entry["action"]

    if typ == RDFC + "RDFC10EvalTest":
        quads = parse_document(_read(action), quads=True)
        got = normalize_quads(quads)
        assert got == _read(entry["result"])
    elif typ == RDFC + "RDFC10MapTest":
        quads = parse_document(_read(action), quads=True)
        _, issued = relabel_quads(quads)
        want = json.loads(_read(entry["result"]))
        assert {k: v for k, v in issued.items() if k in want} == want \
            and set(issued) == set(want)
    elif typ == RDFC + "RDFC10NegativeEvalTest":
        quads = parse_document(_read(action), quads=True)
        kw = {}
        if "depthFactor" in entry["params"]:
            kw["depth_factor"] = entry["params"]["depthFactor"]
        if "permutationLimit" in entry["params"]:
            kw["permutation_limit"] = \
                int(entry["params"]["permutationLimit"])
        with pytest.raises(C14nError):
            normalize_quads(quads, **kw)
    elif typ in (RDFT + "TestNTriplesPositiveSyntax",
                 RDFT + "TestNQuadsPositiveSyntax"):
        parse_document(_read(action),
                       quads=typ.endswith("NQuadsPositiveSyntax"))
    elif typ in (RDFT + "TestNTriplesNegativeSyntax",
                 RDFT + "TestNQuadsNegativeSyntax"):
        with pytest.raises(Exception):
            parse_document(_read(action),
                           quads=typ.endswith("NQuadsNegativeSyntax"))
    elif typ == RDFT + "TestTurtleEval":
        got = parse_turtle(_read(action),
                           base="file://" + os.path.abspath(action))
        want = parse_document(_read(entry["result"]))
        assert isomorphic([(s, p, o, None) for s, p, o in got], want), \
            entry["name"]
    elif typ == RDFT + "TestTurtleNegativeSyntax":
        with pytest.raises(Exception):
            parse_turtle(_read(action),
                         base="file://" + os.path.abspath(action))
    else:
        pytest.skip(f"unimplemented optional test type {typ}")
