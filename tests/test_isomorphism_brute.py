"""Isomorphism vs brute force: random bnode-heavy graphs checked by
the engine's canonical-digest `isomorphic()` against an exhaustive
bnode-permutation oracle.  Positives are random relabelings; negatives
are single-edge mutations — the near-miss shapes (cycles, stars,
symmetric cliques) where hash-refinement canonicalizers are easiest to
get wrong.  Complements the transcribed reference matrix and the
relabeling-invariance property gate with ground-truth NEGATIVES."""

import itertools
import random

import pytest

from sophia_rs_ray.c14n import isomorphic
from sophia_rs_ray.ntriples import parse_document

IRIS = [f"<http://ex.org/n{i}>" for i in range(4)]
PREDS = [f"<http://ex.org/p{i}>" for i in range(2)]
BNODES = [f"_:b{i}" for i in range(4)]


def _random_graph(rng):
    nodes = IRIS + BNODES
    triples = set()
    for _ in range(rng.randint(5, 12)):
        s = rng.choice(nodes if rng.random() < 0.75 else BNODES)
        o = rng.choice(nodes if rng.random() < 0.75 else BNODES)
        triples.add((s, rng.choice(PREDS), o))
    # bias toward symmetric/cyclic bnode structure
    if rng.random() < 0.6:
        k = rng.randint(2, 4)
        cyc = rng.sample(BNODES, k)
        for i in range(k):
            triples.add((cyc[i], PREDS[0], cyc[(i + 1) % k]))
    return sorted(triples)


def _relabel(triples, mapping):
    return sorted((mapping.get(s, s), p, mapping.get(o, o))
                  for s, p, o in triples)


def _brute_iso(a, b):
    """Exhaustive bnode-bijection check (≤4 bnodes → ≤24 mappings)."""
    if len(a) != len(b):
        return False
    ba = sorted({t for tr in a for t in (tr[0], tr[2])
                 if t.startswith("_:")})
    bb = sorted({t for tr in b for t in (tr[0], tr[2])
                 if t.startswith("_:")})
    if len(ba) != len(bb):
        return False
    sa = set(a)
    for perm in itertools.permutations(bb):
        m = dict(zip(perm, ba))
        if set(_relabel(b, m)) == sa:
            return True
    return False


def _quads(triples):
    doc = "\n".join(f"{s} {p} {o} ." for s, p, o in triples)
    return parse_document(doc)


@pytest.mark.parametrize("seed", range(40))
def test_isomorphic_matches_brute_force(seed):
    rng = random.Random(7100 + seed)
    a = _random_graph(rng)

    # positive: random bnode relabeling
    perm = BNODES[:]
    rng.shuffle(perm)
    b_pos = _relabel(a, dict(zip(BNODES, (p + "x" for p in perm))))
    assert _brute_iso(a, b_pos)
    assert isomorphic(_quads(a), _quads(b_pos)), \
        f"seed={seed}: engine rejects a true relabeling"

    # near-miss: mutate one triple (redirect an endpoint)
    b_neg = list(b_pos)
    i = rng.randrange(len(b_neg))
    s, p, o = b_neg[i]
    nodes = IRIS + [t + "x" for t in BNODES]
    new_o = rng.choice([n for n in nodes if n != o])
    b_neg[i] = (s, p, new_o)
    b_neg = sorted(set(b_neg))
    want = _brute_iso(a, b_neg)
    got = isomorphic(_quads(a), _quads(b_neg))
    assert got == want, (
        f"seed={seed}: engine={got} brute={want}\n"
        f"a={a}\nb={b_neg}")
