"""Cross-parser differential gate: every N-Triples document is also a
valid Turtle document, so the two independent parser implementations
must produce identical triples.  (N-Quads is NOT a TriG subset — TriG
scopes graphs with blocks — so no NQ/TriG variant.)  Random documents
stress escapes, unicode, lang tags, typed literals, bnodes, comments
and irregular whitespace."""

import random

import pytest

from sophia_rs_ray.ntriples import parse_document, serialize_triple
from sophia_rs_ray.turtle import parse_turtle

EX = "http://ex.org/"


def _esc(lex):
    return (lex.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r")
            .replace("\t", "\\t"))


def _random_term(rng, pos):
    r = rng.random()
    if pos == "p" or r < 0.35:
        return f"<{EX}{rng.choice('pqr')}{rng.randint(0, 5)}>"
    if r < 0.5 and pos != "p":
        return f"_:b{rng.randint(0, 4)}"
    # literal (object position only reaches here in practice)
    lex = rng.choice(["", "plain", 'qu"ote', "back\\slash", "tab\there",
                      "nl\nline", "héllo☃", "ascii", "0", " pad "])
    lit = f'"{_esc(lex)}"'
    r2 = rng.random()
    if r2 < 0.3:
        return lit + "@" + rng.choice(["en", "en-GB", "fr-latn-fr"])
    if r2 < 0.55:
        return lit + f"^^<{EX}dt{rng.randint(0, 2)}>"
    return lit


def _random_nt_doc(rng, quads=False):
    lines = []
    triples = []
    for _ in range(rng.randint(5, 20)):
        if rng.random() < 0.15:
            lines.append("# comment %d" % rng.randint(0, 99))
            continue
        if rng.random() < 0.1:
            lines.append(rng.choice(["", "   ", "\t"]))
            continue
        s = _random_term(rng, "s")
        while s.startswith('"'):
            s = _random_term(rng, "s")
        p = _random_term(rng, "p")
        o = _random_term(rng, "o")
        g = None
        sep = rng.choice([" ", "  ", "\t", " \t "])
        if quads and rng.random() < 0.7:
            g = f"<{EX}g{rng.randint(0, 2)}>"
            lines.append(f"{s}{sep}{p}{sep}{o}{sep}{g} .")
        else:
            lines.append(f"{s}{sep}{p}{sep}{o} .{rng.choice(['', ' ', '  # t'])}")
        triples.append((s, p, o, g))
    return "\n".join(lines), triples


def _canon(items):
    return sorted(serialize_triple(*it) for it in items)


@pytest.mark.parametrize("seed", range(30))
def test_nt_documents_parse_identically_as_turtle(seed):
    rng = random.Random(2500 + seed)
    doc, _ = _random_nt_doc(rng, quads=False)
    nt = parse_document(doc)
    tt = parse_turtle(doc)
    as_quads = [(t[0], t[1], t[2], None) for t in tt]
    assert _canon(nt) == _canon(as_quads), f"seed={seed}\ndoc:\n{doc}"
