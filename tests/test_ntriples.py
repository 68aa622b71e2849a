"""NT/NQ parser + serializer tests over the reference's inline corpora
(``turtle/src/test.rs:4-24`` NT_SAMPLES, ``:26+`` NQ_SAMPLES) including
round-trip: parse → serialize → re-parse → same triples."""

import pytest

from sophia_rs_ray.ntriples import (
    NtParseError,
    format_nt_batch,
    parse_document,
    parse_line,
    parse_nt_batch,
    serialize_document,
    serialize_triple,
)
from sophia_rs_ray.terms import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_TRIPLE

# (name, content, expected_count) — lifted from turtle/src/test.rs:4-24
NT_SAMPLES = [
    ("empty", "", 0),
    ("comment", "# a comment", 0),
    ("version", 'VERSION "1.2"', 0),
    ("triple i i i", "<x:s> <x:p> <x:o>.              ", 1),
    ("triple b i i", "_:s   <x:p> <x:o>.              ", 1),
    ("triple i i b", "<x:s> <x:p> _:o.                ", 1),
    ("triple b i b", "_:s   <x:p> _:o.                ", 1),
    ("triple i i l", '<x:s> <x:p> "o".                ', 1),
    ("triple b i l", '_:s   <x:p> "o".                ', 1),
    ("triple i i ld", '<x:s> <x:p> "o"^^<x:d>.         ', 1),
    ("triple b i ld", '_:s   <x:p> "o"^^<x:d>.         ', 1),
    ("triple i i ll", '<x:s> <x:p> "o"@en-UK.          ', 1),
    ("triple b i ll", '_:s   <x:p> "o"@en-UK.          ', 1),
    ("triple i i lb", '<x:s> <x:p> "o"@en-UK--ltr.     ', 1),
    ("triple b i lb", '_:s   <x:p> "o"@en-UK--rtl.     ', 1),
    ("triple i i t", '<x:s> <x:p> <<(_:a <x:b> "c")>>.', 1),
    ("triple b i t", '_:s   <x:p> <<(_:a <x:b> "c")>>.', 1),
    ("escape",
     '<x:s> <x:p> "\\u0001\\u0002\\u0003\\u0004\\u0005\\u0006\\u0006\\u0007'
     '\\u0008\\u0009\\u000A\\u000B\\u000C\\u000D\\u000E\\u000F\\u0011\\u0012'
     '\\u0013\\u0014\\u0015\\u0016\\u0016\\u0017\\u0018\\u0019\\u001A\\u001B'
     '\\u001C\\u001D\\u001E\\u001F\\"\\\\￾￿".', 1),
    ("escape useless", '<x:s> <x:p> "\\u006f".', 1),
]

NQ_EXTRA = [
    ("quad i i i i", "<x:s> <x:p> <x:o> <x:g>.              ", 1),
    ("quad b i ld b", '_:s   <x:p> "o"^^<x:d> _:g.           ', 1),
    ("quad i i lb b", '<x:s> <x:p> "o"@en-UK--ltr _:g.       ', 1),
    ("quad i i t b", '<x:s> <x:p> <<(_:a <x:b> "c")>> _:g.  ', 1),
]

GNQ_SAMPLES = [
    ("triple of bnodes", "_:s _:p _:o.", 1),
    ("triple of literals", '"s" "p" "o".', 1),
]


@pytest.mark.parametrize("name,content,n", NT_SAMPLES)
def test_nt_samples_parse(name, content, n):
    got = parse_document(content)
    assert len(got) == n


@pytest.mark.parametrize("name,content,n", NT_SAMPLES)
def test_nt_samples_roundtrip(name, content, n):
    first = parse_document(content)
    text = serialize_document(first, canonical=True)
    again = parse_document(text)
    # canonical mode lowercases language tags → compare with case folded
    def norm(q):
        return tuple((t[0], t[1], t[2], t[3].lower(), t[4]) if t else None
                     for t in q)
    assert [norm(q) for q in again] == [norm(q) for q in first]


@pytest.mark.parametrize("name,content,n", NQ_EXTRA)
def test_nq_samples(name, content, n):
    got = parse_document(content, quads=True)
    assert len(got) == n
    assert got[0][3] is not None
    text = serialize_document(got, canonical=True)
    again = parse_document(text, quads=True)
    assert len(again) == n


@pytest.mark.parametrize("name,content,n", GNQ_SAMPLES)
def test_generalized(name, content, n):
    with pytest.raises(NtParseError):
        parse_document(content, strict=True)
    got = parse_document(content, quads=True, strict=False)
    assert len(got) == n


def test_parse_details():
    (s, p, o, g), = parse_document('<x:s> <x:p> "o"@en-UK--ltr.')
    assert s == (KIND_IRI, "x:s", "", "", 0)
    assert o[0] == KIND_LITERAL and o[3] == "en-UK" and o[4] == 1
    (s, p, o, g), = parse_document('_:s <x:p> <<(_:a <x:b> "c")>>.')
    assert o[0] == KIND_TRIPLE
    assert o[1] == '<<( _:a <x:b> "c" )>>'
    (s, p, o, g), = parse_document('<x:s> <x:p> "\\u006f".')
    assert o[1] == "o"


def test_escape_roundtrip_exact():
    # serializer goldens in the style of turtle/src/serializer/nt.rs:284-306
    lex = '\x01\x08\t\n"\\￾￿'
    from sophia_rs_ray.terms import iri, literal
    line = serialize_triple(iri("x:s"), iri("x:p"), literal(lex))
    assert line == '<x:s> <x:p> "\\u0001\\b\\t\\n\\"\\\\\\uFFFE\\uFFFF" .'
    (s2, p2, o2, _), = parse_document(line)
    assert o2[1] == lex


def test_errors_positions():
    with pytest.raises(NtParseError):
        parse_line("<x:s> <x:p>", 1)
    with pytest.raises(NtParseError):
        parse_line('<x:s> <x:p> "o" extra.', 1)
    with pytest.raises(NtParseError):
        parse_line('"lit" <x:p> <x:o>.', 1)  # literal subject in strict mode


def test_batch_adapters():
    lines = ['<x:s> <x:p> "o"@en-UK.', "# c", "bad line", '_:s <x:p> <x:o>.']
    cols, errors = parse_nt_batch(lines, urls=[f"u{i}" for i in range(4)])
    assert len(cols["s_lex"]) == 2
    assert len(errors) == 1 and errors[0][0] == "u2"
    out = format_nt_batch(cols)
    assert list(out["o"]) == ['"o"@en-uk', "<x:o>"]
    assert list(out["s"]) == ["<x:s>", "_:s"]


def test_format_batch_matches_scalar():
    import random
    from sophia_rs_ray.terms import (bnode, format_term, int_literal, iri,
                                     langlit, literal, triple_term)
    rng = random.Random(7)
    terms = []
    for _ in range(200):
        k = rng.randrange(5)
        if k == 0:
            terms.append(bnode(f"b{rng.randrange(10)}"))
        elif k == 1:
            terms.append(iri(f"http://ex.org/{rng.randrange(10)}"))
        elif k == 2:
            lex = "".join(chr(rng.choice([65, 9, 10, 34, 92, 0xFFFE]))
                          for _ in range(rng.randrange(5)))
            terms.append(rng.choice([literal(lex), langlit(lex, "en-UK"),
                                     int_literal(rng.randrange(99))]))
        elif k == 3:
            terms.append(triple_term(bnode("a"), iri("x:p"), literal("c")))
        else:
            from sophia_rs_ray.terms import variable
            terms.append(variable(f"v{rng.randrange(5)}"))
    batch = {
        "s_kind": [t[0] for t in terms], "s_lex": [t[1] for t in terms],
        "s_dt": [t[2] for t in terms], "s_lang": [t[3] for t in terms],
        "s_dir": [t[4] for t in terms],
    }
    for c in ("p", "o"):
        for f in ("kind", "lex", "dt", "lang", "dir"):
            batch[f"{c}_{f}"] = batch[f"s_{f}"]
    out = format_nt_batch(batch)
    expected = [format_term(t, canonical=True) for t in terms]
    assert list(out["s"]) == expected
    assert list(out["o"]) == expected
