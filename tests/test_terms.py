"""Term-level golden tests, lifted from the reference's matrices:

- ``cmp_terms`` order matrix (``api/src/term.rs:843-876``),
- eq/hash semantics (``api/src/term.rs:389-501``),
- NT formatting + escape table (``turtle/src/serializer/_common.rs:75-119``,
  ``turtle/src/serializer/nt.rs:171-222``).
"""

import pytest

from sophia_rs_ray.terms import (
    DIR_LTR,
    DIR_RTL,
    XSD_INTEGER,
    XSD_STRING,
    bnode,
    bool_literal,
    encoded_sort_key,
    escape_literal,
    format_term,
    from_native,
    int_literal,
    iri,
    langlit,
    literal,
    sort_key,
    term_eq,
    term_id,
    triple_term,
    try_to_float,
    variable,
)


def ez(txt):
    """Mini term notation mirroring the reference's ez_term
    (``api/src/term.rs:808-836``): <iri>, _:b, 'lex', 'lex'@tg,
    'lex'@tg--dir, 42, ?var, <<_:s <p> 'o'>> (triple term)."""
    txt = txt.strip()
    if txt.startswith("<<"):
        inner = txt[2:-2].strip()
        parts = _split_top(inner)
        return triple_term(ez(parts[0]), ez(parts[1]), ez(parts[2]))
    if txt.startswith("<"):
        return iri(txt[1:-1])
    if txt.startswith("_:"):
        return bnode(txt[2:])
    if txt.startswith("?"):
        return variable(txt[1:])
    if txt.startswith("'"):
        end = txt.rindex("'")
        lex = txt[1:end]
        rest = txt[end + 1:]
        if rest.startswith("@"):
            if "--" in rest:
                tag, d = rest[1:].split("--")
                return langlit(lex, tag, DIR_LTR if d == "ltr" else DIR_RTL)
            return langlit(lex, rest[1:])
        return literal(lex)
    return int_literal(int(txt))


def _split_top(s):
    parts, depth, cur, in_q = [], 0, "", False
    for c in s:
        if c == "'":
            in_q = not in_q
        if c == " " and depth == 0 and not in_q:
            if cur:
                parts.append(cur)
            cur = ""
            continue
        cur += c
    if cur:
        parts.append(cur)
    return parts


# the full cmp matrix from api/src/term.rs:843-876 (t1 < t2)
CMP_CASES = [
    ("<tag:a>", "<tag:b>"),
    ("_:u", "_:v"),
    ("'a'", "'b'"),
    ("10", "2"),
    ("'a'@en", "'a'@fr"),
    ("'a'@en--ltr", "'a'@en--rtl"),
    ("?x", "?y"),
    ("<<_:s <tag:p> 'o1'>>", "<<_:s <tag:p> 'o2'>>"),
    ("<<_:s <tag:p1> 'o2'>>", "<<_:s <tag:p2> 'o1'>>"),
    ("<<_:s1 <tag:p2> 'o'>>", "<<_:s2 <tag:p1> 'o'>>"),
    ("2", "'10'"),
    ("'b'@en", "'a'"),
    ("'b'@en--ltr", "'a'@en"),
    ("_:b", "<tag:a>"),
    ("_:b", "'s'"),
    ("_:b", "<<_:q <tag:q> 'q'>>"),
    ("_:b", "?p"),
    ("<tag:a>", "'s'"),
    ("<tag:a>", "<<_:q <tag:q> 'q'>>"),
    ("<tag:a>", "?p"),
    ("'s'", "<<_:q <tag:q> 'q'>>"),
    ("'s'", "?p"),
    ("<<_:q <tag:q> 'q'>>", "?p"),
]


@pytest.mark.parametrize("t1,t2", CMP_CASES)
def test_cmp_terms(t1, t2):
    a, b = ez(t1), ez(t2)
    assert sort_key(a) == sort_key(a)
    assert sort_key(a) < sort_key(b), (t1, t2)
    assert encoded_sort_key(a) < encoded_sort_key(b), (t1, t2)


def test_eq_lang_case_insensitive():
    assert term_eq(langlit("a", "EN"), langlit("a", "en"))
    assert term_id(langlit("a", "EN")) == term_id(langlit("a", "en"))
    assert not term_eq(langlit("a", "en"), langlit("a", "fr"))
    assert not term_eq(langlit("a", "en"), langlit("a", "en", DIR_LTR))
    assert not term_eq(literal("01", XSD_INTEGER), literal("1", XSD_INTEGER))
    assert not term_eq(literal("a"), langlit("a", "en"))
    assert not term_eq(iri("x:a"), bnode("x:a") if False else bnode("a"))


def test_term_ids_distinct():
    ts = [iri("tag:a"), bnode("tag:a"), literal("tag:a"), variable("x"),
          langlit("a", "en"), langlit("a", "en", DIR_LTR), literal("a"),
          literal("a", XSD_INTEGER)]
    ids = {term_id(t) for t in ts}
    assert len(ids) == len(ts)


def test_format_basic():
    assert format_term(iri("http://a/b")) == "<http://a/b>"
    assert format_term(bnode("b1")) == "_:b1"
    assert format_term(literal("hello")) == '"hello"'
    assert format_term(literal("5", XSD_INTEGER)) == \
        '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'
    assert format_term(langlit("o", "en-UK")) == '"o"@en-uk'
    assert format_term(langlit("o", "en-UK"), canonical=False) == '"o"@en-UK'
    assert format_term(langlit("o", "en-UK", DIR_LTR)) == '"o"@en-uk--ltr'
    assert format_term(variable("v")) == "?v"
    tt = triple_term(bnode("a"), iri("x:b"), literal("c"))
    assert format_term(tt) == '<<( _:a <x:b> "c" )>>'


def test_escape_table():
    # exact table of turtle/src/serializer/_common.rs:75-119
    assert escape_literal("\x08\t\n\x0b\x0c\r") == "\\b\\t\\n\\u000B\\f\\r"
    assert escape_literal('"\\') == '\\"\\\\'
    assert escape_literal("\x00\x01\x1f\x7f") == "\\u0000\\u0001\\u001F\\u007F"
    assert escape_literal("￾￿") == "\\uFFFE\\uFFFF"
    # c14n/_cnq.rs does NOT escape U+FFFE/U+FFFF
    assert escape_literal("￾￿", cnq=True) == "￾￿"
    assert escape_literal("plain text é✓") == "plain text é✓"


def test_native_conversions():
    assert from_native(5) == int_literal(5)
    assert from_native(True) == bool_literal(True)
    assert from_native("x") == literal("x")
    assert try_to_float(literal("1.5", "http://www.w3.org/2001/XMLSchema#double")) == 1.5
    assert try_to_float(int_literal(3)) == 3.0
    assert try_to_float(literal("x")) is None
    assert try_to_float(langlit("1", "en")) is None
