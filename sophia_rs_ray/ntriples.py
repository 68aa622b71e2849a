"""N-Triples / N-Quads 1.2 parser and serializer.

Re-implements the reference's line-based parsers
(``turtle/src/parser/nt.rs:27,59-68`` line loop at ``:152-173``,
``turtle/src/parser/nq.rs:28``, generalized variant
``turtle/src/parser/gnq.rs:29``) and the NT/NQ serializers
(``turtle/src/serializer/nt.rs``, ``nq.rs``):

- full term grammar incl. RDF 1.2 triple terms ``<<( s p o )>>``,
  directional language tags ``@tag--ltr``, the ``VERSION "1.2"``
  directive, comments and blank lines;
- strict mode restricts term positions (subject: IRI|bnode, predicate:
  IRI, graph: IRI|bnode); generalized mode (``strict=False``) allows any
  term anywhere like ``GNQuadsParser``;
- string escapes ``\\t \\b \\n \\r \\f \\" \\' \\\\ \\uXXXX \\UXXXXXXXX``.

The parse unit is one *line*, so a document parses as a stateless
vectorized batch function (1 input line → 0/1 triple row) — the Ray Data
mapping of SURVEY.md §2.1.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .terms import (
    DIR_LTR,
    DIR_NONE,
    DIR_RTL,
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    KIND_TRIPLE,
    KIND_VARIABLE,
    RDF_DIRLANGSTRING,
    RDF_LANGSTRING,
    Term,
    XSD_STRING,
    format_term,
)


class NtParseError(ValueError):
    def __init__(self, msg: str, line_no: int = 0, col: int = 0):
        super().__init__(f"{msg} [line {line_no}, col {col}]")
        self.line_no = line_no
        self.col = col


_IRIREF = re.compile(r'<((?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>')
_BNODE = re.compile(r"_:([A-Za-z0-9_:À-￿](?:[A-Za-z0-9_:.·À-￿-]*[A-Za-z0-9_:·À-￿-])?)")
_STRING = re.compile(r'"((?:[^"\\\n\r]|\\.)*)"')
_LANG = re.compile(r"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)(--(?:ltr|rtl))?")
_VAR = re.compile(r"\?([A-Za-z0-9_]+)")
_WS = re.compile(r"[ \t]*")
_VERSION = re.compile(r'^VERSION[ \t]+"[^"]*"[ \t]*\.?[ \t]*$')

_UNESCAPE_RE = re.compile(r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))", re.S)
_UNESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
                 '"': '"', "'": "'", "\\": "\\"}


def _unescape(m: re.Match) -> str:
    if m.group(1):
        return chr(int(m.group(1), 16))
    if m.group(2):
        return chr(int(m.group(2), 16))
    c = m.group(3)
    try:
        return _UNESCAPE_MAP[c]
    except KeyError:
        raise NtParseError(f"invalid escape \\{c}") from None


def unescape_string(s: str) -> str:
    if "\\" not in s:
        return s
    return _UNESCAPE_RE.sub(_unescape, s)


class _LineParser:
    __slots__ = ("line", "pos", "line_no")

    def __init__(self, line: str, line_no: int = 0):
        self.line = line
        self.pos = 0
        self.line_no = line_no

    def err(self, msg: str):
        raise NtParseError(msg, self.line_no, self.pos + 1)

    def skip_ws(self):
        self.pos = _WS.match(self.line, self.pos).end()

    def parse_term(self) -> Term:
        line, pos = self.line, self.pos
        if line.startswith("<<(", pos):
            self.pos = pos + 3
            self.skip_ws()
            s = self.parse_term()
            self.skip_ws()
            p = self.parse_term()
            self.skip_ws()
            o = self.parse_term()
            self.skip_ws()
            if not line.startswith(")>>", self.pos):
                self.err("expected ')>>' closing triple term")
            self.pos += 3
            lex = "<<( %s %s %s )>>" % (
                format_term(s), format_term(p), format_term(o))
            return (KIND_TRIPLE, lex, "", "", 0)
        c = line[pos] if pos < len(line) else ""
        if c == "<":
            m = _IRIREF.match(line, pos)
            if not m:
                self.err("malformed IRI")
            self.pos = m.end()
            return (KIND_IRI, unescape_string(m.group(1)), "", "", 0)
        if c == "_":
            m = _BNODE.match(line, pos)
            if not m:
                self.err("malformed blank node label")
            self.pos = m.end()
            return (KIND_BNODE, m.group(1), "", "", 0)
        if c == '"':
            m = _STRING.match(line, pos)
            if not m:
                self.err("malformed string literal")
            self.pos = m.end()
            lex = unescape_string(m.group(1))
            if line.startswith("^^", self.pos):
                m2 = _IRIREF.match(line, self.pos + 2)
                if not m2:
                    self.err("malformed datatype IRI")
                self.pos = m2.end()
                return (KIND_LITERAL, lex, unescape_string(m2.group(1)), "", 0)
            m3 = _LANG.match(line, self.pos)
            if m3:
                self.pos = m3.end()
                d = DIR_NONE
                if m3.group(2) == "--ltr":
                    d = DIR_LTR
                elif m3.group(2) == "--rtl":
                    d = DIR_RTL
                dt = RDF_DIRLANGSTRING if d else RDF_LANGSTRING
                return (KIND_LITERAL, lex, dt, m3.group(1), d)
            return (KIND_LITERAL, lex, XSD_STRING, "", 0)
        if c == "?":
            m = _VAR.match(line, pos)
            if not m:
                self.err("malformed variable")
            self.pos = m.end()
            return (KIND_VARIABLE, m.group(1), "", "", 0)
        self.err(f"unexpected character {c!r}")


def parse_term_text(text: str) -> Term:
    """One NT term string → Term tuple (used by serializers/stages that
    re-read canonical NT columns)."""
    return _LineParser(text, 0).parse_term()


def _check_strict(s: Term, p: Term, o: Term, g: Optional[Term], lp: _LineParser):
    if s[0] not in (KIND_IRI, KIND_BNODE):
        lp.err("subject must be IRI or blank node (strict mode)")
    if p[0] != KIND_IRI:
        lp.err("predicate must be IRI (strict mode)")
    if o[0] == KIND_VARIABLE:
        lp.err("object must not be a variable (strict mode)")
    if g is not None and g[0] not in (KIND_IRI, KIND_BNODE):
        lp.err("graph name must be IRI or blank node (strict mode)")
    if o[0] == 2 and o[3]:
        # BCP47 well-formedness (reference bcp47/src/_tag.rs:18 — the
        # reference rejects malformed tags at term construction)
        from .bcp47 import is_valid_tag

        if not is_valid_tag(o[3]):
            lp.err(f"invalid BCP47 language tag {o[3]!r} (strict mode)")


def parse_line(
    line: str,
    line_no: int = 0,
    quads: bool = False,
    strict: bool = True,
) -> Optional[Tuple[Term, Term, Term, Optional[Term]]]:
    """Parse one NT/NQ line → (s, p, o, g) or None for blank/comment/VERSION.

    Mirrors the reference's per-line loop (``nt.rs:152-173``): leading
    whitespace, ``#`` comments, the ``VERSION`` directive and empty lines
    yield nothing.
    """
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    if _VERSION.match(stripped):
        return None
    lp = _LineParser(line, line_no)
    lp.skip_ws()
    s = lp.parse_term()
    lp.skip_ws()
    p = lp.parse_term()
    lp.skip_ws()
    o = lp.parse_term()
    lp.skip_ws()
    g: Optional[Term] = None
    if quads and not lp.line.startswith(".", lp.pos):
        g = lp.parse_term()
        lp.skip_ws()
    if not lp.line.startswith(".", lp.pos):
        lp.err("expected '.'")
    lp.pos += 1
    lp.skip_ws()
    rest = lp.line[lp.pos:].strip()
    if rest and not rest.startswith("#"):
        lp.err(f"unexpected trailing content {rest!r}")
    if strict:
        _check_strict(s, p, o, g, lp)
    return (s, p, o, g)


def parse_document(
    text: str, quads: bool = False, strict: bool = True
) -> List[Tuple[Term, Term, Term, Optional[Term]]]:
    """Parse a whole NT/NQ document → list of (s,p,o,g)."""
    out = []
    for i, line in enumerate(text.split("\n"), start=1):
        item = parse_line(line, i, quads=quads, strict=strict)
        if item is not None:
            out.append(item)
    return out


def serialize_triple(
    s: Term, p: Term, o: Term, g: Optional[Term] = None,
    canonical: bool = True, as_quad: bool = False
) -> str:
    """One NT/NQ line (without trailing newline). Canonical mode uses
    space separators + lowercased lang tags; the reference's default mode
    uses tab separators (``nt.rs:110-127``).  ``as_quad`` forces N-Quads
    field layout: a default-graph row keeps its (empty) graph slot, so
    non-canonical output ends ``\\t\\t.`` exactly like the reference
    (``nq.rs:200-218``); canonical mode collapses the empty slot."""
    sep = " " if canonical else "\t"
    parts = [format_term(s, canonical), format_term(p, canonical),
             format_term(o, canonical)]
    if g is not None:
        parts.append(format_term(g, canonical))
    elif as_quad and not canonical:
        parts.append("")
    if canonical:
        return sep.join(parts) + " ."
    return sep.join(parts) + sep + "."


def serialize_document(
    quads, canonical: bool = True, as_quad: bool = False
) -> str:
    lines = []
    for q in quads:
        s, p, o = q[0], q[1], q[2]
        g = q[3] if len(q) > 3 else None
        lines.append(serialize_triple(s, p, o, g, canonical, as_quad))
    return "\n".join(lines) + ("\n" if lines else "")


# ---------------------------------------------------------------------------
# vectorized batch adapters (the map_batches bodies)
# ---------------------------------------------------------------------------

def parse_nt_batch(lines, urls=None, quads: bool = False, strict: bool = True):
    """Batch body: list/array of NT lines → dict of flat term columns +
    per-row error column (two-sided error handling — parse errors become
    rows, not job failures; reference ``api/src/source/_stream_error.rs``)."""
    cols = {k: [] for k in (
        "s_kind", "s_lex", "s_dt", "s_lang", "s_dir",
        "p_kind", "p_lex", "p_dt", "p_lang", "p_dir",
        "o_kind", "o_lex", "o_dt", "o_lang", "o_dir",
        "g_kind", "g_lex")}
    src = []
    errors = []
    for i, line in enumerate(lines):
        try:
            item = parse_line(line, i + 1, quads=quads, strict=strict)
        except NtParseError as e:
            errors.append((urls[i] if urls is not None else str(i), str(e)))
            continue
        if item is None:
            continue
        s, p, o, g = item
        for prefix, t in (("s", s), ("p", p), ("o", o)):
            cols[prefix + "_kind"].append(t[0])
            cols[prefix + "_lex"].append(t[1])
            cols[prefix + "_dt"].append(t[2])
            cols[prefix + "_lang"].append(t[3])
            cols[prefix + "_dir"].append(t[4])
        cols["g_kind"].append(g[0] if g is not None else -1)
        cols["g_lex"].append(g[1] if g is not None else "")
        if urls is not None:
            src.append(urls[i])
    if urls is not None:
        cols["url"] = src
    return cols, errors


#: one-RE2-pass pre-filter for rows whose lexical form needs escaping
#: (the ``_ESC_TABLE`` domain: C0 controls, ``"``, ``\\``, DEL,
#: U+FFFE/U+FFFF) — matching rows are translated individually, the
#: (overwhelmingly common) rest pass through zero-copy
_NEEDS_ESC_RE = '["\\\\\x00-\x1f\x7f￾￿]'


def _escape_lex_arrow(lex):
    """Escape literal lexical forms (Arrow large_string in → out)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    mask = pc.match_substring_regex(lex, _NEEDS_ESC_RE)
    if not pc.any(mask).as_py():
        return lex
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    repl = pa.array(
        [s.translate(_ESC_TABLE) for s in lex.take(pa.array(idx)).to_pylist()],
        type=lex.type)
    return pc.replace_with_mask(lex, mask, repl)


def format_nt_table(batch, canonical: bool = True, quads: bool = False):
    """Vectorized NT formatting of flat term columns → per-position NT
    strings, all-Arrow (the hot flagship path; SURVEY §2.2).

    ``batch`` is a ``pa.Table`` (or mapping of Arrow arrays) with the
    flat term columns; returns ``{"s": pa.Array, "p": ..., "o": ...
    [, "g": ...]}`` of large_string arrays.  Only the kind-branches
    actually present in each column are computed (predicates are
    usually all-IRI → a single concat kernel)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def col(name):
        a = batch[name]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        return a

    def s_(a):
        return a if a.type == pa.large_string() \
            else a.cast(pa.large_string())

    def L(x):
        return pa.scalar(x, pa.large_string())

    empty = L("")

    def cat(*parts):
        return pc.binary_join_element_wise(
            *(L(p) if isinstance(p, str) else p for p in parts), L(""))

    out = {}
    n = len(col("s_kind"))
    for prefix in ("s", "p", "o") + (("g",) if quads else ()):
        kind = col(prefix + "_kind")
        lex = s_(col(prefix + "_lex"))
        present = set(pc.unique(kind).to_pylist())

        def branch(k):
            if k == KIND_IRI:
                return cat("<", lex, ">", "")
            if k == KIND_BNODE:
                return cat("_:", lex, "")
            if k == KIND_VARIABLE:
                return cat("?", lex, "")
            if k == KIND_TRIPLE:
                return lex
            # literal
            dt = s_(col(prefix + "_dt"))
            lang = s_(col(prefix + "_lang"))
            ddir = col(prefix + "_dir")
            esc = _escape_lex_arrow(lex)
            lang_norm = pc.utf8_lower(lang) if canonical else lang
            if pc.max(ddir).as_py() in (None, 0, -1):
                lang_sfx = cat("@", lang_norm, "")
            else:
                dir_sfx = pc.if_else(
                    pc.equal(ddir, pa.scalar(DIR_LTR, ddir.type)),
                    pa.scalar("--ltr", pa.large_string()),
                    pc.if_else(
                        pc.equal(ddir, pa.scalar(DIR_RTL, ddir.type)),
                        pa.scalar("--rtl", pa.large_string()), empty))
                lang_sfx = cat("@", lang_norm, dir_sfx, "")
            dt_sfx = pc.if_else(
                pc.and_(pc.not_equal(dt, empty),
                        pc.not_equal(dt, L(XSD_STRING))),
                cat("^^<", dt, ">"), empty)
            sfx = pc.if_else(pc.not_equal(lang, empty), lang_sfx, dt_sfx)
            return cat('"', esc, '"', sfx, "")

        kinds = [k for k in (KIND_IRI, KIND_BNODE, KIND_LITERAL,
                             KIND_TRIPLE, KIND_VARIABLE) if k in present]
        if prefix == "g":  # graph slot: IRI/bnode only, else ""
            kinds = [k for k in kinds if k in (KIND_IRI, KIND_BNODE)]
        if len(kinds) == 1 and len(present) == 1:
            out[prefix] = branch(kinds[0])
            continue
        txt = empty
        for k in kinds:
            vals = branch(k)
            mask = pc.equal(kind, pa.scalar(k, kind.type))
            txt = pc.if_else(mask, vals, txt)
        if isinstance(txt, pa.Scalar):  # no recognized kinds at all
            txt = pa.array([""] * n, pa.large_string())
        out[prefix] = txt
    assert all(len(v) == n for v in out.values())
    return out


def format_nt_batch(batch, canonical: bool = True, quads: bool = False):
    """Vectorized NT formatting of a flat-term-column batch → per-position
    NT strings (columns ``s``,``p``,``o``[,``g``]) — the sink-side
    analogue of ``format_nt_batch`` in SURVEY §2.2.

    Accepts a dict of numpy arrays / lists (as produced by
    ``parse_nt_batch`` or the triple-table schema); returns numpy
    object arrays.  Thin adapter over :func:`format_nt_table` (the
    Arrow-native kernel) so both paths share one implementation."""
    import pyarrow as pa

    cols = {}
    for name, v in batch.items():
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            cols[name] = v
        elif name.endswith(("_kind", "_dir")):
            cols[name] = pa.array(v, pa.int8())
        else:
            cols[name] = pa.array(v, pa.large_string())
    txt = format_nt_table(cols, canonical=canonical, quads=quads)
    return {k: v.to_numpy(zero_copy_only=False) for k, v in txt.items()}


from .terms import _ESCAPE_NT as _ESC_TABLE  # noqa: E402  (bottom to avoid cycle noise)
