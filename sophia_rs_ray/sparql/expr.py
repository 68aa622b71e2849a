"""SPARQL expression evaluation with the reference's value semantics.

Mirrors ``sparql/src/function.rs:35-440`` (function dispatch),
``sparql/src/expression.rs:34-165`` (operators, EBV, error propagation)
and ``sparql/src/value.rs`` (value- vs term-equality split, numeric
promotion tower NativeInt→…→Double of ``sparql/src/value/_number.rs``).

Evaluation is per batch over binding columns of canonical-NT term text;
an evaluation *error* is ``None`` (SPARQL's unbound/error propagation:
errors make FILTER drop the row and Extend bind nothing —
``sparql/src/value.rs:98-105``).  ``NOW`` is pinned per run
(``set_pinned_now``); ``RAND``/``UUID``/``STRUUID`` draw from a seeded
blake2b counter stream (``set_pinned_seed``) — per-invocation fresh
like the reference, reproducible unlike it (SURVEY §4.1).

Deliberately row-wise inside a batch (terms are parsed once per distinct
text via an LRU cache — hub terms repeat massively); the hot relational
comparisons used by BGP joins never go through this module.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_CEILING, ROUND_FLOOR, ROUND_HALF_UP, Decimal
from typing import Callable, Dict, List, Optional, Sequence, Union
from urllib.parse import quote

from ..iri import is_valid_iri_ref
from ..ntriples import parse_term_text
from ..terms import (
    KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_TRIPLE, KIND_VARIABLE,
    RDF_DIRLANGSTRING, RDF_LANGSTRING, XSD, XSD_BOOLEAN, XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE, XSD_FLOAT, XSD_INTEGER, XSD_STRING, Term, format_term,
    sort_key,
)

Text = Optional[str]  # canonical-NT term text; None = unbound/error

#: xsd:decimal lexical space (no exponent, no special values)
_DECIMAL_LEX = re.compile(r"^[+-]?(?:\d+(?:\.\d*)?|\.\d+)$")


# plain-dict caches, NOT functools.lru_cache: lru wrappers pickle by
# module reference, which breaks cloudpickle's pickle-by-value shipping
# of UDF closures to workers without the repo on sys.path.
_parse_cache: dict = {}


def _parse(text: str) -> Optional[Term]:
    t = _parse_cache.get(text, 0)
    if t != 0:
        return t
    if len(_parse_cache) > 65536:
        _parse_cache.clear()
    try:
        t = parse_term_text(text)
    except ValueError:
        t = None
    _parse_cache[text] = t
    return t


_INT_DT = frozenset((XSD_INTEGER, XSD + "long", XSD + "int", XSD + "short",
                     XSD + "byte", XSD + "nonNegativeInteger",
                     XSD + "positiveInteger", XSD + "unsignedInt",
                     XSD + "unsignedLong"))
_NUMERIC_DT = _INT_DT | {XSD_DECIMAL, XSD_FLOAT, XSD_DOUBLE}


def value_of(t: Term):
    """Term → Python value for SPARQL value comparison; None if the
    literal is ill-formed (error, ``value.rs:98-105``)."""
    kind, lex, dt, lang, _ = t
    if kind != KIND_LITERAL:
        return None
    if lang:
        return ("lang", lex, lang.lower(), t[4])
    if dt in _NUMERIC_DT:
        try:
            if dt in _INT_DT:
                return ("num", int(lex))
            if dt == XSD_DECIMAL:
                # xsd:decimal lexical space: no exponent, no NaN/INF
                if not _DECIMAL_LEX.match(lex):
                    return None
                return ("num", Decimal(lex))
            return ("num", float(lex))
        except (ValueError, ArithmeticError):
            return None
    if dt == XSD_BOOLEAN:
        if lex in ("true", "1"):
            return ("bool", True)
        if lex in ("false", "0"):
            return ("bool", False)
        return None
    if dt == XSD_DATETIME:
        dtv = _parse_datetime(lex)
        return ("dt", dtv) if dtv is not None else None
    if dt == XSD_STRING:
        return ("str", lex)
    return ("other", dt, lex)


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Proleptic-Gregorian day count (days since 1970-01-01); valid for
    any year, unlike ``datetime`` (Howard Hinnant's public-domain civil
    calendar algorithm). Monotonic in (y, m, d)."""
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _parse_datetime(lex: str):
    m = re.match(
        r"^(-?\d{4,})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2}(?:\.\d+)?)"
        r"(Z|[+-]\d{2}:\d{2})?$", lex)
    if not m:
        return None
    y, mo, d, h, mi = (int(m.group(i)) for i in range(1, 6))
    s = float(m.group(6))
    tz = m.group(7)
    # reject out-of-range dates ("2023-02-29" is ill-formed, an error)
    if not 1 <= mo <= 12 or h > 24 or mi > 59 or s >= 60 or \
            (h == 24 and (mi or s)):
        return None
    leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
    days = (31, 29 if leap else 28, 31, 30, 31, 30,
            31, 31, 30, 31, 30, 31)[mo - 1]
    if not 1 <= d <= days:
        return None
    off = 0.0
    if tz and tz != "Z":
        sign = 1 if tz[0] == "+" else -1
        off = sign * (int(tz[1:3]) * 60 + int(tz[4:6]))
    # comparable instant = true seconds since the 1970 epoch (minutes
    # offset applied); keeps fields for accessors.  Uses real calendar
    # arithmetic — a positional y*366+mo*31 encoding is NOT monotonic
    # across year boundaries (366 < 12*31+31).
    total = ((_days_from_civil(y, mo, d) * 24 + h) * 60 + mi - off) * 60 + s
    return (total, y, mo, d, h, mi, s, tz)


def ebv(t: Optional[Term]) -> Optional[bool]:
    """Effective boolean value (``sparql/src/value.rs:107-115``)."""
    if t is None:
        return None
    v = value_of(t)
    if v is None:
        return None
    tag = v[0]
    if tag == "bool":
        return v[1]
    if tag == "num":
        return v[1] == v[1] and v[1] != 0
    if tag == "str":
        return len(v[1]) > 0
    # language-tagged strings have NO effective boolean value in the
    # reference (value.rs:107-115): error, not truthiness
    return None


def _promote_cmp(x, y):
    """XPath comparison promotion: decimal compared to float/double is
    promoted to the float tier (exact Decimal-vs-float comparison would
    wrongly distinguish e.g. 0.1 from 0.1e0)."""
    if isinstance(x, Decimal) and isinstance(y, float):
        return float(x), y
    if isinstance(y, Decimal) and isinstance(x, float):
        return x, float(y)
    return x, y


def _cmp_values(a: Term, b: Term) -> Optional[int]:
    """SPARQL value comparison (<,>,<=,>=): numbers, strings, booleans,
    dateTimes; incomparable → error."""
    va, vb = value_of(a), value_of(b)
    if va is None or vb is None:
        return None
    if va[0] == "other" or vb[0] == "other":
        # unrecognized datatypes form a partial order: reflexively
        # comparable with an equal term, incomparable otherwise
        # (test.rs:2057-2067 controls on "a"^^<x:dt1>)
        return 0 if a == b else None
    if va[0] != vb[0]:
        return None
    if va[0] == "num":
        x, y = _promote_cmp(va[1], vb[1])
        if x != x or y != y:
            return None
        return (x > y) - (x < y)
    if va[0] == "str":
        return (va[1] > vb[1]) - (va[1] < vb[1])
    if va[0] == "lang":
        # comparable only within the same language tag AND base
        # direction (test.rs test_expr_lt @en/@en--ltr rows)
        if va[2:] != vb[2:]:
            return None
        return (va[1] > vb[1]) - (va[1] < vb[1])
    if va[0] == "bool":
        return (va[1] > vb[1]) - (va[1] < vb[1])
    if va[0] == "dt":
        # zoned vs zoneless dateTimes are incomparable (an error,
        # test.rs test_expr_eq_literal dateTime rows)
        if bool(va[1][7]) != bool(vb[1][7]):
            return None
        return (va[1][0] > vb[1][0]) - (va[1][0] < vb[1][0])
    return None


def _eq_values(a: Term, b: Term) -> Optional[bool]:
    """SPARQL ``=``: value equality where a value space exists, else term
    equality; unsupported-datatype pairs with equal terms are equal,
    differing ones are errors (``value.rs:117``)."""
    if a[0] != KIND_LITERAL or b[0] != KIND_LITERAL:
        return a == b
    va, vb = value_of(a), value_of(b)
    if va is not None and vb is not None:
        # strings and (dir-)lang strings share one value family:
        # (lexical, tag, dir) — "xyz" vs "xyz"@en is FALSE, not error
        # (value.rs:117; test_expr_eq_matrix string/langString rows)
        def strfam(v):
            if v[0] == "str":
                return (v[1], "", 0)
            if v[0] == "lang":
                return (v[1], v[2], v[3])
            return None

        fa, fb = strfam(va), strfam(vb)
        if fa is not None and fb is not None:
            return fa == fb
        if va[0] == "other" or vb[0] == "other":
            # unrecognized datatypes: equal terms are equal, anything
            # else is an error (value.rs:117)
            return True if a == b else None
        if va[0] != vb[0]:
            return True if a == b else None
        if va[0] == "num":
            x, y = _promote_cmp(va[1], vb[1])
            return x == y
        if va[0] == "dt":
            if bool(va[1][7]) != bool(vb[1][7]):
                return None
            return va[1][0] == vb[1][0]
        return va[1:] == vb[1:]
    return True if a == b else None


# ---------------------------------------------------------------------------
# expression tree
# ---------------------------------------------------------------------------

class Var:
    def __init__(self, name: str):
        self.name = name


class Const:
    def __init__(self, term: Term):
        self.term = term


class FnCall:
    def __init__(self, fn: str, *args):
        self.fn = fn.upper()
        self.args = args


Expr = Union[Var, Const, FnCall]


def _str_value(t: Term) -> Optional[str]:
    """STR()-able string of a term (IRI text or literal lexical form)."""
    if t[0] == KIND_IRI:
        return t[1]
    if t[0] == KIND_LITERAL:
        return t[1]
    return None


def _plainish(t: Term) -> Optional[str]:
    """Argument for string functions: xsd:string or lang literal."""
    if t[0] == KIND_LITERAL and (t[3] or t[2] == XSD_STRING):
        return t[1]
    return None


def _valid_iri(s: str) -> bool:
    return is_valid_iri_ref(s)


def _simple_str(t: Term) -> Optional[str]:
    """*Simple* string argument (xsd:string, NO language tag) — required
    for patterns, flags, tags, hash inputs (function.rs argument
    checks); a lang-tagged literal in these positions is an error."""
    if t[0] == KIND_LITERAL and not t[3] and t[2] == XSD_STRING:
        return t[1]
    return None


def _mk_str_like(src: Term, lex: str) -> Term:
    """Result literal carrying src's lang tag (SPARQL string-fn rules)."""
    if src[3]:
        return (KIND_LITERAL, lex, src[2], src[3], src[4])
    return (KIND_LITERAL, lex, XSD_STRING, "", 0)


def _num(t: Term) -> Optional[Union[int, float, Decimal]]:
    v = value_of(t)
    return v[1] if v is not None and v[0] == "num" else None


#: SPARQL numeric promotion ranks (value/_number.rs:5-10):
#: NativeInt/BigInt < Decimal < Float < Double.  Python int covers the
#: BigInt tier natively; Decimal is exact like BigDecimal.
_NUM_RANK = {XSD_DECIMAL: 1, XSD_FLOAT: 2, XSD_DOUBLE: 3}


def _fmt_decimal(d: Decimal) -> str:
    """Canonical xsd:decimal: plain notation, ≥1 digit each side of the
    point, no superfluous trailing zeros."""
    s = format(d, "f")
    if "." not in s:
        return s + ".0"
    s = s.rstrip("0")
    if s.endswith("."):
        s += "0"
    return s


def _mk_num(x: Union[int, float, Decimal], *dts: str) -> Term:
    """Numeric result with SPARQL/XPath promotion: the result datatype
    is the highest-rank argument type (integer < decimal < float <
    double, ``value/_number.rs:5-10``)."""
    rank = max((_NUM_RANK.get(d, 0) for d in dts), default=0)
    if isinstance(x, float) and rank < 2:
        rank = 3  # value already lost exactness (defensive)
    if rank == 0:
        return (KIND_LITERAL, str(int(x)), XSD_INTEGER, "", 0)
    if rank == 1:
        if not isinstance(x, Decimal):
            x = Decimal(x)
        return (KIND_LITERAL, _fmt_decimal(x), XSD_DECIMAL, "", 0)
    dt = XSD_FLOAT if rank == 2 else XSD_DOUBLE
    return (KIND_LITERAL, _fmt_double(float(x)), dt, "", 0)


def _arith_operands(a, b):
    """Promote two numeric Python values to a common arithmetic tier:
    exact (int/Decimal) together, else both float."""
    if isinstance(a, float) or isinstance(b, float):
        return float(a), float(b)
    if isinstance(a, Decimal) or isinstance(b, Decimal):
        return Decimal(a) if not isinstance(a, Decimal) else a, \
            Decimal(b) if not isinstance(b, Decimal) else b
    return a, b


def _fmt_double(x: float) -> str:
    """Reference-canonical double form: shortest mantissa ``e`` exponent
    ("5e0", "4.2e1", "1.6e0") — matches the reference's Display for
    computed doubles (test.rs expectations like "4.2e1"^^xsd:double)."""
    if x != x:
        return "NaN"
    if x == math.inf:
        return "INF"
    if x == -math.inf:
        return "-INF"
    if x == 0.0:
        return "-0e0" if math.copysign(1.0, x) < 0 else "0e0"
    sign, digits, exp = Decimal(repr(x)).as_tuple()
    exponent = exp + len(digits) - 1
    mant = str(digits[0])
    rest = "".join(map(str, digits[1:])).rstrip("0")
    if rest:
        mant += "." + rest
    return f"{'-' if sign else ''}{mant}e{exponent}"


_TRUE = (KIND_LITERAL, "true", XSD_BOOLEAN, "", 0)
_FALSE = (KIND_LITERAL, "false", XSD_BOOLEAN, "", 0)


def _mk_bool(b: Optional[bool]) -> Optional[Term]:
    if b is None:
        return None
    return _TRUE if b else _FALSE


_rx_cache: dict = {}


def _rx(pattern: str, flags: str) -> Optional[re.Pattern]:
    key = (pattern, flags)
    if key in _rx_cache:
        return _rx_cache[key]
    if len(_rx_cache) > 512:
        _rx_cache.clear()
    f = 0
    for c in flags:
        f |= {"i": re.I, "s": re.S, "m": re.M, "x": re.X}.get(c, 0)
    try:
        r = re.compile(pattern, f)
    except re.error:
        r = None
    _rx_cache[key] = r
    return r


def eval_expr(e: Expr, row: Dict[str, Optional[Term]]) -> Optional[Term]:
    """One expression over one parsed binding row; None = error/unbound."""
    if isinstance(e, Const):
        return e.term
    if isinstance(e, Var):
        return row.get(e.name)
    fn, args = e.fn, e.args

    # lazy/special forms first (BOUND/IF/COALESCE/&&/||)
    if fn == "BOUND":
        return _mk_bool(isinstance(args[0], Var) and row.get(args[0].name) is not None)
    if fn == "COALESCE":
        for a in args:
            v = eval_expr(a, row)
            if v is not None:
                return v
        return None
    if fn == "IF":
        c = ebv(eval_expr(args[0], row))
        if c is None:
            return None
        return eval_expr(args[1] if c else args[2], row)
    if fn in ("&&", "||"):
        a = ebv(eval_expr(args[0], row))
        b = ebv(eval_expr(args[1], row))
        if fn == "&&":
            if a is False or b is False:
                return _FALSE
            return _mk_bool(True) if (a and b) else None
        if a is True or b is True:
            return _TRUE
        return _mk_bool(False) if (a is False and b is False) else None

    vals = [eval_expr(a, row) for a in args]
    if any(v is None for v in vals):
        return None
    return _apply(fn, vals, row)


def _apply(fn: str, v: List[Term], row) -> Optional[Term]:  # noqa: C901
    if fn == "!":
        b = ebv(v[0])
        return _mk_bool(None if b is None else not b)
    if fn == "=":
        return _mk_bool(_eq_values(v[0], v[1]))
    if fn == "!=":
        r = _eq_values(v[0], v[1])
        return _mk_bool(None if r is None else not r)
    if fn in ("<", "<=", ">", ">="):
        c = _cmp_values(v[0], v[1])
        if c is None:
            return None
        return _mk_bool({"<": c < 0, "<=": c <= 0, ">": c > 0, ">=": c >= 0}[fn])
    if fn == "SAMETERM":
        return _mk_bool(v[0] == v[1])
    if fn == "IN":
        return _mk_bool(any(_eq_values(v[0], x) is True for x in v[1:]))

    if fn in ("+", "-", "*", "/"):
        if len(v) == 1:
            x = _num(v[0])
            if x is None:
                return None
            return _mk_num(-x if fn == "-" else x, v[0][2])
        a, b = _num(v[0]), _num(v[1])
        if a is None or b is None:
            return None
        a, b = _arith_operands(a, b)
        if fn == "+":
            return _mk_num(a + b, v[0][2], v[1][2])
        if fn == "-":
            return _mk_num(a - b, v[0][2], v[1][2])
        if fn == "*":
            return _mk_num(a * b, v[0][2], v[1][2])
        # op:numeric-divide: integer ÷ integer yields decimal; division
        # by exact zero is an error, by float/double zero is ±INF/NaN
        if isinstance(a, float):
            if b == 0.0:
                r = math.nan if a == 0.0 else math.copysign(math.inf, a) \
                    * math.copysign(1.0, b)
            else:
                r = a / b
            return _mk_num(r, v[0][2], v[1][2], XSD_FLOAT)
        if b == 0:
            return None
        if not isinstance(a, Decimal):
            a, b = Decimal(a), Decimal(b)
        try:
            r = a / b
        except ArithmeticError:
            return None
        return _mk_num(r, v[0][2], v[1][2], XSD_DECIMAL)

    # term accessors / constructors (function.rs:41-113, 340-440)
    if fn == "STR":
        s = _str_value(v[0])
        return None if s is None else (KIND_LITERAL, s, XSD_STRING, "", 0)
    if fn == "LANG":
        if v[0][0] != KIND_LITERAL:
            return None
        return (KIND_LITERAL, v[0][3].lower(), XSD_STRING, "", 0)
    if fn == "LANGDIR":
        # RDF 1.2 (function.rs:60): the base direction alone
        # ("ltr"/"rtl", "" when none)
        if v[0][0] != KIND_LITERAL:
            return None
        return (KIND_LITERAL, {0: "", 1: "ltr", 2: "rtl"}[v[0][4]],
                XSD_STRING, "", 0)
    if fn in ("HASLANG", "HASLANGDIR"):
        # false (not an error) for any non-lang term (function.rs:66-77)
        if v[0][0] != KIND_LITERAL:
            return _FALSE
        return _mk_bool(bool(v[0][3]) if fn == "HASLANG"
                        else bool(v[0][4]))
    if fn == "DATATYPE":
        if v[0][0] != KIND_LITERAL:
            return None
        dt = v[0][2] if not v[0][3] else \
            (RDF_DIRLANGSTRING if v[0][4] else RDF_LANGSTRING)
        return (KIND_IRI, dt, "", "", 0)
    if fn == "IRI" or fn == "URI":
        if v[0][0] == KIND_IRI:
            return v[0]
        s = _simple_str(v[0])
        if s is None or not _valid_iri(s):
            return None
        return (KIND_IRI, s, "", "", 0)
    if fn == "STRDT":
        s = _plainish(v[0])
        if s is None or v[0][3] or v[1][0] != KIND_IRI:
            return None
        return (KIND_LITERAL, s, v[1][1], "", 0)
    if fn == "STRLANG":
        s = _plainish(v[0])
        if s is None or v[0][3]:
            return None
        lt = _simple_str(v[1])
        return None if not lt else (KIND_LITERAL, s, RDF_LANGSTRING, lt, 0)
    if fn == "STRLANGDIR":
        # (lex, tag, "ltr"|"rtl") → directional language literal
        # (function.rs:349)
        s = _plainish(v[0])
        if s is None or v[0][3]:
            return None
        lt, d = _simple_str(v[1]), _simple_str(v[2])
        if not lt or d not in ("ltr", "rtl"):
            return None
        return (KIND_LITERAL, s, RDF_DIRLANGSTRING, lt,
                1 if d == "ltr" else 2)
    if fn in ("ISIRI", "ISURI"):
        return _mk_bool(v[0][0] == KIND_IRI)
    if fn == "ISBLANK":
        return _mk_bool(v[0][0] == KIND_BNODE)
    if fn == "ISLITERAL":
        return _mk_bool(v[0][0] == KIND_LITERAL)
    if fn == "ISNUMERIC":
        return _mk_bool(v[0][0] == KIND_LITERAL and _num(v[0]) is not None)
    if fn == "ISTRIPLE":
        return _mk_bool(v[0][0] == KIND_TRIPLE)

    # strings (function.rs:138-246, 389-398)
    if fn == "STRLEN":
        s = _plainish(v[0])
        return None if s is None else (KIND_LITERAL, str(len(s)), XSD_INTEGER, "", 0)
    if fn == "UCASE":
        s = _plainish(v[0])
        return None if s is None else _mk_str_like(v[0], s.upper())
    if fn == "LCASE":
        s = _plainish(v[0])
        return None if s is None else _mk_str_like(v[0], s.lower())
    if fn in ("CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER"):
        a, b = _plainish(v[0]), _plainish(v[1])
        if a is None or b is None:
            return None
        # argument compatibility (17.4.3.1.1): a tagged second argument
        # requires the first to carry the SAME tag and base direction
        if v[1][3] and (v[0][3].lower() != v[1][3].lower()
                        or v[0][4] != v[1][4]):
            return None
        if fn == "CONTAINS":
            return _mk_bool(b in a)
        if fn == "STRSTARTS":
            return _mk_bool(a.startswith(b))
        if fn == "STRENDS":
            return _mk_bool(a.endswith(b))
        if fn == "STRBEFORE":
            i = a.find(b)
            return _mk_str_like(v[0], a[:i]) if i >= 0 else \
                (KIND_LITERAL, "", XSD_STRING, "", 0)
        i = a.find(b)
        return _mk_str_like(v[0], a[i + len(b):]) if i >= 0 else \
            (KIND_LITERAL, "", XSD_STRING, "", 0)
    if fn == "SUBSTR":
        s = _plainish(v[0])
        start = _num(v[1])
        if s is None or start is None:
            return None
        start = int(start) - 1  # SPARQL is 1-based
        if len(v) > 2:
            ln = _num(v[2])
            if ln is None:
                return None
            return _mk_str_like(v[0], s[max(start, 0):max(start, 0) + int(ln) + min(start, 0)])
        return _mk_str_like(v[0], s[max(start, 0):])
    if fn == "CONCAT":
        parts = [_plainish(x) for x in v]
        if any(p is None for p in parts):
            return None
        # result keeps the tag only when ALL args share tag AND base
        # direction (function.rs:138: concat of @en and @en--ltr is plain)
        langs = {(x[3].lower(), x[4]) for x in v if x[0] == KIND_LITERAL}
        if len(langs) == 1 and v and v[0][3]:
            return _mk_str_like(v[0], "".join(parts))
        return (KIND_LITERAL, "".join(parts), XSD_STRING, "", 0)
    if fn == "REPLACE":
        s = _plainish(v[0])
        pat = _simple_str(v[1])
        rep = _simple_str(v[2])
        flags = _simple_str(v[3]) if len(v) > 3 else ""
        if s is None or pat is None or rep is None or flags is None:
            return None
        rxp = _rx(pat, flags)
        if rxp is None:
            return None
        return _mk_str_like(v[0], rxp.sub(_xpath_rep(rep), s))
    if fn == "REGEX":
        s = _plainish(v[0])
        pat = _simple_str(v[1])
        flags = _simple_str(v[2]) if len(v) > 2 else ""
        if s is None or pat is None or flags is None:
            return None
        rxp = _rx(pat, flags)
        return None if rxp is None else _mk_bool(rxp.search(s) is not None)
    if fn == "ENCODE_FOR_URI":
        s = _plainish(v[0])
        return None if s is None else \
            (KIND_LITERAL, quote(s, safe="-_.~"), XSD_STRING, "", 0)
    if fn == "LANGMATCHES":
        # both arguments must be SIMPLE strings (function.rs:145-153);
        # an empty/invalid range matches nothing (false, not error)
        tag = _simple_str(v[0])
        rng = _simple_str(v[1])
        if tag is None or rng is None:
            return None
        if not tag or not rng:
            return _FALSE
        tag, rng = tag.lower(), rng.lower()
        if rng == "*":
            return _mk_bool(tag != "")
        return _mk_bool(tag == rng or tag.startswith(rng + "-"))

    # numerics (function.rs:114-137)
    if fn in ("ABS", "CEIL", "FLOOR", "ROUND"):
        x = _num(v[0])
        if x is None:
            return None
        if fn == "ABS":
            r = abs(x)
        elif isinstance(x, float):
            # f64::round: half-way cases away from zero (_number.rs:178)
            r = {"CEIL": math.ceil, "FLOOR": math.floor,
                 "ROUND": lambda f: math.copysign(
                     math.floor(abs(f) + 0.5), f)}[fn](x)
            r = float(r)
        elif isinstance(x, Decimal):
            # with_scale_round(0, Ceiling/Floor/HalfUp), _number.rs:149-182
            mode = {"CEIL": ROUND_CEILING, "FLOOR": ROUND_FLOOR,
                    "ROUND": ROUND_HALF_UP}[fn]
            r = x.quantize(Decimal(1), rounding=mode)
        else:
            r = x  # integers are fixed points of ceil/floor/round
        return _mk_num(r, v[0][2])

    # date/time accessors (function.rs:247-295)
    if fn in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS", "TZ",
              "TIMEZONE"):
        val = value_of(v[0])
        if val is None or val[0] != "dt":
            return None
        _tot, y, mo, d, h, mi, s, tz = val[1]
        if fn == "TZ":
            return (KIND_LITERAL, tz or "", XSD_STRING, "", 0)
        if fn == "TIMEZONE":
            # xsd:dayTimeDuration of the offset; error when absent
            if not tz:
                return None
            if tz == "Z":
                return (KIND_LITERAL, "PT0S", XSD + "dayTimeDuration", "", 0)
            sign = "-" if tz[0] == "-" else ""
            th, tm = int(tz[1:3]), int(tz[4:6])
            if th == 0 and tm == 0:
                return (KIND_LITERAL, "PT0S", XSD + "dayTimeDuration", "", 0)
            lex = sign + "PT" + (f"{th}H" if th else "") + \
                (f"{tm}M" if tm else "")
            return (KIND_LITERAL, lex, XSD + "dayTimeDuration", "", 0)
        x = {"YEAR": y, "MONTH": mo, "DAY": d, "HOURS": h, "MINUTES": mi,
             "SECONDS": s}[fn]
        if fn == "SECONDS":
            return (KIND_LITERAL, str(x), XSD_DECIMAL, "", 0)
        return (KIND_LITERAL, str(x), XSD_INTEGER, "", 0)

    if fn == "BNODE":
        # function.rs:109/583: the no-arg form is fresh PER CALL
        # (spec 17.4.2.9: "every call results in a distinct blank
        # node", so BNODE() = BNODE() is false) — drawn from the same
        # seeded counter stream as RAND/UUID for reproducibility; the
        # one-arg form returns the SAME node for the same simple
        # literal within one solution mapping: label = hash of the
        # binding row + the string arg (SURVEY §7.0 determinism)
        if not v:
            return (KIND_BNODE, "b" + _draw16().hex()[:16], "", "", 0)
        import zlib as _z

        seed = "\x1f".join(f"{k}={row.get(k)}" for k in sorted(row)) \
            if isinstance(row, dict) else ""
        tag = _simple_str(v[0])
        if tag is None:
            return None
        h = _z.crc32(f"{tag}\x1e{seed}".encode())
        return (KIND_BNODE, f"b{h:08x}_{tag}", "", "", 0)
    if fn in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
        # hash fns require SIMPLE literals (function.rs hash family —
        # a language-tagged argument is an error)
        s = _simple_str(v[0])
        if s is None:
            return None
        import hashlib

        h = getattr(hashlib, fn.lower())(s.encode()).hexdigest()
        return (KIND_LITERAL, h, XSD_STRING, "", 0)
    # RDF 1.2 triple-term functions (function.rs TRIPLE/SUBJECT/…)
    if fn == "TRIPLE":
        s, p, o = v[0], v[1], v[2]
        if s[0] not in (KIND_IRI, KIND_BNODE) or p[0] != KIND_IRI:
            return None
        from ..terms import triple_term as _tt
        return _tt(s, p, o)
    if fn in ("SUBJECT", "PREDICATE", "OBJECT"):
        if v[0][0] != KIND_TRIPLE:
            return None
        parts = _triple_parts(v[0])
        if parts is None:
            return None
        return parts[{"SUBJECT": 0, "PREDICATE": 1, "OBJECT": 2}[fn]]
    if fn == "NOW":
        # reference pins now() once per query (exec.rs:68-84); we pin
        # it globally for run-to-run determinism (SURVEY §7.0) —
        # override with set_pinned_now()
        return (KIND_LITERAL, _PINNED_NOW[0], XSD + "dateTime", "", 0)
    if fn == "RAND":
        # function.rs:113 — xsd:double in [0,1); seeded counter stream
        # (set_pinned_seed), so strictly MORE deterministic than the
        # reference's thread_rng while keeping per-invocation freshness
        x = int.from_bytes(_draw16()[:8], "big") / 2.0 ** 64
        return (KIND_LITERAL, _fmt_double(x), XSD + "double", "", 0)
    if fn == "UUID":
        # function.rs:296 — urn:uuid: IRI, RFC 4122 v4 layout
        return (KIND_IRI, "urn:uuid:" + _uuid4_hex(), "", "", 0)
    if fn == "STRUUID":
        # function.rs:302 — the bare UUID string as a simple literal
        return (KIND_LITERAL, _uuid4_hex(), XSD_STRING, "", 0)

    # constructor casts (function.rs:434-440); wrong arity = error
    if fn.startswith("XSD:"):
        if len(v) != 1:
            return None
        local = fn[4:].lower()
        # restore camelCase targets lost to keyword uppercasing
        target = XSD + {"datetime": "dateTime"}.get(local, local)
        return _cast(v[0], target)
    raise ValueError(f"unknown SPARQL function {fn}")


def _triple_parts(t: Term):
    """Decompose a KIND_TRIPLE term's canonical-NT lex into (s, p, o)."""
    from ..ntriples import _LineParser
    lex = t[1]
    if not lex.startswith("<<("):
        return None
    try:
        lp = _LineParser(lex)
        lp.pos = 3
        lp.skip_ws()
        s = lp.parse_term()
        lp.skip_ws()
        p = lp.parse_term()
        lp.skip_ws()
        o = lp.parse_term()
        return (s, p, o)
    except Exception:
        return None


_PINNED_NOW = ["2000-01-01T00:00:00Z"]


def set_pinned_now(iso: str):
    """Pin the NOW() timestamp for subsequent query evaluations (the
    distributed analogue of ExecState's per-query now, exec.rs:68-84)."""
    _PINNED_NOW[0] = iso


# --- seeded nondeterministic-function stream (RAND/UUID/STRUUID) -----------
#
# The reference draws from a real RNG (function.rs:113,296,302), so ANY
# value is spec-conformant; this engine derives each invocation from
# blake2b(seed ‖ counter) instead — per-invocation fresh (rand()=rand()
# is false, uuid()!=uuid() is true) yet reproducible for a pinned seed
# and evaluation order.  NOTE: across a distributed run the per-worker
# counters make values partition-dependent — exactly as "random" as the
# reference, but single-process evaluations (tests, driver-side exprs)
# are fully repeatable.

_PINNED_SEED = [0x5EED]
_DRAW_CTR = [0]


def set_pinned_seed(seed: int):
    """Pin the RAND/UUID/STRUUID stream (resets the invocation
    counter) — the seeded analogue of set_pinned_now()."""
    _PINNED_SEED[0] = int(seed)
    _DRAW_CTR[0] = 0


def _draw16() -> bytes:
    import hashlib

    c = _DRAW_CTR[0]
    _DRAW_CTR[0] = c + 1
    return hashlib.blake2b(f"{_PINNED_SEED[0]}:{c}".encode(),
                           digest_size=16).digest()


def _uuid4_hex() -> str:
    b = bytearray(_draw16())
    b[6] = (b[6] & 0x0F) | 0x40          # version 4
    b[8] = (b[8] & 0x3F) | 0x80          # RFC 4122 variant
    h = b.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def _xpath_rep(rep: str) -> str:
    """XPath replacement ($1…) → Python (\\1…)."""
    return re.sub(r"\$(\d)", r"\\\1", rep)


def _cast(t: Term, target: str) -> Optional[Term]:
    v = value_of(t)
    if v is None:
        return None
    try:
        if target == XSD_STRING:
            s = _str_value(t)
            return None if s is None else (KIND_LITERAL, s, XSD_STRING, "", 0)
        if target == XSD_INTEGER:
            if v[0] == "num":
                return (KIND_LITERAL, str(int(v[1])), XSD_INTEGER, "", 0)
            if v[0] == "bool":
                return (KIND_LITERAL, str(int(v[1])), XSD_INTEGER, "", 0)
            if v[0] == "str":
                return (KIND_LITERAL, str(int(v[1].strip())), XSD_INTEGER, "", 0)
        if target == XSD_DECIMAL:
            # exact tier: xsd:decimal has no INF/NaN lexical forms
            if v[0] == "num":
                if isinstance(v[1], float) and not math.isfinite(v[1]):
                    return None
                return (KIND_LITERAL, _fmt_decimal(Decimal(str(v[1]))
                        if isinstance(v[1], float) else Decimal(v[1])),
                        XSD_DECIMAL, "", 0)
            if v[0] == "bool":
                return (KIND_LITERAL, _fmt_decimal(Decimal(int(v[1]))),
                        XSD_DECIMAL, "", 0)
            if v[0] == "str":
                if not _DECIMAL_LEX.match(v[1].strip()):
                    return None
                return (KIND_LITERAL, _fmt_decimal(Decimal(v[1].strip())),
                        XSD_DECIMAL, "", 0)
        if target in (XSD_DOUBLE, XSD_FLOAT):
            if v[0] == "num":
                return (KIND_LITERAL, _fmt_double(float(v[1])), target, "", 0)
            if v[0] == "bool":
                return (KIND_LITERAL, _fmt_double(1.0 * v[1]), target, "", 0)
            if v[0] == "str":
                return (KIND_LITERAL, _fmt_double(float(v[1].strip())), target, "", 0)
        if target == XSD_BOOLEAN:
            if v[0] == "bool":
                return _mk_bool(v[1])
            if v[0] == "num":
                return _mk_bool(v[1] != 0)
            if v[0] == "str":
                if v[1] in ("true", "1"):
                    return _TRUE
                if v[1] in ("false", "0"):
                    return _FALSE
        if target == XSD_DATETIME and v[0] == "str":
            return (KIND_LITERAL, v[1], XSD_DATETIME, "", 0) \
                if _parse_datetime(v[1]) else None
    except (ValueError, OverflowError):
        return None
    return None


# ---------------------------------------------------------------------------
# batch adapter
# ---------------------------------------------------------------------------

def eval_expr_batch(e: Expr, columns: Dict[str, Sequence[Optional[str]]],
                    n: int) -> List[Text]:
    """Evaluate over n rows of NT-text binding columns → NT-text results
    (None = error/unbound)."""
    out: List[Text] = []
    names = list(columns)
    for i in range(n):
        row = {}
        for name in names:
            txt = columns[name][i]
            row[name] = _parse(txt) if txt is not None else None
        t = eval_expr(e, row)
        out.append(None if t is None else format_term(t))
    return out


def order_key_batch(e: Expr, columns, n) -> List[bytes]:
    """ORDER BY key bytes: SPARQL order = unbound < bnode < IRI <
    literal, and *comparable* literals order by VALUE (numbers
    numerically, dateTimes by instant — ``exec.rs:826-893`` routes
    through the SPARQL comparator, not Term::cmp), with the term's text
    as the deterministic tiebreaker."""
    import struct

    out = []
    names = list(columns)
    for i in range(n):
        row = {name: (_parse(columns[name][i])
                      if columns[name][i] is not None else None)
               for name in names}
        t = eval_expr(e, row)
        out.append(_order_key(t))
    return out


def _order_key(t: Optional[Term]) -> bytes:
    import struct

    if t is None:
        return b"\x00"
    kind = t[0]
    if kind != KIND_LITERAL:
        return bytes([1 + kind]) + t[1].encode()
    v = value_of(t)
    tail = format_term(t).encode()
    if v is not None and v[0] == "num":
        return b"\x10" + _float_key(float(v[1])) + b"\x00" + tail
    if v is not None and v[0] == "dt":
        return b"\x11" + _float_key(float(v[1][0])) + b"\x00" + tail
    if v is not None and v[0] == "bool":
        return b"\x12" + bytes([1 if v[1] else 0]) + tail
    if v is not None and v[0] in ("str", "lang"):
        return b"\x13" + v[1].encode() + b"\x00" + tail
    return b"\x14" + tail


def _float_key(x: float) -> bytes:
    """Order-preserving big-endian encoding of a float."""
    import struct

    b = struct.unpack(">Q", struct.pack(">d", x))[0]
    b = b ^ ((1 << 63) | ((1 << 64) - 1) if b >> 63 else (1 << 63))
    # NB: for negative floats flip ALL bits, for positive flip sign bit
    return struct.pack(">Q", b & ((1 << 64) - 1))
