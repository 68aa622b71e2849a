"""SPARQL 1.1 query-results formats: JSON, XML, TSV, CSV.

The federation-facing surface of the reference's ``sparql_client``
crate (``sparql_client/src/results.rs`` — serde JSON document model —
and ``results/xml_parser.rs``), minus the HTTP transport (no network
in this engine; SERVICE federation would plug a fetcher into
``parse_results``).  Round-trippable formats (JSON/XML/TSV) preserve
terms exactly; CSV is the spec's lossy plain-value form.

Bindings move as (vars, rows) where rows are dicts of canonical-NT
term text (None = unbound) — the same binding representation the
algebra evaluator uses, so serializers accept ``Dataset.take_all()``
output directly.
"""

from __future__ import annotations

import io
import json
import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

from ..ntriples import parse_term_text
from ..terms import (
    KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_TRIPLE, RDF_DIRLANGSTRING,
    RDF_LANGSTRING, Term, XSD_STRING, format_term,
)

BindingsRows = List[Dict[str, Optional[str]]]


# ---------------------------------------------------------------------------
# term ↔ results-JSON object
# ---------------------------------------------------------------------------

def _term_to_obj(nt_text: str) -> dict:
    t = parse_term_text(nt_text)
    kind = t[0]
    if kind == KIND_IRI:
        return {"type": "uri", "value": t[1]}
    if kind == KIND_BNODE:
        return {"type": "bnode", "value": t[1]}
    if kind == KIND_TRIPLE:
        from .expr import _triple_parts

        s, p, o = _triple_parts(t)
        return {"type": "triple", "value": {
            "subject": _term_to_obj(format_term(s)),
            "predicate": _term_to_obj(format_term(p)),
            "object": _term_to_obj(format_term(o))}}
    out: dict = {"type": "literal", "value": t[1]}
    if t[3]:
        out["xml:lang"] = t[3]
        if t[4]:
            out["its:dir"] = "ltr" if t[4] == 1 else "rtl"
    elif t[2] and t[2] != XSD_STRING:
        out["datatype"] = t[2]
    return out


def _obj_to_term(obj: dict) -> Term:
    typ = obj.get("type")
    if typ == "uri":
        return (KIND_IRI, obj["value"], "", "", 0)
    if typ == "bnode":
        return (KIND_BNODE, obj["value"], "", "", 0)
    if typ == "triple":
        from ..terms import triple_term

        v = obj["value"]
        return triple_term(_obj_to_term(v["subject"]),
                           _obj_to_term(v["predicate"]),
                           _obj_to_term(v["object"]))
    if typ in ("literal", "typed-literal"):
        lang = obj.get("xml:lang", "")
        if lang:
            d = {"ltr": 1, "rtl": 2}.get(obj.get("its:dir", ""), 0)
            dt = RDF_DIRLANGSTRING if d else RDF_LANGSTRING
            return (KIND_LITERAL, obj["value"], dt, lang, d)
        dt = obj.get("datatype", XSD_STRING)
        return (KIND_LITERAL, obj["value"], dt, "", 0)
    raise ValueError(f"unknown results term type {typ!r}")


def _rows_of(bindings) -> BindingsRows:
    if hasattr(bindings, "take_all"):
        return bindings.take_all()
    return list(bindings)


# ---------------------------------------------------------------------------
# JSON (SPARQL 1.1 Query Results JSON Format)
# ---------------------------------------------------------------------------

def bindings_to_json(bindings, vars: Optional[Sequence[str]] = None) -> str:
    rows = _rows_of(bindings)
    if vars is None:
        vars = sorted({k for r in rows for k in r})
    out_rows = []
    for r in rows:
        row = {}
        for v in vars:
            val = r.get(v)
            if val is not None:
                row[v] = _term_to_obj(val)
        out_rows.append(row)
    return json.dumps({"head": {"vars": list(vars)},
                       "results": {"bindings": out_rows}},
                      ensure_ascii=False)


def boolean_to_json(value: bool) -> str:
    return json.dumps({"head": {}, "boolean": bool(value)})


def parse_json_results(text: str) -> Union[bool,
                                           Tuple[List[str], BindingsRows]]:
    """→ bool (ASK document) or (vars, rows of NT text)."""
    doc = json.loads(text)
    if "boolean" in doc:
        return bool(doc["boolean"])
    vars_ = list(doc.get("head", {}).get("vars", []))
    rows: BindingsRows = []
    for b in doc.get("results", {}).get("bindings", []):
        rows.append({v: (format_term(_obj_to_term(b[v])) if v in b else None)
                     for v in vars_})
    return vars_, rows


# ---------------------------------------------------------------------------
# XML (SPARQL Query Results XML Format; results/xml_parser.rs)
# ---------------------------------------------------------------------------

_NS = "http://www.w3.org/2005/sparql-results#"


def bindings_to_xml(bindings, vars: Optional[Sequence[str]] = None) -> str:
    from xml.sax.saxutils import escape, quoteattr

    rows = _rows_of(bindings)
    if vars is None:
        vars = sorted({k for r in rows for k in r})
    buf = io.StringIO()
    buf.write(f'<?xml version="1.0"?>\n<sparql xmlns="{_NS}">\n<head>')
    for v in vars:
        buf.write(f'<variable name={quoteattr(v)}/>')
    buf.write("</head>\n<results>\n")

    def emit(obj: dict) -> str:
        if obj["type"] == "uri":
            return f"<uri>{escape(obj['value'])}</uri>"
        if obj["type"] == "bnode":
            return f"<bnode>{escape(obj['value'])}</bnode>"
        if obj["type"] == "triple":
            v = obj["value"]
            return ("<triple><subject>" + emit(v["subject"])
                    + "</subject><predicate>" + emit(v["predicate"])
                    + "</predicate><object>" + emit(v["object"])
                    + "</object></triple>")
        attrs = ""
        if "xml:lang" in obj:
            attrs = f' xml:lang={quoteattr(obj["xml:lang"])}'
        elif "datatype" in obj:
            attrs = f' datatype={quoteattr(obj["datatype"])}'
        return f"<literal{attrs}>{escape(obj['value'])}</literal>"

    for r in rows:
        buf.write("<result>")
        for v in vars:
            val = r.get(v)
            if val is None:
                continue
            buf.write(f"<binding name={quoteattr(v)}>"
                      + emit(_term_to_obj(val)) + "</binding>")
        buf.write("</result>\n")
    buf.write("</results>\n</sparql>\n")
    return buf.getvalue()


def boolean_to_xml(value: bool) -> str:
    return (f'<?xml version="1.0"?>\n<sparql xmlns="{_NS}">'
            f"<head/><boolean>{'true' if value else 'false'}</boolean>"
            "</sparql>\n")


def parse_xml_results(text: str) -> Union[bool,
                                          Tuple[List[str], BindingsRows]]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)

    def q(tag: str) -> str:
        return f"{{{_NS}}}{tag}"

    boolean = root.find(q("boolean"))
    if boolean is not None:
        return boolean.text.strip() == "true"
    vars_ = [v.get("name") for v in root.find(q("head")) or []
             if v.tag == q("variable")]

    def term_of(el) -> dict:
        if el.tag == q("uri"):
            return {"type": "uri", "value": el.text or ""}
        if el.tag == q("bnode"):
            return {"type": "bnode", "value": el.text or ""}
        if el.tag == q("literal"):
            obj = {"type": "literal", "value": el.text or ""}
            lang = el.get("{http://www.w3.org/XML/1998/namespace}lang")
            if lang:
                obj["xml:lang"] = lang
            dt = el.get("datatype")
            if dt:
                obj["datatype"] = dt
            return obj
        if el.tag == q("triple"):
            parts = {}
            for role in ("subject", "predicate", "object"):
                sub = el.find(q(role))
                parts[role] = term_of(list(sub)[0])
            return {"type": "triple", "value": parts}
        raise ValueError(f"unknown results element {el.tag}")

    rows: BindingsRows = []
    results = root.find(q("results"))
    for res in results if results is not None else []:
        row: Dict[str, Optional[str]] = {v: None for v in vars_}
        for binding in res:
            name = binding.get("name")
            row[name] = format_term(_obj_to_term(term_of(list(binding)[0])))
        rows.append(row)
    return vars_, rows


# ---------------------------------------------------------------------------
# TSV / CSV (SPARQL 1.1 Query Results CSV and TSV Formats)
# ---------------------------------------------------------------------------

def bindings_to_tsv(bindings, vars: Optional[Sequence[str]] = None) -> str:
    rows = _rows_of(bindings)
    if vars is None:
        vars = sorted({k for r in rows for k in r})
    lines = ["\t".join("?" + v for v in vars)]
    for r in rows:
        lines.append("\t".join(r.get(v) or "" for v in vars))
    return "\n".join(lines) + "\n"


def parse_tsv_results(text: str) -> Tuple[List[str], BindingsRows]:
    lines = text.splitlines()
    if not lines:
        return [], []
    vars_ = [h.lstrip("?$") for h in lines[0].split("\t")]
    rows: BindingsRows = []
    for line in lines[1:]:
        if not line:
            continue
        cells = line.split("\t")
        row: Dict[str, Optional[str]] = {}
        for v, cell in zip(vars_, cells):
            row[v] = _parse_tsv_term(cell) if cell else None
        rows.append(row)
    return vars_, rows


_TSV_SUGAR = [  # SPARQL-TSV terms use TURTLE syntax incl. number sugar
    (re.compile(r"^[+-]?[0-9]+$"),
     "http://www.w3.org/2001/XMLSchema#integer"),
    (re.compile(r"^[+-]?[0-9]*\.[0-9]+$"),
     "http://www.w3.org/2001/XMLSchema#decimal"),
    (re.compile(r"^[+-]?(?:[0-9]+\.?[0-9]*|\.[0-9]+)[eE][+-]?[0-9]+$"),
     "http://www.w3.org/2001/XMLSchema#double"),
    (re.compile(r"^(?:true|false)$"),
     "http://www.w3.org/2001/XMLSchema#boolean"),
]


def _parse_tsv_term(cell: str) -> str:
    for rx, dt in _TSV_SUGAR:
        if rx.match(cell):
            return format_term((2, cell, dt, "", 0))
    return format_term(parse_term_text(cell))


def bindings_to_csv(bindings, vars: Optional[Sequence[str]] = None) -> str:
    """Spec's lossy CSV: plain values only (IRIs bare, literals by
    lexical form, bnodes as _:label)."""
    import csv

    rows = _rows_of(bindings)
    if vars is None:
        vars = sorted({k for r in rows for k in r})
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\r\n")
    w.writerow(list(vars))
    for r in rows:
        out = []
        for v in vars:
            val = r.get(v)
            if val is None:
                out.append("")
                continue
            t = parse_term_text(val)
            out.append(("_:" + t[1]) if t[0] == KIND_BNODE else t[1])
        w.writerow(out)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# dataset-level adapters
# ---------------------------------------------------------------------------

def rows_to_dataset(vars_: Sequence[str], rows: BindingsRows):
    """Parsed results → bindings Dataset (string columns, None=unbound)
    — the entry point a SERVICE evaluator would join against."""
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        v: pa.array([r.get(v) for r in rows], pa.string())
        for v in vars_}))


def serialize_results(bindings, fmt: str = "json",
                      vars: Optional[Sequence[str]] = None) -> str:
    fn = {"json": bindings_to_json, "xml": bindings_to_xml,
          "tsv": bindings_to_tsv, "csv": bindings_to_csv}[fmt]
    return fn(bindings, vars)


def parse_results(text: str, fmt: str = "json"):
    fn = {"json": parse_json_results, "xml": parse_xml_results,
          "tsv": parse_tsv_results}[fmt]
    return fn(text)
