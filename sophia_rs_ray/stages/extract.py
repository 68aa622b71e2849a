"""Page → triples extraction stage (stateless ``map_batches`` task).

The Ray Data mapping of SURVEY.md §2.1: each input row is one web page;
the batch body runs the one-pass HTML extractor, the JSON-LD expander and
the microdata/RDFa converters, resolves IRIs against the page URL, and
skolemizes blank nodes with the deterministic ``h(url‖extractor)`` suffix
(replacing the reference's per-parser-run UUID suffix,
``turtle/src/parser/_common/_inner.rs:23-47``).

Input schema:  (url, warc_ts, html, text, lang)   [html may be binary]
Output schema: url, extractor, error, + flat term columns
               (s_kind, s_lex, s_dt, s_lang, s_dir, p_*, o_*)
Error rows carry s_kind = -1 and a non-empty ``error`` (two-sided error
semantics — parse errors are rows, not job failures;
``api/src/source/_stream_error.rs:13``).

The heavy ``html`` column is consumed here and MUST NOT propagate further
(SURVEY §7.4 "project early").
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

import pyarrow as pa

from ..extract.html_page import extract_page
from ..ntriples import format_nt_table
from ..extract.to_triples import _Alloc, microdata_to_triples, rdfa_to_triples
from ..iri import BaseIri
from ..jsonld import JsonLdExpander
from ..sources.pages import skolem, skolem_suffix
from ..terms import KIND_BNODE, Term

_TERM_COLS = [
    "s_kind", "s_lex", "s_dt", "s_lang", "s_dir",
    "p_kind", "p_lex", "p_dt", "p_lang", "p_dir",
    "o_kind", "o_lex", "o_dt", "o_lang", "o_dir",
]

TRIPLES_SCHEMA = pa.schema(
    [("url", pa.large_string()), ("extractor", pa.string()),
     ("error", pa.string())]
    + [(c, pa.int8() if c.endswith(("kind", "dir")) else pa.large_string())
       for c in _TERM_COLS]
)


def _skolemize(t: Term, url: str, extractor: str) -> Term:
    if t[0] == KIND_BNODE:
        return (t[0], skolem(t[1], url, extractor), t[2], t[3], t[4])
    return t


def extract_triples_batch(batch: pa.Table) -> pa.Table:
    """pyarrow batch of pages → pyarrow batch of flat triple rows."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()

    # one flat 18-field tuple per output row; the column split happens
    # once at the end via zip(*rows) (a C-level transpose) instead of
    # 18 Python list.append calls per triple
    rows: List[tuple] = []
    rows_append = rows.append
    _err_tail = (-1, "", "", "", -1) * 3

    BN = KIND_BNODE

    def push(url: str, extractor: str,
             s: Term, p: Term, o: Term) -> None:
        # the suffix digest is label-independent and lru-cached per
        # (url, extractor), so renaming is one concat per bnode term
        if s[0] == BN or p[0] == BN or o[0] == BN:
            sfx = skolem_suffix(url, extractor)
            if s[0] == BN:
                s = (BN, s[1] + sfx, s[2], s[3], s[4])
            if p[0] == BN:
                p = (BN, p[1] + sfx, p[2], p[3], p[4])
            if o[0] == BN:
                o = (BN, o[1] + sfx, o[2], o[3], o[4])
        rows_append((url, extractor, "") + s + p + o)

    def push_error(url: str, extractor: str, msg: str) -> None:
        rows_append((url, extractor, msg) + _err_tail)

    for url, html in zip(urls, htmls):
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", errors="replace")
        _text, ld_blocks, micro, rdfa = extract_page(html, want_text=False)
        try:
            base: Optional[BaseIri] = BaseIri(url)
        except ValueError:
            base = None

        counter = 0
        for blk in ld_blocks:
            exp = JsonLdExpander(url)
            exp.counter = counter  # labels stay unique across blocks of one page
            try:
                doc = json.loads(blk)
            except json.JSONDecodeError as e:
                push_error(url, "jsonld", f"json: {e}")
                continue
            try:
                trs = exp.to_rdf(doc)
            except (RecursionError, ValueError, TypeError, KeyError) as e:
                push_error(url, "jsonld", f"jsonld: {e}")
                continue
            counter = exp.counter
            for s, p, o, _g in trs:
                push(url, "jsonld", s, p, o)

        alloc = _Alloc(0)
        for s, p, o in microdata_to_triples(micro, base, alloc):
            push(url, "microdata", s, p, o)
        alloc2 = _Alloc(0)
        for s, p, o in rdfa_to_triples(rdfa, base, alloc2):
            push(url, "rdfa", s, p, o)

    if rows:
        cols = list(zip(*rows))
    else:
        cols = [()] * (3 + len(_TERM_COLS))
    arrays = [pa.array(cols[0], pa.large_string()),
              pa.array(cols[1], pa.string()),
              pa.array(cols[2], pa.string())]
    for i, c in enumerate(_TERM_COLS):
        typ = pa.int8() if c.endswith(("kind", "dir")) else pa.large_string()
        arrays.append(pa.array(cols[3 + i], typ))
    return pa.Table.from_arrays(arrays, schema=TRIPLES_SCHEMA)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """pages → (url, text) via the deterministic visible-text extractor
    (the byte-identical-per-url invariant surface)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    texts = []
    for html in htmls:
        if isinstance(html, (bytes, bytearray, memoryview)):
            html = bytes(html).decode("utf-8", errors="replace")
        texts.append(extract_page(html)[0])
    return pa.table({"url": pa.array(urls, pa.large_string()),
                     "text": pa.array(texts, pa.large_string())})


def format_triples_batch(batch: pa.Table, keep: Tuple[str, ...] = ("url",)) -> pa.Table:
    """flat term columns → canonical NT text columns (s, p, o) +
    carried-over columns. Drops error rows."""
    ok = pa.compute.not_equal(batch["s_kind"], pa.scalar(-1, pa.int8()))
    batch = batch.filter(ok)
    txt = format_nt_table(batch)
    data = {k: batch[k] for k in keep if k in batch.column_names}
    data.update({"s": txt["s"], "p": txt["p"], "o": txt["o"]})
    return pa.table(data)
