"""documents-table → RDF triples (SQL-checkable KG micro-pipeline).

A deterministic mapping from the driver's ``documents`` parquet table to
canonical-NT triple rows, used by the correctness gate: the Ray side runs
the real term machinery (flat term columns → vectorized NT formatter),
while the DuckDB oracle reproduces the same strings with pure SQL concat
(safe because lang/source/n_chars contain no escapable characters).

Mapping (per doc):
  <http://kg.example/doc/{doc_id}>  rdf:type        <http://kg.example/Document>
  ...                               dc:language     "{lang}"
  ...                               dc:source       "{source}"
  ...                               ex:nchars       "{n_chars}"^^xsd:integer
"""

from __future__ import annotations

import pyarrow as pa

from ..ntriples import format_nt_batch
from ..terms import (
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    XSD_INTEGER,
    XSD_STRING,
)

DOC = "http://kg.example/doc/"
DOC_TYPE = "http://kg.example/Document"
DC_LANGUAGE = "http://purl.org/dc/terms/language"
DC_SOURCE = "http://purl.org/dc/terms/source"
EX_NCHARS = "http://kg.example/nchars"


def doc_triples_batch(b: pa.Table) -> pa.Table:
    """documents batch → 4 triples per doc, via real term columns +
    the vectorized NT formatter (SURVEY §2.2)."""
    import numpy as np

    ids = [str(x) for x in b["doc_id"].to_pylist()]
    lang = [x or "" for x in b["lang"].to_pylist()]
    src = [x or "" for x in b["source"].to_pylist()]
    nch = [str(x) for x in b["n_chars"].to_pylist()]
    n = len(ids)
    subj = [DOC + i for i in ids]

    def flat(s_lex, p_lex, o_kind, o_lex, o_dt):
        m = len(s_lex)
        return {
            "s_kind": np.full(m, KIND_IRI, np.int8), "s_lex": s_lex,
            "s_dt": [""] * m, "s_lang": [""] * m, "s_dir": np.zeros(m, np.int8),
            "p_kind": np.full(m, KIND_IRI, np.int8), "p_lex": [p_lex] * m,
            "p_dt": [""] * m, "p_lang": [""] * m, "p_dir": np.zeros(m, np.int8),
            "o_kind": np.full(m, o_kind, np.int8), "o_lex": o_lex,
            "o_dt": [o_dt] * m, "o_lang": [""] * m, "o_dir": np.zeros(m, np.int8),
        }

    groups = [
        flat(subj, RDF_TYPE, KIND_IRI, [DOC_TYPE] * n, ""),
        flat(subj, DC_LANGUAGE, KIND_LITERAL, lang, XSD_STRING),
        flat(subj, DC_SOURCE, KIND_LITERAL, src, XSD_STRING),
        flat(subj, EX_NCHARS, KIND_LITERAL, nch, XSD_INTEGER),
    ]
    tables = []
    for g in groups:
        txt = format_nt_batch(g)
        tables.append(pa.table({
            "s": pa.array(list(txt["s"]), pa.large_string()),
            "p": pa.array(list(txt["p"]), pa.large_string()),
            "o": pa.array(list(txt["o"]), pa.large_string()),
        }))
    return pa.concat_tables(tables)


DOC_TRIPLES_SQL = f"""
SELECT '<{DOC}' || doc_id || '>' AS s,
       '<{RDF_TYPE}>' AS p,
       '<{DOC_TYPE}>' AS o FROM documents
UNION ALL
SELECT '<{DOC}' || doc_id || '>', '<{DC_LANGUAGE}>', '"' || lang || '"' FROM documents
UNION ALL
SELECT '<{DOC}' || doc_id || '>', '<{DC_SOURCE}>', '"' || source || '"' FROM documents
UNION ALL
SELECT '<{DOC}' || doc_id || '>', '<{EX_NCHARS}>',
       '"' || n_chars || '"^^<http://www.w3.org/2001/XMLSchema#integer>' FROM documents
"""


def doc_triples(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source", "n_chars"])
    return ds.map_batches(doc_triples_batch, batch_format="pyarrow")
