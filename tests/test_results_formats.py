"""SPARQL results formats (JSON/XML/TSV/CSV) round-trip tests —
reference sparql_client/src/results.rs + results/xml_parser.rs."""

import pytest

from sophia_rs_ray.sparql.results import (
    bindings_to_csv, bindings_to_json, bindings_to_tsv, bindings_to_xml,
    boolean_to_json, boolean_to_xml, parse_results, rows_to_dataset,
    serialize_results,
)

ROWS = [
    {"s": "<http://ex/a>", "o": '"plain"'},
    {"s": "_:b0", "o": '"5"^^<http://www.w3.org/2001/XMLSchema#integer>'},
    {"s": "<http://ex/c>", "o": '"bonjour"@fr'},
    {"s": "<http://ex/d>", "o": None},
    {"s": "<http://ex/e>",
     "o": '<<( <http://ex/x> <http://ex/y> "z" )>>'},
]
VARS = ["s", "o"]


@pytest.mark.parametrize("fmt", ["json", "xml", "tsv"])
def test_roundtrip(fmt):
    text = serialize_results(ROWS, fmt, VARS)
    vars_, rows = parse_results(text, fmt)
    assert vars_ == VARS
    assert rows == [{v: r.get(v) for v in VARS} for r in ROWS]


def test_boolean_documents():
    assert parse_results(boolean_to_json(True), "json") is True
    assert parse_results(boolean_to_json(False), "json") is False
    assert parse_results(boolean_to_xml(True), "xml") is True
    assert parse_results(boolean_to_xml(False), "xml") is False


def test_json_term_shapes():
    import json

    doc = json.loads(bindings_to_json(ROWS, VARS))
    b = doc["results"]["bindings"]
    assert b[0]["s"] == {"type": "uri", "value": "http://ex/a"}
    assert b[1]["s"] == {"type": "bnode", "value": "b0"}
    assert b[1]["o"]["datatype"].endswith("integer")
    assert b[2]["o"] == {"type": "literal", "value": "bonjour",
                         "xml:lang": "fr"}
    assert "o" not in b[3]
    assert b[4]["o"]["type"] == "triple"


def test_csv_lossy_values():
    text = bindings_to_csv(ROWS, VARS)
    lines = text.strip().split("\r\n")
    assert lines[0] == "s,o"
    assert lines[1] == "http://ex/a,plain"
    assert lines[2] == "_:b0,5"


def test_rows_to_dataset(ray_session):
    vars_, rows = parse_results(bindings_to_json(ROWS, VARS), "json")
    ds = rows_to_dataset(vars_, rows)
    assert ds.count() == len(ROWS)
    got = ds.take_all()
    assert got[0]["s"] == "<http://ex/a>"
    assert got[3]["o"] is None


def test_select_to_results_end_to_end(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sophia_rs_ray.sparql.run import select

    g = rd.from_arrow(pa.table({
        "s": pa.array(["<u:a>", "<u:b>"], pa.large_string()),
        "p": pa.array(["<u:p>", "<u:p>"], pa.large_string()),
        "o": pa.array(['"1"', '"2"'], pa.large_string())}))
    out = select("SELECT ?s ?o WHERE { ?s <u:p> ?o }", g)
    text = serialize_results(out, "json", ["s", "o"])
    vars_, rows = parse_results(text, "json")
    assert len(rows) == 2 and vars_ == ["s", "o"]
