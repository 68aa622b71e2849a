"""SPARQL-protocol client parity (reference sparql_client/src/lib.rs):
content-negotiated dispatch over a requests-free transport double, and
SERVICE integration through the pluggable resolver."""

import pytest

from sophia_rs_ray.sparql_client import (Bindings, SparqlClient,
                                         SparqlClientError,
                                         static_transport)

EP = "http://sparql.example/endpoint"

JSON_BINDINGS = """{
  "head": {"vars": ["s", "n"]},
  "results": {"bindings": [
    {"s": {"type": "uri", "value": "http://e/a"},
     "n": {"type": "literal", "value": "1",
           "datatype": "http://www.w3.org/2001/XMLSchema#integer"}},
    {"s": {"type": "uri", "value": "http://e/b"}}
  ]}
}"""

JSON_ASK = '{"head": {}, "boolean": true}'

XML_BINDINGS = """<?xml version="1.0"?>
<sparql xmlns="http://www.w3.org/2005/sparql-results#">
  <head><variable name="s"/></head>
  <results>
    <result><binding name="s"><uri>http://e/a</uri></binding></result>
  </results>
</sparql>"""

TSV_BINDINGS = "?s\t?n\n<http://e/a>\t1\n"

TURTLE_DOC = "<http://e/s> <http://e/p> <http://e/o> ."
NT_DOC = "<http://e/s> <http://e/p> \"v\" .\n"
RDFXML_DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:e="http://e/">
  <rdf:Description rdf:about="http://e/s"><e:p>v</e:p></rdf:Description>
</rdf:RDF>"""


def _cli(ctype, body):
    return SparqlClient(EP, transport=static_transport(
        {EP: (ctype, body)}))


def test_ask_returns_bool():
    assert _cli("application/sparql-results+json", JSON_ASK) \
        .query("ASK {}") is True


def test_select_json_bindings():
    res = _cli("application/sparql-results+json;charset=utf-8",
               JSON_BINDINGS).query("SELECT * {}")
    assert isinstance(res, Bindings)
    assert res.variables() == ["s", "n"]
    rows = list(res)
    assert len(rows) == 2
    assert rows[0]["s"] == "<http://e/a>"
    assert rows[1].get("n") is None        # unbound OPTIONAL


def test_select_xml_bindings():
    res = _cli("application/sparql-results+xml", XML_BINDINGS) \
        .query("SELECT * {}")
    assert res.variables() == ["s"]
    assert list(res)[0]["s"] == "<http://e/a>"


def test_select_tsv_bindings():
    res = _cli("text/tab-separated-values", TSV_BINDINGS) \
        .query("SELECT * {}")
    assert res.variables() == ["s", "n"]


@pytest.mark.parametrize("ctype,body", [
    ("text/turtle", TURTLE_DOC),
    ("application/n-triples", NT_DOC),
    ("application/rdf+xml", RDFXML_DOC),
])
def test_graph_responses_yield_triples(ctype, body):
    triples = _cli(ctype, body).query("CONSTRUCT {} WHERE {}")
    assert len(triples) == 1
    s, p, o = triples[0]
    assert s[1] == "http://e/s"


def test_unsupported_content_type():
    with pytest.raises(SparqlClientError, match="unsupported"):
        _cli("application/octet-stream", "x").query("SELECT * {}")


def test_no_transport_is_explicit_error():
    with pytest.raises(SparqlClientError, match="transport"):
        SparqlClient(EP).query("ASK {}")


def test_accept_header_default_and_override():
    seen = {}

    def transport(endpoint, q, headers):
        seen.update(headers)
        return "application/sparql-results+json", JSON_ASK

    cli = SparqlClient(EP, transport=transport)
    cli.query("ASK {}")
    assert seen["Accept"].startswith("application/sparql-results+json")
    cli.with_accept("text/turtle").query("ASK {}")
    assert seen["Accept"] == "text/turtle"


def test_bindings_to_dataset(ray_session):
    res = _cli("application/sparql-results+json", JSON_BINDINGS) \
        .query("SELECT * {}")
    ds = res.to_dataset()
    assert ds.count() == 2


def test_service_clause_runs_through_client(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from sophia_rs_ray.sparql.algebra import set_service_resolver
    from sophia_rs_ray.sparql.run import sparql

    cli = SparqlClient(EP, transport=static_transport(
        {"http://remote.example/sparql":
         ("application/sparql-results+json", JSON_BINDINGS)}))
    set_service_resolver(cli.as_service_resolver())
    try:
        tbl = pa.table({
            "s": pa.array(["<http://e/a>"], pa.large_string()),
            "p": pa.array(["<http://e/p>"], pa.large_string()),
            "o": pa.array(["<http://e/o>"], pa.large_string()),
            "g": pa.array([""], pa.large_string()),
        })
        q = """SELECT ?s ?n WHERE {
          SERVICE <http://remote.example/sparql> { ?s ?x ?n }
        }"""
        rows = sparql(q, rd.from_arrow(tbl)).take_all()
        assert {r["s"] for r in rows} == {"<http://e/a>", "<http://e/b>"}
    finally:
        set_service_resolver(None)


# ---------------------------------------------------------------------------
# round-4: opt-in stdlib urllib transport against a loopback server
# (closes the live-HTTP parity gap vs the reference's reqwest client)
# ---------------------------------------------------------------------------

import json as _json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from sophia_rs_ray.sparql_client import urllib_transport


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        query = self.rfile.read(n).decode("utf-8")
        accept = self.headers.get("Accept", "")
        assert self.headers.get("Content-type") == \
            "application/sparql-query"
        if self.path == "/boom":
            self.send_response(500)
            self.end_headers()
            return
        if "ASK" in query:
            body = '{"head": {}, "boolean": true}'
            ctype = "application/sparql-results+json"
        elif "CONSTRUCT" in query:
            body = "<http://e/s> <http://e/p> <http://e/o> ."
            ctype = "text/turtle"
        else:
            # conneg: answer in the client's preferred format
            assert accept.startswith("application/sparql-results+json")
            body = _json.dumps({
                "head": {"vars": ["s"]},
                "results": {"bindings": [
                    {"s": {"type": "uri", "value": "http://e/a"}},
                    {"s": {"type": "uri", "value": "http://e/b"}},
                ]}})
            ctype = "application/sparql-results+json"
        payload = body.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", ctype + "; charset=utf-8")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def loopback():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_urllib_transport_select_conneg(loopback):
    cli = SparqlClient(f"{loopback}/sparql",
                       transport=urllib_transport(timeout=5))
    out = cli.query("SELECT ?s WHERE { ?s ?p ?o }")
    assert isinstance(out, Bindings)
    assert out.variables() == ["s"]
    assert [r["s"] for r in out] == ["<http://e/a>", "<http://e/b>"]


def test_urllib_transport_ask(loopback):
    cli = SparqlClient(f"{loopback}/sparql",
                       transport=urllib_transport(timeout=5))
    assert cli.query("ASK { ?s ?p ?o }") is True


def test_urllib_transport_construct_turtle(loopback):
    cli = SparqlClient(f"{loopback}/sparql",
                       transport=urllib_transport(timeout=5))
    triples = list(cli.query("CONSTRUCT WHERE { ?s ?p ?o }"))
    assert len(triples) == 1
    s, p, o = triples[0]
    assert (s[1], p[1], o[1]) == ("http://e/s", "http://e/p", "http://e/o")


def test_urllib_transport_http_error(loopback):
    cli = SparqlClient(f"{loopback}/boom",
                       transport=urllib_transport(timeout=5))
    with pytest.raises(SparqlClientError, match="HTTP 500"):
        cli.query("SELECT ?s WHERE { ?s ?p ?o }")


def test_urllib_transport_unreachable():
    cli = SparqlClient("http://127.0.0.1:9/sparql",
                       transport=urllib_transport(timeout=0.5))
    with pytest.raises(SparqlClientError):
        cli.query("SELECT ?s WHERE { ?s ?p ?o }")


def test_service_clause_over_live_http(ray_session, loopback):
    """End-to-end federation: a SPARQL SERVICE clause resolved through
    the opt-in urllib transport against a real (loopback) HTTP server —
    the full reference execution path (sparql/src/exec.rs SERVICE →
    sparql_client reqwest) with stdlib urllib as the wire."""
    import pyarrow as pa
    import ray.data as rd

    from sophia_rs_ray.sparql.algebra import set_service_resolver
    from sophia_rs_ray.sparql.run import sparql

    cli = SparqlClient(f"{loopback}/sparql",
                       transport=urllib_transport(timeout=5))
    set_service_resolver(cli.as_service_resolver())
    try:
        tbl = pa.table({
            "s": pa.array(["<http://e/a>"], pa.large_string()),
            "p": pa.array(["<http://e/p>"], pa.large_string()),
            "o": pa.array(["<http://e/o>"], pa.large_string()),
            "g": pa.array([""], pa.large_string()),
        })
        q = ("SELECT ?s WHERE { SERVICE <%s/sparql> { ?s ?x ?n } }"
             % loopback)
        rows = sparql(q, rd.from_arrow(tbl)).take_all()
        assert {r["s"] for r in rows} == {"<http://e/a>", "<http://e/b>"}
    finally:
        set_service_resolver(None)
