"""Hardened opt-in HTTP front doors (VERDICT r4 item 8): a hostile
loopback server feeds oversized bodies, wrong media types, redirect
loops, and lying Content-Length headers; only the documented error
types (SparqlClientError / LoaderError) may escape."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from sophia_rs_ray.jsonld_loaders import HttpLoader, LoaderError
from sophia_rs_ray.sparql_client import (
    SparqlClient, SparqlClientError, urllib_transport,
)

_SMALL_JSON = json.dumps({"@context": {"name": "http://s.org/name"}})
_RESULTS = json.dumps({"head": {"vars": ["s"]},
                       "results": {"bindings": []}})


class _HostileHandler(BaseHTTPRequestHandler):
    def _reply(self, code, body=b"", ctype="application/json",
               clen=None, extra=()):
        self.send_response(code)
        if ctype is not None:
            self.send_header("Content-Type", ctype)
        self.send_header("Content-Length",
                         str(len(body) if clen is None else clen))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        try:
            self.wfile.write(body)
        except BrokenPipeError:  # client hung up after its cap
            pass

    def _serve(self):
        p = self.path
        if p == "/loop":
            self._reply(302, extra=[("Location", "/loop")])
        elif p == "/big":
            self._reply(200, b"x" * 4096,
                        ctype="application/sparql-results+json")
        elif p == "/big-json":
            # oversized but valid-ish JSON-LD payload
            self._reply(200, b'{"a": "' + b"x" * 4096 + b'"}')
        elif p == "/lying-length":
            # +json suffix passes BOTH doors' ctype checks, so the
            # length check is what must fire
            self._reply(200, b"{}", clen=10_000_000,
                        ctype="application/sparql-results+json")
        elif p == "/html":
            self._reply(200, b"<html>not json</html>", ctype="text/html")
        elif p == "/octet":
            self._reply(200, b"\x00\x01", ctype=None)
        elif p == "/ld":
            self._reply(200, _SMALL_JSON.encode(),
                        ctype="application/ld+json")
        elif p == "/geo":
            # any +json suffix type is acceptable JSON-LD transport
            self._reply(200, _SMALL_JSON.encode(),
                        ctype="application/geo+json")
        elif p == "/results":
            self._reply(200, _RESULTS.encode(),
                        ctype="application/sparql-results+json")
        elif p == "/redirect-once":
            self._reply(302, extra=[("Location", "/ld")])
        else:
            self._reply(404)

    do_GET = _serve

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        self.rfile.read(n)
        self._serve()

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def hostile():
    srv = HTTPServer(("127.0.0.1", 0), _HostileHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


# --- SPARQL transport -----------------------------------------------------

def _cli(url, **kw):
    return SparqlClient(url, transport=urllib_transport(timeout=5, **kw))


def test_transport_rejects_non_http_scheme():
    with pytest.raises(SparqlClientError, match="scheme"):
        _cli("ftp://example.org/sparql").query("ASK {}")


def test_transport_caps_redirect_loop(hostile):
    with pytest.raises(SparqlClientError):
        _cli(f"{hostile}/loop", max_redirects=3).query("ASK {}")


def test_transport_caps_body_size(hostile):
    with pytest.raises(SparqlClientError, match="cap"):
        _cli(f"{hostile}/big", max_bytes=1024).query("ASK {}")


def test_transport_rejects_lying_content_length(hostile):
    with pytest.raises(SparqlClientError, match="cap"):
        _cli(f"{hostile}/lying-length", max_bytes=1024).query("ASK {}")


def test_transport_rejects_off_allowlist_ctype(hostile):
    with pytest.raises(SparqlClientError, match="allowlist"):
        _cli(f"{hostile}/html").query("ASK {}")
    with pytest.raises(SparqlClientError, match="allowlist"):
        _cli(f"{hostile}/octet").query("ASK {}")


def test_transport_happy_path_still_works(hostile):
    out = _cli(f"{hostile}/results").query("SELECT ?s WHERE { ?s ?p ?o }")
    assert out.variables() == ["s"] and len(out) == 0


# --- JSON-LD HttpLoader ----------------------------------------------------

def test_loader_rejects_non_http_scheme():
    with pytest.raises(LoaderError):
        HttpLoader()("file:///etc/passwd")


def test_loader_caps_redirect_loop(hostile):
    with pytest.raises(LoaderError):
        HttpLoader(max_redirects=3)(f"{hostile}/loop")


def test_loader_follows_bounded_redirect(hostile):
    doc = HttpLoader(max_redirects=3)(f"{hostile}/redirect-once")
    assert doc == json.loads(_SMALL_JSON)


def test_loader_caps_body_size(hostile):
    # honest Content-Length > cap → the pre-check fires; a chunked/
    # lying server is covered by the stream cap (read(max_bytes+1))
    with pytest.raises(LoaderError,
                       match="exceeds|Content-Length"):
        HttpLoader(max_bytes=1024)(f"{hostile}/big-json")


def test_loader_rejects_lying_content_length(hostile):
    with pytest.raises(LoaderError, match="Content-Length"):
        HttpLoader(max_bytes=1024)(f"{hostile}/lying-length")


def test_loader_rejects_non_json_ctype(hostile):
    with pytest.raises(LoaderError, match="content-type"):
        HttpLoader()(f"{hostile}/html")


def test_loader_accepts_json_suffix_types(hostile):
    assert HttpLoader()(f"{hostile}/ld") == json.loads(_SMALL_JSON)
    assert HttpLoader()(f"{hostile}/geo") == json.loads(_SMALL_JSON)


def test_loader_cache_is_bounded(hostile):
    ld = HttpLoader()
    ld._cache = {f"u{i}": {} for i in range(HttpLoader.MAX_CACHE)}
    ld(f"{hostile}/ld")           # triggers the clear-then-insert path
    assert len(ld._cache) == 1
