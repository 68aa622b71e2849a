"""JSON-LD loader-suite parity (reference ``jsonld/src/loader.rs`` +
``jsonld/src/loader/``): NoLoader / StaticLoader / FsLoader /
FileUrlLoader / ChainLoader / ClosureLoader composition, exercised over
the reference's own fixture directory (file4.jsonld dereferences its
relative ``ctx.jsonld`` context through each loader)."""

import json
import os

import pytest

FIX = "/root/reference/resource/test"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference checkout not available")

BASE = "http://example.org/ns/file4.jsonld"


def _read(name: str) -> str:
    with open(f"{FIX}/{name}", encoding="utf-8") as f:
        return f.read()


def _parse_file4(loader):
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples
    from sophia_rs_ray.jsonld_loaders import as_context_loader

    trs, err = jsonld_to_triples(
        _read("file4.jsonld"), BASE,
        options=JsonLdOptions(context_loader=as_context_loader(loader)))
    assert err is None, err
    return trs


def test_static_loader_serves_context():
    from sophia_rs_ray.jsonld_loaders import StaticLoader

    ld = StaticLoader().with_("http://example.org/ns/ctx.jsonld",
                              json.loads(_read("ctx.jsonld")))
    assert len(_parse_file4(ld)) == 20   # reference F4_LEN


def test_fs_loader_mounts_fixture_dir():
    from sophia_rs_ray.jsonld_loaders import FsLoader

    ld = FsLoader().mount("http://example.org/ns/", FIX)
    assert len(_parse_file4(ld)) == 20


def test_file_url_loader():
    from sophia_rs_ray.jsonld_loaders import FileUrlLoader, LoaderError

    ld = FileUrlLoader()
    doc = ld(f"file://{FIX}/ctx.jsonld")
    assert "@context" in doc
    with pytest.raises(LoaderError):
        ld("http://example.org/ctx.jsonld")
    with pytest.raises(LoaderError):
        ld(f"file://{FIX}/nope.jsonld")


def test_chain_loader_falls_back():
    from sophia_rs_ray.jsonld_loaders import (ChainLoader, FsLoader,
                                              NoLoader, StaticLoader)

    chain = ChainLoader(
        NoLoader(),
        StaticLoader({"http://other.example/ctx": {"@vocab": "x:"}}),
        FsLoader().mount("http://example.org/ns/", FIX))
    assert len(_parse_file4(chain)) == 20
    assert chain("http://other.example/ctx") == {"@vocab": "x:"}


def test_chain_loader_first_wins():
    from sophia_rs_ray.jsonld_loaders import ChainLoader, StaticLoader

    first = StaticLoader({"u": {"a": 1}})
    second = StaticLoader({"u": {"a": 2}})
    assert ChainLoader(first, second)("u") == {"a": 1}


def test_no_loader_raises_and_adapts_to_ignore():
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples
    from sophia_rs_ray.jsonld_loaders import (LoaderError, NoLoader,
                                              as_context_loader)

    with pytest.raises(LoaderError):
        NoLoader()("http://any.example/")
    # adapted: unknown remote context is IGNORED (pipeline default)
    trs, err = jsonld_to_triples(
        json.dumps({"@context": "http://unknown.example/ctx",
                    "@id": "http://e/s",
                    "http://e/p": "v"}),
        None,
        options=JsonLdOptions(
            context_loader=as_context_loader(NoLoader())))
    assert err is None
    assert len(trs) == 1


def test_closure_loader_none_means_cannot_serve():
    from sophia_rs_ray.jsonld_loaders import ClosureLoader, LoaderError

    ld = ClosureLoader(lambda u: {"ok": u} if "yes" in u else None)
    assert ld("http://e/yes") == {"ok": "http://e/yes"}
    with pytest.raises(LoaderError):
        ld("http://e/no")


def test_fs_loader_refuses_path_escape():
    from sophia_rs_ray.jsonld_loaders import FsLoader, LoaderError

    ld = FsLoader().mount("http://example.org/ns/", FIX)
    with pytest.raises(LoaderError):
        ld("http://example.org/ns/../../etc/passwd")


def test_loaded_graph_matches_static_and_fs():
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.jsonld_loaders import FsLoader, StaticLoader

    g1 = _parse_file4(StaticLoader(
        {"http://example.org/ns/ctx.jsonld":
         json.loads(_read("ctx.jsonld"))}))
    g2 = _parse_file4(FsLoader().mount("http://example.org/ns/", FIX))
    assert isomorphic(g1, g2)


def test_fsloader_percent_encoded_path(tmp_path):
    from sophia_rs_ray.jsonld_loaders import FsLoader

    (tmp_path / "my ctx.jsonld").write_text('{"@context": {"n": "x:n"}}')
    ld = FsLoader().mount("http://ex.org/ctx/", str(tmp_path))
    doc = ld("http://ex.org/ctx/my%20ctx.jsonld")
    assert doc["@context"]["n"] == "x:n"


def test_fsloader_encoded_escape_refused(tmp_path):
    import pytest as _pytest

    from sophia_rs_ray.jsonld_loaders import FsLoader, LoaderError

    ld = FsLoader().mount("http://ex.org/ctx/", str(tmp_path))
    for bad in ("http://ex.org/ctx/%2E%2E/etc.jsonld",
                "http://ex.org/ctx/a%2F..%2Fb.jsonld",
                "http://ex.org/ctx/../pw.jsonld"):
        with _pytest.raises(LoaderError):
            ld(bad)


def test_file_url_loader_percent_encoded(tmp_path):
    from sophia_rs_ray.jsonld_loaders import FileUrlLoader

    (tmp_path / "a b.jsonld").write_text('{"@context": {}}')
    url = "file://" + str(tmp_path).replace(" ", "%20") + "/a%20b.jsonld"
    assert FileUrlLoader()(url) == {"@context": {}}


# ---------------------------------------------------------------------------
# round-4: opt-in HttpLoader (reference jsonld/src/loader.rs:38-40,
# feature-gated json_ld::ReqwestLoader) against a loopback server
# ---------------------------------------------------------------------------

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer


class _CtxHandler(BaseHTTPRequestHandler):
    hits = {}

    def do_GET(self):
        _CtxHandler.hits[self.path] = _CtxHandler.hits.get(self.path, 0) + 1
        if self.path == "/ctx.jsonld":
            body = json.dumps({"@context": {
                "name": "http://xmlns.com/foaf/0.1/name"}}).encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/ld+json; charset=utf-8")
        elif self.path == "/bad.json":
            body = b"{not json"
            self.send_response(200)
            self.send_header("Content-Type", "application/ld+json")
        else:
            self.send_response(404)
            self.end_headers()
            return
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def ctx_server():
    srv = HTTPServer(("127.0.0.1", 0), _CtxHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_loader_fetches_and_caches(ctx_server):
    from sophia_rs_ray.jsonld_loaders import HttpLoader

    ld = HttpLoader(timeout=5)
    url = f"{ctx_server}/ctx.jsonld"
    doc = ld(url)
    assert doc["@context"]["name"] == "http://xmlns.com/foaf/0.1/name"
    before = _CtxHandler.hits["/ctx.jsonld"]
    assert ld(url) == doc           # served from cache
    assert _CtxHandler.hits["/ctx.jsonld"] == before


def test_http_loader_errors_are_loader_errors(ctx_server):
    from sophia_rs_ray.jsonld_loaders import HttpLoader, LoaderError

    ld = HttpLoader(timeout=5)
    with pytest.raises(LoaderError, match="HTTP 404"):
        ld(f"{ctx_server}/missing.jsonld")
    with pytest.raises(LoaderError, match="invalid JSON"):
        ld(f"{ctx_server}/bad.json")
    with pytest.raises(LoaderError, match="not an http"):
        ld("file:///etc/hosts")
    with pytest.raises(LoaderError, match="cannot reach"):
        HttpLoader(timeout=0.5)("http://127.0.0.1:9/x.jsonld")


def test_http_loader_resolves_remote_context_end_to_end(ctx_server):
    """A JSON-LD document whose @context is a live http URL parses to
    the vocab-expanded triple through HttpLoader — the reference's
    `JsonLdParser<HttpLoader>` path (jsonld/src/parser/test.rs:61-69)
    with stdlib urllib as the wire."""
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples
    from sophia_rs_ray.jsonld_loaders import HttpLoader, as_context_loader

    doc = json.dumps({"@context": f"{ctx_server}/ctx.jsonld",
                      "@id": "http://e/x", "name": "Alice"})
    trs, err = jsonld_to_triples(
        doc, "http://e/",
        options=JsonLdOptions(
            context_loader=as_context_loader(HttpLoader(timeout=5))))
    assert err is None, err
    assert len(trs) == 1
    p = trs[0][1]
    assert p[1] == "http://xmlns.com/foaf/0.1/name"


def test_http_loader_in_chain_falls_through(ctx_server):
    from sophia_rs_ray.jsonld_loaders import (ChainLoader, HttpLoader,
                                              LoaderError, StaticLoader)

    chain = ChainLoader(StaticLoader().with_("urn:x", {"a": 1}),
                        HttpLoader(timeout=5))
    assert chain("urn:x") == {"a": 1}
    assert "@context" in chain(f"{ctx_server}/ctx.jsonld")
    with pytest.raises(LoaderError):
        chain(f"{ctx_server}/missing.jsonld")
