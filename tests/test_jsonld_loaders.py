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
