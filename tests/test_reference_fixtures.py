"""Cross-format parity over the REFERENCE's own fixture files
(`/root/reference/resource/test/`): file1.ttl / file3.nt /
file4.jsonld / file5.rdf all describe the same 20-triple graph
(reference `resource/src/lib.rs` F1_LEN..F5_LEN), and file6.nq /
file7.trig the same 2-quad dataset.  Each of our parsers must produce
the reference's triple counts AND pairwise-isomorphic graphs.  The
fixtures are read from the reference checkout (never copied); skipped
when it is absent."""

import json
import os

import pytest

FIX = "/root/reference/resource/test"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference checkout not available")

# the base the reference's NT/XML exports were generated against
BASE = "file:///home/pa/dev/sophia_rs/resource/test/file1.ttl"


def _read(name: str) -> str:
    with open(f"{FIX}/{name}", encoding="utf-8") as f:
        return f.read()


def _iso(t1, t2):
    from sophia_rs_ray.c14n import isomorphic

    def quads(ts):
        return [t if len(t) == 4 else (t[0], t[1], t[2], None) for t in ts]

    return isomorphic(quads(t1), quads(t2))


@pytest.fixture(scope="module")
def graphs():
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples
    from sophia_rs_ray.ntriples import parse_document
    from sophia_rs_ray.rdfxml import parse_rdfxml
    from sophia_rs_ray.turtle import parse_turtle

    out = {}
    out["ttl"] = parse_turtle(_read("file1.ttl"), base=BASE)
    out["nt"] = [(s, p, o) for (s, p, o, _g) in parse_document(_read("file3.nt"))]
    ctx = _read("ctx.jsonld")

    def loader(url):
        assert url.endswith("ctx.jsonld"), url
        return json.loads(ctx)

    trs, err = jsonld_to_triples(
        _read("file4.jsonld"), BASE,
        options=JsonLdOptions(context_loader=loader))
    assert err is None, err
    out["jsonld"] = [(s, p, o) for (s, p, o, _g) in trs]
    out["xml"] = parse_rdfxml(_read("file5.rdf"))
    return out


@pytest.mark.parametrize("fmt", ["ttl", "nt", "jsonld", "xml"])
def test_reference_triple_counts(graphs, fmt):
    assert len(graphs[fmt]) == 20  # F1_LEN == F3_LEN == F4_LEN == F5_LEN


@pytest.mark.parametrize("fmt", ["nt", "jsonld", "xml"])
def test_reference_cross_format_isomorphic(graphs, fmt):
    assert _iso(graphs["ttl"], graphs[fmt]), fmt


def test_reference_file2():
    from sophia_rs_ray.turtle import parse_turtle

    base2 = BASE.replace("file1.ttl", "file2.ttl")
    assert len(parse_turtle(_read("file2.ttl"), base=base2)) == 2


def test_reference_quad_fixtures_isomorphic():
    from sophia_rs_ray.ntriples import parse_document
    from sophia_rs_ray.turtle import parse_trig

    nq = parse_document(_read("file6.nq"), quads=True)
    trig = parse_trig(_read("file7.trig"))
    assert len(nq) == len(trig) == 2
    assert _iso(nq, trig)


# --- DirLoader over the reference's own fixture DIRECTORY ----------------
# (the reference's make_loader: LocalLoader mapping http://example.org/
#  to resource/test; loader tests in resource/src/resource/test.rs)

NS = "http://example.org/"
EX = f"{NS}ns#"


@pytest.fixture(scope="module")
def ref_loader():
    from sophia_rs_ray.resource import DirLoader

    return DirLoader([(NS, FIX)])


def test_dirloader_get_resource(ref_loader):
    from sophia_rs_ray.terms import iri, literal

    r1 = ref_loader.get_resource(f"{NS}file1.ttl#res1")
    assert r1.get_term(f"{EX}id") == literal("res1")
    # cross-file foreign resource: loads file2.ttl on demand
    f2r1 = r1.get_resource(f"{EX}foreign1")
    assert f2r1.get_term(f"{EX}id") == literal("res1")
    assert f2r1.id == iri(f"{NS}file2.ttl#res1")


def test_dirloader_conneg_no_extension(ref_loader):
    from sophia_rs_ray.terms import literal

    # get_resource_no_ext: file1 resolves to file1.ttl via conneg probe
    r1 = ref_loader.get_resource(f"{NS}file1#res1")
    assert r1.get_term(f"{EX}id") == literal("res1")


def test_dirloader_list_ladder(ref_loader):
    from sophia_rs_ray.terms import iri

    r1 = ref_loader.get_resource(f"{NS}file1.ttl#res1")
    items = r1.get_term_items(f"{EX}list")
    assert items == [iri(f"{NS}file1.ttl#res3"),
                     iri(f"{NS}file1.ttl#res2"),
                     iri(f"{NS}file2.ttl#res1")]


def test_dirloader_missing_doc(ref_loader):
    from sophia_rs_ray.resource import LoaderError

    with pytest.raises(LoaderError):
        ref_loader.get_resource(f"{NS}not_there#x")
