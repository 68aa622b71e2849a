"""Resource API tests, mirroring reference resource/src/resource/test.rs
(fixtures adapted: DictLoader instead of filesystem test dir)."""

import pytest

from sophia_rs_ray.resource import (
    DictLoader, DirLoader, LoaderError, LocalGraph, NoLoader, NoValueFor,
    Resource, UnexpectedDatatype, UnexpectedKind,
    UnexpectedMultipleValueFor, UnexpectedValue, as_bool, as_int, as_iri,
    as_str, resource_view,
)
from sophia_rs_ray.terms import KIND_BNODE, iri, literal

NS = "http://example.org/ns#"
F1 = "http://example.org/file1.ttl"
F1R1, F1R2, F1R3 = f"{F1}#res1", f"{F1}#res2", f"{F1}#res3"
F2 = "http://example.org/file2.ttl"
F2R1, F2R2 = f"{F2}#res1", f"{F2}#res2"
F1X = "http://example.org/file1"
F1XR1 = f"{F1X}#res1"

EX_ID = NS + "id"
EX_LIST = NS + "list"
EX_NEXT = NS + "next"
EX_RELATED = NS + "related"
EX_FOREIGN1 = NS + "foreign1"
EX_FOREIGN2 = NS + "foreign2"
EX_UNREACHABLE = NS + "unreachable"
EX_UNUSED = NS + "unused"
EX_COUNT = NS + "count"
EX_OK = NS + "ok"

FILE1_TTL = """
@prefix ex: <http://example.org/ns#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
<#res1> ex:id "res1" ;
    ex:related <#res2>, <#res3>, _:b4 ;
    ex:next <#res2> ;
    ex:count 42 ;
    ex:ok true ;
    ex:foreign1 <http://example.org/file2.ttl#res1> ;
    ex:foreign2 <http://example.org/file2.ttl#res2> ;
    ex:unreachable <http://somewhere.else/> ;
    ex:list ( <#res3> <#res2> <http://example.org/file2.ttl#res1> ) .
<#res2> ex:id "res2" ; ex:list () .
<#res3> ex:id "res3" ; ex:related <#res2> .
_:b4 ex:id "res4" .
"""

FILE2_TTL = """
@prefix ex: <http://example.org/ns#> .
<#res1> ex:id "res1" .
<#res2> ex:next <#res1> .
"""


@pytest.fixture()
def loader():
    return DictLoader({F1: FILE1_TTL, F2: FILE2_TTL})


@pytest.fixture()
def f1r1(loader):
    return loader.get_resource(F1R1)


def rsc(loader, iri_text):
    return loader.get_resource(iri_text)


# -- term getters (test.rs: get_term*) --------------------------------

def test_id(f1r1):
    assert f1r1.id == iri(F1R1)


def test_get_term(f1r1):
    assert f1r1.get_term(EX_ID) == literal("res1")


def test_get_term_no_value(f1r1):
    with pytest.raises(NoValueFor):
        f1r1.get_term(EX_UNUSED)


def test_get_term_too_many_values(f1r1):
    with pytest.raises(UnexpectedMultipleValueFor):
        f1r1.get_term(EX_RELATED)


def test_get_term_unreachable_ok(f1r1):
    # the TERM getter works even when the target document can't load
    assert f1r1.get_term(EX_UNREACHABLE) == iri("http://somewhere.else/")


def test_get_any_term(f1r1):
    assert f1r1.get_any_term(EX_ID) == literal("res1")
    assert f1r1.get_any_term(EX_RELATED) is not None
    assert f1r1.get_any_term(EX_UNUSED) is None


def test_get_all_terms(f1r1):
    terms = sorted(f1r1.get_all_terms(EX_RELATED))
    assert len(terms) == 3
    kinds = [t[0] for t in terms]
    assert KIND_BNODE in kinds
    assert iri(F1R2) in terms and iri(F1R3) in terms


def test_get_all_terms_empty(f1r1):
    assert f1r1.get_all_terms(EX_UNUSED) == []


# -- list ladder (test.rs: get_terms_items*) --------------------------

def test_get_term_items(f1r1):
    items = f1r1.get_term_items(EX_LIST)
    assert items == [iri(F1R3), iri(F1R2), iri(F2R1)]


def test_get_term_items_empty(loader):
    assert rsc(loader, F1R2).get_term_items(EX_LIST) == []


def test_get_term_items_absent(loader):
    assert rsc(loader, F1R3).get_term_items(EX_LIST) == []


def test_get_term_items_ambiguous():
    g = LocalGraph([
        (iri("x:s"), iri(EX_LIST), iri("x:n1")),
        (iri("x:n1"), iri(f"{'http://www.w3.org/1999/02/22-rdf-syntax-ns#'}first"), literal("a")),
        (iri("x:n1"), iri(f"{'http://www.w3.org/1999/02/22-rdf-syntax-ns#'}first"), literal("b")),
        (iri("x:n1"), iri(f"{'http://www.w3.org/1999/02/22-rdf-syntax-ns#'}rest"), iri(f"{'http://www.w3.org/1999/02/22-rdf-syntax-ns#'}nil")),
    ])
    r = Resource(iri("x:s"), None, g)
    with pytest.raises(UnexpectedMultipleValueFor):
        r.get_term_items(EX_LIST)


# -- predecessors (test.rs: pred_term*) -------------------------------

def test_pred_term(loader):
    assert rsc(loader, F1R3).pred_term(EX_RELATED) == iri(F1R1)


def test_pred_term_no_value(f1r1):
    with pytest.raises(NoValueFor):
        f1r1.pred_term(EX_UNUSED)


def test_pred_term_too_many_values(loader):
    with pytest.raises(UnexpectedMultipleValueFor):
        rsc(loader, F1R2).pred_term(EX_RELATED)


def test_pred_any_term(loader):
    assert rsc(loader, F1R3).pred_any_term(EX_RELATED) == iri(F1R1)
    assert rsc(loader, F1R2).pred_any_term(EX_RELATED) is not None
    assert rsc(loader, F1R1).pred_any_term(EX_UNUSED) is None


def test_pred_all_terms(loader):
    preds = sorted(rsc(loader, F1R2).pred_all_terms(EX_RELATED))
    assert preds == sorted([iri(F1R1), iri(F1R3)])


# -- resource getters (test.rs: get_resource*) ------------------------

def test_get_resource(f1r1):
    assert f1r1.get_resource(EX_ID).id == literal("res1")
    assert f1r1.get_resource(EX_NEXT).get_term(EX_ID) == literal("res2")


def test_get_resource_conneg(loader):
    # extension-less url resolves via conneg emulation
    r = loader.get_resource(F1XR1)
    assert r.get_term(EX_ID) == literal("res1")
    nxt = r.get_resource(EX_NEXT)
    assert nxt.get_term(EX_ID) == literal("res2")


def test_get_resource_foreign(f1r1):
    r1 = f1r1.get_resource(EX_FOREIGN1)
    assert r1.id == iri(F2R1)
    assert r1.get_term(EX_ID) == literal("res1")
    r2 = f1r1.get_resource(EX_FOREIGN2)
    assert r2.id == iri(F2R2)
    assert r2.get_term(EX_NEXT) == iri(F2R1)


def test_get_resource_unreachable(f1r1):
    with pytest.raises(LoaderError):
        f1r1.get_resource(EX_UNREACHABLE)


def test_get_all_resources(f1r1):
    rs = f1r1.get_all_resources(EX_RELATED)
    assert len(rs) == 3
    by_id = {}
    for r in rs:
        if r.id[0] == KIND_BNODE:
            assert r.get_term(EX_ID) == literal("res4")
        else:
            by_id[r.id[1]] = r
    assert by_id[F1R2].get_term(EX_ID) == literal("res2")
    assert by_id[F1R3].get_term(EX_ID) == literal("res3")


def test_get_resource_items(f1r1):
    items = f1r1.get_resource_items(EX_LIST)
    assert [r.id for r in items] == [iri(F1R3), iri(F1R2), iri(F2R1)]
    # last item is FOREIGN: loaded from file2
    assert items[2].get_term(EX_ID) == literal("res1")


def test_pred_resource(loader):
    assert rsc(loader, F1R3).pred_resource(EX_RELATED).id == iri(F1R1)


# -- typed getters + check_literal ------------------------------------

def test_typed_getters(f1r1):
    assert f1r1.get_typed(EX_ID, as_str) == "res1"
    assert f1r1.get_typed(EX_COUNT, as_int) == 42
    assert f1r1.get_typed(EX_OK, as_bool) is True
    assert f1r1.get_typed(EX_NEXT, as_iri) == F1R2
    assert f1r1.get_any_typed(EX_UNUSED, as_str) is None
    with pytest.raises(UnexpectedDatatype):
        f1r1.get_typed(EX_ID, as_int)
    with pytest.raises(UnexpectedKind):
        f1r1.get_typed(EX_NEXT, as_str)


def test_check_literal(f1r1):
    v = f1r1.get_term(EX_ID)
    assert f1r1.check_literal(
        v, "http://www.w3.org/2001/XMLSchema#string",
        ("res1", "other"), EX_ID) == "res1"
    with pytest.raises(UnexpectedValue):
        f1r1.check_literal(
            v, "http://www.w3.org/2001/XMLSchema#string",
            ("nope",), EX_ID)
    with pytest.raises(UnexpectedKind):
        f1r1.check_literal(iri("x:y"), "x:dt", (), EX_ID)


# -- loaders ----------------------------------------------------------

def test_no_loader():
    g = LocalGraph([(iri("x:s"), iri("x:p"), iri("http://far.away/x"))])
    r = Resource(iri("x:s"), "x:doc", g, NoLoader())
    with pytest.raises(LoaderError):
        r.get_resource("x:p")


def test_dir_loader(tmp_path):
    (tmp_path / "file1.ttl").write_text(FILE1_TTL)
    (tmp_path / "file2.ttl").write_text(FILE2_TTL)
    ld = DirLoader([("http://example.org/", str(tmp_path))])
    r = ld.get_resource(F1R1)
    assert r.get_term(EX_ID) == literal("res1")
    assert r.get_resource(EX_FOREIGN1).get_term(EX_ID) == literal("res1")
    # conneg: extension-less
    assert ld.get_resource(F1XR1).get_term(EX_ID) == literal("res1")
    with pytest.raises(LoaderError):
        ld.get_resource("http://example.org/not_there#x")


# -- distributed resource_view ----------------------------------------

def test_resource_view(ray_session):
    import ray.data as rd

    rows = [
        {"s": "<x:a>", "p": "<x:name>", "o": '"alice"'},
        {"s": "<x:a>", "p": "<x:age>", "o": '"30"'},
        {"s": "<x:a>", "p": "<x:tag>", "o": '"t2"'},
        {"s": "<x:a>", "p": "<x:tag>", "o": '"t1"'},
        {"s": "<x:b>", "p": "<x:name>", "o": '"bob"'},
        {"s": "<x:b>", "p": "<x:other>", "o": '"zzz"'},
    ]
    ds = rd.from_items(rows)
    view = resource_view(ds, {"name": "x:name", "age": "x:age",
                              "tag": "x:tag"}, num_partitions=4)
    got = sorted(view.take_all(), key=lambda r: r["s"])
    assert got == [
        {"s": "<x:a>", "name": '"alice"', "age": '"30"', "tag": '"t1"'},
        {"s": "<x:b>", "name": '"bob"', "age": None, "tag": None},
    ]
    multi = resource_view(ds, {"tag": "x:tag"}, num_partitions=4,
                          multi=True)
    got = sorted(multi.take_all(), key=lambda r: r["s"])
    assert list(got[0]["tag"]) == ['"t1"', '"t2"']
    assert list(got[1]["tag"]) == []
