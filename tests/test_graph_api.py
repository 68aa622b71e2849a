"""Graph/Dataset API facade: matchers, projections, kind filters and
triple↔quad adapters over NT-text Datasets (reference trait-conformance
style, api/src/graph/test.rs)."""

import pyarrow as pa
import pytest

from sophia_rs_ray import graph as G

T = [
    ("<urn:a>", "<urn:p>", '"x"', ""),
    ("<urn:a>", "<urn:q>", "<urn:b>", ""),
    ("_:b1", "<urn:p>", '"y"@en', "<urn:g1>"),
    ("<urn:b>", "<urn:p>", '"x"', "<urn:g1>"),
    ("<urn:b>", "<urn:q>", "_:b1", "<urn:g2>"),
]


@pytest.fixture()
def quads(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "s": pa.array([t[0] for t in T], pa.large_string()),
        "p": pa.array([t[1] for t in T], pa.large_string()),
        "o": pa.array([t[2] for t in T], pa.large_string()),
        "g": pa.array([t[3] for t in T], pa.large_string()),
    }))


@pytest.fixture()
def triples(quads):
    return quads.map_batches(lambda b: b.drop_columns(["g"]),
                             batch_format="pyarrow")


def test_triples_matching_const_and_list(triples):
    got = G.triples_matching(triples, p="<urn:p>").take_all()
    assert len(got) == 3
    got2 = G.triples_matching(triples, s=["<urn:a>", "<urn:b>"],
                              p="<urn:q>").take_all()
    assert {(r["s"], r["o"]) for r in got2} == \
        {("<urn:a>", "<urn:b>"), ("<urn:b>", "_:b1")}


def test_triples_matching_callable(triples):
    got = G.triples_matching(
        triples, o=lambda x: x.startswith('"')).take_all()
    assert len(got) == 3


def test_contains(triples):
    assert G.contains(triples, "<urn:a>", "<urn:p>", '"x"')
    assert not G.contains(triples, "<urn:a>", "<urn:p>", '"z"')


def test_remove_retain(triples):
    kept = G.remove_matching(triples, p="<urn:q>").take_all()
    assert all(r["p"] == "<urn:p>" for r in kept) and len(kept) == 3
    ret = G.retain_matching(triples, p="<urn:q>").take_all()
    assert len(ret) == 2
    # all-None pattern removes everything (matches Any)
    assert G.remove_matching(triples).count() == 0


def test_projections(triples):
    assert sorted(r["term"] for r in G.subjects(triples).take_all()) == \
        ["<urn:a>", "<urn:b>", "_:b1"]
    assert sorted(r["term"] for r in G.predicates(triples).take_all()) == \
        ["<urn:p>", "<urn:q>"]
    assert G.objects(triples, distinct=False).count() == 5
    assert G.objects(triples).count() == 4


def test_kind_filters(triples):
    assert sorted(r["term"] for r in G.iris(triples).take_all()) == \
        ["<urn:a>", "<urn:b>", "<urn:p>", "<urn:q>"]
    assert sorted(r["term"] for r in G.blank_nodes(triples).take_all()) == \
        ["_:b1"]
    assert sorted(r["term"] for r in G.literals(triples).take_all()) == \
        ['"x"', '"y"@en']


def test_graph_names_and_graph(quads):
    assert sorted(r["term"] for r in G.graph_names(quads).take_all()) == \
        ["<urn:g1>", "<urn:g2>"]
    dflt = G.graph(quads, "").take_all()
    assert {(r["s"], r["p"], r["o"]) for r in dflt} == \
        {("<urn:a>", "<urn:p>", '"x"'), ("<urn:a>", "<urn:q>", "<urn:b>")}
    g1 = G.graph(quads, "<urn:g1>").take_all()
    assert len(g1) == 2 and "g" not in g1[0]


def test_to_quads_union_graph(triples, quads):
    q = G.to_quads(triples, "<urn:gx>").take_all()
    assert all(r["g"] == "<urn:gx>" for r in q) and len(q) == 5
    # union_graph dedups <urn:b> <urn:p> "x" vs the default-graph copy
    u = G.union_graph(quads).take_all()
    spo = {(r["s"], r["p"], r["o"]) for r in u}
    assert len(u) == len(spo) == 5  # ("<urn:a>"… ×2, bnode, b-p-x, b-q)
