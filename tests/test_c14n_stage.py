"""Distributed c14n stage vs the pure algorithm (and reference goldens)."""

import pyarrow as pa
import pytest

from sophia_rs_ray.c14n import normalize_quads
from sophia_rs_ray.ntriples import parse_document


MIXED_NQ = [
    # bnode-free quads (stream-through path)
    "<tag:s1> <tag:p> <tag:o1> .",
    '<tag:s1> <tag:p> "lit\\n2" .',
    "<tag:s2> <tag:p> <tag:o2> <tag:g1> .",
    # tree-shaped bnodes (unique first-degree hashes)
    "<http://example.com/#p> <http://example.com/#q> _:e0 .",
    "<http://example.com/#p> <http://example.com/#r> _:e1 .",
    "_:e0 <http://example.com/#s> <http://example.com/#u> .",
    "_:e1 <http://example.com/#t> <http://example.com/#u> .",
    # a symmetric cycle (shared hashes → step-5 residue)
    "_:c0 <http://example.com/#p> _:c1 .",
    "_:c1 <http://example.com/#p> _:c2 .",
    "_:c2 <http://example.com/#p> _:c0 .",
]


def _lines_to_ds(lines, with_g=True):
    import ray.data as rd

    rows = {"s": [], "p": [], "o": [], "g": []}
    for (s, p, o, g) in parse_document("\n".join(lines), quads=True):
        from sophia_rs_ray.terms import format_term

        rows["s"].append(format_term(s))
        rows["p"].append(format_term(p))
        rows["o"].append(format_term(o))
        rows["g"].append(format_term(g) if g is not None else "")
    if not with_g:
        rows.pop("g")
    return rd.from_arrow(pa.table(rows))


def test_c14n_dataset_matches_pure(ray_session):
    from sophia_rs_ray.stages.c14n_stage import c14n_dataset

    ds = _lines_to_ds(MIXED_NQ)
    got = "".join(r["nq"] for r in c14n_dataset(ds).take_all())
    want = normalize_quads(parse_document("\n".join(MIXED_NQ), quads=True))
    assert got == want


def test_c14n_dataset_no_bnodes(ray_session):
    from sophia_rs_ray.stages.c14n_stage import c14n_dataset

    lines = MIXED_NQ[:3]
    ds = _lines_to_ds(lines)
    got = "".join(r["nq"] for r in c14n_dataset(ds).take_all())
    assert got == normalize_quads(parse_document("\n".join(lines), quads=True))


def test_c14n_per_graph(ray_session):
    import ray.data as rd

    from sophia_rs_ray.stages.c14n_stage import c14n_per_graph

    g1 = ["_:a <tag:p> _:b .", "_:b <tag:p> <tag:o> ."]
    g2 = ["_:x <tag:p> _:y .", "_:y <tag:p> <tag:o> ."]  # isomorphic to g1
    g3 = ["<tag:s> <tag:p> <tag:o3> ."]
    rows = {"url": [], "s": [], "p": [], "o": []}
    for url, lines in (("u1", g1), ("u2", g2), ("u3", g3)):
        for (s, p, o, _g) in parse_document("\n".join(lines)):
            from sophia_rs_ray.terms import format_term

            rows["url"].append(url)
            rows["s"].append(format_term(s))
            rows["p"].append(format_term(p))
            rows["o"].append(format_term(o))
    ds = rd.from_arrow(pa.table(rows))
    out = c14n_per_graph(ds, digest_only=True).take_all()
    by_url = {r["url"]: r["digest"] for r in out}
    assert by_url["u1"] == by_url["u2"] != by_url["u3"]
    assert all(not r["error"] for r in out)


def test_c14n_per_graph_toxic_is_error_row(ray_session):
    import ray.data as rd

    from sophia_rs_ray.stages.c14n_stage import c14n_per_graph

    # 5-clique with a permutation limit of 3 → ToxicGraph error row
    rows = {"url": [], "s": [], "p": [], "o": []}
    for i in range(5):
        for j in range(5):
            if i != j:
                rows["url"].append("toxic")
                rows["s"].append(f"_:e{i}")
                rows["p"].append("<http://example.com/#p>")
                rows["o"].append(f"_:e{j}")
    rows["url"].append("fine")
    rows["s"].append("<tag:s>")
    rows["p"].append("<tag:p>")
    rows["o"].append("<tag:o>")
    ds = rd.from_arrow(pa.table(rows))
    out = c14n_per_graph(ds, permutation_limit=3).take_all()
    errs = {r["url"]: r["error"] for r in out}
    assert "ToxicGraphError" in errs["toxic"]
    assert errs["fine"] == ""
