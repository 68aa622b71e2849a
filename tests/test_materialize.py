"""SPO/POS/OSP materialization, lineage manifests, checkpoint-resume,
salted skew split, and pruned pattern scans (the FastGraph mirror,
SURVEY §1.4/§2.3/§7.4)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sophia_rs_ray.stages.materialize import (
    ORDERS, dataset_digest, load_manifest, materialize_graph, shard_of,
    triples_matching,
)

N_SHARDS = 4
SALTS = {"spo": 1, "pos": 3, "osp": 1}


def _nt_table():
    rows = []
    for i in range(200):
        s = f"<http://ex.org/s/{i % 37}>"
        p = f"<http://ex.org/p/{i % 5}>"
        o = f'"v{i}"' if i % 3 else f"<http://ex.org/o/{i % 11}>"
        rows.append((s, p, o))
    rows.append(rows[0])  # duplicate row survives (bag semantics here)
    return pa.table({
        "s": pa.array([r[0] for r in rows], pa.large_string()),
        "p": pa.array([r[1] for r in rows], pa.large_string()),
        "o": pa.array([r[2] for r in rows], pa.large_string()),
    })


@pytest.fixture(scope="module")
def graph_dir(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("graph"))
    ds = rd.from_arrow(_nt_table()).repartition(3)
    report = materialize_graph(ds, out, num_shards=N_SHARDS, salts=SALTS)
    return out, report


def test_layouts_sorted_and_complete(graph_dir):
    out, report = graph_dir
    tbl = _nt_table()
    for order, cols in ORDERS.items():
        assert report[order]["rows"] == tbl.num_rows
        seen = 0
        for (shard, salt), row in load_manifest(out, order).items():
            data = pq.read_table(os.path.join(
                out, order, f"shard={shard}", f"part-{salt}.parquet"))
            seen += data.num_rows
            assert data.num_rows == row["rows"]
            # every row hashed to this shard by its leading term
            lead = data[cols[0]].to_pylist()
            assert all(shard_of(t, N_SHARDS) == shard for t in lead)
            # each partition file is sorted by the layout's column order
            keys = list(zip(*[data[c].to_pylist() for c in cols]))
            assert keys == sorted(keys)
            assert row["min_key"] == min(lead) and row["max_key"] == max(lead)
        assert seen == tbl.num_rows
    # pos salted into >N_SHARDS partitions (skew split)
    assert len(load_manifest(out, "pos")) > len(load_manifest(out, "spo"))


def test_digest_is_layout_invariant(graph_dir):
    out, _ = graph_dir
    d = {o: dataset_digest(out, o) for o in ORDERS}
    assert d["spo"] == d["pos"] == d["osp"] != 0


def test_pattern_scans_match_brute_force(graph_dir):
    out, _ = graph_dir
    tbl = _nt_table()
    rows = set(zip(tbl["s"].to_pylist(), tbl["p"].to_pylist(),
                   tbl["o"].to_pylist()))

    cases = [
        {"s": "<http://ex.org/s/3>"},
        {"p": "<http://ex.org/p/2>"},
        {"o": "<http://ex.org/o/4>"},
        {"s": "<http://ex.org/s/3>", "p": "<http://ex.org/p/1>"},
        {"p": "<http://ex.org/p/0>", "o": '"v45"'},
        {"s": "<http://ex.org/s/999>"},  # absent
        {},
    ]
    for pat in cases:
        got = {(r["s"], r["p"], r["o"])
               for r in triples_matching(out, num_shards=N_SHARDS, **pat).take_all()}
        want = {r for r in rows
                if all(r["spo".index(k)] == v for k, v in pat.items())}
        assert got == want, pat


def test_distinct_and_groupby_exchange_agree(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.from_arrow(_nt_table()).repartition(3)
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    rep_a = materialize_graph(ds, out_a, num_shards=N_SHARDS, salts=SALTS,
                              distinct=True, exchange="tasks")
    rep_b = materialize_graph(ds, out_b, num_shards=N_SHARDS, salts=SALTS,
                              distinct=True, exchange="groupby")
    n_distinct = _nt_table().num_rows - 1  # one duplicated row
    for rep in (rep_a, rep_b):
        assert all(rep[o]["rows"] == n_distinct for o in ORDERS)
    for o in ORDERS:
        assert dataset_digest(out_a, o) == dataset_digest(out_b, o)


def test_fanin_tree_matches_direct_exchange(graph_dir, ray_session, tmp_path):
    """fanin=2 over 8 blocks forces a 3-deep combine tree (the 100-TB
    bounded-fan-in path); output must be bit-identical to the direct
    exchange (graph_dir, fanin=256 > blocks)."""
    import ray.data as rd

    out_direct, report_direct = graph_dir
    ds = rd.from_arrow(_nt_table()).repartition(8)
    out = str(tmp_path / "tree")
    report = materialize_graph(ds, out, num_shards=N_SHARDS, salts=SALTS,
                               fanin=2)
    for o in ORDERS:
        assert report[o]["rows"] == report_direct[o]["rows"]
        assert dataset_digest(out, o) == dataset_digest(out_direct, o)


def test_resume_skips_done_and_repairs_missing(graph_dir, ray_session):
    import ray.data as rd

    out, _ = graph_dir
    # wipe one shard of pos (simulate a mid-run crash)
    victims = [d for d in os.listdir(os.path.join(out, "pos"))
               if d.startswith("shard=")]
    victim = sorted(victims)[0]
    vshard = int(victim.split("=")[1])
    shutil.rmtree(os.path.join(out, "pos", victim))

    ds = rd.from_arrow(_nt_table())
    report = materialize_graph(ds, out, num_shards=N_SHARDS, salts=SALTS)
    assert report["spo"]["written"] == []  # fully skipped
    assert all(shard == vshard for shard, _salt in report["pos"]["written"])
    assert vshard not in {s for s, _ in report["pos"]["skipped"]}
    assert report["pos"]["rows"] == _nt_table().num_rows
    # repaired layout answers scans again
    got = triples_matching(out, p="<http://ex.org/p/2>",
                           num_shards=N_SHARDS).count()
    tbl = _nt_table()
    assert got == sum(1 for x in tbl["p"].to_pylist()
                      if x == "<http://ex.org/p/2>")


def test_sparql_over_materialized_graph(ray_session, tmp_path):
    """select() over MaterializedGraph: constant-predicate BGPs prune
    to the POS/SPO layouts and results equal the direct-Dataset run."""
    import pyarrow as pa
    import ray.data as rd

    from sophia_rs_ray.stages.materialize import (
        MaterializedGraph, materialize_graph,
    )
    from sophia_rs_ray.sparql import select

    rows = [
        ("<urn:a>", "<urn:knows>", "<urn:b>"),
        ("<urn:b>", "<urn:knows>", "<urn:c>"),
        ("<urn:a>", "<urn:name>", '"A"'),
        ("<urn:b>", "<urn:name>", '"B"'),
    ]
    nt = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.large_string()),
        "p": pa.array([r[1] for r in rows], pa.large_string()),
        "o": pa.array([r[2] for r in rows], pa.large_string())}))
    out = str(tmp_path / "g")
    materialize_graph(nt, out, num_shards=4)
    mg = MaterializedGraph(out, num_shards=4)

    q = "SELECT ?x ?n WHERE { ?x <urn:knows> ?y . ?x <urn:name> ?n }"
    got = sorted((r["x"], r["n"]) for r in select(q, mg).take_all())
    want = sorted((r["x"], r["n"]) for r in select(q, nt).take_all())
    assert got == want == [("<urn:a>", '"A"'), ("<urn:b>", '"B"')]

    # transitive path over the pruned POS read
    q2 = "SELECT ?o WHERE { <urn:a> <urn:knows>+ ?o }"
    got2 = sorted(r["o"] for r in select(q2, mg).take_all())
    assert got2 == ["<urn:b>", "<urn:c>"]


def test_interned_exchange_equals_plain(ray_session, tmp_path,
                                        monkeypatch):
    """Force the interned (dictionary) exchange payload path — the
    single-node default skips it (intern_threshold) — and assert the
    materialized layouts are byte-equivalent to the plain-string path
    (same digests, same row counts)."""
    import ray.data as rd

    ds = rd.from_arrow(_nt_table()).repartition(3)
    plain_dir = str(tmp_path / "plain")
    materialize_graph(ds, plain_dir, num_shards=N_SHARDS, salts=SALTS,
                      distinct=True)
    monkeypatch.setenv("SOPHIA_INTERN_MIN_ROWS", "0")
    interned_dir = str(tmp_path / "interned")
    materialize_graph(ds, interned_dir, num_shards=N_SHARDS, salts=SALTS,
                      distinct=True)
    for order in ORDERS:
        assert dataset_digest(plain_dir, order) == \
            dataset_digest(interned_dir, order)


def test_interned_dedup_equals_plain(ray_session, monkeypatch):
    """dedup_triples with forced interned payloads returns the same
    distinct triples as the plain path."""
    import ray.data as rd

    from sophia_rs_ray.stages.dedup import dedup_triples

    ds = rd.from_arrow(_nt_table()).repartition(3)
    plain = sorted(
        (r["s"], r["p"], r["o"])
        for r in dedup_triples(ds, carry_min=()).take_all())
    monkeypatch.setenv("SOPHIA_INTERN_MIN_ROWS", "0")
    interned = sorted(
        (r["s"], r["p"], r["o"])
        for r in dedup_triples(ds, carry_min=()).take_all())
    assert plain == interned and len(plain) == 200  # dup collapsed


@pytest.mark.parametrize("seed", range(8))
def test_resume_after_random_damage(seed, ray_session, tmp_path):
    """Resume fuzz (north-rule resumability): delete a RANDOM subset of
    shard directories and/or manifest files across all three layouts —
    the re-run must repair exactly the damage and the repaired layouts
    must answer scans identically to a fresh build."""
    import random

    import ray.data as rd

    rng = random.Random(17000 + seed)
    out = str(tmp_path / "g")
    ds = rd.from_arrow(_nt_table())
    materialize_graph(ds, out, num_shards=N_SHARDS, salts=SALTS)

    damaged = 0
    for order in ("spo", "pos", "osp"):
        for d in sorted(os.listdir(os.path.join(out, order))):
            if not d.startswith("shard="):
                continue
            r = rng.random()
            if r < 0.25:
                shutil.rmtree(os.path.join(out, order, d))
                damaged += 1
            elif r < 0.40:
                # manifest-only loss: data present but uncommitted —
                # the shard must be rebuilt (manifest IS the commit)
                for f in os.listdir(os.path.join(out, order, d)):
                    if f.startswith("_MANIFEST"):
                        os.remove(os.path.join(out, order, d, f))
                        damaged += 1
    report = materialize_graph(rd.from_arrow(_nt_table()), out,
                               num_shards=N_SHARDS, salts=SALTS)
    assert sum(len(report[o]["written"]) for o in
               ("spo", "pos", "osp")) >= min(damaged, 1)

    tbl = _nt_table()
    for pred in {x for x in tbl["p"].to_pylist()}:
        got = triples_matching(out, p=pred, num_shards=N_SHARDS).count()
        want = sum(1 for x in tbl["p"].to_pylist() if x == pred)
        assert got == want, f"seed={seed} {pred}: {got} != {want}"
