"""SPO/POS/OSP materialization, lineage manifests, checkpoint-resume,
and pruned pattern scans (the FastGraph mirror, SURVEY §1.4/§2.3)."""

import os
import shutil

import pyarrow as pa
import pytest

from sophia_rs_ray.stages.materialize import (
    ORDERS, dataset_digest, load_manifest, materialize_graph, shard_of,
    triples_matching,
)

N_SHARDS = 4


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
    report = materialize_graph(ds, out, num_shards=N_SHARDS)
    return out, report


def test_layouts_sorted_and_complete(graph_dir):
    import pyarrow.parquet as pq

    out, report = graph_dir
    tbl = _nt_table()
    for order, cols in ORDERS.items():
        assert report[order]["rows"] == tbl.num_rows
        seen = 0
        for shard, row in load_manifest(out, order).items():
            data = pq.read_table(os.path.join(out, order, f"shard={shard}",
                                              "data.parquet"))
            seen += data.num_rows
            assert data.num_rows == row["rows"]
            # every row hashed to this shard by its leading term
            lead = data[cols[0]].to_pylist()
            assert all(shard_of(t, N_SHARDS) == shard for t in lead)
            # sorted by the layout's column order
            keys = list(zip(*[data[c].to_pylist() for c in cols]))
            assert keys == sorted(keys)
            assert row["min_key"] == min(lead) and row["max_key"] == max(lead)
        assert seen == tbl.num_rows


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


def test_resume_skips_done_and_repairs_missing(graph_dir, ray_session):
    import ray.data as rd

    out, _ = graph_dir
    # wipe one shard of pos (simulate a mid-run crash)
    victims = [d for d in os.listdir(os.path.join(out, "pos"))
               if d.startswith("shard=")]
    victim = sorted(victims)[0]
    shutil.rmtree(os.path.join(out, "pos", victim))

    ds = rd.from_arrow(_nt_table())
    report = materialize_graph(ds, out, num_shards=N_SHARDS)
    vshard = int(victim.split("=")[1])
    assert report["pos"]["written"] == [vshard]
    assert vshard not in report["pos"]["skipped"]
    assert len(report["spo"]["written"]) == 0  # fully skipped
    assert report["pos"]["rows"] == _nt_table().num_rows
    # repaired layout answers scans again
    got = triples_matching(out, p="<http://ex.org/p/2>",
                           num_shards=N_SHARDS).count()
    tbl = _nt_table()
    assert got == sum(1 for x in tbl["p"].to_pylist()
                      if x == "<http://ex.org/p/2>")
