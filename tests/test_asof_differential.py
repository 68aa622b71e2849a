"""Generative as-of-join differential gate: random (key, ts) event
tables joined by the engine's distributed ``asof_join`` (hash exchange
+ per-partition sorted merge) and by DuckDB's native ``ASOF LEFT
JOIN`` on the same data.  Right-side (key, ts) pairs are unique so tie
semantics cannot differ.  Complements the fixed ``clicks_asof_view``
oracle with shapes nobody hand-picked (empty groups, all-before /
all-after timestamps, single-row sides)."""

import random

import pyarrow as pa
import pytest

KEYS = [f"u{i}" for i in range(5)]


def _events(rng, n, val_name):
    rows = set()
    while len(rows) < n:
        rows.add((rng.choice(KEYS), rng.randint(0, 5000)))
    rows = sorted(rows)
    return pa.table({
        "user_id": pa.array([k for k, _ in rows], pa.large_string()),
        "ts": pa.array([t * 1000 for _, t in rows],
                       pa.timestamp("us")),
        val_name: pa.array([rng.randint(0, 99) for _ in rows],
                           pa.int64()),
    })


@pytest.mark.parametrize("seed", range(20))
def test_random_asof_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    from sophia_rs_ray.functions.temporal import asof_join

    rng = random.Random(7700 + seed)
    left = _events(rng, rng.randint(1, 40), "lv")
    right = _events(rng, rng.randint(1, 30), "rv")

    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    on="user_id", ts="ts", num_partitions=4)
    got = sorted(
        (r["user_id"], r["ts"], r["lv"],
         r.get("ts_r"), r.get("rv"))
        for r in out.take_all())

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = sorted(map(tuple, con.execute("""
        SELECT l.user_id, l.ts, l.lv, r.ts AS ts_r, r.rv
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """).fetchall()))

    assert got == want, (
        f"seed={seed}: engine {len(got)} rows vs duckdb {len(want)}\n"
        f"engine-only: {[x for x in got if x not in want][:5]}\n"
        f"duckdb-only: {[x for x in want if x not in got][:5]}")
