"""Generative sessionization differential gate: random per-user event
timelines split at gaps > gap_us by the engine's distributed
``sessionize`` and by a DuckDB window-function mirror (lag → break
flags → running sum → group).  Random gap sizes hit the strictly-
greater boundary exactly."""

import random

import pyarrow as pa
import pytest

KEYS = [f"u{i}" for i in range(6)]


@pytest.mark.parametrize("seed", range(20))
def test_random_sessionize_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    from sophia_rs_ray.functions.temporal import sessionize

    rng = random.Random(8400 + seed)
    gap_us = rng.choice([1_000_000, 5_000_000, 60_000_000])
    rows = set()
    while len(rows) < rng.randint(5, 60):
        # second-granularity timestamps make exact gap boundaries common
        rows.add((rng.choice(KEYS), rng.randint(0, 400) * 1_000_000))
    rows = sorted(rows)
    events = pa.table({
        "user_id": pa.array([k for k, _ in rows], pa.large_string()),
        "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
    })

    out = sessionize(rd.from_arrow(events), gap_us=gap_us,
                     num_partitions=4)
    got = sorted((r["user_id"], r["session"], r["n_events"],
                  r["start_us"], r["end_us"]) for r in out.take_all())

    con = duckdb.connect()
    con.register("e", events)
    want = sorted(map(tuple, con.execute(f"""
        WITH x AS (
          SELECT user_id, epoch_us(ts) AS ts_us,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           > {gap_us}
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts_us,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) - 1 AS session
          FROM x
        )
        SELECT user_id, CAST(session AS BIGINT) AS session,
               count(*) AS n_events, min(ts_us) AS start_us,
               max(ts_us) AS end_us
        FROM s GROUP BY 1, 2
    """).fetchall()))

    assert got == want, (
        f"seed={seed} gap={gap_us}\n"
        f"engine-only: {[x for x in got if x not in want][:5]}\n"
        f"duckdb-only: {[x for x in want if x not in got][:5]}")
