"""Generative rolling-window differential gate: random per-user event
timelines (with equal-ts peers and exact window-boundary gaps) run
through the engine's distributed ``rolling_window`` and a DuckDB
numeric-RANGE window mirror.  Sums are 2-decimal doubles, cent-exact
on both sides (engine sums integer cents; SQL sums DECIMAL(18,2))."""

import random

import pyarrow as pa
import pytest

KEYS = [f"u{i}" for i in range(5)]


@pytest.mark.parametrize("seed", range(20))
def test_random_rolling_matches_duckdb(seed, ray_session):
    import duckdb
    import ray.data as rd

    from sophia_rs_ray.functions.temporal import rolling_window

    rng = random.Random(6600 + seed)
    window_us = rng.choice([10, 25, 60]) * 1_000_000
    n = rng.randint(5, 50)
    recs = []
    for i in range(n):
        # coarse second grid → frequent exact-boundary and equal-ts hits
        recs.append((i, rng.choice(KEYS), rng.randint(0, 120) * 1_000_000,
                     rng.randint(0, 9999) / 100.0))
    events = pa.table({
        "event_id": pa.array([r[0] for r in recs], pa.int64()),
        "user_id": pa.array([r[1] for r in recs], pa.large_string()),
        "ts": pa.array([r[2] for r in recs], pa.timestamp("us")),
        "value": pa.array([r[3] for r in recs], pa.float64()),
    })

    out = rolling_window(rd.from_arrow(events), window_us=window_us,
                         value_col="value", keep_cols=("event_id",),
                         num_partitions=4)
    got = sorted((r["event_id"], r["user_id"], r["n_w"],
                  round(r["sum_w"], 2)) for r in out.take_all())

    con = duckdb.connect()
    con.register("e", events)
    want = sorted(map(tuple, con.execute(f"""
        SELECT event_id, user_id, count(*) OVER w AS n_w,
               round(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w
                          AS DOUBLE), 2) AS sum_w
        FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
              FROM e)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN {window_us} PRECEDING
                           AND CURRENT ROW)
    """).fetchall()))

    assert got == want, (
        f"seed={seed} window={window_us}\n"
        f"engine-only: {[x for x in got if x not in want][:5]}\n"
        f"duckdb-only: {[x for x in want if x not in got][:5]}")
