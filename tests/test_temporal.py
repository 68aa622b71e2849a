"""Temporal operators (functions/temporal.py): sessionization, as-of
join, rolling range windows — edge cases a SQL oracle at sf0.001 may
not cover (boundary gaps, ties, tolerance, empty sides, partition
counts)."""

import numpy as np
import pyarrow as pa
import pytest

from sophia_rs_ray.functions.temporal import (
    asof_join, rolling_window, session_labels, sessionize,
)


def _events(rows, extra=None):
    import ray.data as rd

    t = {
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }
    if extra:
        for name, typ, i in extra:
            t[name] = pa.array([r[i] for r in rows], typ)
    return rd.from_arrow(pa.table(t))


def test_session_labels_boundaries():
    uid = np.array([1, 1, 1, 2, 2], np.int64)
    ts = np.array([0, 100, 201, 0, 50], np.int64)
    # gap == 100 is NOT a new session (strictly greater splits)
    assert session_labels(uid, ts, 100).tolist() == [0, 0, 1, 0, 0]
    assert session_labels(uid, ts, 101).tolist() == [0, 0, 0, 0, 0]
    assert session_labels(np.zeros(0, np.int64),
                          np.zeros(0, np.int64), 1).tolist() == []


def test_sessionize_aggregates(ray_session):
    h = 3_600_000_000
    rows = [(1, 0, 10.0), (1, h // 2, 1.5), (1, 3 * h, 2.25),
            (2, 0, 0.1)]
    ds = _events(rows, extra=[("value", pa.float64(), 2)])
    out = sessionize(ds, gap_us=h, value_col="value",
                     num_partitions=3).to_pandas()
    out = out.sort_values(["user_id", "session"]).reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["start_us"].tolist() == [0, 3 * h, 0]
    assert out["end_us"].tolist() == [h // 2, 3 * h, 0]
    assert out["sum_value"].tolist() == [11.5, 2.25, 0.1]


def test_asof_join_basic_and_tolerance(ray_session):
    left = _events([(1, 100), (1, 250), (2, 50)])
    right = _events([(1, 100), (1, 200), (2, 60)],
                    extra=None)
    j = asof_join(left, right, on="user_id", ts="ts", suffix="_r",
                  num_partitions=2).to_pandas()
    j = j.sort_values(["user_id", "ts"]).reset_index(drop=True)
    import pandas as pd
    got = [None if pd.isna(ts) else int(ts.value // 1000)
           for ts in j["ts_r"]]
    # (1,100)→match at 100 (<=); (1,250)→200; (2,50)→no match (60 > 50)
    assert got == [100, 200, None]

    j2 = asof_join(left, right, on="user_id", ts="ts", suffix="_r",
                   tolerance_us=100, num_partitions=2).to_pandas()
    j2 = j2.sort_values(["user_id", "ts"]).reset_index(drop=True)
    got2 = [None if pd.isna(ts) else int(ts.value // 1000)
            for ts in j2["ts_r"]]
    assert got2 == [100, 200, None]

    j3 = asof_join(left, right, on="user_id", ts="ts", suffix="_r",
                   tolerance_us=40, num_partitions=2).to_pandas()
    j3 = j3.sort_values(["user_id", "ts"]).reset_index(drop=True)
    got3 = [None if pd.isna(ts) else int(ts.value // 1000)
            for ts in j3["ts_r"]]
    # (1,250): nearest earlier is 200, distance 50 > 40 → dropped
    assert got3 == [100, None, None]


def test_asof_join_empty_right(ray_session):
    left = _events([(1, 100)])
    import ray.data as rd

    right = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
    }))
    j = asof_join(left, right, on="user_id", ts="ts",
                  suffix="_r").to_pandas()
    assert len(j) == 1
    assert j["ts_r"].isna().all()


def test_asof_join_key_missing_on_right(ray_session):
    left = _events([(7, 100)])
    right = _events([(8, 50)])
    j = asof_join(left, right, on="user_id", ts="ts",
                  suffix="_r", num_partitions=2).to_pandas()
    assert len(j) == 1 and j["ts_r"].isna().all()


def test_rolling_window_peers_and_bounds(ray_session):
    h = 3_600_000_000
    # user 1: events at 0, h (inclusive window start), h+1, and a tie
    rows = [(1, 0, 1.0), (1, h, 2.0), (1, h, 3.0), (1, 2 * h + 1, 4.0)]
    ds = _events(rows, extra=[("value", pa.float64(), 2)])
    out = rolling_window(ds, window_us=h, value_col="value",
                         num_partitions=2).to_pandas()
    out = out.sort_values(["ts_us", "n_w"]).reset_index(drop=True)
    # at ts=0: {0} → n=1; at ts=h: {0, h, h-tie} → n=3 for BOTH peers
    # (RANGE includes peers); at 2h+1: {h+?} window (h+1 … 2h+1] → the
    # two ts=h rows are OUTSIDE (2h+1 - h = h+1 > h) → n=1
    assert out["n_w"].tolist() == [1, 3, 3, 1]
    sums = out["sum_w"].tolist()
    assert sums == [1.0, 6.0, 6.0, 4.0]


def test_rolling_window_multi_user_isolated(ray_session):
    rows = [(1, 0, 1.0), (2, 1, 1.0), (1, 2, 1.0)]
    ds = _events(rows, extra=[("value", pa.float64(), 2)])
    out = rolling_window(ds, window_us=10, value_col="value",
                         num_partitions=1).to_pandas()
    out = out.sort_values(["user_id", "ts_us"]).reset_index(drop=True)
    assert out["n_w"].tolist() == [1, 2, 1]


@pytest.mark.parametrize("parts", [1, 2, 7])
def test_partition_count_invariance(ray_session, parts):
    rng = np.random.default_rng(7)
    n = 500
    rows = [(int(rng.integers(0, 9)), int(rng.integers(0, 10_000)), 1.0)
            for _ in range(n)]
    ds = _events(rows, extra=[("value", pa.float64(), 2)])
    out = sessionize(ds, gap_us=500, value_col="value",
                     num_partitions=parts).to_pandas()
    out = out.sort_values(["user_id", "session"]).reset_index(drop=True)
    key = (out["user_id"].astype(str) + ":" + out["session"].astype(str)
           + ":" + out["n_events"].astype(str) + ":"
           + out["start_us"].astype(str)).tolist()
    # reference single-partition result
    want = sessionize(ds, gap_us=500, value_col="value",
                      num_partitions=1).to_pandas()
    want = want.sort_values(["user_id", "session"]).reset_index(drop=True)
    wkey = (want["user_id"].astype(str) + ":" + want["session"].astype(str)
            + ":" + want["n_events"].astype(str) + ":"
            + want["start_us"].astype(str)).tolist()
    assert key == wkey
