"""Driver-style correctness gate, run locally at sf0.001: every
SQL-backed entry of the registry must match its DuckDB oracle on
row count, column names, and order-insensitive values."""

import math

import pytest


def _to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _registry():
    from sophia_rs_ray.pipelines.queries import registry

    return registry()


SQL_KEYS = [k for k, (_f, s) in _registry().items() if s is not None]
ROWS_ONLY_KEYS = [k for k, (_f, s) in _registry().items() if s is None]


@pytest.mark.parametrize("name", SQL_KEYS)
def test_query_matches_oracle(name, sf_dir, duck, ray_session):
    fn, sql = _registry()[name]
    got = _norm(_to_pandas(fn(sf_dir)))
    want = _norm(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        if a and isinstance(a[0], float):
            assert all(math.isclose(x, y, rel_tol=0, abs_tol=0) or x == y
                       for x, y in zip(a, b)), f"{name}.{c} differs"
        else:
            assert a == b, f"{name}.{c} differs"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(name, sf_dir, ray_session):
    fn, _ = _registry()[name]
    got = _to_pandas(fn(sf_dir))
    assert len(got) > 0
    # determinism: stable schema
    assert len(got.columns) > 0


def test_checked_in_preflight_is_green():
    """Smoke gate on the round artifact (VERDICT r03 item 10): the
    checked-in PREFLIGHT.json must report 0 failures and cover the
    CURRENT registry — a red or stale preflight cannot ship silently.
    Regenerate with `python preflight.py` after registry changes."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "PREFLIGHT.json")
    with open(path) as f:
        report = json.load(f)
    assert report["summary"]["failed"] == 0
    missing = set(_registry()) - set(report["results"])
    assert not missing, (
        f"registry keys missing from PREFLIGHT.json (regenerate it): "
        f"{sorted(missing)}")
