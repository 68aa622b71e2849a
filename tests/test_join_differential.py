"""Generative differential gate for the distributed exchange join.

Oracle: a single-process pyarrow Acero join over the concatenated
inputs — join SEMANTICS are identical by construction, so any
divergence isolates the DISTRIBUTED machinery this gate targets: the
per-block hash split, the fan-in merge tree, empty / schema-less
blocks, null keys crossing partitions, duplicate-key fan-out, and
multi-block layouts.  Two DuckDB cross-checks pin the semantics
themselves (null keys never match; outer-join null fill) so the
pyarrow oracle can't be wrong in the same way twice.

Round-4 regression context: exchange_join moved from a
``to_arrow_refs()`` barrier to the streaming block feed and its
empty-side fallback was rebuilt from exchanged pieces — exactly the
paths random shapes exercise here.
"""

import random

import pyarrow as pa
import pytest

JOIN_TYPES = ["inner", "left outer", "right outer", "full outer",
              "left semi", "left anti"]


def _rand_table(rng: random.Random, *, n: int, key_space: int,
                null_rate: float, val_prefix: str,
                multi_key: bool) -> pa.Table:
    hot = rng.random() < 0.25  # skewed: ~80% of rows share one key

    def key_col():
        return [None if rng.random() < null_rate
                else (0 if hot and rng.random() < 0.8
                      else rng.randrange(key_space)) for _ in range(n)]

    cols = {"k": pa.array(key_col(), pa.int64())}
    if multi_key:
        cols["k2"] = pa.array(
            [None if rng.random() < null_rate
             else rng.choice(["x", "y", "z"]) for _ in range(n)],
            pa.large_string())
    cols[f"{val_prefix}_v"] = pa.array(
        [rng.randrange(1000) for _ in range(n)], pa.int64())
    return pa.table(cols)


def _chunks(tbl: pa.Table, rng: random.Random, max_chunks: int):
    """Random multi-block layout, possibly with 0-row slices inside."""
    n = tbl.num_rows
    k = rng.randint(1, max_chunks)
    cuts = sorted(rng.randint(0, n) for _ in range(k - 1))
    out, lo = [], 0
    for c in cuts + [n]:
        out.append(tbl.slice(lo, c - lo))
        lo = c
    return out


def _norm(tbl: pa.Table):
    """Order-independent canonical form: sorted tuples over sorted
    column names (None sorts via its repr)."""
    cols = sorted(tbl.column_names)
    rows = [tuple(str(r[c]) for c in cols) for r in tbl.to_pylist()]
    return cols, sorted(rows)


def _run_case(seed: int, join_type: str, ray_session):
    import ray.data as rd

    from sophia_rs_ray.functions.exchange import exchange_join

    rng = random.Random(seed * 977 + hash(join_type) % 1000)
    multi_key = rng.random() < 0.3
    left = _rand_table(rng, n=rng.randint(0, 160),
                       key_space=rng.choice([3, 12, 60]),
                       null_rate=rng.choice([0.0, 0.1, 0.4]),
                       val_prefix="l", multi_key=multi_key)
    right = _rand_table(rng, n=rng.randint(0, 160),
                        key_space=rng.choice([3, 12, 60]),
                        null_rate=rng.choice([0.0, 0.1, 0.4]),
                        val_prefix="r", multi_key=multi_key)
    keys = ["k", "k2"] if multi_key else ["k"]

    import ray

    l_ds = rd.from_arrow(_chunks(left, rng, 6))
    r_ds = rd.from_arrow(_chunks(right, rng, 6))
    out_ds = exchange_join(l_ds, r_ds, join_type,
                           num_partitions=rng.choice([1, 2, 5]), on=keys)
    got = pa.concat_tables(ray.get(out_ds.to_arrow_refs()),
                           promote_options="default")

    want = left.join(right, keys=keys, join_type=join_type,
                     use_threads=False)
    assert _norm(got) == _norm(want), \
        f"seed={seed} type={join_type} distributed != local"


@pytest.mark.parametrize("join_type", JOIN_TYPES)
@pytest.mark.parametrize("seed", range(12))
def test_exchange_join_matches_local_acero(seed, join_type, ray_session):
    _run_case(seed, join_type, ray_session)


def test_semantics_pinned_by_duckdb(ray_session):
    """The pyarrow oracle itself agrees with SQL on the two foot-gun
    semantics: null keys never match, and outer joins null-fill."""
    import duckdb

    left = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                     "l_v": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"k": pa.array([2, None, 4], pa.int64()),
                      "r_v": pa.array([200, 300, 400], pa.int64())})
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)

    inner = left.join(right, keys=["k"], join_type="inner",
                      use_threads=False)
    sql_inner = con.sql(
        "SELECT l.k, l_v, r_v FROM l JOIN r USING (k)").arrow()
    assert _norm(inner) == _norm(sql_inner)

    louter = left.join(right, keys=["k"], join_type="left outer",
                       use_threads=False)
    sql_louter = con.sql(
        "SELECT l.k, l_v, r_v FROM l LEFT JOIN r USING (k)").arrow()
    assert _norm(louter) == _norm(sql_louter)


def test_exchange_join_zero_block_sides(ray_session):
    """Both empty-side flavors: a schema-carrying 0-row block and a
    0-block dataset — the round-4 streaming-feed fallback path."""
    import ray.data as rd

    from sophia_rs_ray.functions.exchange import exchange_join

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "l_v": pa.array([7, 8], pa.int64())})
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "r_v": pa.array([], pa.int64())})

    out = exchange_join(rd.from_arrow(left), rd.from_arrow(empty),
                        "left outer", 2, on=["k"]).to_pandas()
    assert sorted(out["l_v"]) == [7, 8] and out["r_v"].isna().all()

    import ray

    # NB: Dataset.to_pandas() drops the schema of an all-empty-block
    # dataset (known Ray behavior), so assert on the blocks themselves
    parts = ray.get(exchange_join(rd.from_arrow(left),
                                  rd.from_arrow(empty),
                                  "inner", 2, on=["k"]).to_arrow_refs())
    assert sum(p.num_rows for p in parts) == 0
    assert all(set(p.column_names) == {"k", "l_v", "r_v"} for p in parts)
