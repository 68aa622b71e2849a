"""Generic two-stage raw-task hash-exchange aggregation.

Measured motivation (BASELINE.md, stages/materialize.py): Ray Data's
sort-based ``groupby().aggregate()`` exchange costs seconds of fixed
overhead per stage at bench scale (sort + O(blocks×partitions) tiny
objects) and serializes against upstream stages; the hash-shuffle
strategy is slower still for small partitions (actor pool spin-up).
This utility is the generalization of the materialize exchange
(SURVEY §2 "custom operators" option (c)) for aggregate-shaped wide
ops:

    block → combine(block)                (per-block partial aggregate)
          → hash-split by key (argsort)   (one object per partition)
    partition → concat → finalize(...)    (final aggregate per group)

Partitioning assumption (documented per SURVEY §2.custom-operators):
a row's partition is a pure function of its key columns' content
(crc32) — deterministic across runs and processes, no coordination.
Skewed keys are fine for algebraic aggregates because combine() has
already collapsed each block to ≤1 row per distinct key, so a hub key
contributes at most ``blocks`` rows to its partition.
"""

from __future__ import annotations

import os
import zlib
from typing import Callable, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

_MASK64 = (1 << 64) - 1
_FIB = 0x9E3779B97F4A7C15


def auto_partitions(ds, *, bytes_per_partition: int = 32 << 20,
                    lo: int = 2, hi: int = 1024,
                    default: int = 8) -> int:
    """Derive an exchange partition count from the upstream INPUT size
    (VERDICT r3 #5) instead of a hard-coded literal: one partition per
    ~32 MB of source bytes, clamped to [lo, hi].

    Lazy Datasets expose no block count before execution, so the
    estimate comes from ``input_files()`` on-disk sizes — conservative
    for aggregate exchanges because the per-block combiner shrinks
    partials well below input size.  Falls back to ``default`` when the
    input is not file-backed (from_arrow/from_items pipelines)."""
    total = 0
    try:
        for f in ds.input_files():
            if os.path.exists(f):
                total += os.path.getsize(f)
    except Exception:
        total = 0
    if total <= 0:
        return default
    est = -(-total // bytes_per_partition)  # ceil
    return int(max(lo, min(hi, est)))


def intern_threshold() -> int:
    """Minimum partition-piece rows before exchange payloads are
    dictionary-encoded (SURVEY §1.5 interned terms).

    Interning trades encode/decode CPU for exchange BYTES.  On a
    single node the object store is shared memory — there are no
    network bytes to save, so interning is pure overhead (measured:
    the 500k-page flagship's 16/32-CPU arms regressed ~25% with
    unconditional interning).  Default: engage at 128-row cells only
    when the Ray cluster has >1 alive node; ``SOPHIA_INTERN_MIN_ROWS``
    overrides either way (0 = always, huge = never)."""
    env = os.environ.get("SOPHIA_INTERN_MIN_ROWS")
    if env is not None:
        return int(env)
    try:
        import ray

        if ray.is_initialized() and \
                sum(1 for n in ray.nodes() if n.get("Alive")) > 1:
            return 128
    except Exception:
        pass
    return 1 << 62


def _key_hash(tbl: pa.Table, key_cols: Sequence[str]):
    """Vectorized content hash of the key columns → uint64 numpy array.

    Fast path: polars ``hash_rows(seed=0)`` (xxhash-family, measured
    deterministic across processes for a fixed polars version — fine
    for partitioning, which only needs run-internal determinism plus
    resume-safety on an unchanged environment).  Fallback: the original
    per-row crc32 loop."""
    import numpy as np

    sel = tbl.select(list(key_cols))
    if any(pa.types.is_dictionary(sel[c].type) for c in sel.column_names):
        # dictionary-encoded (interned) key columns: hash the VALUES,
        # not the block-local indices (polars would hash the categorical
        # physical codes, which differ per block)
        sel = pa.table({c: pc.cast(sel[c], pa.large_string())
                        if pa.types.is_dictionary(sel[c].type) else sel[c]
                        for c in sel.column_names})
    try:
        import polars as pl

        df = pl.from_arrow(sel)
        return df.hash_rows(seed=0).to_numpy().astype(np.uint64)
    except Exception:
        crc = zlib.crc32
        acc = np.zeros(tbl.num_rows, dtype=np.uint64)
        for c in key_cols:
            col = [(crc(x.encode()) if isinstance(x, str)
                    else crc(str(x).encode()))
                   for x in tbl[c].to_pylist()]
            acc = (acc * np.uint64(31) +
                   np.asarray(col, dtype=np.uint64)) & np.uint64(_MASK64)
        return acc


def _split_by_key(tbl: pa.Table, key_cols: Sequence[str],
                  num_partitions: int):
    """One stable argsort + zero-copy slices (not a filter per
    partition, which is O(partitions × rows))."""
    import numpy as np

    n = tbl.num_rows
    if n == 0:
        # empty WITH schema — keeps every partition schema-carrying so
        # the reduce side never concats from nothing
        return tuple([tbl] * num_partitions)
    if not key_cols:
        acc = np.zeros(n, dtype=np.uint64)  # single implicit group
    else:
        acc = _key_hash(tbl, key_cols)
    part = (((acc * np.uint64(_FIB)) & np.uint64(_MASK64))
            >> np.uint64(40)) % np.uint64(num_partitions)
    part = part.astype(np.int64)
    order = np.argsort(part, kind="stable")
    sorted_tbl = tbl.take(pa.array(order))
    bounds = np.searchsorted(part[order], np.arange(num_partitions + 1))
    out = []
    for j in range(num_partitions):
        lo, hi = int(bounds[j]), int(bounds[j + 1])
        out.append(sorted_tbl.slice(lo, hi - lo))
    return tuple(out)


def _map_side(block, key_cols, num_partitions, combine):
    if block.num_rows == 0 and \
            not all(k in block.column_names for k in key_cols):
        # schema-less empty (e.g. an empty exchange-join partition that
        # map_batches passed through without calling the fn): it
        # contributes nothing and its schema is unusable — skip it
        return (None,) * max(num_partitions, 1)
    t = combine(block) if combine is not None else block
    return _split_by_key(t, key_cols, num_partitions)


def _undict(t: pa.Table) -> pa.Table:
    """Decode every dictionary-encoded (interned) column to its plain
    value type (string-likes widen to large_string, matching the plain
    payload convention)."""
    if not any(pa.types.is_dictionary(f.type) for f in t.schema):
        return t
    cols = {}
    for name in t.column_names:
        col = t[name]
        if pa.types.is_dictionary(col.type):
            vt = col.type.value_type
            if pa.types.is_string(vt) or pa.types.is_large_string(vt):
                vt = pa.large_string()
            col = pc.cast(col, vt)
        cols[name] = col
    return pa.table(cols)


def _concat_mixed(parts):
    """Concat partials that may mix interned (dictionary) and plain
    (large_string) schemas.  ``intern_threshold`` is a per-piece row
    cutoff, so one partition legitimately receives both layouts (small
    cells skip interning); pa.concat_tables raises on the mix, so
    decode first when schemas differ."""
    # schema objects with dict metadata are unhashable — compare by
    # equality, not via a set
    first = parts[0].schema
    if any(p.schema != first for p in parts[1:]):
        parts = [_undict(p) for p in parts]
    return pa.concat_tables(parts, promote_options="default")


def _merge_pieces(*parts):
    """Fan-in node of the exchange merge tree: concat ≤ fanin piece
    objects into one so reduce-task argument counts and the driver's
    live-ref set stay bounded at ``fanin`` per level, independent of
    input block count (same rationale as materialize._combine_pieces).
    NOTE: this node only concats — it never re-applies ``combine``,
    which is a per-*input-block* partial (e.g. dedup's ``n_dups = 1``
    seed) and is not idempotent over its own output."""
    parts = [p for p in parts if p is not None]
    if not parts:
        return None
    nonempty = [p for p in parts if p.num_rows > 0]
    if not nonempty:
        # keep the narrowest empty schema (see _reduce_side rationale)
        return min(parts, key=lambda p: p.num_columns)
    return _concat_mixed(nonempty)


class _MergeTree:
    """Per-partition fan-in tree over piece ObjectRefs.

    ``levels[j][d]`` holds up-to-``fanin`` refs at depth ``d`` for
    partition ``j``; a full level collapses into one ``merge_fn`` call
    and its refs are dropped, so the driver's live-ref set is
    O(partitions · fanin · depth) and every downstream task's argument
    list is bounded at ``fanin · depth`` refs, independent of input
    block count.  Depth grows log_fanin(blocks) ≈ 2-3 even at 100 TB."""

    def __init__(self, num_partitions: int, fanin: int, merge_fn):
        self.fanin = fanin
        self.merge_fn = merge_fn
        self.levels: List[List[List]] = [[[]] for _ in range(num_partitions)]

    def push(self, j: int, ref, depth: int = 0) -> None:
        lv = self.levels[j]
        while len(lv) <= depth:
            lv.append([])
        lv[depth].append(ref)
        if len(lv[depth]) >= self.fanin:
            merged = self.merge_fn(*lv[depth])
            lv[depth] = []
            self.push(j, merged, depth + 1)

    def remaining(self, j: int) -> list:
        return [r for lv in self.levels[j] for r in lv]


def _iter_block_refs(ds):
    """Yield the Dataset's block ObjectRefs as they materialize
    (streaming — the driver never pins the full block list; each ref
    is dropped once its split task holds it).  Falls back to the
    barrier ``to_arrow_refs()`` on Ray versions without the streaming
    ref API."""
    try:
        bundles = ds.iter_internal_ref_bundles()
    except AttributeError:  # older Ray
        yield from ds.to_arrow_refs()
        return
    for bundle in bundles:
        yield from bundle.block_refs


def _reduce_side(finalize, fallback, *parts):
    parts = [p for p in parts if p is not None]
    if not parts:
        # every block was a schema-less empty (Ray passes 0-row blocks
        # through map_batches without calling the fn, so upstream
        # Extend-style stages never added their columns).  A combined
        # empty built driver-side from the input schema keeps the
        # output well-formed instead of failing the partition.
        if fallback is None:
            raise ValueError(
                "hash_aggregate: every input block was a schema-less "
                "empty and no fallback schema was derivable")
        return finalize(fallback) if finalize is not None else fallback
    # Ray can skip projections (select_columns) on zero-row blocks, so
    # empty parts may carry a stale wider schema; concat-promoting them
    # would resurrect phantom columns.  Rows define the schema: drop
    # empty parts when any non-empty part exists, else keep the
    # narrowest empty schema (the projected one).
    nonempty = [p for p in parts if p.num_rows > 0]
    if nonempty:
        t = _concat_mixed(nonempty)
    else:
        t = min(parts, key=lambda p: p.num_columns)
    return finalize(t) if finalize is not None else t


def hash_aggregate(ds, key_cols: Sequence[str],
                   combine: Optional[Callable[[pa.Table], pa.Table]],
                   finalize: Optional[Callable[[pa.Table], pa.Table]],
                   *, num_partitions: Optional[int] = None,
                   fanin: int = 256):
    """Exact per-key aggregation via the raw-task hash exchange.

    ``num_partitions=None`` (default) sizes the exchange from the
    input via :func:`auto_partitions`; pass an explicit int to pin it.

    ``combine`` runs once per input block (partial aggregate — MUST
    keep the key columns); ``finalize`` runs once per hash partition
    over the concatenated partials (final aggregate).  Either may be
    None (identity).  Returns a Dataset of the finalize outputs.

    Per-partition merge tree (same shape as materialize.py's): piece
    refs collapse ``fanin`` at a time through ``_merge_pieces`` nodes,
    so the final reduce task's argument count and the driver's live-ref
    set are O(fanin · depth) per partition, independent of input block
    count — at 10⁵ blocks the direct exchange would hand every reduce
    task 10⁵ tiny object args and pin blocks × partitions refs on the
    driver.  Below ``fanin`` blocks (every sandbox run) the tree is a
    single level and the plan is identical to the direct exchange.
    """
    import ray
    import ray.data as rd

    if num_partitions is None:
        num_partitions = auto_partitions(ds)
    split = ray.remote(num_returns=num_partitions)(_map_side) \
        if num_partitions > 1 else ray.remote(_map_side)
    reduce = ray.remote(_reduce_side)
    merge = ray.remote(_merge_pieces)
    unwrap = ray.remote(lambda t: t[0]) if num_partitions == 1 else None
    tree = _MergeTree(num_partitions, fanin,
                      lambda *refs: merge.remote(*refs))

    n_blocks = 0

    def feed(block_ref) -> None:
        nonlocal n_blocks
        n_blocks += 1
        refs = split.remote(block_ref, tuple(key_cols), num_partitions,
                            combine)
        if num_partitions == 1:
            # num_returns=1 tasks return the 1-tuple itself; unwrap
            # remotely
            tree.push(0, unwrap.remote(refs))
        else:
            for j, r in enumerate(refs):
                tree.push(j, r)

    # launch each block's map-side split the moment the block
    # materializes: the exchange overlaps the producing stage instead
    # of waiting behind a full-dataset to_arrow_refs() barrier
    for r in _iter_block_refs(ds):
        feed(r)

    if not n_blocks:
        # zero-block input: derive the output schema from the fns on an
        # empty batch so downstream operators keep working
        schema = ds.schema()
        empty = pa.table({n: pa.array([], t)
                          for n, t in zip(schema.names, schema.types)})
        t = combine(empty) if combine is not None else empty
        t = finalize(t) if finalize is not None else t
        return rd.from_arrow(t)
    # all-empty-partition fallback: a driver-side combined empty (most
    # combine fns synthesize their output columns on a 0-row input)
    fallback = None
    try:
        fallback = combine(pa.table({})) if combine is not None else None
    except Exception:
        fallback = None
    if fallback is None:
        try:
            sch = ds.schema(fetch_if_missing=False)
        except Exception:
            sch = None
        if sch is not None:
            try:
                empty = pa.table({n: pa.array([], t)
                                  for n, t in zip(sch.names, sch.types)})
                fallback = combine(empty) if combine is not None else empty
            except Exception:
                fallback = None
    out_refs = [reduce.remote(finalize, fallback, *tree.remaining(j))
                for j in range(num_partitions)]
    return rd.from_arrow_refs(out_refs)


def grouped_sum(ds, keys: Sequence[str], cols: Sequence[str], *,
                num_partitions: Optional[int] = None):
    """Per-key SUM of ``cols`` via the hash exchange — the drop-in
    replacement for ``groupby(keys).aggregate(Sum(...))`` tails over
    per-batch partials (Ray's sort-based groupby costs ~1 s fixed
    overhead per call at bench scale; see BASELINE.md).  Output columns
    keep their input names: keys + cols."""
    keys, cols = list(keys), list(cols)

    def gsum(t: pa.Table) -> pa.Table:
        out = t.group_by(keys).aggregate([(c, "sum") for c in cols])
        return out.rename_columns(keys + cols)

    return hash_aggregate(ds, keys, gsum, gsum,
                          num_partitions=num_partitions)


def _join_reduce(join_type, on, right_on, l_suffix, r_suffix, n_left,
                 *parts):
    left = [p for p in parts[:n_left] if p is not None]
    right = [p for p in parts[n_left:] if p is not None]
    lt = _concat_mixed(left)
    rt = _concat_mixed(right)
    return lt.join(rt, keys=list(on), right_keys=list(right_on),
                   join_type=join_type,
                   left_suffix=l_suffix, right_suffix=r_suffix,
                   use_threads=False)


def exchange_join(left_ds, right_ds, join_type: str, num_partitions: int,
                  *, on, right_on=None, left_suffix=None,
                  right_suffix=None):
    """Hash join via the raw-task exchange: both sides split per block
    by key hash (one object per partition), each partition joined
    locally with Arrow's Acero join kernel.  Pure tasks — no actor
    pools to deadlock, no empty-block schema bug, measured faster than
    Ray's hash-shuffle join operator at bench scale (see BASELINE.md).

    ``join_type``: Acero names — "inner", "left outer", "right outer",
    "full outer", "left semi", "left anti", …"""
    import ray
    import ray.data as rd

    on = list(on)
    right_on = list(right_on) if right_on else on

    split = ray.remote(num_returns=num_partitions)(_map_side) \
        if num_partitions > 1 else ray.remote(_map_side)
    reduce = ray.remote(_join_reduce)
    merge = ray.remote(_merge_pieces)
    unwrap = ray.remote(lambda t: t[0]) if num_partitions == 1 else None

    def _exchange(side_ds, key_cols, fanin=256):
        # per-partition merge tree (see hash_aggregate) so join-reduce
        # arg counts stay bounded at 100-TB block counts; blocks feed
        # the splits as they materialize (streaming — no to_arrow_refs
        # barrier, no driver-pinned block list)
        tree = _MergeTree(num_partitions, fanin,
                          lambda *rs: merge.remote(*rs))
        n = 0
        for r in _iter_block_refs(side_ds):
            n += 1
            parts = split.remote(r, tuple(key_cols), num_partitions, None)
            if num_partitions == 1:
                tree.push(0, unwrap.remote(parts))
            else:
                for j, p in enumerate(parts):
                    tree.push(j, p)
        return [tree.remaining(j) for j in range(num_partitions)], n

    l_cols, n_l = _exchange(left_ds, on)
    r_cols, n_r = _exchange(right_ds, right_on)

    if not n_l or not n_r:
        # empty side (zero blocks): synthesize the join result locally.
        # The non-empty side's rows are its exchanged pieces — bounded
        # here because only degenerate (mostly test) inputs take this
        # path.
        def _whole(ds_side, cols, n_blocks):
            parts = [] if not n_blocks else \
                [p for p in ray.get([r for js in cols for r in js])
                 if p is not None]
            if not parts:
                sch = ds_side.schema()
                return pa.schema(
                    [(n, t) for n, t in
                     zip(sch.names, sch.types)]).empty_table()
            return _concat_mixed(parts)

        lt = _whole(left_ds, l_cols, n_l)
        rt = _whole(right_ds, r_cols, n_r)
        return rd.from_arrow(lt.join(
            rt, keys=on, right_keys=right_on, join_type=join_type,
            left_suffix=left_suffix, right_suffix=right_suffix,
            use_threads=False))

    out = [reduce.remote(join_type, tuple(on), tuple(right_on),
                         left_suffix, right_suffix, len(l_cols[j]),
                         *l_cols[j], *r_cols[j])
           for j in range(num_partitions)]
    return rd.from_arrow_refs(out)
