"""Exact distributed deduplication — the ``SetGraph`` semantics
(``inmem/src/graph.rs:111-143``) as a shuffle.

Pattern (SURVEY §2.8): compose a single key column, pre-deduplicate
inside each batch (combiner — cuts shuffle volume before the wide op),
then one ``groupby(key).aggregate(...)`` whose aggregation is fully
vectorized (no per-group Python). The key IS the content, so the
aggregate only needs to carry provenance (min url) and multiplicity.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x1f"


def add_spo_key(batch: pa.Table, cols=("s", "p", "o")) -> pa.Table:
    arrs = [pc.cast(batch[c], pa.large_string()) for c in cols]
    key = pc.binary_join_element_wise(*arrs, pa.scalar(SEP, pa.large_string()))
    return batch.append_column("spo_key", key)


def prededup_batch(batch: pa.Table, key: str = "spo_key") -> pa.Table:
    """In-batch combiner: keep first row per key (pyarrow hash-groupby)."""
    idx = pa.table({key: batch[key],
                    "_i": pa.array(range(len(batch)), pa.int64())})
    first = idx.group_by(key).aggregate([("_i", "min")])
    return batch.take(first["_i_min"].combine_chunks())


def split_spo_key(batch: pa.Table, key: str = "spo_key",
                  cols=("s", "p", "o")) -> pa.Table:
    parts = pc.split_pattern(batch[key], SEP, max_splits=len(cols) - 1)
    data = {}
    for i, c in enumerate(cols):
        data[c] = pc.list_element(parts, i)
    for c in batch.column_names:
        if c != key:
            data[c] = batch[c]
    return pa.table(data)


def dedup_triples(ds, carry_min: tuple = ("url",), with_count: bool = False):
    """Dataset of (s,p,o[,url,...]) NT-text rows → distinct triples.

    The one wide op of the core pipeline: groupby on the composed key.
    Per-batch prededup runs first so the shuffle moves each distinct
    triple from each block once (hub-entity triples would otherwise be
    shipped once per *page*).
    """
    from ray.data.aggregate import Count, Min

    ds = ds.map_batches(add_spo_key, batch_format="pyarrow")
    ds = ds.map_batches(prededup_batch, batch_format="pyarrow")
    aggs = [Min(c, alias_name=c) for c in carry_min]
    if with_count:
        aggs.append(Count(alias_name="n_dups"))
    if not aggs:
        aggs = [Count(alias_name="n_dups")]
    out = ds.groupby("spo_key").aggregate(*aggs)
    keep_extra = list(carry_min) + (["n_dups"] if with_count else [])

    def finish(b: pa.Table) -> pa.Table:
        t = split_spo_key(b)
        names = ["s", "p", "o"] + [c for c in keep_extra if c in t.column_names]
        return t.select(names)

    return out.map_batches(finish, batch_format="pyarrow")
