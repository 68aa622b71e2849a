"""Graph materialization: sorted SPO/POS/OSP Parquet layouts + manifests.

The distributed mirror of sophia's ``FastGraph`` (reference
``inmem/src/graph.rs:164-169``: term index + three BTreeSets ``spo, pos,
osp``) and its 9-way pattern-lookup dispatch
(``inmem/src/graph.rs:207-299``): here each BTree order becomes a
hash-partitioned, internally *sorted* Parquet layout

    out_dir/{order}/shard=K/data.parquet      (K = h(leading term) % n)
    out_dir/{order}/_manifest.jsonl           (one line per shard)

and a BTree range scan becomes partition pruning (pick the shard of the
bound leading term) + Parquet predicate pushdown on the sorted columns.

**Lineage / checkpoint-resume (north rule).**  Every shard writes a
manifest line ``{order, shard, rows, min_key, max_key, digest, wall_ms}``
*after* its data file is complete; a re-run loads the manifest, verifies
the data file exists, and filters already-done shards out of the input —
only missing/failed shards are recomputed (tested in
tests/test_materialize.py by deleting one shard).

**Scale notes.**  One ``groupby(shard).map_groups`` shuffle per order;
each shard must fit a worker (choose ``num_shards`` ≈ data_size /
~1 GiB; sub-shard splitting is the extension point).  The digest is a
*commutative* per-row hash sum, so it is computed streaming inside the
shard writer without a second pass, and two layouts of the same graph
can be compared shard-free (order-insensitive dataset digest = sum of
shard digests mod 2^64).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ORDERS: Dict[str, Tuple[str, str, str]] = {
    "spo": ("s", "p", "o"),
    "pos": ("p", "o", "s"),
    "osp": ("o", "s", "p"),
}

_MASK64 = (1 << 64) - 1


def shard_of(term_nt: str, num_shards: int) -> int:
    """Deterministic cross-process shard id of a canonical-NT term (the
    content-hash analogue of BasicTermIndex ids, SURVEY §1.5)."""
    h = hashlib.sha256(term_nt.encode()).digest()
    return int.from_bytes(h[:4], "big") % num_shards


def _row_digests(tbl: pa.Table, cols: Sequence[str]) -> int:
    acc = 0
    its = [tbl[c].to_pylist() for c in cols]
    for parts in zip(*its):
        h = hashlib.sha256("\x1f".join(parts).encode()).digest()
        acc = (acc + int.from_bytes(h[:8], "big")) & _MASK64
    return acc


def load_manifest(out_dir: str, order: str) -> Dict[int, dict]:
    """shard → manifest row. One ``_manifest.json`` per shard directory,
    written atomically AFTER the data file (no cross-writer appends —
    each shard's lineage is self-contained, object-store friendly).  A
    crashed writer leaves either nothing or a data file without a
    manifest; both read as "not done"."""
    base = os.path.join(out_dir, order)
    done: Dict[int, dict] = {}
    if not os.path.isdir(base):
        return done
    for d in os.listdir(base):
        if not d.startswith("shard="):
            continue
        mp = os.path.join(base, d, "_manifest.json")
        fp = os.path.join(base, d, "data.parquet")
        if os.path.exists(mp) and os.path.exists(fp):
            with open(mp) as f:
                row = json.load(f)
            done[row["shard"]] = row
    return done


def materialize_graph(nt_ds, out_dir: str, *,
                      orders: Sequence[str] = ("spo", "pos", "osp"),
                      num_shards: int = 16,
                      resume: bool = True) -> Dict[str, dict]:
    """(s, p, o) NT rows → the sorted shard layouts. Returns a report
    ``{order: {"written": [...], "skipped": [...], "rows": N}}``."""
    report: Dict[str, dict] = {}
    for order in orders:
        cols = ORDERS[order]
        lead = cols[0]
        done = load_manifest(out_dir, order) if resume else {}
        os.makedirs(os.path.join(out_dir, order), exist_ok=True)

        def add_shard(b: pa.Table, lead=lead) -> pa.Table:
            sh = [shard_of(t, num_shards) for t in b[lead].to_pylist()]
            return b.select(["s", "p", "o"]).append_column(
                "shard", pa.array(sh, pa.int32()))

        ds = nt_ds.map_batches(add_shard, batch_format="pyarrow")
        if done:
            done_arr = list(done)
            ds = ds.map_batches(
                lambda b, d=done_arr: b.filter(
                    pc.invert(pc.is_in(b["shard"],
                                       value_set=pa.array(d, pa.int32())))),
                batch_format="pyarrow")

        def write_shard(group: pa.Table, order=order, cols=cols) -> pa.Table:
            t0 = time.perf_counter()
            if group.num_rows == 0:
                return pa.table({"shard": pa.array([], pa.int32()),
                                 "rows": pa.array([], pa.int64())})
            shard = group["shard"][0].as_py()
            tbl = group.select(["s", "p", "o"]).sort_by(
                [(c, "ascending") for c in cols])
            d = os.path.join(out_dir, order, f"shard={shard}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, "data.parquet.tmp")
            pq.write_table(tbl, tmp)
            os.replace(tmp, os.path.join(d, "data.parquet"))
            row = {
                "order": order, "shard": shard, "rows": tbl.num_rows,
                "min_key": tbl[cols[0]][0].as_py(),
                "max_key": tbl[cols[0]][tbl.num_rows - 1].as_py(),
                "digest": _row_digests(tbl, ("s", "p", "o")),
                "wall_ms": round(1000 * (time.perf_counter() - t0), 1),
            }
            mtmp = os.path.join(d, "_manifest.json.tmp")
            with open(mtmp, "w") as f:
                f.write(json.dumps(row) + "\n")
            os.replace(mtmp, os.path.join(d, "_manifest.json"))
            return pa.table({"shard": pa.array([shard], pa.int32()),
                             "rows": pa.array([tbl.num_rows], pa.int64())})

        out = ds.groupby("shard").map_groups(write_shard,
                                             batch_format="pyarrow")
        written = {r["shard"]: r["rows"] for r in out.take_all()}
        report[order] = {
            "written": sorted(written),
            "skipped": sorted(done),
            "rows": sum(written.values()) + sum(r["rows"] for r in done.values()),
        }
    return report


# ---------------------------------------------------------------------------
# pattern scan (the 9-way dispatch of FastGraph::triples_matching)
# ---------------------------------------------------------------------------

def _pick_order(s: Optional[str], p: Optional[str], o: Optional[str]) -> str:
    """Choose the layout whose prefix covers the bound positions —
    mirrors ``inmem/src/graph.rs:234-298``."""
    if s is not None:
        return "spo"
    if p is not None:
        return "pos"
    if o is not None:
        return "osp"
    return "spo"


def triples_matching(out_dir: str, *, s: Optional[str] = None,
                     p: Optional[str] = None, o: Optional[str] = None,
                     num_shards: int = 16):
    """Distributed pattern match over the materialized layouts.

    Bound leading term → read ONE shard directory (partition pruning);
    remaining bound terms → Arrow dataset filter (row-group predicate
    pushdown on the sorted column). Returns a ray Dataset of (s, p, o).
    """
    import ray.data as rd

    order = _pick_order(s, p, o)
    lead_val = {"spo": s, "pos": p, "osp": o}[order]
    base = os.path.join(out_dir, order)
    if lead_val is not None:
        dirs = [os.path.join(base, f"shard={shard_of(lead_val, num_shards)}")]
    else:
        dirs = [os.path.join(base, d) for d in sorted(os.listdir(base))
                if d.startswith("shard=")]
    paths = [os.path.join(pth, "data.parquet") for pth in dirs
             if os.path.exists(os.path.join(pth, "data.parquet"))]
    if not paths:
        return rd.from_arrow(pa.table(
            {"s": pa.array([], pa.large_string()),
             "p": pa.array([], pa.large_string()),
             "o": pa.array([], pa.large_string())}))

    import pyarrow.dataset as pds
    expr = None
    for col, val in (("s", s), ("p", p), ("o", o)):
        if val is not None:
            e = pds.field(col) == val
            expr = e if expr is None else expr & e
    ds = rd.read_parquet(paths, columns=["s", "p", "o"], filter=expr)
    return ds


def dataset_digest(out_dir: str, order: str = "spo") -> int:
    """Order-insensitive digest of the materialized graph = sum of shard
    digests (isomorphism-style cheap equality between two layouts)."""
    return sum(r["digest"] for r in load_manifest(out_dir, order).values()) & _MASK64
