"""The flagship KG-construction pipeline (north rule / SURVEY §7.1).

``pages → extract (map_batches) → NT format → exact dedup (groupby
shuffle) → sort(s,p,o)``, all streaming — no full materialization between
stages. Output: N-Triples-compatible ``(s, p, o[, url])`` rows, the same
shape the oracle table uses for P/R scoring.
"""

from __future__ import annotations

from ..stages.dedup import dedup_triples
from ..stages.extract import (extract_nt_batch, extract_text_batch,
                              extract_triples_batch)


def extract_triples(pages_ds, batch_size: int = 256):
    """pages → flat term-column triple rows (incl. error rows)."""
    return pages_ds.map_batches(
        extract_triples_batch,
        batch_format="pyarrow",
        batch_size=batch_size,  # html is multi-KB per row: keep batches modest
    )


def kg_pipeline(pages_ds, *, dedup: bool = True, sort: bool = True,
                keep_url: bool = True, batch_size: int = 256):
    """pages Dataset → distinct (s, p, o[, url]) triples Dataset."""
    keep = ("url",) if keep_url else ()
    nt = pages_ds.map_batches(lambda b: extract_nt_batch(b, keep=keep),
                              batch_format="pyarrow",
                              batch_size=batch_size)
    if dedup:
        nt = dedup_triples(nt, carry_min=keep)
    if sort:
        nt = nt.sort(["s", "p", "o"])
    return nt


def kg_materialize_pipeline(pages_ds, out_dir: str, *,
                            num_shards: int = 64,
                            orders=("spo", "pos", "osp"),
                            batch_size: int = 256,
                            resume: bool = True):
    """The full north-star flagship: pages → extract → per-batch
    combiner dedup → sharded SetGraph dedup + sorted SPO/POS/OSP
    Parquet layouts with lineage manifests (checkpoint-resumable).

    Exactly one int-keyed shuffle per index order — no global sort, no
    long-string groupby key; dedup happens (a) per batch before the
    shuffle (combiner), (b) per shard inside the writer (exact, since a
    triple's shard is a pure function of its content).  This is the
    configuration benchmarked for the N→4N scaling criterion."""
    from ..stages.dedup import add_spo_key, prededup_batch
    from ..stages.materialize import materialize_graph

    # fused extract→NT kernel: skips the flat-term intermediate and
    # memoizes per-term formatting (1.30× the two-stage form, pinned
    # byte-identical in tests/test_extract.py)
    nt = pages_ds.map_batches(
        lambda b: extract_nt_batch(b, keep=()),
        batch_format="pyarrow", batch_size=batch_size)
    nt = nt.map_batches(
        lambda b: prededup_batch(add_spo_key(b)).drop_columns(["spo_key"]),
        batch_format="pyarrow")
    # NB: the shuffle fans every input block out to every (order, shard)
    # partition, so its overhead is O(blocks × partitions) small objects.
    # Callers control the block count at the SOURCE (e.g.
    # ``pages_dataset(n, override_num_blocks=2*cpus)``) — a mid-pipeline
    # repartition() is an extra barrier that serializes the extract
    # stage against the shuffle (measured 3-9× slower end-to-end).
    return materialize_graph(nt, out_dir, orders=orders,
                             num_shards=num_shards, resume=resume,
                             distinct=True)


def extract_text(pages_ds, batch_size: int = 256):
    """pages → (url, text) — the byte-identical visible-text surface."""
    return pages_ds.map_batches(extract_text_batch, batch_format="pyarrow",
                                batch_size=batch_size)
