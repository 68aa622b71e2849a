"""The flagship KG-construction pipeline (north rule / SURVEY §7.1).

``pages → extract (map_batches) → NT format → exact dedup (groupby
shuffle) → sort(s,p,o)``, all streaming — no full materialization between
stages. Output: N-Triples-compatible ``(s, p, o[, url])`` rows, the same
shape the oracle table uses for P/R scoring.
"""

from __future__ import annotations

from ..stages.dedup import dedup_triples
from ..stages.extract import extract_text_batch, extract_triples_batch, format_triples_batch


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
    t = extract_triples(pages_ds, batch_size=batch_size)
    keep = ("url",) if keep_url else ()
    nt = t.map_batches(lambda b: format_triples_batch(b, keep=keep),
                       batch_format="pyarrow")
    if dedup:
        nt = dedup_triples(nt, carry_min=keep)
    if sort:
        nt = nt.sort(["s", "p", "o"])
    return nt


def extract_text(pages_ds, batch_size: int = 256):
    """pages → (url, text) — the byte-identical visible-text surface."""
    return pages_ds.map_batches(extract_text_batch, batch_format="pyarrow",
                                batch_size=batch_size)
