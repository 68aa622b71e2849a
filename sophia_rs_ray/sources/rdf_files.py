"""Distributed RDF text-file source + sink.

The Dataset analogue of the reference's example binaries
(``sophia/examples/parse.rs``, ``sophia/examples/serialize.rs``): a
sophia user's on-disk interchange is .nt/.nq/.ttl/.trig/.rdf/.jsonld
files, so the Ray-native engine needs to read a directory of them into
a triple Dataset and write one back out — not only Parquet.

Read side: ONE TASK PER FILE.  Every non-NT syntax carries document
state (prefix maps, bnode label scopes, XML element stacks), so a file
cannot be byte-range split safely; a file is the natural parallel unit
of a crawl dump.  Parse errors are per-file ERROR ROWS (src + error),
never job failures — the reference's two-sided stream-error semantics
(``api/src/source/_stream_error.rs``).

Write side: one file per input block, named by the CONTENT HASH of its
bytes (``part-<sha256[:16]>.<ext>``) and written atomically
(tmp + rename).  Re-running a failed job rewrites byte-identical files
to identical names — idempotent resume without a manifest lock.  A
written-files record (path, rows, bytes) is returned per shard.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Tuple
from uuid import uuid4

import pyarrow as pa

#: extension → format key
_EXT_FMT = {
    ".nt": "nt", ".ntriples": "nt",
    ".nq": "nq", ".nquads": "nq",
    ".ttl": "turtle", ".turtle": "turtle",
    ".trig": "trig",
    ".rdf": "rdfxml", ".rdfxml": "rdfxml", ".xml": "rdfxml",
    ".jsonld": "jsonld", ".json": "jsonld",
}

_SINK_EXT = {"nt": "nt", "nq": "nq", "turtle": "ttl", "trig": "trig",
             "rdfxml": "rdf", "jsonld": "jsonld"}

TRIPLE_FILE_SCHEMA = pa.schema([
    ("src", pa.string()), ("error", pa.string()),
    ("s", pa.large_string()), ("p", pa.large_string()),
    ("o", pa.large_string()), ("g", pa.large_string()),
])


def fmt_of(path: str) -> Optional[str]:
    if path.lower().endswith(".gz"):
        path = path[:-3]
    return _EXT_FMT.get(os.path.splitext(path)[1].lower())


def _parse_one(path: str, fmt: str, base: Optional[str]):
    """→ list of (s,p,o,g Term tuples) for one file."""
    from .. import jsonld, ntriples, rdfxml, turtle

    raw = open(path, "rb").read()
    if path.lower().endswith(".gz"):       # crawl dumps ship gzipped
        import gzip

        raw = gzip.decompress(raw)
    text = raw.decode("utf-8")
    b = base or ("file://" + os.path.abspath(path))
    if fmt == "nt":
        return ntriples.parse_document(text)
    if fmt == "nq":
        return ntriples.parse_document(text, quads=True)
    if fmt == "turtle":
        return [(s, p, o, None) for s, p, o in turtle.parse_turtle(text, b)]
    if fmt == "trig":
        return turtle.parse_trig(text, b)
    if fmt == "rdfxml":
        return [(s, p, o, None) for s, p, o in rdfxml.parse_rdfxml(text, b)]
    if fmt == "jsonld":
        import json as _json

        exp = jsonld.JsonLdExpander(b)
        return exp.to_rdf(_json.loads(text))
    raise ValueError(f"unknown RDF format {fmt!r}")


def _parse_files_batch(batch: pa.Table, base: Optional[str]) -> pa.Table:
    from ..terms import format_term

    src: List[str] = []
    err: List[str] = []
    cols: dict = {c: [] for c in ("s", "p", "o", "g")}
    for path, fmt in zip(batch["path"].to_pylist(),
                         batch["fmt"].to_pylist()):
        try:
            quads = _parse_one(path, fmt, base)
        except Exception as e:          # error ROW, not job failure
            src.append(path)
            err.append(f"{type(e).__name__}: {e}")
            for c in ("s", "p", "o", "g"):
                cols[c].append(None)
            continue
        for q in quads:
            s, p, o = q[0], q[1], q[2]
            g = q[3] if len(q) > 3 else None
            src.append(path)
            err.append("")
            cols["s"].append(format_term(s))
            cols["p"].append(format_term(p))
            cols["o"].append(format_term(o))
            cols["g"].append(format_term(g) if g is not None else None)
    return pa.table({
        "src": pa.array(src, pa.string()),
        "error": pa.array(err, pa.string()),
        "s": pa.array(cols["s"], pa.large_string()),
        "p": pa.array(cols["p"], pa.large_string()),
        "o": pa.array(cols["o"], pa.large_string()),
        "g": pa.array(cols["g"], pa.large_string()),
    })


def read_rdf_files(paths, fmt: Optional[str] = None,
                   base: Optional[str] = None,
                   override_num_blocks: Optional[int] = None):
    """Directory / path list → triple Dataset (canonical NT text
    columns ``s,p,o,g`` + ``src`` file and per-file ``error``).

    ``fmt=None`` infers per file from the extension, so one call reads
    a mixed dump.  The file list is driver-side metadata (cheap); the
    file BYTES are read inside the parse tasks, one file per row."""
    import ray.data as rd

    if isinstance(paths, str):
        root = paths
        found = []
        if os.path.isdir(root):
            for d, _sub, files in sorted(os.walk(root)):
                for f in sorted(files):
                    found.append(os.path.join(d, f))
        else:
            found = [root]
    else:
        found = list(paths)
    items = []
    for p in found:
        f = fmt or fmt_of(p)
        if f is None:
            continue                    # non-RDF file in the dir: skip
        items.append({"path": p, "fmt": f})
    if not items:
        return rd.from_arrow(TRIPLE_FILE_SCHEMA.empty_table())
    ds = rd.from_items(items, override_num_blocks=override_num_blocks)
    return ds.map_batches(lambda b: _parse_files_batch(b, base),
                          batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sink
# ---------------------------------------------------------------------------

def _terms_of(batch: pa.Table) -> List[Tuple]:
    from ..ntriples import parse_term_text

    gs = batch["g"].to_pylist() if "g" in batch.column_names \
        else [None] * batch.num_rows
    return [(parse_term_text(s), parse_term_text(p), parse_term_text(o),
             parse_term_text(g) if g else None)
            for s, p, o, g in zip(batch["s"].to_pylist(),
                                  batch["p"].to_pylist(),
                                  batch["o"].to_pylist(), gs)]


def _serialize_block(batch: pa.Table, fmt: str) -> str:
    from .. import jsonld, rdfxml, turtle

    if fmt in ("nt", "nq"):
        # columns are already canonical NT text — join directly
        cols = [batch[c].to_pylist() for c in ("s", "p", "o")]
        gs = batch["g"].to_pylist() if "g" in batch.column_names \
            else [None] * batch.num_rows
        lines = []
        for s, p, o, g in zip(*cols, gs):
            if fmt == "nq" and g:
                lines.append(f"{s} {p} {o} {g} .")
            else:
                lines.append(f"{s} {p} {o} .")
        return "\n".join(lines) + ("\n" if lines else "")
    quads = _terms_of(batch)
    if fmt == "turtle":
        return turtle.serialize_turtle([(s, p, o) for s, p, o, _g in quads])
    if fmt == "trig":
        return turtle.serialize_trig(quads)
    if fmt == "rdfxml":
        return rdfxml.serialize_rdfxml([(s, p, o) for s, p, o, _g in quads])
    if fmt == "jsonld":
        return jsonld.serialize_jsonld([(s, p, o) for s, p, o, _g in quads])
    raise ValueError(f"unknown RDF sink format {fmt!r}")


def _write_block(batch: pa.Table, out_dir: str, fmt: str,
                 gz: bool) -> pa.Table:
    text = _serialize_block(batch, fmt)
    data = text.encode("utf-8")
    if gz:
        import gzip

        # mtime=0 keeps the bytes (and the content-hash name) deterministic
        data = gzip.compress(data, mtime=0)
    ext = _SINK_EXT[fmt] + (".gz" if gz else "")
    name = f"part-{hashlib.sha256(data).hexdigest()[:16]}.{ext}"
    final = os.path.join(out_dir, name)
    if not os.path.exists(final):       # content-hash name ⇒ idempotent
        # tmp name unique per writer: two concurrent tasks (or a
        # speculative retry) with byte-identical blocks must not race
        # on one tmp path (ADVICE r4)
        tmp = f"{final}.tmp.{os.getpid()}.{uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
    return pa.table({"path": pa.array([final], pa.string()),
                     "rows": pa.array([batch.num_rows], pa.int64()),
                     "bytes": pa.array([len(data)], pa.int64())})


def write_rdf_files(ds, out_dir: str, fmt: str = "nt", *,
                    gz: bool = False):
    """Triple Dataset (NT-text columns ``s,p,o``[, ``g``]) → sharded
    RDF text files under ``out_dir`` — one file per block, content-hash
    names, atomic writes.  Returns the written-file records as a list
    of dicts (path, rows, bytes); the write itself happens distributed
    inside the map tasks.

    For the prefix-bearing syntaxes (turtle/trig/rdfxml/jsonld) every
    shard file is a self-contained document with its own prefix block —
    concatenating shards is NOT valid; reading the directory back with
    :func:`read_rdf_files` is.

    Content-hash naming dedups byte-identical BLOCKS: if two input
    blocks serialize to the same bytes they share one output file, so a
    bag dataset whose duplicates happen to fill whole identical blocks
    round-trips with reduced multiplicity (set semantics at block
    granularity — correct for RDF graphs, but the returned per-shard
    ``rows`` counts then double-count the merged file).  Pipelines that
    need strict bag multiplicity should repartition so no two blocks
    are identical, or dedup first and carry explicit counts."""
    if fmt not in _SINK_EXT:
        raise ValueError(f"unknown RDF sink format {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    recs = ds.map_batches(
        lambda b: _write_block(b, out_dir, fmt, gz),
        batch_format="pyarrow", batch_size=None).take_all()
    return recs
