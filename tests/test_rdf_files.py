"""Distributed RDF text-file source + sink (sources/rdf_files.py):
directory reads across all six syntaxes, error-row semantics, and
write→read roundtrips with content-hash idempotence."""

import os

import pyarrow as pa
import pytest

from sophia_rs_ray.sources.rdf_files import (
    fmt_of, read_rdf_files, write_rdf_files)

NT_DOC = (
    '<http://ex.org/a> <http://ex.org/p> "x" .\n'
    '<http://ex.org/b> <http://ex.org/p> "café"@en .\n'
    '<http://ex.org/c> <http://ex.org/n> '
    '"3"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')

TTL_DOC = (
    "@prefix ex: <http://ex.org/> .\n"
    "ex:a ex:p \"x\" ; ex:q ex:b .\n")

NQ_DOC = (
    '<http://ex.org/a> <http://ex.org/p> "x" <http://ex.org/g1> .\n'
    '<http://ex.org/b> <http://ex.org/p> "y" .\n')


def _rows(ds):
    return sorted(((r["s"], r["p"], r["o"], r["g"], r["error"])
                   for r in ds.take_all()),
                  key=lambda t: tuple("" if x is None else x for x in t))


def test_fmt_inference():
    assert fmt_of("x/a.nt") == "nt"
    assert fmt_of("a.TTL") == "turtle"
    assert fmt_of("a.trig") == "trig"
    assert fmt_of("a.rdf") == "rdfxml"
    assert fmt_of("a.jsonld") == "jsonld"
    assert fmt_of("a.parquet") is None


def test_mixed_dir_read(tmp_path, ray_session):
    (tmp_path / "a.nt").write_text(NT_DOC)
    (tmp_path / "b.ttl").write_text(TTL_DOC)
    (tmp_path / "c.nq").write_text(NQ_DOC)
    (tmp_path / "skip.parquet").write_text("not rdf")
    rows = _rows(read_rdf_files(str(tmp_path)))
    assert all(e == "" for *_x, e in rows)
    # 3 NT + 2 TTL + 2 NQ triples
    assert len(rows) == 7
    assert ('<http://ex.org/a>', '<http://ex.org/p>', '"x"',
            '<http://ex.org/g1>', '') in rows
    assert ('<http://ex.org/a>', '<http://ex.org/q>',
            '<http://ex.org/b>', None, '') in rows


def test_parse_error_is_row_not_failure(tmp_path, ray_session):
    (tmp_path / "bad.ttl").write_text("@prefix broken")
    (tmp_path / "good.nt").write_text(NT_DOC)
    rows = read_rdf_files(str(tmp_path)).take_all()
    errs = [r for r in rows if r["error"]]
    assert len(errs) == 1 and errs[0]["src"].endswith("bad.ttl")
    assert len([r for r in rows if not r["error"]]) == 3


@pytest.mark.parametrize("fmt", ["nt", "nq", "turtle", "trig",
                                 "rdfxml", "jsonld"])
def test_write_read_roundtrip(fmt, tmp_path, ray_session):
    """Bnode-free triples survive a write→read cycle exactly (bnode
    relabeling across pretty serializers is covered by the isomorphism
    suites; this pins the file plumbing)."""
    import ray.data as rd

    src = [{"s": f"<http://ex.org/s{i}>", "p": "<http://ex.org/p>",
            "o": f'"v{i}"'} for i in range(20)]
    ds = rd.from_items(src, override_num_blocks=3)
    out = tmp_path / "out"
    recs = write_rdf_files(ds, str(out), fmt)
    assert sum(r["rows"] for r in recs) == 20
    assert all(os.path.exists(r["path"]) for r in recs)
    back = read_rdf_files(str(out))
    got = sorted((r["s"], r["p"], r["o"]) for r in back.take_all())
    want = sorted((r["s"], r["p"], r["o"]) for r in src)
    assert got == want


def test_write_idempotent_content_hash(tmp_path, ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"s": "<http://ex.org/s>", "p": "<http://ex.org/p>",
          "o": '"v"'}], override_num_blocks=1)
    out = tmp_path / "out"
    r1 = write_rdf_files(ds, str(out), "nt")
    r2 = write_rdf_files(ds, str(out), "nt")
    assert [r["path"] for r in r1] == [r["path"] for r in r2]
    assert len(list(out.iterdir())) == 1      # no .tmp leftovers, one part


def test_gzip_roundtrip_and_determinism(tmp_path, ray_session):
    """.nt.gz write→read roundtrip; gzip bytes are mtime-free so the
    content-hash shard name is stable across runs."""
    import gzip

    import ray.data as rd

    src = [{"s": f"<http://ex.org/s{i}>", "p": "<http://ex.org/p>",
            "o": f'"v{i}"'} for i in range(10)]
    out = tmp_path / "out"
    r1 = write_rdf_files(rd.from_items(src, override_num_blocks=1),
                         str(out), "nt", gz=True)
    r2 = write_rdf_files(rd.from_items(src, override_num_blocks=1),
                         str(out), "nt", gz=True)
    assert [r["path"] for r in r1] == [r["path"] for r in r2]
    assert r1[0]["path"].endswith(".nt.gz")
    assert gzip.decompress(open(r1[0]["path"], "rb").read())
    got = sorted((r["s"], r["p"], r["o"])
                 for r in read_rdf_files(str(out)).take_all())
    assert got == sorted((r["s"], r["p"], r["o"]) for r in src)


def test_quads_roundtrip_named_graph(tmp_path, ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"s": "<http://ex.org/s>", "p": "<http://ex.org/p>",
          "o": '"v"', "g": "<http://ex.org/g>"},
         {"s": "<http://ex.org/s>", "p": "<http://ex.org/p>",
          "o": '"w"', "g": None}], override_num_blocks=1)
    out = tmp_path / "out"
    write_rdf_files(ds, str(out), "nq")
    rows = _rows(read_rdf_files(str(out)))
    assert ('<http://ex.org/s>', '<http://ex.org/p>', '"v"',
            '<http://ex.org/g>', '') in rows
    assert ('<http://ex.org/s>', '<http://ex.org/p>', '"w"',
            None, '') in rows


@pytest.mark.parametrize("seed", range(12))
def test_read_dir_of_mutated_files_never_crashes(seed, tmp_path,
                                                 ray_session):
    """A directory of randomly mutated documents (the parser-robustness
    generators) must stream through read_rdf_files as triple rows plus
    per-file error rows — one garbage file in a 100-TB dump must never
    kill the job."""
    import random

    from tests.test_parser_robustness import (
        _mutate, _valid_jsonld, _valid_rdfxml, _valid_turtle)

    rng = random.Random(31000 + seed)
    exts = {"ttl": _valid_turtle, "rdf": _valid_rdfxml,
            "jsonld": _valid_jsonld}
    n_files = rng.randint(4, 10)
    for i in range(n_files):
        ext, gen = rng.choice(sorted(exts.items()))
        doc = gen(rng)
        if rng.random() < 0.7:
            doc = _mutate(rng, doc)
        (tmp_path / f"f{i}.{ext}").write_text(doc, errors="replace")
    rows = read_rdf_files(str(tmp_path)).take_all()
    files_seen = {r["src"] for r in rows}
    # every row is either a clean triple or an error marker; at least
    # one file produced SOMETHING (generators always emit ≥1 statement
    # when unmutated, and errors are rows too)
    for r in rows:
        if r["error"]:
            assert r["s"] is None
        else:
            assert r["s"] and r["p"] and r["o"]
    assert files_seen  # the directory was not silently skipped
