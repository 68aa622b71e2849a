"""CLI parity with the reference example binaries
(sophia/examples/{parse,serialize,canonicalize,sparql}.rs): same
commands, same stdin/stdout contracts, same env knobs."""

import io
import os
import subprocess
import sys

import pytest

from sophia_rs_ray.cli import main

TTL = """@prefix ex: <http://ex.org/> .
ex:a ex:knows ex:b ; ex:name "Alice" .
_:x ex:p "v"@en-GB .
"""

NQ = """<http://ex.org/a> <http://ex.org/p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex.org/a> <http://ex.org/p> "2" <http://ex.org/g> .
_:b1 <http://ex.org/p> _:b2 .
"""


def _run(capsys, monkeypatch, argv, stdin_text=""):
    monkeypatch.setattr(sys, "stdin", io.StringIO(stdin_text))
    rc = main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_parse_turtle_to_nt(capsys, monkeypatch):
    rc, out = _run(capsys, monkeypatch, ["parse", "ttl"], TTL)
    assert rc == 0
    lines = sorted(l for l in out.splitlines() if l)
    assert '<http://ex.org/a> <http://ex.org/knows> <http://ex.org/b> .' \
        in lines
    assert any('"Alice"' in l for l in lines)
    # lang tag canonical-lowercased (nt.rs:190-196 canonical mode)
    assert any('"v"@en-gb' in l for l in lines)


def test_parse_guess_by_extension(capsys, monkeypatch, tmp_path):
    p = tmp_path / "data.ttl"
    p.write_text(TTL)
    rc, out = _run(capsys, monkeypatch, ["parse", "guess", str(p)])
    assert rc == 0
    assert "<http://ex.org/knows>" in out


def test_parse_nquads_keeps_graph(capsys, monkeypatch):
    rc, out = _run(capsys, monkeypatch, ["parse", "nq"], NQ)
    assert rc == 0
    assert '"2" <http://ex.org/g> .' in out


def test_serialize_turtle_drops_named_graphs(capsys, monkeypatch):
    # serialize.rs:13-15 — graph formats keep only the default graph
    rc, out = _run(capsys, monkeypatch, ["serialize", "turtle"], NQ)
    assert rc == 0
    assert "ex.org/g" not in out
    assert "1" in out and '"2"' not in out


def test_serialize_trig_groups_graphs(capsys, monkeypatch):
    rc, out = _run(capsys, monkeypatch, ["serialize", "trig"], NQ)
    assert rc == 0
    assert "GRAPH <http://ex.org/g>" in out


def test_canonicalize_matches_module(capsys, monkeypatch):
    from sophia_rs_ray.c14n import normalize_quads
    from sophia_rs_ray.ntriples import parse_document

    rc, out = _run(capsys, monkeypatch, ["canonicalize"], NQ)
    assert rc == 0
    want = normalize_quads(parse_document(NQ, quads=True))
    assert out == want
    assert "_:c14n" in out  # canonical bnode labels


def test_roundtrip_parse_serialize(capsys, monkeypatch):
    # parse ttl → NT, then serialize → turtle, then parse again: same graph
    rc, nt = _run(capsys, monkeypatch, ["parse", "ttl"], TTL)
    rc, ttl2 = _run(capsys, monkeypatch, ["serialize", "turtle"], nt)
    rc, nt2 = _run(capsys, monkeypatch, ["parse", "ttl"], ttl2)

    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.ntriples import parse_document

    assert isomorphic(parse_document(nt, quads=False),
                      parse_document(nt2, quads=False))


def test_parse_file_distributed(ray_session, tmp_path, capsys, monkeypatch):
    # PATH + line format → the Ray read_text pipeline (scale path)
    p = tmp_path / "data.nt"
    p.write_text("".join(
        f'<http://ex.org/s{i}> <http://ex.org/p> "{i}" .\n'
        for i in range(100)))
    rc, out = _run(capsys, monkeypatch, ["parse", "nt", str(p)])
    assert rc == 0
    lines = sorted(l for l in out.splitlines() if l)
    assert len(lines) == 100
    assert '<http://ex.org/s7> <http://ex.org/p> "7" .' in lines


def test_sparql_select_tsv(ray_session, tmp_path, capsys, monkeypatch):
    data = tmp_path / "d.nq"
    data.write_text(NQ)
    q = ("SELECT ?o WHERE { <http://ex.org/a> <http://ex.org/p> ?o } "
         "ORDER BY ?o")
    rc, out = _run(capsys, monkeypatch, ["sparql", q, str(data)])
    assert rc == 0
    lines = out.strip().split("\n")
    assert lines[0] == "?o"
    assert '"1"^^<http://www.w3.org/2001/XMLSchema#integer>' in lines[1]


def test_sparql_ask_and_construct(ray_session, tmp_path, capsys, monkeypatch):
    data = tmp_path / "d.nq"
    data.write_text(NQ)
    rc, out = _run(capsys, monkeypatch, [
        "sparql", "ASK { ?s <http://ex.org/p> ?o }", str(data)])
    assert out.strip() == "true"
    rc, out = _run(capsys, monkeypatch, [
        "sparql",
        "CONSTRUCT { ?s <http://ex.org/made> ?o } "
        "WHERE { ?s <http://ex.org/p> ?o }", str(data)])
    assert "made" in out


def test_materialize_command(ray_session, tmp_path, capsys, monkeypatch):
    p = tmp_path / "data.nt"
    p.write_text("".join(
        f'<http://ex.org/s{i % 7}> <http://ex.org/p{i % 3}> "{i}" .\n'
        for i in range(50)))
    out_dir = str(tmp_path / "layouts")
    rc, out = _run(capsys, monkeypatch, ["materialize", str(p), out_dir])
    assert rc == 0
    assert "spo: 50 rows" in out
    assert os.path.isdir(os.path.join(out_dir, "pos"))


def test_cli_subprocess_smoke():
    """The real __main__ path, stdin → stdout, no Ray needed."""
    r = subprocess.run(
        [sys.executable, "-m", "sophia_rs_ray.cli", "parse", "nt"],
        input='<x:s> <x:p> "o"@en-UK .\n', capture_output=True,
        text=True, cwd="/root/repo", timeout=120)
    assert r.returncode == 0
    assert r.stdout == '<x:s> <x:p> "o"@en-uk .\n'
