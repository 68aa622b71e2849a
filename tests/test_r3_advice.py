"""Round-3 ADVICE regressions: CLI output dispatch by query form,
c14n triple-term fresh-prefix guard, URL trailing-dot host
normalization, FROM NAMED over an empty GRAPH group, DESCRIBE over a
null-g default graph."""

import pyarrow as pa


# --- ADVICE 1: cmd_sparql dispatches on query FORM, not result schema

def test_cli_select_spo_prints_tsv(tmp_path, capsys, ray_session):
    from sophia_rs_ray.cli import cmd_sparql

    data = tmp_path / "d.nq"
    data.write_text("<http://ex/s> <http://ex/p> <http://ex/o> .\n")
    cmd_sparql(["SELECT ?s ?p ?o WHERE {?s ?p ?o}", str(data)])
    out = capsys.readouterr().out
    assert out.splitlines()[0].startswith("?")          # TSV header
    assert "@prefix" not in out


def test_cli_construct_prints_turtle(tmp_path, capsys, ray_session):
    from sophia_rs_ray.cli import cmd_sparql

    data = tmp_path / "d.nq"
    data.write_text("<http://ex/s> <http://ex/p> <http://ex/o> .\n")
    cmd_sparql(["CONSTRUCT {?s ?p ?o} WHERE {?s ?p ?o}", str(data)])
    out = capsys.readouterr().out
    assert "<http://ex/p> <http://ex/o>" in out
    assert not out.splitlines()[0].startswith("?")


# --- ADVICE 2: bnodes nested inside triple terms guard the tt prefix

def test_c14n_inner_triple_term_bnode_prefix_guard():
    from sophia_rs_ray.c14n import isomorphic, normalize_quads
    from sophia_rs_ray.ntriples import parse_document

    d1 = '_:a <http://ex/p> <<( _:tt0 <http://ex/q> "v" )>> .\n'
    d2 = '_:b <http://ex/p> <<( _:zz9 <http://ex/q> "v" )>> .\n'
    q1 = parse_document(d1, quads=True, strict=False)
    q2 = parse_document(d2, quads=True, strict=False)
    assert normalize_quads(q1, strict=False) == \
        normalize_quads(q2, strict=False)
    assert isomorphic(q1, q2, strict=False)


# --- ADVICE 3: single trailing host dot stripped before the port

def test_url_trailing_dot_with_port():
    from sophia_rs_ray.functions.url import normalize_url

    assert normalize_url("http://example.com.:8080/") == \
        normalize_url("http://example.com:8080/")


def test_url_trailing_dot_single_strip():
    from sophia_rs_ray.functions.url import normalize_url

    # only ONE root-label dot is an RFC 3986 equivalence
    assert normalize_url("http://example.com../x") == \
        "http://example.com./x"


# --- ADVICE 4: FROM NAMED + GRAPH ?g {} binds every DECLARED graph

def test_from_named_empty_group_binds_declared_graphs(ray_session):
    import ray.data as rd

    from sophia_rs_ray.sparql.run import sparql

    tbl = pa.table({
        "s": pa.array(["<http://ex/s>"], pa.large_string()),
        "p": pa.array(["<http://ex/p>"], pa.large_string()),
        "o": pa.array(["<http://ex/o>"], pa.large_string()),
        "g": pa.array(["<http://ex/g1>"], pa.large_string()),
    })
    q = ("SELECT ?g FROM NAMED <http://ex/g1> "
         "FROM NAMED <http://ex/gEMPTY> WHERE { GRAPH ?g {} }")
    res = sparql(q, rd.from_arrow(tbl))
    assert sorted(r["g"] for r in res.take_all()) == \
        ["<http://ex/g1>", "<http://ex/gEMPTY>"]


# --- ADVICE 5: DESCRIBE tolerates null g as the default graph

def test_describe_null_default_graph(ray_session):
    import ray.data as rd

    from sophia_rs_ray.sparql.run import sparql

    tbl = pa.table({
        "s": pa.array(["<http://ex/s>"], pa.large_string()),
        "p": pa.array(["<http://ex/p>"], pa.large_string()),
        "o": pa.array(["<http://ex/o>"], pa.large_string()),
        "g": pa.array([None], pa.large_string()),
    })
    res = sparql("DESCRIBE <http://ex/s>", rd.from_arrow(tbl))
    assert res.take_all() == [
        {"s": "<http://ex/s>", "p": "<http://ex/p>", "o": "<http://ex/o>"}]


# --- winnowing fingerprints (round-3 addition) -----------------------

def test_winnowing_guarantee_shared_substring():
    """Any shared substring of length >= k+w-1 must share at least one
    fingerprint (the winnowing paper's core guarantee)."""
    import pyarrow as pa

    from sophia_rs_ray.functions.text import winnow_fingerprints_batch

    shared = "the quick brown fox jumps over the lazy dog!"  # 45 >= 23
    b = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["AAAA " + shared + " BBBB",
                          "xyzzy " + shared + " qwert"], pa.string()),
    })
    t = winnow_fingerprints_batch(b)
    fp1 = {f for d, f in zip(t["doc_id"].to_pylist(),
                             t["fp"].to_pylist()) if d == 1}
    fp2 = {f for d, f in zip(t["doc_id"].to_pylist(),
                             t["fp"].to_pylist()) if d == 2}
    assert fp1 & fp2


def test_winnowing_short_doc_empty():
    import pyarrow as pa

    from sophia_rs_ray.functions.text import winnow_fingerprints_batch

    b = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["too short"], pa.string())})
    assert winnow_fingerprints_batch(b).num_rows == 0
