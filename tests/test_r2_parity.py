"""Round-2 parity items: JSON-LD @reverse, BCP47 validation, strict
REDUCED semantics (reference jsonld/src/parser.rs, bcp47/src/_tag.rs,
sparql/src/exec.rs:575-595)."""

import pyarrow as pa
import pytest

from sophia_rs_ray.terms import format_term


def _trs(text, base=None):
    from sophia_rs_ray.jsonld import jsonld_to_triples

    trs, err = jsonld_to_triples(text, base)
    assert err is None, err
    return {(format_term(s), format_term(p), format_term(o))
            for (s, p, o, _g) in trs}


def test_jsonld_reverse_node_map():
    got = _trs("""{
      "@id": "http://ex/alice",
      "@reverse": {
        "http://ex/knows": [{"@id": "http://ex/bob"},
                            {"@id": "http://ex/carol"}]
      }
    }""")
    assert ("<http://ex/bob>", "<http://ex/knows>", "<http://ex/alice>") in got
    assert ("<http://ex/carol>", "<http://ex/knows>",
            "<http://ex/alice>") in got


def test_jsonld_reverse_term_definition():
    got = _trs("""{
      "@context": {"children": {"@reverse": "http://ex/parent"}},
      "@id": "http://ex/mom",
      "children": [{"@id": "http://ex/kid1"}, "http://ex/kid2"]
    }""")
    assert ("<http://ex/kid1>", "<http://ex/parent>", "<http://ex/mom>") in got
    assert ("<http://ex/kid2>", "<http://ex/parent>", "<http://ex/mom>") in got


def test_jsonld_reverse_nested_properties():
    got = _trs("""{
      "@id": "http://ex/a",
      "@reverse": {"http://ex/rel": {"@id": "http://ex/b",
                                     "http://ex/name": "B"}}
    }""")
    assert ("<http://ex/b>", "<http://ex/rel>", "<http://ex/a>") in got
    assert ("<http://ex/b>", "<http://ex/name>", '"B"') in got


def test_jsonld_reverse_drops_literals():
    got = _trs("""{
      "@id": "http://ex/a",
      "@reverse": {"http://ex/rel": [{"@value": "nope"}]}
    }""")
    assert not any(p == "<http://ex/rel>" for (_s, p, _o) in got)


def test_bcp47_validation():
    from sophia_rs_ray.bcp47 import is_valid_tag

    for good in ("en", "en-GB", "zh-Hant-CN", "de-CH-1901", "sl-rozaj",
                 "x-private", "i-klingon", "en-GB-oed", "az-Arab-x-AZE",
                 "es-419", "en-a-bbb-x-a-ccc"):
        assert is_valid_tag(good), good
    for bad in ("a", "en--b", "123", "en-", "-en", "tlh-a", "x",
                "i-notgrandfathered"):
        assert not is_valid_tag(bad), bad


def test_bcp47_strict_nt_parse():
    from sophia_rs_ray.ntriples import NtParseError, parse_line

    assert parse_line('<u:s> <u:p> "x"@en-GB .') is not None
    # "a" passes the NT lexical grammar but is not well-formed BCP47
    with pytest.raises(NtParseError, match="BCP47"):
        parse_line('<u:s> <u:p> "x"@a .')
    # lax mode keeps the generalized behavior
    assert parse_line('<u:s> <u:p> "x"@a .', strict=False) is not None


def test_strict_reduced(ray_session):
    import ray.data as rd

    from sophia_rs_ray.sparql.run import select

    rows = [("<u:a>", "<u:p>", '"1"'), ("<u:a>", "<u:p>", '"1"'),
            ("<u:a>", "<u:p>", '"2"'), ("<u:a>", "<u:p>", '"1"')]
    g = rd.from_arrow(pa.table({
        "s": pa.array([r[0] for r in rows], pa.large_string()),
        "p": pa.array([r[1] for r in rows], pa.large_string()),
        "o": pa.array([r[2] for r in rows], pa.large_string())}))
    # DISTINCT collapses to 2; REDUCED (adjacent-only) may keep the
    # non-adjacent repeat → 3 in one block
    dis = select("SELECT DISTINCT ?o WHERE { ?s ?p ?o }", g).take_all()
    red = select("SELECT REDUCED ?o WHERE { ?s ?p ?o }", g).take_all()
    assert len(dis) == 2
    assert len(red) == 3


# -- JsonLdOptions surface (jsonld/src/options.rs:34,177-314) ----------

def test_jsonld_options_context_loader():
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples

    calls = []

    def loader(url):
        calls.append(url)
        if url == "http://ctx.example/v1":
            return {"@context": {"name": "http://schema.org/name"}}
        return None

    doc = ('{"@context": "http://ctx.example/v1", '
           '"@id": "http://e.org/x", "name": "N"}')
    trs, err = jsonld_to_triples(
        doc, options=JsonLdOptions(context_loader=loader))
    assert err is None and len(trs) == 1
    assert trs[0][1][1] == "http://schema.org/name"
    assert calls == ["http://ctx.example/v1"]


def test_jsonld_options_unknown_remote_still_noloader():
    from sophia_rs_ray.jsonld import jsonld_to_triples

    doc = ('{"@context": "http://unknown.example/ctx", '
           '"@id": "http://e.org/x", "name": "N"}')
    trs, err = jsonld_to_triples(doc)
    assert err is None and trs == []  # term drops, NoLoader behavior


def test_jsonld_options_expand_context():
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples

    doc = '{"@id": "http://e.org/x", "name": "N"}'
    opts = JsonLdOptions(
        expand_context={"name": "http://schema.org/name"})
    trs, err = jsonld_to_triples(doc, options=opts)
    assert err is None and trs[0][1][1] == "http://schema.org/name"
    # document's own context still overrides the expand context
    doc2 = ('{"@context": {"name": "http://other.org/name"}, '
            '"@id": "http://e.org/x", "name": "N"}')
    trs2, _ = jsonld_to_triples(doc2, options=opts)
    assert trs2[0][1][1] == "http://other.org/name"


def test_jsonld_options_base():
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples

    doc = '{"@id": "x", "@type": "http://t.example/T"}'
    trs, err = jsonld_to_triples(
        doc, options=JsonLdOptions(base="http://base.example/dir/"))
    assert err is None and trs[0][0][1] == "http://base.example/dir/x"


def test_jsonld_processing_mode_conflict():
    from sophia_rs_ray.jsonld import JsonLdOptions, jsonld_to_triples

    doc = ('{"@context": {"@version": 1.1, '
           '"name": "http://schema.org/name"}, '
           '"@id": "http://e.org/x", "name": "N"}')
    trs, err = jsonld_to_triples(
        doc, options=JsonLdOptions(processing_mode="json-ld-1.0"))
    assert trs == [] and "processing mode conflict" in err
    trs2, err2 = jsonld_to_triples(doc)  # 1.1 default: fine
    assert err2 is None and len(trs2) == 1


def test_jsonld_bad_processing_mode_rejected():
    import pytest

    from sophia_rs_ray.jsonld import JsonLdOptions
    with pytest.raises(ValueError):
        JsonLdOptions(processing_mode="json-ld-2.0")


# --- @nest / @json (JSON-LD 1.1 §4.6.6, §4.2.2) -------------------------

def test_jsonld_nest_literal_keyword():
    got = _trs("""{
      "@id": "http://ex/a",
      "@nest": {"http://ex/p": "v"}
    }""")
    assert got == {("<http://ex/a>", "<http://ex/p>", '"v"')}


def test_jsonld_nest_aliased_term():
    got = _trs("""{
      "@context": {"meta": "@nest", "p": "http://ex/p"},
      "@id": "http://ex/a",
      "meta": [{"p": 1}, {"p": 2}]
    }""")
    assert got == {
        ("<http://ex/a>", "<http://ex/p>",
         '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("<http://ex/a>", "<http://ex/p>",
         '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    }


def test_jsonld_nest_recursive():
    got = _trs("""{
      "@id": "http://ex/a",
      "@nest": {"@nest": {"http://ex/p": {"@id": "http://ex/b"}}}
    }""")
    assert got == {("<http://ex/a>", "<http://ex/p>", "<http://ex/b>")}


def test_jsonld_json_literal_term_type():
    got = _trs("""{
      "@context": {"blob": {"@id": "http://ex/blob", "@type": "@json"}},
      "@id": "http://ex/a",
      "blob": {"z": 1, "a": [true, null]}
    }""")
    rdf_json = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON>"
    assert got == {("<http://ex/a>", "<http://ex/blob>",
                    '"{\\"a\\":[true,null],\\"z\\":1}"^^' + rdf_json)}


def test_jsonld_json_literal_value_object():
    got = _trs("""{
      "@id": "http://ex/a",
      "http://ex/blob": {"@value": [1, 2], "@type": "@json"}
    }""")
    rdf_json = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON>"
    assert got == {("<http://ex/a>", "<http://ex/blob>",
                    '"[1,2]"^^' + rdf_json)}
