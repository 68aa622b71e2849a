"""JSON-LD serializer compaction (reference
jsonld/src/serializer/engine.rs options surface): term/CURIE/@vocab
IRI compaction, typed-value and language compaction, @container
@list/@set, compact_arrays.  Correctness gate: every compacted
document reparses (through OUR parser) to the original triples."""

import json

from sophia_rs_ray.terms import bnode, iri, langlit, literal

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
CTX = {
    "@vocab": "http://example.org/ns#",
    "schema": "http://schema.org/",
    "next": {"@id": "http://example.org/ns#next", "@type": "@id"},
    "age": {"@id": "http://schema.org/age", "@type": XSD_INT},
    "tags": {"@id": "http://example.org/ns#tag", "@container": "@set"},
    "items": {"@id": "http://example.org/ns#items",
              "@container": "@list"},
}


def _compact(triples, ctx=CTX, **kw):
    from sophia_rs_ray.jsonld import serialize_jsonld

    return json.loads(serialize_jsonld(triples, context=ctx, **kw))


def _roundtrip(triples, ctx=CTX):
    from sophia_rs_ray.c14n import isomorphic
    from sophia_rs_ray.jsonld import jsonld_to_triples, serialize_jsonld

    text = serialize_jsonld(triples, context=ctx)
    got, err = jsonld_to_triples(text, None)
    assert err is None, err
    want = [(s, p, o, None) for (s, p, o) in triples]
    assert isomorphic(want, got), text
    return text


def test_vocab_and_term_compaction():
    trs = [(iri("http://e/s"), iri("http://example.org/ns#name"),
            literal("Alice")),
           (iri("http://e/s"), iri("http://example.org/ns#next"),
            iri("http://e/t"))]
    doc = _compact(trs)
    assert doc["name"] == "Alice"
    assert doc["next"] == "http://e/t"     # @type: @id → bare string
    _roundtrip(trs)


def test_curie_compaction():
    trs = [(iri("http://e/s"), iri("http://schema.org/jobTitle"),
            literal("dev"))]
    doc = _compact(trs)
    assert doc["schema:jobTitle"] == "dev"
    _roundtrip(trs)


def test_typed_value_compaction():
    trs = [(iri("http://e/s"), iri("http://schema.org/age"),
            literal("42", XSD_INT))]
    doc = _compact(trs)
    assert doc["age"] == "42"              # @type folded by term def
    _roundtrip(trs)


def test_unmatched_datatype_stays_expanded():
    trs = [(iri("http://e/s"), iri("http://example.org/ns#val"),
            literal("42", XSD_INT))]
    doc = _compact(trs)
    assert doc["val"] == {"@value": "42",
                          "@type": "http://www.w3.org/2001/XMLSchema#integer"}
    _roundtrip(trs)


def test_language_literal():
    trs = [(iri("http://e/s"), iri("http://example.org/ns#label"),
            langlit("chat", "fr"))]
    doc = _compact(trs)
    assert doc["label"] == {"@value": "chat", "@language": "fr"}
    _roundtrip(trs)


def test_type_key_compaction():
    trs = [(iri("http://e/s"),
            iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
            iri("http://schema.org/Person"))]
    doc = _compact(trs)
    assert doc["@type"] == "schema:Person"
    _roundtrip(trs)


def test_set_container_keeps_array():
    trs = [(iri("http://e/s"), iri("http://example.org/ns#tag"),
            literal("a"))]
    doc = _compact(trs)
    assert doc["tags"] == ["a"]
    _roundtrip(trs)


def test_list_container_folds_chain():
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    l1, l2 = bnode("l1"), bnode("l2")
    trs = [
        (iri("http://e/s"), iri("http://example.org/ns#items"), l1),
        (l1, iri(RDF + "first"), literal("a")),
        (l1, iri(RDF + "rest"), l2),
        (l2, iri(RDF + "first"), literal("b")),
        (l2, iri(RDF + "rest"), iri(RDF + "nil")),
    ]
    doc = _compact(trs)
    assert doc["items"] == ["a", "b"]      # @container:@list absorbs
    _roundtrip(trs)


def test_compact_arrays_false():
    trs = [(iri("http://e/s"), iri("http://example.org/ns#name"),
            literal("Alice"))]
    doc = _compact(trs, compact_arrays=False)
    assert doc["name"] == ["Alice"]


def test_multi_node_graph_and_roundtrip():
    trs = [(iri("http://e/a"), iri("http://example.org/ns#name"),
            literal("A")),
           (iri("http://e/b"), iri("http://example.org/ns#name"),
            literal("B")),
           (iri("http://e/a"), iri("http://example.org/ns#next"),
            iri("http://e/b"))]
    doc = _compact(trs)
    assert len(doc["@graph"]) == 2
    _roundtrip(trs)


def test_expanded_default_unchanged():
    from sophia_rs_ray.jsonld import serialize_jsonld

    trs = [(iri("http://e/s"), iri("http://example.org/ns#name"),
            literal("Alice"))]
    doc = json.loads(serialize_jsonld(trs))
    assert isinstance(doc, list) and doc[0]["@id"] == "http://e/s"


# --- r3 ADVICE regressions -------------------------------------------------

def test_compactor_vocab_after_term_definition():
    """A term WITHOUT @id defined before '@vocab' in insertion order
    must still get its vocab-expanded @id (first-pass resolution)."""
    from sophia_rs_ray.jsonld import _Compactor

    ctx = {"name": {"@type": "http://www.w3.org/2001/XMLSchema#string"},
           "@vocab": "http://ex.org/"}
    comp = _Compactor(ctx)
    assert comp.defs["name"]["@id"] == "http://ex.org/name"
    assert comp.iri("http://ex.org/name") == "name"


def test_compactor_curie_term_id_expands_against_prefix():
    from sophia_rs_ray.jsonld import _Compactor

    ctx = {"n": {"@id": "ex:n"}, "ex": "http://ex.org/"}
    comp = _Compactor(ctx)
    assert comp.defs["n"]["@id"] == "http://ex.org/n"
    assert comp.iri("http://ex.org/n") == "n"


def test_compactor_key_collision_falls_back_to_full_iri():
    """Two distinct predicates whose compacted keys collide must not
    merge: the later one keeps its full IRI key."""
    from sophia_rs_ray.jsonld import _Compactor

    ctx = {"@vocab": "http://a.org/", "p": "http://b.org/"}
    comp = _Compactor(ctx)
    node = {"@id": "http://ex.org/s",
            "http://b.org/q": ["x"],       # CURIE-compacts to 'p:q'
            "http://a.org/p:q": ["y"]}     # vocab suffix is 'p:q' too
    out = comp.node(node)
    assert sorted(out) == ["@id", "http://a.org/p:q", "p:q"]
    assert out["p:q"] == "x"
    assert out["http://a.org/p:q"] == "y"
