"""Registry fuzz: every DuckDB-oracled documents-table operator is run
over RANDOM adversarial corpora — unicode (precomposed and combining),
empty and whitespace-only texts, exact and near duplicates, PII-laden
strings, stopword-rich multilingual soup — not just the fixed driver
testdata.  The oracle SQL runs over the same random parquet, so any
divergence is a real Ray-side/SQL-side semantics drift."""

import math
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOC_QUERIES = [
    "token_counts", "quality_features", "repetition_features",
    "dedup_exact_docs", "normalize_docs", "pii_redact", "novel_bigrams",
    "source_stats", "segment_dedup", "stratified_sample", "simhash_docs",
    "lang_id", "vocab_top_terms", "quality_filter", "winnow_fingerprints",
    "minhash_bands", "near_dup_clusters", "ngram_jaccard",
    "decontaminate_docs", "pack_sequences", "nt_file_roundtrip",
    "source_mixture", "dup_span_docs", "tfidf_top_terms",
    "lm_score", "chunk_docs", "dsir_weights", "vocab_hll",
    "heavy_hitters_cms", "clean_corpus",
]

_WORDS = ("the of and to a in is that it for le la les de et un une "
          "table row scan batch value käse héllo naïve éclair "
          "☃snow Данные 数据 word0 word1 word2 word3").split()
_SPECIALS = ["user@ex.com", "10.2.3.44", "123456789012", "a.b@c.io"]
_SEEDS = range(6)


def _random_corpus(rng, n):
    texts = []
    for i in range(n):
        r = rng.random()
        if r < 0.03:
            texts.append(None)  # null text ≡ '' by the engine contract
            continue
        if r < 0.05:
            texts.append("")
            continue
        if r < 0.10 and texts:
            texts.append(rng.choice([t for t in texts if t is not None]
                                    or [""]))  # exact duplicate
            continue
        # a third of the docs run long so threshold-type filters
        # (n_chars > 300 …) select non-trivial subsets
        k = rng.randint(50, 200) if rng.random() < 0.45 \
            else rng.randint(1, 50)
        toks = [rng.choice(_WORDS) for _ in range(k)]
        if rng.random() < 0.3:
            toks.insert(rng.randrange(len(toks) + 1),
                        rng.choice(_SPECIALS))
        if r < 0.18 and texts and texts[-1]:  # (None is falsy: skipped)
            # near-duplicate of the previous doc
            base = texts[-1].split()
            if base:
                base[rng.randrange(len(base))] = rng.choice(_WORDS)
                toks = base
        sep = rng.choice([" ", " ", " ", "  ", "\t", "\n"])
        texts.append(sep.join(toks))
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array([rng.choice(["en", "fr", "de"])
                          for _ in range(n)]),
        "source": pa.array([f"src{rng.randint(0, 2)}" for _ in range(n)]),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    })


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    out = {}
    for seed in _SEEDS:
        rng = random.Random(4000 + seed)
        d = tmp_path_factory.mktemp(f"fuzz{seed}")
        pq.write_table(_random_corpus(rng, rng.randint(20, 90)),
                       d / "documents.parquet")
        out[seed] = str(d)
    return out


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("name", DOC_QUERIES)
def test_doc_query_matches_oracle_on_random_corpus(
        name, seed, corpora, ray_session):
    import duckdb

    from sophia_rs_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    sf_dir = corpora[seed]

    got = fn(sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    got = got[sorted(got.columns)]
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.execute(sql).fetchdf()
    want = want[sorted(want.columns)]
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)

    assert list(got.columns) == list(want.columns), f"{name}[{seed}]"
    assert len(got) == len(want), (
        f"{name}[{seed}]: {len(got)} rows != {len(want)}")
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        if a and isinstance(a[0], float):
            ok = all((math.isnan(x) and math.isnan(y))
                     or math.isclose(x, y, rel_tol=1e-12, abs_tol=1e-12)
                     for x, y in zip(a, b))
            assert ok, f"{name}[{seed}].{c} differs"
        else:
            assert a == b, f"{name}[{seed}].{c} differs"


# ---------------------------------------------------------------------------
# skew corpora: hot-key inputs (>10x skew on one bigram / segment /
# source / duplicate doc) so the block-level cap combiners
# (novel_bigrams cap_pairs, segment_dedup cap_dups, minhash band hub
# cap) are exercised by the oracle harness, not just uniform data
# ---------------------------------------------------------------------------

SKEW_QUERIES = [
    "novel_bigrams", "segment_dedup", "minhash_bands",
    "near_dup_clusters", "source_stats", "vocab_top_terms",
    "dedup_exact_docs", "token_counts", "stratified_sample",
    "source_mixture",
    # round-5 continuation: skew (hub tokens / dup-heavy docs) is the
    # adversarial shape for count-trained models and content-keyed
    # dedup exchanges
    "lm_score", "dsir_weights", "vocab_hll", "heavy_hitters_cms",
    "clean_corpus",
]
_SKEW_SEEDS = range(3)


def _skew_corpus(rng, n):
    hot_phrase = "hot key " * rng.randint(6, 12)  # one dominant bigram
    hot_paragraph = " ".join(rng.choice(_WORDS) for _ in range(40))
    dup_doc = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(60,
                                                                     120)))
    texts = []
    for i in range(n):
        r = rng.random()
        if r < 0.25:
            texts.append(dup_doc)  # one doc duplicated across the corpus
            continue
        k = rng.randint(40, 200) if rng.random() < 0.5 \
            else rng.randint(1, 40)
        toks = [rng.choice(_WORDS) for _ in range(k)]
        body = " ".join(toks)
        if r < 0.75:
            body = hot_phrase + body  # >10x-hot bigram in most docs
        if rng.random() < 0.5:
            body = body + " " + hot_paragraph  # hot segment
        texts.append(body)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array([rng.choice(["en", "fr", "de"])
                          for _ in range(n)]),
        # 90% of docs land in one source
        "source": pa.array(["src0" if rng.random() < 0.9
                            else f"src{rng.randint(1, 2)}"
                            for _ in range(n)]),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    })


@pytest.fixture(scope="module")
def skew_corpora(tmp_path_factory):
    out = {}
    for seed in _SKEW_SEEDS:
        rng = random.Random(11000 + seed)
        d = tmp_path_factory.mktemp(f"skew{seed}")
        pq.write_table(_skew_corpus(rng, rng.randint(40, 120)),
                       d / "documents.parquet")
        out[seed] = str(d)
    return out


@pytest.mark.parametrize("seed", _SKEW_SEEDS)
@pytest.mark.parametrize("name", SKEW_QUERIES)
def test_doc_query_matches_oracle_on_skew_corpus(
        name, seed, skew_corpora, ray_session):
    from sophia_rs_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    _compare(name, seed, fn, sql, skew_corpora[seed], ["documents"], 1e-9)


# ---------------------------------------------------------------------------
# events-table and embeddings-table oracled queries over random inputs
# ---------------------------------------------------------------------------

EVENT_QUERIES = ["events_hourly", "user_sessions", "clicks_asof_view",
                 "events_rolling_1h", "events_props_k"]
EMB_QUERIES = ["knn_cosine", "knn_self_join", "embedding_near_dup",
               "semdedup_docs"]
_TYPES = ["click", "view", "purchase", "signup", "error"]


def _random_events(rng, n):
    recs = []
    for i in range(n):
        props = rng.choice([
            '{"k": %d}' % rng.randint(0, 99),
            '{ "k" : %d }' % rng.randint(0, 99),      # json.loads fallback
            '{"k": %d, "j": {"x": 1}}' % rng.randint(0, 99),
        ])
        recs.append((i,
                     rng.randint(0, 3 * 86400) * 1_000_000,
                     rng.randint(0, 5),
                     rng.choice(_TYPES),
                     # nulls contribute 0 by the engine/oracle contract
                     None if rng.random() < 0.15
                     else rng.randint(0, 99999) / 100.0,
                     props))
    return pa.table({
        "event_id": pa.array([r[0] for r in recs], pa.int64()),
        "ts": pa.array([r[1] for r in recs], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in recs], pa.int64()),
        "event_type": pa.array([r[3] for r in recs]),
        "value": pa.array([r[4] for r in recs], pa.float64()),
        "props": pa.array([r[5] for r in recs]),
    })


def _random_embeddings(rng, n, dim=8):
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(
            [None if i > 0 and rng.random() < 0.08 else
             [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
             for i in range(n)], pa.list_(pa.float32())),
        "label": pa.array([rng.randint(0, 3) for _ in range(n)],
                          pa.int32()),
    })


@pytest.fixture(scope="module")
def mixed_corpora(tmp_path_factory):
    out = {}
    for seed in _SEEDS:
        rng = random.Random(7000 + seed)
        d = tmp_path_factory.mktemp(f"mfuzz{seed}")
        pq.write_table(_random_events(rng, rng.randint(10, 90)),
                       d / "events.parquet")
        pq.write_table(_random_embeddings(rng, rng.randint(15, 60)),
                       d / "embeddings.parquet")
        out[seed] = str(d)
    return out


def _compare(name, seed, fn, sql, sf_dir, tables, float_tol):
    import duckdb

    raw = fn(sf_dir)
    got = raw.to_pandas() if hasattr(raw, "to_pandas") else raw
    if len(got) == 0 and len(got.columns) == 0 and hasattr(raw, "schema"):
        # Ray's to_pandas drops columns of 0-row datasets even when the
        # dataset itself still carries a schema
        sch = raw.schema()
        if sch is not None:
            import pandas as pd
            got = pd.DataFrame({n: [] for n in sch.names})
    got = got[sorted(got.columns)]
    got = got.sort_values(by=list(got.columns)).reset_index(drop=True)

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(sql).fetchdf()
    want = want[sorted(want.columns)]
    want = want.sort_values(by=list(want.columns)).reset_index(drop=True)

    if len(want) == 0 and len(got) == 0 and len(got.columns) == 0:
        # Ray keeps NO schema on zero-block datasets: empty-vs-empty
        # is a match, the projected column names are unrecoverable
        return
    assert list(got.columns) == list(want.columns), f"{name}[{seed}]"
    assert len(got) == len(want), (
        f"{name}[{seed}]: {len(got)} rows != {len(want)}")
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        if a and isinstance(a[0], float):
            ok = all((math.isnan(x) and math.isnan(y))
                     or math.isclose(x, y, rel_tol=float_tol,
                                     abs_tol=float_tol)
                     for x, y in zip(a, b))
            assert ok, f"{name}[{seed}].{c} differs"
        else:
            assert a == b, f"{name}[{seed}].{c} differs"


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_query_matches_oracle_on_random_events(
        name, seed, mixed_corpora, ray_session):
    from sophia_rs_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    _compare(name, seed, fn, sql, mixed_corpora[seed], ["events"], 1e-9)


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_query_matches_oracle_on_random_vectors(
        name, seed, mixed_corpora, ray_session):
    from sophia_rs_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    # sims round to 4dp on both sides; 1e-9 tolerates double-sum order
    _compare(name, seed, fn, sql, mixed_corpora[seed],
             ["embeddings"], 1e-9)


# ---------------------------------------------------------------------------
# relational (TPC-H-ish) oracled queries over random consistent tables
# ---------------------------------------------------------------------------

REL_QUERIES = ["tpch_q1", "customers_per_region", "orders_per_segment",
               "customers_without_orders", "large_parts_in_lineitem",
               "top_orders_by_revenue", "nations_per_region_concat",
               "customer_ancestors", "price_median_by_flag"]
REL_TABLES = ["region", "nation", "customer", "orders", "lineitem",
              "part"]
_SEGS_MKT = ["BUILDING", "MACHINERY", "AUTOMOBILE"]


def _random_tpch(rng):
    nreg, nnat = rng.randint(1, 4), rng.randint(2, 8)
    ncust, nord = rng.randint(3, 40), rng.randint(0, 60)
    npart, nline = rng.randint(2, 25), rng.randint(0, 120)
    region = pa.table({
        "r_regionkey": pa.array(range(nreg), pa.int32()),
        "r_name": pa.array([f"R{i}" for i in range(nreg)]),
    })
    nation = pa.table({
        "n_nationkey": pa.array(range(nnat), pa.int32()),
        "n_name": pa.array([f"N{i}" for i in range(nnat)]),
        "n_regionkey": pa.array(
            [rng.randrange(nreg) for _ in range(nnat)], pa.int32()),
    })
    customer = pa.table({
        "c_custkey": pa.array(range(ncust), pa.int64()),
        "c_name": pa.array([f"C{i}" for i in range(ncust)]),
        "c_nationkey": pa.array(
            [rng.randrange(nnat) for _ in range(ncust)], pa.int32()),
        "c_acctbal": pa.array(
            [rng.randint(-999999, 999999) / 100 for _ in range(ncust)],
            pa.float64()),
        "c_mktsegment": pa.array(
            [rng.choice(_SEGS_MKT) for _ in range(ncust)]),
    })
    orders = pa.table({
        "o_orderkey": pa.array(range(nord), pa.int64()),
        "o_custkey": pa.array(
            [rng.randrange(ncust) for _ in range(nord)], pa.int64()),
        "o_orderstatus": pa.array(
            [rng.choice("OFP") for _ in range(nord)]),
        "o_totalprice": pa.array(
            [rng.randint(0, 9999999) / 100 for _ in range(nord)],
            pa.float64()),
        "o_orderdate": pa.array(
            [rng.randint(0, 3650) * 86400_000_000 for _ in range(nord)],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(
            [rng.choice(["1-URGENT", "3-MEDIUM", "5-LOW"])
             for _ in range(nord)]),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(
            [rng.randrange(max(nord, 1)) for _ in range(nline)],
            pa.int64()),
        "l_partkey": pa.array(
            [rng.randrange(npart) for _ in range(nline)], pa.int64()),
        "l_suppkey": pa.array(
            [rng.randrange(5) for _ in range(nline)], pa.int64()),
        "l_linenumber": pa.array(
            [rng.randint(1, 7) for _ in range(nline)], pa.int32()),
        "l_quantity": pa.array(
            [float(rng.randint(1, 50)) for _ in range(nline)],
            pa.float64()),
        "l_extendedprice": pa.array(
            [rng.randint(100, 9999999) / 100 for _ in range(nline)],
            pa.float64()),
        "l_discount": pa.array(
            [rng.randint(0, 10) / 100 for _ in range(nline)],
            pa.float64()),
        "l_tax": pa.array(
            [rng.randint(0, 8) / 100 for _ in range(nline)],
            pa.float64()),
        "l_returnflag": pa.array([rng.choice("ARN") for _ in range(nline)]),
        "l_linestatus": pa.array([rng.choice("OF") for _ in range(nline)]),
        "l_shipdate": pa.array(
            [rng.randint(0, 3650) * 86400_000_000 for _ in range(nline)],
            pa.timestamp("us")),
    })
    part = pa.table({
        "p_partkey": pa.array(range(npart), pa.int64()),
        "p_name": pa.array([f"P{i}" for i in range(npart)]),
        "p_brand": pa.array(
            [f"B{rng.randint(0, 3)}" for _ in range(npart)]),
        "p_type": pa.array(
            [rng.choice(["STEEL", "BRASS", "TIN"]) for _ in range(npart)]),
        "p_size": pa.array(
            [rng.randint(1, 50) for _ in range(npart)], pa.int32()),
        "p_retailprice": pa.array(
            [rng.randint(100, 200000) / 100 for _ in range(npart)],
            pa.float64()),
    })
    return {"region": region, "nation": nation, "customer": customer,
            "orders": orders, "lineitem": lineitem, "part": part}


@pytest.fixture(scope="module")
def tpch_corpora(tmp_path_factory):
    out = {}
    for seed in _SEEDS:
        rng = random.Random(9000 + seed)
        d = tmp_path_factory.mktemp(f"tfuzz{seed}")
        for name, tab in _random_tpch(rng).items():
            pq.write_table(tab, d / f"{name}.parquet")
        out[seed] = str(d)
    return out


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("name", REL_QUERIES)
def test_relational_query_matches_oracle_on_random_tables(
        name, seed, tpch_corpora, ray_session):
    from sophia_rs_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    _compare(name, seed, fn, sql, tpch_corpora[seed], REL_TABLES, 1e-9)


# ---------------------------------------------------------------------------
# KG / SPARQL oracled queries over random documents (the derived-KG
# family: doc_triples and everything downstream of it)
# ---------------------------------------------------------------------------

KG_QUERIES = [
    "doc_triples", "triples_dedup", "subjects_distinct",
    "predicate_count", "triples_matching", "resource_view",
    "sort_spo_limit", "indexed_pattern_scan", "rdfs_entailment",
    "rdfs_entailment_full", "rdf_entailment", "turtle_roundtrip",
    "rdfxml_roundtrip", "jsonld_roundtrip", "jsonld_compact_roundtrip",
    "c14n_normalize", "gazetteer_mentions", "entity_dedup",
    "graph_literals", "graph_remove_matching", "sparql_bgp_filter",
    "sparql_subquery", "sparql_group_agg", "sparql_optional",
    "sparql_union_distinct", "sparql_minus", "sparql_order_slice",
    "sparql_extend_fns", "sparql_text_select", "sparql_text_construct",
    "sparql_agg_noexplicit_group", "sparql_path_negated",
    "sparql_having", "sparql_group_expr", "sparql_construct_where",
    "sparql_describe",
]


@pytest.mark.parametrize("seed", _SEEDS)
@pytest.mark.parametrize("name", KG_QUERIES)
def test_kg_query_matches_oracle_on_random_corpus(
        name, seed, corpora, ray_session):
    from sophia_rs_ray.pipelines.queries import registry

    fn, sql = registry()[name]
    _compare(name, seed, fn, sql, corpora[seed], ["documents"], 1e-9)
