"""Round-5 operators: exact-substring duplicate spans."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _brute_spans(texts, K):
    """Brute-force reference: every K-token window with corpus
    multiplicity ≥ 2 marks its position; consecutive positions merge."""
    from sophia_rs_ray.functions.text import tokens_of
    from collections import Counter

    occ = Counter()
    per_doc = []
    for t in texts:
        tk = tokens_of(t or "")
        shs = [" ".join(tk[j:j + K]) for j in range(len(tk) - K + 1)]
        per_doc.append(shs)
        occ.update(shs)
    out = []
    for doc_id, shs in enumerate(per_doc):
        dup = [j for j, s in enumerate(shs) if occ[s] >= 2]
        i = 0
        while i < len(dup):
            j = i
            while j + 1 < len(dup) and dup[j + 1] == dup[j] + 1:
                j += 1
            out.append((doc_id, dup[i], dup[j] + K - dup[i]))
            i = j + 1
    return sorted(out)


def test_dup_spans_matches_brute_force(ray_session, tmp_path):
    """Multi-span docs, mid-doc spans, within-doc repeats and gap
    separation — shapes the sf0.01 oracle corpus never exercises
    (there every flagged doc has exactly one span at position 0)."""
    from sophia_rs_ray.functions.text import SHINGLE_K
    from sophia_rs_ray.pipelines.queries import _dup_spans

    K = SHINGLE_K
    blk = " ".join(f"d{i}" for i in range(K))          # shared 8-gram
    blk2 = " ".join(f"e{i}" for i in range(K + 3))     # shared 11-gram
    uniq = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    texts = [
        f"{blk} {uniq('a', K + 2)} {blk2}",            # two spans, gap
        f"{uniq('b', 5)} {blk} {uniq('c', K + 1)} {blk2} {uniq('f', 3)}",
        uniq("g", 3 * K),                              # no spans
        f"{blk} {blk}",                                # within-doc repeat
        "",                                            # empty
        "short doc",                                   # < K tokens
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["t"] * len(texts), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    got = sorted((r["doc_id"], r["span_start"], r["span_len"])
                 for r in _dup_spans(str(tmp_path)).take_all())
    want = _brute_spans(texts, K)
    assert got == want
    # the corpus must exercise what sf0.01 cannot: >1 span in one doc,
    # a span that does not start at 0, and a within-doc-only duplicate
    docs = {}
    for d, s, L in got:
        docs.setdefault(d, []).append((s, L))
    assert len(docs[0]) == 2
    assert any(s > 0 for spans in docs.values() for s, _ in spans)
    assert 3 in docs and 2 not in docs


def test_tfidf_top_terms_ranking_law(ray_session, tmp_path):
    """Crafted corpus straddling every tie-break level: tf ties broken
    by corpus df (rarer wins), df ties broken by token; docs with
    fewer distinct tokens than TOP_K emit fewer rows."""
    from sophia_rs_ray.pipelines.queries import TFIDF_TOP_K, _tfidf_top_terms

    texts = [
        "apple apple banana banana cherry zebra zebra zebra",
        "banana date date",          # 'banana' df=2, 'date' df=1
        "egg",                       # single-token doc → 1 row
        "",                          # empty doc → 0 rows
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rows = sorted(((r["doc_id"], r["rnk"], r["tok"], r["tf"], r["df"])
                   for r in _tfidf_top_terms(str(tmp_path)).take_all()))
    by_doc = {}
    for d, rnk, tok, tf, df in rows:
        by_doc.setdefault(d, []).append((rnk, tok, tf, df))
    # doc 0: zebra tf=3 first; apple/banana tf=2 tie → banana df=2
    #        loses to apple df=1
    assert [t for _, t, _, _ in sorted(by_doc[0])] == \
        ["zebra", "apple", "banana"]
    # doc 1: date tf=2 first, banana second
    assert [t for _, t, _, _ in sorted(by_doc[1])] == ["banana", "date"] \
        or [t for _, t, _, _ in sorted(by_doc[1])] == ["date", "banana"]
    assert sorted(by_doc[1])[0][1] == "date"
    assert by_doc[2] == [(1, "egg", 1, 1)]
    assert 3 not in by_doc
    assert all(len(v) <= TFIDF_TOP_K for v in by_doc.values())


def test_pagerank_clicks_matches_python_reference(ray_session, tmp_path):
    """Crafted event log: user boundaries cut edges, self-loops and
    null-k events are dropped, dangling (sink) and in-degree-0 (source)
    nodes keep rank rows — checked against a direct Python evaluation
    of the same integer recurrence."""
    import json
    from datetime import datetime

    from sophia_rs_ray.pipelines.queries import (
        PR_ITERS, PR_SCALE, PR_TELEPORT, _pagerank_clicks)

    # user 0: 1→2→3→1 cycle plus 1→4 (4 is a sink / dangling)
    # user 1: 5→1 (5 has in-degree 0), a self-loop 1→1, a null-k event
    seqs = {0: [1, 2, 3, 1, 4], 1: [5, 1, 1, None, 2]}
    rows = []
    eid = 0
    for u, ks in seqs.items():
        for k in ks:
            props = json.dumps({"k": k}) if k is not None else "{}"
            rows.append((eid, datetime(2024, 1, 1), u, "click",
                         0.0, props))
            eid += 1
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows]),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    # reference: edges after null-drop / self-loop-drop / distinct
    edges = set()
    for ks in seqs.values():
        ks = [k for k in ks if k is not None]
        edges |= {(a, b) for a, b in zip(ks, ks[1:]) if a != b}
    assert (1, 1) not in edges and (1, 2) in edges and (5, 1) in edges
    nodes = {n for e in edges for n in e}
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    pr = {n: PR_SCALE for n in nodes}
    for _ in range(PR_ITERS):
        nxt = {n: PR_TELEPORT for n in nodes}
        for s, d in edges:
            nxt[d] += (85 * pr[s]) // (100 * outdeg[s])
        pr = nxt

    got = sorted((r["node"], r["pr"])
                 for r in _pagerank_clicks(str(tmp_path)).take_all())
    assert got == sorted(pr.items())
    assert 4 in dict(got) and 5 in dict(got)      # sink + source kept
    assert dict(got)[5] == PR_TELEPORT            # in-degree-0 floor
