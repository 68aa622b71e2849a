"""Ray-level flagship pipeline tests (uses the session-scoped Ray fixture)."""

import pytest


N = 200


@pytest.fixture(scope="module")
def pages(ray_session):
    from sophia_rs_ray.sources.pages import pages_dataset

    return pages_dataset(N, override_num_blocks=4)


def test_kg_pipeline_matches_oracle(pages):
    from sophia_rs_ray.pipelines.kg import kg_pipeline
    from sophia_rs_ray.sources.pages import oracle_table

    out = kg_pipeline(pages).to_pandas()
    got = set(zip(out["s"], out["p"], out["o"]))
    assert len(got) == len(out), "dedup left duplicates"
    ora = oracle_table(N)
    want = set(zip(ora["s"].to_pylist(), ora["p"].to_pylist(),
                   ora["o"].to_pylist()))
    tp = len(got & want)
    assert tp / len(got) >= 0.95
    assert tp / len(want) >= 0.95
    # sorted by (s, p, o)
    key = list(zip(out["s"], out["p"], out["o"]))
    assert key == sorted(key)


def test_extract_text_distributed(pages):
    from sophia_rs_ray.pipelines.kg import extract_text
    from sophia_rs_ray.sources.pages import page_record

    df = extract_text(pages).to_pandas().set_index("url")["text"]
    for i in (0, 7, 13, 31, 199):
        rec = page_record(i, N)
        assert df[rec["url"]] == rec["text"]


def test_dedup_idempotent_union(pages, ray_session):
    """SetGraph semantics: G ∪ G dedups back to G (api/src/graph.rs:570)."""
    from sophia_rs_ray.pipelines.kg import kg_pipeline
    from sophia_rs_ray.stages.dedup import dedup_triples

    once = kg_pipeline(pages.limit(40), dedup=True, sort=False, keep_url=False)
    doubled = once.union(once)
    again = dedup_triples(doubled, carry_min=())
    n1 = once.count()
    n2 = again.count()
    assert n1 == n2
