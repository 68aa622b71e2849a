"""URL canonicalization goldens (functions/url.py)."""

import pyarrow as pa
import pytest

from sophia_rs_ray.functions.url import normalize_url, normalize_url_batch

CASES = [
    # scheme/host case, default port, fragment, dot segments, query sort
    ("HTTP://Example.COM:80/a/../b?b=2&a=1#frag", "http://example.com/b?a=1&b=2"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com./p", "http://example.com/p"),
    # percent-normalization: hex case, unreserved decode, reserved kept
    ("http://example.com/%7euser/%41%2Fb", "http://example.com/~user/A%2Fb"),
    ("http://example.com/a%3fb", "http://example.com/a%3Fb"),
    # dot segments
    ("http://example.com/a/b/../../c/./d", "http://example.com/c/d"),
    ("http://example.com/../x", "http://example.com/x"),
    # query edge cases: empty query dropped, duplicates kept sorted
    ("http://example.com/p?", "http://example.com/p"),
    ("http://example.com/p?z=1&z=0&a=2", "http://example.com/p?a=2&z=0&z=1"),
    # userinfo preserved, host after @ lowercased
    ("http://User:p@EXAMPLE.com/x", "http://User:p@example.com/x"),
    # ws/wss default ports
    ("wss://Example.com:443/ws", "wss://example.com/ws"),
    # idempotence fodder
    ("http://example.com/b?a=1&b=2", "http://example.com/b?a=1&b=2"),
]


@pytest.mark.parametrize("url,want", CASES)
def test_normalize_url(url, want):
    assert normalize_url(url) == want


@pytest.mark.parametrize("url,want", CASES)
def test_idempotent(url, want):
    assert normalize_url(want) == want


def test_unparseable_is_none():
    assert normalize_url("not a url") is None
    assert normalize_url("mailto:a@b.c") is None  # no ://
    assert normalize_url("") is None


def test_batch_kernel():
    b = pa.table({"url": pa.array(
        ["HTTP://A.com:80/x", None, "junk"], pa.string())})
    out = normalize_url_batch(b)
    assert out["url_norm"].to_pylist() == ["http://a.com/x", None, None]
    assert out.column_names == ["url", "url_norm"]


def test_url_dedup_pipeline(ray_session):
    """3 messy spellings per page URL collapse to one canonical row."""
    from sophia_rs_ray.pipelines.queries import registry

    fn, _ = registry()["url_dedup"]
    rows = fn("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    assert all(r["n_variants"] == 3 for r in rows)
    assert all(r["url_norm"].startswith("https://site") for r in rows)
    assert all(r["url_norm"].endswith("?a=1&b=2") for r in rows)
