"""RFC 3986 §5 resolution tests — the normative examples of §5.4.1/5.4.2
(the behavior of the reference's oxiri-backed ``iri/src/resolve.rs``)."""

import pytest

from sophia_rs_ray.iri import BaseIri, is_absolute_iri, remove_dot_segments, resolve

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 normal examples
NORMAL = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
]

# RFC 3986 §5.4.2 abnormal examples (strict mode)
ABNORMAL = [
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
    ("http:g", "http:g"),  # strict parser (oxiri behavior)
]


@pytest.mark.parametrize("ref,expected", NORMAL + ABNORMAL)
def test_rfc3986_resolution(ref, expected):
    assert resolve(BASE, ref) == expected


def test_base_iri():
    b = BaseIri("http://example.com/dir/page.html?x=1#frag")
    assert b.resolve("") == "http://example.com/dir/page.html?x=1"
    assert b.resolve("other") == "http://example.com/dir/other"
    assert b.resolve("#f2") == "http://example.com/dir/page.html?x=1#f2"
    with pytest.raises(ValueError):
        BaseIri("relative/path")


def test_validity():
    assert is_absolute_iri("http://ex.org/a")
    assert is_absolute_iri("tag:a")
    assert not is_absolute_iri("nospace here:x")
    assert not is_absolute_iri("/relative")


def test_remove_dot_segments():
    assert remove_dot_segments("/a/b/c/./../../g") == "/a/g"
    assert remove_dot_segments("mid/content=5/../6") == "mid/6"
