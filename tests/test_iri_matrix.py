"""Reference IRI corpus, transcribed from ``iri/src/test.rs``
(sophia_rs): POSITIVE_IRIS (parse structure + validity),
NEGATIVE_IRIS (strict rejection), RELATIVE_IRIS (RFC 3986 §5.4
resolution against ``http://a/b/c/d;p?q``)."""

import pytest

from sophia_rs_ray.iri import is_strict_iri_ref, resolve, split_iri

# (text, (is_absolute, scheme, authority, path, query, fragment))
POSITIVE_IRIS = [
    ("http:", (True, "http", None, "", None, None)),
    ("http://example.org", (True, "http", "example.org", "", None, None)),
    ("http://127.0.0.1", (True, "http", "127.0.0.1", "", None, None)),
    ("http://[::]", (True, "http", "[::]", "", None, None)),
    ("http://%0D", (True, "http", "%0D", "", None, None)),
    ("http://example.org/", (True, "http", "example.org", "/", None, None)),
    ("http://éxample.org/", (True, "http", "éxample.org", "/", None, None)),
    ("http://user:pw@example.org:1234/",
     (True, "http", "user:pw@example.org:1234", "/", None, None)),
    ("http://example.org/foo/bar/baz",
     (True, "http", "example.org", "/foo/bar/baz", None, None)),
    ("http://example.org/foo/bar/",
     (True, "http", "example.org", "/foo/bar/", None, None)),
    ("http://example.org/foo/bar/bàz",
     (True, "http", "example.org", "/foo/bar/bàz", None, None)),
    ("http://example.org/foo/.././/bar",
     (True, "http", "example.org", "/foo/.././/bar", None, None)),
    ("http://example.org/!$&'()*+,=:@/foo%0D",
     (True, "http", "example.org", "/!$&'()*+,=:@/foo%0D", None, None)),
    ("http://example.org/?abc", (True, "http", "example.org", "/", "abc", None)),
    ("http://example.org/?!$&'()*+,=:@/?",
     (True, "http", "example.org", "/", "!$&'()*+,=:@/?", None)),
    ("http://example.org/#def", (True, "http", "example.org", "/", None, "def")),
    ("http://example.org/?abc#def",
     (True, "http", "example.org", "/", "abc", "def")),
    ("tag:abc/def", (True, "tag", None, "abc/def", None, None)),
    ("tag:", (True, "tag", None, "", None, None)),
    ("foo", (False, None, None, "foo", None, None)),
    ("..", (False, None, None, "..", None, None)),
    ("//example.org", (False, None, "example.org", "", None, None)),
    ("?", (False, None, None, "", "", None)),
    ("#", (False, None, None, "", None, "")),
    ("?#", (False, None, None, "", "", "")),
    ("http://example.org/#Andr%C3%A9",
     (True, "http", "example.org", "/", None, "Andr%C3%A9")),
    ("http://example.org/?Andr%C3%A9",
     (True, "http", "example.org", "/", "Andr%C3%A9", None)),
    ("?Andr%C3%A9#Andr%C3%A9",
     (False, None, None, "", "Andr%C3%A9", "Andr%C3%A9")),
]

NEGATIVE_IRIS = [
    "http://[/",
    "http://a/[",
    "http://a/]",
    "http://a/|",
    "http://a/ ",
    "http://a/",
    "[",
    "]",
    "|",
    " ",
    "",
]

# resolved against http://a/b/c/d;p?q (RFC 3986 §5.4.1 + §5.4.2)
RELATIVE_IRIS = [
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
]


@pytest.mark.parametrize("text,want", POSITIVE_IRIS)
def test_positive_structure(text, want):
    scheme, auth, path, query, frag = split_iri(text)
    assert (scheme is not None, scheme, auth, path, query, frag) == want
    assert is_strict_iri_ref(text)


@pytest.mark.parametrize("text", NEGATIVE_IRIS)
def test_negative_rejected(text):
    assert not is_strict_iri_ref(text)


@pytest.mark.parametrize("ref,want", RELATIVE_IRIS)
def test_resolution(ref, want):
    assert resolve("http://a/b/c/d;p?q", ref) == want


# --- relativization (iri/src/relativize.rs relativize2 matrix) ----------

RELATIVIZE2 = [
    ("x://a/b/c?d=e#f", "x://a/b/c?d=e#f", "#f"),
    ("x://a/b/c?d=e#f", "x://a/b/c?d=e#ff", "#ff"),
    ("x://a/b/c?d=e#f", "x://a/b/c?d=e", ""),
    ("x://a/b/c?d=e#f", "x://a/b/c?d=ee", "?d=ee"),
    ("x://a/b/c?d=e#f", "x://a/b/c", "c"),
    ("x://a/b/c?d=e#f", "x://a/b/cc", "cc"),
    ("x://a/b/c?d=e#f", "x://a/b/", "./"),
    ("x://a/b/c?d=e#f", "x://a/bb", "../bb"),
    ("x://a/b/c?d=e#f", "x:o", None),
    ("x://a/b/c?d=e", "x://a/b/c?d=e#f", "#f"),
    ("x://a/b/c?d=e", "x://a/b/c?d=e#ff", "#ff"),
    ("x://a/b/c?d=e", "x://a/b/c?d=e", ""),
    ("x://a/b/c?d=e", "x://a/b/c?d=ee", "?d=ee"),
    ("x://a/b/c?d=e", "x://a/b/c", "c"),
    ("x://a/b/c?d=e", "x://a/b/cc", "cc"),
    ("x://a/b/c?d=e", "x://a/b/", "./"),
    ("x://a/b/c?d=e", "x://a/bb", "../bb"),
    ("x://a/b/c?d=e", "x:o", None),
    ("x://a/b/c", "x://a/b/c?d=e#f", "?d=e#f"),
    ("x://a/b/c", "x://a/b/c?d=e#ff", "?d=e#ff"),
    ("x://a/b/c", "x://a/b/c?d=e", "?d=e"),
    ("x://a/b/c", "x://a/b/c?d=ee", "?d=ee"),
    ("x://a/b/c", "x://a/b/c", ""),
    ("x://a/b/c", "x://a/b/cc", "cc"),
    ("x://a/b/c", "x://a/b/", "./"),
    ("x://a/b/c", "x://a/bb", "../bb"),
    ("x://a/b/c", "x:o", None),
    ("x://a/b/", "x://a/b/c?d=e#f", "c?d=e#f"),
    ("x://a/b/", "x://a/b/c?d=e#ff", "c?d=e#ff"),
    ("x://a/b/", "x://a/b/c?d=e", "c?d=e"),
    ("x://a/b/", "x://a/b/c?d=ee", "c?d=ee"),
    ("x://a/b/", "x://a/b/c", "c"),
    ("x://a/b/", "x://a/b/cc", "cc"),
    ("x://a/b/", "x://a/b/", ""),
    ("x://a/b/", "x://a/bb", "../bb"),
    ("x://a/b/", "x:o", None),
]


@pytest.mark.parametrize("base,iri,exp", RELATIVIZE2)
def test_relativize2(base, iri, exp):
    from sophia_rs_ray.iri import Relativizer

    rel = Relativizer(base, parents=1)
    got = rel.relativize(iri)
    assert got == exp
    if got is not None:
        # round-trip invariant from the reference test
        assert resolve(base, got) == iri
