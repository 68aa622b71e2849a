"""IRI validation and reference resolution (RFC 3986/3987).

Re-implements the semantics of the reference's ``iri`` crate
(``iri/src/resolve.rs:28-47`` — oxiri-backed strict RFC 3986 §5 resolution;
validation regex in ``iri/src/_regex.rs``): parse via the RFC 3986
appendix-B regex, merge paths per §5.2.3, ``remove_dot_segments`` per
§5.2.4, recompose per §5.3. Strict mode (no backward-compat same-scheme
shortcut), matching oxiri.

Used inside parser/extractor ``map_batches`` stages; resolution is
per-document state (one base IRI per page), so it needs no distributed
coordination.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

# RFC 3986 appendix B
_RFC3986 = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)

# IRI validation: RFC 3987 <ucschar> extends unreserved; we check the
# coarse structure + absence of forbidden chars (whitespace, <>"{}|^`\).
_FORBIDDEN = re.compile(r'[\x00-\x20<>"{}|^`\\]')
_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*$")


def split_iri(iri: str) -> Tuple[Optional[str], Optional[str], str, Optional[str], Optional[str]]:
    """→ (scheme, authority, path, query, fragment); None = absent."""
    m = _RFC3986.match(iri)
    assert m is not None  # the regex matches any string
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), m.group(5)


def is_absolute_iri(text: str) -> bool:
    scheme, _a, _p, _q, _f = split_iri(text)
    return scheme is not None and not _FORBIDDEN.search(text)


def is_valid_iri_ref(text: str) -> bool:
    """Generalized-RDF validity: any IRI reference without forbidden chars."""
    return not _FORBIDDEN.search(text)


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if out:
                out.pop()
        elif path == "/..":
            path = "/"
            if out:
                out.pop()
        elif path in (".", ".."):
            path = ""
        else:
            i = path.find("/", 1)
            if i < 0:
                out.append(path)
                path = ""
            else:
                out.append(path[:i])
                path = path[i:]
    return "".join(out)


def _merge(base_auth: Optional[str], base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base_auth is not None and base_path == "":
        return "/" + ref_path
    i = base_path.rfind("/")
    if i < 0:
        return ref_path
    return base_path[: i + 1] + ref_path


def resolve(base: str, ref: str) -> str:
    """Resolve ``ref`` against absolute ``base`` (RFC 3986 §5.2.2, strict)."""
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)

    if r_scheme is not None:
        scheme, auth, path, query = r_scheme, r_auth, remove_dot_segments(r_path), r_query
    elif r_auth is not None:
        scheme, auth, path, query = b_scheme, r_auth, remove_dot_segments(r_path), r_query
    elif r_path == "":
        scheme, auth, path = b_scheme, b_auth, b_path
        query = r_query if r_query is not None else b_query
    elif r_path.startswith("/"):
        scheme, auth, path, query = b_scheme, b_auth, remove_dot_segments(r_path), r_query
    else:
        scheme, auth = b_scheme, b_auth
        path = remove_dot_segments(_merge(b_auth, b_path, r_path))
        query = r_query

    out = []
    if scheme is not None:
        out += [scheme, ":"]
    if auth is not None:
        out += ["//", auth]
    out.append(path)
    if query is not None:
        out += ["?", query]
    if r_frag is not None:
        out += ["#", r_frag]
    return "".join(out)


class BaseIri:
    """Pre-split base for resolving many refs against one document base
    (the per-document analogue of the reference's ``BaseIri``)."""

    __slots__ = ("text",)

    def __init__(self, text: str):
        if not is_absolute_iri(text):
            raise ValueError(f"not an absolute IRI: {text!r}")
        self.text = text

    def resolve(self, ref: str) -> str:
        if not ref:
            # same-document reference: base without fragment
            s, a, p, q, _ = split_iri(self.text)
            out = f"{s}:"
            if a is not None:
                out += "//" + a
            out += p
            if q is not None:
                out += "?" + q
            return out
        return resolve(self.text, ref)
