"""URL canonicalization for web-corpus pipelines (training-data op).

Common-Crawl-style corpora dedup at the URL level before content-level
near-dup: two fetches of ``HTTP://Example.COM:80/a/../b?b=2&a=1#frag``
and ``http://example.com/b?a=1&b=2`` are the same page.  This module
implements RFC 3986 §6.2 syntax-based normalization plus the usual
crawl-dedup conventions (fragment drop, query-param sort) as a pure
function and a vectorized ``map_batches`` kernel.

Reference parity note: sophia_rs normalizes IRIs only via resolution
(``iri/src/resolve.rs``); URL canonicalization is a beyond-reference
training-data op (SURVEY §2 "beyond" list).  Kept separate from
``iri.py``, which implements the RFC-3987 *generic* syntax the
reference needs.

Normalization steps (applied in order):
1. lowercase scheme and host; strip a trailing ``.`` from the host
2. uppercase hex in percent-escapes, then decode escapes of
   *unreserved* characters (``%41`` → ``A``)
3. remove dot segments from the path (RFC 3986 §5.2.4)
4. drop default ports (http:80, https:443, ftp:21)
5. empty path → ``/`` when an authority is present
6. sort query parameters bytewise (stable; duplicates kept), drop a
   bare trailing ``?``
7. drop the fragment
"""

from __future__ import annotations

import re
from typing import List, Optional

import pyarrow as pa

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<auth>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$")
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")
_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80",
                  "wss": "443"}
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


def _fix_pct(text: str) -> str:
    """Uppercase escape hex; decode escapes of unreserved chars."""
    def sub(m: "re.Match[str]") -> str:
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT.sub(sub, text)


def normalize_url(url: str) -> Optional[str]:
    """Canonical form of an absolute http(s)/ftp/ws URL, or None when
    the input doesn't parse as ``scheme://authority…``."""
    m = _URL_RE.match(url.strip())
    if m is None:
        return None
    scheme = m.group("scheme").lower()
    auth = m.group("auth")
    userinfo = ""
    if "@" in auth:
        userinfo, auth = auth.rsplit("@", 1)
        userinfo += "@"
    if ":" in auth:
        host, _, port = auth.rpartition(":")
        if port.isdigit():
            port = str(int(port)) if port else ""
            if _DEFAULT_PORTS.get(scheme) == port:
                port = ""
    else:
        host, port = auth, ""
    # a single trailing dot on the HOST is a root-label artifact; strip
    # it before the port is re-attached (RFC 3986 §3.2.2 equivalence)
    host = host.lower()
    if host.endswith("."):
        host = host[:-1]
    host_port = host + (":" + port if port else "")
    from ..iri import remove_dot_segments

    path = remove_dot_segments(_fix_pct(m.group("path") or ""))
    if not path:
        path = "/"
    query = m.group("query")
    if query:
        parts = sorted(_fix_pct(query).split("&"))
        query = "&".join(p for p in parts if p)
    out = f"{scheme}://{userinfo}{host_port}{path}"
    if query:
        out += "?" + query
    return out


def normalize_url_batch(b: pa.Table, *, col: str = "url",
                        out_col: str = "url_norm") -> pa.Table:
    """(…, url) → (…, url_norm); unparseable URLs → null."""
    urls: List[Optional[str]] = b[col].to_pylist()
    normed = [normalize_url(u) if u is not None else None for u in urls]
    return b.append_column(out_col, pa.array(normed, pa.string()))
