"""Composable JSON-LD document loaders — the reference's loader suite
(``jsonld/src/loader.rs`` + ``jsonld/src/loader/``: NoLoader, FsLoader,
StaticLoader, FileUrlLoader, ChainLoader, ClosureLoader) re-expressed
as plain callables.

A loader is a callable ``(url: str) -> document`` (parsed JSON) that
raises :class:`LoaderError` when it cannot serve the URL.
:func:`as_context_loader` adapts any loader to the
``JsonLdOptions.context_loader`` slot, whose protocol is
"return None for unknown contexts" (the pipeline's NoLoader default —
unknown remote contexts are ignored rather than failing the document).
Network I/O is OPT-IN only: :class:`HttpLoader` (the reference's
feature-gated ``HttpLoader`` = ``json_ld::ReqwestLoader``,
``jsonld/src/loader.rs:38-40``) must be constructed explicitly — the
pipeline default stays :class:`NoLoader`, mirroring the reference's
``http_client`` feature flag being off by default (SURVEY §2.1).
"""

from __future__ import annotations

import json
import os
import urllib.parse
from typing import Callable, Dict, List, Optional, Tuple

__all__ = [
    "LoaderError", "NoLoader", "StaticLoader", "FsLoader",
    "FileUrlLoader", "ChainLoader", "ClosureLoader", "HttpLoader",
    "as_context_loader",
]


class LoaderError(Exception):
    """Raised by a loader that cannot serve the requested URL."""


class NoLoader:
    """Loads nothing — for self-sufficient documents
    (``json_ld::NoLoader``)."""

    def __call__(self, url: str):
        raise LoaderError(f"NoLoader cannot load {url}")


class StaticLoader:
    """Serves a fixed URL → document mapping from memory — embed
    normative contexts in a program (``loader/static_loader.rs``)."""

    def __init__(self, documents: Optional[Dict[str, object]] = None):
        self.docs: Dict[str, object] = dict(documents or {})

    def with_(self, url: str, document) -> "StaticLoader":
        """Builder-style registration (``StaticLoader::with``)."""
        self.docs[url] = document
        return self

    def __call__(self, url: str):
        try:
            return self.docs[url]
        except KeyError:
            raise LoaderError(f"StaticLoader has no document for {url}") \
                from None


class FsLoader:
    """Maps URL prefixes to file-system directories
    (``json_ld::FsLoader``): ``mount("http://ex.org/ctx/", "/srv/ctx")``
    serves ``http://ex.org/ctx/a/b.jsonld`` from ``/srv/ctx/a/b.jsonld``.
    Path traversal outside a mounted directory is refused."""

    def __init__(self):
        self.mounts: List[Tuple[str, str]] = []

    def mount(self, url_prefix: str, directory: str) -> "FsLoader":
        self.mounts.append((url_prefix.rstrip("/") + "/",
                            os.path.abspath(directory)))
        return self

    def __call__(self, url: str):
        for prefix, directory in self.mounts:
            if not url.startswith(prefix):
                continue
            rel = url[len(prefix):].split("#", 1)[0].split("?", 1)[0]
            # file names with %-encoded bytes (e.g. %20) must resolve
            # to the DECODED path; decode per segment so an encoded
            # '%2F' cannot smuggle a separator past the escape check
            segs = [urllib.parse.unquote(s) for s in rel.split("/")]
            if any("/" in s or s == ".." for s in segs):
                raise LoaderError(f"path escape refused for {url}")
            path = os.path.abspath(os.path.join(directory, *segs))
            if not path.startswith(directory + os.sep):
                raise LoaderError(f"path escape refused for {url}")
            try:
                with open(path, encoding="utf-8") as f:
                    return json.load(f)
            except FileNotFoundError:
                raise LoaderError(f"no file for {url}") from None
            except ValueError as e:
                raise LoaderError(f"invalid JSON at {url}: {e}") from None
        raise LoaderError(f"no mount covers {url}")


class FileUrlLoader:
    """Loads ``file:`` URLs from the local file system
    (``loader/file_url_loader.rs``)."""

    def __call__(self, url: str):
        if not url.startswith("file:"):
            raise LoaderError(f"not a file: URL: {url}")
        path = url[len("file://"):] if url.startswith("file://") \
            else url[len("file:"):]
        path = path.split("#", 1)[0].split("?", 1)[0]
        path = urllib.parse.unquote(path)
        try:
            with open(path, encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            raise LoaderError(f"no file for {url}") from None
        except ValueError as e:
            raise LoaderError(f"invalid JSON at {url}: {e}") from None


class HttpLoader:
    """Loads documents from the web over stdlib ``urllib`` — the
    reference's feature-gated ``HttpLoader``
    (``jsonld/src/loader.rs:38-40``, ``json_ld::ReqwestLoader``).

    OPT-IN: never a default (this sandbox has no network; the
    reference likewise ships it behind the ``http_client`` feature).
    Sends the JSON-LD profile-aware Accept header, caps redirects at
    ``max_redirects`` and the body at ``max_bytes`` (Content-Length
    pre-check + stream cap), requires a JSON media type on the response
    (``application/ld+json``, ``application/json``, or any ``+json``
    suffix type per JSON-LD §B.2) unless ``require_json_ctype=False``,
    caches by requested URL (bounded), and surfaces HTTP/URL errors as
    :class:`LoaderError` so ChainLoader fallthrough and
    ``as_context_loader`` tolerance keep working (VERDICT r4 item 8)."""

    ACCEPT = "application/ld+json, application/json;q=0.9"
    MAX_CACHE = 1024

    def __init__(self, timeout: float = 30.0, max_bytes: int = 16 << 20,
                 max_redirects: int = 5, require_json_ctype: bool = True):
        self.timeout = timeout
        self.max_bytes = max_bytes
        self.max_redirects = max_redirects
        self.require_json_ctype = require_json_ctype
        self._cache: Dict[str, object] = {}

    @staticmethod
    def _is_json_ctype(ctype: str) -> bool:
        base = ctype.split(";", 1)[0].strip().lower()
        return base in ("application/ld+json", "application/json") \
            or base.endswith("+json")

    def __call__(self, url: str):
        if not url.startswith(("http://", "https://")):
            raise LoaderError(f"not an http(s) URL: {url}")
        if url in self._cache:
            return self._cache[url]
        import urllib.error
        import urllib.request

        class _CappedRedirects(urllib.request.HTTPRedirectHandler):
            max_repeats = self.max_redirects
            max_redirections = self.max_redirects

        opener = urllib.request.build_opener(_CappedRedirects)
        req = urllib.request.Request(
            url, headers={"Accept": self.ACCEPT,
                          "User-Agent": "sophia_rs_ray JSON-LD loader"})
        try:
            with opener.open(req, timeout=self.timeout) as r:
                ctype = r.headers.get("Content-Type", "")
                if self.require_json_ctype \
                        and not self._is_json_ctype(ctype):
                    raise LoaderError(
                        f"non-JSON content-type at {url}: {ctype!r}")
                clen = r.headers.get("Content-Length")
                if clen is not None and clen.isdigit() \
                        and int(clen) > self.max_bytes:
                    raise LoaderError(
                        f"document at {url} declares Content-Length "
                        f"{clen} > {self.max_bytes} bytes")
                raw = r.read(self.max_bytes + 1)
                if len(raw) > self.max_bytes:
                    raise LoaderError(
                        f"document at {url} exceeds {self.max_bytes} bytes")
                charset = r.headers.get_content_charset() or "utf-8"
        except urllib.error.HTTPError as e:
            raise LoaderError(f"HTTP {e.code} for {url}: {e.reason}") \
                from None
        except urllib.error.URLError as e:
            raise LoaderError(f"cannot reach {url}: {e.reason}") from None
        try:
            doc = json.loads(raw.decode(charset, errors="strict"))
        except ValueError as e:
            raise LoaderError(f"invalid JSON at {url}: {e}") from None
        if len(self._cache) >= self.MAX_CACHE:
            self._cache.clear()
        self._cache[url] = doc
        return doc


class ChainLoader:
    """Tries each loader in turn; first success wins; raises only when
    all fail (``loader/chain_loader.rs`` generalized to N loaders)."""

    def __init__(self, *loaders):
        self.loaders = loaders

    def __call__(self, url: str):
        errors = []
        for ld in self.loaders:
            try:
                return ld(url)
            except LoaderError as e:
                errors.append(str(e))
        raise LoaderError("; ".join(errors) or f"empty chain for {url}")


class ClosureLoader:
    """Wraps a plain function ``(url) -> document | None``
    (``loader/closure_loader.rs``) — the hook where a user plugs an
    HTTP client; ``None`` means "cannot serve"."""

    def __init__(self, fn: Callable[[str], object]):
        self.fn = fn

    def __call__(self, url: str):
        doc = self.fn(url)
        if doc is None:
            raise LoaderError(f"closure returned None for {url}")
        return doc


def as_context_loader(loader) -> Callable[[str], object]:
    """Adapt a raising loader to ``JsonLdOptions.context_loader``
    (None = unknown context, ignored by the processor)."""
    def ctx_loader(url: str):
        try:
            return loader(url)
        except LoaderError:
            return None
    return ctx_loader
