"""Deterministic single-pass HTML page extractor.

North-rule stage (not in the reference — SURVEY.md §2.1 "north-rule-only
sources"): pulls four things out of a Common-Crawl-style page in ONE pass
of the stdlib ``html.parser.HTMLParser``:

1. embedded JSON-LD blocks (``<script type="application/ld+json">``),
2. microdata items (itemscope/itemtype/itemprop/itemid),
3. RDFa-Lite statements (vocab/typeof/property/resource/about/content),
4. **visible text** under the byte-identical-per-url invariant
   (BASELINE.json ``input_hint``).

Visible-text spec (the oracle contract — the synthetic page generator
computes the expected text from the same rules without running this
parser):

- content of ``script``/``style``/``template``/``noscript`` and comments
  is invisible;
- every text node is whitespace-normalized (runs of ``\\s+`` → one
  space);
- a *block* boundary is opened/closed by: p, div, li, ul, ol, h1-h6, br,
  tr, table, title, section, article, header, footer, blockquote, pre,
  main, nav, aside, figcaption, span? (NO — span/a/em/strong/b/i are
  inline);
- the page text = ``"\\n".join`` of the non-empty trimmed block texts.

The extractor is pure per-document state → a stateless ``map_batches``
task in the pipeline.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

_WS_RUN = re.compile(r"\s+")

BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 br tr table title section article "
    "header footer blockquote pre main nav aside figcaption td th thead "
    "tbody form".split()
)
SKIP_TAGS = frozenset("script style template noscript".split())
VOID_TAGS = frozenset("br img meta link input hr area base col embed source track wbr".split())


class _MicroItem:
    __slots__ = ("types", "itemid", "props")

    def __init__(self, types: List[str], itemid: Optional[str]):
        self.types = types
        self.itemid = itemid
        self.props: List[Tuple[str, object]] = []  # (name, str | _MicroItem)


class _RdfaNode:
    __slots__ = ("types", "about", "vocab", "props")

    def __init__(self, types: List[str], about: Optional[str], vocab: Optional[str]):
        self.types = types
        self.about = about
        self.vocab = vocab
        self.props: List[Tuple[str, str, object]] = []  # (prop, kind, value)
        # kind ∈ {"literal", "iri", "node"}


class PageExtractor(HTMLParser):
    """One-pass extractor; feed() then read .jsonld_blocks, .micro_items,
    .rdfa_roots, .visible_text()."""

    def __init__(self, collect_text: bool = True) -> None:
        super().__init__(convert_charrefs=True)
        #: the flagship triples path never reads visible_text(); with
        #: collect_text=False text nodes skip block assembly entirely
        #: (prop/ld buffers still fill — they feed structured output)
        self._collect_text = collect_text
        self.jsonld_blocks: List[str] = []
        self.micro_items: List[_MicroItem] = []
        self.rdfa_roots: List[_RdfaNode] = []
        self._blocks: List[str] = []
        self._cur: List[str] = []
        self._skip_depth = 0
        self._in_ldjson = False
        self._ld_buf: List[str] = []
        # stacks
        self._tags: List[str] = []
        self._micro_stack: List[Tuple[int, _MicroItem]] = []
        self._prop_stack: List[Tuple[int, List[str], List[str]]] = []  # (depth, names, buf)
        self._rdfa_stack: List[Tuple[int, _RdfaNode]] = []
        self._rdfa_prop_stack: List[Tuple[int, _RdfaNode, str, List[str]]] = []
        self._vocab_stack: List[Tuple[int, str]] = []

    # -- visible text ---------------------------------------------------

    def _flush_block(self) -> None:
        if not self._cur:
            return
        text = _WS_RUN.sub(" ", "".join(self._cur)).strip()
        if text:
            self._blocks.append(text)
        self._cur = []

    def visible_text(self) -> str:
        return "\n".join(self._blocks)

    # -- parser events --------------------------------------------------

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        a = attrs if type(attrs) is dict else dict(attrs)
        self._tags.append(tag)
        if tag in SKIP_TAGS:
            self._skip_depth += 1
            if tag == "script" and (a.get("type") or "").strip().lower() == "application/ld+json":
                self._in_ldjson = True
                self._ld_buf = []
            return
        if tag in BLOCK_TAGS and self._collect_text:
            self._flush_block()
        if a:  # attr-less tags cannot open microdata/RDFa structure
            # inline the trigger-attr checks: _start_* are no-ops
            # without them, and most attred tags carry neither family
            depth = len(self._tags)
            if "itemscope" in a or "itemprop" in a:
                self._start_microdata(depth, tag, a)
            if "vocab" in a or "typeof" in a or "property" in a:
                self._start_rdfa(depth, tag, a)

    def handle_startendtag(self, tag: str, attrs) -> None:
        a = attrs if type(attrs) is dict else dict(attrs)
        if tag == "br":
            self._flush_block()
            return
        depth = len(self._tags) + 1
        # void elements can carry itemprop/property via content/href/src
        if "itemprop" in a and self._micro_stack and "itemscope" not in a:
            v = self._micro_value_from_attrs(tag, a)
            if v is not None:
                item = self._micro_stack[-1][1]
                for name in a["itemprop"].split():
                    item.props.append((name, v))
        if "property" in a and self._rdfa_stack:
            node = self._rdfa_stack[-1][1]
            if "content" in a:
                for p in a["property"].split():
                    node.props.append((p, "literal", a["content"]))
            elif "href" in a or "src" in a:
                v = a.get("href", a.get("src", ""))
                for p in a["property"].split():
                    node.props.append((p, "iri", v))
        _ = depth

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        tags = self._tags
        # fast path: well-formed close of the innermost element — skip
        # the O(depth) membership scan of the recovery path below
        if tags and tags[-1] == tag:
            depth = len(tags)
            tags.pop()
            if tag in SKIP_TAGS:
                self._skip_depth = max(0, self._skip_depth - 1)
                if tag == "script" and self._in_ldjson:
                    self.jsonld_blocks.append("".join(self._ld_buf))
                    self._in_ldjson = False
            else:
                if tag in BLOCK_TAGS and self._collect_text:
                    self._flush_block()
                if self._micro_stack or self._prop_stack:
                    self._end_microdata(depth)
                if self._rdfa_stack or self._rdfa_prop_stack \
                        or self._vocab_stack:
                    self._end_rdfa(depth)
            return
        # pop back to the matching open tag (tolerate unbalanced HTML)
        if tag not in tags:
            return
        while tags:
            depth = len(tags)
            top = tags.pop()
            if top in SKIP_TAGS:
                self._skip_depth = max(0, self._skip_depth - 1)
                if top == "script" and self._in_ldjson:
                    self.jsonld_blocks.append("".join(self._ld_buf))
                    self._in_ldjson = False
            else:
                if top in BLOCK_TAGS and self._collect_text:
                    self._flush_block()
                self._end_microdata(depth)
                self._end_rdfa(depth)
            if top == tag:
                break

    def handle_data(self, data: str) -> None:
        if self._in_ldjson:
            self._ld_buf.append(data)
            return
        if self._skip_depth:
            return
        if self._collect_text:
            self._cur.append(data)
        if self._prop_stack:
            for _, _, buf in self._prop_stack:
                buf.append(data)
        if self._rdfa_prop_stack:
            for _, _, _, buf in self._rdfa_prop_stack:
                buf.append(data)

    def close(self) -> None:
        super().close()
        # flush any unclosed structure
        while self._tags:
            depth = len(self._tags)
            top = self._tags.pop()
            if top in SKIP_TAGS:
                self._skip_depth = max(0, self._skip_depth - 1)
                if top == "script" and self._in_ldjson:
                    self.jsonld_blocks.append("".join(self._ld_buf))
                    self._in_ldjson = False
            else:
                self._end_microdata(depth)
                self._end_rdfa(depth)
        self._flush_block()

    # -- microdata ------------------------------------------------------

    @staticmethod
    def _micro_value_from_attrs(tag: str, a: Dict[str, str]) -> Optional[str]:
        if "content" in a:
            return a["content"]
        if tag in ("a", "area", "link") and "href" in a:
            return ("@iri", a["href"])  # type: ignore[return-value]
        if tag in ("img", "audio", "video", "embed", "iframe", "source") and "src" in a:
            return ("@iri", a["src"])  # type: ignore[return-value]
        if tag == "time" and "datetime" in a:
            return a["datetime"]
        if tag == "meta":
            return a.get("content", "")
        return None

    def _start_microdata(self, depth: int, tag: str, a: Dict[str, str]) -> None:
        if "itemscope" in a:
            types = (a.get("itemtype") or "").split()
            item = _MicroItem(types, a.get("itemid"))
            if "itemprop" in a and self._micro_stack:
                parent = self._micro_stack[-1][1]
                for name in a["itemprop"].split():
                    parent.props.append((name, item))
            else:
                self.micro_items.append(item)
            self._micro_stack.append((depth, item))
        elif "itemprop" in a and self._micro_stack:
            v = self._micro_value_from_attrs(tag, a)
            names = a["itemprop"].split()
            if v is not None:
                item = self._micro_stack[-1][1]
                for name in names:
                    item.props.append((name, v))
            else:
                self._prop_stack.append((depth, names, []))

    def _end_microdata(self, depth: int) -> None:
        if self._micro_stack and self._micro_stack[-1][0] == depth:
            self._micro_stack.pop()
        if self._prop_stack and self._prop_stack[-1][0] == depth:
            _, names, buf = self._prop_stack.pop()
            value = _WS_RUN.sub(" ", "".join(buf)).strip()
            if self._micro_stack:
                item = self._micro_stack[-1][1]
                for name in names:
                    item.props.append((name, value))

    # -- RDFa Lite ------------------------------------------------------

    def _cur_vocab(self) -> Optional[str]:
        return self._vocab_stack[-1][1] if self._vocab_stack else None

    def _start_rdfa(self, depth: int, tag: str, a: Dict[str, str]) -> None:
        if "vocab" in a:
            self._vocab_stack.append((depth, a["vocab"]))
        if "typeof" in a:
            about = a.get("about", a.get("resource"))
            node = _RdfaNode((a.get("typeof") or "").split(), about, self._cur_vocab())
            if "property" in a and self._rdfa_stack:
                parent = self._rdfa_stack[-1][1]
                for p in a["property"].split():
                    parent.props.append((p, "node", node))
            else:
                self.rdfa_roots.append(node)
            self._rdfa_stack.append((depth, node))
        elif "property" in a and self._rdfa_stack:
            node = self._rdfa_stack[-1][1]
            if "content" in a:
                for p in a["property"].split():
                    node.props.append((p, "literal", a["content"]))
            elif "resource" in a:
                for p in a["property"].split():
                    node.props.append((p, "iri", a["resource"]))
            elif "href" in a:
                for p in a["property"].split():
                    node.props.append((p, "iri", a["href"]))
            else:
                for p in a["property"].split():
                    self._rdfa_prop_stack.append((depth, node, p, []))

    def _end_rdfa(self, depth: int) -> None:
        while self._rdfa_prop_stack and self._rdfa_prop_stack[-1][0] == depth:
            _, node, p, buf = self._rdfa_prop_stack.pop()
            node.props.append((p, "literal", _WS_RUN.sub(" ", "".join(buf)).strip()))
        if self._rdfa_stack and self._rdfa_stack[-1][0] == depth:
            self._rdfa_stack.pop()
        if self._vocab_stack and self._vocab_stack[-1][0] == depth:
            self._vocab_stack.pop()


# ---------------------------------------------------------------------------
# fast tokenizer front end
# ---------------------------------------------------------------------------
# The PageExtractor consumes SAX events, so the stdlib parser is
# replaceable: ``html.parser``'s goahead/parse_starttag is 58% of the
# flagship extract stage's CPU (profiled at bench scale).  This
# tokenizer emits the SAME event stream for well-formed and typical
# malformed HTML (differential-tested against the stdlib parser in
# tests/test_extract_fast.py); anything it cannot tokenize falls back
# to the stdlib path per document.

#: html.parser's CDATA_CONTENT_ELEMENTS — stdlib does NOT raw-text
#: textarea/title, so neither do we (differential parity)
_RAWTEXT_TAGS = frozenset(("script", "style"))
_START_RE = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"                  # tag name
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"              # attr soup
    r"(/?)>", re.S)
_END_RE = re.compile(r"</([a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>", re.S)
_ATTR_RE = re.compile(
    r"""([^\s/>=]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?""", re.S)
_RAW_END: Dict[str, "re.Pattern[str]"] = {}


def _raw_end(tag: str):
    rx = _RAW_END.get(tag)
    if rx is None:
        rx = re.compile(rf"</\s*{tag}[^>]*>", re.I)
        _RAW_END[tag] = rx
    return rx


def _parse_attrs(src: str):
    out = []
    for m in _ATTR_RE.finditer(src):
        name = m.group(1).lower()
        if name == "/":
            continue
        v = m.group(2)
        if v is None:
            out.append((name, None))
            continue
        if v[:1] in ('"', "'") and v[-1:] == v[:1]:
            v = v[1:-1]
        if "&" in v:
            v = unescape(v)
        out.append((name, v))
    return out


#: extraction only consults these attribute names (script's ``type``,
#: microdata item*, RDFa Lite, and the literal-bearing value attrs) —
#: an attr soup with no marker substring cannot change the output, so
#: the tokenizer may skip parsing it entirely (values that merely
#: contain a marker false-positive into the slow path, which is safe)
_RELEVANT_ATTRS = re.compile(
    r"item|prop|typ|vocab|about|resour|content|href|src|datetime", re.I)
_NO_ATTRS: dict = {}
_ATTR_CACHE: Dict[str, dict] = {}


def _attrs_of(soup: str) -> dict:
    """Parsed attrs as a dict (last occurrence wins, same as the
    handlers' own ``dict(attrs)`` over the stdlib event list).

    IMMUTABILITY CONTRACT (ADVICE r4): the returned dict is a shared,
    cached object (``_ATTR_CACHE`` entry or the module-global
    ``_NO_ATTRS``) handed to every subsequent document in the worker
    that repeats the same attr soup.  Handlers must treat it as
    read-only — no ``pop``/``setdefault``/item assignment; a handler
    that needs to mutate must ``dict(a)`` first."""
    v = _ATTR_CACHE.get(soup)
    if v is None:
        v = dict(_parse_attrs(soup)) if _RELEVANT_ATTRS.search(soup) \
            else _NO_ATTRS
        if len(_ATTR_CACHE) < 65536:   # templated pages repeat soups
            _ATTR_CACHE[soup] = v
    return v


#: tag-name lowercase memo: tag spellings repeat endlessly across a
#: worker's documents, so the (scan + alloc) of str.lower runs once per
#: distinct spelling (read-only values; same lifecycle as _ATTR_CACHE)
_TAG_LOWER: Dict[str, str] = {}

#: start tags needing the FULL handle_starttag even with no relevant
#: attrs: skip-content elements (script/style/...), voids (redirect to
#: startendtag), and block tags (text-block flush — only when the
#: caller collects text; the no-text variant omits them)
_SPECIAL_START_TEXT = frozenset(SKIP_TAGS | VOID_TAGS | BLOCK_TAGS)
_SPECIAL_START_NOTEXT = frozenset(SKIP_TAGS | VOID_TAGS)


def _fast_feed(h: PageExtractor, text: str) -> None:
    """Emit handle_starttag/startendtag/endtag/data events like
    ``HTMLParser(convert_charrefs=True).feed`` (charrefs decoded in
    text and attribute values, NOT inside raw-text elements)."""
    pos, n = 0, len(text)
    find = text.find
    handle_data = h.handle_data
    handle_starttag = h.handle_starttag
    handle_endtag = h.handle_endtag
    start_match = _START_RE.match
    end_match = _END_RE.match
    tag_lower = _TAG_LOWER
    tags_list = h._tags
    tags_append = tags_list.append
    # a start tag with NO marker attrs and none of these names reduces
    # to exactly ``self._tags.append(tag)`` in handle_starttag (the
    # micro/RDFa branches are gated on the marker attrs) — inline that
    special_start = _SPECIAL_START_TEXT if h._collect_text \
        else _SPECIAL_START_NOTEXT
    # a data segment only matters while something consumes it (visible
    # text collection, an open itemprop/RDFa literal span, or an
    # ld+json block); otherwise skip the slice + dispatch entirely —
    # the consumer checks are the same ones handle_data itself makes
    collect = h._collect_text
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            if collect or h._in_ldjson or h._prop_stack \
                    or h._rdfa_prop_stack:
                data = text[pos:]
                handle_data(unescape(data) if "&" in data else data)
            break
        if lt > pos and (collect or h._in_ldjson or h._prop_stack
                         or h._rdfa_prop_stack):
            data = text[pos:lt]
            handle_data(unescape(data) if "&" in data else data)
        nxt = text[lt + 1] if lt + 1 < n else ""
        if nxt == "/":
            m = end_match(text, lt)
            if m:
                handle_endtag(m.group(1).lower())
                pos = m.end()
            else:
                gt = find(">", lt)
                pos = n if gt < 0 else gt + 1
        elif nxt.isalpha():
            m = start_match(text, lt)
            if not m:
                handle_data("<")
                pos = lt + 1
                continue
            raw_tag, soup, selfclose = m.group(1, 2, 3)
            tag = tag_lower.get(raw_tag)
            if tag is None:
                if len(tag_lower) >= 4096:
                    tag_lower.clear()
                tag_lower[raw_tag] = tag = raw_tag.lower()
            attrs = _attrs_of(soup) if soup else _NO_ATTRS
            pos = m.end()
            if selfclose:
                h.handle_startendtag(tag, attrs)
                continue
            if attrs is _NO_ATTRS and tag not in special_start:
                tags_append(tag)
                continue
            handle_starttag(tag, attrs)
            if tag in _RAWTEXT_TAGS and tag not in VOID_TAGS:
                m2 = _raw_end(tag).search(text, pos)
                if m2:
                    raw = text[pos:m2.start()]
                    if raw:
                        handle_data(raw)         # CDATA: no unescape
                    handle_endtag(tag)
                    pos = m2.end()
                else:
                    # unterminated raw-text element: stdlib swallows
                    # the buffered content at EOF — match it
                    pos = n
        elif nxt == "!":
            if text.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:                                 # doctype / bogus decl
                gt = find(">", lt)
                pos = n if gt < 0 else gt + 1
        elif nxt == "?":                          # processing instruction
            gt = find(">", lt)
            pos = n if gt < 0 else gt + 1
        else:                                     # lone '<' is text
            handle_data("<")
            pos = lt + 1


def extract_page(html: str, *, engine: str = "fast",
                 want_text: bool = True):
    """Parse one HTML document → (visible_text, jsonld_blocks, micro_items,
    rdfa_roots). Never raises on malformed HTML (best-effort recovery).
    ``engine="stdlib"`` forces the html.parser front end (differential
    testing; the fast tokenizer also falls back to it per document on
    any tokenizer error).  ``want_text=False`` skips visible-text block
    assembly (the triples path never reads it); structured outputs are
    identical either way (differential-pinned in tests)."""
    if engine == "fast":
        p = PageExtractor(collect_text=want_text)
        try:
            _fast_feed(p, html)
            p.close()
            return (p.visible_text(), p.jsonld_blocks, p.micro_items,
                    p.rdfa_roots)
        except Exception:  # noqa: BLE001 — fall back to stdlib parsing
            pass
    p = PageExtractor(collect_text=want_text)
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — malformed page must not kill a batch
        p._flush_block()
    return p.visible_text(), p.jsonld_blocks, p.micro_items, p.rdfa_roots
