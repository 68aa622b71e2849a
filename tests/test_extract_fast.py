"""Differential gate for the fast HTML tokenizer: on the synthetic
page corpus AND a malformed-HTML gauntlet, the fast front end must
produce byte-identical extraction output (visible text, JSON-LD
blocks, microdata, RDFa) to the stdlib ``html.parser`` front end."""

import pyarrow as pa
import pytest

from sophia_rs_ray.extract.html_page import extract_page


def _norm(result):
    text, ld, micro, rdfa = result

    def mi(item):
        return (tuple(item.types), item.itemid,
                tuple((n, mi(v) if hasattr(v, "props") else v)
                      for n, v in item.props))

    def rn(node):
        return (tuple(node.types), node.about, node.vocab,
                tuple((p, k, rn(v) if hasattr(v, "props") else v)
                      for p, k, v in node.props))

    return (text, tuple(ld), tuple(mi(i) for i in micro),
            tuple(rn(r) for r in rdfa))


def _both(html):
    return (_norm(extract_page(html, engine="fast")),
            _norm(extract_page(html, engine="stdlib")))


def test_synthetic_corpus_identical():
    from sophia_rs_ray.sources.pages import gen_pages_batch

    batch = gen_pages_batch(
        pa.table({"id": pa.array(range(500), pa.int64())}), 5000)
    for raw in batch["html"].to_pylist():
        html = bytes(raw).decode("utf-8") \
            if isinstance(raw, (bytes, bytearray)) else raw
        fast, std = _both(html)
        assert fast == std


GAUNTLET = [
    "",
    "plain text only",
    "<p>unclosed paragraph",
    "<p>a<p>b</p>",
    "<div><span>x</span> &amp; <b>y</b></div>",
    "<ul><li>one<li>two</ul>",
    "<script>var a = '<div>not text</div>';</script><p>after</p>",
    '<script type="application/ld+json">{"@id": "x", "v": "a&b"}'
    "</script>",
    "<style>p::before{content:'<'}</style><p>t</p>",
    "<!-- comment with <p>tag</p> --><p>real</p>",
    "<!DOCTYPE html><html><body><p>x</p></body></html>",
    "<p>1 < 2 and 3 > 2</p>",
    "<p title=\"a>b\">quoted gt</p>",
    "<p title='a\"b'>quote mix</p>",
    "<meta content=\"x&quot;y\"><p>entity in attr</p>",
    "<br><br/><hr>",
    "<div itemscope itemtype=\"http://schema.org/Person\">"
    "<span itemprop=\"name\">Ann</span></div>",
    "<div vocab=\"http://schema.org/\" typeof=\"Person\">"
    "<span property=\"name\">Bo</span></div>",
    "<a href=\"http://e/?a=1&amp;b=2\">link</a>",
    "<p>text &#65; &#x42; &amp; &unknown; end</p>",
    "<P CLASS=\"Upper\">case</P>",
    "<textarea><p>not a tag</p></textarea>done",
    "<title>ti<tle</title><p>x</p>",
    "<div><p>deep<div>nest</p></div></div>",
    "<?xml version=\"1.0\"?><p>pi</p>",
    "<![CDATA[ raw ]]><p>y</p>",
    "<p>trailing lone < bracket</p>",
    "<script type=\"application/ld+json\">{\"unterminated\": 1}",
    "<p  a   =   v  b>spacey attrs</p>",
    "<div itemscope><meta itemprop=\"k\" content=\"v\"></div>",
]


@pytest.mark.parametrize("html", GAUNTLET,
                         ids=[f"case{i}" for i in range(len(GAUNTLET))])
def test_malformed_gauntlet_identical(html):
    fast, std = _both(html)
    assert fast == std


def test_fast_engine_is_default():
    # the pipeline batch fn goes through the fast path
    text, ld, _m, _r = extract_page(
        '<script type="application/ld+json">{"a":1}</script><p>t</p>')
    assert ld == ['{"a":1}'] and text == "t"
