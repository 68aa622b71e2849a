"""IRI-resolution fuzz vs urllib.parse.urljoin — an independent
RFC-3986 §5 implementation.  Random bases and relative references
built from dot-segment-heavy paths, queries and fragments.

Excluded from generation (verified urljoin deviations from the RFC,
where the engine matches the RFC algorithm and the reference's
transcribed matrix):
  * EMPTY PATH SEGMENTS — RFC 3986 remove_dot_segments preserves
    ``a//b``; urljoin collapses the empty segment
    (``urljoin('http://h/bb', 'a//') == 'http://h/a/'`` but §5.2.4
    yields ``/a//``);
  * the empty reference (urljoin returns the base sans fragment)."""

import random
from urllib.parse import urljoin

import pytest

from sophia_rs_ray.iri import resolve

SEGS = ["a", "bb", "c1", "..", "."]


def _random_base(rng):
    host = rng.choice(["h", "ex.org", "ex.org:8080"])
    depth = rng.randint(0, 3)
    path = "/" + "/".join(rng.choice(["a", "bb", "c1"])
                          for _ in range(depth))
    if depth and rng.random() < 0.3:
        path += "/"
    q = "?bq=1" if rng.random() < 0.4 else ""
    return f"http://{host}{path}{q}"


def _random_ref(rng):
    r = rng.random()
    if r < 0.1:
        return f"http://other/{rng.choice(['x', 'y'])}"
    if r < 0.2:
        return "//nethost/p"
    n = rng.randint(1, 4)
    path = "/".join(rng.choice(SEGS) for _ in range(n))
    if rng.random() < 0.3:
        path = "/" + path
    out = path
    if rng.random() < 0.3:
        out += "?q=2"
    if rng.random() < 0.3:
        out += "#frag"
    return out if out else "x"


@pytest.mark.parametrize("seed", range(400))
def test_resolution_matches_urljoin(seed):
    rng = random.Random(1234 + seed)
    base = _random_base(rng)
    ref = _random_ref(rng)
    if ref == "":
        ref = "x"
    got = resolve(base, ref)
    want = urljoin(base, ref)
    assert got == want, f"base={base!r} ref={ref!r}: {got!r} != {want!r}"
