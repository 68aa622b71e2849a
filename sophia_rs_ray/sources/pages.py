"""Deterministic synthetic Common-Crawl-style page table.

Input shape mandated by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Every page is generated from seeded template parameters (FIXTURES.md §1):
JSON-LD blocks (schema.org Person with nested bnode objects, typed /
language-tagged / escape-edge-case literals), microdata and RDFa-Lite
fragments, visible paragraphs with gazetteer entity mentions, a shared
"celebrity" entity on ~10% of pages (hub-entity skew), pages with missing
or malformed JSON-LD (error-path coverage).

Two independent products per page index:

- ``page_record(i)`` — the HTML + the *expected visible text* assembled
  from the template parameters (NOT by running the extractor — this is
  what makes the byte-identical-text invariant a real test);
- ``expected_triples(i)`` — the oracle (s, p, o) set in canonical
  N-Triples text, again computed from the parameters directly
  (FIXTURES.md §2). P/R ≥ 0.95 compares the pipeline output to this.

Both are pure functions of ``i`` → generation runs distributed as
``ray.data.range(n).map_batches(gen_pages_batch)``.
"""

from __future__ import annotations

import hashlib
import random
from functools import lru_cache
from typing import Dict, List, Tuple

from ..jsonld import canonical_double
from ..terms import format_term, iri, langlit, literal, bnode, XSD_BOOLEAN, XSD_DATETIME, XSD_DOUBLE, XSD_INTEGER

SF_PAGE_COUNTS = {"0.001": 500, "0.01": 5000, "0.1": 50000}
BASE_TS_US = 1735689600000000  # 2025-01-01T00:00:00Z in microseconds

_FIRST = ["Alice", "Bob", "Carol", "David", "Elena", "Frank", "Grace",
          "Hugo", "Irene", "Jack", "Karin", "Liam", "Marta", "Nikolai",
          "Olga", "Pierre", "Quinn", "Rosa", "Stefan", "Tara"]
_LAST = ["Johnson", "Smith", "Garcia", "Mueller", "Rossi", "Dubois",
         "Tanaka", "Novak", "Silva", "Petrov", "Larsen", "Kowalski",
         "Okafor", "Haddad", "Berg", "Costa"]
_ORG = ["Acme Corp", "Globex Inc", "Initech", "Umbrella Labs", "Hooli",
        "Stark Industries", "Wayne Enterprises", "Tyrell Corp"]
_CITY = ["Paris", "Berlin", "Tokyo", "Lagos", "Lima", "Oslo", "Prague",
         "Vienna", "Madrid", "Dublin", "Warsaw", "Cairo"]
_LANGS = ["en", "fr", "de", "es"]
_JOBS = ["Engineer", "Designer", "Historian", "Biologist", "Economist"]

SCHEMA = "http://schema.org/"
ENT = "http://kg.example/entity/"
N_HOSTS = 97


def n_entities(n_pages: int) -> int:
    return max(40, n_pages // 10)


def entity_name(e: int) -> str:
    return f"{_FIRST[e % len(_FIRST)]} {_LAST[(e // len(_FIRST)) % len(_LAST)]}" \
        if e % 3 != 1 else _ORG[e % len(_ORG)] + f" {e}"


def entity_iri(e: int) -> str:
    return f"{ENT}{e}"


@lru_cache(maxsize=65536)
def skolem_suffix(url: str, extractor: str) -> str:
    """``"_" + h(url‖extractor)`` — the suffix is label-independent, so
    one digest serves every bnode of a (page, extractor) pair."""
    h = hashlib.sha256(f"{url}|{extractor}".encode()).hexdigest()[:12]
    return f"_{h}"


def skolem(label: str, url: str, extractor: str) -> str:
    """Deterministic skolem suffix = h(url‖extractor) (SURVEY §2.1 —
    replaces the reference's UUIDv7 parser suffix, ``_inner.rs:27-35``)."""
    return label + skolem_suffix(url, extractor)


def _params(i: int, n_pages: int) -> Dict:
    rng = random.Random(f"page-{i}")
    ne = n_entities(n_pages)
    host = i % N_HOSTS
    url = f"https://site{host}.example/p/{i}"
    person = rng.randrange(ne)
    if person % 3 == 1:
        person += 1  # keep person-entity slots
    person %= ne
    org = rng.randrange(ne)
    org = org + (1 - org % 3) if org % 3 != 1 else org  # org slots ≡ 1 mod 3
    org %= ne
    celebrity = rng.random() < 0.10
    mention_pool = [rng.randrange(ne) for _ in range(3)]
    if celebrity:
        mention_pool.append(0)
    event = rng.randrange(ne)
    return {
        "i": i, "url": url, "lang": _LANGS[i % 4],
        "ts_us": BASE_TS_US + i * 7_000_000,
        "person": person, "org": org, "event": event,
        "mentions": mention_pool,
        "city": _CITY[rng.randrange(len(_CITY))],
        "job": _JOBS[rng.randrange(len(_JOBS))],
        "height": round(1.5 + rng.randrange(50) / 100.0, 2),
        "year": 1950 + rng.randrange(60),
        "has_jsonld": i % 11 != 7,
        "bad_jsonld": i % 29 == 13,
        "escape_case": i % 13 == 5,
        "has_award": i % 5 == 2,
    }


def _esc_name(p: Dict) -> str:
    name = entity_name(p["person"])
    if p["escape_case"]:
        name = name + ' "the\\Great"\nJr.'
    return name


def _jsonld_text(p: Dict) -> str:
    import json
    name = _esc_name(p)
    doc = {
        "@context": {
            "@vocab": SCHEMA,
            "knows": {"@id": SCHEMA + "knows", "@type": "@id"},
        },
        "@id": entity_iri(p["person"]),
        "@type": "Person",
        "name": name,
        "jobTitle": {"@value": p["job"], "@language": p["lang"]},
        "height": p["height"],
        "birthDate": {"@value": f"{p['year']}-01-02T00:00:00",
                      "@type": "http://www.w3.org/2001/XMLSchema#dateTime"},
        "alumniCount": p["year"] - 1900,
        "active": p["i"] % 2 == 0,
        "worksFor": {"@id": entity_iri(p["org"]), "@type": "Organization",
                     "name": entity_name(p["org"])},
        "knows": [entity_iri(m) for m in p["mentions"][:2]],
    }
    if p["has_award"]:
        doc["award"] = {"@type": "CreativeWork", "name": f"Prize {p['i'] % 17}"}
    txt = json.dumps(doc, ensure_ascii=False)
    if p["bad_jsonld"]:
        txt = txt[:-5] + "#broken"
    return txt


def _expected_jsonld_triples(p: Dict) -> List[Tuple[str, str, str]]:
    if not p["has_jsonld"] or p["bad_jsonld"]:
        return []
    s = iri(entity_iri(p["person"]))
    o_org = iri(entity_iri(p["org"]))
    name = _esc_name(p)
    out = [
        (s, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), iri(SCHEMA + "Person")),
        (s, iri(SCHEMA + "name"), literal(name)),
        (s, iri(SCHEMA + "jobTitle"), langlit(p["job"], p["lang"])),
        (s, iri(SCHEMA + "height"), literal(_canon_double(p["height"]), XSD_DOUBLE)),
        (s, iri(SCHEMA + "birthDate"),
         literal(f"{p['year']}-01-02T00:00:00", XSD_DATETIME)),
        (s, iri(SCHEMA + "alumniCount"), literal(str(p["year"] - 1900), XSD_INTEGER)),
        (s, iri(SCHEMA + "active"),
         literal("true" if p["i"] % 2 == 0 else "false", XSD_BOOLEAN)),
        (s, iri(SCHEMA + "worksFor"), o_org),
        (o_org, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
         iri(SCHEMA + "Organization")),
        (o_org, iri(SCHEMA + "name"), literal(entity_name(p["org"]))),
    ]
    for m in p["mentions"][:2]:
        out.append((s, iri(SCHEMA + "knows"), iri(entity_iri(m))))
    if p["has_award"]:
        b0 = bnode(skolem("b0", p["url"], "jsonld"))
        out += [
            (s, iri(SCHEMA + "award"), b0),
            (b0, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
             iri(SCHEMA + "CreativeWork")),
            (b0, iri(SCHEMA + "name"), literal(f"Prize {p['i'] % 17}")),
        ]
    return [(format_term(a), format_term(b), format_term(c)) for a, b, c in out]


def _canon_double(v: float) -> str:
    return canonical_double(v)


def _micro_html_and_triples(p: Dict, want_triples: bool = True):
    person_iri = entity_iri(p["person"])
    org_iri = entity_iri(p["org"])
    nm = entity_name(p["person"])
    on = entity_name(p["org"])
    html = (
        f'<div itemscope itemtype="http://schema.org/Person" itemid="{person_iri}">'
        f'<span itemprop="name">{nm}</span> works at '
        f'<span itemprop="worksFor" itemscope '
        f'itemtype="http://schema.org/Organization" itemid="{org_iri}">'
        f'<span itemprop="name">{on}</span></span></div>'
    )
    text = f"{nm} works at {on}"
    if not want_triples:  # page_record only reads html+text
        return html, text, None
    s, o = iri(person_iri), iri(org_iri)
    trs = [
        (s, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), iri(SCHEMA + "Person")),
        (s, iri(SCHEMA + "name"), literal(nm)),
        (s, iri(SCHEMA + "worksFor"), o),
        (o, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
         iri(SCHEMA + "Organization")),
        (o, iri(SCHEMA + "name"), literal(on)),
    ]
    return html, text, [(format_term(a), format_term(b), format_term(c)) for a, b, c in trs]


def _rdfa_html_and_triples(p: Dict, want_triples: bool = True):
    ev = entity_iri(p["event"]) + "#event"
    org_iri = entity_iri(p["org"])
    en = f"Conf {p['event']}"
    city = p["city"]
    date = f"{p['year']}-06-01"
    html = (
        f'<div vocab="http://schema.org/" typeof="Event" about="{ev}">'
        f'<span property="name">{en}</span> in '
        f'<span property="location">{city}</span>'
        f'<meta property="startDate" content="{date}">'
        f'<a property="organizer" href="{org_iri}">details</a></div>'
    )
    text = f"{en} in {city}details"
    if not want_triples:
        return html, text, None
    s = iri(ev)
    trs = [
        (s, iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), iri(SCHEMA + "Event")),
        (s, iri(SCHEMA + "name"), literal(en)),
        (s, iri(SCHEMA + "location"), literal(city)),
        (s, iri(SCHEMA + "startDate"), literal(date)),
        (s, iri(SCHEMA + "organizer"), iri(org_iri)),
    ]
    return html, text, [(format_term(a), format_term(b), format_term(c)) for a, b, c in trs]


def page_record(i: int, n_pages: int) -> Dict:
    """→ dict(url, warc_ts_us, html:str, text:str, lang) — html and the
    EXPECTED visible text assembled side by side from the template."""
    p = _params(i, n_pages)
    title = f"Page {i} about {entity_name(p['person'])}"
    mentions = " and ".join(entity_name(m) for m in p["mentions"])
    para1 = f"{entity_name(p['person'])} met {mentions} in {p['city']}."
    para2 = f"Report   no. {i}   filed in {p['city']}."  # runs of spaces → 1
    micro_html, micro_text, _ = _micro_html_and_triples(p, want_triples=False)
    rdfa_html, rdfa_text, _ = _rdfa_html_and_triples(p, want_triples=False)
    ld = (f'<script type="application/ld+json">{_jsonld_text(p)}</script>'
          if p["has_jsonld"] else "")
    footer = f"Contact: editor@site{i % N_HOSTS}.example"
    html = (
        "<!DOCTYPE html>\n"
        f'<html lang="{p["lang"]}">\n<head>\n<title>{title}</title>\n'
        f'{ld}<meta charset="utf-8">\n</head>\n<body>\n'
        f"<h1>{title}</h1>\n"
        f"<p>{para1}</p>\n<p>{para2}</p>\n"
        f"{micro_html}\n{rdfa_html}\n"
        '<script>var x = "not visible";</script>\n'
        f"<footer>{footer}</footer>\n</body>\n</html>\n"
    )
    para2_norm = " ".join(para2.split())
    text = "\n".join([title, title, para1, para2_norm, micro_text,
                      rdfa_text, footer])
    return {"url": p["url"], "warc_ts_us": p["ts_us"], "html": html,
            "text": text, "lang": p["lang"]}


def expected_triples(i: int, n_pages: int) -> List[Tuple[str, str, str, str]]:
    """Oracle (url, s, p, o) rows in canonical NT text (FIXTURES.md §2)."""
    p = _params(i, n_pages)
    out = []
    for s, pr, o in _expected_jsonld_triples(p):
        out.append((p["url"], s, pr, o))
    for s, pr, o in _micro_html_and_triples(p)[2]:
        out.append((p["url"], s, pr, o))
    for s, pr, o in _rdfa_html_and_triples(p)[2]:
        out.append((p["url"], s, pr, o))
    return out


# ---------------------------------------------------------------------------
# batch / dataset adapters
# ---------------------------------------------------------------------------

def gen_pages_batch(batch, n_pages: int):
    """map_batches body over ray.data.range(n): id column → page rows."""
    import pyarrow as pa

    ids = batch["id"].to_pylist() if hasattr(batch["id"], "to_pylist") else list(batch["id"])
    recs = [page_record(int(i), n_pages) for i in ids]
    return pa.table({
        "url": [r["url"] for r in recs],
        "warc_ts": pa.array([r["warc_ts_us"] for r in recs], pa.timestamp("us")),
        "html": pa.array([r["html"].encode() for r in recs], pa.large_binary()),
        "text": [r["text"] for r in recs],
        "lang": [r["lang"] for r in recs],
    })


def pages_dataset(n_pages: int, override_num_blocks: int | None = None):
    """Distributed synthetic page table as a ray.data.Dataset."""
    import ray.data as rd

    ds = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return ds.map_batches(lambda b: gen_pages_batch(b, n_pages),
                          batch_format="pyarrow")


def oracle_table(n_pages: int):
    """Driver-side oracle triple table (small scales only)."""
    import pyarrow as pa

    rows = []
    for i in range(n_pages):
        rows.extend(expected_triples(i, n_pages))
    return pa.table({
        "url": [r[0] for r in rows],
        "s": [r[1] for r in rows],
        "p": [r[2] for r in rows],
        "o": [r[3] for r in rows],
    })
