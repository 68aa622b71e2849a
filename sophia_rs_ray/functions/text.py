"""Text-analysis kernels for the documents table (training-data ops).

All are vectorized/batched ``map_batches`` bodies; the regexes and
profiles are module-level constants (compiled once per worker import) —
stateless tasks, no actor needed.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pyarrow as pa

_TOKEN_SPLIT = re.compile(r"\s+")
_WORD = re.compile(r"[a-zA-Z']+")

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES: Dict[str, frozenset] = {
    "en": frozenset("the of and to a in is that it for on with as at by".split()),
    "fr": frozenset("le la les de des du et un une est pour dans que au avec".split()),
    "de": frozenset("der die das und ist von zu mit den im für auf ein eine".split()),
    "es": frozenset("el la los las de y un una es en que para con por del".split()),
}


def tokens_of(text: str) -> List[str]:
    return [t for t in _TOKEN_SPLIT.split(text) if t]


def token_count_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_tokens). Whitespace tokenization,
    empty tokens dropped — mirrored exactly by the DuckDB oracle
    (``string_split_regex`` + filter)."""
    texts = b["text"].to_pylist()
    counts = [len(tokens_of(t or "")) for t in texts]
    return pa.table({"doc_id": b["doc_id"],
                     "n_tokens": pa.array(counts, pa.int64())})


def quality_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) → quality features. All INTEGER-valued on purpose:
    ratios (mean token length, alpha ratio) are left to the consumer so
    the oracle comparison is hash-exact (no float rounding-mode traps).
    alpha counts [A-Za-z] only (ASCII), mirroring the SQL regexp."""
    texts = [t or "" for t in b["text"].to_pylist()]
    n_chars = np.array([len(t) for t in texts], np.int64)
    tok_lists = [tokens_of(t) for t in texts]
    n_tokens = np.array([len(ts) for ts in tok_lists], np.int64)
    tok_chars = np.array([sum(len(w) for w in ts) for ts in tok_lists], np.int64)
    alpha = np.array(
        [sum(("a" <= c <= "z") or ("A" <= c <= "Z") for c in t) for t in texts],
        np.int64)
    return pa.table({
        "doc_id": b["doc_id"],
        "n_chars": pa.array(n_chars),
        "n_tokens": pa.array(n_tokens),
        "token_chars": pa.array(tok_chars),
        "alpha_chars": pa.array(alpha),
    })


def lang_id_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, pred_lang, score). Stopword-profile
    heuristic; deterministic tie-break by language code."""
    texts = [t or "" for t in b["text"].to_pylist()]
    preds, scores = [], []
    for t in texts:
        words = set(w.lower() for w in _WORD.findall(t[:2000]))
        best_lang, best = "und", 0.0
        for lang in sorted(_LANG_PROFILES):
            prof = _LANG_PROFILES[lang]
            hit = len(words & prof) / len(prof)
            if hit > best:
                best_lang, best = lang, hit
        preds.append(best_lang)
        scores.append(round(best, 4))
    return pa.table({"doc_id": b["doc_id"],
                     "pred_lang": pa.array(preds, pa.string()),
                     "score": pa.array(scores, pa.float64())})


def repetition_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) → Gopher-style repetition quality signals
    (Rae et al. 2021 §A1.1: filter docs dominated by repeated lines /
    n-grams). INTEGER-valued counts on purpose (hash-exact oracle):
    consumers derive the fractions dup = 1 - n_distinct/n_tokens and
    top_{1,2}gram_count/n_tokens themselves."""
    from collections import Counter

    texts = [t or "" for t in b["text"].to_pylist()]
    n_tok, n_dist, top1, top2 = [], [], [], []
    for t in texts:
        ts = tokens_of(t)
        c1 = Counter(ts)
        c2 = Counter(f"{a} {bb}" for a, bb in zip(ts, ts[1:]))
        n_tok.append(len(ts))
        n_dist.append(len(c1))
        top1.append(max(c1.values()) if c1 else 0)
        top2.append(max(c2.values()) if c2 else 0)
    return pa.table({
        "doc_id": b["doc_id"],
        "n_tokens": pa.array(n_tok, pa.int64()),
        "n_distinct": pa.array(n_dist, pa.int64()),
        "top_token_count": pa.array(top1, pa.int64()),
        "top_bigram_count": pa.array(top2, pa.int64()),
    })


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


def fingerprint64(text: str) -> int:
    """FNV-1a 64-bit document fingerprint (rolling content hash)."""
    h = _FP_OFF
    for byt in text.encode("utf-8"):
        h = np.uint64((int(h) ^ byt) * int(_FP_BASE) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fingerprint_batch(b: pa.Table) -> pa.Table:
    fps = [fingerprint64(t or "") for t in b["text"].to_pylist()]
    return pa.table({"doc_id": b["doc_id"],
                     "fingerprint": pa.array([f - (1 << 63) for f in fps],
                                             pa.int64())})


def winnow_fingerprints_batch(b: pa.Table, *, k: int = 16,
                              w: int = 8) -> pa.Table:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — public algorithm): character k-gram hashes, then for
    every window of ``w`` consecutive grams keep the RIGHTMOST minimum;
    the distinct selected (position, hash) pairs are the fingerprint
    set, guaranteeing any match of length ≥ k+w-1 shares a fingerprint.

    Gram hash = first 60 bits of md5(k-gram) so the DuckDB oracle
    reproduces it exactly (``CAST('0x'||substr(md5(x),1,15) AS
    BIGINT)``); window selection is vectorized numpy
    (sliding_window_view + reversed argmin = rightmost min)."""
    import hashlib

    ids: List = []
    poss: List[int] = []
    fps: List[int] = []
    for doc_id, text in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
        t = text or ""
        n = len(t) - k + 1
        if n < w:
            continue  # too short for one full window (spec guarantee)
        hs = np.fromiter(
            (int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:15], 16)
             for i in range(n)), np.int64, n)
        win = np.lib.stride_tricks.sliding_window_view(hs, w)
        right_min = (w - 1) - np.argmin(win[:, ::-1], axis=1)
        sel = np.unique(np.arange(n - w + 1) + right_min)
        ids.extend([doc_id] * len(sel))
        poss.extend((sel + 1).tolist())     # 1-indexed like SQL substr
        fps.extend(hs[sel].tolist())
    return pa.table({
        "doc_id": pa.array(ids, b["doc_id"].type),
        "pos": pa.array(poss, pa.int64()),
        "fp": pa.array(fps, pa.int64()),
    })


# ---------------------------------------------------------------------------
# normalization / PII / bigram rarity (training-data hygiene ops)
# ---------------------------------------------------------------------------

#: RE2-compatible patterns (no lookaround) so DuckDB's regexp_* (also
#: RE2) reproduces the exact same matches in the oracle SQL.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_NUM = r"\d{7,}"


def normalize_batch(b: pa.Table) -> pa.Table:
    """Unicode NFC + lowercase + whitespace-collapse + trim — the
    standard text-normalization pass before dedup/fingerprinting.

    lower/collapse/trim are Arrow kernels; NFC goes through CPython's
    C-level ``unicodedata`` because pyarrow's ``utf8_normalize`` does
    NOT compose combining sequences (verified on 16.1: e+U+0301 stays
    two codepoints, while DuckDB's ``nfc_normalize`` composes).  The
    ``is_normalized`` fast path skips the copy for the (typical)
    already-NFC row."""
    import unicodedata

    import pyarrow.compute as pc

    s = pa.array([
        v if v is None or unicodedata.is_normalized("NFC", v)
        else unicodedata.normalize("NFC", v)
        for v in b["text"].to_pylist()], b["text"].type
        if not isinstance(b["text"], pa.ChunkedArray)
        else b["text"].type)
    s = pc.utf8_lower(s)
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    s = pc.utf8_trim(s, characters=" ")
    return pa.table({"doc_id": b["doc_id"], "norm_text": s,
                     "n_chars_norm": pc.utf8_length(s)})


def pii_redact_batch(b: pa.Table) -> pa.Table:
    """Regex PII scrub: emails → [EMAIL], IPv4 → [IP], long digit runs
    → [NUM].  Counts are taken on the ORIGINAL text per pattern (so
    they are order-independent); replacements apply sequentially.
    Vectorized RE2 kernels only."""
    import pyarrow.compute as pc

    t = b["text"]
    n_email = pc.count_substring_regex(t, pattern=PII_EMAIL)
    n_ip = pc.count_substring_regex(t, pattern=PII_IPV4)
    n_num = pc.count_substring_regex(t, pattern=PII_NUM)
    s = pc.replace_substring_regex(t, pattern=PII_EMAIL,
                                   replacement="[EMAIL]")
    s = pc.replace_substring_regex(s, pattern=PII_IPV4, replacement="[IP]")
    s = pc.replace_substring_regex(s, pattern=PII_NUM, replacement="[NUM]")
    return pa.table({
        "doc_id": b["doc_id"], "redacted": s,
        "n_email": pc.cast(n_email, pa.int64()),
        "n_ip": pc.cast(n_ip, pa.int64()),
        "n_num": pc.cast(n_num, pa.int64()),
    })


def bigram_pairs_batch(b: pa.Table) -> pa.Table:
    """Per-document DISTINCT token bigrams as (doc_id, bigram) pairs —
    the map side of corpus-level bigram-rarity aggregation.  Pairs are
    globally distinct because a doc lives in exactly one batch."""
    ids: List = []
    bgs: List[str] = []
    for doc_id, text in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
        toks = tokens_of(text or "")
        seen = set(
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1))
        ids.extend([doc_id] * len(seen))
        bgs.extend(seen)
    return pa.table({"doc_id": pa.array(ids, b["doc_id"].type),
                     "bigram": pa.array(bgs, pa.string())})


#: fixed token-window size standing in for paragraph boundaries — the
#: bench corpus has no newlines, so segmentation is deterministic token
#: windows; swap the splitter for '\n\n' chunks on real crawl text.
SEGMENT_TOKENS = 10


def segments_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) → exploded (doc_id, seg_idx, seg): CCNet-style
    paragraph segmentation as fixed ``SEGMENT_TOKENS``-token windows.
    Mirrored exactly by the DuckDB oracle's list-comprehension slice
    (``ts[i*10+1:i*10+10]``, 1-based inclusive)."""
    ids: List = []
    idxs: List[int] = []
    segs: List[str] = []
    for doc_id, text in zip(b["doc_id"].to_pylist(),
                            b["text"].to_pylist()):
        toks = tokens_of(text or "")
        n = (len(toks) + SEGMENT_TOKENS - 1) // SEGMENT_TOKENS
        for i in range(n):
            ids.append(doc_id)
            idxs.append(i)
            segs.append(" ".join(
                toks[i * SEGMENT_TOKENS:(i + 1) * SEGMENT_TOKENS]))
    return pa.table({"doc_id": pa.array(ids, b["doc_id"].type),
                     "seg_idx": pa.array(idxs, pa.int64()),
                     "seg": pa.array(segs, pa.large_string())})


def doc_segment_totals_batch(b: pa.Table) -> pa.Table:
    """(doc_id, text) → one sentinel row per document carrying the
    total segment count (seg_idx = -1, seg = '').  Unioned with the
    kept-segment stream so every doc_id survives reassembly even when
    all of its segments were corpus-duplicated (or the text is empty)."""
    totals = [
        (len(tokens_of(t or "")) + SEGMENT_TOKENS - 1) // SEGMENT_TOKENS
        for t in b["text"].to_pylist()]
    n = len(b)
    return pa.table({"doc_id": b["doc_id"],
                     "seg_idx": pa.array([-1] * n, pa.int64()),
                     "seg": pa.array([""] * n, pa.large_string()),
                     "n_segments": pa.array(totals, pa.int64())})
