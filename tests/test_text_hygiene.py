"""Unit tests for the text-hygiene kernels: normalization, PII
redaction, bigram-rarity map side.  The testdata corpus contains no
PII, so the redaction behavior is exercised here on synthetic strings
(the registry oracle still proves Ray/DuckDB RE2 parity end-to-end)."""

import pyarrow as pa

from sophia_rs_ray.functions.text import (bigram_pairs_batch,
                                          normalize_batch,
                                          pii_redact_batch)


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_normalize_nfc_lower_collapse_trim():
    # e + combining acute (NFD) must fold to the precomposed NFC char
    out = normalize_batch(_docs(["  He\u0301llo \t\n WORLD  ", ""]))
    assert out["norm_text"].to_pylist() == ["h\u00e9llo world", ""]
    assert out["n_chars_norm"].to_pylist() == [11, 0]


def test_pii_redact_all_categories():
    out = pii_redact_batch(_docs([
        "mail bob.smith+x@example.co.uk or admin@ex.org today",
        "host 192.168.001.042 port",
        "card 4111111111111111 and code 1234567",
        "clean text, short num 123456 kept, ip-ish 1.2.3 kept",
    ]))
    red = out["redacted"].to_pylist()
    assert red[0] == "mail [EMAIL] or [EMAIL] today"
    assert red[1] == "host [IP] port"
    assert red[2] == "card [NUM] and code [NUM]"
    assert red[3] == "clean text, short num 123456 kept, ip-ish 1.2.3 kept"
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 1, 0, 0]
    assert out["n_num"].to_pylist() == [0, 0, 2, 0]


def test_pii_counts_on_original_text():
    # the email swallows its own digit run; the count is still taken
    # on the ORIGINAL text (order-independent counts, sequential scrub)
    out = pii_redact_batch(_docs(["user12345678@ex.com"]))
    assert out["redacted"].to_pylist() == ["[EMAIL]"]
    assert out["n_email"].to_pylist() == [1]
    assert out["n_num"].to_pylist() == [1]


def test_bigram_pairs_distinct_per_doc():
    out = bigram_pairs_batch(_docs(["a b a b c", "x", ""]))
    got = sorted(zip(out["doc_id"].to_pylist(),
                     out["bigram"].to_pylist()))
    assert got == [(0, "a b"), (0, "b a"), (0, "b c")]
