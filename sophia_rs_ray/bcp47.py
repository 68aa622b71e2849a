"""BCP47 language-tag well-formedness (reference ``bcp47/src/_tag.rs``).

Same permissiveness as the reference: checks the RFC 5646 *syntax*
(langtag / privateuse / irregular-grandfathered) without consulting the
subtag registry.  The regex is a direct Python translation of the
reference's ``LANG_TAG_SRC`` (itself the ABNF from the RFC — public
spec content).
"""

from __future__ import annotations

import re

_LANG_TAG_RE = re.compile(
    r"""^
    (
      (?:
        (?:                       # language
          (?:
            [A-Z]{2,3}
            (?:-[A-Z]{3}){0,3}    # extlang
          )
        |
          [A-Z]{4,8}
        )
        (?:-[A-Z]{4})?            # script
        (?:-(?:[A-Z]{2}|[0-9]{3}))?   # region
        (?:-(?:[A-Z0-9]{5,8}|[0-9][A-Z0-9]{3}))*  # variant
        (?:-[0-9A-WY-Z](?:-[A-Z0-9]{2,8})+)*      # extension
        (?:-X(?:-[A-Z0-9]{1,8})+)?                # privateUse
      )
    |
      (?:X(?:-[A-Z0-9]{1,8})+)                    # privateUse only
    |
      (?:en-GB-oed|i-ami|i-bnn|i-default|i-enochian|i-hak|i-klingon
        |i-lux|i-mingo|i-navajo|i-pwn|i-tao|i-tay|i-tsu|sgn-BE-FR
        |sgn-BE-NL|sgn-CH-DE)                     # grandfathered
    )
    $""", re.IGNORECASE | re.ASCII | re.VERBOSE)


def is_valid_tag(tag: str) -> bool:
    """Is ``tag`` a well-formed BCP47 language tag?"""
    return bool(_LANG_TAG_RE.match(tag))


class InvalidLanguageTag(ValueError):
    pass


def check_tag(tag: str) -> str:
    """Return the tag, or raise ``InvalidLanguageTag``."""
    if not is_valid_tag(tag):
        raise InvalidLanguageTag(f"invalid BCP47 language tag {tag!r}")
    return tag


class LanguageTag:
    """Validated BCP47 tag with the reference's case-insensitive
    equality / ordering / hashing semantics (``_tag.rs:104-152``):
    two tags differing only in case compare equal and hash equal;
    ordering compares the ASCII-lowercased forms.

    ``==`` is typed (LanguageTag vs LanguageTag only), matching the
    Rust reference's ``Eq`` — Rust's ``PartialEq<str>`` convenience
    never participates in HashMap semantics, and accepting str here
    would break Python's hash/eq invariant (``LanguageTag('EN') ==
    'En'`` with unequal hashes gives inconsistent set membership).
    Use :meth:`eq_str` for case-insensitive comparison against a plain
    string.  Ordering comparisons still accept str (no hash
    invariant applies to ordering)."""

    __slots__ = ("tag",)

    def __init__(self, tag: str, *, unchecked: bool = False):
        if not unchecked:
            check_tag(tag)
        self.tag = tag

    @classmethod
    def new_unchecked(cls, tag: str) -> "LanguageTag":
        return cls(tag, unchecked=True)

    def __str__(self) -> str:
        return self.tag

    def __repr__(self) -> str:
        return f"LanguageTag({self.tag!r})"

    def _key(self) -> str:
        return self.tag.lower()

    @staticmethod
    def _other(other) -> str:
        if isinstance(other, LanguageTag):
            return other._key()
        if isinstance(other, str):
            return other.lower()
        return NotImplemented  # type: ignore[return-value]

    def __eq__(self, other) -> bool:
        if not isinstance(other, LanguageTag):
            return NotImplemented
        return self._key() == other._key()

    def eq_str(self, other: str) -> bool:
        """Case-insensitive comparison against a plain string — the
        Rust ``PartialEq<str>`` convenience (``_tag.rs:115``), kept off
        ``__eq__`` to preserve the hash/eq invariant."""
        return self._key() == other.lower()

    def __hash__(self) -> int:
        return hash(self._key())

    def __lt__(self, other) -> bool:
        o = self._other(other)
        return NotImplemented if o is NotImplemented else self._key() < o

    def __le__(self, other) -> bool:
        o = self._other(other)
        return NotImplemented if o is NotImplemented else self._key() <= o

    def __gt__(self, other) -> bool:
        o = self._other(other)
        return NotImplemented if o is NotImplemented else self._key() > o

    def __ge__(self, other) -> bool:
        o = self._other(other)
        return NotImplemented if o is NotImplemented else self._key() >= o
