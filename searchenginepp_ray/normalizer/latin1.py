"""Latin1 mojibake detection/repair and latin1-aware lowercasing.

The reference operates on raw UTF-8 bytes; we operate on Python ``str``
with equivalent semantics for valid UTF-8 input:

- *Heuristic* (reference src/normalizer/utf8_utils.cpp:30-37): the byte
  pair ``0xC2 [0x80-0xA0 | 0xAD]`` is exactly the UTF-8 encoding of code
  points U+0080–U+00A0 and U+00AD, which never appear in clean text —
  their presence means the document was latin1-decoded UTF-8.
- *Fix* (reference src/normalizer/utf8_utils.cpp:6-28): collapse every
  2-byte UTF-8 sequence back to its latin1 code point, i.e. re-encode the
  string as latin1 and re-decode as UTF-8 — the equivalence the reference
  itself documents (reference utf8-latin1-utf8-schifo-test.py:1-3).
- *Lowercase* (reference src/normalizer/utf8_utils.cpp:40-58): ASCII
  ``A-Z`` plus the latin1 block U+00C0–U+00DF get ``+0x20`` — note this
  deliberately includes U+00D7 ``×`` → U+00F7 ``÷``, faithfully mirroring
  the reference's byte arithmetic.
"""

from __future__ import annotations

import re

_MOJIBAKE_RE = re.compile("[\u0080-\u00a0\u00ad]")

_LOWER_TABLE = {
    **{c: c + 0x20 for c in range(ord("A"), ord("Z") + 1)},
    **{c: c + 0x20 for c in range(0xC0, 0xE0)},
}


def looks_like_mojibake(text: str) -> bool:
    """True iff the latin1-double-encoding heuristic fires."""
    return _MOJIBAKE_RE.search(text) is not None


def fix_latin1_mojibake(text: str) -> str:
    """Undo one round of utf8→latin1-misdecode.

    Strict round-trip when possible; if the collapsed bytes are not valid
    UTF-8 (possible on garbage input — the reference's byte-level collapse
    doesn't validate either) we fall back to collapsing only the valid
    2-byte sequences, leaving other bytes as latin1 code points, which is
    what the reference's chunk loop produces for such input.
    """
    try:
        return text.encode("latin1").decode("utf8")
    except UnicodeDecodeError:
        # collapsed bytes aren't fully valid UTF-8: decode the invalid
        # bytes as latin1 code points (documented deviation: the
        # reference keeps them as raw bytes; any downstream string
        # interpretation of such garbage is implementation-defined)
        raw = text.encode("latin1").decode("utf8", errors="surrogateescape")
        return "".join(
            chr(ord(c) - 0xDC00) if 0xDC80 <= ord(c) <= 0xDCFF else c for c in raw
        )
    except UnicodeEncodeError:
        # contains chars > U+00FF: not latin1-misdecoded after all
        return text


def lower_latin1(text: str) -> str:
    """Latin1-aware lowercase (reference ``str_to_lwr_uft8_latin1``)."""
    return text.translate(_LOWER_TABLE)


def lower_ascii(text: str) -> str:
    """ASCII-only ``tolower`` (the reference's non-latin1 branch,
    src/normalizer/WordNormalizer.cpp:58). Non-ASCII chars unchanged."""
    # str.lower() would also lower non-ASCII; restrict to A-Z.
    return text.translate(_ASCII_LOWER_TABLE)


_ASCII_LOWER_TABLE = {c: c + 0x20 for c in range(ord("A"), ord("Z") + 1)}
