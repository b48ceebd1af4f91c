"""Length-preserving punctuation removal.

Semantics match the reference's Hyperscan pass
(reference src/normalizer/PunctuationRemover.cpp:17-33, 139-173): every
occurrence of one of three punctuation classes is replaced *byte-for-byte*
with spaces — a 1-byte (UTF-8) mark becomes one space, a 2-byte mark two
spaces, a 3-byte mark three spaces — so byte offsets (and therefore token
boundaries) are identical to the reference's.

We implement it as a single ``str.translate`` pass (C-speed, one scan),
mapping each mark's code point to the right number of spaces.
"""

from __future__ import annotations

# The three symbol classes, verbatim from the reference
# (src/normalizer/PunctuationRemover.cpp:17-33). Stored unescaped.
PUN_1_BYTE = [
    ",", ".", ":", ";", "-", "_", '"', "!", "\n", "\t",
    "#", "%", "&", "*", "/", "?", "@", "\\", "(", ")", "[",
    "]", "{", "}", "|", "=", "^", "$", "'",
]

PUN_2_BYTE = [
    "«", "»", "՚", "՛", "՜", "՝", "՞", "՟", "։", "؉", "؊", "¿", "·",
    "¶", "§", "¡", "£",
]

PUN_3_BYTE = [
    "‐", "‑", "‒", "–", "—", "―", "⸗", "⸺", "⸻", "⹀", "〜",
    "‟", "〰", "゠", "︱", "︲", "﹘", "﹣", "－", "‘", "’", "‛", "“", "”",
    "⸚", "‹", "›", "„", "‚", "⁅", "⁆", "〈", "〉", "⌈", "⌉", "⌊", "⌋",
    "＿",
]

# sanity: the class name encodes the UTF-8 width, which the reference
# asserts at match time (src/normalizer/PunctuationRemover.cpp:148)
assert all(len(c.encode("utf8")) == 1 for c in PUN_1_BYTE)
assert all(len(c.encode("utf8")) == 2 for c in PUN_2_BYTE)
assert all(len(c.encode("utf8")) == 3 for c in PUN_3_BYTE)

_TRANSLATE_TABLE = {
    **{ord(c): " " for c in PUN_1_BYTE},
    **{ord(c): "  " for c in PUN_2_BYTE},
    **{ord(c): "   " for c in PUN_3_BYTE},
}

#: All marks as one string — handy for building regexes (e.g. the DuckDB
#: oracle's character class).
ALL_MARKS = "".join(PUN_1_BYTE + PUN_2_BYTE + PUN_3_BYTE)


def remove_punctuation(text: str) -> str:
    """Replace every punctuation mark with spaces, UTF-8-length-preserving."""
    return text.translate(_TRANSLATE_TABLE)
