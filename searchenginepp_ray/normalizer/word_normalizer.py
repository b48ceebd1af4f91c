"""The full tokenization pipeline.

Pipeline order matches the reference exactly
(reference src/normalizer/WordNormalizer.cpp:30-85):

    [latin1-mojibake fix] → punctuation→spaces → whitespace split →
    lowercase → [drop empty / >240-byte / stopword] → [Porter2 stem]

Notes pinned to reference behavior:

- The whitespace split is on ASCII whitespace only (C++ ``istream >>``),
  so e.g. U+00A0 does *not* split tokens.
- The stopword + length filter and the stemmer are all gated together by
  the stemming flag (reference src/normalizer/WordNormalizer.cpp:62-77);
  with stemming off only empty tokens are dropped.
- The 240 limit is in *bytes* (``token.size()``,
  reference src/normalizer/WordNormalizer.cpp:64).
"""

from __future__ import annotations

import re
from collections import Counter

from ..config import NormalizerProfile
from .latin1 import fix_latin1_mojibake, looks_like_mojibake, lower_ascii, lower_latin1
from .porter2 import stem
from .punctuation import remove_punctuation
from .stop_words import STOP_WORDS

# C++ istream skips the C locale's isspace set: space \t \n \v \f \r
_ASCII_WS_TOKEN = re.compile(r"[^ \t\n\v\f\r]+")


def normalize_tokens(text: str, profile: NormalizerProfile) -> list[str]:
    """Return the normalized token stream of one document, in order.

    The reference lowercases per token *after* splitting
    (src/normalizer/WordNormalizer.cpp:52-59); we lowercase the whole text
    once before splitting — equivalent because both lowercase tables map
    char-for-char and never touch ASCII whitespace, so token boundaries
    are unchanged. One ``str.translate`` per doc instead of one per token.
    """
    if profile.fix_latin1 and looks_like_mojibake(text):
        text = fix_latin1_mojibake(text)

    text = remove_punctuation(text)
    lower = lower_latin1 if profile.latin1_case else lower_ascii
    text = lower(text)

    tokens = _ASCII_WS_TOKEN.findall(text)
    if not profile.stemming:
        return tokens  # findall never yields empty tokens
    out: list[str] = []
    append = out.append
    stops = STOP_WORDS
    for token in tokens:
        if token in stops:
            continue
        # surrogateescape: mojibake-fixed docs may carry stray latin1
        # bytes (the reference's byte-level collapse doesn't validate
        # UTF-8 either); each escaped surrogate is one byte
        blen = len(token) if token.isascii() else len(token.encode("utf8", "surrogateescape"))
        if blen > 240:
            continue
        append(stem(token))
    return out


def term_frequencies(text: str, profile: NormalizerProfile) -> Counter:
    """Per-document term→tf map (reference src/builder.cpp:56-66).

    ``doclen = sum(values())`` — stopwords do not count toward doclen
    (they are filtered before counting, reference src/builder.cpp:69-73).

    Hot-path shape: count *raw* lowercase tokens at C speed first, then
    stopword-filter/length-check/stem only the unique tokens (the per-doc
    vocabulary is much smaller than the token stream). Counts are
    unaffected by the reordering.
    """
    if profile.fix_latin1 and looks_like_mojibake(text):
        text = fix_latin1_mojibake(text)
    text = remove_punctuation(text)
    lower = lower_latin1 if profile.latin1_case else lower_ascii
    text = lower(text)
    raw = Counter(_ASCII_WS_TOKEN.findall(text))
    if not profile.stemming:
        return raw
    out: Counter = Counter()
    stops = STOP_WORDS
    for token, n in raw.items():
        if token in stops:
            continue
        blen = len(token) if token.isascii() else len(token.encode("utf8", "surrogateescape"))
        if blen > 240:
            continue
        s = stem(token)
        out[s] += n
    return out
