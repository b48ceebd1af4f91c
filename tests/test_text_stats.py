"""Unit pins for pipelines/text_stats.py kernels that the oracle gate
exercises only at one scale — chiefly the vectorized BPE count's
equivalence to the sequential full-pattern scan."""

import random
import re

import pyarrow as pa
import pyarrow.compute as pc

from searchenginepp_ray.pipelines.text_stats import (
    BPE_PATTERN,
    _BPE_COUNT_PATTERN,
)


def test_bpe_count_pattern_equals_sequential_scan():
    """count_substring_regex with the reduced pattern must equal the
    per-doc findall over the FULL pattern with whitespace-run matches
    discarded — on handpicked boundary shapes and a deterministic fuzz
    sweep over the pattern's character classes."""
    full_re = re.compile(BPE_PATTERN)
    ws = re.compile(r"[ \t\n\v\f\r]+$")
    rng = random.Random(7)
    alphabet = list("ab1!  \t\n") + ["é", "À", "ÿ", "—", "\r", "\v", "\f", "¿"]
    cases = [
        "", " ", "  ", "a", " a", "a  b", "a\t b", "x 1", "a !", "!!",
        " !", "\t\t", "é1—", "a b", " 1a!", "a1", "1a", "—a", "a—1",
    ]
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(2000)
    ]
    vec = pc.count_substring_regex(
        pa.array(cases, pa.string()), _BPE_COUNT_PATTERN
    ).to_pylist()
    for s, got in zip(cases, vec):
        exp = sum(1 for m in full_re.findall(s) if not ws.match(m))
        assert got == exp, (repr(s), got, exp)
