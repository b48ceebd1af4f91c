"""BPE tokenizer training: the distributed merge learner vs a sequential
reference implementation of the identical deterministic contract."""

import re
from collections import Counter

import numpy as np


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Sequential Sennrich reference: most frequent pair, ties to
    lexicographically smallest (a, b); left-to-right non-overlapping
    application."""
    vocab = {" ".join(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for sym, n in vocab.items():
            syms = sym.split(" ")
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += n
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        vocab = {pat.sub(a + b, s): cnt for s, cnt in vocab.items()}
    return merges


def _word_counts(sf_dir: str) -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    df = con.execute(f"""
        WITH wtoks AS (
            SELECT list_filter(regexp_split_to_array(lower(text),
                               '[^a-z0-9]+'), t -> t <> '') AS w
            FROM read_parquet('{sf_dir}/documents.parquet')),
        uw AS (SELECT unnest(w) AS word FROM wtoks)
        SELECT word, COUNT(*) AS n FROM uw GROUP BY word
    """).df()
    return dict(zip(df["word"], df["n"].astype(int)))


def test_bpe_train_matches_sequential_reference(ray_session):
    from searchenginepp_ray.pipelines.tokenizer import bpe_train

    sf = "/root/testdata/sf0.001"
    got = bpe_train(sf, n_merges=6)
    want = _ref_bpe(_word_counts(sf), 6)
    assert len(got) == len(want)
    for i, (a, b, n) in enumerate(want):
        row = got.iloc[i]
        assert (row["a"], row["b"], row["n"]) == (a, b, n), (i, row, (a, b, n))
        assert row["merged"] == a + b
    # merges are learned in non-increasing count order only within equal
    # symbol regimes — but rank must be 1..n
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_bpe_pair_counts_matches_first_merge(ray_session):
    from searchenginepp_ray.pipelines.tokenizer import (
        bpe_pair_counts, bpe_train)

    sf = "/root/testdata/sf0.001"
    pairs = bpe_pair_counts(sf, k=3)
    first = bpe_train(sf, n_merges=1).iloc[0]
    top = pairs.iloc[0]
    assert (top["a"], top["b"], top["n"]) == (
        first["a"], first["b"], first["n"])
    assert np.all(pairs["n"].to_numpy()[:-1] >= pairs["n"].to_numpy()[1:])
