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


def test_bpe_tokenize_matches_sequential_encode(ray_session, tmp_path):
    """Distributed encode == sequential Sennrich apply of the SAME
    learned merges, per doc (counts + stream md5); merged symbols
    actually shrink the stream."""
    import hashlib
    import re

    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchenginepp_ray.pipelines.tokenizer import (bpe_tokenize,
                                                        bpe_train)

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "low new low new",
        "",
        "zzz",
    ] * 3
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), path, row_group_size=4)

    n_merges = 6
    got = (bpe_tokenize(path, n_merges=n_merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    merges = bpe_train(path, n_merges=n_merges)
    pairs = list(zip(merges["a"], merges["b"]))

    def enc_word(w):
        s = " ".join(w)
        for a, b in pairs:
            s = re.sub(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)",
                       a + b, s)
        return s

    for i, text in enumerate(texts):
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        enc = [enc_word(w) for w in words]
        stream = " ".join(enc)
        assert got.loc[i, "n_words"] == len(words)
        want_sub = sum(e.count(" ") + 1 for e in enc) if enc else 0
        assert got.loc[i, "n_subwords"] == want_sub
        assert got.loc[i, "enc_md5"] == hashlib.md5(
            stream.encode()).hexdigest()
    # merges learned something: fewer subwords than characters
    total_chars = sum(len(w) for t in texts
                      for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    assert got["n_subwords"].sum() < total_chars
