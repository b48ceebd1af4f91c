"""Composed corpus-cleaning pipelines — the canonical training-data
shape: quality floors + language filter + dedup, in one streaming pass
plus one keeper aggregate.

``corpus_clean`` is fully SQL-expressible (oracle-checked); the near-dup
variant adds MinHash-pair removal (connected components over the pair
graph, canonical = min doc_id), which no SQL oracle can express —
rows-only checked.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray

from ..config import SIMPLE_PROFILE
from ..normalizer.word_normalizer import normalize_tokens
from .text_stats import QUALITY_STOPS, documents_ds


def _clean_pass(
    sf_dir: str, min_tokens: int, min_distinct_ratio: float,
    max_stopword_ratio: float, lang_threshold: float,
):
    """(doc_id, text_md5) of documents passing the quality + language
    floors — one map pass, everything else filtered before any shuffle."""
    stops = frozenset(QUALITY_STOPS)

    def passer(t: pa.Table) -> pa.Table:
        ids, md5s = [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = normalize_tokens(text, SIMPLE_PROFILE)
            n = len(toks)
            if n < min_tokens:
                continue
            n_stop = sum(1 for w in toks if w in stops)
            if len(set(toks)) / n < min_distinct_ratio:
                continue
            ratio = n_stop / n
            if ratio > max_stopword_ratio or ratio < lang_threshold:
                continue  # lang_threshold: the lang_id 'en' heuristic
            ids.append(doc_id)
            md5s.append(hashlib.md5(text.encode()).hexdigest())
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text_md5": pa.array(md5s)}
        )

    return documents_ds(sf_dir).map_batches(passer, batch_format="pyarrow")


def corpus_clean(
    sf_dir: str, min_tokens: int = 5, min_distinct_ratio: float = 0.2,
    max_stopword_ratio: float = 0.9, lang_threshold: float = 0.08,
):
    """Kept doc ids: pass the quality/language floors AND be the lowest
    doc_id of their exact-content (md5) group among the passers."""
    from .agg import hash_groupby_sum

    passers = _clean_pass(
        sf_dir, min_tokens, min_distinct_ratio, max_stopword_ratio,
        lang_threshold,
    )
    keepers = hash_groupby_sum(
        passers, ["text_md5"], {"doc_id": ("doc_id", "min")}
    )
    return keepers.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    )


def corpus_clean_neardup(
    sf_dir: str, min_tokens: int = 5, min_distinct_ratio: float = 0.2,
    max_stopword_ratio: float = 0.9, lang_threshold: float = 0.08,
    jaccard_threshold: float = 0.8,
):
    """``corpus_clean`` plus near-duplicate removal: MinHash+LSH pairs
    form a graph; each connected component keeps only its minimum doc_id.

    The component pass runs on PAIR IDS ONLY (8 B per endpoint, bounded
    by the LSH candidate count — never text), driver-side union-find,
    loser ids broadcast back as a filter."""
    from .dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        sf_dir, jaccard_threshold=jaccard_threshold
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for b in pairs.iter_batches(batch_format="pyarrow"):
        for a, c in zip(b["doc_a"].to_pylist(), b["doc_b"].to_pylist()):
            ra, rc = find(a), find(c)
            if ra != rc:
                # union by id: lower id becomes the root (the canonical)
                lo, hi = (ra, rc) if ra < rc else (rc, ra)
                parent[hi] = lo
    losers = np.array(
        sorted(x for x in parent if find(x) != x), dtype=np.int64
    )
    losers_ref = ray.put(losers)

    def drop_losers(t: pa.Table) -> pa.Table:
        arr = ray.get(losers_ref)
        doc = t["doc_id"].to_numpy()
        pos = np.searchsorted(arr, doc)
        inb = pos < len(arr)
        is_loser = np.zeros(len(t), dtype=bool)
        is_loser[inb] = arr[pos[inb]] == doc[inb]
        return t.filter(pa.array(~is_loser))

    return corpus_clean(
        sf_dir, min_tokens, min_distinct_ratio, max_stopword_ratio,
        lang_threshold,
    ).map_batches(drop_losers, batch_format="pyarrow")
