"""Deduplication operators over the ``documents`` table — the dedup family
a large-scale training-data pipeline needs:

- exact: content-hash partition + per-group min (SQL-checkable via md5)
- MinHash + LSH banding: shingle → minhash → band → bucket groupby →
  candidate pairs → Jaccard verify
- SimHash: 64-bit sign-random-projection over token hashes
- n-gram Jaccard: exact pairwise verification of LSH candidates

All stages are vectorized ``map_batches`` over Arrow batches; the only
shuffles are the bucket/hash groupbys, which is how these scale: at
10^12 rows the groupby key space (band buckets / content hashes) is
uniformly hash-distributed, so no hot keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from .text_stats import documents_ds

# deterministic 64-bit mix (splitmix64) for minhash permutations
_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + 0x9E3779B97F4A7C15) & np.uint64(_MASK)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
    return z ^ (z >> np.uint64(31))


def _token_hashes(text: str, shingle: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < shingle:
        toks = toks + [""] * (shingle - len(toks))
    shingles = {" ".join(toks[i : i + shingle]) for i in range(len(toks) - shingle + 1)}
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
         for s in shingles),
        dtype=np.uint64,
        count=len(shingles),
    )


# ---------- exact dedup ----------

def exact_dedup(sf_dir: str):
    """Exact duplicate groups: md5(text) → (first doc_id, group size).

    Hash-partitioned groupby; the per-batch md5 is the map side."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"], "text_md5": pa.array(h)})

    return (
        documents_ds(sf_dir)
        .map_batches(add_hash, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="keep_doc_id"), Count(alias_name="n_dups"))
    )


# ---------- MinHash + LSH ----------

def minhash_signatures(
    sf_dir: str, num_perm: int = 64, shingle: int = 3
) -> ray.data.Dataset:
    """Per-doc minhash signature (num_perm u64 mins over salted hashes)."""

    salts = _splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    def sig(t: pa.Table) -> pa.Table:
        out = np.empty((len(t), num_perm), dtype=np.uint64)
        for i, text in enumerate(t["text"].to_pylist()):
            hs = _token_hashes(text, shingle)
            # salted-xor + splitmix per permutation, vectorized over shingles
            m = _splitmix64(hs[None, :] ^ salts[:, None]).min(axis=1)
            out[i] = m
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sig": pa.array(list(out), pa.list_(pa.uint64(), num_perm)),
            }
        )

    return documents_ds(sf_dir).map_batches(sig, batch_format="pyarrow")


def minhash_lsh_candidates(
    sf_dir: str, num_perm: int = 64, bands: int = 16, shingle: int = 3
) -> ray.data.Dataset:
    """LSH banding: (band_id, band_hash) buckets → candidate pairs.

    Emits one row per (band, bucket) with >= 2 docs; pair expansion happens
    in :func:`minhash_dedup_pairs`. The groupby key (band_id, band_hash)
    is uniformly distributed — no skew at scale."""
    rows_per_band = num_perm // bands

    def to_bands(t: pa.Table) -> pa.Table:
        sigs = np.asarray(t["sig"].to_pylist(), dtype=np.uint64)  # (n, num_perm)
        n = len(sigs)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_ids = np.repeat(t["doc_id"].to_numpy(), bands)
        bh = np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            chunk = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            acc = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                acc = _splitmix64(acc ^ chunk[:, c])
            bh[b::bands] = acc
        return pa.table(
            {"band_id": pa.array(band_ids), "band_hash": pa.array(bh),
             "doc_id": pa.array(doc_ids)}
        )

    return (
        minhash_signatures(sf_dir, num_perm, shingle)
        .map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(
            lambda g: g if len(g) >= 2 else g.iloc[0:0],
            batch_format="pandas",
        )
    )


def minhash_dedup_pairs(
    sf_dir: str, num_perm: int = 64, bands: int = 16, shingle: int = 3,
    jaccard_threshold: float = 0.8,
):
    """Candidate pairs (deduped across bands) verified by exact shingle
    Jaccard — returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    cands = minhash_lsh_candidates(sf_dir, num_perm, bands, shingle)

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame({"doc_a": [p[0] for p in pairs],
                             "doc_b": [p[1] for p in pairs]})

    pairs = (
        cands.groupby(["band_id", "band_hash"])
        .map_groups(expand, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )

    # verification side-table: only texts of candidate docs leave the
    # distributed table (a semi-join pushed down as a vectorized filter);
    # the broadcast is bounded by the LSH candidate count, never by the
    # corpus size
    pair_tbl = pairs.materialize()
    cand_ids = set()
    for b in pair_tbl.select_columns(["doc_a", "doc_b"]).iter_batches(
        batch_format="pyarrow"
    ):
        cand_ids.update(b["doc_a"].to_pylist())
        cand_ids.update(b["doc_b"].to_pylist())
    cand_arr = pa.array(sorted(cand_ids), pa.int64())

    def keep_cands(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=cand_arr))

    docs = {}
    for b in (
        documents_ds(sf_dir)
        .map_batches(keep_cands, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        docs.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
    doc_ref = ray.put(docs)
    pairs = pair_tbl

    def verify(t: pa.Table) -> pa.Table:
        d = ray.get(doc_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(t["doc_a"].to_pylist(), t["doc_b"].to_pylist()):
            ha = set(_token_hashes(d[a], shingle).tolist())
            hb = set(_token_hashes(d[b], shingle).tolist())
            j = len(ha & hb) / max(len(ha | hb), 1)
            if j >= jaccard_threshold:
                out_a.append(a); out_b.append(b); out_j.append(round(j, 6))
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


# ---------- SimHash ----------

def simhash(sf_dir: str, shingle: int = 1):
    """64-bit SimHash over token hashes (sign of summed bit contributions)."""

    def per_doc(t: pa.Table) -> pa.Table:
        out = np.empty(len(t), dtype=np.uint64)
        for i, text in enumerate(t["text"].to_pylist()):
            hs = _token_hashes(text, shingle)
            if len(hs) == 0:
                out[i] = 0
                continue
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out)})

    return documents_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow")


def ngram_jaccard_dedup(sf_dir: str, shingle: int = 3, threshold: float = 0.8):
    """Near-dup pairs by exact n-gram Jaccard over LSH candidates (the
    LSH narrows 10^24 pairs to a verifiable candidate set at scale)."""
    return minhash_dedup_pairs(sf_dir, shingle=shingle, jaccard_threshold=threshold)


# ---------- embedding-cosine near-dup ----------

def embedding_near_dup(sf_dir: str, threshold: float = 0.45):
    """Near-duplicate pairs by embedding cosine >= threshold.

    Exact blocked scan: the (normalized) embedding matrix is broadcast
    once (``ray.put``), each batch computes its block of the similarity
    matrix with one matmul and emits only above-threshold pairs (doc_a <
    doc_b). At 10^12 rows the same stage runs per LSH/IVF bucket instead
    of all-pairs; the batch kernel is unchanged."""
    import pyarrow.parquet as pq

    from .similarity import _normalize, embeddings_ds

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = t["vec_id"].to_numpy()
    m_all = _normalize(np.asarray(t["embedding"].to_pylist(), dtype=np.float64))
    ref = ray.put((ids_all, m_all))

    def block(b: pa.Table) -> pa.Table:
        ids_all, m_all = ray.get(ref)
        ids = b["vec_id"].to_numpy()
        m = _normalize(np.asarray(b["embedding"].to_pylist(), dtype=np.float64))
        sims = m @ m_all.T  # (batch, N)
        rows_a, rows_b, coss = [], [], []
        ii, jj = np.nonzero(sims >= threshold)
        for i, j in zip(ii, jj):
            a, bb = int(ids[i]), int(ids_all[j])
            if a < bb:
                rows_a.append(a); rows_b.append(bb)
                # integer millicosine: exact cross-engine comparability
                coss.append(int(round(float(sims[i, j]) * 1000)))
        return pa.table({"vec_a": pa.array(rows_a, pa.int64()),
                         "vec_b": pa.array(rows_b, pa.int64()),
                         "cosine_milli": pa.array(coss, pa.int64())})

    return embeddings_ds(sf_dir).map_batches(block, batch_format="pyarrow")
