"""Text-analysis pipelines over the ``documents`` table
(doc_id, text, lang, source, n_chars) — language-ID, quality scoring,
token counting, document fingerprinting — plus the index-adjacent
aggregates (per-term df/tf, doclen metadata) under the SQL-expressible
SIMPLE normalizer profile so every one of them has a DuckDB oracle.

The Python tokenizer and the generated SQL in :mod:`..pipelines.oracle_sql`
share the exact same punctuation class, so term boundaries agree
token-for-token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..config import SIMPLE_PROFILE
from ..normalizer.word_normalizer import normalize_tokens

#: small embedded stopword list for quality/langid scoring (kept tiny and
#: embedded verbatim in the oracle SQL's IN (...) list)
QUALITY_STOPS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on",
    "with", "as", "this", "that", "at", "by", "an", "be", "or", "are",
)

FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3
MASK64 = (1 << 64) - 1


def documents_ds(sf_dir: str, columns=("doc_id", "text")) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _tokenize_batch(batch: pa.Table) -> pa.Table:
    toks = [normalize_tokens(t, SIMPLE_PROFILE) for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "tokens": pa.array(toks, pa.list_(pa.string())),
        }
    )


def tokens_ds(sf_dir: str) -> ray.data.Dataset:
    return documents_ds(sf_dir).map_batches(_tokenize_batch, batch_format="pyarrow")


# ---------- doclen / metadata aggregates (A3/A4) ----------

def doclen_stats(sf_dir: str):
    """Global (n_docs, sum_doclen, avgdl) — the reference's collection
    metadata (reference src/builder.cpp:177-181) under the simple profile."""
    per_doc = tokens_ds(sf_dir).map_batches(
        lambda t: pa.table(
            {"doclen": pc.list_value_length(t["tokens"]).cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    n = per_doc.count()
    s = per_doc.sum("doclen")
    import pandas as pd

    return pd.DataFrame(
        {"n_docs": [n], "sum_doclen": [s], "avgdl": [s / n if n else 0.0]}
    )


def token_count(sf_dir: str):
    """Per-document token count (doclen) + distinct-term count."""
    def per_doc(t: pa.Table) -> pa.Table:
        toks = t["tokens"]
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        n_distinct = pa.array(
            [len(set(x)) for x in toks.to_pylist()], pa.int64()
        )
        return pa.table(
            {"doc_id": t["doc_id"], "n_tokens": n_tokens, "n_distinct": n_distinct}
        )

    return tokens_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow")


# ---------- per-term aggregates (A1/A2) ----------

def term_df(sf_dir: str):
    """Per-term document frequency: per-batch partials (terms deduped per
    doc) + a small groupby-sum — the partial/final pattern replacing the
    reference's k-way lexicon merge (reference src/builder.cpp:127-170)."""

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pa.array([sorted(set(x)) for x in t["tokens"].to_pylist()],
                     pa.list_(pa.string()))
        )
        vc = flat.value_counts()
        return pa.table({"term": vc.field("values"),
                         "df_part": vc.field("counts").cast(pa.int64())})

    return (
        tokens_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(4)  # vocabulary-sized partials: keep the shuffle tiny
        .groupby("term")
        .aggregate(Sum("df_part", alias_name="df"))
    )


def term_tf(sf_dir: str):
    """Per-term total collection frequency."""

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(t["tokens"])
        vc = flat.value_counts()
        return pa.table({"term": vc.field("values"),
                         "tf_part": vc.field("counts").cast(pa.int64())})

    return (
        tokens_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(4)  # vocabulary-sized partials: keep the shuffle tiny
        .groupby("term")
        .aggregate(Sum("tf_part", alias_name="tf"))
    )


# ---------- quality scoring / language id ----------

def quality_score(sf_dir: str):
    """Per-doc quality features: token count, distinct ratio, stopword
    ratio, mean token length (rounded to 6 dp for oracle comparability)."""

    def per_doc(t: pa.Table) -> pa.Table:
        rows = t["tokens"].to_pylist()
        n_tok = np.array([len(x) for x in rows], dtype=np.int64)
        n_dis = np.array([len(set(x)) for x in rows], dtype=np.int64)
        stops = set(QUALITY_STOPS)
        n_stop = np.array([sum(1 for w in x if w in stops) for x in rows], dtype=np.int64)
        tot_len = np.array([sum(len(w) for w in x) for x in rows], dtype=np.int64)
        safe = np.maximum(n_tok, 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok),
                "distinct_ratio": pa.array(np.round(n_dis / safe, 6)),
                "stopword_ratio": pa.array(np.round(n_stop / safe, 6)),
                "mean_token_len": pa.array(np.round(tot_len / safe, 6)),
            }
        )

    return tokens_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow")


def lang_id(sf_dir: str, threshold: float = 0.08):
    """Heuristic language ID: stopword-hit ratio >= threshold ⇒ 'en'."""

    def per_doc(t: pa.Table) -> pa.Table:
        rows = t["tokens"].to_pylist()
        stops = set(QUALITY_STOPS)
        ratio = np.array(
            [sum(1 for w in x if w in stops) / max(len(x), 1) for x in rows]
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(np.where(ratio >= threshold, "en", "unk")),
            }
        )

    return tokens_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow")


# ---------- document fingerprinting ----------

def fingerprint(sf_dir: str):
    """Order-sensitive 64-bit FNV-1a rolling fingerprint over the token
    stream (whole-document fingerprint; non-SQL-expressible → rows-only
    oracle check)."""

    def per_doc(t: pa.Table) -> pa.Table:
        out = np.empty(len(t), dtype=np.uint64)
        for i, toks in enumerate(t["tokens"].to_pylist()):
            h = FNV_OFFSET
            for w in toks:
                for b in w.encode():
                    h = ((h ^ b) * FNV_PRIME) & MASK64
                h = ((h ^ 0x20) * FNV_PRIME) & MASK64
            out[i] = h
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(out)})

    return tokens_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow")


# ---------- BPE-ish token counting ----------

#: "BPE-ish" pre-tokenizer pattern (GPT2-style shape, restricted to
#: classes expressible identically in Python re and DuckDB RE2):
#: optional-space letter runs / digit runs / symbol runs, else whitespace.
BPE_PATTERN = r" ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9 \t\n\v\f\r]+|[ \t\n\v\f\r]+"

_BPE_RE = None


def bpe_token_count(sf_dir: str):
    """Per-doc subword-ish token count via the BPE pre-tokenizer regex
    (whitespace-run matches excluded from the count, as BPE merges them
    into following tokens)."""
    import re

    def per_doc(t: pa.Table) -> pa.Table:
        global _BPE_RE
        if _BPE_RE is None:
            _BPE_RE = re.compile(BPE_PATTERN)
        ws = re.compile(r"[ \t\n\v\f\r]+$")
        counts = np.array(
            [
                sum(1 for m in _BPE_RE.findall(x) if not ws.match(m))
                for x in t["text"].to_pylist()
            ],
            dtype=np.int64,
        )
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": pa.array(counts)})

    return documents_ds(sf_dir).map_batches(per_doc, batch_format="pyarrow")
