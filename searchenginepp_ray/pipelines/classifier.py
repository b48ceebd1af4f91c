"""Supervised model training as a distributed pipeline — logistic
regression by full-batch gradient descent over hashed bag-of-words
features (the fastText-style linear document classifier every
training-data curation stack ends up needing for quality / domain /
language scoring, trained on the corpus itself).

The supervised complement of ``similarity.kmeans_embeddings``: same
determinism contract (every driver-side state update rounded to the
shared ``floor(x·1e9+0.5)/1e9`` grid so both engines iterate on
IDENTICAL doubles; feature hashing via the portable ``duck.md5_bucket``
rule the SQL oracle evaluates verbatim), so the unrolled-CTE DuckDB
oracle is hash-exact on the final weight vector.

Scale shape: feature extraction touches the TEXT exactly once — one
streaming tokenize+hash pass materializes a dense
``(doc_id, label, dims+1 floats)`` feature dataset (65 doubles/doc —
orders of magnitude smaller than the corpus; the object store spills
it at 100 TB). Each GD iteration is then ONE streaming pass over the
features producing a single ``(dims+1)``-float gradient partial per
batch — driver traffic per iteration is ``P × (dims+1)`` floats, the
weight vector broadcasts via the task closure, and nothing text-sized
moves after pass 1. Full-batch (not SGD) is the deterministic choice:
the gradient is a pure data-parallel sum, so the result is independent
of partitioning, scheduling and batch order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .similarity import _round9_half_up


def _features_ds(sf_dir: str, dims: int, pos_lang: str) -> ray.data.Dataset:
    """One tokenize+hash pass → materialized dense feature dataset:
    (doc_id, y, x: FixedSizeList<double>[dims+1]). Feature j<dims is
    the doc's token count in md5-bucket j divided by its token count
    (empty docs: all zeros); feature dims is the bias 1.0."""
    from .duck import md5_bucket
    from .filters import _words_flat
    from .text_stats import documents_ds

    D = int(dims)

    def feats(t: pa.Table) -> pa.Table:
        n = len(t)
        doc_idx, flat, n_tokens = _words_flat(t["text"])
        X = np.zeros((n, D + 1), np.float64)
        if len(flat):
            b = md5_bucket(flat, D).to_numpy(zero_copy_only=False)
            np.add.at(X, (doc_idx, b), 1.0)
            nz = n_tokens > 0
            X[nz, :D] /= n_tokens[nz, None]
        X[:, D] = 1.0  # bias
        lang = t["lang"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "y": pa.array((lang == pos_lang).astype(np.float64)),
            "x": pa.FixedSizeListArray.from_arrays(
                pa.array(X.reshape(-1)), D + 1),
        })

    return documents_ds(sf_dir, columns=("doc_id", "text", "lang")) \
        .map_batches(feats, batch_format="pyarrow").materialize()


def logreg_train(sf_dir: str, dims: int = 64, iters: int = 5,
                 lr: float = 0.5, pos_lang: str = "en") -> pd.DataFrame:
    """Train ``is the doc in pos_lang?`` by ``iters`` full-batch GD
    steps from w=0: ``w ← round9(w − lr · round9(Σ x·(σ(x·w) − y) / N))``.
    Returns (dim, weight) — dims+1 rows, bias last — exactly
    reproducible across engines (see module docstring)."""
    D = int(dims)
    feats = _features_ds(sf_dir, D, pos_lang)
    n_total = feats.count()

    w = np.zeros(D + 1, np.float64)
    for _ in range(int(iters)):
        w_now = w.copy()  # broadcast via the task closure

        def grad_partial(t: pa.Table) -> pa.Table:
            x = t["x"]
            if isinstance(x, pa.ChunkedArray):
                x = x.combine_chunks()
            X = np.asarray(x.values).reshape(-1, D + 1)
            y = t["y"].to_numpy(zero_copy_only=False)
            p = 1.0 / (1.0 + np.exp(-(X @ w_now)))
            g = X.T @ (p - y)
            return pa.table({"j": pa.array(np.arange(D + 1, dtype=np.int64)),
                             "g": pa.array(g)})

        parts = feats.map_batches(
            grad_partial, batch_format="pyarrow").to_pandas()
        g = parts.groupby("j")["g"].sum().reindex(
            range(D + 1), fill_value=0.0).to_numpy()
        w = _round9_half_up(w - lr * _round9_half_up(g / n_total))

    return pd.DataFrame({"dim": np.arange(D + 1, dtype=np.int64),
                         "weight": w})
