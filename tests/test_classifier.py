"""Distributed logistic-regression trainer vs a sequential reference."""
import hashlib

import numpy as np
import pandas as pd
import pytest


def _sequential_logreg(sf_dir, dims, iters, lr, pos_lang):
    """Single-process reference: same tokenization (via the pipeline's
    own word splitter run per doc), same md5 bucket rule, same rounding."""
    import duckdb

    con = duckdb.connect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    rows = con.execute("""
        SELECT doc_id, list_filter(
            regexp_split_to_array(lower(text), '[^a-z0-9]+'),
            t -> t <> '') AS w
        FROM docs ORDER BY doc_id""").fetchall()
    n_docs = len(docs)
    X = np.zeros((n_docs, dims + 1))
    pos = {d: i for i, d in enumerate(sorted(docs["doc_id"]))}
    for doc_id, words in rows:
        i = pos[doc_id]
        for t in words:
            j = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dims
            X[i, j] += 1.0
        if words:
            X[i, :dims] /= len(words)
    X[:, dims] = 1.0
    lang = docs.sort_values("doc_id")["lang"].to_numpy()
    y = (lang == pos_lang).astype(np.float64)

    def r9(v):
        return np.floor(v * 1e9 + 0.5) / 1e9

    w = np.zeros(dims + 1)
    losses = []
    for _ in range(iters):
        p = 1 / (1 + np.exp(-(X @ w)))
        eps = 1e-12
        losses.append(float(-np.mean(y * np.log(p + eps)
                                     + (1 - y) * np.log(1 - p + eps))))
        g = r9(X.T @ (p - y) / n_docs)
        w = r9(w - lr * g)
    p = 1 / (1 + np.exp(-(X @ w)))
    losses.append(float(-np.mean(y * np.log(p + 1e-12)
                                 + (1 - y) * np.log(1 - p + 1e-12))))
    return w, losses


def test_logreg_train_matches_sequential(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.classifier import logreg_train

    dims, iters, lr = 64, 5, 0.5
    got = logreg_train(sf_dir, dims=dims, iters=iters, lr=lr,
                       pos_lang="en")
    w_ref, losses = _sequential_logreg(sf_dir, dims, iters, lr, "en")
    assert got["dim"].tolist() == list(range(dims + 1))
    np.testing.assert_allclose(got["weight"].to_numpy(), w_ref,
                               rtol=0, atol=1e-12)
    # training actually descends the loss
    assert losses[-1] < losses[0]
    assert not np.allclose(got["weight"].to_numpy(), 0.0)
