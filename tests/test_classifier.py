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


def _scalar_nb(docs: pd.DataFrame) -> dict[int, str]:
    """Sequential multinomial-NB reference: whitespace/lower tokenize,
    add-one smoothing, 6 dp grid argmax with lang-ASC tie-break."""
    import re

    toks = {int(r.doc_id): [t for t in re.split(r"[^a-z0-9]+", r.text.lower())
                            if t]
            for r in docs.itertuples()}
    langs = sorted(set(docs["lang"]))
    nd = {l: (docs["lang"] == l).sum() for l in langs}
    n_total = len(docs)
    vocab = {t for ws in toks.values() for t in ws}
    V = len(vocab)
    tl = {l: 0 for l in langs}
    ctf: dict[tuple[str, str], int] = {}
    for r in docs.itertuples():
        for t in toks[int(r.doc_id)]:
            tl[r.lang] += 1
            ctf[(t, r.lang)] = ctf.get((t, r.lang), 0) + 1
    out = {}
    for r in docs.itertuples():
        ws = toks[int(r.doc_id)]
        if not ws:
            continue
        best = None
        for l in langs:
            s = np.log2(nd[l] / n_total)
            for t in ws:
                s += np.log2(ctf.get((t, l), 0) + 1.0)
            s -= len(ws) * np.log2(tl[l] + V)
            s = np.floor(s * 1e6 + 0.5) / 1e6
            if best is None or s > best[0]:
                best = (s, l)
        out[int(r.doc_id)] = best[1]
    return out


def test_naive_bayes_lang_constructed(ray_session, tmp_path):
    """Disjoint-vocabulary langs classify diagonally; a mixed doc and a
    zero-token doc exercise the argmax and the exclusion rule; both the
    Ray pipeline and the DuckDB oracle must match the scalar NB."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchenginepp_ray.pipelines.classifier import naive_bayes_lang
    from searchenginepp_ray.pipelines.oracle_sql import naive_bayes_lang_sql

    rows = [
        (1, "aa bb aa cc", "en"), (2, "aa bb bb", "en"),
        (3, "xx yy xx zz", "fr"), (4, "yy zz zz", "fr"),
        (5, "aa xx", "en"),          # mixed vocabulary
        (6, "...", "fr"),            # zero tokens -> excluded
        (7, "bb cc cc", "fr"),       # mislabeled on purpose
    ]
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    docs["source"] = "s"
    docs["n_chars"] = docs["text"].str.len()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   tmp_path / "documents.parquet")

    want_pred = _scalar_nb(docs)
    want = (pd.DataFrame(
        [(docs.loc[docs.doc_id == d, "lang"].iloc[0], p)
         for d, p in want_pred.items()],
        columns=["lang", "lang_pred"])
        .groupby(["lang", "lang_pred"], as_index=False).size()
        .rename(columns={"size": "n_docs"})
        .sort_values(["lang", "lang_pred"]).reset_index(drop=True))
    assert set(want_pred) == {1, 2, 3, 4, 5, 7}  # doc 6 excluded
    assert want_pred[1] == "en" and want_pred[3] == "fr"  # diagonal core

    got = (naive_bayes_lang(str(tmp_path)).to_pandas()
           .sort_values(["lang", "lang_pred"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    oracle = (con.sql(naive_bayes_lang_sql()).df()
              .sort_values(["lang", "lang_pred"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(oracle, want, check_dtype=False)
