"""Feature-hashed TF-IDF embedding generation: long format vs the DuckDB
oracle, dense pivot vs the long rows, and the embed→ANN composition."""

import duckdb
import numpy as np
import pandas as pd

from searchenginepp_ray.pipelines.embed import (
    DIMS,
    doc_embedding,
    doc_embedding_vectors,
)
from searchenginepp_ray.pipelines.oracle_sql import doc_embedding_sql


def test_doc_embedding_matches_duckdb(ray_session, sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    got = doc_embedding(sf_dir).to_pandas().sort_values(
        ["doc_id", "dim"]).reset_index(drop=True)
    want = con.execute(doc_embedding_sql()).df().sort_values(
        ["doc_id", "dim"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["dim"].tolist() == want["dim"].tolist()
    np.testing.assert_allclose(got["weight"], want["weight"], atol=1e-6)


def test_dense_pivot_matches_long(ray_session, sf_dir):
    long = doc_embedding(sf_dir).to_pandas()
    dense = doc_embedding_vectors(sf_dir).to_pandas()
    assert set(dense["doc_id"]) == set(long["doc_id"])
    vecs = {r.doc_id: np.asarray(r.embedding) for r in dense.itertuples()}
    for _, row in long.sample(200, random_state=0, replace=True).iterrows():
        assert abs(vecs[row.doc_id][int(row.dim)] - row.weight) < 1e-5
    # off-dims are exactly zero
    d0 = long[long["doc_id"] == long["doc_id"].iloc[0]]
    v0 = vecs[d0["doc_id"].iloc[0]]
    zero_dims = set(range(DIMS)) - set(d0["dim"])
    assert all(v0[d] == 0.0 for d in zero_dims)


def test_embedding_feeds_knn(ray_session, sf_dir):
    """Composition: generated embeddings are a valid ANN input — cosine
    top-k over them finds each doc as its own nearest neighbor."""
    dense = doc_embedding_vectors(sf_dir).to_pandas()
    mat = np.stack(dense["embedding"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    assert (norms > 0).all()
    mn = mat / norms[:, None]
    sims = mn[:5] @ mn.T
    ids = dense["doc_id"].to_numpy()
    for qi in range(5):
        assert ids[np.argmax(sims[qi])] == ids[qi]


def test_text_knn_self_top1(ray_session):
    """Every query doc's nearest neighbor by its own generated embedding
    is itself (cosine 1.0)."""
    from searchenginepp_ray.pipelines.embed import text_knn

    df = text_knn("/root/testdata/sf0.01", n_queries=3, k=3).to_pandas()
    for qid, g in df.groupby("query_id"):
        g = g.sort_values("rank")
        assert g.iloc[0]["neighbor_id"] == qid
        assert abs(g.iloc[0]["cosine"] - 1.0) < 1e-9
