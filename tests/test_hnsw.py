"""HNSW graph ANN: deterministic construction (content-addressed
levels), recall vs exact brute force, and the bucketed pipeline."""

import numpy as np
import pandas as pd
import pytest

from searchenginepp_ray.pipelines.hnsw import HNSWGraph, knn_hnsw


def _brute_topk(vecs, q, k):
    n = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    qn = q / max(float(np.linalg.norm(q)), 1e-30)
    s = n @ qn
    order = np.lexsort((np.arange(len(s)), -s))
    return order[:k]


def test_graph_recall_and_determinism():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(600, 32))
    ids = np.arange(600, dtype=np.int64)
    g1 = HNSWGraph(M=8, ef_construction=64).build(ids, vecs)
    g2 = HNSWGraph(M=8, ef_construction=64).build(ids, vecs)
    hits = total = 0
    for qi in range(40):
        q = vecs[qi]
        got1 = g1.search(q, 10, ef=64)
        got2 = g2.search(q, 10, ef=64)
        assert got1 == got2  # bit-deterministic across builds
        want = set(ids[_brute_topk(vecs, q, 10)].tolist())
        hits += len(want & {i for i, _ in got1})
        total += 10
    assert hits / total >= 0.95, hits / total


def test_heuristic_recall_on_clustered_data():
    """The Algorithm-4 neighbor-selection heuristic's reason to exist:
    at small ef on CLUSTERED data, plain top-M pruning piles every edge
    into the local cluster and strands the search (measured 0.68
    recall@10 at M=8 ef=12 on this fixture); the heuristic's
    spread-across-directions edges keep recall >= 0.95 at the same
    budget."""
    rng = np.random.default_rng(3)
    ids = np.arange(1200, dtype=np.int64)
    cents = rng.normal(size=(12, 32)) * 3
    vecs = cents[np.repeat(np.arange(12), 100)] \
        + rng.normal(size=(1200, 32)) * 0.35
    queries = [cents[i % 12] + rng.normal(size=32) * 0.35
               for i in range(60)]
    g = HNSWGraph(M=8, ef_construction=64).build(ids, vecs)
    hits = total = 0
    for q in queries:
        got = {i for i, _ in g.search(q, 10, ef=12)}
        want = set(ids[_brute_topk(vecs, q, 10)].tolist())
        hits += len(want & got)
        total += 10
    assert hits / total >= 0.95, hits / total


def test_graph_small_and_degenerate():
    g = HNSWGraph(M=4).build(np.array([7], dtype=np.int64),
                             np.ones((1, 4)))
    assert g.search(np.ones(4), 3) == [(7, pytest.approx(1.0))]
    assert HNSWGraph(M=4).search(np.ones(4), 3) == []  # empty graph


def test_graph_exact_on_tiny_input():
    """ef >= n makes layer-0 search exhaustive: results must equal
    brute force exactly, including tie order (sim desc, id asc)."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(50, 8))
    ids = (np.arange(50, dtype=np.int64) * 3 + 1)  # non-dense ids
    g = HNSWGraph(M=6, ef_construction=50).build(ids, vecs)
    for qi in range(10):
        got = [i for i, _ in g.search(vecs[qi], 5, ef=50)]
        want = ids[_brute_topk(vecs, vecs[qi], 5)].tolist()
        assert got == want


def test_knn_hnsw_pipeline_recall(ray_session, sf_dir):
    """Bucketed pipeline vs the exact brute-force twin at sf0.001:
    recall@k bounded below (losses come from nprobe bucket routing,
    not the graphs), output deterministic across runs."""
    from searchenginepp_ray.pipelines.similarity import knn_brute_force

    got = knn_hnsw(sf_dir, n_queries=5, k=5, nlist=4, nprobe=2)
    again = knn_hnsw(sf_dir, n_queries=5, k=5, nlist=4, nprobe=2)
    pd.testing.assert_frame_equal(got, again)
    exact = knn_brute_force(sf_dir, n_queries=5, k=5)
    if hasattr(exact, "to_pandas"):
        exact = exact.to_pandas()
    hits = total = 0
    for qid in got["query_id"].unique():
        g = set(got.loc[got["query_id"] == qid, "neighbor_id"])
        e = set(exact.loc[exact["query_id"] == qid, "neighbor_id"])
        hits += len(g & e)
        total += len(e)
    assert hits / total >= 0.7, hits / total  # nprobe=2 of 4 buckets
