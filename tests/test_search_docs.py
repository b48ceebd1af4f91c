"""Composed serving pipelines over the documents index."""

def test_search_did_you_mean_corrections(ray_session, sf_dir):
    """The composition equals its one-statement SQL oracle on sf0.001
    (correction layer + BM25 stack), results are deterministic across
    runs, and every returned query ranks contiguously from 1."""
    import duckdb
    import pandas as pd

    from searchenginepp_ray.pipelines.oracle_sql import \
        search_did_you_mean_sql
    from searchenginepp_ray.pipelines.search_docs import (
        DYM_QUERIES, search_did_you_mean)

    got = search_did_you_mean(sf_dir).reset_index(drop=True)
    again = search_did_you_mean(sf_dir).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)
    assert set(got["query_id"]) <= set(range(len(DYM_QUERIES)))
    for _, g in got.groupby("query_id"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'")
    want = con.sql(search_did_you_mean_sql()).df() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert got["doc_id"].tolist() == want["doc_id"].astype(int).tolist()
    # both sides round to the 6-dp grid -> exact equality, not allclose
    assert got["score"].tolist() == want["score"].tolist()
