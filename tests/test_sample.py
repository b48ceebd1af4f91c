"""Deterministic sampling vs the SQL oracle; HLL accuracy + merge laws."""

import duckdb
import numpy as np
import pandas as pd

from searchenginepp_ray.pipelines.sample import (
    _hll_estimate,
    _hll_registers,
    _threshold_hex,
    deterministic_sample,
    hll_distinct_terms,
)


def test_deterministic_sample_matches_oracle_and_is_stable(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.oracle_sql import deterministic_sample_sql

    got = (
        deterministic_sample(sf_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = (
        con.sql(deterministic_sample_sql()).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert 0 < len(got) < 500
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # stability: a rerun selects the identical row set
    again = (
        deterministic_sample(sf_dir).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(again["doc_id"]) == list(got["doc_id"])


def test_threshold_hex():
    assert _threshold_hex(0.1) == "1999"
    assert _threshold_hex(0.5) == "8000"
    assert _threshold_hex(0.0) == "0000"


def test_hll_estimate_large_cardinality():
    rng = np.random.default_rng(3)
    for true_n in (10_000, 1_000_000):
        h = rng.integers(0, 2**64, true_n, dtype=np.uint64)
        est = _hll_estimate(_hll_registers(h))
        assert abs(est - true_n) / true_n < 0.03  # 3 sigma of ~0.8%


def test_hll_registers_merge_is_max():
    rng = np.random.default_rng(4)
    h = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
    whole = _hll_registers(h)
    merged = np.maximum(_hll_registers(h[:20_000]), _hll_registers(h[20_000:]))
    assert np.array_equal(whole, merged)


def test_hll_distinct_terms_small_corpus_exact(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.text_stats import term_df

    est = hll_distinct_terms(sf_dir)["distinct_terms_est"][0]
    exact = term_df(sf_dir).count()
    # tiny vocabulary -> linear-counting regime is exact
    assert est == exact


def test_dataset_split_disjoint_stable_salted(ray_session):
    from searchenginepp_ray.pipelines.sample import dataset_split

    sf = "/root/testdata/sf0.01"
    a = dataset_split(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = dataset_split(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # rerun-stable
    assert set(a["split"].unique()) <= {"train", "val", "test"}
    assert len(a) == a["doc_id"].nunique()  # exhaustive + disjoint
    # fractions in the right ballpark (md5 uniformity, 500 docs)
    frac = a["split"].value_counts(normalize=True)
    assert 0.6 <= frac.get("train", 0) <= 0.95
    assert 0.02 <= frac.get("val", 0) <= 0.25
    assert 0.02 <= frac.get("test", 0) <= 0.25
    # a different salt reshuffles assignments
    c = dataset_split(sf, salt="other").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert (c["split"] != a["split"]).any()
