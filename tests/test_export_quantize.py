"""shard_export (pipelines/export.py) and embedding_quantize
(pipelines/similarity.py): file/manifest agreement, determinism,
coverage, and quantization error bounds."""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq


def test_shard_export_files_match_manifest(ray_session, sf_dir, tmp_path):
    from searchenginepp_ray.pipelines.export import shard_export

    out = str(tmp_path / "shards")
    manifest = shard_export(sf_dir, n_shards=4, out_dir=out).to_pandas()
    manifest = manifest.sort_values("shard_id").reset_index(drop=True)
    assert manifest["shard_id"].tolist() == [0, 1, 2, 3]

    total = 0
    for row in manifest.itertuples():
        t = pq.read_table(os.path.join(out, f"shard={row.shard_id}.parquet"))
        assert len(t) == row.n_docs
        ids = t["doc_id"].to_numpy()
        assert (np.diff(ids) > 0).all()  # sorted, unique
        got_md5 = hashlib.md5(
            ",".join(str(i) for i in ids).encode()).hexdigest()
        assert got_md5 == row.ids_md5
        total += len(t)
    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert total == n_docs  # full coverage, no dup or drop


def test_shard_export_deterministic(ray_session, sf_dir, tmp_path):
    from searchenginepp_ray.pipelines.export import shard_export

    a = shard_export(sf_dir, n_shards=4,
                     out_dir=str(tmp_path / "a")).to_pandas()
    b = shard_export(sf_dir, n_shards=4,
                     out_dir=str(tmp_path / "b")).to_pandas()
    a = a.sort_values("shard_id").reset_index(drop=True)
    b = b.sort_values("shard_id").reset_index(drop=True)
    assert a.equals(b)


def test_embedding_quantize_bounds_and_reconstruction(ray_session, sf_dir):
    from searchenginepp_ray.pipelines.similarity import (
        _vec_matrix, embedding_quantize, embeddings_ds)

    codes = embedding_quantize(sf_dir).to_pandas()
    assert codes["code"].between(0, 255).all()

    # exact per-dim min/max from a direct read
    t = embeddings_ds(sf_dir).to_pandas()
    import pyarrow as pa

    m = _vec_matrix(pa.array(list(t["embedding"])))
    mn, mx = m.min(axis=0), m.max(axis=0)
    span = mx - mn

    wide = codes.pivot(index="vec_id", columns="dim", values="code")
    wide = wide.sort_index()
    order = np.argsort(t["vec_id"].to_numpy())
    m_sorted = m[order]
    recon = mn + wide.to_numpy() * span / 255.0
    err = np.abs(recon - m_sorted)
    # half-step quantization error bound per element
    assert (err <= span / 510.0 + 1e-12).all()
    # min and max of each dim code to 0 / 255 exactly
    assert (wide.to_numpy().min(axis=0) == 0).all()
    assert (wide.to_numpy().max(axis=0) == 255).all()


def test_chunk_documents_constructed(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from searchenginepp_ray.pipelines.export import chunk_documents

    texts = [
        " ".join(f"t{i}" for i in range(70)),  # 70 tokens: chunks at 0,24,48
        "a b c",                                # shorter than size -> 1 chunk
        " ".join(f"x{i}" for i in range(24)),   # exactly one stride -> 1 chunk
        "",                                     # empty -> no chunks
    ]
    path = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }), path)
    got = (
        chunk_documents(path, size=32, stride=24)
        .to_pandas().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 0, 0, 1, 2]
    assert got["chunk_idx"].tolist() == [0, 1, 2, 0, 0]
    # 70 tokens, size 32 stride 24: lens 32, 32, 70-48=22
    assert got["n_tokens"].tolist() == [32, 32, 22, 3, 24]
    import hashlib

    toks = texts[0].split()
    expect0 = hashlib.md5(" ".join(toks[0:32]).encode()).hexdigest()
    expect1 = hashlib.md5(" ".join(toks[24:56]).encode()).hexdigest()
    expect2 = hashlib.md5(" ".join(toks[48:70]).encode()).hexdigest()
    assert got["chunk_md5"].tolist()[:3] == [expect0, expect1, expect2]


def test_training_export_shards_and_exclusions(ray_session, sf_dir, tmp_path):
    import pandas as pd

    from searchenginepp_ray.pipelines.clean import corpus_clean
    from searchenginepp_ray.pipelines.export import training_export
    from searchenginepp_ray.pipelines.filters import decontaminate

    out = str(tmp_path / "train")
    manifest = (
        training_export(sf_dir, n_shards=4, out_dir=out)
        .to_pandas().sort_values("shard_id").reset_index(drop=True)
    )
    assert manifest["n_chunks"].sum() > 0

    shard_rows = []
    for row in manifest.itertuples():
        t = pq.read_table(os.path.join(out, f"shard={row.shard_id}.parquet"))
        assert len(t) == row.n_chunks
        keys = [f"{d}:{c}" for d, c in
                zip(t["doc_id"].to_pylist(), t["chunk_idx"].to_pylist())]
        assert hashlib.md5(",".join(keys).encode()).hexdigest() == row.ids_md5
        # chunk text is real (non-empty strings)
        assert all(len(s) > 0 for s in t["chunk_text"].to_pylist())
        shard_rows.append(t.to_pandas())
    docs = pd.concat(shard_rows)["doc_id"].unique()

    # no benchmark docs, no contaminated docs, only quality keepers
    assert (docs % 97 != 0).all()
    cont = decontaminate(sf_dir).to_pandas()
    cont_ids = set(cont.loc[cont["contaminated"], "doc_id"])
    assert not (set(docs) & cont_ids)
    keep_ids = set(corpus_clean(sf_dir).to_pandas()["doc_id"])
    assert set(docs) <= keep_ids


def test_sequence_pack_matches_naive(ray_session, tmp_path):
    """Multi-range prefix sum vs a sequential cumsum reference,
    including empty docs and docs spanning sequence boundaries."""
    import pandas as pd
    import pyarrow as pa

    from searchenginepp_ray.config import SIMPLE_PROFILE
    from searchenginepp_ray.normalizer.batch import tokenize_batch
    from searchenginepp_ray.pipelines.export import sequence_pack

    rng = np.random.RandomState(5)
    texts = [" ".join(rng.choice(["aa", "bb", "cc"], rng.randint(0, 30)))
             for _ in range(40)]
    path = str(tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), path, row_group_size=7)
    L = 16
    got = (sequence_pack(path, seq_len=L, range_size=6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    doclens, _, _ = tokenize_batch(texts, SIMPLE_PROFILE)
    start = 0
    rows = []
    for i, n in enumerate(int(x) for x in doclens):
        rows.append((i, n, start,
                     start // L if n else -1,
                     (start + n - 1) // L if n else -1))
        start += n
    want = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "start_tok",
                                       "first_seq", "last_seq"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # stream coverage: consecutive docs tile the token stream
    nz = want
    assert (nz["start_tok"].to_numpy()[1:]
            == (nz["start_tok"] + nz["n_tokens"]).to_numpy()[:-1]).all()


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "documents.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }), path)
    return path


def _cdc_naive(texts, divisor):
    import re

    rows = []
    for d, t in enumerate(texts):
        toks = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        cur, ci = [], 0
        for w in toks:
            cur.append(w)
            if int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % divisor == 0:
                rows.append((d, ci, len(cur),
                             hashlib.md5(" ".join(cur).encode()).hexdigest()))
                ci += 1
                cur = []
        if cur:
            rows.append((d, ci, len(cur),
                         hashlib.md5(" ".join(cur).encode()).hexdigest()))
    seen, out = set(), []
    for r in sorted(rows):
        keep = 1 if r[3] not in seen else 0
        seen.add(r[3])
        out.append(r + (keep,))
    return out


def test_cdc_chunk_dedup_matches_naive(ray_session, tmp_path):
    from searchenginepp_ray.pipelines.export import cdc_chunk_dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(0, 60)))
             for _ in range(25)] + ["", "Solo-token"]
    _write_docs(tmp_path, texts)
    got = (cdc_chunk_dedup(str(tmp_path), divisor=8).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    want = _cdc_naive(texts, 8)
    assert [tuple(r) for r in got.to_numpy()] == want


def test_cdc_chunking_is_edit_robust(ray_session, tmp_path):
    """The CDC property fixed-stride chunking lacks: inserting a token
    near the front re-chunks ONLY the first chunk — every later chunk is
    byte-identical, so chunk-level dedup still matches doc B's tail
    against doc A's."""
    from searchenginepp_ray.pipelines.export import cdc_chunk_dedup

    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in rng.integers(0, 50, size=200)]
    a = " ".join(words)
    b = " ".join(["inserted"] + words)
    _write_docs(tmp_path, [a, b])
    got = cdc_chunk_dedup(str(tmp_path), divisor=8).to_pandas()
    ca = got[got["doc_id"] == 0].sort_values("chunk_idx")
    cb = got[got["doc_id"] == 1].sort_values("chunk_idx")
    assert len(ca) > 3  # the corpus really produced several chunks
    # tails align: everything after each doc's first chunk is identical
    assert ca["chunk_md5"].tolist()[1:] == cb["chunk_md5"].tolist()[1:]
    # and the aligned tail of doc 1 is all duplicate (keep=0)
    assert (cb["keep"].tolist()[1:] == [0] * (len(cb) - 1))
