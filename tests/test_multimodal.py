"""Multimodal plumbing: schema, actor-pool decode stage, resize math,
deterministic fake-codec outputs (the decode itself is stubbed — real
codecs raise NotImplementedError, pinned here)."""

import numpy as np
import pytest

from searchenginepp_ray.pipelines import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_fake_codec_real_path_raises():
    with pytest.raises(NotImplementedError):
        mm.FakeCodec(real=True)


def test_media_schema(ray_session):
    t = mm.media_ds(SF).take_batch(10, batch_format="pyarrow")
    assert t.schema.equals(mm.MEDIA_SCHEMA)
    kinds = set(t["kind"].to_pylist())
    assert kinds <= set(mm.MEDIA_KINDS)


def test_media_features_actor_pool(ray_session):
    out = mm.media_features(SF, concurrency=2).take_all()
    assert len(out) == 500  # sf0.001 documents rows
    by_kind = {}
    for r in out:
        by_kind.setdefault(r["kind"], []).append(r)
        assert r["n_samples"] > 0
        assert 0 <= r["mean_value"] <= 255 or r["kind"] == "audio"
    assert set(by_kind) == set(mm.MEDIA_KINDS)
    # deterministic: image decode = first w*h payload bytes
    img = next(r for r in out if r["kind"] == "image")
    assert img["n_samples"] > 0


def test_image_decode_matches_bytes():
    codec = mm.FakeCodec()
    a = codec.decode_image(b"\x01\x02\x03\x04\x05\x06", 3, 2)
    assert a.tolist() == [[1, 2, 3], [4, 5, 6]]
    # short payload → zero padding
    b = codec.decode_image(b"\xff", 2, 2)
    assert b.tolist() == [[255, 0], [0, 0]]


def test_audio_decode_centered():
    codec = mm.FakeCodec()
    a = codec.decode_audio(bytes([0, 128, 255]))
    assert a == pytest.approx([-1.0, 0.0, 127 / 128])


def test_video_frame_shape():
    codec = mm.FakeCodec()
    v = codec.decode_video(b"abcdef", 2, 2, 3)
    assert v.shape == (3, 2, 2)


def test_resize_block_mean():
    codec = mm.FakeCodec()
    img = codec.decode_image(bytes(range(16)), 4, 4).astype(np.float64)
    small = img.reshape(2, 2, 2, 2).mean(axis=(1, 3))
    assert small.tolist() == [[2.5, 4.5], [10.5, 12.5]]


def test_image_resize_pipeline(ray_session):
    rows = mm.image_resize(SF, out=4, concurrency=2).take_all()
    assert rows and all(r["out_h"] == 4 and r["out_w"] == 4 for r in rows)


def test_media_byte_stats_matches_text_bytes(ray_session):
    import duckdb

    got = (
        mm.media_byte_stats(SF)
        .to_pandas()
        .sort_values("kind")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS kind,
               count(*) AS n_items,
               sum(octet_length(encode(text))) AS total_bytes
        FROM read_parquet('{SF}/documents.parquet')
        GROUP BY 1 ORDER BY 1
        """
    ).df()
    assert got["kind"].tolist() == want["kind"].tolist()
    assert got["n_items"].tolist() == want["n_items"].tolist()
    assert got["total_bytes"].astype(int).tolist() == want["total_bytes"].astype(int).tolist()


def test_frame_sample_matches_stub_decode(ray_session, sf_dir):
    """Every sampled frame's md5 equals a direct stub decode of the
    same payload; stride actually skips frames."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from searchenginepp_ray.pipelines.multimodal import (FakeCodec,
                                                         frame_sample)

    got = (frame_sample(sf_dir, stride=2, concurrency=2).to_pandas()
           .sort_values(["media_id", "frame_idx"]).reset_index(drop=True))
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    codec = FakeCodec()
    want = {}
    for _, row in t.iterrows():
        if row["doc_id"] % 3 != 2 or not row["text"]:
            continue
        payload = row["text"].encode()
        nb = len(payload)
        w = 8 if nb >= 64 else 4
        h = max(nb // w, 1)
        nf = nb % 7 + 2
        vid = codec.decode_video(payload, w, h, nf)
        for f in range(0, nf, 2):
            want[(row["doc_id"], f)] = hashlib.md5(
                vid[f].tobytes()).hexdigest()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(r["media_id"], r["frame_idx"])] == r["frame_md5"]
    assert (got["frame_idx"] % 2 == 0).all()
