"""Multimodal plumbing: schema, actor-pool decode stage, resize math,
deterministic fake-codec outputs, and the REAL vendored codec tiers —
BMP/WAV/AVI, compressed PNG, and lossy baseline JPEG — each pinned by
hand-assembled spec fixtures (raw struct bytes, independent of the
encoders), round-trips, and failure-path contracts."""

import os

import pyarrow.parquet as pq

import numpy as np
import pytest

from searchenginepp_ray.pipelines import multimodal as mm

SF = "/root/testdata/sf0.001"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_real_codec_rejects_foreign_containers():
    c = mm.FakeCodec(real=True)
    with pytest.raises(ValueError):
        c.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32, 4, 2)
    with pytest.raises(ValueError):
        c.decode_audio(b"OggS" + b"\x00" * 32)
    with pytest.raises(ValueError):
        c.decode_video(b"\x00\x00\x00\x20ftypmp42" + b"\x00" * 24, 2, 2, 1)


def test_avi_roundtrip():
    rng = np.random.default_rng(5)
    for nf, h, w in [(3, 4, 5), (1, 2, 2), (6, 3, 7)]:  # odd widths pad
        vol = rng.integers(0, 256, (nf, h, w), dtype=np.uint8)
        back = mm.decode_avi(mm.encode_avi_gray(vol))
        assert back.shape == (nf, h, w, 3)
        for ch in range(3):
            np.testing.assert_array_equal(back[:, :, :, ch], vol)


def test_avi_container_size_formula():
    """The oracle's n_bytes closed form: 224 + nf·(8 + stride·h)."""
    vol = np.zeros((4, 3, 8), dtype=np.uint8)
    data = mm.encode_avi_gray(vol)
    stride = (8 * 3 + 3) & ~3
    assert len(data) == 224 + 4 * (8 + stride * 3)


def test_decode_avi_hand_built_fixture():
    """Single-frame 2x2 AVI assembled by hand from the RIFF spec (raw
    struct, independent of encode_avi_gray): bottom-up BGR DIB frame."""
    import struct

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    w, h = 2, 2
    stride = (w * 3 + 3) & ~3  # 8
    # top row pixels (RGB): (1,2,3) (4,5,6); bottom row: (7,8,9) (10,11,12)
    bot = bytes([9, 8, 7, 12, 11, 10]) + b"\x00" * (stride - 6)
    top = bytes([3, 2, 1, 6, 5, 4]) + b"\x00" * (stride - 6)
    frame = bot + top  # bottom-up storage
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(frame),
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<10I", 0, 0, 0, 1, 25, 0, 1,
                                            len(frame), 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    avih = struct.pack("<14I", 40000, 0, 0, 0x10, 1, 0, 1, len(frame),
                       w, h, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh)
                         + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", frame))
    body = b"AVI " + hdrl + movi
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    a = mm.decode_avi(data)
    assert a.shape == (1, 2, 2, 3)
    assert a[0].tolist() == [[[1, 2, 3], [4, 5, 6]],
                             [[7, 8, 9], [10, 11, 12]]]


def test_decode_bmp_checked_in_fixture():
    """gradient.bmp was assembled by hand from the BMP spec (raw struct,
    independent of encode_bmp_gray): 3x2 24-bit bottom-up BI_RGB."""
    data = open(os.path.join(FIXTURES, "gradient.bmp"), "rb").read()
    a = mm.decode_bmp(data)
    assert a.shape == (2, 3, 3) and a.dtype == np.uint8
    assert a.tolist() == [
        [[10, 20, 30], [40, 50, 60], [70, 80, 90]],
        [[1, 2, 3], [4, 5, 6], [7, 8, 9]],
    ]


def test_decode_wav_checked_in_fixture():
    data = open(os.path.join(FIXTURES, "tone.wav"), "rb").read()
    s, rate = mm.decode_wav(data)
    assert rate == 8000
    assert s.tolist() == [0, 1000, -1000, 32767, -32768, 256]


def test_bmp_roundtrip_and_padding():
    rng = np.random.default_rng(7)
    for h, w in [(2, 3), (5, 5), (1, 7), (4, 2)]:  # odd widths → row pad
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        back = mm.decode_bmp(mm.encode_bmp_gray(img))
        assert back.shape == (h, w, 3)
        for ch in range(3):
            np.testing.assert_array_equal(back[:, :, ch], img)


def test_wav_roundtrip():
    rng = np.random.default_rng(9)
    s = rng.integers(-32768, 32768, 101).astype(np.int16)
    back, rate = mm.decode_wav(mm.encode_wav_pcm16(s, 22_050))
    assert rate == 22_050
    np.testing.assert_array_equal(back, s)


def test_wav_8bit_widening():
    """8-bit unsigned PCM widens via (b - 128) << 8."""
    import struct

    pcm = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    s, rate = mm.decode_wav(data)
    assert s.tolist() == [-32768, 0, 127 << 8]


def test_real_media_features_actor_pool(ray_session):
    """Checked-in fixtures + derived corpus through the REAL-codec actor
    pool; means equal hand-computed byte means."""
    import ray

    import pyarrow as pa

    # fixtures through the pool: one BMP, one WAV
    bmp = open(os.path.join(FIXTURES, "gradient.bmp"), "rb").read()
    wav = open(os.path.join(FIXTURES, "tone.wav"), "rb").read()
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["image", "audio"]),
        "payload": pa.array([bmp, wav], pa.large_binary()),
    })
    out = (ray.data.from_arrow(t)
           .map_batches(mm.RealMediaFeatures, concurrency=(1, 2),
                        batch_size=1, batch_format="pyarrow")
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    px = np.array([10, 20, 30, 40, 50, 60, 70, 80, 90, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert out.loc[0, "n_samples"] == 18
    assert out.loc[0, "mean_value"] == pytest.approx(
        np.floor(px.mean() * 1e6 + 0.5) / 1e6)
    samples = np.array([0, 1000, -1000, 32767, -32768, 256]) / 32768.0
    assert out.loc[1, "n_samples"] == 6
    assert out.loc[1, "mean_value"] == pytest.approx(
        np.floor(samples.mean() * 1e6 + 0.5) / 1e6)


def test_media_real_features_matches_oracle(ray_session):
    """Full pipeline (encode → real decode → features) vs the DuckDB
    oracle at sf0.001 — the hash-equality the driver gate checks."""
    import duckdb

    from searchenginepp_ray.pipelines.oracle_sql import \
        media_real_features_sql

    got = (mm.media_real_features(SF, concurrency=2).to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = (con.execute(media_real_features_sql()).df()
            .sort_values("media_id").reset_index(drop=True))
    assert got["media_id"].tolist() == want["media_id"].tolist()
    assert got["kind"].tolist() == want["kind"].tolist()
    assert got["n_bytes"].tolist() == want["n_bytes"].astype(int).tolist()
    assert got["n_samples"].tolist() == want["n_samples"].astype(int).tolist()
    np.testing.assert_allclose(got["mean_value"], want["mean_value"],
                               atol=0)


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


def test_png_roundtrip_and_filters():
    """Vendored PNG codec: gray round-trip, then a hand-assembled RGB
    container exercising ALL FIVE scanline filters decodes to the
    original pixels; CRC and magic failures raise loudly."""
    import struct
    import zlib

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (13, 7), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png_gray(img)), img)

    h, w, bpp = 5, 4, 3
    px = rng.integers(0, 256, (h, w, bpp), dtype=np.uint8)
    flat = px.reshape(h, w * bpp).astype(np.int32)
    scan = bytearray()
    prev = np.zeros(w * bpp, np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row = flat[y]
        enc = np.empty_like(row)
        for i in range(w * bpp):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
            enc[i] = (row[i] - pred) % 256
        scan.append(f)
        scan.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (mm._PNG_SIG + mm._png_chunk(b"IHDR", ihdr)
           + mm._png_chunk(b"IDAT", zlib.compress(bytes(scan)))
           + mm._png_chunk(b"IEND", b""))
    assert np.array_equal(mm.decode_png(png), px)

    with pytest.raises(ValueError, match="signature"):
        mm.decode_png(b"not a png at all")
    bad = bytearray(mm.encode_png_gray(img))
    bad[20] ^= 0xFF  # corrupt IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(bad))


def test_media_png_features_matches_grid_mean(ray_session):
    """The compressed tier's decoded features equal the BMP grid math:
    mean over the zero-padded w*h byte grid, n_samples = w*h."""
    out = mm.media_png_features(SF, concurrency=2).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t[t["text"].str.len() > 0]
    assert len(out) == len(t)
    sample = t.head(25)
    want = {}
    for _, r in sample.iterrows():
        b = np.frombuffer(r["text"].encode(), dtype=np.uint8)
        w = 8 if len(b) >= 64 else 4
        h = max(len(b) // w, 1)
        px = np.zeros(w * h, dtype=np.int64)
        px[: min(len(b), w * h)] = b[: w * h]
        want[r["doc_id"]] = (w * h,
                             np.floor(px.sum() / (w * h) * 1e6 + 0.5) / 1e6)
    got = out.set_index("media_id")
    for did, (ns, mv) in want.items():
        assert got.loc[did, "n_samples"] == ns
        assert got.loc[did, "mean_value"] == mv


def test_png_truncated_payload_raises_cleanly():
    """A payload cut off inside a chunk raises the decoder's ValueError
    contract (not struct.error): truncate into the IDAT body — its
    declared length then overruns the remaining bytes."""
    png = mm.encode_png_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    idat_at = png.index(b"IDAT") - 4  # chunk start (length field)
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_png(png[: idat_at + 10])


def test_jpeg_hand_assembled_fixture_decodes():
    """A baseline JPEG assembled BY HAND from the T.81 segment layout
    (independent of the encoder): one 8x8 constant block of 200 under
    unit quantization. DC = 8*(200-128) = 576 (category 10); with the
    canonical 4-bit DC table the code for category 10 is 1010, the
    magnitude bits are 1001000000, and EOB is the 8-bit all-zeros AC
    code - 24 bits = a9 00 00."""
    import struct

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    dc_bits, dc_vals = mm._JPEG_DC_SPEC
    ac_bits, ac_vals = mm._JPEG_AC_SPEC
    png = (b"\xff\xd8"
           + seg(0xFFDB, bytes([0]) + bytes([1] * 64))
           + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1)
                 + bytes([1, 0x11, 0]))
           + seg(0xFFC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
           + seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
           + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
           + bytes([0xA9, 0x00, 0x00]) + b"\xff\xd9")
    dec = mm.decode_jpeg(png)
    assert dec.shape == (8, 8) and (dec == 200).all()


def test_jpeg_roundtrips_and_errors():
    """Block-constant images round-trip BIT-EXACTLY under unit quant
    (the gate's construction); arbitrary images are near-lossless at
    unit quant (|err| <= 1) and bounded-lossy at a coarse table;
    non-multiple-of-8 shapes pad/crop correctly; malformed inputs raise
    the decoder's ValueError contract."""
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), np.uint8))
    assert np.array_equal(mm.decode_jpeg(mm.encode_jpeg_gray(img)), img)

    img2 = rng.integers(0, 256, (13, 19), dtype=np.uint8)
    dec2 = mm.decode_jpeg(mm.encode_jpeg_gray(img2))
    assert dec2.shape == img2.shape
    assert np.abs(dec2.astype(int) - img2.astype(int)).max() <= 1

    q = np.full((8, 8), 16, np.int64)
    dec3 = mm.decode_jpeg(mm.encode_jpeg_gray(img2, quant=q))
    assert np.abs(dec3.astype(int) - img2.astype(int)).max() <= 64

    with pytest.raises(ValueError, match="SOI"):
        mm.decode_jpeg(b"definitely not a jpeg")
    with pytest.raises(ValueError, match="truncated|SOS"):
        mm.decode_jpeg(mm.encode_jpeg_gray(img2)[:40])


def test_media_jpeg_features_matches_grid_mean(ray_session):
    """The lossy tier's decoded features equal the exact grid math:
    each 8x8 block decodes back to its source byte, so the mean is
    unchanged and n_samples = 64*w*h."""
    out = mm.media_jpeg_features(SF, concurrency=2).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t[t["text"].str.len() > 0]
    assert len(out) == len(t)
    sample = t.head(15)
    got = out.set_index("media_id")
    for _, r in sample.iterrows():
        b = np.frombuffer(r["text"].encode(), dtype=np.uint8)
        w = 8 if len(b) >= 64 else 4
        h = max(len(b) // w, 1)
        px = np.zeros(w * h, dtype=np.int64)
        px[: min(len(b), w * h)] = b[: w * h]
        assert got.loc[r["doc_id"], "n_samples"] == 64 * w * h
        assert got.loc[r["doc_id"], "mean_value"] == \
            np.floor(px.sum() / (w * h) * 1e6 + 0.5) / 1e6


def test_codec_roundtrip_property_fuzz():
    """Hypothesis: arbitrary small images round-trip PNG bit-exactly
    and JPEG (unit quant) within +/-1 per sample; block-constant JPEG
    inputs round-trip bit-exactly at any block-grid shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32 - 1))
    def check(h, w, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(mm.decode_png(mm.encode_png_gray(img)), img)
        dec = mm.decode_jpeg(mm.encode_jpeg_gray(img))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1
        blocky = np.kron(rng.integers(0, 256, (max(h // 4, 1), max(w // 4, 1)),
                                      dtype=np.uint8),
                         np.ones((8, 8), np.uint8))
        assert np.array_equal(
            mm.decode_jpeg(mm.encode_jpeg_gray(blocky)), blocky)

    check()
