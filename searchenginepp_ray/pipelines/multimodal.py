"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed by stateful actor-pool ``map_batches`` stages.

Two codec tiers:

- ``FakeCodec(real=True)`` — the DEFAULT for every pipeline entry
  (:func:`media_features`, :func:`image_resize`, :func:`frame_sample`,
  :func:`media_real_features`): REAL container decoding via the
  vendored pure-numpy parsers below (uncompressed 24-bit ``BI_RGB``
  BMP, PCM 8/16-bit RIFF/WAVE, uncompressed 24-bit RIFF/AVI video,
  8-bit PNG via stdlib zlib with full scanline-filter reconstruction,
  and baseline grayscale JPEG — real Huffman/zigzag/DCT, with a
  block-constant + unit-quant construction that keeps even the LOSSY
  codec oracle-hash-checkable; no wheel needed. Formats needing
  PIL/soundfile/av beyond these, e.g. color JPEG or MP3, raise with a
  clear message).
  Because the containers are built deterministically from the documents
  table (:func:`media_real_ds`), the decoded features remain
  ORACLE-hash-checkable in SQL.
- ``FakeCodec()`` (``real=False``) — deterministic stand-in that
  interprets payload bytes directly as samples/pixels; retained as the
  stub twin every entry can be flipped back to (``real=False``) and as
  the equivalence baseline in tests.

Everything Ray-side is real and tested either way: the schema (payload
``large_binary`` + width/height/sample-rate/frame metadata), the actor
signature (decoder state built once per actor in ``__init__``), small
``batch_size`` for large payloads, and vectorized numpy post-processing
(resize = block mean, frame sampling = strided selection).

The media table derives deterministically from the ``documents`` table
(payload = UTF-8 bytes of ``text``; kind cycles image/audio/video), which
keeps the byte-level aggregates SQL-checkable by the DuckDB oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.large_binary()),
        ("width", pa.int32()),        # image/video
        ("height", pa.int32()),       # image/video
        ("sample_rate", pa.int32()),  # audio
        ("n_frames", pa.int32()),     # video
    ]
)


def media_ds(sf_dir: str) -> ray.data.Dataset:
    """Documents table → media table (deterministic, no external data)."""

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        payload = pc.cast(t["text"], pa.large_binary())
        nbytes = pc.binary_length(payload).to_numpy()
        kind = [MEDIA_KINDS[int(i) % 3] for i in ids]
        width = np.where(nbytes >= 64, 8, 4).astype(np.int32)
        height = np.maximum(nbytes // np.maximum(width, 1), 1).astype(np.int32)
        return pa.table(
            {
                "media_id": pa.array(ids.astype(np.int64)),
                "kind": pa.array(kind, pa.string()),
                "payload": payload,
                "width": pa.array(width),
                "height": pa.array(height),
                "sample_rate": pa.array(np.full(len(ids), 16_000, dtype=np.int32)),
                "n_frames": pa.array((nbytes % 7 + 2).astype(np.int32)),
            },
            schema=MEDIA_SCHEMA,
        )

    from .text_stats import _read_blocks

    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        override_num_blocks=_read_blocks(path),
    ).map_batches(to_media, batch_format="pyarrow")


# ---------- vendored pure-numpy container codecs (BMP / WAV) ----------
#
# Minimal, spec-complete for the subsets they claim: uncompressed 24-bit
# BI_RGB Windows BMP (BITMAPINFOHEADER, bottom-up or top-down) and
# canonical RIFF/WAVE PCM (8-bit unsigned / 16-bit signed LE, any channel
# count). ~100 LoC total, no wheel needed — these are the real decode
# backing FakeCodec(real=True). References: the public BMP file-format
# layout (BITMAPFILEHEADER 14 B + BITMAPINFOHEADER 40 B) and the
# Microsoft/IBM RIFF WAVE chunk spec.

def encode_bmp_gray(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale → uncompressed 24-bit BI_RGB BMP
    (bottom-up, rows padded to 4-byte boundaries, R=G=B=pixel)."""
    import struct

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    data_size = stride * h
    # bottom-up: last row first; replicate gray into B,G,R
    rows = np.zeros((h, stride), dtype=np.uint8)
    bgr = np.repeat(img[::-1], 3, axis=1)  # (h, w*3)
    rows[:, :row_bytes] = bgr
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → uint8 (H, W, 3) RGB array.
    Handles bottom-up (height > 0) and top-down (height < 0) layouts."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic); "
                         "formats beyond uncompressed BMP need PIL, "
                         "unavailable in this environment")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (dib_size,) = struct.unpack_from("<I", data, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (got bpp={bpp}, "
                         f"compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=stride * h, offset=pix_off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 (N,) mono samples → canonical RIFF/WAVE PCM container."""
    import struct

    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM container → (int16 samples (N, channels) squeezed to
    (N,) when mono, sample_rate). 8-bit unsigned payloads are widened to
    int16 ((b − 128) << 8), the standard PCM8→PCM16 mapping."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload; formats beyond PCM WAV "
                         "need soundfile/av, unavailable in this environment")
    pos, n = 12, len(data)
    fmt_info = None
    pcm = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8: pos + 8 + csize]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported (fmt={audio_fmt})")
            fmt_info = (channels, rate, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt_info is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt_info
    if bits == 16:
        s = np.frombuffer(pcm, dtype="<i2")
    elif bits == 8:
        s = ((np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128)
             << 8)
    else:
        raise ValueError(f"only 8/16-bit PCM supported (bits={bits})")
    if channels > 1:
        s = s[: len(s) // channels * channels].reshape(-1, channels)
    return s, rate


def encode_avi_gray(frames: np.ndarray, fps: int = 25) -> bytes:
    """uint8 (n_frames, H, W) grayscale → minimal uncompressed AVI
    (RIFF 'AVI ': avih + one 'vids'/'DIB ' stream, 24-bit bottom-up DIB
    frames in '00db' chunks, rows padded to 4 bytes — the same pixel
    layout as the BMP writer). Public AVI RIFF layout per the
    Microsoft multimedia file-format spec."""
    import struct

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    nf, h, w = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_size = stride * h

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    avih = struct.pack("<14I", 1_000_000 // fps, frame_size * fps, 0,
                       0x10, nf, 0, 1, frame_size, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<10I", 0, 0, 0, 1, fps, 0,
                                            nf, frame_size, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size,
                       2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_frames = []
    for f in range(nf):
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = np.repeat(frames[f][::-1], 3, axis=1)  # BGR=gray
        movi_frames.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(movi_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> np.ndarray:
    """Minimal uncompressed-AVI decoder → uint8 (n_frames, H, W, 3) RGB.
    Walks the RIFF chunk tree for the 'vids' stream's BITMAPINFOHEADER
    (strf: 24-bit, BI_RGB) and the movi '00db'/'00dc' frame chunks;
    frames are bottom-up BGR DIB rows padded to 4 bytes."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload; compressed video needs "
                         "av, unavailable in this environment")
    dims: list[tuple[int, int, int]] = []
    frames: list[bytes] = []
    last_strh_type = [b""]  # a strf describes the PRECEDING strh's stream

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_at = pos + 8
            if fourcc == b"LIST":
                walk(buf, body_at + 4, body_at + size)
            elif fourcc == b"strh":
                last_strh_type[0] = buf[body_at:body_at + 4]
            elif fourcc == b"strf" and last_strh_type[0] == b"vids":
                # only the VIDEO stream's format chunk is a
                # BITMAPINFOHEADER (an 'auds' strf is a WAVEFORMATEX —
                # misreading it as bpp/compression was a review finding)
                if size < 40:
                    raise ValueError("vids strf too small for a "
                                     "BITMAPINFOHEADER")
                w, hh = struct.unpack_from("<ii", buf, body_at + 4)
                (bpp,) = struct.unpack_from("<H", buf, body_at + 14)
                (comp,) = struct.unpack_from("<I", buf, body_at + 16)
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"only 24-bit BI_RGB AVI supported (bpp={bpp}, "
                        f"compression={comp})")
                dims.append((w, abs(hh), 1 if hh < 0 else 0))
            elif fourcc in (b"00db", b"00dc"):
                frames.append(buf[body_at: body_at + size])
            pos = body_at + size + (size & 1)  # chunks are word-aligned

    walk(data, 12, len(data))
    if not dims:
        raise ValueError("AVI missing a 24-bit 'strf' stream header")
    w, h, top_down = dims[0]
    stride = (w * 3 + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        rows = np.frombuffer(fb, np.uint8, count=stride * h) \
            .reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        out[i] = rows[:, :, ::-1]  # BGR → RGB
    return out


# ---------- baseline JPEG (grayscale, sequential DCT) ----------
#
# Spec-built from the public JPEG standard (ITU-T T.81): DQT/SOF0/DHT/
# SOS segment layout, canonical Huffman construction from BITS/HUFFVAL,
# zigzag order, 8×8 DCT-II/III, byte stuffing. The encoder emits its
# OWN canonical tables in DHT (T.81 allows arbitrary tables; no Annex-K
# memorization): DC categories 0..11 at 4 bits, the 162 AC run/size
# symbols (EOB, ZRL, runs 0..15 × sizes 1..10) at 8 bits — prefix-free,
# all-ones codes unused. The decoder reads whatever tables the file
# declares, so it handles foreign baseline grayscale JPEGs too.
# EXACTNESS ESCAPE HATCH: with unit quantization, an image whose every
# 8×8 block is CONSTANT round-trips bit-exactly (DC = 8·(c−128) is an
# exact integer, every AC magnitude is float noise < 0.5 that rounds
# to zero) — the degenerate-parameter gate `media_jpeg_features` runs
# on, keeping a LOSSY codec oracle-hash-checkable.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_DCT_B = None  # 8×8 DCT-II basis, built once


def _dct_basis() -> np.ndarray:
    global _DCT_B
    if _DCT_B is None:
        u = np.arange(8).reshape(-1, 1)
        x = np.arange(8).reshape(1, -1)
        b = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        b[0] /= np.sqrt(2.0)
        _DCT_B = b
    return _DCT_B


#: canonical table specs: (BITS[1..16], HUFFVAL) — DC: 12 categories at
#: 4 bits; AC: EOB + ZRL + runs 0..15 × sizes 1..10 = 162 symbols at 8
_JPEG_DC_SPEC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_JPEG_AC_SPEC = (
    [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted([0x00, 0xF0] + [(r << 4) | s
                           for r in range(16) for s in range(1, 11)]),
)


def _huff_codes(bits, huffval) -> dict[int, tuple[int, int]]:
    """T.81 canonical construction: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (T.81)
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_gray(img: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """uint8 (H, W) grayscale → baseline sequential JPEG (one component,
    self-declared canonical Huffman tables, no subsampling/restarts).
    ``quant`` is the 8×8 quantization table in NATURAL order (default:
    all ones — near-lossless, and bit-exact on block-constant images)."""
    import struct

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    q = np.ones((8, 8), dtype=np.int64) if quant is None \
        else np.asarray(quant, dtype=np.int64).reshape(8, 8)
    bh, bw = -(-h // 8), -(-w // 8)
    # edge-replicate to full blocks (the conventional pad)
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    B = _dct_basis()
    dc_codes = _huff_codes(*_JPEG_DC_SPEC)
    ac_codes = _huff_codes(*_JPEG_AC_SPEC)
    # all DCTs + quantization in one batched einsum (the per-block
    # Python work below is Huffman bit emission only)
    blocks = (padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
              .reshape(bh * bw, 8, 8).astype(np.float64) - 128.0)
    X_all = np.einsum("ab,nbc,dc->nad", B, blocks, B)
    zz_all = np.floor(X_all / q + 0.5).astype(np.int64) \
        .reshape(bh * bw, 64)[:, _ZIGZAG]
    ac_any = zz_all[:, 1:].any(axis=1).tolist()
    zz_rows = zz_all.tolist()  # plain lists: no per-element numpy access
    bw_ = _BitWriter()
    prev_dc = 0
    for bi in range(bh * bw):
        zz = zz_rows[bi]
        diff = zz[0] - prev_dc
        prev_dc = zz[0]
        cat = _category(diff)
        bw_.write(*dc_codes[cat])
        if cat:
            mag = diff if diff >= 0 else diff + (1 << cat) - 1
            bw_.write(mag, cat)
        if not ac_any[bi]:  # DC-only block: straight to EOB
            bw_.write(*ac_codes[0x00])
            continue
        run = 0
        for k in range(1, 64):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                bw_.write(*ac_codes[0xF0])
                run -= 16
            cat = _category(v)
            bw_.write(*ac_codes[(run << 4) | cat])
            mag = v if v >= 0 else v + (1 << cat) - 1
            bw_.write(mag, cat)
            run = 0
        if run:
            bw_.write(*ac_codes[0x00])  # EOB
    scan = bw_.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc_th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))

    qzz = q.reshape(-1)[_ZIGZAG]  # DQT carries zigzag order
    out = (b"\xff\xd8"
           + seg(0xFFDB, bytes([0]) + bytes(int(x) & 0xFF for x in qzz))
           + seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1)
                 + bytes([1, 0x11, 0]))
           + dht(0x00, _JPEG_DC_SPEC) + dht(0x10, _JPEG_AC_SPEC)
           + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
           + scan + b"\xff\xd9")
    return out


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("JPEG marker inside entropy stream "
                                 "(restart intervals unsupported)")
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def huff(self, table: dict) -> int:
        L = table.get("_uniform")
        if L is not None:
            # all codes in this DHT share one length (our canonical
            # encoder's tables do): one fixed-width read + one lookup
            # instead of a per-bit walk
            sym = table.get((self.bits(L), L))
            if sym is None:
                raise ValueError("JPEG invalid Huffman code")
            return sym
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((code, length))
            if sym is not None:
                return sym
        raise ValueError("JPEG invalid Huffman code")


def _extend(mag: int, cat: int) -> int:
    return mag if mag >= (1 << (cat - 1)) else mag - (1 << cat) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential GRAYSCALE JPEG → uint8 (H, W). Reads the
    file's own DQT/DHT tables (canonical T.81 construction), so foreign
    single-component baseline files decode too; multi-component,
    progressive, and restart-interval streams raise with a clear
    message (chroma paths would need PIL, unavailable here)."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI); formats "
                         "beyond baseline JPEG/PNG/BMP need PIL")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    h = w = None
    comp_q = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG segment desync")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2: pos + 4])
        body = data[pos + 4: pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG truncated inside segment")
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise ValueError("JPEG 16-bit quant tables unsupported")
                z = np.frombuffer(body[o + 1: o + 65], np.uint8) \
                    .astype(np.int64)
                nat = np.empty(64, np.int64)
                nat[_ZIGZAG] = z
                qt[tq] = nat.reshape(8, 8)
                o += 65
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8 or nc != 1:
                raise ValueError(
                    "JPEG subset: 8-bit baseline grayscale only "
                    f"(got precision={prec} components={nc})")
            if body[7] != 0x11:
                raise ValueError("JPEG subsampling unsupported")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("JPEG non-baseline (progressive/extended) "
                             "frames unsupported")
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc_th = body[o]
                bits = list(body[o + 1: o + 17])
                nval = sum(bits)
                vals = list(body[o + 17: o + 17 + nval])
                codes = _huff_codes(bits, vals)
                tbl = {(c, l): sym for sym, (c, l) in codes.items()}
                used = [l for l, n in enumerate(bits, start=1) if n]
                if len(used) == 1:
                    tbl["_uniform"] = used[0]
                huff[tc_th] = tbl
                o += 17 + nval
        elif marker == 0xDD:
            raise ValueError("JPEG restart intervals unsupported")
        elif marker == 0xDA:
            td_ta = body[2]
            dc_tbl = huff.get(0x00 | (td_ta >> 4))
            ac_tbl = huff.get(0x10 | (td_ta & 0xF))
            if h is None or dc_tbl is None or ac_tbl is None:
                raise ValueError("JPEG SOS before SOF/DHT")
            q = qt.get(comp_q)
            if q is None:
                raise ValueError("JPEG missing quant table")
            rd = _BitReader(data[pos + 2 + ln:])
            bh, bw = -(-h // 8), -(-w // 8)
            nblk = bh * bw
            if nblk == 0:  # SOF with zero height/width
                return np.zeros((h, w), np.uint8)
            # phase 1: pure-Python entropy decode straight into the
            # (nblk, 64) coefficient array (one vectorized row-assign
            # per block — no list-of-lists retained)
            coeff = np.empty((nblk, 64), np.int64)
            prev_dc = 0
            for bi in range(nblk):
                zz = [0] * 64
                cat = rd.huff(dc_tbl)
                diff = _extend(rd.bits(cat), cat) if cat else 0
                prev_dc += diff
                zz[0] = prev_dc
                k = 1
                while k < 64:
                    sym = rd.huff(ac_tbl)
                    if sym == 0x00:
                        break
                    if sym == 0xF0:
                        k += 16
                        continue
                    k += sym >> 4
                    cat = sym & 0xF
                    if cat == 0:
                        raise ValueError(
                            f"JPEG invalid AC symbol 0x{sym:02x} "
                            "(zero size with nonzero run)")
                    if k > 63:
                        raise ValueError("JPEG AC index overflow")
                    zz[k] = _extend(rd.bits(cat), cat)
                    k += 1
                coeff[bi] = zz
            # phase 2: dezigzag + dequant + IDCT, batched in bounded
            # chunks so foreign multi-megapixel images don't hold the
            # whole float volume at once
            B = _dct_basis()
            qf = q.astype(np.float64)
            # block-major uint8 result (image-sized); chunking bounds
            # only the 8-bytes-per-sample float temporaries
            blocks_u8 = np.empty((nblk, 8, 8), np.uint8)
            CH = 4096
            nat = np.empty((min(CH, nblk), 64), np.int64)
            for lo in range(0, nblk, CH):
                hi_ = min(lo + CH, nblk)
                n = hi_ - lo
                nat[:n, _ZIGZAG] = coeff[lo:hi_]
                X = nat[:n].reshape(n, 8, 8) * qf
                blks = np.einsum("ba,nbc,cd->nad", B, X, B) + 128.0
                blocks_u8[lo:hi_] = np.clip(np.floor(blks + 0.5), 0, 255) \
                    .astype(np.uint8)
            out = blocks_u8.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3) \
                .reshape(bh * 8, bw * 8)
            return out[:h, :w]
        pos += 2 + ln
    raise ValueError("JPEG missing SOS scan")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return struct.pack(">I", len(body)) + typ + body \
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)


def encode_png_gray(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 (H, W) grayscale → 8-bit greyscale PNG (color type 0,
    filter None per scanline, one zlib IDAT stream) — the repo's first
    COMPRESSED container, built from the public PNG spec with stdlib
    zlib only."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = np.zeros((h, 1 + w), dtype=np.uint8)
    scan[:, 1:] = img  # filter byte 0 (None) + row
    idat = zlib.compress(scan.tobytes(), level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """8-bit greyscale / truecolor PNG → uint8 (H, W) or (H, W, 3).
    Spec-complete for the non-interlaced 8-bit subset: all five
    scanline filters (None/Sub/Up/Average/Paeth) are reconstructed,
    IDAT may span multiple chunks, chunk CRCs are verified. Sub is
    vectorized as per-lane cumulative sums; Average/Paeth recurrences
    are inherently sequential in the left neighbor, so they loop per
    pixel (rows here are tens of bytes; a SIMD unfilter slots in
    behind the same signature)."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature); "
                         "formats beyond PNG/BMP need PIL, which is "
                         "not available in this environment")
    pos, w = 8, None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos: pos + 4])
        typ = data[pos + 4: pos + 8]
        if pos + 12 + ln > len(data):
            raise ValueError(
                f"PNG truncated inside chunk {typ!r} "
                f"(need {ln + 12} bytes at offset {pos}, "
                f"have {len(data) - pos})")
        body = data[pos + 8: pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln: pos + 12 + ln])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in (0, 2) or interlace:
                raise ValueError(
                    "PNG subset: 8-bit grey/truecolor, non-interlaced "
                    f"(got depth={depth} color={color} "
                    f"interlace={interlace})")
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    bpp = 1 if color == 0 else 3
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = 1 + w * bpp
    if len(raw) != stride * h:
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w * bpp), dtype=np.uint8)
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        f, row = int(raw[y, 0]), raw[y, 1:].astype(np.int32)
        if f == 0:
            rec = row
        elif f == 1:      # Sub: per-lane cumulative sum mod 256
            rec = row.reshape(-1, bpp).cumsum(axis=0).reshape(-1)
        elif f == 2:      # Up
            rec = row + prev
        elif f in (3, 4):  # Average / Paeth: left-sequential
            rec = np.empty(w * bpp, dtype=np.int32)
            for i in range(w * bpp):
                a = int(rec[i - bpp]) & 0xFF if i >= bpp else 0
                b = int(prev[i])
                if f == 3:
                    rec[i] = row[i] + ((a + b) >> 1)
                else:
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    rec[i] = row[i] + pred
        else:
            raise ValueError(f"PNG unknown filter type {f}")
        prev = out[y] = (rec & 0xFF).astype(np.uint8)
    return out.reshape(h, w) if bpp == 1 else out.reshape(h, w, 3)


class _RealCodec:
    """Vendored-parser decode tier: BMP → pixels, WAV → samples,
    uncompressed AVI → frame volume. Compressed formats raise with a
    clear message (PIL/soundfile/av are unavailable here)."""

    def decode_image(self, payload: bytes, width: int = 0,
                     height: int = 0) -> np.ndarray:
        return decode_bmp(payload)  # (H, W, 3) uint8; metadata unused

    def decode_audio(self, payload: bytes) -> np.ndarray:
        samples, _rate = decode_wav(payload)
        return samples.astype(np.float32) / 32768.0

    def decode_video(self, payload: bytes, width: int, height: int,
                     n_frames: int) -> np.ndarray:
        return decode_avi(payload)  # (n_frames, H, W, 3); metadata unused


class FakeCodec:
    """Deterministic stand-in for an image/audio codec, with a REAL tier.

    ``real=False`` (default): interprets payload bytes directly as
    samples/pixels — keeps every downstream numeric assertion
    SQL-checkable, and is the oracle twin of the real tier.
    ``real=True``: dispatches to the vendored pure-numpy BMP/WAV/AVI
    parsers (:func:`decode_bmp` / :func:`decode_wav` /
    :func:`decode_avi`); foreign/compressed containers raise with a
    clear message (PIL/soundfile/av are not available here).
    """

    def __init__(self, real: bool = False):
        self._real = _RealCodec() if real else None

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self._real is not None:
            return self._real.decode_image(payload, width, height)
        px = np.frombuffer(payload, dtype=np.uint8)[: width * height]
        if len(px) < width * height:
            px = np.pad(px, (0, width * height - len(px)))
        return px.reshape(height, width)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        if self._real is not None:
            return self._real.decode_audio(payload)
        # bytes → centered float samples in [-1, 1)
        return (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0

    def decode_video(self, payload: bytes, width: int, height: int, n_frames: int) -> np.ndarray:
        if self._real is not None:
            return self._real.decode_video(payload, width, height, n_frames)
        need = width * height * n_frames
        px = np.frombuffer(payload, dtype=np.uint8)
        px = np.resize(px, need)  # deterministic tiling for short payloads
        return px.reshape(n_frames, height, width)


class MediaFeatures:
    """Actor-pool stage: decoder state once per actor, features per batch.

    Use as ``ds.map_batches(MediaFeatures, concurrency=(1, N), batch_size=64,
    num_cpus=1, batch_format="pyarrow")`` — small batches because payloads
    are large; one actor per CPU holds one codec instance.
    """

    def __init__(self, real: bool = False):
        self.codec = FakeCodec(real=real)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        width = t["width"].to_numpy()
        height = t["height"].to_numpy()
        n_frames = t["n_frames"].to_numpy()
        mean = np.empty(n, dtype=np.float64)
        n_samples = np.empty(n, dtype=np.int64)
        for i in range(n):
            if kinds[i] == "image":
                a = self.codec.decode_image(payloads[i], int(width[i]), int(height[i]))
                mean[i] = float(a.mean())
                n_samples[i] = a.size
            elif kinds[i] == "audio":
                a = self.codec.decode_audio(payloads[i])
                mean[i] = float(a.mean())
                n_samples[i] = a.size
            else:
                a = self.codec.decode_video(
                    payloads[i], int(width[i]), int(height[i]), int(n_frames[i])
                )
                mean[i] = float(a.mean())
                n_samples[i] = a.size
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "n_bytes": pc.binary_length(t["payload"]).cast(pa.int64()),
                "n_samples": pa.array(n_samples),
                "mean_value": pa.array(np.round(mean, 6)),
            }
        )


class ImageResize:
    """Actor-pool stage: decode → block-mean resize to (out, out) →
    per-image mean pixel. ``real=True`` (default) decodes real BMP
    containers through the vendored parser and resizes the luma plane
    (R=G=B, so channel 0 IS the gray image); ``real=False`` is the
    byte→pixel stub twin. The resize math is the same vectorized numpy
    in both tiers."""

    def __init__(self, out: int = 4, real: bool = True):
        self.codec = FakeCodec(real=real)
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        o = self.out
        for mid, payload, w, h in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(),
            t["width"].to_pylist(), t["height"].to_pylist(),
        ):
            img = self.codec.decode_image(payload, w, h)
            if img.ndim == 3:
                img = img[:, :, 0]  # real tier: gray replicated across RGB
            # crop to a multiple of out (tile when smaller), block mean
            hh = (img.shape[0] // o) * o or o
            ww = (img.shape[1] // o) * o or o
            img2 = np.resize(img, (hh, ww)).astype(np.int64)
            # the o×o resize output's statistic: the mean of its
            # equal-sized block means equals the grand mean of the
            # resized grid, so emit it as ONE exact-integer-sum
            # division (bit-reproducible against the SQL oracle)
            # instead of materializing the block-mean matrix
            mean = float(img2.sum()) / img2.size
            rows.append({"media_id": mid,
                         "resized_mean": math.floor(mean * 1e6 + 0.5) / 1e6,
                         "out_h": o, "out_w": o})
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"media_id": pa.array([], pa.int64()),
             "resized_mean": pa.array([], pa.float64()),
             "out_h": pa.array([], pa.int64()), "out_w": pa.array([], pa.int64())}
        )


def media_byte_stats(sf_dir: str):
    """Per-kind media counts + payload byte totals (SQL-checkable: payload
    is exactly the UTF-8 text bytes)."""
    from ray.data.aggregate import Count, Sum

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {"kind": t["kind"], "n_bytes": pc.binary_length(t["payload"]).cast(pa.int64())}
        )

    return (
        media_ds(sf_dir)
        .map_batches(prep, batch_format="pyarrow")
        .groupby("kind")
        .aggregate(Count(alias_name="n_items"), Sum("n_bytes", alias_name="total_bytes"))
    )


def media_features(sf_dir: str, concurrency: int = 4, real: bool = True):
    """Decode + feature-extract through the actor pool. Default tier is
    REAL container decode (BMP/WAV/AVI via the vendored parsers over
    :func:`media_real_ds`) — oracle-hash-checked because the containers
    derive deterministically from the text bytes. ``real=False`` keeps
    the byte-interpreting stub twin over :func:`media_ds` (rows-only:
    raw-byte payloads are not valid containers)."""
    if real:
        return media_real_features(sf_dir, concurrency)
    return media_ds(sf_dir).map_batches(
        MediaFeatures, concurrency=(1, concurrency), batch_size=64,
        num_cpus=1, batch_format="pyarrow",
    )


def image_resize(sf_dir: str, out: int = 4, concurrency: int = 4,
                 real: bool = True):
    """Resize stage over the image subset — default tier decodes REAL
    BMP containers (vendored parser) and resizes the luma plane; the
    decoded statistic stays oracle-hash-checkable (the BMP pixel grid
    is a deterministic function of the text bytes)."""
    src = media_real_ds(sf_dir) if real else media_ds(sf_dir)
    imgs = src.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    return imgs.map_batches(
        ImageResize, fn_constructor_kwargs={"out": out, "real": real},
        concurrency=(1, concurrency), batch_size=64, num_cpus=1,
        batch_format="pyarrow",
    )


class FrameSampler:
    """Actor-pool stage: video decode → strided frame selection →
    per-frame checksum. ``real=True`` (default) parses real uncompressed
    AVI containers and fingerprints each sampled frame's LUMA plane
    (R=G=B, so channel 0 is the gray frame — byte-identical to the
    volume the container was built from, keeping the md5 oracle-
    checkable); ``real=False`` tiles raw payload bytes (stub twin).
    Decoder state once per actor; the per-row loop is the accepted
    shape for opaque binary payloads (cf. :class:`MediaFeatures`)."""

    def __init__(self, stride: int = 2, real: bool = True):
        self.codec = FakeCodec(real=real)
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        rows = []
        for mid, payload, w, h, nf in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(),
            t["width"].to_pylist(), t["height"].to_pylist(),
            t["n_frames"].to_pylist(),
        ):
            if not payload:
                continue
            vid = self.codec.decode_video(payload, w, h, nf)
            for f in range(0, nf, self.stride):
                frame = vid[f, :, :, 0] if vid.ndim == 4 else vid[f]
                rows.append({
                    "media_id": mid,
                    "frame_idx": f,
                    "n_bytes": w * h,
                    "frame_md5": hashlib.md5(
                        np.ascontiguousarray(frame).tobytes()).hexdigest(),
                })
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"media_id": pa.array([], pa.int64()),
             "frame_idx": pa.array([], pa.int64()),
             "n_bytes": pa.array([], pa.int64()),
             "frame_md5": pa.array([], pa.string())})


def media_real_ds(sf_dir: str) -> ray.data.Dataset:
    """Documents table → media table of REAL container payloads, kind
    cycling by ``doc_id % 3``: images are uncompressed 24-bit BMP
    (pixels = the first width×height text bytes, zero-padded when
    short — the same grid the stub tier uses), audio is PCM-16 WAV
    (samples = ``(byte − 128) << 8``, the standard PCM8→PCM16
    widening), video is uncompressed AVI whose grayscale frames tile
    the text bytes into the (n_frames, h, w) volume exactly like the
    stub codec. Container assembly is deterministic, so the DECODED
    features stay SQL-checkable even though the decode exercises real
    parsers."""

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        texts = t["text"].to_pylist()
        kind, payload, width, height, nframes = [], [], [], [], []
        for i, txt in zip(ids, texts):
            b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
            nb = len(b)
            if nb == 0:
                continue
            w = 8 if nb >= 64 else 4
            h = max(nb // w, 1)
            nf = 0
            if i % 3 == 0:
                px = b[: w * h]
                if len(px) < w * h:
                    px = np.pad(px, (0, w * h - len(px)))
                kind.append("image")
                payload.append(encode_bmp_gray(px.reshape(h, w)))
            elif i % 3 == 1:
                samples = ((b.astype(np.int16) - 128) << 8)
                kind.append("audio")
                payload.append(encode_wav_pcm16(samples))
            else:
                nf = int(nb % 7 + 2)
                vol = np.resize(b, nf * h * w).reshape(nf, h, w)
                kind.append("video")
                payload.append(encode_avi_gray(vol))
            width.append(w)
            height.append(h)
            nframes.append(nf)
        keep = [int(i) for i, txt in zip(ids, texts) if len(txt.encode("utf-8")) > 0]
        return pa.table({
            "media_id": pa.array(keep, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "payload": pa.array(payload, pa.large_binary()),
            "width": pa.array(np.asarray(width, dtype=np.int32)),
            "height": pa.array(np.asarray(height, dtype=np.int32)),
            "sample_rate": pa.array(
                np.full(len(keep), 16_000, dtype=np.int32)),
            "n_frames": pa.array(np.asarray(nframes, dtype=np.int32)),
        }, schema=MEDIA_SCHEMA)

    from .text_stats import _read_blocks

    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        override_num_blocks=_read_blocks(path),
    ).map_batches(to_media, batch_format="pyarrow")


class RealMediaFeatures:
    """Actor-pool stage over REAL containers: one vendored-parser codec
    per actor, per-batch decode → (n_samples, mean_value). The image
    mean is over the decoded (H, W, 3) RGB volume; the audio mean is
    over float32 samples in [-1, 1) — both reduce to exact integer
    ratios, so the 6-dp floor-rounded values hash-match the SQL oracle."""

    def __init__(self):
        self.codec = FakeCodec(real=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        mean = np.empty(n, dtype=np.float64)
        n_samples = np.empty(n, dtype=np.int64)
        for i in range(n):
            if kinds[i] == "image":
                a = self.codec.decode_image(payloads[i], 0, 0)
            elif kinds[i] == "audio":
                a = self.codec.decode_audio(payloads[i])
            else:
                a = self.codec.decode_video(payloads[i], 0, 0, 0)
            # float64 accumulator: per-sample values are exact dyadic
            # rationals, so the mean is one correctly-rounded division —
            # the property the oracle-hash equality relies on
            mean[i] = float(a.mean(dtype=np.float64))
            n_samples[i] = a.size
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "n_bytes": pc.binary_length(t["payload"]).cast(pa.int64()),
            "n_samples": pa.array(n_samples),
            "mean_value": pa.array(np.floor(mean * 1e6 + 0.5) / 1e6),
        })


def media_real_features(sf_dir: str, concurrency: int = 4):
    """REAL-container decode + feature extraction through the actor pool
    (BMP → pixels, WAV → samples via the vendored parsers) — unlike
    :func:`media_features` this one IS oracle-hash-checkable because the
    container assembly is a deterministic function of the text bytes."""
    return media_real_ds(sf_dir).map_batches(
        RealMediaFeatures, concurrency=(1, concurrency), batch_size=64,
        num_cpus=1, batch_format="pyarrow",
    )


def media_png_ds(sf_dir: str) -> ray.data.Dataset:
    """Documents table → COMPRESSED-container media table: every
    non-empty doc becomes an 8-bit greyscale PNG of the same pixel grid
    the BMP tier uses (first w·h text bytes zero-padded). The container
    is zlib-compressed, so its byte size is not closed-form — but the
    DECODED pixels still are, which keeps the features oracle-checkable
    through a genuinely compressed round-trip."""

    def to_png(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        keep, payload, width, height = [], [], [], []
        for i, txt in zip(ids, texts):
            b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
            nb = len(b)
            if nb == 0:
                continue
            w = 8 if nb >= 64 else 4
            h = max(nb // w, 1)
            px = b[: w * h]
            if len(px) < w * h:
                px = np.pad(px, (0, w * h - len(px)))
            keep.append(int(i))
            payload.append(encode_png_gray(px.reshape(h, w)))
            width.append(w)
            height.append(h)
        n = len(keep)
        return pa.table({
            "media_id": pa.array(keep, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payload, pa.large_binary()),
            "width": pa.array(np.asarray(width, dtype=np.int32)),
            "height": pa.array(np.asarray(height, dtype=np.int32)),
            "sample_rate": pa.array(np.full(n, 16_000, dtype=np.int32)),
            "n_frames": pa.array(np.zeros(n, dtype=np.int32)),
        }, schema=MEDIA_SCHEMA)

    from .text_stats import _read_blocks

    path = f"{sf_dir}/documents.parquet"
    return ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        override_num_blocks=_read_blocks(path),
    ).map_batches(to_png, batch_format="pyarrow")


class PngFeatures:
    """Actor-pool stage over PNG containers: vendored spec decoder per
    actor, per-batch inflate + unfilter → (n_samples, mean_value)."""

    def __init__(self):
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        payloads = t["payload"].to_pylist()
        mean = np.empty(n, dtype=np.float64)
        n_samples = np.empty(n, dtype=np.int64)
        for i in range(n):
            a = decode_png(payloads[i])
            mean[i] = float(a.mean(dtype=np.float64))
            n_samples[i] = a.size
        return pa.table({
            "media_id": t["media_id"],
            "width": t["width"].cast(pa.int64()),
            "height": t["height"].cast(pa.int64()),
            "n_samples": pa.array(n_samples),
            "mean_value": pa.array(np.floor(mean * 1e6 + 0.5) / 1e6),
        })


def media_png_features(sf_dir: str, concurrency: int = 4):
    """COMPRESSED-container decode through the actor pool: zlib-deflated
    PNG → inflate → scanline unfilter → features, oracle-hash-checked
    because the pixel grid is a deterministic function of the text
    bytes (the zlib stream round-trips exactly; only the container
    SIZE is non-closed-form, so it is not emitted)."""
    return media_png_ds(sf_dir).map_batches(
        PngFeatures, concurrency=(1, concurrency), batch_size=64,
        num_cpus=1, batch_format="pyarrow",
    )


def media_jpeg_ds(sf_dir: str) -> ray.data.Dataset:
    """Documents table → LOSSY-compressed media table: every non-empty
    doc becomes a baseline grayscale JPEG whose 8×8 blocks each hold
    ONE text byte (the PNG tier's w×h pixel grid expanded ×8 per axis
    via kron), encoded with unit quantization. Block-constant content
    + unit quant round-trips BIT-EXACTLY through the DCT (DC = 8·(c−128)
    is an exact integer, AC magnitudes are float noise < 0.5), so the
    decoded features of a genuinely lossy codec stay
    oracle-hash-checkable — the degenerate-parameter gate pattern."""

    def to_jpeg(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        keep, payload, width, height = [], [], [], []
        ones = np.ones((8, 8), np.uint8)
        for i, txt in zip(ids, texts):
            b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
            nb = len(b)
            if nb == 0:
                continue
            w = 8 if nb >= 64 else 4
            h = max(nb // w, 1)
            px = b[: w * h]
            if len(px) < w * h:
                px = np.pad(px, (0, w * h - len(px)))
            keep.append(int(i))
            payload.append(encode_jpeg_gray(np.kron(px.reshape(h, w), ones)))
            width.append(8 * w)
            height.append(8 * h)
        n = len(keep)
        return pa.table({
            "media_id": pa.array(keep, pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array(payload, pa.large_binary()),
            "width": pa.array(np.asarray(width, dtype=np.int32)),
            "height": pa.array(np.asarray(height, dtype=np.int32)),
            "sample_rate": pa.array(np.full(n, 16_000, dtype=np.int32)),
            "n_frames": pa.array(np.zeros(n, dtype=np.int32)),
        }, schema=MEDIA_SCHEMA)

    from .text_stats import _read_blocks

    path = f"{sf_dir}/documents.parquet"
    # per-row encode cost (~2.7 ms: batched DCT + Huffman emission) is
    # ~30x a tokenize, so the usual ~2000-rows/block floor serializes
    # this stage on small corpora — size blocks to ~160 rows instead
    return ray.data.read_parquet(
        path, columns=["doc_id", "text"],
        override_num_blocks=_read_blocks(path, target_rows=160),
    ).map_batches(to_jpeg, batch_format="pyarrow")


class JpegFeatures:
    """Actor-pool stage over baseline JPEG containers: vendored spec
    decoder per actor (Huffman + dezigzag + dequant + IDCT per batch)
    → (n_samples, mean_value)."""

    def __init__(self):
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        n = len(t)
        payloads = t["payload"].to_pylist()
        mean = np.empty(n, dtype=np.float64)
        n_samples = np.empty(n, dtype=np.int64)
        for i in range(n):
            a = decode_jpeg(payloads[i])
            mean[i] = float(a.mean(dtype=np.float64))
            n_samples[i] = a.size
        return pa.table({
            "media_id": t["media_id"],
            "width": t["width"].cast(pa.int64()),
            "height": t["height"].cast(pa.int64()),
            "n_samples": pa.array(n_samples),
            "mean_value": pa.array(np.floor(mean * 1e6 + 0.5) / 1e6),
        })


def media_jpeg_features(sf_dir: str, concurrency: int = 16):
    """LOSSY-compressed-container decode through the actor pool: real
    Huffman entropy decode, dezigzag, dequantization, and 8×8 IDCT per
    block — oracle-hash-checked because the block-constant + unit-quant
    construction round-trips exactly (each decoded 8×8 block equals its
    source text byte, so the mean is Σgrid/(w·h) — the PNG oracle with
    n_samples ×64)."""
    return media_jpeg_ds(sf_dir).map_batches(
        JpegFeatures, concurrency=(1, concurrency), batch_size=64,
        num_cpus=1, batch_format="pyarrow",
    )


def frame_sample(sf_dir: str, stride: int = 2, concurrency: int = 4,
                 real: bool = True):
    """Strided frame sampling over the video subset — the fourth member
    of the multimodal stage family (decode / feature-extract / resize /
    frame-sample). Default tier decodes REAL uncompressed-AVI containers
    (:func:`media_real_ds`) and fingerprints each sampled frame's luma
    plane; because the AVI frames tile the text bytes into the declared
    (n_frames, height, width) volume, every sampled frame's md5 is
    value-checkable by a SQL oracle that repeats+slices the SAME bytes
    (the testdata corpus is pure ASCII, where VARCHAR slicing == byte
    slicing). ``real=False`` tiles raw payload bytes through the stub
    codec — same volumes, same md5s, the oracle twin."""
    src = media_real_ds(sf_dir) if real else media_ds(sf_dir)
    vids = src.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")),
        batch_format="pyarrow")
    return vids.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride, "real": real},
        concurrency=(1, concurrency), batch_size=64, num_cpus=1,
        batch_format="pyarrow",
    )
