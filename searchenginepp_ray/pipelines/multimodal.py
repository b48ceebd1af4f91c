"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata,
processed by stateful actor-pool ``map_batches`` stages.

The image/audio libraries are not available in this environment, so the
*codec* decode is a clearly-marked deterministic fake
(:class:`FakeCodec` — ``NotImplementedError`` if a real decode is
requested); everything Ray-side is real and tested: the schema (payload
``large_binary`` + width/height/sample-rate/frame metadata), the actor
signature (decoder state built once per actor in ``__init__``), small
``batch_size`` for large payloads, and vectorized numpy post-processing
(resize = block mean, frame sampling = strided selection).

The media table derives deterministically from the ``documents`` table
(payload = UTF-8 bytes of ``text``; kind cycles image/audio/video), which
keeps the byte-level aggregates SQL-checkable by the DuckDB oracle.
"""

from __future__ import annotations

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


class FakeCodec:
    """Deterministic stand-in for an image/audio codec.

    Real decode paths (PIL / soundfile / av) are unavailable in this
    container — requesting them raises ``NotImplementedError`` so the
    substitution is impossible to miss. The fake interprets payload bytes
    directly as samples/pixels, which keeps every downstream numeric
    assertion deterministic.
    """

    def __init__(self, real: bool = False):
        if real:
            raise NotImplementedError(
                "real image/audio decoding requires PIL/soundfile/av, "
                "which are not available in this environment; "
                "FakeCodec(real=False) provides the deterministic stub"
            )

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        px = np.frombuffer(payload, dtype=np.uint8)[: width * height]
        if len(px) < width * height:
            px = np.pad(px, (0, width * height - len(px)))
        return px.reshape(height, width)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        # bytes → centered float samples in [-1, 1)
        return (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0

    def decode_video(self, payload: bytes, width: int, height: int, n_frames: int) -> np.ndarray:
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

    def __init__(self):
        self.codec = FakeCodec()

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
    per-image mean pixel. The resize math is real vectorized numpy; only
    the byte→pixel decode is the stub."""

    def __init__(self, out: int = 4):
        self.codec = FakeCodec()
        self.out = out

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = []
        o = self.out
        for mid, payload, w, h in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(),
            t["width"].to_pylist(), t["height"].to_pylist(),
        ):
            img = self.codec.decode_image(payload, w, h)
            # crop to a multiple of out, then block mean
            hh = (img.shape[0] // o) * o or o
            ww = (img.shape[1] // o) * o or o
            img2 = np.resize(img, (hh, ww)).astype(np.float64)
            small = img2.reshape(o, hh // o, o, ww // o).mean(axis=(1, 3))
            rows.append({"media_id": mid, "resized_mean": round(float(small.mean()), 6),
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


def media_features(sf_dir: str, concurrency: int = 4):
    """Decode + feature-extract through the actor pool (rows-only check:
    the fake codec is not SQL-expressible, but results are deterministic)."""
    return media_ds(sf_dir).map_batches(
        MediaFeatures, concurrency=(1, concurrency), batch_size=64,
        num_cpus=1, batch_format="pyarrow",
    )


def image_resize(sf_dir: str, out: int = 4, concurrency: int = 4):
    """Resize stage over the image subset."""
    imgs = media_ds(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    return imgs.map_batches(
        ImageResize, fn_constructor_kwargs={"out": out},
        concurrency=(1, concurrency), batch_size=64, num_cpus=1,
        batch_format="pyarrow",
    )


class FrameSampler:
    """Actor-pool stage: video decode (stub codec) → strided frame
    selection → per-frame checksum. Decoder state once per actor; the
    per-row loop is the accepted shape for opaque binary payloads
    (cf. :class:`MediaFeatures`)."""

    def __init__(self, stride: int = 2):
        self.codec = FakeCodec()
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
                rows.append({
                    "media_id": mid,
                    "frame_idx": f,
                    "n_bytes": w * h,
                    "frame_md5": hashlib.md5(vid[f].tobytes()).hexdigest(),
                })
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"media_id": pa.array([], pa.int64()),
             "frame_idx": pa.array([], pa.int64()),
             "n_bytes": pa.array([], pa.int64()),
             "frame_md5": pa.array([], pa.string())})


def frame_sample(sf_dir: str, stride: int = 2, concurrency: int = 4):
    """Strided frame sampling over the video subset — the fourth member
    of the multimodal stage family (decode / feature-extract / resize /
    frame-sample). The stub codec tiles payload bytes into the declared
    (n_frames, height, width) volume, so every sampled frame's md5 is
    value-checkable by a SQL oracle that repeats+slices the SAME bytes
    (the testdata corpus is pure ASCII, where VARCHAR slicing == byte
    slicing; a real codec slots into FakeCodec's place with the same
    Ray plumbing)."""
    vids = media_ds(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")),
        batch_format="pyarrow")
    return vids.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        concurrency=(1, concurrency), batch_size=64, num_cpus=1,
        batch_format="pyarrow",
    )
