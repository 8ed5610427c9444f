"""Multimodal columns: opaque binary payloads with typed metadata.

North-star addition.  Image/audio/video payloads ride as ``binary`` columns
with a ``kind`` tag and a JSON metadata string; decode / feature-extract /
resize / frame-sample are actor-pool ``map_batches`` stages.  The sandbox
image has no codec libraries (no PIL/ffmpeg), so the *decoders for real
formats are STUBS* that raise ``NotImplementedError`` — everything around
them (schema, batch sizing for wide binary rows, actor signatures, output
layout, deterministic fake codec for tests) is real and tested.

Fake codec format (deterministic, produced by ``synth_media``):
``b"FAKEIMG1" + width:uint16 LE + height:uint16 LE + payload bytes``,
``b"FAKEAUD1" + sample_rate:uint32 LE + n_samples:uint32 LE + payload`` and
``b"FAKEVID1" + n_frames:uint16 + width:uint16 + height:uint16 LE +
frame bytes (frame-major)``.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from linkgraph.runtime import resolve_concurrency

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # "image" | "audio" | "video"
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.string()),  # JSON
    ]
)


def synth_media(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media table (images + audio)."""
    rng = np.random.default_rng(seed)
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        if i % 7 == 6:
            f = int(rng.integers(4, 24))
            w = int(rng.integers(4, 16))
            h = int(rng.integers(4, 16))
            body = rng.integers(0, 256, f * w * h, dtype=np.uint8).tobytes()
            payloads.append(
                b"FAKEVID1"
                + int(f).to_bytes(2, "little")
                + int(w).to_bytes(2, "little")
                + int(h).to_bytes(2, "little")
                + body
            )
            kinds.append("video")
            metas.append(json.dumps({"n_frames": f, "width": w, "height": h}))
        elif i % 3 == 2:
            sr = 8000
            ns = int(rng.integers(100, 1000))
            body = rng.integers(0, 256, ns, dtype=np.uint8).tobytes()
            payloads.append(
                b"FAKEAUD1"
                + int(sr).to_bytes(4, "little")
                + int(ns).to_bytes(4, "little")
                + body
            )
            kinds.append("audio")
            metas.append(json.dumps({"sample_rate": sr, "n_samples": ns}))
        else:
            w = int(rng.integers(4, 64))
            h = int(rng.integers(4, 64))
            body = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
            payloads.append(
                b"FAKEIMG1"
                + int(w).to_bytes(2, "little")
                + int(h).to_bytes(2, "little")
                + body
            )
            kinds.append("image")
            metas.append(json.dumps({"width": w, "height": h}))
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def synth_media_planted(n: int) -> pa.Table:
    """Closed-form fake media table for VALUE-CHECKED driver oracles.

    Unlike ``synth_media`` (rng payloads), every dimension and body byte is
    a closed form of ``media_id`` that a SQL oracle can recompute with
    ``generate_series`` (the ``extraction_cc`` recipe):

    - kind: video if i%7==6, else audio if i%3==2, else image
    - video: f=4+i%12, w=4+i%9, h=4+(i*3)%9
    - audio: sr=8000, ns=100+i%900
    - image: w=4+i%29, h=4+(i*5)%27
    - body byte j (flattened): (i*31 + j*17) % 256
    """
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        if i % 7 == 6:
            f, w, h = 4 + i % 12, 4 + i % 9, 4 + (i * 3) % 9
            npix = f * w * h
            hdr = (
                b"FAKEVID1"
                + f.to_bytes(2, "little")
                + w.to_bytes(2, "little")
                + h.to_bytes(2, "little")
            )
            kinds.append("video")
            metas.append(json.dumps({"n_frames": f, "width": w, "height": h}))
        elif i % 3 == 2:
            ns = 100 + i % 900
            npix = ns
            hdr = b"FAKEAUD1" + (8000).to_bytes(4, "little") + ns.to_bytes(4, "little")
            kinds.append("audio")
            metas.append(json.dumps({"sample_rate": 8000, "n_samples": ns}))
        else:
            w, h = 4 + i % 29, 4 + (i * 5) % 27
            npix = w * h
            hdr = b"FAKEIMG1" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            kinds.append("image")
            metas.append(json.dumps({"width": w, "height": h}))
        body = ((i * 31 + np.arange(npix, dtype=np.int64) * 17) % 256).astype(np.uint8)
        payloads.append(hdr + body.tobytes())
        ids.append(i)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, pa.string()),
        }
    )


def _decode(payload: bytes):
    """Decode one payload → (kind, array, meta).  STUB for real formats."""
    if payload.startswith(b"FAKEIMG1"):
        w = int.from_bytes(payload[8:10], "little")
        h = int.from_bytes(payload[10:12], "little")
        arr = np.frombuffer(payload[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)
        return "image", arr, {"width": w, "height": h}
    if payload.startswith(b"FAKEAUD1"):
        sr = int.from_bytes(payload[8:12], "little")
        ns = int.from_bytes(payload[12:16], "little")
        arr = np.frombuffer(payload[16 : 16 + ns], dtype=np.uint8)
        return "audio", arr, {"sample_rate": sr, "n_samples": ns}
    if payload.startswith(b"FAKEVID1"):
        f = int.from_bytes(payload[8:10], "little")
        w = int.from_bytes(payload[10:12], "little")
        h = int.from_bytes(payload[12:14], "little")
        arr = np.frombuffer(payload[14 : 14 + f * w * h], dtype=np.uint8).reshape(
            f, h, w
        )
        return "video", arr, {"n_frames": f, "width": w, "height": h}
    # real formats (JPEG/PNG/WAV/MP4) need codec libs not present in this
    # image — clearly-marked stub per the build contract
    raise NotImplementedError(
        "real media codecs unavailable in this environment; payload must be "
        "FAKEIMG1/FAKEAUD1 (see synth_media)"
    )


class MediaFeatures:
    """Actor-pool stage: media batch → per-item features.

    Stateless state? No — a real deployment loads the codec/model here once
    per actor; the fake codec needs no state but the signature and the
    batch-size discipline (small batches, wide binary rows) are the real
    plumbing.
    """

    def __init__(self) -> None:
        pass

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["media_id"]
        feats = {
            "media_id": [],
            "kind": [],
            "n_bytes": [],
            "width": [],
            "height": [],
            "mean_val": [],
            "std_val": [],
        }
        for mid, payload in zip(ids.to_pylist(), t["payload"].to_pylist()):
            kind, arr, meta = _decode(payload)
            feats["media_id"].append(mid)
            feats["kind"].append(kind)
            feats["n_bytes"].append(len(payload))
            feats["width"].append(meta.get("width", 0))
            feats["height"].append(meta.get("height", 0))
            # exact integer moments (uint8 sums are exact in int64/float64),
            # then one float divide + sqrt — bit-deterministic at any batch
            # split AND algebraically identical to the SQL oracle's
            # sqrt(avg(v*v) - avg(v)^2), the repo-wide fixed-point contract
            if arr.size:
                flat = arr.reshape(-1).astype(np.int64)
                m = float(int(flat.sum())) / flat.size
                m2 = float(int((flat * flat).sum())) / flat.size
                feats["mean_val"].append(m)
                feats["std_val"].append(float(np.sqrt(max(m2 - m * m, 0.0))))
            else:
                feats["mean_val"].append(0.0)
                feats["std_val"].append(0.0)
        return pa.table(
            {
                "media_id": pa.array(feats["media_id"], pa.int64()),
                "kind": pa.array(feats["kind"], pa.string()),
                "n_bytes": pa.array(feats["n_bytes"], pa.int64()),
                "width": pa.array(feats["width"], pa.int64()),
                "height": pa.array(feats["height"], pa.int64()),
                "mean_val": pa.array(feats["mean_val"], pa.float64()),
                "std_val": pa.array(feats["std_val"], pa.float64()),
            }
        )


class ImageResizer:
    """Actor-pool stage: nearest-neighbor resize of fake images.

    For real formats this is where PIL/opencv would load once per actor —
    stubbed via ``_decode``.
    """

    def __init__(self, out_w: int = 16, out_h: int = 16) -> None:
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, payloads = [], []
        for mid, payload, kind in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(), t["kind"].to_pylist()
        ):
            if kind != "image":
                continue
            _, arr, meta = _decode(payload)
            yi = (np.arange(self.out_h) * arr.shape[0] // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * arr.shape[1] // self.out_w).astype(np.int64)
            small = arr[np.ix_(yi, xi)]
            ids.append(mid)
            payloads.append(
                b"FAKEIMG1"
                + int(self.out_w).to_bytes(2, "little")
                + int(self.out_h).to_bytes(2, "little")
                + small.tobytes()
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(
                    [json.dumps({"width": self.out_w, "height": self.out_h})] * len(ids),
                    pa.string(),
                ),
            }
        )


def media_features(
    media: rd.Dataset, *, concurrency: int | tuple[int, int] | None = None, batch_size: int = 64
) -> rd.Dataset:
    """Feature extraction over a media table (small batches: wide rows)."""
    return media.map_batches(
        MediaFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )


def resize_images(
    media: rd.Dataset,
    out_w: int = 16,
    out_h: int = 16,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
) -> rd.Dataset:
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )


class FrameSampler:
    """Actor-pool stage: video rows → ``n_out`` uniformly-spaced frames per
    video, each emitted as a standalone FAKEIMG1 image row (media_id,
    frame_idx, payload) — the frame-sampling front of a video-understanding
    pipeline.  Non-video rows are dropped; a real deployment loads ffmpeg
    here once per actor (stubbed via ``_decode``)."""

    def __init__(self, n_out: int = 4) -> None:
        self.n_out = n_out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, payloads = [], [], []
        for mid, payload, kind in zip(
            t["media_id"].to_pylist(), t["payload"].to_pylist(), t["kind"].to_pylist()
        ):
            if kind != "video":
                continue
            _, arr, meta = _decode(payload)
            f, h, w = arr.shape
            take = np.unique(
                (np.arange(self.n_out) * f // max(self.n_out, 1)).astype(np.int64)
            )
            for j in take:
                ids.append(mid)
                fidx.append(int(j))
                payloads.append(
                    b"FAKEIMG1"
                    + int(w).to_bytes(2, "little")
                    + int(h).to_bytes(2, "little")
                    + arr[j].tobytes()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def sample_frames(
    media: rd.Dataset,
    n_out: int = 4,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
) -> rd.Dataset:
    """Uniformly sample ``n_out`` frames from every video row (small
    batches: wide binary rows)."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_out": n_out},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )
