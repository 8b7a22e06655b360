"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media arrives as opaque ``binary`` columns with typed metadata (the engine's
span model carries only ``media_ref``; this module is the stage that would
dereference and process payloads). The decode kernels themselves are STUBS —
the image/audio libraries are not in this container — but the Ray-side
plumbing is real and tested: schema, actor-pool signature, batch sizing,
output layout.

``decoder="fake"`` produces deterministic feature vectors derived from the
payload bytes (so downstream stages and tests have real data to flow);
``decoder="real"`` raises NotImplementedError at the exact point a library
call (PIL/librosa/av) would go.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
from ontocast_ray.util import pool

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),  # image | audio | video | table
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        pa.field("media_ref", pa.string()),
        pa.field("kind", pa.string()),
        pa.field("feature", pa.list_(pa.float32())),
        pa.field("feature_dim", pa.int32()),
        pa.field("payload_sha", pa.string()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 9) -> pa.Table:
    """Deterministic fake media table for tests/benches."""
    rng = np.random.RandomState(seed)
    refs, kinds, payloads, widths, heights, durations = [], [], [], [], [], []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 512)))
        refs.append(f"media://synth/{i}")
        kinds.append(kind)
        payloads.append(payload)
        widths.append(int(rng.randint(16, 512)) if kind != "audio" else 0)
        heights.append(int(rng.randint(16, 512)) if kind != "audio" else 0)
        durations.append(int(rng.randint(100, 10_000)) if kind != "image" else 0)
    return pa.table(
        {
            "media_ref": pa.array(refs),
            "kind": pa.array(kinds),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "duration_ms": pa.array(durations, type=pa.int32()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool map_batches stage: decode → feature-extract media payloads.

    Large binary payloads need SMALL batch sizes: size ``batch_size`` so
    batch_bytes × concurrency fits the worker heap (documented contract; the
    pipeline builder passes batch_size explicitly).
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 32):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self.feature_dim = feature_dim
        # model-load slot: in a real deployment the vision/audio model loads
        # here, once per actor.

    def _decode_real(self, kind: str, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"real {kind} decode requires PIL/librosa/av, not present in this "
            "container — plug the library call here"
        )

    def _decode_fake(self, kind: str, payload: bytes) -> np.ndarray:
        # deterministic pseudo-features from payload bytes
        h = hashlib.blake2b(payload, digest_size=8).digest()
        rng = np.random.RandomState(zlib.crc32(h) & 0x7FFFFFFF)
        return rng.normal(size=self.feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats, shas = [], []
        for kind, payload in zip(kinds, payloads):
            payload = payload or b""
            if self.decoder == "real":
                vec = self._decode_real(kind, payload)
            else:
                vec = self._decode_fake(kind, payload)
            feats.append(vec.tolist())
            shas.append(hashlib.sha256(payload).hexdigest()[:16])
        return pa.table(
            {
                "media_ref": pa.array(refs, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "feature": pa.array(feats, type=pa.list_(pa.float32())),
                "feature_dim": pa.array([self.feature_dim] * len(refs), type=pa.int32()),
                "payload_sha": pa.array(shas, type=pa.string()),
            }
        )


def extract_media_features(
    media: "object",
    decoder: str = "fake",
    feature_dim: int = 32,
    batch_size: int = 16,
    concurrency: int = 2,
):
    """Dataset-level wrapper (small batches: payloads are large binaries)."""
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )


class ImageResizer:
    """Actor-pool resize stage: payload → resized payload + updated dims.

    ``backend="fake"`` emits a deterministic byte transform (truncated
    payload hash-extended to a size proportional to the target area) so the
    pipeline plumbing — small batches, metadata update, passthrough of
    non-image rows — is fully exercised; ``backend="real"`` raises at the
    exact point the PIL call goes.
    """

    def __init__(self, target_w: int = 64, target_h: int = 64, backend: str = "fake"):
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.target_w = target_w
        self.target_h = target_h
        self.backend = backend

    def _resize_real(self, payload: bytes) -> bytes:
        raise NotImplementedError(
            "real image resize requires PIL, not present in this container — "
            "Image.open(BytesIO(payload)).resize((w, h)) goes here"
        )

    def _resize_fake(self, payload: bytes) -> bytes:
        size = max(16, self.target_w * self.target_h // 64)
        h = hashlib.blake2b(payload, digest_size=32).digest()
        return (h * (size // 32 + 1))[:size]

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_payloads, out_w, out_h = [], [], []
        for kind, payload, w, hgt in zip(
            kinds, payloads, batch["width"].to_pylist(), batch["height"].to_pylist()
        ):
            if kind != "image":  # non-image rows pass through untouched
                out_payloads.append(payload)
                out_w.append(w)
                out_h.append(hgt)
                continue
            fn = self._resize_real if self.backend == "real" else self._resize_fake
            out_payloads.append(fn(payload or b""))
            out_w.append(self.target_w)
            out_h.append(self.target_h)
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "payload": pa.array(out_payloads, type=pa.binary()),
                "width": pa.array(out_w, type=pa.int32()),
                "height": pa.array(out_h, type=pa.int32()),
                "duration_ms": batch["duration_ms"],
            }
        )


class FrameSampler:
    """Actor-pool frame-sampling stage: one video row → N frame rows.

    Emits evenly-spaced frame timestamps over duration_ms with a
    deterministic fake frame payload per (video, timestamp);
    ``backend="real"`` raises where the av/ffmpeg seek-and-decode goes.
    Non-video rows are dropped (this stage feeds a frame pipeline).
    """

    def __init__(self, n_frames: int = 4, backend: str = "fake"):
        if backend not in ("fake", "real"):
            raise ValueError(backend)
        self.n_frames = n_frames
        self.backend = backend

    def _frame_real(self, payload: bytes, ts_ms: int) -> bytes:
        raise NotImplementedError(
            "real frame extraction requires av/ffmpeg, not present — "
            "container seek + decode goes here"
        )

    def _frame_fake(self, payload: bytes, ts_ms: int) -> bytes:
        return hashlib.blake2b(
            payload + ts_ms.to_bytes(8, "little"), digest_size=64
        ).digest()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, kinds = batch["media_ref"].to_pylist(), batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        durations = batch["duration_ms"].to_pylist()
        o_ref, o_idx, o_ts, o_frame = [], [], [], []
        fn = self._frame_real if self.backend == "real" else self._frame_fake
        for ref, kind, payload, dur in zip(refs, kinds, payloads, durations):
            if kind != "video":
                continue
            dur = max(int(dur or 0), 1)
            for i in range(self.n_frames):
                # evenly spaced, centered: (i + 0.5) / n of the duration
                ts = int(dur * (2 * i + 1) // (2 * self.n_frames))
                o_ref.append(ref)
                o_idx.append(i)
                o_ts.append(ts)
                o_frame.append(fn(payload or b"", ts))
        return pa.table(
            {
                "media_ref": pa.array(o_ref, type=pa.string()),
                "frame_idx": pa.array(o_idx, type=pa.int32()),
                "ts_ms": pa.array(o_ts, type=pa.int32()),
                "frame": pa.array(o_frame, type=pa.binary()),
            }
        )


def resize_images(media, target_w: int = 64, target_h: int = 64,
                  backend: str = "fake", batch_size: int = 16, concurrency: int = 2):
    """Dataset wrapper (small batches: payloads are large binaries)."""
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "backend": backend},
        batch_format="pyarrow", batch_size=batch_size, concurrency=pool(concurrency),
    )


def sample_frames(media, n_frames: int = 4, backend: str = "fake",
                  batch_size: int = 8, concurrency: int = 2):
    """Dataset wrapper: video rows fan out to frame rows (small batches)."""
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "backend": backend},
        batch_format="pyarrow", batch_size=batch_size, concurrency=pool(concurrency),
    )
