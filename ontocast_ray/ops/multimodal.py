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
