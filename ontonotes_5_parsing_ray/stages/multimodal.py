"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a sidecar metadata
struct; decode/feature stages are actor pools operating on small Arrow
batches (large payloads -> small ``batch_size``, see SURVEY.md 'Memory-
aware'). The actual codecs are NOT in this container, so the decode kernel
is stubbed: ``decode=fake`` produces a deterministic fake decode (shape +
checksum features) and ``decode=strict`` raises ``NotImplementedError`` —
the Ray-side plumbing (schema, actor signature, batching, output layout)
is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("width", pa.int32()),            # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthesize_media_table(n: int = 64, seed: int = 23) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks (binary payloads
    from a seeded RNG; no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 1024)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(int(rng.randint(16, 512)) if kind != "audio" else 0)
        rows["height"].append(int(rng.randint(16, 512)) if kind != "audio" else 0)
        rows["sample_rate"].append(16000 if kind != "image" else 0)
        rows["duration_ms"].append(int(rng.randint(100, 10_000)) if kind != "image" else 0)
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeMedia:
    """Actor-pool decode/feature stage.

    ``mode='fake'``: deterministic pseudo-decode — feature vector =
    normalized byte histogram moments + payload checksum. ``mode='strict'``:
    raises ``NotImplementedError`` (real codecs, e.g. PIL/ffmpeg, are not in
    this container; swap this class's body when they are).
    """

    def __init__(self, mode: str = "fake", feature_dim: int = 8):
        if mode not in ("fake", "strict"):
            raise ValueError(mode)
        self.mode = mode
        self.dim = feature_dim

    def _fake_features(self, payload: bytes) -> List[float]:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        hist = np.histogram(arr, bins=self.dim, range=(0, 256))[0].astype(np.float64)
        total = hist.sum() or 1.0
        return list(np.round(hist / total, 6))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "strict":
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "use mode='fake' or install decoders"
            )
        payloads = batch.column("payload").to_pylist()
        feats = [self._fake_features(p) for p in payloads]
        checksums = [
            int.from_bytes(hashlib.blake2b(p, digest_size=4).digest(), "big")
            for p in payloads
        ]
        return (
            batch.drop_columns(["payload"])  # decoded stages drop the heavy bytes
            .append_column("features", pa.array(feats, pa.list_(pa.float64())))
            .append_column("payload_crc", pa.array(checksums, pa.int64()))
            .append_column("n_bytes", pa.array(
                [len(p) for p in payloads], pa.int32()))
        )


def decode_media(media: rd.Dataset, mode: str = "fake") -> rd.Dataset:
    """Small batches + explicit actor pool: the binary column dominates block
    size, so batch_size stays low (SURVEY.md 'large binary payloads need
    small batches')."""
    from .util import pool_size

    return media.map_batches(
        DecodeMedia, fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow", batch_size=32, concurrency=pool_size(2),
        num_cpus=1,
    )
