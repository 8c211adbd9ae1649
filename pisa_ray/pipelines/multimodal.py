"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are not available in this
environment, so the decode kernel is a clearly-marked deterministic
stub (``FakeDecoder``) — but everything Ray-side is real and tested:
schema (binary payload + metadata struct), small batch sizes for wide
binary rows, actor signature (decoder state loaded once per actor),
and the partitioned output layout. Swapping ``FakeDecoder`` for
PIL/torchaudio is a one-class change.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio"])[rng.integers(0, 2, size=n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096))).astype(np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "kind": pa.array(kinds.tolist()),
            "payload": pa.array(payloads, type=pa.large_binary()),
            "width": pa.array(rng.integers(16, 256, size=n).astype("int32")),
            "height": pa.array(rng.integers(16, 256, size=n).astype("int32")),
            "sample_rate": pa.array(np.where(kinds == "audio", 16000, 0).astype("int32")),
        }
    )


class FakeDecoder:
    """STUB decode/feature-extract stage (real libs unavailable here).

    Deterministic: features = first 8 bytes of sha256(payload) scaled.
    A real deployment replaces `_decode` with PIL / ffmpeg / torchaudio
    — the actor plumbing (init-once state, per-batch vectorized loop,
    small batches for wide rows) is exactly what production needs.
    """

    def __init__(self, feat_dim: int = 8):
        self.feat_dim = feat_dim

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        return (
            np.frombuffer(h[: self.feat_dim], dtype=np.uint8).astype(np.float64)
            / 255.0
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        kinds = batch["kind"].to_pylist()
        feats = [
            self._decode(p, k) for p, k in zip(payloads.to_pylist(), kinds)
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    [len(p) for p in payloads.to_pylist()], type=pa.int64()
                ),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.large_list(pa.float64())
                ),
            }
        )


def decode_features(
    media: rd.Dataset, concurrency: int = 2, batch_size: int = 16
) -> rd.Dataset:
    """Actor-pool decode: small batch_size because payload rows are
    wide — batch x concurrency must fit worker heaps."""
    return media.map_batches(
        FakeDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


class FakeResizer:
    """STUB image-resize stage (PIL unavailable): deterministic
    payload transform preserving the Ray-side contract — width/height
    metadata updated, payload size scales with target area. Replace
    `_resize` with PIL `Image.resize` in production; batch sizes stay
    small because rows are wide."""

    def __init__(self, target_w: int = 64, target_h: int = 64):
        self.tw, self.th = target_w, target_h

    def _resize(self, payload: bytes, w: int, h: int) -> bytes:
        n_out = max(1, int(len(payload) * (self.tw * self.th) / max(1, w * h)))
        rep = (payload * (n_out // max(1, len(payload)) + 1))[:n_out]
        return rep

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        out = [
            self._resize(p, w, h)
            for p, w, h in zip(payloads.to_pylist(), ws, hs)
        ]
        n = len(out)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out, type=pa.large_binary()),
                "width": pa.array([self.tw] * n, type=pa.int32()),
                "height": pa.array([self.th] * n, type=pa.int32()),
                "sample_rate": batch["sample_rate"],
            }
        )


class FakeFrameSampler:
    """STUB video frame-sampler (ffmpeg unavailable): splits a payload
    into `n_frames` deterministic byte slices, one output row per
    frame (flat_map-shaped expansion inside map_batches)."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ids = batch["media_id"].to_pylist()
        out_id, out_frame, out_bytes = [], [], []
        for mid, p in zip(ids, payloads.to_pylist()):
            step = max(1, len(p) // self.n_frames)
            for f in range(self.n_frames):
                out_id.append(mid)
                out_frame.append(f)
                out_bytes.append(p[f * step : (f + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame": pa.array(out_frame, type=pa.int32()),
                "frame_payload": pa.array(out_bytes, type=pa.large_binary()),
            }
        )


def resize_images(media: rd.Dataset, target_w: int = 64, target_h: int = 64,
                  concurrency: int = 2, batch_size: int = 16) -> rd.Dataset:
    return media.map_batches(
        FakeResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1,
    )


def sample_frames(media: rd.Dataset, n_frames: int = 4,
                  concurrency: int = 2, batch_size: int = 16) -> rd.Dataset:
    return media.map_batches(
        FakeFrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency), num_cpus=1,
    )
