"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

Three codecs are REAL stdlib decoders — WAV via ``wave`` (sample
rate / channels / duration / PCM rms+peak + an 8-segment RMS-envelope
feature vector), PNG via ``zlib`` (full chunk parse, IDAT inflate,
all five scanline filters reconstructed, per-channel pixel stats) and
24-bit BMP via ``struct``/numpy (header parse, stride/padding,
bottom-up and top-down scanlines, same pixel stats).
Video and unrecognized payloads fall through to the clearly-marked
deterministic stub (``FakeDecoder``) — ffmpeg/PIL are not in this
environment. Everything Ray-side is real and tested either way:
schema (binary payload + metadata), small batch sizes for wide binary
rows, actor signature (decoder state loaded once per actor), and the
partitioned output layout.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _synth_wav_truth(
    rng: np.random.Generator, sample_rate: int = 8000, max_frames: int = 2048
) -> tuple[bytes, np.ndarray, int, int]:
    """Real RIFF/WAVE bytes plus the synthesis-side ground truth
    (pre-encode PCM, rate, channels) — the truth lets an independent
    oracle pin the decoder without running it (16-bit PCM in a WAV
    container is lossless, so decode must recover these samples)."""
    n = int(rng.integers(256, max_frames))
    channels = int(rng.integers(1, 3))
    t = np.arange(n, dtype=np.float64) / sample_rate
    sig = np.zeros((n, channels))
    for c in range(channels):
        f0 = float(rng.uniform(80.0, 2000.0))
        amp = float(rng.uniform(0.1, 0.9))
        sig[:, c] = amp * np.sin(2 * np.pi * f0 * t)
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue(), pcm.reshape(n, channels), sample_rate, channels


def synth_wav(rng: np.random.Generator, sample_rate: int = 8000,
              max_frames: int = 2048) -> bytes:
    """Real RIFF/WAVE bytes: a seeded sum-of-sines int16 signal."""
    return _synth_wav_truth(rng, sample_rate, max_frames)[0]


def _png_filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                    bpp: int) -> np.ndarray:
    """Apply PNG scanline filter `ftype` (encoder side, mod-256)."""
    cur16 = cur.astype(np.int16)
    left = np.zeros_like(cur16)
    left[bpp:] = cur16[:-bpp]
    up = prev.astype(np.int16)
    upleft = np.zeros_like(cur16)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = cur16
    elif ftype == 1:
        out = cur16 - left
    elif ftype == 2:
        out = cur16 - up
    elif ftype == 3:
        out = cur16 - ((left + up) // 2)
    elif ftype == 4:
        p = left + up - upleft
        pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                        np.where(pb <= pc, up, upleft))
        out = cur16 - pred
    else:  # pragma: no cover
        raise ValueError(ftype)
    return (out % 256).astype(np.uint8)


def _synth_png_truth(
    rng: np.random.Generator, w: int = 24, h: int = 24
) -> tuple[bytes, np.ndarray]:
    """Real PNG bytes (8-bit RGB) plus the pre-encode pixel array
    (PNG is lossless — decode must recover it exactly)."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    base = np.stack(
        [
            (x * 255 // max(1, w - 1)) + 0 * y,
            (y * 255 // max(1, h - 1)) + 0 * x,
            ((x + y) * 255 // max(1, w + h - 2)),
        ],
        axis=-1,
    ).astype(np.int32)
    img = np.clip(base + rng.integers(-24, 25, size=(h, w, 3)), 0, 255).astype(np.uint8)
    bpp = 3
    prev = np.zeros(w * bpp, dtype=np.uint8)
    raw = bytearray()
    for r in range(h):
        cur = img[r].reshape(-1)
        ftype = r % 5
        raw.append(ftype)
        raw.extend(_png_filter_row(ftype, cur, prev, bpp).tobytes())
        prev = cur
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, RGB
    payload = (_PNG_MAGIC + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    return payload, img


def synth_png(rng: np.random.Generator, w: int = 24, h: int = 24) -> bytes:
    """Real PNG bytes (8-bit RGB): smooth seeded gradient + noise,
    each scanline filtered with a cycling filter type 0..4 so the
    decoder's full unfilter surface is exercised."""
    return _synth_png_truth(rng, w, h)[0]


def _synth_bmp_truth(
    rng: np.random.Generator, w: int = 24, h: int = 24
) -> tuple[bytes, np.ndarray]:
    """Real BMP bytes plus the pre-encode RGB pixel array (24-bit BMP
    is lossless — decode must recover it exactly)."""
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)  # RGB
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        rows.extend(img[r, :, ::-1].tobytes())  # RGB -> BGR
        rows.extend(b"\x00" * pad)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54)
    return header + info + bytes(rows), img


def synth_bmp(rng: np.random.Generator, w: int = 24, h: int = 24) -> bytes:
    """Real BMP bytes: 24-bit uncompressed BITMAPINFOHEADER, bottom-up
    BGR scanlines padded to 4-byte boundaries — seeded noise pixels."""
    return _synth_bmp_truth(rng, w, h)[0]


def _synth_media_rows(n: int = 64, seed: int = 42) -> list[dict]:
    """The single deterministic generation loop behind both
    :func:`synth_media` (payload table) and
    :func:`synth_media_manifest` (independent ground truth): one rng
    stream, each row carrying its payload plus the synthesis-side
    truth (pre-encode PCM/pixels) the decoders must recover."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    rows, img_i = [], 0
    for i, k in enumerate(kinds):
        row = {"media_id": i, "kind": str(k)}
        if k == "audio":
            payload, pcm, rate, ch = _synth_wav_truth(rng)
            row.update(payload=payload, width=0, height=0, sample_rate=8000,
                       truth=dict(decoder="wav", pcm=pcm, rate=rate,
                                  channels=ch))
        elif k == "image":
            w = int(rng.integers(8, 48)); h = int(rng.integers(8, 48))
            if img_i % 2 == 0:
                payload, img = _synth_png_truth(rng, w, h)
                dec = "png"
            else:
                payload, img = _synth_bmp_truth(rng, w, h)
                dec = "bmp"
            img_i += 1
            row.update(payload=payload, width=w, height=h, sample_rate=0,
                       truth=dict(decoder=dec, img=img))
        else:
            payload = (
                rng.integers(0, 256, size=int(rng.integers(512, 4096)))
                .astype(np.uint8).tobytes())
            row.update(payload=payload,
                       width=int(rng.integers(16, 256)),
                       height=int(rng.integers(16, 256)),
                       sample_rate=0, truth=dict(decoder="stub"))
        rows.append(row)
    return rows


def synth_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media table. `audio` rows carry REAL WAV payloads,
    `image` rows REAL PNG or BMP payloads (alternating), `video` rows
    opaque seeded bytes (exercising the stub fallback path)."""
    rows = _synth_media_rows(n, seed)
    return pa.table(
        {
            "media_id": pa.array([r["media_id"] for r in rows], type=pa.int64()),
            "kind": pa.array([r["kind"] for r in rows]),
            "payload": pa.array([r["payload"] for r in rows], type=pa.large_binary()),
            "width": pa.array([r["width"] for r in rows], type=pa.int32()),
            "height": pa.array([r["height"] for r in rows], type=pa.int32()),
            "sample_rate": pa.array([r["sample_rate"] for r in rows], type=pa.int32()),
        }
    )


def synth_media_manifest(n: int = 64, seed: int = 42) -> pa.Table:
    """INDEPENDENT expected-decode table for :func:`synth_media`'s
    rows, computed from the synthesis-side truth (pre-encode PCM /
    pixel arrays and container parameters), NOT by running the
    decoders — WAV/PNG/BMP are lossless, so a correct decoder must
    reproduce these numbers exactly. This is what makes
    ``multimodal_decode`` driver-checkable: the oracle embeds this
    table as SQL literals and the engine's actor-pool decode output
    must hash-match it (stub rows pin the sha256 identity layer only,
    by construction). Feature vector flattened to f0..f7 scalar
    columns (drivers hash scalar cells, not lists)."""
    rows = _synth_media_rows(n, seed)
    out = {
        "media_id": [], "kind": [], "decoder": [], "sha256": [],
        "n_bytes": [], "width": [], "height": [], "n_channels": [],
        "sample_rate_hz": [], "duration_s": [],
    }
    feats_all = []
    stub = FakeDecoder(MediaDecoder.FEAT_DIM)
    for r in rows:
        t = r["truth"]
        if t["decoder"] == "wav":
            x = t["pcm"].astype(np.float64) / 32768.0  # decode_wav's exact map
            feats, meta = _wav_env_features(
                x, t["rate"], t["channels"], MediaDecoder.FEAT_DIM
            )
        elif t["decoder"] in ("png", "bmp"):
            feats, meta = _pixel_stat_features(
                t["img"], r["width"], r["height"], 3, MediaDecoder.FEAT_DIM
            )
        else:
            feats = stub._decode(r["payload"], "")
            meta = dict(width=0, height=0, n_channels=0,
                        sample_rate_hz=0, duration_s=0.0)
        out["media_id"].append(r["media_id"])
        out["kind"].append(r["kind"])
        out["decoder"].append(t["decoder"])
        out["sha256"].append(hashlib.sha256(r["payload"]).hexdigest())
        out["n_bytes"].append(len(r["payload"]))
        out["width"].append(meta["width"])
        out["height"].append(meta["height"])
        out["n_channels"].append(meta["n_channels"])
        out["sample_rate_hz"].append(meta["sample_rate_hz"])
        out["duration_s"].append(float(meta["duration_s"]))
        feats_all.append(feats)
    tbl = {
        "media_id": pa.array(out["media_id"], type=pa.int64()),
        "kind": pa.array(out["kind"]),
        "decoder": pa.array(out["decoder"]),
        "sha256": pa.array(out["sha256"]),
        "n_bytes": pa.array(out["n_bytes"], type=pa.int64()),
        "width": pa.array(out["width"], type=pa.int64()),
        "height": pa.array(out["height"], type=pa.int64()),
        "n_channels": pa.array(out["n_channels"], type=pa.int64()),
        "sample_rate_hz": pa.array(out["sample_rate_hz"], type=pa.int64()),
        "duration_s": pa.array(out["duration_s"], type=pa.float64()),
    }
    F = np.vstack(feats_all)
    for j in range(MediaDecoder.FEAT_DIM):
        tbl[f"f{j}"] = pa.array(F[:, j], type=pa.float64())
    return pa.table(tbl)


def decode_png(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Pure-stdlib PNG decode: chunk parse, IDAT inflate, all five
    scanline filters reconstructed. Supports 8-bit grayscale (color
    type 0), RGB (2) and RGBA (6), no interlace. Returns
    (pixels[h,w,c] uint8, width, height, channels)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG depth={depth} interlace={interlace}")
    channels = {0: 1, 2: 3, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    bpp = channels
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=r * (stride + 1) + 1)
        ftype = raw[r * (stride + 1)]
        if ftype == 0:
            recon = row.astype(np.int32)
        elif ftype == 2:  # Up — fully vectorized
            recon = (row.astype(np.int32) + prev) % 256
        elif ftype == 1:  # Sub — cumsum mod 256 per bpp phase
            recon = row.astype(np.int64).reshape(w, bpp).cumsum(axis=0) % 256
            recon = recon.reshape(stride).astype(np.int32)
        elif ftype in (3, 4):
            # Average / Paeth: sequential in x, vectorized over channels.
            recon2 = np.empty((w, bpp), dtype=np.int32)
            row2 = row.astype(np.int32).reshape(w, bpp)
            prev2 = prev.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for xcol in range(w):
                up = prev2[xcol]
                if ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - upleft
                    pa_, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                    pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                    np.where(pb <= pc, up, upleft))
                left = (row2[xcol] + pred) % 256
                recon2[xcol] = left
                upleft = up
            recon = recon2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[r] = recon.astype(np.uint8)
        prev = recon
    return out.reshape(h, w, channels), w, h, channels


def decode_bmp(payload: bytes) -> tuple[np.ndarray, int, int, int]:
    """Pure-stdlib BMP decode: BITMAPINFOHEADER (or larger), 24-bit
    uncompressed, bottom-up or top-down. Returns
    (pixels[h,w,3] uint8 RGB, width, height, 3)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (info_size,) = struct.unpack_from("<I", payload, 14)
    if info_size < 40:
        raise ValueError(f"unsupported BMP header size {info_size}")
    w, h_raw, _planes, bpp, comp = struct.unpack_from("<iiHHI", payload, 18)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP bpp={bpp} compression={comp}")
    if w <= 0 or h_raw == 0:
        raise ValueError("bad BMP dimensions")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) & ~3
    if data_off + stride * h > len(payload):
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy(), w, h, 3  # BGR -> RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Pure-stdlib WAV decode via `wave`. Returns
    (samples[frames, channels] float64 in [-1, 1], sample_rate, channels)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, channels), rate, channels


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


def _wav_env_features(x: np.ndarray, rate: int, channels: int, feat_dim: int):
    """Shared feature kernel over (frames, channels) float samples in
    [-1, 1] — called by the decoder (on decoded PCM) AND by the
    synthesis-side manifest (on pre-encode PCM): identical inputs must
    give bit-identical features, which is the round-trip check."""
    mono = x.mean(axis=1) if channels > 1 else x[:, 0]
    n = len(mono)
    k = feat_dim
    if n == 0:
        env = np.zeros(k)
    else:
        # k-segment RMS envelope; rms of [-1,1] samples is in [0,1].
        edges = np.linspace(0, n, k + 1).astype(np.int64)
        env = np.array(
            [
                np.sqrt(np.mean(mono[a:b] ** 2)) if b > a else 0.0
                for a, b in zip(edges[:-1], edges[1:])
            ]
        )
    return (
        np.clip(env, 0.0, 1.0),
        dict(width=0, height=0, n_channels=channels,
             sample_rate_hz=rate, duration_s=n / rate if rate else 0.0),
    )


def _pixel_stat_features(px, w: int, h: int, channels: int, feat_dim: int):
    """Shared per-channel pixel-stat kernel (decoder AND manifest —
    see :func:`_wav_env_features` for why sharing is the point).
    Layout: [mean_c0..c2, overall_mean, std_c0..c2, overall_std]."""
    flat = px.reshape(-1, channels).astype(np.float64) / 255.0
    means = flat.mean(axis=0)
    stds = flat.std(axis=0)
    feats = np.zeros(feat_dim)
    nc = min(channels, 3)
    feats[:nc] = means[:nc]
    feats[3] = float(flat.mean())
    feats[4:4 + nc] = stds[:nc]
    feats[7] = float(flat.std())
    return (
        np.clip(feats, 0.0, 1.0),
        dict(width=w, height=h, n_channels=channels,
             sample_rate_hz=0, duration_s=0.0),
    )


class MediaDecoder:
    """REAL decode/feature-extract stage. Sniffs each payload's magic
    bytes and dispatches: RIFF/WAVE -> stdlib ``wave`` decode (sample
    rate, channels, duration, 8-segment RMS envelope features); PNG
    magic -> pure-stdlib zlib decode (width/height/channels, pixel
    mean/std features); "BM" magic -> pure-stdlib 24-bit BMP decode
    (same pixel stats); anything else -> the deterministic sha256
    stub (``decoder='stub'``) so unknown codecs degrade loudly rather
    than crash the stream.

    Actor contract: dispatch table + feature dim are built once in
    ``__init__`` (per actor), ``__call__`` handles one Arrow batch.
    Feature vectors are a fixed 8 floats in [0, 1] for every decoder
    so downstream ANN / clustering stages see one schema.
    """

    FEAT_DIM = 8

    def __init__(self, feat_dim: int = 8):
        if feat_dim != 8:
            raise ValueError("MediaDecoder feature layout is fixed at 8 dims")
        self.feat_dim = feat_dim
        self._stub = FakeDecoder(feat_dim)

    def _wav_features(self, payload: bytes):
        x, rate, channels = decode_wav(payload)
        return _wav_env_features(x, rate, channels, self.feat_dim)

    def _png_features(self, payload: bytes):
        px, w, h, c = decode_png(payload)
        return _pixel_stat_features(px, w, h, c, self.feat_dim)

    def _bmp_features(self, payload: bytes):
        px, w, h, c = decode_bmp(payload)
        return _pixel_stat_features(px, w, h, c, self.feat_dim)

    def _decode_one(self, payload: bytes):
        try:
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                feats, meta = self._wav_features(payload)
                return "wav", feats, meta
            if payload[:8] == _PNG_MAGIC:
                feats, meta = self._png_features(payload)
                return "png", feats, meta
            if payload[:2] == b"BM":
                feats, meta = self._bmp_features(payload)
                return "bmp", feats, meta
        except (ValueError, EOFError, zlib.error, wave.Error, struct.error):
            pass  # corrupt container -> stub features, not a dead block
        feats = self._stub._decode(payload, "")
        return "stub", feats, dict(width=0, height=0, n_channels=0,
                                   sample_rate_hz=0, duration_s=0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        raw = payloads.to_pylist()
        decoders, feats, metas = [], [], []
        for p in raw:
            d, f, m = self._decode_one(p)
            decoders.append(d)
            feats.append(f)
            metas.append(m)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "decoder": pa.array(decoders, type=pa.string()),
                "n_bytes": pa.array([len(p) for p in raw], type=pa.int64()),
                "width": pa.array([m["width"] for m in metas], type=pa.int32()),
                "height": pa.array([m["height"] for m in metas], type=pa.int32()),
                "n_channels": pa.array(
                    [m["n_channels"] for m in metas], type=pa.int32()),
                "sample_rate_hz": pa.array(
                    [m["sample_rate_hz"] for m in metas], type=pa.int32()),
                "duration_s": pa.array(
                    [m["duration_s"] for m in metas], type=pa.float64()),
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
        MediaDecoder,
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
