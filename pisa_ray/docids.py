"""Deterministic docID assignment.

``doc_id = uint64 big-endian prefix of sha256(repo \\x00 path \\x00 commit)``
— identical at any parallelism / partitioning, no global sort needed
(SURVEY.md §7.3.2). The top ``bucket_bits`` bits double as the
doc-range bucket used to shard posting lists, so bucketing is free and
uniformly distributed even when a few repos dominate the corpus.

Collision risk at 2^64 is ~n^2/2^65 (checked at build time via
``assert n_distinct == n_rows`` in the docmap validation step); a
128-bit id column is the drop-in upgrade at 10^12-doc scale.

Reference analog: dense ``max(id)+1`` integer ids
(/root/reference/src/helpers/Reader.py:62) — which require a global
scan; hashing removes that coordination point.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def doc_ids_from_keys(*key_cols: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """sha256-derived uint64 ids from one or more string key columns."""
    cols = []
    for c in key_cols:
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        cols.append(c.to_pylist())
    out = np.empty(len(cols[0]), dtype=np.uint64)
    for i, parts in enumerate(zip(*cols)):
        h = hashlib.sha256("\x00".join("" if p is None else str(p) for p in parts).encode())
        out[i] = np.frombuffer(h.digest()[:8], dtype=">u8")[0].astype(np.uint64)
    return out


def doc_ids_from_int(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Use a pre-existing unique int64 key column directly (e.g. the
    driver's ``documents.doc_id``), spread over the uint64 space with a
    splitmix64-style bijective mix so range-bucketing stays uniform."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return splitmix64(v)


def splitmix64(v: np.ndarray) -> np.ndarray:
    """Bijective 64-bit mix (public-domain splitmix64 finalizer)."""
    v = v.astype(np.uint64)
    with np.errstate(over="ignore"):
        v = (v + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        v = v ^ (v >> np.uint64(31))
    return v


def unsplitmix64(v: np.ndarray) -> np.ndarray:
    """Inverse of splitmix64 (recovers the original int key from a doc_id)."""
    v = np.asarray(v, dtype=np.uint64)

    def inv_shift_xor(x: np.ndarray, s: int) -> np.ndarray:
        r = x.copy()
        for _ in range(64 // s + 1):
            r = x ^ (r >> np.uint64(s))
        return r

    with np.errstate(over="ignore"):
        v = inv_shift_xor(v, 31)
        v = v * np.uint64(0x319642B2D24D8EC3)  # modinv of 0x94D049BB133111EB
        v = inv_shift_xor(v, 27)
        v = v * np.uint64(0x96DE1B173F119089)  # modinv of 0xBF58476D1CE4E5B9
        v = inv_shift_xor(v, 30)
        v = (v - np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return v


def bucket_of(doc_ids: np.ndarray, bucket_bits: int) -> np.ndarray:
    """Doc-range bucket = top ``bucket_bits`` bits of the doc_id."""
    return (np.asarray(doc_ids, dtype=np.uint64) >> np.uint64(64 - bucket_bits)).astype(
        np.uint32
    )
