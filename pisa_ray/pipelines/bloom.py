"""Distributed Bloom filter build + join pre-filter.

At 100 TB the expensive part of a large x large join is the exchange:
every selected byte of BOTH sides crosses the network. When the left
side is much larger than the set of keys it can possibly match, a
Bloom filter of the right side's keys — built distributed, OR-merged
in a task tree, broadcast once via the object store — drops the
non-matching left rows MAP-SIDE, before they are ever hashed,
serialized or shuffled. False positives only cost a wasted shuffle
row (the join itself discards them), so inner/semi join results are
bit-identical; the filter only changes how many bytes move.

The reference never needs this (every table fits one process,
/root/reference/src/Dataset.py joins via in-memory dict lookups); the
operator exists for the scale the reference's design stops at.

Sizing: ``n_bits = -n ln p / (ln 2)^2``, ``n_hash = (n_bits/n) ln 2``
(standard Bloom calculus) with ``n_bits`` rounded up to a power of
two so probes are a mask, not a modulo. 100M keys at 1% fp is
~120 MB — broadcast once per node by Ray's object store, shared
zero-copy by every map task on the node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..shuffle import _key_u64, _mix64

_BLOOM_TASKS = None


def _probe_positions(keys_u64: np.ndarray, n_bits: int, n_hash: int):
    """Yield one uint64 bit-position array per hash function (double
    hashing: pos_i = h1 + i*h2 mod n_bits; n_bits is a power of 2)."""
    mask = np.uint64(n_bits - 1)
    h1 = _mix64(keys_u64)
    h2 = _mix64(h1 ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    for i in range(n_hash):
        with np.errstate(over="ignore"):
            yield (h1 + np.uint64(i) * h2) & mask


def _set_bits(bits: np.ndarray, keys_u64: np.ndarray, n_bits: int, n_hash: int):
    for pos in _probe_positions(keys_u64, n_bits, n_hash):
        w = (pos >> np.uint64(6)).astype(np.int64)
        b = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(bits, w, b)


def _test_bits(bits: np.ndarray, keys_u64: np.ndarray, n_bits: int, n_hash: int) -> np.ndarray:
    hit = np.ones(keys_u64.size, dtype=bool)
    for pos in _probe_positions(keys_u64, n_bits, n_hash):
        w = (pos >> np.uint64(6)).astype(np.int64)
        b = np.uint64(1) << (pos & np.uint64(63))
        hit &= (bits[w] & b) != 0
    return hit


def _bloom_tasks():
    global _BLOOM_TASKS
    if _BLOOM_TASKS is not None:
        return _BLOOM_TASKS

    @ray.remote
    def partial(col: str, n_bits: int, n_hash: int, *blocks):
        bits = np.zeros(n_bits // 64, dtype=np.uint64)
        for blk in blocks:
            if not isinstance(blk, pa.Table):
                blk = pa.Table.from_pandas(blk, preserve_index=False)
            if blk.num_rows:
                _set_bits(bits, _key_u64(blk, col), n_bits, n_hash)
        return bits

    @ray.remote
    def ormerge(*parts):
        out = parts[0].copy()
        for p in parts[1:]:
            np.bitwise_or(out, p, out=out)
        return out

    _BLOOM_TASKS = (partial, ormerge)
    return _BLOOM_TASKS


class BloomFilter:
    """Immutable packed bitset + its parameters. ``bits_ref`` is the
    Ray ObjectRef of the uint64 word array — pass the whole object
    into closures; workers ``ray.get`` it zero-copy from the local
    object store (one copy per NODE, not per task)."""

    def __init__(self, bits_ref, n_bits: int, n_hash: int):
        self.bits_ref = bits_ref
        self.n_bits = n_bits
        self.n_hash = n_hash

    def contains(self, tbl: pa.Table, col: str) -> np.ndarray:
        """Boolean might-contain mask for a table column. No false
        negatives; false-positive rate per the build sizing."""
        if tbl.num_rows == 0:
            return np.zeros(0, dtype=bool)
        bits = ray.get(self.bits_ref) if isinstance(
            self.bits_ref, ray.ObjectRef) else self.bits_ref
        return _test_bits(bits, _key_u64(tbl, col), self.n_bits, self.n_hash)


def build_bloom(
    ds: rd.Dataset,
    col: str,
    expected_distinct: int,
    fp_rate: float = 0.01,
    fanout: int = 8,
) -> BloomFilter:
    """Build a Bloom filter of ``ds[col]``'s values, distributed.

    Per-block partials are OR-merged through a ``fanout``-ary task
    tree, so no single process ever holds more than ``fanout`` + 1
    bitsets and the driver never touches the words at all — only the
    final ObjectRef. Deterministic for any block layout (OR is
    commutative).
    """
    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0,1), got {fp_rate}")
    if expected_distinct < 1:
        raise ValueError("expected_distinct must be >= 1")
    ln2 = float(np.log(2.0))
    raw_bits = -expected_distinct * np.log(fp_rate) / (ln2 * ln2)
    n_bits = 1 << max(6, int(np.ceil(np.log2(raw_bits))))
    n_hash = max(1, int(round(n_bits / expected_distinct * ln2)))

    partial, ormerge = _bloom_tasks()
    refs = []
    for b in ds.materialize().iter_internal_ref_bundles():
        for r, m in b.blocks:
            if m.num_rows is None or m.num_rows > 0:
                refs.append(r)
    if not refs:
        bits_ref = ray.put(np.zeros(n_bits // 64, dtype=np.uint64))
        return BloomFilter(bits_ref, n_bits, n_hash)
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_part = min(len(refs), max(4, 2 * ncpu))
    parts = [
        partial.remote(col, n_bits, n_hash, *refs[i::n_part])
        for i in range(n_part)
    ]
    while len(parts) > 1:
        parts = [
            ormerge.remote(*parts[i : i + fanout])
            for i in range(0, len(parts), fanout)
        ]
    return BloomFilter(parts[0], n_bits, n_hash)


def bloom_prefilter(ds: rd.Dataset, col: str, bloom: BloomFilter) -> rd.Dataset:
    """Keep only rows whose ``col`` might be in ``bloom`` (never drops
    a true match). Map-side, zero-copy Arrow; the bitset ships to each
    node once via the object store."""

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(bloom.contains(b, col)))

    return ds.map_batches(fn, batch_format="pyarrow")
