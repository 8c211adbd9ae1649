"""Vectorized varint (LEB128) + docID-gap + block-max posting codec.

Pure numpy — no Ray dependency — so it is unit/property-testable in
isolation and usable inside any `map_batches` / `map_groups` kernel.

Posting-list layout (per term, possibly split across several segment
rows covering disjoint docID ranges):

* postings are sorted by ``doc_id`` (uint64) ascending,
* grouped into self-contained blocks of up to ``BLOCK_SIZE`` postings,
* each block's doc stream is ``varint(first_doc), varint(gap_1), ...``
  (first value absolute so any block decodes without its predecessors —
  this is what makes salted / doc-range-sharded merges a pure byte
  concatenation, and what block-max WAND needs for skipping),
* the tf stream is plain varints, one per posting,
* per-block metadata travels in parallel Arrow list columns:
  ``block_last_doc`` (skip pointers), ``block_doc_off`` /
  ``block_tf_off`` (byte offsets into the two blobs), ``block_count``,
  and ``block_max_wnorm`` — the idf-independent BM25 upper bound
  ``max_block tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` used by
  block-max WAND (idf >= 0 under the +1-inside-log variant, so
  ``idf * block_max_wnorm`` is an exact per-block score bound).

Capability parity note: this plays the role of the reference's
materialized snapshot blocks + per-user inverted lists
(/root/reference/src/helpers/Reader.py:148-191), re-expressed as the
classic PISA-style block-compressed posting list.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128

# BM25 parameters (Lucene-flavoured: idf = ln(1 + (N-df+0.5)/(df+0.5))
# is always >= 0, which keeps block-max upper bounds valid).
K1 = 0.9
B = 0.4



_THRESH_ARR = np.array([np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)],
                       dtype=np.uint64)


def varint_encode(values: np.ndarray, _nbytes: np.ndarray | None = None) -> np.ndarray:
    """LEB128-encode a uint64 array -> uint8 byte array (vectorized).

    ``_nbytes``: precomputed ``varint_lengths(values)`` — callers that
    also need the per-value lengths (for offset cumsums) pass them in
    so the length scan runs once, not twice."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    nbytes = _nbytes if _nbytes is not None else varint_lengths(v)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        idx = starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out


def varint_decode(buf: np.ndarray) -> np.ndarray:
    """Decode a byte array of back-to-back LEB128 varints -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    payload = (b & np.uint8(0x7F)).astype(np.uint64)
    vals = np.zeros(ends.shape, dtype=np.uint64)
    max_b = int(lengths.max())
    for j in range(max_b):
        mask = lengths > j
        vals[mask] |= payload[starts[mask] + j] << np.uint64(7 * j)
    return vals


def varint_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 byte length (vectorized).

    One binary-search pass (~4 compares into a 9-entry threshold
    table) instead of 9 full >=-threshold passes — the length scan was
    the hottest part of the encode stage's varint cost."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return np.searchsorted(_THRESH_ARR, v, side="right").astype(np.int64) + 1


def varint_count(buf: np.ndarray) -> int:
    """Number of varints in a byte buffer (terminator-byte count)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    return int(((b & 0x80) == 0).sum())


@dataclass
class EncodedPostings:
    """One term's encoded postings (one doc-range run)."""

    doc_blob: bytes
    tf_blob: bytes
    block_last_doc: np.ndarray  # uint64, per block
    block_doc_off: np.ndarray  # uint32 byte offset of block start in doc_blob
    block_tf_off: np.ndarray  # uint32 byte offset of block start in tf_blob
    block_count: np.ndarray  # uint32 postings per block
    block_max_wnorm: np.ndarray  # float64 per-block max of tf-saturation weight

    @property
    def df(self) -> int:
        return int(self.block_count.sum())


def bm25_wnorm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """idf-independent BM25 weight: tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))."""
    tf = tf.astype(np.float64)
    denom = tf + K1 * (1.0 - B + B * (dl.astype(np.float64) / float(avgdl)))
    return tf * (K1 + 1.0) / denom


def bm25_idf(df: np.ndarray | int, n_docs: int) -> np.ndarray | float:
    """Lucene-style BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — always >= 0."""
    df_f = np.asarray(df, dtype=np.float64)
    out = np.log1p((n_docs - df_f + 0.5) / (df_f + 0.5))
    return out if out.ndim else float(out)


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
) -> EncodedPostings:
    """Encode one term's doc-sorted postings into self-contained blocks."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    if n == 0:
        z32 = np.empty(0, dtype=np.uint32)
        return EncodedPostings(b"", b"", np.empty(0, dtype=np.uint64), z32, z32, z32,
                               np.empty(0, dtype=np.float64))
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_starts = np.arange(n_blocks, dtype=np.int64) * BLOCK_SIZE
    block_ends = np.minimum(block_starts + BLOCK_SIZE, n)
    counts = (block_ends - block_starts).astype(np.uint32)

    # doc stream values: absolute at block start, gap elsewhere
    vals = np.empty(n, dtype=np.uint64)
    vals[1:] = doc_ids[1:] - doc_ids[:-1]
    vals[block_starts] = doc_ids[block_starts]

    # per-value byte lengths computed ONCE (the binary-search kernel)
    # and shared with the encoder via _nbytes — the old local helper
    # re-ran the 9-pass threshold loop varint_lengths replaced
    doc_len = varint_lengths(vals)
    tf_len = varint_lengths(tfs)
    doc_bytes = varint_encode(vals, _nbytes=doc_len)
    tf_bytes = varint_encode(tfs, _nbytes=tf_len)

    doc_cum = np.concatenate(([0], np.cumsum(doc_len)))
    tf_cum = np.concatenate(([0], np.cumsum(tf_len)))
    # uint32 block offsets: one term's encoded run past 4 GiB would
    # WRAP silently and BMW would read garbage offsets — fail loudly
    # (a single posting list that large should shard by doc range
    # long before this point; the format cost of uint64 offsets for
    # every term is not worth that pathology)
    if doc_cum[-1] >= (1 << 32) or tf_cum[-1] >= (1 << 32):
        raise OverflowError(
            f"encode_postings: single-term blob exceeds uint32 offsets "
            f"(doc={int(doc_cum[-1])} B, tf={int(tf_cum[-1])} B); split "
            "the term's postings across doc-range buckets"
        )

    wnorm = bm25_wnorm(tfs, dls, avgdl)
    max_w = np.maximum.reduceat(wnorm, block_starts)

    return EncodedPostings(
        doc_blob=doc_bytes.tobytes(),
        tf_blob=tf_bytes.tobytes(),
        block_last_doc=doc_ids[block_ends - 1].copy(),
        block_doc_off=doc_cum[block_starts].astype(np.uint32),
        block_tf_off=tf_cum[block_starts].astype(np.uint32),
        block_count=counts,
        block_max_wnorm=max_w,
    )


def decode_doc_stream(doc_blob: bytes, block_counts: np.ndarray) -> np.ndarray:
    """Decode a full doc blob (blocked gap streams) -> absolute doc_ids
    (delegates to :func:`gaps_to_docs` — one copy of the blocked-gap
    reconstruction, not two to keep in sync)."""
    return gaps_to_docs(
        varint_decode(np.frombuffer(doc_blob, dtype=np.uint8)), block_counts
    )


def decode_postings(
    doc_blob: bytes, tf_blob: bytes, block_counts: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids uint64 asc, tfs uint64)."""
    docs = decode_doc_stream(doc_blob, block_counts)
    tfs = varint_decode(np.frombuffer(tf_blob, dtype=np.uint8))
    return docs, tfs


def decode_block(
    doc_blob: bytes,
    tf_blob: bytes,
    doc_off: np.ndarray,
    tf_off: np.ndarray,
    counts: np.ndarray,
    i: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode one self-contained block i -> (doc_ids, tfs). Used by BMW."""
    d_end = int(doc_off[i + 1]) if i + 1 < len(doc_off) else len(doc_blob)
    t_end = int(tf_off[i + 1]) if i + 1 < len(tf_off) else len(tf_blob)
    dvals = varint_decode(np.frombuffer(doc_blob[int(doc_off[i]):d_end], dtype=np.uint8))
    tvals = varint_decode(np.frombuffer(tf_blob[int(tf_off[i]):t_end], dtype=np.uint8))
    return np.cumsum(dvals, dtype=np.uint64), tvals


# --------------------------------------------------------------------------
# "packed" codec: block-wise bit-packing (the SIMD-BP128 family's layout,
# vectorized with numpy packbits/unpackbits instead of SIMD intrinsics)
# --------------------------------------------------------------------------
#
# Per block of <= BLOCK_SIZE postings:
#   doc stream: [1B width w][varint(first_doc)][pack_w(gap_1..gap_{m-1})]
#   tf  stream: [1B width w][pack_w(tf_1..tf_m)]
# where pack_w stores each value in exactly w bits (w = bit length of
# the block's max value), little-endian value-major, padded per block
# to an 8-VALUE boundary so whole width-groups pack/unpack through one
# numpy packbits/unpackbits call — no per-block Python in the group
# path. Blocks stay self-contained and byte-addressable through the
# existing block_doc_off/block_tf_off columns, so block-max WAND
# skipping, run concatenation and the sharded readers work unchanged.
#
# Wins over varint: tf values are tiny (1-4 bits vs a 1-byte varint);
# position-space doc gaps are ~N/df (log2(N/df) bits vs 1+ bytes).
# Raw 64-bit docid-space gaps stay wide (~60 bits) — the codec is a
# IndexConfig knob, defaulting to varint.

_POW2_BITS = (np.uint64(1) << np.arange(1, 64, dtype=np.uint64)).astype(np.uint64)


def bit_lengths(v: np.ndarray) -> np.ndarray:
    """Exact per-value bit length (uint64-safe; bit_length(0) -> 1 so
    every packed width is >= 1)."""
    v = np.ascontiguousarray(v, dtype=np.uint64)
    return (np.searchsorted(_POW2_BITS, v, side="right") + 1).astype(np.int64)


def _segment_gather_index(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat index array visiting lens[i] consecutive positions from
    starts[i], in segment order (the repeat/cumsum variable-length
    gather used throughout the engine)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(lens)[:-1])), lens
    )
    return np.repeat(starts.astype(np.int64), lens) + within


def pack_stream(
    vals: np.ndarray,
    bpos: np.ndarray,
    bend: np.ndarray,
    with_first: bool,
) -> tuple[np.ndarray, np.ndarray]:
    """Pack a blocked value stream -> (blob uint8 array, per-block byte
    lengths). ``vals`` is the group's flat per-block value stream
    (block b owns vals[bpos[b]:bend[b]]); ``with_first=True`` stores
    each block's first value as a varint absolute and bit-packs the
    rest (doc streams), ``False`` bit-packs everything (tf streams)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    bpos = np.asarray(bpos, dtype=np.int64)
    bend = np.asarray(bend, dtype=np.int64)
    nb = bpos.size
    if nb == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    m = bend - bpos
    if with_first:
        firsts = vals[bpos]
        pstart, plen = bpos + 1, m - 1
        fbytes_len = varint_lengths(firsts)
        fbytes = varint_encode(firsts, _nbytes=fbytes_len)
    else:
        firsts = None
        pstart, plen = bpos, m
        fbytes_len = np.zeros(nb, dtype=np.int64)
        fbytes = np.empty(0, dtype=np.uint8)

    # per-block width = bit length of the block's max packed value
    packed_idx = _segment_gather_index(pstart, plen)
    pvals = vals[packed_idx]
    w = np.ones(nb, dtype=np.int64)
    nz = plen > 0
    if pvals.size:
        bl = bit_lengths(pvals)
        offs = np.concatenate(([0], np.cumsum(plen)))
        red = np.maximum.reduceat(bl, offs[:-1][nz])
        w[nz] = red
    pc = ((plen + 7) // 8) * 8  # value counts padded to 8
    packed_nbytes = w * pc // 8
    blk_nbytes = 1 + fbytes_len + packed_nbytes

    out = np.zeros(int(blk_nbytes.sum()), dtype=np.uint8)
    blk_off = np.concatenate(([0], np.cumsum(blk_nbytes)[:-1]))
    out[blk_off] = w.astype(np.uint8)
    if with_first and fbytes.size:
        out[_segment_gather_index(blk_off + 1, fbytes_len)] = fbytes

    # width groups: pad each block's values to pc, pack the whole
    # group's padded stream in ONE packbits call, scatter into out
    pv_off = np.concatenate(([0], np.cumsum(plen)[:-1]))
    for wv in np.unique(w[nz]):
        sel = np.flatnonzero(nz & (w == wv))
        padded_total = int(pc[sel].sum())
        padded = np.zeros(padded_total, dtype=np.uint64)
        # positions of real values inside the group's padded stream
        pad_off = np.concatenate(([0], np.cumsum(pc[sel])[:-1]))
        dst = _segment_gather_index(pad_off, plen[sel])
        padded[dst] = pvals[_segment_gather_index(pv_off[sel], plen[sel])]
        bits = (
            (padded[:, None] >> np.arange(wv, dtype=np.uint64))
            & np.uint64(1)
        ).astype(np.uint8)
        gbytes = np.packbits(bits.ravel(), bitorder="little")
        out[
            _segment_gather_index(
                blk_off[sel] + 1 + fbytes_len[sel], packed_nbytes[sel]
            )
        ] = gbytes
    return out, blk_nbytes


def unpack_stream(
    blob: np.ndarray | bytes,
    block_offs: np.ndarray,
    counts: np.ndarray,
    with_first: bool,
) -> np.ndarray:
    """Inverse of ``pack_stream``: -> the flat per-block value stream
    (with_first=True: absolute first + gaps, i.e. the same shape the
    varint doc stream decodes to)."""
    b = np.frombuffer(blob, dtype=np.uint8) if not isinstance(blob, np.ndarray) else blob
    block_offs = np.asarray(block_offs, dtype=np.int64)
    m = np.asarray(counts, dtype=np.int64)
    nb = block_offs.size
    total = int(m.sum())
    out = np.zeros(total, dtype=np.uint64)
    if nb == 0 or total == 0:
        return out
    w = b[block_offs].astype(np.int64)
    if with_first:
        # vectorized varint parse at block_offs+1 (<=10 bytes each)
        mat_idx = np.minimum(
            block_offs[:, None] + 1 + np.arange(10, dtype=np.int64), b.size - 1
        )
        mat = b[mat_idx]
        term = (mat & 0x80) == 0
        vl = term.argmax(axis=1).astype(np.int64) + 1
        payload = (mat & np.uint8(0x7F)).astype(np.uint64)
        keep = np.arange(10) < vl[:, None]
        firsts = (
            (payload * keep) << (np.uint64(7) * np.arange(10, dtype=np.uint64))
        ).sum(axis=1, dtype=np.uint64)
        plen = m - 1
        pk_off = block_offs + 1 + vl
    else:
        firsts = None
        plen = m
        pk_off = block_offs + 1
    pc = ((plen + 7) // 8) * 8
    packed_nbytes = w * pc // 8
    stream_off = np.concatenate(([0], np.cumsum(m)[:-1]))
    if with_first:
        out[stream_off] = firsts
        val_off = stream_off + 1
    else:
        val_off = stream_off
    nz = plen > 0
    for wv in np.unique(w[nz]):
        sel = np.flatnonzero(nz & (w == wv))
        gbytes = b[_segment_gather_index(pk_off[sel], packed_nbytes[sel])]
        bits = np.unpackbits(gbytes, bitorder="little").astype(np.uint64)
        padded = (
            bits.reshape(-1, int(wv))
            << np.arange(wv, dtype=np.uint64)
        ).sum(axis=1, dtype=np.uint64)
        pad_off = np.concatenate(([0], np.cumsum(pc[sel])[:-1]))
        src = _segment_gather_index(pad_off, plen[sel])
        out[_segment_gather_index(val_off[sel], plen[sel])] = padded[src]
    return out


def gaps_to_docs(vals: np.ndarray, block_counts: np.ndarray) -> np.ndarray:
    """Blocked gap stream (absolute at block starts) -> absolute docs."""
    counts = np.asarray(block_counts, dtype=np.int64)
    if vals.size == 0:
        return vals
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    c = np.cumsum(vals)
    base = c[starts] - vals[starts]
    return c - np.repeat(base, counts)


def decode_run(
    doc_blob,
    tf_blob,
    block_counts: np.ndarray,
    doc_off: np.ndarray | None = None,
    tf_off: np.ndarray | None = None,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Codec-aware full decode of one run -> (docs asc, tfs). The
    packed codec needs the per-block byte offsets (the segment columns
    the reader already holds); varint ignores them."""
    if codec == "packed":
        vals = unpack_stream(doc_blob, doc_off, block_counts, with_first=True)
        tfs = unpack_stream(tf_blob, tf_off, block_counts, with_first=False)
        return gaps_to_docs(vals, block_counts), tfs
    return decode_postings(doc_blob, tf_blob, block_counts)


def first_doc_of(doc_blob, codec: str = "varint") -> int:
    """First (absolute) doc of a run's first block — one varint, at
    offset 0 (varint codec) or after the width byte (packed)."""
    off = 1 if codec == "packed" else 0
    buf = np.frombuffer(doc_blob, dtype=np.uint8)[off : off + 10] if not isinstance(
        doc_blob, np.ndarray
    ) else doc_blob[off : off + 10]
    return int(varint_decode(buf)[0])


def decode_block_ex(
    doc_blob,
    tf_blob,
    doc_off: np.ndarray,
    tf_off: np.ndarray,
    counts: np.ndarray,
    i: int,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Codec-aware single-block decode (BMW's skip path)."""
    if codec == "packed":
        o = np.asarray([doc_off[i]], dtype=np.int64)
        t = np.asarray([tf_off[i]], dtype=np.int64)
        c = np.asarray([counts[i]], dtype=np.int64)
        vals = unpack_stream(doc_blob, o, c, with_first=True)
        tfs = unpack_stream(tf_blob, t, c, with_first=False)
        return np.cumsum(vals, dtype=np.uint64), tfs
    return decode_block(doc_blob, tf_blob, doc_off, tf_off, counts, i)
