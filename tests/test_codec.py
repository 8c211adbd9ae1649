"""Property tests for the varint / gap / block-max codec (SURVEY.md §5.1)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pisa_ray.codec import (
    BLOCK_SIZE,
    bm25_wnorm,
    decode_block,
    decode_postings,
    encode_postings,
    varint_count,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    enc = varint_encode(v)
    dec = varint_decode(enc)
    assert np.array_equal(v, dec)
    assert varint_count(enc) == len(vals)


def test_varint_boundaries():
    # every 7-bit boundary, both sides
    vals = []
    for i in range(1, 10):
        vals += [(1 << (7 * i)) - 1, 1 << (7 * i)]
    vals += [0, 1, 2**64 - 1]
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v)), v)


@given(st.data())
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(data):
    n = data.draw(st.integers(min_value=1, max_value=700))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    docs = np.unique(rng.integers(0, 2**63, size=n, dtype=np.uint64))
    tfs = rng.integers(1, 1000, size=docs.size).astype(np.uint64)
    dls = rng.integers(1, 5000, size=docs.size).astype(np.uint64)
    ep = encode_postings(docs, tfs, dls, avgdl=700.0)
    d, t = decode_postings(ep.doc_blob, ep.tf_blob, ep.block_count)
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert ep.df == docs.size
    # block metadata invariants
    n_blocks = (docs.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(ep.block_last_doc) == n_blocks
    assert int(ep.block_count.sum()) == docs.size
    assert np.array_equal(
        ep.block_last_doc,
        docs[np.minimum(np.arange(1, n_blocks + 1) * BLOCK_SIZE, docs.size) - 1],
    )


def test_block_decode_and_blockmax_bound():
    rng = np.random.default_rng(7)
    docs = np.unique(rng.integers(0, 2**64, size=1000, dtype=np.uint64))
    tfs = rng.integers(1, 50, size=docs.size).astype(np.uint64)
    dls = rng.integers(10, 3000, size=docs.size).astype(np.uint64)
    avgdl = 800.0
    ep = encode_postings(docs, tfs, dls, avgdl)
    w = bm25_wnorm(tfs, dls, avgdl)
    n_blocks = len(ep.block_count)
    for i in range(n_blocks):
        d, t = decode_block(
            ep.doc_blob, ep.tf_blob, ep.block_doc_off, ep.block_tf_off, ep.block_count, i
        )
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, docs.size)
        assert np.array_equal(d, docs[lo:hi])
        assert np.array_equal(t, tfs[lo:hi])
        # block-max is an exact upper bound, attained by some posting
        assert ep.block_max_wnorm[i] == w[lo:hi].max()
    assert ep.block_last_doc[-1] == docs[-1]


def test_empty_postings():
    ep = encode_postings(
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.uint64),
        np.empty(0, dtype=np.uint64),
        100.0,
    )
    assert ep.df == 0 and ep.doc_blob == b""
    d, t = decode_postings(ep.doc_blob, ep.tf_blob, ep.block_count)
    assert d.size == 0 and t.size == 0


def test_concat_runs_equals_single_encode():
    """Self-contained blocks: encoding two doc-range halves separately and
    concatenating block streams decodes identically to one encode —
    the invariant the bucketed (salted) merge relies on."""
    rng = np.random.default_rng(3)
    docs = np.unique(rng.integers(0, 2**64, size=400, dtype=np.uint64))
    tfs = rng.integers(1, 9, size=docs.size).astype(np.uint64)
    dls = np.full(docs.size, 100, dtype=np.uint64)
    mid = docs.size // 2
    a = encode_postings(docs[:mid], tfs[:mid], dls[:mid], 100.0)
    b = encode_postings(docs[mid:], tfs[mid:], dls[mid:], 100.0)
    d1, t1 = decode_postings(a.doc_blob, a.tf_blob, a.block_count)
    d2, t2 = decode_postings(b.doc_blob, b.tf_blob, b.block_count)
    assert np.array_equal(np.concatenate([d1, d2]), docs)
    assert np.array_equal(np.concatenate([t1, t2]), tfs)


def test_splitmix_inverse():
    from pisa_ray.docids import splitmix64, unsplitmix64

    rng = np.random.default_rng(11)
    x = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    assert np.array_equal(unsplitmix64(splitmix64(x)), x)


def test_doc_ids_deterministic():
    import pyarrow as pa

    from pisa_ray.docids import doc_ids_from_keys

    a = doc_ids_from_keys(pa.array(["r1", "r2"]), pa.array(["p1", "p2"]))
    b = doc_ids_from_keys(pa.array(["r1", "r2"]), pa.array(["p1", "p2"]))
    assert np.array_equal(a, b)
    # key separator prevents ("ab","c") == ("a","bc") collisions
    c = doc_ids_from_keys(pa.array(["ab"]), pa.array(["c"]))
    d = doc_ids_from_keys(pa.array(["a"]), pa.array(["bc"]))
    assert c[0] != d[0]
