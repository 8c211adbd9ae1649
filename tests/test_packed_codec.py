"""Block-wise bit-packed posting codec (IndexConfig(codec="packed")).

The varint codec is the oracle-checked default; the bar for packed is
BIT-IDENTICAL query results (ranks AND float64 scores) on the same
corpus, plus strictly smaller position-space postings."""

import random
import shutil

import numpy as np
import pyarrow as pa
import pytest

from pisa_ray.codec import BLOCK_SIZE, pack_stream, unpack_stream


def test_pack_unpack_roundtrip_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(25):
        n = int(rng.integers(1, 1200))
        docs = np.sort(
            rng.choice(
                np.arange(1, 50_000_000, dtype=np.uint64), size=n, replace=False
            )
        )
        nb = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        bpos = np.arange(nb) * BLOCK_SIZE
        bend = np.minimum(bpos + BLOCK_SIZE, n)
        vals = np.empty(n, dtype=np.uint64)
        vals[1:] = docs[1:] - docs[:-1]
        vals[bpos] = docs[bpos]
        blob, lens = pack_stream(vals, bpos, bend, with_first=True)
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        assert np.array_equal(
            unpack_stream(blob, offs, bend - bpos, with_first=True), vals
        ), trial
        tfs = rng.integers(1, 700, size=n).astype(np.uint64)
        blob2, lens2 = pack_stream(tfs, bpos, bend, with_first=False)
        offs2 = np.concatenate(([0], np.cumsum(lens2)[:-1]))
        assert np.array_equal(
            unpack_stream(blob2, offs2, bend - bpos, with_first=False), tfs
        ), trial


def test_pack_unpack_edges():
    # single-posting block with a huge (MSB-set) absolute doc
    docs = np.array([(1 << 63) + 5], dtype=np.uint64)
    blob, lens = pack_stream(docs, np.array([0]), np.array([1]), with_first=True)
    assert np.array_equal(
        unpack_stream(blob, np.array([0]), np.array([1]), True), docs
    )
    # all-ones tf block (width 1): 128 values in 16 packed bytes
    tfs = np.ones(BLOCK_SIZE, dtype=np.uint64)
    blob, lens = pack_stream(
        tfs, np.array([0]), np.array([BLOCK_SIZE]), with_first=False
    )
    assert int(lens[0]) == 1 + BLOCK_SIZE // 8
    assert np.array_equal(
        unpack_stream(blob, np.array([0]), np.array([BLOCK_SIZE]), False), tfs
    )
    # empty
    b, l = pack_stream(
        np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.int64), True
    )
    assert b.size == 0 and l.size == 0


def _corpus(n=1500):
    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(60)] + ["the", "of", "and"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 200))))
        for i in range(1, n + 1)
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )


def _build(tmp_path, tbl, codec, space, name, **kw):
    from pisa_ray.build import IndexConfig, build_index

    idx = str(tmp_path / name)
    shutil.rmtree(idx, ignore_errors=True)
    man = build_index(
        tbl,
        idx,
        IndexConfig(
            id_col="doc_id", content_col="text", meta_cols=(),
            bucket_bits=2, term_parts=8, lineage_parts=1,
            per_bucket_merge=False, posting_space=space, codec=codec, **kw,
        ),
        resume=False,
    )
    return idx, man


QUERIES = ["the of", "w3 w17 w44", "w9", "the w0 w1 w2", "zz_absent"]


@pytest.mark.parametrize("space", ["docid", "position"])
def test_packed_bit_identical_to_varint(tmp_path, space):
    from pisa_ray.scorer import (
        IndexReader, score_bmw, score_maxscore, score_taat,
    )

    tbl = _corpus()
    iv, mv = _build(tmp_path, tbl, "varint", space, f"v_{space}")
    ip, mp = _build(tmp_path, tbl, "packed", space, f"p_{space}")
    rv, rp = IndexReader(iv), IndexReader(ip)
    assert rp.codec == "packed"
    for q in QUERIES:
        a = score_taat(rv, q, 10)
        assert a == score_taat(rp, q, 10), q
        assert score_bmw(rv, q, 10) == score_bmw(rp, q, 10) == a, q
        assert score_maxscore(rp, q, 10) == a, q
    # position space compresses strictly better under packing; tf
    # streams shrink in both spaces (1-byte varints -> few bits)
    va, pb = mv["index_metrics"], mp["index_metrics"]
    assert pb["tf_blob_bytes"] < va["tf_blob_bytes"]
    if space == "position":
        assert pb["doc_blob_bytes"] < va["doc_blob_bytes"]
        assert pb["bytes_per_posting"] < va["bytes_per_posting"]


def test_packed_generations_and_compaction(tmp_path):
    from pisa_ray.build import build_incremental, compact_index
    from pisa_ray.scorer import IndexReader, score_taat

    tbl = _corpus(800)
    delta = pa.table(
        {
            "doc_id": pa.array(list(range(2001, 2301)), type=pa.int64()),
            "text": pa.array(
                [f"the w{i % 60} of w{(i * 7) % 60}" for i in range(300)]
            ),
        }
    )
    iv, _ = _build(tmp_path, tbl, "varint", "position", "gen_v")
    ip, _ = _build(tmp_path, tbl, "packed", "position", "gen_p")
    build_incremental(delta, iv, "g1")
    build_incremental(delta, ip, "g1")
    for q in QUERIES:
        assert score_taat(IndexReader(iv), q, 10) == score_taat(
            IndexReader(ip), q, 10
        ), ("incr", q)
    compact_index(ip)
    compact_index(iv)
    for q in QUERIES:
        assert score_taat(IndexReader(iv), q, 10) == score_taat(
            IndexReader(ip), q, 10
        ), ("compact", q)


def test_packed_positions_phrase(tmp_path):
    from pisa_ray.pipelines.phrase import phrase_search_index

    tbl = _corpus(600)
    iv, _ = _build(tmp_path, tbl, "varint", "position", "ph_v", positions=True)
    ip, _ = _build(tmp_path, tbl, "packed", "position", "ph_p", positions=True)
    qs = [(0, "the of"), (1, "w3 w17"), (2, "w9")]
    a = phrase_search_index(qs, iv)
    b = phrase_search_index(qs, ip)
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0


def test_codec_rails(tmp_path):
    from pisa_ray.build import IndexConfig, build_index

    tbl = _corpus(50)
    with pytest.raises(ValueError, match="codec"):
        build_index(
            tbl,
            str(tmp_path / "bad"),
            IndexConfig(
                id_col="doc_id", content_col="text", meta_cols=(), codec="simd9",
            ),
            resume=False,
        )
    idx, _ = _build(tmp_path, tbl, "varint", "docid", "rg")
    from pisa_ray.build import IndexConfig as IC

    with pytest.raises(ValueError, match="codec"):
        build_index(
            tbl,
            idx,
            IC(
                id_col="doc_id", content_col="text", meta_cols=(),
                bucket_bits=2, term_parts=8, lineage_parts=1,
                per_bucket_merge=False, codec="packed",
            ),
            resume=True,
        )


@pytest.mark.parametrize("space", ["docid", "position"])
def test_recode_index_rank_identical_no_retokenize(tmp_path, space):
    """recode_index flips the codec by rebuilding segments from the
    existing tokenized/ store: results stay bit-identical, stats and
    manifest record the new codec, and the forward store bytes are
    untouched (no re-tokenize)."""
    import glob
    import os

    from pisa_ray.build import recode_index
    from pisa_ray.scorer import IndexReader, score_bmw, score_taat

    tbl = _corpus(600)
    idx, _ = _build(tmp_path, tbl, "varint", space, f"rc_{space}")
    before = {q: score_taat(IndexReader(idx), q, 10) for q in QUERIES}
    tok_files = sorted(
        glob.glob(os.path.join(idx, "tokenized", "**", "*.parquet"),
                  recursive=True)
    )
    tok_sig = [(f, os.path.getmtime(f), os.path.getsize(f)) for f in tok_files]

    man = recode_index(idx, "packed")
    assert man["config"]["codec"] == "packed"
    r = IndexReader(idx)
    assert r.codec == "packed"
    for q in QUERIES:
        assert score_taat(r, q, 10) == before[q], q
        assert score_bmw(r, q, 10) == before[q], q
    # the forward store was NOT rewritten
    assert [
        (f, os.path.getmtime(f), os.path.getsize(f)) for f in tok_files
    ] == tok_sig
    # round-trip back
    recode_index(idx, "varint")
    r2 = IndexReader(idx)
    assert r2.codec == "varint"
    assert score_taat(r2, QUERIES[0], 10) == before[QUERIES[0]]
    # same-codec call is a no-op
    recode_index(idx, "varint")


def test_recode_index_rails(tmp_path):
    from pisa_ray.build import build_incremental, recode_index

    tbl = _corpus(200)
    idx, _ = _build(tmp_path, tbl, "varint", "docid", "rc_rails")
    with pytest.raises(ValueError, match="unknown codec"):
        recode_index(idx, "zstd")
    with pytest.raises(ValueError, match="not a completed index"):
        recode_index(str(tmp_path / "nowhere"), "packed")
    delta = pa.table(
        {
            "doc_id": pa.array([9001, 9002], type=pa.int64()),
            "text": pa.array(["w1 w2 w3", "w4 w5"]),
        }
    )
    build_incremental(delta, idx, "g1")
    with pytest.raises(ValueError, match="generations"):
        recode_index(idx, "packed")


def test_recode_index_resumes_after_interruption(tmp_path):
    """A recode killed mid-merge must be re-runnable: the manifest was
    already patched to the target codec, so a second call resumes the
    rebuild instead of raising 'not a completed index'."""
    import json
    import os
    import shutil

    from pisa_ray.build import Manifest, recode_index
    from pisa_ray.scorer import IndexReader, score_taat

    tbl = _corpus(400)
    idx, _ = _build(tmp_path, tbl, "varint", "docid", "rc_crash")
    before = {q: score_taat(IndexReader(idx), q, 10) for q in QUERIES}
    # simulate the crash window: stages popped + dirs gone + codec
    # patched, but the rebuilding merge never ran
    man = Manifest(idx)
    for st in ("segments", "lexicon"):
        man.data["stages"].pop(st, None)
    man.data["config"]["codec"] = "packed"
    man.data["stats"]["codec"] = "packed"
    man.save()
    for sub in ("segments", "lexicon"):
        shutil.rmtree(os.path.join(idx, sub), ignore_errors=True)
    sp = os.path.join(idx, "stats.json")
    stj = json.load(open(sp))
    stj["codec"] = "packed"
    json.dump(stj, open(sp, "w"))
    # the rerun completes the recode
    man2 = recode_index(idx, "packed")
    assert man2["config"]["codec"] == "packed"
    r = IndexReader(idx)
    assert r.codec == "packed"
    for q in QUERIES:
        assert score_taat(r, q, 10) == before[q], q
