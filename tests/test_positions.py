"""Positional postings (IndexConfig(positions=True), format v6) and
the index-native phrase / proximity kernels built on them.

The reference composition (conjunctive prune + corpus verify,
pipelines/phrase.py top half) is itself pytest- and oracle-checked, so
parity against it IS the correctness bar for the positional path — on
the same corpus and queries the two must return identical rows."""

import random
import shutil

import numpy as np
import pyarrow as pa
import pytest


def _rows(seed: int, lo: int, hi: int, vocab):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))))
        for i in range(lo, hi)
    ]


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )


VOCAB = ["merge", "sort", "parse", "json", "tree", "node", "hash", "map"]
QUERIES = [
    (1, "merge sort"),
    (2, "parse json"),
    (3, "hash hash"),
    (4, "tree node map"),
    (5, "sort"),
]


@pytest.mark.parametrize("analyzer", ["simple", "code"])
def test_positions_kernel_matches_naive(analyzer):
    """doc_term_counts(with_positions=True) gap blobs decode to the
    exact within-doc token positions of a naive tokenize_py scan."""
    from pisa_ray.codec import varint_decode
    from pisa_ray.tokenizer import doc_term_counts, tokenize_py

    docs = [
        "the cat sat on the mat the end",
        "",
        "parseJSON HTTPServer foo_bar foo_bar",
        "a b a b a B",
        None,
        "x y z x",
    ]
    arr = pa.array(docs, type=pa.string())
    terms, tfs, dl, poslists = doc_term_counts(arr, analyzer, with_positions=True)
    for i, d in enumerate(docs):
        ref: dict = {}
        for j, t in enumerate(tokenize_py(d or "", analyzer)):
            ref.setdefault(t, []).append(j)
        got_terms = terms[i].as_py()
        assert got_terms == sorted(ref)
        for t, tf, pb in zip(got_terms, tfs[i].as_py(), poslists[i].as_py()):
            gaps = varint_decode(np.frombuffer(pb, dtype=np.uint8))
            assert np.cumsum(gaps).tolist() == ref[t]
            assert tf == len(ref[t])


def test_positions_empty_input():
    from pisa_ray.tokenizer import doc_term_counts

    out = doc_term_counts(pa.array([], type=pa.string()), "simple", with_positions=True)
    assert len(out) == 4 and len(out[3]) == 0


def _build(tmp_path, rows, *, space="docid", pbm=True, positions=True, name="idx"):
    from pisa_ray.build import IndexConfig, build_index

    idx = str(tmp_path / name)
    shutil.rmtree(idx, ignore_errors=True)
    cfg = IndexConfig(
        id_col="doc_id",
        content_col="text",
        meta_cols=(),
        bucket_bits=2,
        term_parts=8,
        lineage_parts=2,
        positions=positions,
        per_bucket_merge=pbm,
        posting_space=space,
    )
    build_index(_tbl(rows), idx, cfg, resume=False)
    return idx


def test_decode_term_positions_roundtrip(tmp_path):
    """Index-resident positions == naive per-doc token scan, through
    the full build (shuffle, encode, segment write, reader stitch)."""
    from pisa_ray.scorer import IndexReader
    from pisa_ray.tokenizer import tokenize_py

    rows = _rows(7, 1, 201, VOCAB)
    idx = _build(tmp_path, rows)
    r = IndexReader(idx)
    assert r.has_positions
    ref: dict = {}
    for did, text in rows:
        for j, t in enumerate(tokenize_py(text)):
            ref.setdefault(t, {}).setdefault(did, []).append(j)
    for t in VOCAB:
        pos, tfs, poff, tokpos = r.decode_term_positions(t)
        out_ids = r.out_ids(r.doc_sorted[pos])
        got = {
            int(d): tokpos[poff[i] : poff[i + 1]].tolist()
            for i, d in enumerate(out_ids)
        }
        assert got == ref.get(t, {})
        assert np.all(tfs.astype(np.int64) == np.diff(poff))


@pytest.mark.parametrize("space", ["docid", "position"])
def test_phrase_and_proximity_index_parity(tmp_path, space):
    """phrase_search_index / proximity_search_index == the
    corpus-verify compositions, row for row."""
    import ray.data as rd

    from pisa_ray.pipelines.phrase import (
        phrase_search,
        phrase_search_index,
        proximity_search,
        proximity_search_index,
    )

    rows = _rows(11, 1, 301, VOCAB)
    idx = _build(tmp_path, rows, space=space, pbm=False)
    corpus = rd.from_arrow(_tbl(rows))
    a = phrase_search(QUERIES, idx, corpus, text_col="text", id_col="doc_id")
    b = phrase_search_index(QUERIES, idx)
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0
    pa_ = proximity_search(QUERIES, idx, corpus, window=4, text_col="text", id_col="doc_id")
    pb_ = proximity_search_index(QUERIES, idx, window=4)
    assert pa_.values.tolist() == pb_.values.tolist()


@pytest.mark.parametrize("space", ["docid", "position"])
def test_positions_survive_generations_and_compaction(tmp_path, space):
    """Positional phrase results stay identical through an incremental
    generation append (interleaved runs, generation-local ranks) and
    through compact_index's decode->re-encode cycle."""
    import ray.data as rd

    from pisa_ray.build import build_incremental, compact_index
    from pisa_ray.pipelines.phrase import phrase_search, phrase_search_index

    rows_a = _rows(13, 1, 201, VOCAB)
    rows_b = _rows(17, 201, 281, VOCAB)
    idx = _build(tmp_path, rows_a, space=space, name=f"idx_{space}")
    build_incremental(_tbl(rows_b), idx, "g1")
    corpus = rd.from_arrow(_tbl(rows_a + rows_b))
    ref = phrase_search(QUERIES, idx, corpus, text_col="text", id_col="doc_id")
    got = phrase_search_index(QUERIES, idx)
    assert ref.values.tolist() == got.values.tolist()
    compact_index(idx)
    got2 = phrase_search_index(QUERIES, idx)
    assert ref.values.tolist() == got2.values.tolist()


def test_phrase_index_respects_tombstones(tmp_path):
    from pisa_ray.delete import delete_docs
    from pisa_ray.pipelines.phrase import phrase_search_index

    rows = _rows(19, 1, 201, VOCAB)
    idx = _build(tmp_path, rows)
    before = phrase_search_index(QUERIES, idx)
    victims = sorted(set(before["doc_id"]))[:5]
    assert victims
    delete_docs(idx, np.array(victims, dtype=np.int64))
    after = phrase_search_index(QUERIES, idx)
    assert not set(victims) & set(after["doc_id"])
    kept = before[~before["doc_id"].isin(victims)]
    assert kept.values.tolist() == after.values.tolist()


def test_positionless_index_raises_clearly(tmp_path):
    from pisa_ray.scorer import IndexReader

    rows = _rows(23, 1, 51, VOCAB)
    idx = _build(tmp_path, rows, positions=False)
    r = IndexReader(idx)
    assert not r.has_positions
    with pytest.raises(ValueError, match="positions"):
        r.decode_term_positions("merge")


def test_positions_resume_guard(tmp_path):
    """Resuming a positions=False build with positions=True must raise
    (the tokenized store lacks the pos column)."""
    from pisa_ray.build import IndexConfig, build_index

    rows = _rows(29, 1, 51, VOCAB)
    idx = str(tmp_path / "guard")
    base = dict(
        id_col="doc_id",
        content_col="text",
        meta_cols=(),
        bucket_bits=2,
        term_parts=8,
        lineage_parts=1,
    )
    build_index(_tbl(rows), idx, IndexConfig(positions=False, **base), resume=False)
    with pytest.raises(ValueError, match="positions"):
        build_index(_tbl(rows), idx, IndexConfig(positions=True, **base), resume=True)


def test_phrase_repeated_and_oov_tokens(tmp_path):
    """Repeated phrase tokens use one posting list at two shifts; an
    OOV token empties the result; single-token phrases return every
    doc containing the token."""
    from pisa_ray.pipelines.phrase import score_phrase
    from pisa_ray.scorer import IndexReader

    rows = [
        (1, "go go gadget"),
        (2, "go gadget go"),
        (3, "stop go stop go"),
        (4, "gadget"),
    ]
    idx = _build(tmp_path, rows)
    r = IndexReader(idx)

    def hits(text):
        m = score_phrase(r, text)
        return sorted(int(x) for x in r.out_ids(r.doc_sorted[m]))

    assert hits("go go") == [1]
    assert hits("go gadget") == [1, 2]
    assert hits("stop go stop") == [3]
    assert hits("gadget") == [1, 2, 4]
    assert hits("go zzz_unseen") == []
    assert hits("") == []


def test_vectorized_min_cover_matches_two_pointer(tmp_path):
    """score_proximity's vectorized all-docs min-cover == the
    two-pointer _min_cover_span per doc, across windows/term counts."""
    from pisa_ray.pipelines.phrase import (
        _gather_occurrences,
        _candidate_positions,
        _min_cover_span,
        score_proximity,
    )
    from pisa_ray.scorer import IndexReader

    rows = _rows(31, 1, 251, VOCAB)
    idx = _build(tmp_path, rows, name="mincover")
    r = IndexReader(idx)
    for text in ("merge sort", "parse json tree", "hash map node tree", "sort"):
        terms = sorted(set(r.tokenize(text)))
        cand, per = _candidate_positions(r, terms, None)
        ref = {}
        if cand.size:
            occ = {int(c): ([], []) for c in cand}
            for i, t in enumerate(terms):
                slots, p = _gather_occurrences(per[t], cand)
                for s, pp in zip(slots, p):
                    occ[int(cand[s])][0].append(int(pp))
                    occ[int(cand[s])][1].append(i)
            for c, (ps, ls) in occ.items():
                o = np.argsort(ps, kind="stable")
                ref[c] = _min_cover_span(
                    np.asarray(ps)[o], np.asarray(ls)[o], len(terms)
                )
        for window in (1, 2, 4, 9, 30):
            docs, spans = score_proximity(r, text, window)
            want = sorted(
                (c, s) for c, s in ref.items() if s <= window
            )
            assert sorted(zip(docs.tolist(), spans.tolist())) == want, (text, window)


@pytest.mark.parametrize("space", ["docid", "position"])
def test_sharded_phrase_and_proximity_exact(tmp_path, space):
    """Shard union == broadcast-reader results exactly, at 2 and 4
    shards, both posting spaces (phrase/proximity are per-doc-local)."""
    from pisa_ray.pipelines.phrase import (
        phrase_search_index,
        phrase_search_sharded,
        proximity_search_index,
        proximity_search_sharded,
    )

    rows = _rows(37, 1, 301, VOCAB)
    idx = _build(tmp_path, rows, space=space, name=f"sh_{space}")
    ref_p = phrase_search_index(QUERIES, idx)
    ref_x = proximity_search_index(QUERIES, idx, window=4)
    assert len(ref_p) > 0
    for n_shards in (2, 4):
        got_p = phrase_search_sharded(QUERIES, idx, n_shards=n_shards)
        assert ref_p.values.tolist() == got_p.values.tolist(), (space, n_shards)
        got_x = proximity_search_sharded(QUERIES, idx, window=4, n_shards=n_shards)
        assert ref_x.values.tolist() == got_x.values.tolist(), (space, n_shards)


def test_keys_mode_phrase_emits_uint64(tmp_path):
    """Keys-derived doc ids are raw uint64 hashes (~half >= 2^63); the
    positional phrase emitters must not wrap them through int64
    (review finding) — dtype and values must match the HITS/query_index
    convention."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.phrase import phrase_search_index
    from pisa_ray.scorer import IndexReader
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(150, n_partitions=2)
    idx = str(tmp_path / "keys_pos")
    build_index(
        corpus,
        idx,
        IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1, positions=True),
    )
    r = IndexReader(idx)
    # two co-occurring common terms guarantee at least one adjacency hit
    terms = sorted(r.df, key=lambda t: -int(r.df[t]))[:2]
    out = phrase_search_index([(0, terms[0])], idx)
    assert len(out) > 0
    assert out["doc_id"].dtype == np.uint64
    assert int(out["doc_id"].max()) > 0


def test_incremental_rejects_pre_v6_segments(tmp_path):
    """Appending to an index whose segments lack pos_blob (pre-v6
    format) must raise a clear rebuild error BEFORE touching the base
    (review finding: mixed segment schemas brick the reader)."""
    import glob

    import pyarrow.parquet as pq

    from pisa_ray.build import build_incremental

    rows = _rows(41, 1, 61, VOCAB)
    idx = _build(tmp_path, rows, positions=False, name="prev6")
    # simulate a pre-v6 index: strip the pos_blob column in place
    for f in glob.glob(f"{idx}/segments/**/*.parquet", recursive=True):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["pos_blob"]), f)
    with pytest.raises(ValueError, match="pos_blob"):
        build_incremental(_tbl(_rows(43, 61, 81, VOCAB)), idx, "g1")
