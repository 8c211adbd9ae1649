"""Deletion tombstones (pisa_ray/delete.py).

Contract under test:
- masked phase: results never contain a deleted doc, and are
  BIT-IDENTICAL to querying the pre-delete index with an explicit
  exclusion ``doc_mask`` over the same docs (stats stay stale,
  Lucene-style; reference analog: the -inf exclusion mask at
  /root/reference/src/Inference.py:233-238);
- after ``compact_index()``: bit-identical to a FRESH BUILD over the
  surviving corpus (N/avgdl/df recomputed, tombstones cleared).
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from pisa_ray.build import IndexConfig, build_index, compact_index
from pisa_ray.delete import delete_docs, delete_where, load_tombstones
from pisa_ray.docids import doc_ids_from_keys
from pisa_ray.scorer import IndexReader, score_bmw, score_conj, score_taat
from pisa_ray.synth import make_corpus, make_queries

CFG = dict(bucket_bits=2, term_parts=8, lineage_parts=1)


def _corpus_ids(corpus: pa.Table) -> np.ndarray:
    return doc_ids_from_keys(corpus["repo"], corpus["path"], corpus["commit"])


@pytest.mark.parametrize("space", ["docid", "position"])
def test_masked_phase_equals_explicit_exclusion_mask(tmp_path, space):
    corpus = make_corpus(200, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(posting_space=space, **CFG))

    clean = IndexReader(d)  # constructed BEFORE any tombstone exists
    assert clean.live_mask is None

    ids = _corpus_ids(corpus)
    deleted = np.sort(ids[::5])  # every 5th doc
    assert delete_docs(d, deleted) == deleted.size
    assert delete_docs(d, deleted[:10]) == 0  # idempotent re-delete

    masked = IndexReader(d)
    assert masked.live_mask is not None
    assert int((~masked.live_mask).sum()) == deleted.size

    # the equivalent explicit exclusion mask over the clean reader
    pos = np.searchsorted(clean.doc_sorted, deleted)
    excl = np.ones(clean.n_local, dtype=bool)
    excl[pos] = False
    deleted_set = set(int(x) for x in deleted)

    for text in make_queries(40)["text"].to_pylist():
        want = score_taat(clean, text, 10, doc_mask=excl)
        got = score_taat(masked, text, 10)
        assert got == want  # bit-identical scores, same stale stats
        assert score_bmw(masked, text, 10) == want
        assert not any(doc in deleted_set for doc, _ in got)
        # conjunctive path honors the tombstones too
        assert score_conj(masked, text, 10) == score_conj(
            clean, text, 10, doc_mask=excl
        )


@pytest.mark.parametrize("space", ["docid", "position"])
def test_compaction_purge_matches_fresh_build(tmp_path, space):
    corpus = make_corpus(200, n_partitions=2)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(posting_space=space, **CFG)
    build_index(corpus, d, cfg)

    ids = _corpus_ids(corpus)
    deleted = np.sort(ids[::4])
    delete_docs(d, deleted)
    compact_index(d)
    assert load_tombstones(d).size == 0  # purged

    keep_rows = np.ones(len(corpus), dtype=bool)
    keep_rows[::4] = False
    survivors = corpus.filter(pa.array(keep_rows))
    d2 = str(tmp_path / "fresh")
    build_index(survivors, d2, IndexConfig(posting_space=space, **CFG))

    ra, rb = IndexReader(d), IndexReader(d2)
    assert ra.live_mask is None
    assert ra.n_docs == rb.n_docs == int(keep_rows.sum())
    assert abs(ra.avgdl - rb.avgdl) < 1e-12
    assert ra.df == rb.df
    np.testing.assert_array_equal(ra.doc_sorted, rb.doc_sorted)
    np.testing.assert_array_equal(ra.len_sorted, rb.len_sorted)

    for text in make_queries(40)["text"].to_pylist():
        want = score_taat(rb, text, 10)
        assert score_taat(ra, text, 10) == want
        assert score_bmw(ra, text, 10) == want


def test_delete_where_metadata_predicate(tmp_path):
    corpus = make_corpus(150, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(**CFG))

    langs = corpus["lang"].to_pylist()
    target = langs[0]
    expect = sum(1 for v in langs if v == target)
    assert delete_where(d, "lang", target) == expect
    assert delete_where(d, "lang", target) == 0  # idempotent

    reader = IndexReader(d)
    ids = _corpus_ids(corpus)
    bad = set(int(x) for x, v in zip(ids, langs) if v == target)
    for text in make_queries(20)["text"].to_pylist():
        for doc, _ in score_taat(reader, text, reader.n_docs):
            assert doc not in bad


def test_sharded_reader_applies_local_tombstones(tmp_path):
    corpus = make_corpus(160, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(**CFG))
    ids = _corpus_ids(corpus)
    deleted = np.sort(ids[::3])
    delete_docs(d, deleted)

    n_buckets = 1 << 2
    full = IndexReader(d)
    shard_live = 0
    for b in range(n_buckets):
        sh = IndexReader(d, buckets={b})
        if sh.live_mask is not None:
            shard_live += int((~sh.live_mask).sum())
        else:
            shard_live += 0
        deleted_set = set(int(x) for x in deleted)
        for text in make_queries(8)["text"].to_pylist():
            for doc, _ in score_taat(sh, text, 10):
                assert doc not in deleted_set
    # every tombstoned doc is masked in exactly one shard
    assert shard_live == int((~full.live_mask).sum()) == deleted.size


def test_delete_int_id_mode_maps_through_splitmix(tmp_path):
    corpus = make_corpus(120, n_partitions=1)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(120, dtype=np.int64)),
            "content": corpus["content"],
            "lang": corpus["lang"],
        }
    )
    d = str(tmp_path / "idx")
    build_index(t, d, IndexConfig(id_col="doc_id", **CFG))
    assert delete_docs(d, [3, 7, 11]) == 3

    reader = IndexReader(d)
    assert int((~reader.live_mask).sum()) == 3
    for text in make_queries(20)["text"].to_pylist():
        for doc, _ in score_taat(reader, text, reader.n_docs):
            assert doc not in (3, 7, 11)

    compact_index(d)
    r2 = IndexReader(d)
    assert r2.n_docs == 117 and r2.live_mask is None
    assert not os.path.isdir(os.path.join(d, "tombstones"))


def test_delete_then_incremental_generation_then_compact(tmp_path):
    """Tombstones laid before a generation append still purge at
    compaction, and the result matches a fresh build over (base \\
    deleted) + delta."""
    from pisa_ray.build import build_incremental

    corpus = make_corpus(240, n_partitions=2)
    base, delta = corpus.slice(0, 150), corpus.slice(150)
    d = str(tmp_path / "idx")
    build_index(base, d, IndexConfig(**CFG))
    ids = _corpus_ids(base)
    deleted = np.sort(ids[::6])
    delete_docs(d, deleted)
    build_incremental(delta, d, generation="g1")
    compact_index(d)

    keep_rows = np.ones(150, dtype=bool)
    keep_rows[::6] = False
    survivors = pa.concat_tables([base.filter(pa.array(keep_rows)), delta])
    d2 = str(tmp_path / "fresh")
    build_index(survivors, d2, IndexConfig(**CFG))

    ra, rb = IndexReader(d), IndexReader(d2)
    assert ra.n_docs == rb.n_docs
    assert abs(ra.avgdl - rb.avgdl) < 1e-12
    assert ra.df == rb.df
    for text in make_queries(30)["text"].to_pylist():
        assert score_taat(ra, text, 10) == score_taat(rb, text, 10)


def test_delete_where_numeric_column_coerces_string_value(tmp_path):
    """The CLI surface passes string values; delete_where must cast
    them to the docmap column's type (and fail loudly when it can't)."""
    corpus = make_corpus(80, n_partitions=1)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(**CFG))
    import pyarrow.parquet as _pq
    import glob as _glob

    dm = _pq.read_table(
        sorted(_glob.glob(f"{d}/docmap/**/*.parquet", recursive=True))[0]
    )
    some_len = dm["length"][0].as_py()
    expect = sum(1 for v in dm["length"].to_pylist() if v == some_len)
    # docmap may span several files; count across all
    all_dm = pa.concat_tables(
        _pq.read_table(f, columns=["length"])
        for f in sorted(_glob.glob(f"{d}/docmap/**/*.parquet", recursive=True))
    )
    expect = sum(1 for v in all_dm["length"].to_pylist() if v == some_len)
    assert delete_where(d, "length", str(some_len)) == expect
    with pytest.raises(ValueError, match="cannot compare"):
        delete_where(d, "length", "not-a-number")


def test_clear_tombstones_snapshot_preserves_later_files(tmp_path):
    """compact_index clears only the tombstone files it purged: a
    delete landing mid-compaction (simulated here by writing a second
    file after the snapshot) survives the clear and stays masked."""
    import glob as _glob

    from pisa_ray.build import compact_index
    from pisa_ray.delete import clear_tombstones

    corpus = make_corpus(100, n_partitions=1)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(**CFG))
    ids = _corpus_ids(corpus)
    delete_docs(d, ids[:5])
    snapshot = sorted(_glob.glob(f"{d}/tombstones/*.parquet"))
    delete_docs(d, ids[5:8])  # "mid-compaction" delete
    clear_tombstones(d, files=snapshot)
    remaining = load_tombstones(d)
    np.testing.assert_array_equal(remaining, np.sort(ids[5:8]))
    # and a subsequent compaction purges + clears the rest
    compact_index(d)
    assert load_tombstones(d).size == 0
    assert IndexReader(d).n_docs == 100 - 3  # only the surviving file purged


def test_upsert_docs_matches_fresh_build(tmp_path):
    """upsert_docs (delete -> compact -> append): updated docs serve
    their NEW text, pure inserts skip compaction, and post-upsert
    rankings are identical (docs AND float64 scores) to a fresh build
    over the logically-current corpus — the whole point of the
    log-structured update path."""
    import random

    import pyarrow as pa

    from pisa_ray.build import IndexConfig, build_index, upsert_docs
    from pisa_ray.scorer import IndexReader, score_taat

    rng = random.Random(7)
    vocab = ["merge", "sort", "parse", "json", "tree", "node", "hash"]

    def mk(ids, texts=None):
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(
                    texts
                    if texts is not None
                    else [
                        " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 25)))
                        for _ in ids
                    ]
                ),
            }
        )

    base_ids = list(range(1, 201))
    base = mk(base_ids)
    cfg = dict(
        id_col="doc_id", content_col="text", meta_cols=(),
        bucket_bits=2, term_parts=8, lineage_parts=1,
    )
    idx = str(tmp_path / "up")
    build_index(base, idx, IndexConfig(**cfg), resume=False)

    # update 5 existing docs with DISTINCTIVE new text + insert 3 new
    upd_ids = [3, 50, 77, 120, 200]
    new_ids = [900, 901, 902]
    delta = mk(
        upd_ids + new_ids,
        ["zzzfresh merge sort"] * len(upd_ids) + ["zzzfresh tree node"] * len(new_ids),
    )
    upsert_docs(delta, idx, "u1")

    r = IndexReader(idx)
    # the new term hits exactly the upserted docs
    hits = {d for d, _ in score_taat(r, "zzzfresh", 50)}
    assert hits == set(upd_ids + new_ids)
    # old versions are gone: total corpus size is base + inserts
    assert r.n_docs == len(base_ids) + len(new_ids)

    # equivalence with a fresh build over the logically-current corpus
    cur_rows = {i: t for i, t in zip(base["doc_id"].to_pylist(), base["text"].to_pylist())}
    for i, t in zip(delta["doc_id"].to_pylist(), delta["text"].to_pylist()):
        cur_rows[i] = t
    fresh_tbl = mk(sorted(cur_rows), [cur_rows[i] for i in sorted(cur_rows)])
    fresh = str(tmp_path / "fresh")
    build_index(fresh_tbl, fresh, IndexConfig(**cfg), resume=False)
    rf = IndexReader(fresh)
    for q in ("merge sort", "zzzfresh", "tree node hash", "json"):
        assert score_taat(r, q, 10) == score_taat(rf, q, 10), q

    # pure insert (no overlap) must NOT trigger a compaction: the
    # generation list grows instead of being folded
    import json as _json
    import os

    upsert_docs(mk([950, 951]), idx, "u2")
    with open(os.path.join(idx, "stats.json")) as f:
        gens = _json.load(f).get("generations", [])
    assert "u2" in gens
    r2 = IndexReader(idx)
    assert r2.n_docs == r.n_docs + 2


def test_rebuild_from_scratch_clears_tombstones(tmp_path):
    """build_index(resume=False) must wipe tombstones/ — doc ids are
    deterministic functions of the keys, so surviving tombstones would
    silently mask the rebuilt docs (review finding)."""
    corpus = make_corpus(120, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(**CFG))
    ids = _corpus_ids(corpus)
    victims = np.sort(ids[:7])
    delete_docs(d, victims)
    assert load_tombstones(d).size == victims.size
    build_index(corpus, d, IndexConfig(**CFG), resume=False)
    assert load_tombstones(d).size == 0
    r = IndexReader(d)
    assert r.live_mask is None
    # a previously-deleted doc is retrievable again
    assert np.isin(victims, r.doc_sorted).all()


def test_recode_refuses_stale_forward_store(tmp_path):
    """delete -> compact purges docmap/stats but NOT tokenized/;
    recode_index must refuse rather than resurrect purged postings
    (review finding)."""
    from pisa_ray.build import recode_index

    corpus = make_corpus(150, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(**CFG))
    ids = _corpus_ids(corpus)
    delete_docs(d, np.sort(ids[:9]))
    compact_index(d)
    with pytest.raises(ValueError, match="stale relative to a deletion purge"):
        recode_index(d, "packed")
