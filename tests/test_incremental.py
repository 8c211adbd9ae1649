"""Incremental (generation-append) index build: base + delta must be
rank-identical to a from-scratch oracle over the full corpus."""

import numpy as np
import pyarrow as pa

from pisa_ray.build import IndexConfig, build_incremental, build_index
from pisa_ray.docids import doc_ids_from_keys
from pisa_ray.oracle import OracleIndex
from pisa_ray.scorer import IndexReader, score_bmw, score_taat
from pisa_ray.synth import make_corpus, make_queries


import pytest


@pytest.mark.parametrize("space", ["docid", "position"])
def test_incremental_generation_rank_identity(tmp_path, space):
    corpus = make_corpus(240, n_partitions=2)
    base = corpus.slice(0, 150)
    delta = corpus.slice(150)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        bucket_bits=2, term_parts=8, lineage_parts=1, posting_space=space
    )
    build_index(base, d, cfg)
    build_incremental(delta, d, generation="g1")

    reader = IndexReader(d)
    ids = doc_ids_from_keys(corpus["repo"], corpus["path"], corpus["commit"])
    oracle = OracleIndex(ids, corpus["content"].to_pylist())
    assert reader.n_docs == oracle.n_docs
    assert abs(reader.avgdl - oracle.avgdl) < 1e-9
    for term, df in oracle.df.items():
        assert int(reader.df.get(term, 0)) == df

    queries = make_queries(60)
    for text in queries["text"].to_pylist():
        golden = oracle.score_query(text, 10)
        got = score_taat(reader, text, 10)
        assert len(golden) == len(got)
        for (gd, gs), (ed, es) in zip(golden, got):
            assert gd == ed and abs(gs - es) <= 1e-9
        assert score_bmw(reader, text, 10) == got


def test_incremental_postings_sorted_after_merge(tmp_path):
    """Overlapping docID ranges across generations re-sort at decode."""
    corpus = make_corpus(120, n_partitions=1)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(bucket_bits=1, term_parts=4, lineage_parts=1)
    build_index(corpus.slice(0, 60), d, cfg)
    build_incremental(corpus.slice(60), d, generation="g1")
    reader = IndexReader(d)
    for term in list(reader.term_runs)[:50]:
        docs, tfs = reader.decode_term(term)
        if docs.size > 1:
            assert np.all(docs[1:] > docs[:-1])
        assert docs.size == int(reader.df[term])


def test_incremental_rejects_cross_generation_duplicate_ids(tmp_path):
    """A delta sharing doc keys with the base raises BEFORE linking and
    leaves the base index fully queryable (cross-generation collisions
    cannot be remapped once base postings are encoded)."""
    import os

    corpus = make_corpus(120, n_partitions=1)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(bucket_bits=1, term_parts=4, lineage_parts=1)
    build_index(corpus.slice(0, 80), d, cfg)
    base_reader = IndexReader(d)
    base_n = base_reader.n_docs
    # delta overlaps the base on 20 docs
    with pytest.raises(ValueError, match="shares doc ids"):
        build_incremental(corpus.slice(60, 40), d, generation="bad")
    # unlinked + cleaned: no gen dirs, no stale delta manifest, stats intact
    assert not os.path.exists(os.path.join(d, "generations", "bad"))
    assert not os.path.exists(os.path.join(d, "segments", "gen_bad"))
    assert not os.path.exists(os.path.join(d, "docmap", "gen_bad"))
    reader = IndexReader(d)
    assert reader.n_docs == base_n
    # a disjoint retry under the same generation name still works
    build_incremental(corpus.slice(80), d, generation="bad")
    assert IndexReader(d).n_docs == 120


@pytest.mark.parametrize("space", ["docid", "position"])
def test_compaction_restores_single_runs_and_identity(tmp_path, space):
    from pisa_ray.build import compact_index

    corpus = make_corpus(200, n_partitions=2)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        bucket_bits=2, term_parts=8, lineage_parts=1, posting_space=space
    )
    build_index(corpus.slice(0, 120), d, cfg)
    build_incremental(corpus.slice(120), d, generation="g1")
    compact_index(d)

    reader = IndexReader(d)
    ids = doc_ids_from_keys(corpus["repo"], corpus["path"], corpus["commit"])
    oracle = OracleIndex(ids, corpus["content"].to_pylist())
    # one run per (term, bucket) again and every term BMW-safe
    for term in list(reader.term_runs)[:100]:
        runs = reader.runs_of(term)
        assert len(runs) == len({r["bucket"] for r in runs})
        assert reader.term_bmw_safe(term)
        assert int(reader.df[term]) == oracle.df[term]
    queries = make_queries(40)
    for text in queries["text"].to_pylist():
        golden = oracle.score_query(text, 10)
        got = score_taat(reader, text, 10)
        assert [g[0] for g in golden] == [e[0] for e in got]
        assert all(abs(g[1] - e[1]) <= 1e-9 for g, e in zip(golden, got))
        assert score_bmw(reader, text, 10) == got


def test_maintain_index_policy(tmp_path):
    """maintain_index compacts when the generation count or tombstone
    fraction crosses its threshold — and not before."""
    import random

    import pyarrow as pa

    from pisa_ray.build import (
        IndexConfig, build_incremental, build_index, maintain_index,
    )
    from pisa_ray.delete import delete_docs
    from pisa_ray.scorer import IndexReader, score_taat

    rng = random.Random(3)
    vocab = ["merge", "sort", "tree", "node"]

    def mk(lo, hi):
        return pa.table(
            {
                "doc_id": pa.array(list(range(lo, hi)), type=pa.int64()),
                "text": pa.array(
                    [
                        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 15)))
                        for _ in range(lo, hi)
                    ]
                ),
            }
        )

    idx = str(tmp_path / "m")
    build_index(
        mk(1, 101),
        idx,
        IndexConfig(
            id_col="doc_id", content_col="text", meta_cols=(),
            bucket_bits=2, term_parts=8, lineage_parts=1,
        ),
        resume=False,
    )
    before = score_taat(IndexReader(idx), "merge sort", 10)
    lo = 101
    for g in range(3):
        build_incremental(mk(lo, lo + 20), idx, f"g{g}")
        lo += 20
        assert maintain_index(idx, max_generations=4) is False
    build_incremental(mk(lo, lo + 20), idx, "g3")
    assert maintain_index(idx, max_generations=4) is True
    r = IndexReader(idx)
    assert not r.gens  # folded
    assert r.n_docs == 180
    # results survive the policy-triggered compaction
    assert {d for d, _ in before} <= {d for d, _ in score_taat(r, "merge sort", 40)}

    # tombstone-fraction trigger
    delete_docs(idx, list(range(1, 60)))
    assert maintain_index(idx, max_generations=99, max_tombstone_fraction=0.2)
    assert IndexReader(idx).n_docs == 180 - 59


def test_append_retry_after_crashed_link(tmp_path):
    """A crashed build_incremental leaves the generation linked but
    stats uncommitted. Review findings under test: (a) readers SKIP
    the unknown gen dirs (results equal the pre-append index, not
    silent corruption), (b) retrying the SAME generation succeeds
    instead of tripping the duplicate check on its own earlier link."""
    import os
    import shutil as sh

    corpus = make_corpus(200, n_partitions=2)
    base, delta = corpus.slice(0, 140), corpus.slice(140)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1)
    build_index(base, d, cfg)
    before = IndexReader(d)

    # simulate the crash: build the delta and link it WITHOUT the
    # stats commit (exactly build_incremental's pre-commit state)
    gen_dir = os.path.join(d, "generations", "g1")
    build_index(delta, gen_dir, cfg)
    sh.copytree(os.path.join(gen_dir, "segments"),
                os.path.join(d, "segments", "gen_g1"))
    sh.copytree(os.path.join(gen_dir, "docmap"),
                os.path.join(d, "docmap", "gen_g1"))

    # (a) the half-linked generation is invisible
    mid = IndexReader(d)
    assert mid.n_docs == before.n_docs
    assert np.array_equal(mid.doc_sorted, before.doc_sorted)
    for text in ("def return self", "var_11 var_23"):
        assert score_taat(mid, text, 10) == score_taat(before, text, 10)

    # (b) the retry completes and the full corpus is served
    build_incremental(delta, d, generation="g1")
    after = IndexReader(d)
    assert after.n_docs == corpus.num_rows
    ids = doc_ids_from_keys(corpus["repo"], corpus["path"], corpus["commit"])
    oracle = OracleIndex(ids, corpus["content"].to_pylist())
    for text in ("def return self", "var_11 var_23"):
        golden = oracle.score_query(text, 10)
        got = score_taat(after, text, 10)
        assert [g[0] for g in golden] == [e[0] for e in got]


def test_incremental_rejects_reused_generation_name(tmp_path):
    """Appending DIFFERENT data under an already-recorded generation
    name must raise — the completed inner manifest would otherwise
    make the new delta silently vanish (review finding)."""
    import pytest as _pytest

    corpus = make_corpus(150, n_partitions=1)
    d = str(tmp_path / "idx")
    cfg = IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1)
    build_index(corpus.slice(0, 100), d, cfg)
    build_incremental(corpus.slice(100, 30), d, generation="g1")
    with _pytest.raises(ValueError, match="already appended"):
        build_incremental(corpus.slice(130), d, generation="g1")


def test_incremental_stats_exclude_stale_crashed_links(tmp_path):
    """A crashed append of generation X (linked but unrecorded) must
    NOT leak phantom rows into a later successful append's stats or
    lexicon — the readers skip those dirs, so the recompute must too
    (review finding)."""
    import os
    import shutil as sh

    corpus = make_corpus(220, n_partitions=2)
    base = corpus.slice(0, 120)
    ghost = corpus.slice(120, 50)   # the crashed append
    delta = corpus.slice(170)       # the later successful one
    d = str(tmp_path / "idx")
    cfg = IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1)
    build_index(base, d, cfg)

    # simulate the crash: gen_X linked, stats never committed
    gdir = os.path.join(d, "generations", "gx")
    build_index(ghost, gdir, cfg)
    sh.copytree(os.path.join(gdir, "segments"),
                os.path.join(d, "segments", "gen_gx"))
    sh.copytree(os.path.join(gdir, "docmap"),
                os.path.join(d, "docmap", "gen_gx"))

    build_incremental(delta, d, generation="gy")
    r = IndexReader(d)
    # stats count ONLY what the reader serves: base + gy, not gx
    assert r.n_docs == base.num_rows + delta.num_rows
    ids_served = doc_ids_from_keys(
        *[pa.concat_tables([base, delta])[c] for c in
          ("repo", "path", "commit")]
    )
    oracle = OracleIndex(
        ids_served,
        base["content"].to_pylist() + delta["content"].to_pylist(),
    )
    assert abs(r.avgdl - oracle.avgdl) < 1e-9
    for term, df in list(oracle.df.items())[:80]:
        assert int(r.df.get(term, 0)) == df, term


def test_upsert_prevalidates_before_destroying(tmp_path):
    """A malformed delta must be rejected BEFORE the old versions are
    tombstoned + compacted away (review finding: the old data used to
    be destroyed first, then the delta build raised)."""
    import pytest as _pytest

    from pisa_ray.build import upsert_docs
    from pisa_ray.scorer import score_taat

    base = pa.table(
        {
            "doc_id": pa.array(list(range(1, 41)), type=pa.int64()),
            "text": pa.array([f"alpha beta tok{i % 5}" for i in range(40)]),
        }
    )
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
        bucket_bits=2, term_parts=4, lineage_parts=1,
    )
    build_index(base, d, cfg)

    # (a) missing content column
    bad1 = pa.table({"doc_id": pa.array([3, 4], type=pa.int64())})
    with _pytest.raises(ValueError, match="missing required columns"):
        upsert_docs(bad1, d, "u1")
    # (b) duplicate identities inside the delta
    bad2 = pa.table(
        {
            "doc_id": pa.array([5, 5], type=pa.int64()),
            "text": pa.array(["one version", "other version"]),
        }
    )
    with _pytest.raises(ValueError, match="duplicate document"):
        upsert_docs(bad2, d, "u2")
    # the old versions survived both rejections
    r = IndexReader(d)
    assert r.n_docs == 40
    assert {doc for doc, _ in score_taat(r, "alpha", 50)} == set(range(1, 41))


def test_upsert_accepts_csv_delta(tmp_path):
    """upsert_docs must take the same CSV/TSV/JSONL formats as every
    other ingest entry point (review finding: the id-derivation read
    was parquet-only)."""
    from pisa_ray.build import upsert_docs
    from pisa_ray.scorer import score_taat

    base = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["alpha beta", "beta gamma", "gamma alpha"]),
        }
    )
    d = str(tmp_path / "idx")
    cfg = IndexConfig(
        id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
        bucket_bits=1, term_parts=4, lineage_parts=1,
    )
    build_index(base, d, cfg)
    csv = tmp_path / "delta.csv"
    csv.write_text("doc_id,text\n2,zzfresh beta\n9,zzfresh new\n")
    upsert_docs(str(csv), d, "u1")
    r = IndexReader(d)
    assert r.n_docs == 4  # 3 base - 1 replaced + 2 delta
    assert {doc for doc, _ in score_taat(r, "zzfresh", 10)} == {2, 9}


def test_compact_twice_after_full_delete(tmp_path):
    """Deleting every doc then compacting twice must not crash on the
    empty segments/ dir (review finding: IndexError on parts[0])."""
    from pisa_ray.build import compact_index
    from pisa_ray.delete import delete_docs
    from pisa_ray.scorer import query_index

    corpus = make_corpus(60, n_partitions=1)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(bucket_bits=1, term_parts=4,
                                       lineage_parts=1))
    r = IndexReader(d)
    delete_docs(d, r.out_ids(r.doc_sorted).tolist())
    compact_index(d)
    compact_index(d)  # empty-segments path
    r2 = IndexReader(d)
    assert r2.n_docs == 0


def test_upsert_empty_delta_is_noop(tmp_path):
    from pisa_ray.build import upsert_docs

    corpus = make_corpus(100, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(bucket_bits=2, term_parts=8,
                                       lineage_parts=1))
    before = IndexReader(d)
    out = upsert_docs(corpus.slice(0, 0), d, generation="gz")
    assert isinstance(out, dict)
    after = IndexReader(d)
    assert after.n_docs == before.n_docs
    assert np.array_equal(after.doc_sorted, before.doc_sorted)
