"""Term-sharded (vocabulary-partitioned) serving: bit-identity with
the unsharded TAAT path, shard disjointness, and filter/delete
semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def ts_index(tmp_path_factory):
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(400, n_partitions=4, vocab_size=2000, max_tokens=120)
    d = str(tmp_path_factory.mktemp("ts_idx"))
    build_index(
        corpus, d,
        IndexConfig(key_cols=("repo", "path", "commit"), content_col="content",
                    meta_cols=("lang",), bucket_bits=2, term_parts=8,
                    lineage_parts=2),
    )
    return d


def _queries():
    texts = [
        "def return self",                # stop-heavy
        "var_17 var_250 var_999",         # rare multi-term
        "class import var_3",             # mixed
        "zz_absent_zz",                   # OOV
        "var_1",                          # single common
        "for if var_42 var_77 var_5",     # wide
    ]
    return pa.table(
        {
            "query_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def test_term_sharded_bit_identical_to_taat(ts_index):
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import TermShardedBM25Service

    qt = _queries()
    want = (
        query_index(rd.from_arrow(qt), ts_index, k=10, method="taat",
                    concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # n_shards actors each reserve one CPU for the service's lifetime,
    # plus one for the merge task: stay within the 4-CPU test session
    for n_shards in (1, 2, 3):
        svc = TermShardedBM25Service(ts_index, n_shards=n_shards, k=10)
        got = (
            svc.query(qt, batch_size=3)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        svc.shutdown()
        assert got["query_id"].tolist() == want["query_id"].tolist(), n_shards
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), n_shards
        # BIT-identical scores: partials are summed in score_taat's
        # sorted-term float64 order
        assert np.array_equal(
            got["score"].to_numpy(), want["score"].to_numpy()
        ), n_shards


def test_term_sharded_all_oov_batch_concats_with_hits(ts_index):
    """batch_size=1 isolates the OOV query into an all-empty batch;
    its merge result must carry the SAME doc_id dtype as the hit
    batches (uint64 in keys-mode) or the final concat_tables raises
    ArrowInvalid (review finding)."""
    from pisa_ray.serve import TermShardedBM25Service

    qt = _queries()
    svc = TermShardedBM25Service(ts_index, n_shards=2, k=10)
    got = svc.query(qt, batch_size=1).to_pandas()
    want = svc.query(qt, batch_size=6).to_pandas()
    # an all-OOV-only service call stays typed too
    oov_only = svc.query(qt.slice(3, 1)).to_pandas()
    svc.shutdown()
    assert len(oov_only) == 0
    for df in (got, oov_only):
        assert df["doc_id"].dtype == want["doc_id"].dtype
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_term_sharded_pruned_bit_identical_to_taat(ts_index):
    """prune=True (TPUT-style three-phase protocol) must return the
    EXACT same table as TAAT and as the unpruned service — pruning
    bounds only shrink the wire payload; phase 3 re-sums exactly."""
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import TermShardedBM25Service

    qt = _queries()
    want = (
        query_index(rd.from_arrow(qt), ts_index, k=10, method="taat",
                    concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for n_shards in (1, 3):
        svc = TermShardedBM25Service(
            ts_index, n_shards=n_shards, k=10, prune=True
        )
        # batch_size=2 exercises multi-batch tags AND an all-OOV-ish
        # batch split; k larger than some result sets exercises the
        # tau=None no-prune path
        got = (
            svc.query(qt, batch_size=2)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        svc.shutdown()
        assert got["query_id"].tolist() == want["query_id"].tolist(), n_shards
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), n_shards
        assert np.array_equal(
            got["score"].to_numpy(), want["score"].to_numpy()
        ), n_shards


def test_term_sharded_pruned_with_filter_and_tombstones(ts_index, tmp_path):
    """prune=True composed with a metadata doc_filter AND live
    tombstones must stay bit-identical to the filtered TAAT path —
    the mask folds into phase-1 local sums, the phase-2 thresholds,
    and the phase-3 exact rows alike."""
    import shutil as sh

    from pisa_ray.delete import delete_docs
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import TermShardedBM25Service

    d = str(tmp_path / "idx_pf")
    sh.copytree(ts_index, d)
    qt = _queries()
    flt = ("lang", "python")
    svc = TermShardedBM25Service(d, n_shards=2, k=10, prune=True,
                                 doc_filter=flt)
    before = svc.query(qt).to_pandas()
    victims = before["doc_id"].head(4).tolist()
    delete_docs(d, victims)
    svc.reload()
    got = svc.query(qt, batch_size=3).to_pandas()
    svc.shutdown()
    assert not set(victims) & set(got["doc_id"])
    want = (
        query_index(rd.from_arrow(qt), d, k=10, method="taat",
                    concurrency=2, doc_filter=flt)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())


def test_term_sharded_pruned_random_corpora_property(tmp_path):
    """Property sweep: on seeded random corpora with different shapes
    (tiny vocab = stop-heavy overlap, larger vocab = selective), the
    pruned protocol must equal TAAT exactly for random query mixes
    incl. k larger than some result sets."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import TermShardedBM25Service

    rng = np.random.default_rng(42)
    for case, (n_docs, vocab) in enumerate([(150, 30), (250, 800)]):
        words = [f"w{i}" for i in range(vocab)]
        texts = [
            " ".join(
                rng.choice(words, size=rng.integers(3, 40)).tolist()
            )
            for _ in range(n_docs)
        ]
        corpus = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(n_docs, dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        d = str(tmp_path / f"rand_{case}")
        build_index(
            corpus, d,
            IndexConfig(id_col="doc_id", key_cols=(), content_col="text",
                        meta_cols=(), bucket_bits=2, term_parts=4,
                        lineage_parts=1),
        )
        q_texts = [
            " ".join(rng.choice(words, size=rng.integers(1, 5)).tolist())
            for _ in range(8)
        ] + ["zz_oov_zz"]
        qt = pa.table(
            {
                "query_id": pa.array(
                    np.arange(len(q_texts), dtype=np.int64), type=pa.int64()
                ),
                "text": pa.array(q_texts, type=pa.string()),
            }
        )
        k = 7
        want = (
            query_index(rd.from_arrow(qt), d, k=k, method="taat",
                        concurrency=2)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        svc = TermShardedBM25Service(d, n_shards=2, k=k, prune=True)
        got = (
            svc.query(qt, batch_size=4)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        svc.shutdown()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), case
        assert np.array_equal(
            got["score"].to_numpy(), want["score"].to_numpy()
        ), case


def test_term_sharded_over_incremental_generations(tmp_path):
    """Vocabulary-partitioned serving (plain AND pruned) over an index
    with a generation append must stay bit-identical to TAAT on the
    merged corpus — term-shard lexicon filtering composes with
    cross-generation posting decode."""
    from pisa_ray.build import IndexConfig, build_incremental, build_index
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import TermShardedBM25Service
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(240, n_partitions=2)
    d = str(tmp_path / "idx_gen")
    cfg = IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1)
    build_index(corpus.slice(0, 150), d, cfg)
    build_incremental(corpus.slice(150), d, generation="g1")

    qt = _queries()
    want = (
        query_index(rd.from_arrow(qt), d, k=10, method="taat",
                    concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    for prune in (False, True):
        svc = TermShardedBM25Service(d, n_shards=2, k=10, prune=prune)
        got = (
            svc.query(qt, batch_size=3)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        svc.shutdown()
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), prune
        assert np.array_equal(
            got["score"].to_numpy(), want["score"].to_numpy()
        ), prune


def test_term_sharded_rejects_duplicate_query_ids(ts_index):
    """Duplicate query_id rows would double-sum on the unpruned merge
    and overwrite each other in the pruned cache — reject loudly."""
    from pisa_ray.serve import TermShardedBM25Service

    qt = pa.table(
        {
            "query_id": pa.array([1, 1], type=pa.int64()),
            "text": pa.array(["merge", "sort"], type=pa.string()),
        }
    )
    svc = TermShardedBM25Service(ts_index, n_shards=1, k=5)
    try:
        with pytest.raises(ValueError, match="unique"):
            svc.query(qt)
    finally:
        svc.shutdown()


def test_term_shard_readers_partition_the_vocabulary(ts_index):
    from pisa_ray.scorer import IndexReader, term_shard_of

    full = IndexReader(ts_index)
    n = 4
    shards = [IndexReader(ts_index, term_shard=(i, n)) for i in range(n)]
    union, total = set(), 0
    for i, r in enumerate(shards):
        terms = set(r.df)
        # every term the shard holds hashes to its slot
        slots = term_shard_of(sorted(terms), n)
        assert (slots == i).all()
        assert not (union & terms)  # disjoint
        union |= terms
        total += len(terms)
        # df values agree with the full reader
        for t in list(terms)[:20]:
            assert r.df[t] == full.df[t]
    assert union == set(full.df) and total == len(full.df)


def test_term_sharded_respects_tombstones(ts_index, tmp_path):
    """Deleted docs must vanish from term-sharded results too (the
    live mask folds into score_partial like every other kernel)."""
    import shutil as sh

    from pisa_ray.delete import delete_docs
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import TermShardedBM25Service

    d = str(tmp_path / "idx_del")
    sh.copytree(ts_index, d)
    qt = _queries()
    # delete against a LIVE pool + reload() — the serving contract
    svc = TermShardedBM25Service(d, n_shards=3, k=10)
    before = svc.query(qt).to_pandas()
    victims = before["doc_id"].head(5).tolist()
    delete_docs(d, victims)
    svc.reload()
    got = svc.query(qt).to_pandas()
    svc.shutdown()
    assert not set(victims) & set(got["doc_id"])
    want = (
        query_index(rd.from_arrow(qt), d, k=10, method="taat", concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(), want["score"].to_numpy())
