"""End-to-end build + query conformance (SURVEY.md §5.2-5.3).

Golden pattern follows the reference's checked-in per-snapshot result
files (/root/reference/src/helpers/Runner.py:94-98): the Ray engine
must be rank-identical to the naive oracle — same top-10 doc_ids,
scores equal to <= 1e-9 — and invariant under parallelism and
resume.
"""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd
from pisa_ray.build import IndexConfig, build_index
from pisa_ray.docids import doc_ids_from_keys
from pisa_ray.scorer import BM25Scorer, IndexReader, score_bmw, score_taat
from pisa_ray.synth import make_corpus, make_queries


def _check_rank_identical(golden, engine):
    assert len(golden) == len(engine)
    for (gd, gs), (ed, es) in zip(golden, engine):
        assert gd == ed
        assert abs(gs - es) <= 1e-9


def test_rank_identity_vs_oracle(tiny_index, tiny_oracle):
    reader = IndexReader(tiny_index)
    queries = make_queries(100)
    for qid, text in zip(
        queries["query_id"].to_pylist(), queries["text"].to_pylist()
    ):
        golden = tiny_oracle.score_query(text, 10)
        _check_rank_identical(golden, score_taat(reader, text, 10))


def test_bmw_identical_to_taat(tiny_index):
    reader = IndexReader(tiny_index)
    queries = make_queries(150)
    for text in queries["text"].to_pylist():
        assert score_bmw(reader, text, 10) == score_taat(reader, text, 10)


def test_conjunctive_is_taat_restricted_to_all_term_docs(tiny_index):
    """score_conj == score_taat restricted to docs containing EVERY
    query term, scores bit-identical (same float64 sorted-term sum);
    any OOV term empties the result."""
    from pisa_ray.scorer import score_conj
    from pisa_ray.tokenizer import tokenize_py

    reader = IndexReader(tiny_index)
    queries = make_queries(80)
    checked_nonempty = 0
    for text in queries["text"].to_pylist():
        terms = sorted(set(tokenize_py(text)))
        got = score_conj(reader, text, 10)
        # oracle: intersect the per-term position sets, score via a
        # huge-k taat run filtered to the intersection
        pos_sets = []
        for t in terms:
            _, _, pos = reader.term_contributions(t)
            pos_sets.append(set(pos.tolist()))
        if not pos_sets or any(not s for s in pos_sets):
            assert got == []
            continue
        inter = set.intersection(*pos_sets)
        if not inter:
            assert got == []
            continue
        full = score_taat(reader, text, reader.n_docs)
        allowed = set(
            int(i)
            for i in reader.out_ids(
                reader.doc_sorted[np.array(sorted(inter), dtype=np.int64)]
            )
        )
        want = [(d, s) for d, s in full if d in allowed][:10]
        assert got == want
        if want:
            checked_nonempty += 1
    assert checked_nonempty > 5  # the mix must actually exercise hits


def test_filtered_bmw_identical_to_filtered_taat(tiny_index):
    """Filter-aware block-max pruning: the mask gates full evaluation
    only, so filtered BMW must stay rank-identical to filtered TAAT
    (which is itself oracle-identical) at any filter selectivity."""
    reader = IndexReader(tiny_index)
    rng = np.random.default_rng(5)
    queries = make_queries(60)
    for selectivity in (0.05, 0.3, 0.9):
        mask = rng.random(reader.n_docs) < selectivity
        for text in queries["text"].to_pylist():
            assert score_bmw(reader, text, 10, doc_mask=mask) == score_taat(
                reader, text, 10, doc_mask=mask
            )


def test_stats_match_oracle(tiny_index, tiny_oracle):
    reader = IndexReader(tiny_index)
    assert reader.n_docs == tiny_oracle.n_docs
    assert abs(reader.avgdl - tiny_oracle.avgdl) < 1e-9
    # global df in lexicon == oracle df for every term
    for term, df in tiny_oracle.df.items():
        assert int(reader.df.get(term, 0)) == df
    assert len(reader.df) == len(tiny_oracle.df)


def test_sha256_invariant(tiny_index, tiny_corpus):
    """Per-row invariant: content sha256 equality source table <-> docmap."""
    import hashlib

    dm_files = sorted(
        glob.glob(os.path.join(tiny_index, "docmap", "**", "*.parquet"), recursive=True)
    )
    dm = pa.concat_tables([pq.read_table(f) for f in dm_files])
    ids = doc_ids_from_keys(
        tiny_corpus["repo"], tiny_corpus["path"], tiny_corpus["commit"]
    )
    want = {
        int(i): hashlib.sha256(c.encode()).digest()
        for i, c in zip(ids, tiny_corpus["content"].to_pylist())
    }
    got = {
        int(i): s
        for i, s in zip(
            dm["doc_id"].to_pylist(), dm["content_sha256"].to_pylist()
        )
    }
    assert got == want


def test_postings_invariants(tiny_index, tiny_oracle):
    """Postings doc-sorted; sum tf per doc == doc length."""
    reader = IndexReader(tiny_index)
    tf_per_doc: dict[int, int] = {}
    for term in reader.term_runs:
        docs, tfs = reader.decode_term(term)
        assert np.all(docs[1:] > docs[:-1]) if docs.size > 1 else True
        for d, t in zip(docs.tolist(), tfs.tolist()):
            tf_per_doc[d] = tf_per_doc.get(d, 0) + t
    lengths = dict(
        zip(reader.doc_sorted.tolist(), reader.len_sorted.tolist())
    )
    for d, total in tf_per_doc.items():
        assert total == lengths[d]


def test_parallelism_invariance(tmp_path, tiny_corpus):
    """Identical segments + identical query results at different
    partitioning/bucketing configs (the sandbox analog of the
    two-cluster-size rank-identity requirement)."""
    q = make_queries(40)
    results = []
    for i, cfg in enumerate(
        [
            IndexConfig(bucket_bits=0, term_parts=2, lineage_parts=1),
            IndexConfig(bucket_bits=3, term_parts=16, lineage_parts=1,
                        tokenize_batch_size=64),
        ]
    ):
        d = str(tmp_path / f"idx{i}")
        build_index(tiny_corpus, d, cfg)
        reader = IndexReader(d)
        results.append(
            [score_taat(reader, t, 10) for t in q["text"].to_pylist()]
        )
    assert results[0] == results[1]


def test_actor_pool_query(tiny_index, tiny_oracle):
    """Full Ray Data path: queries Dataset -> actor pool -> hits Dataset."""
    from pisa_ray.scorer import query_index

    q = make_queries(30)
    hits = query_index(rd.from_arrow(q), tiny_index, k=10, concurrency=2).to_pandas()
    for qid, text in zip(q["query_id"].to_pylist(), q["text"].to_pylist()):
        golden = tiny_oracle.score_query(text, 10)
        sub = hits[hits.query_id == qid].sort_values("rank")
        _check_rank_identical(
            golden, list(zip(sub.doc_id.astype("uint64"), sub.score))
        )


def test_resume_skips_done_and_is_byte_identical(tmp_path, tiny_corpus):
    d1 = str(tmp_path / "a")
    build_index(tiny_corpus, d1, IndexConfig(bucket_bits=1, term_parts=4))
    # simulate kill after tokenize: drop later stages, then resume
    d2 = str(tmp_path / "b")
    cfg = IndexConfig(bucket_bits=1, term_parts=4)
    build_index(tiny_corpus, d2, cfg)
    man_path = os.path.join(d2, "manifest.json")
    man = json.load(open(man_path))
    for stage in ("docmap", "segments", "lexicon"):
        man["stages"].pop(stage, None)
    json.dump(man, open(man_path, "w"))
    shutil.rmtree(os.path.join(d2, "segments"))
    shutil.rmtree(os.path.join(d2, "lexicon"))
    build_index(tiny_corpus, d2, cfg, resume=True)

    def seg_dump(d):
        files = sorted(
            glob.glob(os.path.join(d, "segments", "**", "*.parquet"), recursive=True)
        )
        t = pa.concat_tables([pq.read_table(f) for f in files])
        idx = pa.compute.sort_indices(
            t, sort_keys=[("term", "ascending"), ("bucket", "ascending")]
        )
        return t.take(idx)

    assert seg_dump(d1).equals(seg_dump(d2))


def test_manifest_lineage(tiny_index):
    man = json.load(open(os.path.join(tiny_index, "manifest.json")))
    for stage in ("tokenized", "docmap", "segments", "lexicon"):
        assert man["stages"][stage]["status"] == "done"
    # per-partition entries with metrics exist
    parts = man["stages"]["segments"]["partitions"]
    assert len(parts) == 4  # bucket_bits=2
    for p in parts.values():
        assert p["status"] == "done" and "wall_s" in p


def test_sharded_query_fanout_matches_broadcast(tiny_index, tiny_oracle):
    """Doc-sharded scorer pools (multi-node shape) merge to the exact
    same global top-k as the single-pool broadcast path."""
    from pisa_ray.scorer import query_index, query_index_sharded

    q = make_queries(25)
    a = (
        query_index(rd.from_arrow(q), tiny_index, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        query_index_sharded(
            rd.from_arrow(q), tiny_index, shards=[{0, 1}, {2, 3}], k=10
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a[["query_id", "rank", "doc_id"]].equals(
        b[["query_id", "rank", "doc_id"]]
    )
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)


def test_sharded_reader_loads_shard_local_docmap(tiny_index):
    """A bucket-sharded reader must hold only ITS buckets' docmap rows
    (per-shard memory ∝ 1/S), while BM25 stats stay global."""
    full = IndexReader(tiny_index)
    half = IndexReader(tiny_index, buckets={0, 1})  # 2 of 4 buckets
    assert half.n_docs == full.n_docs  # global stats unchanged
    assert half.n_local < full.n_local
    # hash-uniform ids -> each bucket holds ~n/4
    assert abs(half.n_local - full.n_local / 2) < full.n_local * 0.25
    # every doc the shard's segments reference resolves locally
    for term in list(half.term_runs)[:30]:
        docs, _ = half.decode_term(term)
        assert np.isin(docs, half.doc_sorted).all()


def test_sharded_reader_memory_proportional(tiny_index):
    """The serving-tier memory contract, MEASURED (VERDICT r2 #9): the
    doc-dependent bytes (postings blobs + docmap arrays) of S=4
    single-bucket shards (a) partition the unsharded reader's bytes —
    nothing is double-loaded — and (b) each shard holds ~1/S of them
    (hash-uniform doc ids), while the global lexicon is replicated by
    design. ``bench.py --shardmem`` measures the same contract as
    subprocess VmRSS on a 300k-doc index."""
    full = IndexReader(tiny_index).resident_bytes()
    shards = [
        IndexReader(tiny_index, buckets={b}).resident_bytes() for b in range(4)
    ]
    # conservation: docmap rows live in exactly one shard; posting runs
    # belong to exactly one bucket (offset arrays add one fencepost
    # entry per shard -> tiny tolerance)
    assert sum(s["docmap"] for s in shards) == full["docmap"]
    total_post = sum(s["postings"] for s in shards)
    assert abs(total_post - full["postings"]) <= 0.02 * full["postings"] + 1024
    # proportionality: every shard well under half of the full
    # doc-dependent footprint (ideal 1/4; slack for bucket skew)
    for s in shards:
        mine = s["postings"] + s["docmap"]
        assert mine <= 0.45 * (full["postings"] + full["docmap"])
    # lexicon (global term->df) is replicated per shard by design;
    # term-run metadata never exceeds the unsharded reader's
    for s in shards:
        assert s["lexicon"] == full["lexicon"]
        assert s["term_meta"] <= full["term_meta"]


def test_csv_source_builds_identical_index(tmp_path, tiny_corpus):
    """CSV corpus ingest produces the same segments as Parquet."""
    import pyarrow.csv as pacsv

    csv_path = str(tmp_path / "corpus.csv")
    pacsv.write_csv(tiny_corpus, csv_path)
    d1, d2 = str(tmp_path / "pq"), str(tmp_path / "csv")
    cfg = IndexConfig(bucket_bits=1, term_parts=4, lineage_parts=1)
    build_index(tiny_corpus, d1, cfg)
    build_index(csv_path, d2, cfg)
    r1, r2 = IndexReader(d1), IndexReader(d2)
    assert r1.df == r2.df
    q = make_queries(20)
    for text in q["text"].to_pylist():
        assert score_taat(r1, text, 10) == score_taat(r2, text, 10)


def test_cli_build_and_query(tmp_path, tiny_corpus):
    """python -m pisa_ray build/query — the ray-job-submit surface."""
    import subprocess
    import sys as _sys

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(tiny_corpus, corpus)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")
    out = subprocess.run(
        [_sys.executable, "-m", "pisa_ray", "build", "--corpus", corpus,
         "--index", idx, "--bucket-bits", "1", "--term-parts", "4"],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n_docs"] == tiny_corpus.num_rows

    qfile = str(tmp_path / "q.parquet")
    pq.write_table(
        pa.table({"query_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(["def return"])}), qfile)
    out = subprocess.run(
        [_sys.executable, "-m", "pisa_ray", "query", "--index", idx,
         "--queries", qfile, "--k", "3"],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    rows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
    assert len(rows) == 3 and rows[0]["rank"] == 1

    # info: stats + config + component memory in one JSON line
    out = subprocess.run(
        [_sys.executable, "-m", "pisa_ray", "info", "--index", idx],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    info = json.loads(out.strip().splitlines()[-1])
    assert info["stats"]["n_docs"] == tiny_corpus.num_rows
    assert info["config"]["bucket_bits"] == 1
    assert info["n_terms"] > 0 and info["memory"]["total"] > 0
    assert info["n_segment_files"] > 0 and info["n_tombstones"] == 0

    # suggest: df-ranked prefix completion
    out = subprocess.run(
        [_sys.executable, "-m", "pisa_ray", "suggest", "--index", idx,
         "--prefix", "de", "--k", "3"],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    srows = [json.loads(l) for l in out.strip().splitlines() if l.startswith("{")]
    assert all(r["term"].startswith("de") and r["df"] > 0 for r in srows)
    assert [r["df"] for r in srows] == sorted((r["df"] for r in srows), reverse=True)


def test_cli_delete_profile_compact(tmp_path, tiny_corpus):
    """python -m pisa_ray delete/profile/compact — the lifecycle ops on
    the ray-job-submit surface."""
    import subprocess
    import sys as _sys

    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(tiny_corpus, corpus)
    idx = str(tmp_path / "idx")
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="local")

    def run(*argv):
        return subprocess.run(
            [_sys.executable, "-m", "pisa_ray", *argv],
            env=env, capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1]

    json.loads(run("build", "--corpus", corpus, "--index", idx,
                   "--bucket-bits", "1", "--term-parts", "4"))
    lang = tiny_corpus["lang"][0].as_py()
    expect = sum(1 for v in tiny_corpus["lang"].to_pylist() if v == lang)
    got = json.loads(run("delete", "--index", idx, "--where", f"lang={lang}"))
    assert got["tombstoned"] == expect
    assert os.path.isdir(os.path.join(idx, "tombstones"))

    assert json.loads(run("compact", "--index", idx))["status"] == "compacted"
    assert not os.path.isdir(os.path.join(idx, "tombstones"))
    stats = json.loads(open(os.path.join(idx, "stats.json")).read())
    assert stats["n_docs"] == tiny_corpus.num_rows - expect

    prof = json.loads(run("profile", "--table", corpus,
                          "--columns", "lang,content", "--top-k", "3"))
    assert prof["lang"]["n"] == tiny_corpus.num_rows
    assert prof["lang"]["count_error"] == 0
    assert {d["value"]: d["count"] for d in prof["lang"]["top_values"]}[lang] == expect
    assert prof["content"]["avg_len"] > 0
    # free-text column (mean length > 256): heavy-values summary is
    # skipped so full documents never ride summary rows to the driver
    assert "top_values" not in prof["content"]


def test_index_metrics_in_manifest(tiny_index):
    man = json.load(open(os.path.join(tiny_index, "manifest.json")))
    m = man["index_metrics"]
    assert m["postings"] > 0
    assert 1.0 < m["bytes_per_posting"] < 12.0  # varint gaps + tfs


def test_docid_collision_resolution_rank_identity(tmp_path):
    """id_bits=12 (4096 id slots for 300 docs) forces real docID
    collisions; the build must detect + deterministically resolve them
    (no silent tf merge), keep every doc, preserve the sha invariant,
    stay rank-identical to a content-aligned oracle, and produce the
    SAME ids at any parallelism."""
    import hashlib

    from pisa_ray.oracle import OracleIndex

    corpus = make_corpus(300, n_partitions=2)
    text_of = {
        hashlib.sha256(c.encode()).digest(): c
        for c in corpus["content"].to_pylist()
    }
    docmaps = []
    for i, cfg in enumerate(
        [
            IndexConfig(bucket_bits=2, term_parts=4, lineage_parts=1, id_bits=12),
            IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=2,
                        tokenize_batch_size=64, id_bits=12),
        ]
    ):
        d = str(tmp_path / f"cidx{i}")
        man = build_index(corpus, d, cfg)
        assert man["stages"]["collisions"]["rows"] > 0  # collisions happened
        dm_files = sorted(
            glob.glob(os.path.join(d, "docmap", "**", "*.parquet"), recursive=True)
        )
        dm = pa.concat_tables(
            [pq.read_table(f, columns=["doc_id", "content_sha256"]) for f in dm_files]
        )
        ids = np.asarray(dm["doc_id"].to_pylist(), dtype=np.uint64)
        shas = dm["content_sha256"].to_pylist()
        assert ids.size == 300 and np.unique(ids).size == 300  # no merges
        docmaps.append(sorted(zip(ids.tolist(), shas)))
        # rank identity vs an oracle built over the RESOLVED ids
        oracle = OracleIndex(ids, [text_of[bytes(s)] for s in shas])
        reader = IndexReader(d)
        for text in make_queries(40)["text"].to_pylist():
            golden = oracle.score_query(text, 10)
            got = score_taat(reader, text, 10)
            assert [g[0] for g in golden] == [e[0] for e in got]
            assert all(abs(g[1] - e[1]) <= 1e-9 for g, e in zip(golden, got))
            assert score_bmw(reader, text, 10) == got
    assert docmaps[0] == docmaps[1]  # deterministic at any parallelism


def test_sharded_query_position_space(tmp_path, tiny_corpus):
    """Bucket-sharded serving over a position-space index exercises the
    global-rank -> shard-local translation (rank_to_local): fan-out
    results must equal the broadcast pool's exactly."""
    from pisa_ray.scorer import query_index, query_index_sharded

    d = str(tmp_path / "pos_idx")
    build_index(
        tiny_corpus,
        d,
        IndexConfig(bucket_bits=2, term_parts=8, lineage_parts=1,
                    posting_space="position"),
    )
    q = make_queries(25)
    a = (
        query_index(rd.from_arrow(q), d, k=10, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        query_index_sharded(
            rd.from_arrow(q), d, shards=[{0, 1}, {2, 3}], k=10
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a[["query_id", "rank", "doc_id"]].equals(
        b[["query_id", "rank", "doc_id"]]
    )
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)


def test_serve_reload_picks_up_deletes(tmp_path):
    """A LIVE BM25Service serves its loaded view through a delete
    (point-in-time semantics), then reload() makes the tombstones
    visible — bit-identical to the Dataset path over the same index."""
    import pandas as pd

    from pisa_ray import BM25Service, query_index
    from pisa_ray.delete import delete_docs
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(150, n_partitions=1)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(bucket_bits=1, term_parts=4, lineage_parts=1))
    qt = make_queries(30)
    svc = BM25Service(d, k=10, method="auto", num_actors=2)
    try:
        before = svc.query(qt, batch_size=16).to_pandas()
        victims = set(before["doc_id"].head(20).tolist())
        delete_docs(d, np.fromiter(victims, dtype=np.uint64))
        # point-in-time: the live pool still serves the old view
        stale = svc.query(qt, batch_size=16).to_pandas()
        pd.testing.assert_frame_equal(
            stale.sort_values(["query_id", "rank"]).reset_index(drop=True),
            before.sort_values(["query_id", "rank"]).reset_index(drop=True),
        )
        svc.reload()
        after = (
            svc.query(qt, batch_size=16)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert not set(after["doc_id"]) & victims
        want = (
            query_index(rd.from_arrow(qt), d, k=10, method="auto", concurrency=2)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(after, want)
    finally:
        svc.shutdown()


def test_serve_tier_identical_to_dataset_path(tiny_index):
    """BM25Service (persistent actor pool) returns bit-identical hits
    to the per-job Dataset pool, across repeats (result-memo path) and
    with a doc filter."""
    import pandas as pd

    from pisa_ray import BM25Service, query_index

    qt = make_queries(60)
    svc = BM25Service(tiny_index, k=10, method="auto", num_actors=2)
    try:
        a = (
            svc.query(qt, batch_size=16)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        b = (
            query_index(rd.from_arrow(qt), tiny_index, k=10, method="auto", concurrency=2)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        # repeat: memo hits must be identical
        a2 = (
            svc.query(qt, batch_size=16)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, a2)
    finally:
        svc.shutdown()


def test_sharded_serve_tier_identical_to_broadcast(tiny_index):
    """ShardedBM25Service (persistent per-shard pools + vectorized
    global merge) matches the broadcast BM25Service and the per-job
    query_index_sharded exactly."""
    import pandas as pd

    from pisa_ray import BM25Service
    from pisa_ray.serve import ShardedBM25Service
    from pisa_ray.scorer import query_index_sharded

    qt = make_queries(40)
    shards = [{0, 1}, {2, 3}]
    # Persistent pools hold 1 CPU each; run them sequentially and shut
    # each down before the next job so the 4-CPU test session never
    # deadlocks on actor placement.
    svc = ShardedBM25Service(tiny_index, shards, k=10, actors_per_shard=1)
    try:
        a = (
            svc.query(qt, batch_size=16)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        svc.shutdown()
    bsvc = BM25Service(tiny_index, k=10, num_actors=2)
    try:
        b = (
            bsvc.query(qt, batch_size=16)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        bsvc.shutdown()
    pd.testing.assert_frame_equal(a, b)
    c = (
        query_index_sharded(rd.from_arrow(qt), tiny_index, shards=shards, k=10)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)[a.columns.tolist()]
        .astype({col: a[col].dtype for col in a.columns})
    )
    pd.testing.assert_frame_equal(a, c)


def test_sharded_serve_tier_with_doc_filter(tiny_index, tmp_path):
    """Doc-range sharded pools with a metadata filter — this path used
    to crash at construction (a GLOBAL-order mask shipped to bucket
    readers, review finding); each actor now builds its shard-local
    mask. Must equal the filtered Dataset path, and reload() must keep
    the filter live through deletes."""
    import shutil as sh

    from pisa_ray.delete import delete_docs
    from pisa_ray.scorer import query_index
    from pisa_ray.serve import ShardedBM25Service

    d = str(tmp_path / "idx_shflt")
    sh.copytree(tiny_index, d)
    qt = make_queries(30)
    flt = ("lang", "python")
    svc = ShardedBM25Service(
        d, [{0, 1}, {2, 3}], k=10, actors_per_shard=1, doc_filter=flt
    )
    try:
        a = svc.query(qt, batch_size=16).to_pandas()
        assert len(a)  # the filter matches a real slice of the corpus
        victims = a["doc_id"].head(3).tolist()
        delete_docs(d, victims)
        svc.reload()
        b = (
            svc.query(qt, batch_size=16)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        svc.shutdown()
    assert not set(victims) & set(b["doc_id"])
    want = (
        query_index(
            rd.from_arrow(qt), d, k=10, method="taat", concurrency=2,
            doc_filter=flt,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert b["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.array_equal(b["score"].to_numpy(), want["score"].to_numpy())


def test_serve_small_bursts_rotate_actors(tiny_index):
    """The round-robin cursor persists across query() calls so a
    stream of small bursts uses the whole pool instead of pinning
    every batch to actors[0] (review finding)."""
    from pisa_ray import BM25Service

    svc = BM25Service(tiny_index, k=5, num_actors=2)
    try:
        assert svc._rr == 0
        a = svc.query_texts(["merge"]).to_pandas()
        b = svc.query_texts(["merge"]).to_pandas()
        assert svc._rr == 2  # two one-batch bursts -> two actors
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
    finally:
        svc.shutdown()


def test_serve_expander_rebuilds_on_reload(tmp_path):
    """A prefix-expansion service must see vocabulary appended by an
    incremental generation after reload() — the lazily-built term trie
    used to survive reload and silently miss new terms (review
    finding)."""
    import pyarrow as pa

    from pisa_ray import BM25Service
    from pisa_ray.build import IndexConfig, build_incremental, build_index

    base = pa.table(
        {
            "doc_id": pa.array(list(range(40)), type=pa.int64()),
            "text": pa.array(
                [f"alpha beta gamma tok{i % 7}" for i in range(40)]
            ),
        }
    )
    delta = pa.table(
        {
            "doc_id": pa.array([100, 101], type=pa.int64()),
            "text": pa.array(
                ["zzappended alpha fresh", "zzappendix beta fresh"]
            ),
        }
    )
    d = str(tmp_path / "idx_exp")
    cfg = IndexConfig(
        id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
        bucket_bits=1, term_parts=4, lineage_parts=1,
    )
    build_index(base, d, cfg)
    svc = BM25Service(d, k=5, num_actors=1, expand="prefix")
    try:
        assert len(svc.query_texts(["zzappend*"])) == 0  # warms the trie
        build_incremental(delta, d, generation="g1")
        svc.reload()
        hits = svc.query_texts(["zzappend*"]).to_pandas()
        assert set(hits["doc_id"]) == {100, 101}
    finally:
        svc.shutdown()


# -- query-time term expansion (prefix / fuzzy) ----------------------------


def test_scorer_construction_rails(tiny_index):
    """Review-finding rails: reader_ref+buckets is a contradiction
    (every shard would score the whole index and the merge would
    emit duplicates); conj + expansion inverts OR semantics into
    required AND terms."""
    from pisa_ray.scorer import BM25Scorer, _broadcast_reader

    ref = _broadcast_reader(tiny_index)
    with pytest.raises(ValueError, match="not both"):
        BM25Scorer(reader_ref=ref, buckets={0, 1})
    with pytest.raises(ValueError, match="conj"):
        BM25Scorer(index_dir=tiny_index, method="conj", expand="prefix")
    with pytest.raises(ValueError, match="conj"):
        BM25Scorer(index_dir=tiny_index, method="conj",
                   synonyms={"merge": ["join"]})


def test_term_expander_astral_prefix_bound():
    """The prefix upper bound must include vocabulary terms whose next
    code point is beyond U+FFFF (the old +'\\uffff' sentinel missed
    them — review finding)."""
    from pisa_ray.scorer import TermExpander

    astral = "a" + chr(0x10348)  # GOTHIC LETTER HWAIR, sorts after U+FFFF
    vocab = {"a": 3, "ab": 2, astral: 1, "b": 5}
    exp = TermExpander(vocab, max_expand=10)
    assert exp.prefix("a") == sorted(["a", "ab", astral])
    assert exp.wildcard("a*") == sorted(["a", "ab", astral])


def test_term_expander_prefix_and_fuzzy_vs_brute(tiny_oracle):
    from pisa_ray.scorer import TermExpander

    vocab = sorted(tiny_oracle.df)
    exp = TermExpander(dict(tiny_oracle.df), max_expand=len(vocab))
    # prefix == brute startswith filter, for several prefix lengths
    for p in {v[:n] for v in vocab[:40] for n in (1, 2, 4)}:
        assert exp.prefix(p) == sorted(t for t in vocab if t.startswith(p)), p

    def brute_ed1(a: str, b: str) -> bool:
        # full Levenshtein, thresholded at 1
        if abs(len(a) - len(b)) > 1:
            return False
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1] <= 1

    probes = vocab[:15] + [v + "x" for v in vocab[:5]] + [
        v[1:] for v in vocab[:5] if len(v) > 2
    ] + ["q" + v[1:] for v in vocab[:5]]
    for q in probes:
        want = sorted(t for t in vocab if brute_ed1(q, t))
        assert exp.fuzzy1(q) == want, q


def test_term_expander_cap_keeps_highest_df():
    from pisa_ray.scorer import TermExpander

    df = {"aa": 5, "ab": 50, "ac": 2, "ad": 50, "b": 1}
    exp = TermExpander(df, max_expand=2)
    assert exp.prefix("a") == ["ab", "ad"]  # df desc, term tie-break


def test_prefix_query_rank_identical_to_expanded_oracle(tiny_index, tiny_oracle):
    from pisa_ray.scorer import IndexReader, score_taat

    reader = IndexReader(tiny_index)
    vocab = sorted(tiny_oracle.df)
    base = vocab[len(vocab) // 2]
    prefix, expanded = None, []
    for n in range(len(base), 0, -1):  # longest prefix with 2..64 matches
        expanded = sorted(t for t in vocab if t.startswith(base[:n]))
        if 1 < len(expanded) <= 64:
            prefix = base[:n]
            break
    assert prefix, "fixture vocab has no prefix expanding to 2..64 terms"
    import ray.data as _rd

    from pisa_ray.scorer import query_index

    hits = (
        query_index(
            _rd.from_items([{"query_id": 0, "text": prefix + "*"}]),
            tiny_index,
            k=10,
            concurrency=2,
            expand="prefix",
        )
        .to_pandas()
        .sort_values("rank")
    )
    golden = tiny_oracle.score_query(" ".join(expanded), 10)
    assert len(hits) == len(golden)
    for (gd, gs), ed, es in zip(golden, hits["doc_id"], hits["score"]):
        assert gd == ed and abs(gs - es) <= 1e-9


def test_fuzzy_query_corrects_typo(tiny_index, tiny_oracle):
    from pisa_ray.scorer import BM25Scorer

    vocab = sorted(tiny_oracle.df, key=lambda t: (-len(t), t))
    term = vocab[0]  # longest term: its ED<=1 neighborhood is small
    typo = term[:-1] + ("x" if term[-1] != "x" else "y") + term[-1]  # insertion
    scorer = BM25Scorer(index_dir=tiny_index, k=10, expand="fuzzy1")
    expanded = scorer._query_terms(typo)
    assert term in expanded
    hits = scorer(
        pa.table({"query_id": pa.array([0], pa.int64()),
                  "text": pa.array([typo])})
    )
    golden = tiny_oracle.score_query(" ".join(sorted(set(expanded))), 10)
    assert hits.num_rows == len(golden)
    for (gd, gs), ed, es in zip(
        golden, hits["doc_id"].to_pylist(), hits["score"].to_pylist()
    ):
        assert gd == ed and abs(gs - es) <= 1e-9
    # exact (in-vocabulary) tokens are NOT expanded
    assert scorer._query_terms(term) == [term]


def test_serve_expand_prefix_matches_dataset_path(tiny_index):
    from pisa_ray import BM25Service, query_index

    qt = pa.table(
        {"query_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(["var_12* def", "zz_nothing*"])}
    )
    svc = BM25Service(tiny_index, k=10, num_actors=1, expand="prefix")
    try:
        a = (
            svc.query(qt, batch_size=8)
            .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
    finally:
        svc.shutdown()
    b = (
        query_index(
            rd.from_arrow(qt), tiny_index, k=10, concurrency=1, expand="prefix"
        )
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


# --------------------------------------------------------------------------
# Boolean (AND/OR/NOT) retrieval
# --------------------------------------------------------------------------


def _bool_expected(reader, pos_set, pos_terms, k, doc_mask=None):
    """Independent expected result: explicit Python-set predicate
    evaluation + float64 sorted-positive-term BM25 sum + (score desc,
    id asc) tie-break."""
    if doc_mask is not None:
        pos_set = {p for p in pos_set if doc_mask[p]}
    if not pos_set:
        return []
    cand = np.array(sorted(pos_set), dtype=np.int64)
    score = np.zeros(cand.size, dtype=np.float64)
    for t in sorted(set(pos_terms.split())):
        _, contrib, pos = reader.term_contributions(t)
        if pos.size == 0:
            continue
        m = np.isin(cand, pos)
        idx = np.searchsorted(pos, cand[m])
        score[m] += contrib[idx]
    out = reader.out_ids(reader.doc_sorted[cand])
    order = np.lexsort((out, -score))[: min(k, cand.size)]
    return [(int(out[i]), float(score[i])) for i in order]


def _bool_cases(reader):
    """(query text, expected position set, positive-term string) —
    expected sets built with PLAIN PYTHON SET ALGEBRA (no parser, no
    De Morgan polarity folding), so the two evaluations are
    independent."""

    def docs(t):
        _, _, pos = reader.term_contributions(t)
        return set(pos.tolist())

    universe = set(range(reader.n_local))
    return [
        ("class AND import", docs("class") & docs("import"), "class import"),
        ("class import", docs("class") & docs("import"), "class import"),
        ("class OR lambda", docs("class") | docs("lambda"), "class lambda"),
        ("class AND NOT import", docs("class") - docs("import"), "class"),
        # precedence: adjacency/AND binds tighter than OR
        (
            "class OR import NOT lambda",
            docs("class") | (docs("import") - docs("lambda")),
            "class import",
        ),
        (
            "(class OR lambda) AND NOT (import OR yield)",
            (docs("class") | docs("lambda")) - (docs("import") | docs("yield")),
            "class lambda",
        ),
        ("NOT import AND class", docs("class") - docs("import"), "class"),
        # double negation through De Morgan: ~( ~class | ~lambda )
        (
            "NOT (NOT class OR NOT lambda)",
            (universe - ((universe - docs("class")) | (universe - docs("lambda")))),
            "class lambda",
        ),
        ("class AND zz_absent_token", set(), "class"),
        ("class OR zz_absent_token", docs("class"), "class"),
        # dotted word = AND of its subtokens
        ("class.import", docs("class") & docs("import"), "class import"),
    ]


def test_boolean_matches_set_algebra_oracle(tiny_index):
    from pisa_ray.scorer import score_boolean

    reader = IndexReader(tiny_index)
    nonempty = 0
    for text, want_set, pos_terms in _bool_cases(reader):
        got = score_boolean(reader, text, k=10)
        want = _bool_expected(reader, want_set, pos_terms, k=10)
        assert got == want, text
        nonempty += bool(want)
    assert nonempty >= 8  # the mix must actually exercise hits


def test_boolean_respects_doc_mask(tiny_index):
    from pisa_ray.scorer import score_boolean

    reader = IndexReader(tiny_index)
    rng = np.random.default_rng(7)
    for selectivity in (0.1, 0.6):
        mask = rng.random(reader.n_local) < selectivity
        for text, want_set, pos_terms in _bool_cases(reader):
            got = score_boolean(reader, text, k=10, doc_mask=mask)
            want = _bool_expected(reader, want_set, pos_terms, k=10, doc_mask=mask)
            assert got == want, (text, selectivity)


def test_boolean_pure_and_bit_identical_to_conjunctive(tiny_index):
    """An operator-free boolean query IS a conjunctive query: same
    docs, scores bit-identical (both use float64 sorted-term sums)."""
    from pisa_ray.scorer import score_boolean, score_conj

    reader = IndexReader(tiny_index)
    for text in ("class import", "def return self", "lambda yield while"):
        assert score_boolean(reader, text, k=10) == score_conj(reader, text, k=10)


def test_boolean_rejects_pure_negative_and_malformed(tiny_index):
    from pisa_ray.scorer import score_boolean

    reader = IndexReader(tiny_index)
    for bad in (
        "NOT class",
        "NOT (class OR import)",
        "NOT class AND NOT import",  # ~a & ~b is still a complement
        "class AND",
        "(class",
        "class )",
        "AND class",
        "class OR OR import",
        "",
    ):
        with pytest.raises(ValueError):
            score_boolean(reader, bad, k=10)


def test_boolean_actor_pool_and_memo(tiny_index):
    """method='bool' through the Dataset actor pool; the result memo
    must key on the RAW text (operators are load-bearing: 'a AND b'
    and 'a OR b' share a term set but not a result)."""
    from pisa_ray.scorer import BM25Scorer, query_index, score_boolean

    qt = pa.table(
        {
            "query_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "class AND zz_absent_token",
                    "class OR zz_absent_token",
                    "class AND zz_absent_token",  # memo hit
                    "(class OR lambda) AND NOT import",
                ]
            ),
        }
    )
    hits = (
        query_index(rd.from_arrow(qt), tiny_index, k=10, method="bool", concurrency=1)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    reader = IndexReader(tiny_index)
    for qid, text in zip(qt["query_id"].to_pylist(), qt["text"].to_pylist()):
        want = score_boolean(reader, text, k=10)
        sub = hits[hits["query_id"] == qid]
        got = list(zip(sub["doc_id"].astype("uint64"), sub["score"]))
        assert len(got) == len(want)
        for (gd, gs), (ed, es) in zip(want, got):
            assert gd == ed and abs(gs - es) <= 1e-12
    # AND and OR over the same term SET must differ (a term-canonical
    # memo key would collide them: empty AND vs non-empty OR)
    assert len(hits[hits["query_id"] == 0]) == 0
    assert len(hits[hits["query_id"] == 1]) == 10


def test_boolean_sharded_matches_broadcast(tiny_index):
    from pisa_ray.scorer import query_index, query_index_sharded

    qt = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["class AND NOT import", "(class OR lambda) NOT yield"]
            ),
        }
    )
    a = (
        query_index(rd.from_arrow(qt), tiny_index, k=10, method="bool", concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        query_index_sharded(
            rd.from_arrow(qt), tiny_index, shards=[{0, 1}, {2, 3}], k=10, method="bool"
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a[["query_id", "rank", "doc_id"]].equals(b[["query_id", "rank", "doc_id"]])
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)
    assert len(a) > 0


# --------------------------------------------------------------------------
# QLD (Dirichlet query likelihood) ranker
# --------------------------------------------------------------------------


def test_qld_rank_identity_vs_oracle(tiny_index, tiny_oracle):
    """score_qld == the naive Dirichlet oracle on every query shape
    (incl. OOV-only -> empty), scores equal to <= 1e-9."""
    from pisa_ray.scorer import score_qld

    reader = IndexReader(tiny_index)
    queries = make_queries(120)
    nonempty = 0
    for text in queries["text"].to_pylist():
        golden = tiny_oracle.score_query_qld(text, 10)
        _check_rank_identical(golden, score_qld(reader, text, 10))
        nonempty += bool(golden)
    assert nonempty > 50


def test_qld_ranks_differently_from_bm25_somewhere(tiny_index):
    """QLD is a genuinely different ranker: at least one query's top-10
    ordering differs from BM25's (guards against score_qld accidentally
    delegating to the BM25 kernel)."""
    from pisa_ray.scorer import score_qld

    reader = IndexReader(tiny_index)
    diff = 0
    for text in make_queries(120)["text"].to_pylist():
        a = [d for d, _ in score_taat(reader, text, 10)]
        b = [d for d, _ in score_qld(reader, text, 10)]
        diff += a != b
    assert diff > 0


def test_qld_respects_doc_mask(tiny_index):
    """Per-doc QLD scores are mask-independent, so the masked top-k must
    equal the unmasked full ranking filtered to allowed docs."""
    from pisa_ray.scorer import score_qld

    reader = IndexReader(tiny_index)
    mask = np.zeros(reader.n_local, dtype=bool)
    mask[::2] = True
    allowed = set(int(i) for i in reader.out_ids(reader.doc_sorted[mask]))
    for text in make_queries(40)["text"].to_pylist():
        full = score_qld(reader, text, k=reader.n_local)
        expected = [(d, s) for d, s in full if d in allowed][:10]
        got = score_qld(reader, text, 10, doc_mask=mask)
        assert got == expected


def test_qld_sharded_matches_broadcast(tiny_index):
    """Doc-sharded QLD merges to the broadcast pool's exact results —
    exercises the GLOBAL doc-length-penalty multiplier m (a shard
    holding zero postings for an indexed term must still count it)."""
    from pisa_ray.scorer import query_index, query_index_sharded

    q = make_queries(25)
    a = (
        query_index(rd.from_arrow(q), tiny_index, k=10, method="qld", concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        query_index_sharded(
            rd.from_arrow(q), tiny_index, shards=[{0, 1}, {2, 3}], k=10, method="qld"
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a[["query_id", "rank", "doc_id"]].equals(b[["query_id", "rank", "doc_id"]])
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)
    assert len(a) > 0


def test_qld_requires_cf_lexicon(tiny_index):
    """A pre-v5 index (no cf column) fails loudly, not wrongly."""
    from pisa_ray.scorer import score_qld

    reader = IndexReader(tiny_index)
    reader.cf = None
    reader._qld_cache.clear()
    term = next(iter(sorted(reader.df)))  # guaranteed in-vocabulary
    with pytest.raises(ValueError, match="cf"):
        score_qld(reader, term, 10)


def test_lexicon_cf_matches_tokenizer_totals(tiny_index, tiny_oracle):
    """The lexicon's collection frequencies equal the oracle's exact
    per-term token counts (build-side cf survives the fused shuffle)."""
    reader = IndexReader(tiny_index)
    assert reader.cf is not None
    assert len(reader.cf) == len(tiny_oracle.cf)
    for t, c in tiny_oracle.cf.items():
        assert int(reader.cf[t]) == int(c), t


# --------------------------------------------------------------------------
# MaxScore (essential/non-essential DAAT pruning)
# --------------------------------------------------------------------------


def test_maxscore_identical_to_taat(tiny_index):
    """score_maxscore is bit-identical to exhaustive TAAT on every
    query shape (incl. OOV-only -> empty): pruning is a performance
    choice only."""
    from pisa_ray.scorer import score_maxscore

    reader = IndexReader(tiny_index)
    for text in make_queries(150)["text"].to_pylist():
        assert score_maxscore(reader, text, 10) == score_taat(reader, text, 10)


def test_maxscore_actually_prunes(tiny_index):
    """On a rare+common term mix the essential set must shrink below
    the full term list and the candidate set below the postings union
    (guards against the kernel silently degenerating to TAAT-over-
    union)."""
    from pisa_ray.scorer import score_maxscore

    reader = IndexReader(tiny_index)
    by_df = sorted(reader.df.items(), key=lambda kv: int(kv[1]))
    common = by_df[-1][0]
    pruned = False
    for rare, df in by_df:
        if int(df) < 10 or rare == common:
            continue
        stats: dict = {}
        got = score_maxscore(reader, f"{rare} {common}", 5, stats=stats)
        assert got == score_taat(reader, f"{rare} {common}", 5)
        union = len(
            set(reader.term_contributions(rare)[2].tolist())
            | set(reader.term_contributions(common)[2].tolist())
        )
        if stats["n_essential"] < stats["n_terms"]:
            assert stats["n_candidates"] < union
            pruned = True
            break
    assert pruned, "no rare+common query pruned on the fixture corpus"


def test_maxscore_respects_doc_mask(tiny_index):
    """Masked top-k equals the unmasked full ranking filtered to
    allowed docs (θ may only be bootstrapped from mask-allowed docs)."""
    from pisa_ray.scorer import score_maxscore

    reader = IndexReader(tiny_index)
    mask = np.zeros(reader.n_local, dtype=bool)
    mask[::3] = True
    allowed = set(int(i) for i in reader.out_ids(reader.doc_sorted[mask]))
    for text in make_queries(40)["text"].to_pylist():
        full = score_maxscore(reader, text, k=reader.n_local)
        expected = [(d, s) for d, s in full if d in allowed][:10]
        assert score_maxscore(reader, text, 10, doc_mask=mask) == expected


def test_maxscore_sharded_matches_broadcast(tiny_index):
    """Doc-sharded MaxScore merges to the broadcast pool's exact
    results: upper bounds and θ are shard-local, pruning stays exact."""
    from pisa_ray.scorer import query_index, query_index_sharded

    q = make_queries(25)
    a = (
        query_index(
            rd.from_arrow(q), tiny_index, k=10, method="maxscore", concurrency=2
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        query_index_sharded(
            rd.from_arrow(q), tiny_index, shards=[{0, 1}, {2, 3}], k=10,
            method="maxscore",
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert a[["query_id", "rank", "doc_id"]].equals(b[["query_id", "rank", "doc_id"]])
    assert np.allclose(a["score"], b["score"], rtol=0, atol=0)
    assert len(a) > 0


# --------------------------------------------------------------------------
# faceted search (aggregation-over-search)
# --------------------------------------------------------------------------


def test_facet_counts_matches_bruteforce(tiny_index, tiny_corpus):
    """facet_counts == a per-query python brute force over the corpus
    for both modes (conj: ALL terms; any: >=1 term), null-free lang
    facet, including a query with an unindexed term (conj -> empty)."""
    from pisa_ray.scorer import facet_counts
    from pisa_ray.tokenizer import tokenize_py

    texts = tiny_corpus["content"].to_pylist()
    langs = tiny_corpus["lang"].to_pylist()
    tokens = [set(tokenize_py(t)) for t in texts]
    queries = [(0, texts[0].split()[0]), (1, " ".join(texts[1].split()[:2])),
               (2, "zz_absent_token"), (3, texts[2].split()[0] + " zz_absent_token")]
    for mode in ("conj", "any"):
        got = facet_counts(queries, tiny_index, "lang", mode=mode, concurrency=2)
        from collections import Counter

        want_rows = []
        for qid, q in queries:
            terms = set(tokenize_py(q))
            cnt = Counter()
            for toks, lang in zip(tokens, langs):
                ok = terms <= toks if mode == "conj" else bool(terms & toks)
                if ok:
                    cnt[lang] += 1
            for lang in sorted(cnt):
                want_rows.append((qid, lang, cnt[lang]))
        got_rows = list(got.itertuples(index=False, name=None))
        assert got_rows == want_rows, mode


def test_facet_counts_bad_mode(tiny_index):
    from pisa_ray.scorer import facet_counts

    with pytest.raises(ValueError, match="mode"):
        facet_counts([(0, "x")], tiny_index, "lang", mode="phrase")


def test_facet_counts_empty_queries(tiny_index):
    from pisa_ray.scorer import facet_counts

    out = facet_counts([], tiny_index, "lang")
    assert list(out.columns) == ["query_id", "lang", "n_docs"] and len(out) == 0


def test_suggest_completion(tiny_index, tiny_oracle):
    """reader.suggest == brute-force (df desc, term asc) over the
    oracle's exact df table, for several prefixes incl. empty/absent."""
    reader = IndexReader(tiny_index)
    vocab = sorted(tiny_oracle.df)
    prefixes = {t[:1] for t in vocab[:20]} | {vocab[0][:3], "zzz_absent", ""}
    for p in sorted(prefixes):
        want = sorted(
            ((t, int(d)) for t, d in tiny_oracle.df.items() if t.startswith(p)),
            key=lambda x: (-x[1], x[0]),
        )[:10]
        if not p:
            want = []
        assert reader.suggest(p, 10) == want, p


# --------------------------------------------------------------------------
# deep pagination (search_after)
# --------------------------------------------------------------------------


def test_search_after_pages_tile_the_full_ranking(tiny_index):
    """Concatenating search_after pages == one big top-k, exactly, for
    several kernels (pages never overlap or skip, incl. across exact
    score ties)."""
    from pisa_ray.scorer import score_after, score_maxscore, score_qld

    reader = IndexReader(tiny_index)
    page = 7
    for fn in (score_taat, score_qld, score_maxscore):
        for text in make_queries(25)["text"].to_pylist():
            full = fn(reader, text, reader.n_local)
            pages = fn(reader, text, page)
            got = list(pages)
            while pages and len(got) < len(full):
                cursor = (pages[-1][1], pages[-1][0])
                pages = score_after(reader, text, page, cursor, fn)
                got.extend(pages)
            assert got == full, (fn.__name__, text)


def test_search_after_through_query_index(tiny_index):
    """Cursor columns on the query table page through the actor pool:
    page 2 == rows k+1..2k of a double-size query."""
    from pisa_ray.scorer import query_index

    k = 5
    qt = make_queries(10)
    big = (
        query_index(rd.from_arrow(qt), tiny_index, k=2 * k, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
    )
    # build page-2 cursors from page 1 (the first k rows per query)
    page1 = big[big["rank"] <= k]
    cur = page1[page1["rank"] == k].set_index("query_id")
    qdf = qt.to_pandas()
    qdf = qdf[qdf["query_id"].isin(cur.index)].copy()
    qdf["after_score"] = cur.loc[qdf["query_id"], "score"].to_numpy()
    qdf["after_doc"] = cur.loc[qdf["query_id"], "doc_id"].to_numpy()
    got = (
        query_index(
            rd.from_arrow(pa.Table.from_pandas(qdf, preserve_index=False)),
            tiny_index, k=k, concurrency=2,
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    want = (
        big[(big["rank"] > k) & big["query_id"].isin(cur.index)]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert np.allclose(got["score"], want["score"], rtol=0, atol=0)


def test_empty_corpus_build_fails_loudly(tmp_path):
    """Zero-document corpora raise a clear error (not an obscure
    read_parquet path failure mid-pipeline)."""
    from pisa_ray.build import IndexConfig, build_index

    empty = pa.table(
        {"doc_id": pa.array([], type=pa.int64()), "text": pa.array([], type=pa.string())}
    )
    with pytest.raises(ValueError, match="zero tokenized rows"):
        build_index(
            empty, str(tmp_path / "idx"),
            IndexConfig(bucket_bits=1, term_parts=2, lineage_parts=1,
                        id_col="doc_id", key_cols=(), content_col="text",
                        meta_cols=()),
        )


def test_synonym_expansion(tiny_index):
    """Query-time synonyms: expansion terms join the query's term list
    (sum semantics, same as prefix/fuzzy expansion), map canonicalized
    through the index analyzer; scoring equals an explicitly expanded
    query; non-matching keys are inert."""
    import ray.data as rd

    from pisa_ray.scorer import IndexReader, query_index, score_taat

    r = IndexReader(tiny_index)
    # int() first: df values are uint64, unary minus on the numpy
    # scalar emits "overflow in scalar negative" (and wraps)
    terms = sorted(r.df, key=lambda t: -int(r.df[t]))
    a, b, c = terms[0], terms[1], terms[2]
    syn = {a: [b, c]}
    q = rd.from_items([{"query_id": 0, "text": a}])
    got = (
        query_index(q, tiny_index, k=10, concurrency=2, synonyms=syn)
        .to_pandas()
        .sort_values("rank")
    )
    want = score_taat(r, f"{a} {b} {c}", 10)
    assert [int(x) for x in got["doc_id"]] == [d for d, _ in want]
    assert [round(float(x), 9) for x in got["score"]] == [
        round(s, 9) for s, in [(s,) for _, s in want]
    ]
    # a synonym key absent from the query changes nothing
    got2 = (
        query_index(q, tiny_index, k=10, concurrency=2, synonyms={b: [c]})
        .to_pandas()
        .sort_values("rank")
    )
    plain = score_taat(r, a, 10)
    assert [int(x) for x in got2["doc_id"]] == [d for d, _ in plain]


def test_term_expander_wildcard_and_regex_vs_brute(tiny_oracle):
    import fnmatch
    import re

    from pisa_ray.scorer import TermExpander

    vocab = sorted(tiny_oracle.df)
    exp = TermExpander(dict(tiny_oracle.df), max_expand=len(vocab))
    pats = (
        [v[:2] + "*" for v in vocab[:10]]
        + [v[0] + "?" + v[2:] for v in vocab[:10] if len(v) > 2]
        + ["*" + v[-3:] for v in vocab[:5] if len(v) > 3]
        + ["*", "?", vocab[0], "zz_nothing*", ""]
    )
    for p in pats:
        want = sorted(t for t in vocab if fnmatch.fnmatchcase(t, p))
        assert exp.wildcard(p) == want, p
    # regex: anchored full-term match
    for rx in ["[a-f].*", ".*_[0-9]+", vocab[0], "nope$x["[:4]]:
        try:
            crx = re.compile(rx)
        except re.error:
            continue
        want = sorted(t for t in vocab if crx.fullmatch(t))
        assert exp.regex(rx) == want, rx
    assert exp.regex("") == []


def test_wildcard_query_rank_identical_to_expanded_oracle(tiny_index, tiny_oracle):
    import fnmatch

    import ray.data as _rd

    from pisa_ray.scorer import query_index

    vocab = sorted(tiny_oracle.df)
    base = vocab[len(vocab) // 3]
    pattern = None
    for n in range(len(base), 1, -1):  # infix glob with 2..64 matches
        pat = base[:n] + "*" if n < len(base) else base[: n - 1] + "?"
        expanded = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pat))
        if 1 < len(expanded) <= 64:
            pattern = pat
            break
    assert pattern, "fixture vocab has no wildcard expanding to 2..64 terms"
    hits = (
        query_index(
            _rd.from_items([{"query_id": 0, "text": pattern}]),
            tiny_index,
            k=10,
            concurrency=2,
            expand="wildcard",
        )
        .to_pandas()
        .sort_values("rank")
    )
    golden = tiny_oracle.score_query(" ".join(expanded), 10)
    assert len(hits) == len(golden)
    for (gd, gs), ed, es in zip(golden, hits["doc_id"], hits["score"]):
        assert gd == ed and abs(gs - es) <= 1e-9
    # non-wildcard tokens stay exact through the same mode
    from pisa_ray.scorer import BM25Scorer

    scorer = BM25Scorer(index_dir=tiny_index, k=10, expand="wildcard")
    assert scorer._query_terms(vocab[0]) == [vocab[0]]


def test_explain_score_bit_identical_to_taat(tiny_index, tiny_oracle):
    from pisa_ray.scorer import IndexReader, explain_score, score_taat
    from pisa_ray.tokenizer import tokenize_py

    reader = IndexReader(tiny_index)
    vocab = sorted(tiny_oracle.df)
    q = " ".join(vocab[:3]) + " zz_oov_term"
    hits = score_taat(reader, q, k=10)
    assert hits
    for did, score in hits:
        ex = explain_score(reader, q, did)
        assert ex["score"] == score  # bit-identical, not approx
        assert ex["doc_id"] == did
        matched = [r for r in ex["terms"] if r["matched"]]
        assert matched and ex["dl"] > 0
        # components recombine: sequential sum over ALL term rows
        t = 0.0
        for r in ex["terms"]:
            t += r["contribution"]
        assert t == score
        # tf rows match the oracle's per-doc term counts
        opos = int(np.searchsorted(tiny_oracle.doc_ids, np.uint64(did)))
        otf = tiny_oracle.tf[opos]
        for r in ex["terms"]:
            assert r["tf"] == int(otf.get(r["term"], 0)), r
            assert r["df"] == int(tiny_oracle.df.get(r["term"], 0))
        oov = [r for r in ex["terms"] if r["term"] == "zz_oov_term"]
        assert oov and not oov[0]["matched"] and oov[0]["contribution"] == 0.0
    # unknown document id
    import pytest as _pytest

    with _pytest.raises(KeyError):
        explain_score(reader, q, 10**15 + 7)


def test_explain_score_accepts_index_dir_and_deleted_doc(tiny_index, tiny_oracle, tmp_path):
    import shutil

    from pisa_ray.delete import delete_docs
    from pisa_ray.scorer import IndexReader, explain_score, score_taat

    vocab = sorted(tiny_oracle.df)
    q = vocab[0]
    reader = IndexReader(tiny_index)
    hits = score_taat(reader, q, k=3)
    did = hits[0][0]
    # path form == reader form
    a = explain_score(tiny_index, q, did)
    b = explain_score(reader, q, did)
    assert a == b
    # tombstoned doc raises ValueError
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(tiny_index, idx2)
    delete_docs(idx2, [did])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tombstoned"):
        explain_score(idx2, q, did)


@pytest.fixture(scope="module")
def hist_index(tmp_path_factory):
    """Small keys-mode index carrying a NUMERIC docmap column."""
    import pyarrow.compute as _pc

    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(120, n_partitions=2)
    corpus = corpus.append_column(
        "size_b", _pc.utf8_length(corpus["content"]).cast(pa.int64())
    )
    d = str(tmp_path_factory.mktemp("hidx"))
    build_index(
        corpus,
        d,
        IndexConfig(
            bucket_bits=1,
            term_parts=4,
            lineage_parts=1,
            meta_cols=("lang", "size_b"),
        ),
    )
    return d, corpus


def test_facet_histogram_matches_bruteforce(hist_index):
    from pisa_ray.scorer import facet_histogram
    from pisa_ray.tokenizer import tokenize_py

    d, corpus = hist_index
    texts = corpus["content"].to_pylist()
    sizes = [len(t) for t in texts]
    tokens = [set(tokenize_py(t)) for t in texts]
    edges = [0.0, 2000.0, 10000.0, 50000.0]
    queries = [
        (0, texts[0].split()[0]),
        (1, " ".join(texts[1].split()[:2])),
        (2, "zz_absent_token"),
    ]
    for mode in ("conj", "any"):
        got = facet_histogram(queries, d, "size_b", edges, mode=mode, concurrency=2)
        want = []
        for qid, q in queries:
            terms = set(tokenize_py(q))
            import numpy as _np

            cnt = _np.zeros(len(edges) - 1, dtype=int)
            for toks, sz in zip(tokens, sizes):
                ok = terms <= toks if mode == "conj" else bool(terms & toks)
                if not ok or sz < edges[0] or sz >= edges[-1]:
                    continue
                cnt[_np.searchsorted(edges, sz, side="right") - 1] += 1
            for b in _np.flatnonzero(cnt):
                want.append((qid, edges[b], edges[b + 1], int(cnt[b])))
        got_rows = list(got.itertuples(index=False, name=None))
        assert got_rows == want, mode


def test_facet_histogram_boundary_and_rails(hist_index):
    from pisa_ray.scorer import facet_histogram

    d, corpus = hist_index
    sizes = [len(t) for t in corpus["content"].to_pylist()]
    # boundary: an edge exactly at a document's size puts it in the
    # RIGHT (left-closed) bin; max edge excludes
    s = sizes[0]
    term = corpus["content"].to_pylist()[0].split()[0]
    got = facet_histogram(
        [(0, term)], d, "size_b", [float(s), float(s) + 1.0], concurrency=1
    )
    assert (got["n_docs"] >= 1).all() and (got["lo"] == float(s)).all()
    with pytest.raises(ValueError, match="mode"):
        facet_histogram([(0, "x")], d, "size_b", [0, 1], mode="bad")
    with pytest.raises(ValueError, match="edges"):
        facet_histogram([(0, "x")], d, "size_b", [1.0])
    with pytest.raises(ValueError, match="edges"):
        facet_histogram([(0, "x")], d, "size_b", [2.0, 1.0])
    out = facet_histogram([], d, "size_b", [0.0, 1.0])
    assert list(out.columns) == ["query_id", "lo", "hi", "n_docs"] and len(out) == 0


def test_did_you_mean(tiny_index, tiny_oracle):
    from pisa_ray.scorer import IndexReader, did_you_mean

    reader = IndexReader(tiny_index)
    vocab = sorted(tiny_oracle.df, key=lambda t: (-len(t), t))
    term = vocab[0]
    typo = term[:-1] + ("x" if term[-1] != "x" else "y") + term[-1]
    got = did_you_mean(reader, f"{typo} {vocab[1]}")
    assert got is not None and got.split()[1] == reader.tokenize(vocab[1])[0]
    # the correction is term's ED1 neighborhood's highest-df member
    exp = reader.term_expander()
    cand = exp.fuzzy1(reader.tokenize(typo)[0])
    assert got.split()[0] == min(cand, key=lambda t: (-int(reader.df[t]), t))
    # fully in-vocabulary query -> no suggestion
    assert did_you_mean(reader, f"{vocab[0]} {vocab[1]}") is None
    # hopeless token (no ED1 neighbor) passes through; if it is the
    # only OOV token, no suggestion either
    assert did_you_mean(reader, "zzzzqqqqxxxx") is None
    # path form works
    assert did_you_mean(tiny_index, f"{typo}") == got.split()[0]


def test_serve_expand_wildcard_matches_dataset_path(tiny_index):
    from pisa_ray import BM25Service, query_index

    qt = pa.table(
        {"query_id": pa.array([0, 1], pa.int64()),
         "text": pa.array(["var_1?2", "zz_nothing*"])}
    )
    svc = BM25Service(tiny_index, k=10, num_actors=1, expand="wildcard")
    try:
        a = (
            svc.query(qt, batch_size=8)
            .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
    finally:
        svc.shutdown()
    b = (
        query_index(
            rd.from_arrow(qt), tiny_index, k=10, concurrency=1,
            expand="wildcard",
        )
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # var_1?2 globs hit real vocabulary


def test_build_over_ndjson_directory(tmp_path):
    """A directory of .ndjson files is a supported source (the glob
    omitted the extension _read_files already handled — review
    finding); an empty directory fails loudly, not with IndexError."""
    import json as _json

    import pytest as _pytest

    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.scorer import IndexReader

    src = tmp_path / "nd"
    src.mkdir()
    with open(src / "part0.ndjson", "w") as f:
        for i in range(20):
            f.write(_json.dumps(
                {"doc_id": i, "text": f"alpha beta doc{i} gamma"}) + "\n")
    d = str(tmp_path / "idx")
    build_index(str(src), d, IndexConfig(
        id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
        bucket_bits=1, term_parts=4, lineage_parts=1))
    r = IndexReader(d)
    assert r.n_docs == 20 and int(r.df.get("alpha", 0)) == 20

    empty = tmp_path / "empty"
    empty.mkdir()
    with _pytest.raises(FileNotFoundError, match="no supported corpus files"):
        build_index(str(empty), str(tmp_path / "idx2"), IndexConfig(
            id_col="doc_id", key_cols=(), content_col="text", meta_cols=()))
