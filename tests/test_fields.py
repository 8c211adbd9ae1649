"""Multi-field weighted search (pipelines/fields.py): content + path
indexes over one corpus, weighted-sum BM25 merge."""

import collections
import random

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    rng = random.Random(9)
    words = ["merge", "sort", "parse", "json", "tree", "node", "hash", "map"]
    dirs = ["core", "util", "parser", "index", "net"]
    rows = []
    for i in range(1, 201):
        text = " ".join(rng.choice(words) for _ in range(rng.randrange(5, 30)))
        path = f"src/{rng.choice(dirs)}/{rng.choice(words)}_{i}.py"
        rows.append((i, text, path))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "path": pa.array([r[2] for r in rows]),
        }
    )


@pytest.fixture(scope="module")
def field_indexes(tmp_path_factory):
    from pisa_ray.build import IndexConfig, build_index

    corpus = _corpus()
    base = dict(
        id_col="doc_id", key_cols=(), meta_cols=(),
        bucket_bits=2, term_parts=8, lineage_parts=1,
    )
    d_text = str(tmp_path_factory.mktemp("f_text"))
    d_path = str(tmp_path_factory.mktemp("f_path"))
    build_index(corpus, d_text, IndexConfig(content_col="text", **base))
    build_index(corpus, d_path, IndexConfig(content_col="path", **base))
    return d_text, d_path, corpus


def _naive(readers_weights, text, k):
    """Independent merge: score each field with score_taat (full), sum
    in plain dicts."""
    from pisa_ray.scorer import score_taat

    acc = collections.defaultdict(float)
    for r, w in readers_weights:
        for d, s in score_taat(r, text, r.n_docs):
            acc[d] += w * s
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_multifield_matches_naive_merge(field_indexes):
    from pisa_ray.pipelines.fields import score_multifield
    from pisa_ray.scorer import IndexReader

    d_text, d_path, _ = field_indexes
    rw = [(IndexReader(d_text), 1.0), (IndexReader(d_path), 2.5)]
    for q in ("merge sort", "parser", "json core", "tree"):
        got = score_multifield(rw, q, k=10)
        ref = _naive(rw, q, 10)
        assert [d for d, _ in got] == [d for d, _ in ref], q
        assert np.allclose([s for _, s in got], [s for _, s in ref])
        assert got, q


def test_multifield_path_boost_changes_ranking(field_indexes):
    """A doc whose PATH contains the query term outranks text-only
    matches once the path weight dominates."""
    from pisa_ray.pipelines.fields import score_multifield
    from pisa_ray.scorer import IndexReader, score_taat

    d_text, d_path, corpus = field_indexes
    rt, rp = IndexReader(d_text), IndexReader(d_path)
    top_path = {d for d, _ in score_taat(rp, "parser", 5)}
    assert top_path  # dirs include "parser"
    boosted = score_multifield([(rt, 1.0), (rp, 10.0)], "parser", k=5)
    assert top_path & {d for d, _ in boosted}


def test_multifield_zero_weight_degenerates(field_indexes):
    from pisa_ray.pipelines.fields import score_multifield
    from pisa_ray.scorer import IndexReader, score_taat

    d_text, d_path, _ = field_indexes
    rt, rp = IndexReader(d_text), IndexReader(d_path)
    got = score_multifield([(rt, 1.0), (rp, 0.0)], "merge sort", k=10)
    taat = score_taat(rt, "merge sort", 10)
    assert [d for d, _ in got] == [d for d, _ in taat]
    assert np.allclose([s for _, s in got], [s for _, s in taat])


def test_multifield_batch_and_determinism(field_indexes):
    from pisa_ray.pipelines.fields import multifield_search

    d_text, d_path, _ = field_indexes
    qs = [(0, "merge sort"), (1, "parser"), (2, "zzz_absent")]
    a = multifield_search(qs, [(d_text, 1.0), (d_path, 2.0)], k=5, concurrency=1)
    b = multifield_search(qs, [(d_text, 1.0), (d_path, 2.0)], k=5, concurrency=3)
    assert a.values.tolist() == b.values.tolist()
    assert set(a[a["query_id"] == 0]["rank"]) == {1, 2, 3, 4, 5}
    assert (a["query_id"] == 2).sum() == 0  # OOV everywhere -> no rows


def test_multifield_id_mode_rail(field_indexes, tiny_index):
    from pisa_ray.pipelines.fields import multifield_search

    d_text, _, _ = field_indexes
    with pytest.raises(ValueError, match="id_mode"):
        multifield_search([(0, "merge")], [(d_text, 1.0), (tiny_index, 1.0)], k=5)


def test_multifield_keys_mode_shared_id_domain(tmp_path):
    """Keys-derived ids: two field indexes over the same key columns
    share the id domain by construction; the merged ranking's ids are
    the raw uint64 engine ids, tie-broken ascending."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.fields import multifield_search
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(120, n_partitions=2)
    base = dict(bucket_bits=2, term_parts=8, lineage_parts=1)
    d_a = str(tmp_path / "ka")
    d_b = str(tmp_path / "kb")
    build_index(corpus, d_a, IndexConfig(content_col="content", **base))
    build_index(corpus, d_b, IndexConfig(content_col="path", **base))
    from pisa_ray.scorer import IndexReader

    term = sorted(IndexReader(d_a).df)[0]
    out = multifield_search([(0, term)], [(d_a, 1.0), (d_b, 1.0)], k=5)
    assert len(out) > 0
    assert out["doc_id"].dtype == np.uint64


def _bm25f_oracle(corpus, fields, text, k, k1=0.9):
    """Pure-python BM25F over the RAW corpus texts: per-field tf/len
    from tokenize_py, blend in field order, idf over the exact union
    df — independent of every index/reader structure."""
    import math

    from pisa_ray.tokenizer import tokenize_py

    names = [f[0] for f in fields]
    toks = {
        f: [tokenize_py(str(v), "simple") for v in corpus[f].to_pylist()]
        for f in names
    }
    ids = corpus["doc_id"].to_pylist()
    n = len(ids)
    avg = {f: sum(len(t) for t in toks[f]) / n for f in names}
    terms = sorted(set(tokenize_py(text, "simple")))
    acc = collections.defaultdict(float)
    for t in terms:
        blend = collections.defaultdict(float)
        union = set()
        for f, w, b in fields:
            for i, dt in enumerate(toks[f]):
                tf = dt.count(t)
                if tf:
                    union.add(ids[i])
                    dl = len(dt)
                    blend[ids[i]] += w * (tf / ((1.0 - b) + b * dl / avg[f]))
        if not union:
            continue
        df = len(union)
        idf = math.log1p((n - df + 0.5) / (df + 0.5))
        for d, tb in blend.items():
            acc[d] += idf * tb / (k1 + tb)
    return sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_bm25f_matches_python_oracle(field_indexes):
    """TRUE BM25F (blend before saturation) vs a raw-text oracle —
    and it must DIFFER from the weighted-sum composition on at least
    one query (else the blend isn't really happening pre-saturation)."""
    from pisa_ray.pipelines.fields import score_bm25f, score_multifield
    from pisa_ray.scorer import IndexReader

    d_text, d_path, corpus = field_indexes
    rt, rp = IndexReader(d_text), IndexReader(d_path)
    fields = [("text", 1.0, 0.4), ("path", 2.0, 0.75)]
    readers = [(rt, 1.0, 0.4), (rp, 2.0, 0.75)]
    # oracle avgdl must match the INDEX's stored avgdl exactly
    differs = False
    for q in ("merge sort", "parser", "json core", "tree node hash"):
        got = score_bm25f(readers, q, k=10)
        ref = _bm25f_oracle(corpus, fields, q, k=10)
        assert [d for d, _ in got] == [d for d, _ in ref], q
        assert np.allclose(
            [s for _, s in got], [s for _, s in ref], rtol=0, atol=1e-9
        ), q
        ws = score_multifield([(rt, 1.0), (rp, 2.0)], q, k=10)
        if [d for d, _ in got] != [d for d, _ in ws] or not np.allclose(
            [s for _, s in got], [s for _, s in ws]
        ):
            differs = True
    assert differs
    # zero-weight fields contribute NO tf but still count toward the
    # union df (BM25F's df is over the whole fielded document)
    z_fields = [("text", 1.0, 0.4), ("path", 0.0, 0.75)]
    z_readers = [(rt, 1.0, 0.4), (rp, 0.0, 0.75)]
    for q in ("merge sort", "parser"):
        got = score_bm25f(z_readers, q, k=10)
        ref = _bm25f_oracle(corpus, z_fields, q, k=10)
        assert [d for d, _ in got] == [d for d, _ in ref], q
        assert np.allclose(
            [s for _, s in got], [s for _, s in ref], rtol=0, atol=1e-9
        ), q


def test_bm25f_search_batch_and_rails(field_indexes):
    from pisa_ray.pipelines.fields import bm25f_search, score_bm25f
    from pisa_ray.scorer import IndexReader

    d_text, d_path, _ = field_indexes
    queries = [(0, "merge sort"), (1, "parser"), (2, "json core")]
    df = bm25f_search(
        queries, [(d_text, 1.0, 0.4), (d_path, 2.0, 0.75)], k=5,
        concurrency=2,
    )
    readers = [
        (IndexReader(d_text), 1.0, 0.4), (IndexReader(d_path), 2.0, 0.75)
    ]
    for qid, text in queries:
        ref = score_bm25f(readers, text, k=5)
        sub = df[df["query_id"] == qid]
        assert sub["doc_id"].tolist() == [d for d, _ in ref], text
        assert np.allclose(sub["score"].to_numpy(), [s for _, s in ref])
    # analyzer-mismatch rail
    import pytest as _pytest

    class _Fake:
        analyzer = "code"
        n_docs = readers[0][0].n_docs
        id_mode = "int"

    with _pytest.raises(ValueError, match="analyzer"):
        score_bm25f([readers[0], (_Fake(), 1.0, 0.4)], "merge")
