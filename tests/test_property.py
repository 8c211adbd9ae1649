"""Property-style end-to-end conformance: random tiny corpora through
the FULL distributed build + both scorers must match the oracle,
including degenerate shapes (exact ties everywhere, empty docs,
duplicate texts, single-doc corpora)."""

import numpy as np
import pyarrow as pa
import pytest

from pisa_ray.build import IndexConfig, build_index
from pisa_ray.docids import doc_ids_from_keys
from pisa_ray.oracle import OracleIndex
from pisa_ray.scorer import IndexReader, score_bmw, score_taat

CFG = IndexConfig(bucket_bits=1, term_parts=4, lineage_parts=1)


def _corpus(texts):
    n = len(texts)
    return pa.table(
        {
            "repo": pa.array([f"r{i % 3}" for i in range(n)]),
            "path": pa.array([f"p{i}" for i in range(n)]),
            "commit": pa.array([f"c{i}" for i in range(n)]),
            "lang": pa.array(["x"] * n),
            "content": pa.array(texts, type=pa.large_string()),
        }
    )


def _check(tmpdir, texts, queries):
    corpus = _corpus(texts)
    build_index(corpus, tmpdir, CFG)
    reader = IndexReader(tmpdir)
    ids = doc_ids_from_keys(corpus["repo"], corpus["path"], corpus["commit"])
    oracle = OracleIndex(ids, texts)
    for q in queries:
        golden = oracle.score_query(q, 10)
        got = score_taat(reader, q, 10)
        assert [g[0] for g in golden] == [e[0] for e in got], q
        assert all(abs(g[1] - e[1]) <= 1e-9 for g, e in zip(golden, got)), q
        assert score_bmw(reader, q, 10) == got, q


def test_all_identical_docs_tie_break(tmp_path):
    """Every doc scores exactly equal -> pure doc_id-order ties."""
    _check(
        str(tmp_path / "i"),
        ["alpha beta gamma"] * 25,
        ["alpha", "beta gamma", "alpha alpha beta"],
    )


def test_empty_and_mixed_docs(tmp_path):
    texts = ["", "  ", "solo", "alpha beta", "", "alpha alpha alpha", "beta"]
    _check(str(tmp_path / "e"), texts, ["alpha", "beta", "solo", "missing"])


def test_single_doc_corpus(tmp_path):
    _check(str(tmp_path / "s"), ["just one document here"], ["one", "nope"])


def test_all_empty_corpus(tmp_path):
    """Zero tokens anywhere: build succeeds, every query is empty."""
    d = str(tmp_path / "z")
    build_index(_corpus(["", "  ", "\t"]), d, CFG)
    reader = IndexReader(d)
    assert reader.n_docs == 3 and reader.avgdl == 0.0
    assert score_taat(reader, "anything", 10) == []
    assert score_bmw(reader, "anything", 10) == []


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_small_corpora(tmp_path, seed):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> heavy collisions
    n = int(rng.integers(5, 35))
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(n)
    ]
    # force some duplicate texts
    if n > 4:
        texts[1] = texts[0]
        texts[3] = texts[2]
    queries = [
        " ".join(rng.choice(vocab + ["zz_oov"], size=int(rng.integers(1, 4))))
        for _ in range(8)
    ]
    _check(str(tmp_path / f"r{seed}"), texts, queries)


def test_position_space_rank_identity_and_smaller(tmp_path):
    """posting_space='position' must be rank-identical to docid mode
    AND materially smaller (gaps ~N/df instead of ~2^64/df)."""
    import json as _json
    import os as _os

    from pisa_ray.synth import make_corpus, make_queries

    corpus = make_corpus(300, n_partitions=2)
    qs = make_queries(60)
    readers = {}
    sizes = {}
    for mode in ("docid", "position"):
        d = str(tmp_path / mode)
        build_index(
            corpus,
            d,
            IndexConfig(
                bucket_bits=2, term_parts=8, lineage_parts=1, posting_space=mode
            ),
        )
        readers[mode] = IndexReader(d)
        m = _json.load(open(_os.path.join(d, "manifest.json")))["index_metrics"]
        sizes[mode] = m["doc_blob_bytes"] + m["tf_blob_bytes"]
    for text in qs["text"].to_pylist():
        a = score_taat(readers["docid"], text, 10)
        b = score_taat(readers["position"], text, 10)
        assert a == b, text
        assert score_bmw(readers["position"], text, 10) == b, text
    assert sizes["position"] < 0.45 * sizes["docid"], sizes


def test_position_space_parallelism_invariance(tmp_path):
    """The per-bucket distributed rank map must yield identical
    position-space results at different bucket/partition configs (the
    sandbox analog of two cluster sizes) — and it never materializes
    the full id array on the driver (ranks come from per-bucket Ray
    tasks; see build._bucket_rank_refs)."""
    from pisa_ray.synth import make_corpus, make_queries

    corpus = make_corpus(260, n_partitions=3)
    qs = make_queries(40)
    results = []
    for i, cfg in enumerate(
        [
            IndexConfig(bucket_bits=0, term_parts=2, lineage_parts=1,
                        posting_space="position"),
            IndexConfig(bucket_bits=3, term_parts=16, lineage_parts=2,
                        tokenize_batch_size=64, posting_space="position",
                        per_bucket_merge=False),
        ]
    ):
        d = str(tmp_path / f"pidx{i}")
        build_index(corpus, d, cfg)
        reader = IndexReader(d)
        results.append(
            [score_taat(reader, t, 10) for t in qs["text"].to_pylist()]
        )
    assert results[0] == results[1]
