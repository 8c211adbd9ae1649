"""Bounded-memory decontamination via the shared Bloom component.

``pipelines/bloom.py`` (the join prefilter's distributed Bloom build)
is reused as the contamination reference set; these tests pin the
decontaminate-side contract. The filter's own guarantees (no false
negatives, measured fp rate, string routing) are covered in
test_pipelines' bloom/join tests.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _corpora():
    bench = rd.from_items(
        [
            {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog today"},
            {"doc_id": 1, "text": "pack my box with five dozen liquor jugs right now"},
        ]
    )
    train = rd.from_items(
        [
            # contains bench doc 0's full text -> contaminated
            {"doc_id": 100, "text": "prefix words the quick brown fox jumps over the lazy dog today suffix"},
            # clean
            {"doc_id": 101, "text": "completely unrelated training document about graph algorithms and parquet files"},
            # contains an 8-gram from bench doc 1
            {"doc_id": 102, "text": "pack my box with five dozen liquor jugs he said"},
        ]
    )
    return bench, train


def test_decontaminate_bloom_matches_exact_on_planted():
    from pisa_ray.pipelines.bloom import BloomFilter
    from pisa_ray.pipelines.dedup import (
        benchmark_kgram_bloom,
        benchmark_kgrams,
        decontaminate,
    )

    bench, train = _corpora()
    exact = benchmark_kgrams(bench, k=8)
    bf = benchmark_kgram_bloom(bench, k=8, fp_rate=1e-6)
    assert isinstance(bf, BloomFilter)
    out_exact = (
        decontaminate(train, exact, k=8).to_pandas().set_index("doc_id")
    )
    out_bloom = (
        decontaminate(train, bf, k=8).to_pandas().set_index("doc_id")
    )
    # planted overlaps are flagged by BOTH paths (no false negatives)
    for did in (100, 102):
        assert bool(out_exact.loc[did, "contaminated"])
        assert bool(out_bloom.loc[did, "contaminated"])
    assert not bool(out_exact.loc[101, "contaminated"])
    # at fp=1e-6 over a handful of grams, the bloom path agrees exactly
    pd.testing.assert_frame_equal(out_exact, out_bloom)


def test_benchmark_kgram_bloom_hll_sizing_and_membership():
    """Auto capacity (HLL * 1.2) yields a filter containing every
    benchmark gram; a disjoint probe set stays below a loose fp bound."""
    import ray

    from pisa_ray.pipelines.dedup import _kgram_strings, benchmark_kgram_bloom

    texts = [
        " ".join(f"tok{j}_{i}" for j in range(40)) for i in range(50)
    ]
    bench = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(4)
    bf = benchmark_kgram_bloom(bench, k=5, fp_rate=1e-3)
    grams, _ = _kgram_strings(pa.array(texts), 5)
    hits = bf.contains(pa.table({"g": grams}), "g")
    assert hits.all()  # structural: no false negatives
    absent = pa.array([f"zz absent gram number {i} x" for i in range(5000)])
    fp = float(bf.contains(pa.table({"g": absent}), "g").mean())
    assert fp <= 0.01  # 10x slack over the 1e-3 target


def test_benchmark_kgram_bloom_explicit_capacity_deterministic():
    import ray

    from pisa_ray.pipelines.dedup import benchmark_kgram_bloom

    bench = rd.from_items(
        [{"doc_id": i, "text": f"alpha beta gamma delta epsilon zeta{i} eta theta"}
         for i in range(20)]
    )
    a = benchmark_kgram_bloom(bench.repartition(1), k=4, capacity=4096)
    b = benchmark_kgram_bloom(bench.repartition(8), k=4, capacity=4096)
    wa, wb = ray.get(a.bits_ref), ray.get(b.bits_ref)
    assert (wa == wb).all()
    assert a.n_bits == b.n_bits and a.n_hash == b.n_hash


def test_keep_best_per_cluster_end_to_end():
    """Full fuzzy-dedup recipe: jaccard pairs -> connected components
    -> keep the highest-quality doc per cluster + all singletons."""
    from pisa_ray.pipelines.dedup import keep_best_per_cluster
    from pisa_ray.pipelines.graph import connected_components

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3, 4, 5, 6], dtype="int64"),
            "text": [
                base,                       # cluster A (template)
                base + " minor edit",       # cluster A, higher score
                base + " another tweak",    # cluster A
                "completely different content about graphs and rays",
                "yet another unrelated document on parquet files",
                base.replace("quick", "rapid"),  # cluster A (near)
            ],
            "score": [0.1, 0.9, 0.5, 0.3, 0.2, 0.4],
        }
    )
    ds = rd.from_pandas(docs)
    from pisa_ray.pipelines.dedup import jaccard_pairs

    pairs = jaccard_pairs(ds, threshold=0.5, shingle_k=3)
    comp = connected_components(pairs, src_col="id_a", dst_col="id_b")
    comp_pdf = comp.to_pandas()
    clustered = set(comp_pdf["id"])
    assert {1, 2, 3}.issubset(clustered) and 4 not in clustered
    out = (
        keep_best_per_cluster(ds, comp, "score")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    kept = set(out["doc_id"])
    # exactly one survivor per cluster: doc 2 (score 0.9) wins its
    # cluster; singletons 4 and 5 always survive
    assert 2 in kept and {4, 5}.issubset(kept)
    assert kept.isdisjoint({1, 3} if 6 in clustered else {1, 3})
    n_clusters = comp_pdf["comp_id"].nunique()
    assert len(kept) == n_clusters + (6 - len(clustered))
    # lower-is-better flips the survivor
    out2 = keep_best_per_cluster(ds, comp, "score", higher_is_better=False)
    kept2 = set(out2.to_pandas()["doc_id"])
    assert 1 in kept2 and 2 not in kept2
    # schema: original columns preserved, helper columns gone
    assert set(out.columns) == {"doc_id", "text", "score"}
