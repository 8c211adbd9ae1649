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
