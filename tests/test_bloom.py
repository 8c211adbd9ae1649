"""BloomFilter sketch + bounded-memory decontamination path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def test_bloom_no_false_negatives_and_fp_rate():
    from pisa_ray.pipelines.sketch import BloomFilter, bloom_build

    n = 5000
    members = [f"member_{i:05d}" for i in range(n)]
    ds = rd.from_pandas(pd.DataFrame({"v": members})).repartition(8)
    bf = bloom_build(ds, "v", capacity=n, fp_rate=0.01)
    # zero false negatives — the structural guarantee
    assert bf.contains(pa.array(members)).all()
    # false positives on a disjoint probe set stay near the target
    probes = pa.array([f"absent_{i:05d}" for i in range(20000)])
    fp = float(bf.contains(probes).mean())
    assert fp <= 0.03  # 3x the 1% target (binomial slack)
    assert 0.0 < bf.fp_estimate() <= 0.03
    # sizing: standard formulas
    proto = BloomFilter.sized(1000, 0.01)
    assert proto.k == round(proto.n_bits / 1000 * np.log(2)) or proto.k >= 1


def test_bloom_deterministic_at_any_parallelism():
    from pisa_ray.pipelines.sketch import bloom_build

    vals = pd.DataFrame({"v": [f"x{i}" for i in range(3000)]})
    a = bloom_build(rd.from_pandas(vals).repartition(1), "v", 3000, 0.01)
    b = bloom_build(rd.from_pandas(vals).repartition(16), "v", 3000, 0.01)
    assert (a.words == b.words).all()


def test_bloom_null_and_int_columns():
    from pisa_ray.pipelines.sketch import bloom_build

    df = pd.DataFrame({"v": pd.array([1, 2, None, 4], dtype="Int64")})
    bf = bloom_build(rd.from_pandas(df), "v", capacity=64, fp_rate=0.01)
    assert bf.contains(pa.array([1, 2, 4], type=pa.int64())).all()


def test_bloom_rails():
    from pisa_ray.pipelines.sketch import BloomFilter

    with pytest.raises(ValueError, match="n_bits"):
        BloomFilter(32, 2)
    with pytest.raises(ValueError, match="k must"):
        BloomFilter(128, 0)
    with pytest.raises(ValueError, match="capacity"):
        BloomFilter.sized(0, 0.01)
    with pytest.raises(ValueError, match="fp_rate"):
        BloomFilter.sized(100, 1.5)


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
    from pisa_ray.pipelines.dedup import (
        benchmark_kgram_bloom,
        benchmark_kgrams,
        decontaminate,
    )

    bench, train = _corpora()
    exact = benchmark_kgrams(bench, k=8)
    bf = benchmark_kgram_bloom(bench, k=8, fp_rate=1e-6)
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


def test_bloom_build_driver_state_is_filter_sized():
    """The build streams packed words; each block partial is one row of
    n_bits/8 bytes — assert the partial schema, not just the result."""
    from pisa_ray.pipelines.sketch import BloomFilter, bloom_build

    ds = rd.from_items([{"v": f"t{i}"} for i in range(100)]).repartition(4)
    bf = bloom_build(ds, "v", capacity=100, fp_rate=0.01)
    assert isinstance(bf, BloomFilter)
    assert bf.words.nbytes == bf.n_bits // 8
    assert bf.contains(pa.array([f"t{i}" for i in range(100)])).all()
