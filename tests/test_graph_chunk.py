"""Connected components (star contraction) and document chunking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _uf_oracle(edges):
    """Tiny union-find: id -> min reachable id. Covers every id that
    appears in the edge list, INCLUDING nodes whose only edges are
    self-loops (they label as singletons) — the operator contract."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            find(a)  # node enters the id universe, no merge
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _cc(edges, nblocks=1):
    from pisa_ray.pipelines.graph import connected_components

    df = pd.DataFrame(edges, columns=["id_a", "id_b"])
    out = (
        connected_components(rd.from_pandas(df).repartition(nblocks))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    return dict(zip(out["id"], out["comp_id"]))


def test_cc_matches_union_find_on_random_graph():
    rng = np.random.default_rng(11)
    # several medium components + noise edges inside them
    edges = []
    for base in range(0, 1000, 100):
        nodes = base + rng.permutation(60)[:40]
        edges += [
            (int(nodes[i]), int(nodes[rng.integers(0, i + 1)]))
            for i in range(1, len(nodes))
        ]
    oracle = _uf_oracle(edges)
    assert _cc(edges) == oracle


def test_cc_parallelism_invariant_and_chain():
    # worst-case diameter: one long path, plus a 2-cycle and a clique
    edges = [(i, i + 1) for i in range(64)]
    edges += [(200, 201), (201, 200)]
    edges += [(a, b) for a in range(300, 305) for b in range(300, a)]
    oracle = _uf_oracle(edges)
    r1 = _cc(edges, nblocks=1)
    r7 = _cc(edges, nblocks=7)
    assert r1 == r7 == oracle
    assert all(v == 0 for k, v in r1.items() if k <= 64)


def test_cc_empty_and_self_loops():
    from pisa_ray.pipelines.graph import connected_components

    empty = rd.from_pandas(pd.DataFrame({"id_a": [], "id_b": []}))
    assert connected_components(empty).count() == 0
    # a self-loop-only node (5) labels as its own singleton; a node
    # with both a self loop and a proper edge (2) takes the component
    # label, not the singleton one
    assert _cc([(5, 5), (1, 2), (2, 2)]) == {1: 1, 2: 1, 5: 5}
    # an input of ONLY self loops emits one singleton row per node
    only_self = connected_components(
        rd.from_pandas(pd.DataFrame({"id_a": [3, 4], "id_b": [3, 4]}))
    )
    df = only_self.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df["id"]) == [3, 4]
    assert list(df["comp_id"]) == [3, 4]
    assert set(only_self.schema().names) == {"id", "comp_id"}


def _chunk_oracle(texts, ids, max_tokens, overlap):
    import re

    stride = max_tokens - overlap
    rows = []
    for did, t in zip(ids, texts):
        toks = [w for w in re.split("[^a-z0-9_]+", t.lower()) if w]
        n = len(toks)
        for ci, st in enumerate(range(0, max(n - overlap, 1), stride)):
            sel = toks[st : st + max_tokens]
            rows.append((did, ci, len(sel), " ".join(sel)))
    return pd.DataFrame(
        rows, columns=["doc_id", "chunk_id", "n_tokens", "chunk_text"]
    )


@pytest.mark.parametrize("nblocks", [1, 5])
def test_chunk_documents_vs_python_oracle(nblocks):
    from pisa_ray.pipelines.text import chunk_documents

    texts = [
        " ".join(f"w{i}" for i in range(37)),
        "",
        "one",
        " ".join(f"t{i % 7}" for i in range(100)),
        "Tabs\tand, punct; split!  ok",
    ]
    df = pd.DataFrame({"doc_id": [10, 11, 12, 13, 14], "text": texts})
    got = (
        chunk_documents(
            rd.from_pandas(df).repartition(nblocks), max_tokens=16, overlap=4
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = _chunk_oracle(texts, df["doc_id"], 16, 4)
    pd.testing.assert_frame_equal(
        got.astype({"chunk_id": "int64", "n_tokens": "int64"}), want
    )
    # coverage invariants: first chunk starts at token 0, consecutive
    # chunks overlap by exactly `overlap` tokens when full
    full = got[got.n_tokens == 16]
    assert (full.groupby("doc_id").size() >= 1).all()


def test_chunk_documents_real_docs_cover_all_tokens():
    from pisa_ray.pipelines.text import chunk_documents, token_stats

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    ch = chunk_documents(docs, max_tokens=64, overlap=16).to_pandas()
    nt = token_stats(docs).to_pandas().set_index("doc_id")["n_tokens"]
    stride = 48
    for did, grp in ch.groupby("doc_id"):
        n = int(nt[did])
        k = len(grp)
        # expected chunk count and last-chunk length
        assert k == (max(n - 16, 1) + stride - 1) // stride
        last = grp.sort_values("chunk_id").iloc[-1]
        assert last["n_tokens"] == min(64, n - (k - 1) * stride)
    with pytest.raises(ValueError):
        chunk_documents(docs, max_tokens=8, overlap=8)


@pytest.mark.parametrize("nblocks", [1, 7])
def test_prefix_sum_matches_numpy(nblocks):
    from pisa_ray.pipelines.relational import prefix_sum

    rng = np.random.default_rng(3)
    ids = rng.permutation(500)
    vals = rng.integers(0, 50, size=500)
    df = pd.DataFrame({"k": ids, "v": vals})
    out = (
        prefix_sum(rd.from_pandas(df).repartition(nblocks), "k", "v", "off")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.sort_values("k").reset_index(drop=True)
    assert (out["k"] == want["k"]).all()
    assert (
        out["off"].to_numpy()
        == np.concatenate(([0], np.cumsum(want["v"].to_numpy())))[:-1]
    ).all()


def _pack_oracle(texts, ids, budget):
    import re

    rows, off = [], 0
    for did, t in sorted(zip(ids, texts)):
        n = len([w for w in re.split("[^a-z0-9_]+", t.lower()) if w])
        if n == 0:
            continue
        for seq in range(off // budget, (off + n - 1) // budget + 1):
            rows.append(
                (
                    seq,
                    did,
                    max(0, seq * budget - off),
                    min(n, (seq + 1) * budget - off),
                )
            )
        off += n
    return pd.DataFrame(rows, columns=["seq_id", "doc_id", "tok_start", "tok_end"])


@pytest.mark.parametrize("nblocks", [1, 6])
def test_pack_sequences_vs_python_oracle(nblocks):
    from pisa_ray.pipelines.text import pack_sequences

    texts = [
        " ".join(f"w{i}" for i in range(23)),  # spans multiple 8-seqs
        "",
        "single",
        " ".join(f"t{i}" for i in range(9)),
        "a b c",
    ]
    df = pd.DataFrame({"doc_id": [5, 1, 9, 2, 7], "text": texts})
    got = (
        pack_sequences(
            rd.from_pandas(df).repartition(nblocks), budget=8
        )
        .to_pandas()
        .sort_values(["seq_id", "doc_id"])
        .reset_index(drop=True)
    )
    want = _pack_oracle(texts, df["doc_id"], 8).sort_values(
        ["seq_id", "doc_id"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # stream invariants: per-sequence token load == budget except the tail
    load = got.groupby("seq_id").apply(
        lambda g: (g.tok_end - g.tok_start).sum(), include_groups=False
    )
    assert (load.iloc[:-1] == 8).all() and load.iloc[-1] <= 8


def test_hll_distinct_accuracy_and_invariance():
    from pisa_ray.pipelines.sketch import hll_distinct

    n = 100_000
    df = pd.DataFrame({"v": np.arange(n, dtype=np.int64) % 40_000})
    r1 = hll_distinct(rd.from_pandas(df), "v")
    r8 = hll_distinct(rd.from_pandas(df).repartition(8), "v")
    # registers max-merge -> bit-identical at any parallelism
    assert r1 == r8
    # p=12 -> rse ~1.6%; allow 3 sigma
    assert abs(r1["estimate"] - 40_000) / 40_000 < 0.05


def test_hll_distinct_strings_and_small_range():
    from pisa_ray.pipelines.sketch import hll_distinct

    vals = [f"user_{i % 900}" for i in range(30_000)]
    df = pd.DataFrame({"v": vals})
    r = hll_distinct(rd.from_pandas(df).repartition(5), "v")
    # linear-counting regime: near-exact for 900 distinct at m=4096
    assert abs(r["estimate"] - 900) / 900 < 0.05
    # duplicates must not move the sketch at all
    r2 = hll_distinct(rd.from_pandas(pd.DataFrame({"v": vals * 2})), "v")
    assert r2["estimate"] == r["estimate"]


def _hh_oracle(df, col, k):
    import duckdb

    return duckdb.sql(
        f"SELECT {col} AS value, count(*)::BIGINT AS cnt FROM df "
        f"GROUP BY 1 ORDER BY cnt DESC, value LIMIT {k}"
    ).df()


def test_heavy_hitters_exact_vs_duckdb_and_invariance():
    from pisa_ray.pipelines.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    # Zipf-ish skew with deliberate count TIES in the tail of the top-k
    vals = [f"tok_{int(z)}" for z in rng.zipf(1.3, 60_000) if z < 5_000]
    df = pd.DataFrame({"v": vals})
    want = _hh_oracle(df, "v", 20)
    for nparts in (1, 16):
        got = heavy_hitters(
            rd.from_pandas(df).repartition(nparts), "v", 20
        ).to_pandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )


def test_heavy_hitters_int_column_and_small_distinct():
    from pisa_ray.pipelines.sketch import heavy_hitters

    df = pd.DataFrame({"v": np.array([5, 5, 5, 9, 9, 2], dtype=np.int64)})
    got = heavy_hitters(rd.from_pandas(df).repartition(3), "v", 10).to_pandas()
    want = _hh_oracle(df, "v", 10)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_heavy_hitters_guard_fallback_still_exact():
    from pisa_ray.pipelines.sketch import heavy_hitters

    # near-uniform data + tiny summary: the exactness guard MUST trip
    # (raise when fallback disallowed) and the fallback stays exact
    df = pd.DataFrame({"v": [f"u{i % 3000}" for i in range(9_000)]})
    ds = rd.from_pandas(df).repartition(8)
    with pytest.raises(ValueError, match="exactness guard"):
        heavy_hitters(ds, "v", 5, summary_size=8, fallback=False)
    got = heavy_hitters(ds, "v", 5, summary_size=8).to_pandas()
    want = _hh_oracle(df, "v", 5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_pairs_to_clusters_composition():
    """The full near-dup pipeline: MinHash-LSH pair emission ->
    connected components -> one canonical id per duplicate cluster."""
    from pisa_ray.pipelines.dedup import minhash_lsh_dedup
    from pisa_ray.pipelines.graph import connected_components

    base = (
        rd.read_parquet(f"{SF}/documents.parquet")
        .to_pandas()[["doc_id", "text"]]
        .head(50)
    )
    u = pd.concat(
        [base, base.assign(doc_id=base.doc_id + 10_000),
         base.assign(doc_id=base.doc_id + 20_000)]
    )
    pairs = minhash_lsh_dedup(rd.from_pandas(u), threshold=0.9)
    labels = connected_components(
        pairs, src_col="doc_id", dst_col="dup_of"
    ).to_pandas()
    lab = dict(zip(labels["id"], labels["comp_id"]))
    for d in base["doc_id"]:
        # each exact-twin triple lands in ONE cluster containing the
        # base doc (the synthetic corpus also has genuine near-dups, so
        # a cluster may span several base docs — its root is still some
        # base id, never a twin id)
        assert lab.get(d + 10_000) == lab.get(d + 20_000) == lab.get(d, d)
        assert lab.get(d, d) < 10_000


@pytest.mark.parametrize("nblocks", [1, 6])
def test_cross_doc_ngram_stats_vs_python_oracle(nblocks):
    from pisa_ray.pipelines.text import cross_doc_ngram_stats

    texts = [
        "a b c d e f a b c d",          # shares 'a b c d' span with doc 2
        "x a b c d e z z z",            # and repeats z (intra-doc only)
        "q w e r t y u i o p",          # unique
        "a b",                          # too short for n=4 -> no output
        "z z z z z z",                  # intra-doc repeats + shares? no
    ]
    ids = [1, 2, 3, 4, 5]
    nn = 4

    def oracle():
        grams = {}
        per_doc = []
        for did, t in zip(ids, texts):
            toks = t.split()
            gs = [tuple(toks[i : i + nn]) for i in range(len(toks) - nn + 1)]
            per_doc.append((did, gs))
            for g in set(gs):
                grams.setdefault(g, set()).add(did)
        rows = []
        for did, gs in per_doc:
            if not gs:
                continue
            ndup = sum(1 for g in gs if len(grams[g]) > 1)
            rows.append(
                (did, len(gs), ndup, np.floor(ndup / len(gs) * 1e4 + 0.5) / 1e4)
            )
        return pd.DataFrame(
            rows, columns=["doc_id", "n_grams", "n_dup", "dup_fraction"]
        )

    df = pd.DataFrame({"doc_id": ids, "text": texts})
    got = (
        cross_doc_ngram_stats(rd.from_pandas(df).repartition(nblocks), n=nn)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, oracle())


@pytest.mark.parametrize("nblocks", [1, 6])
def test_hash_split_coherent_deterministic(nblocks):
    from pisa_ray.pipelines.relational import hash_split

    # rows share keys -> every key's rows get ONE split label
    df = pd.DataFrame(
        {"k": np.arange(20_000, dtype=np.int64) % 2_000, "x": np.arange(20_000)}
    )
    out = hash_split(
        rd.from_pandas(df).repartition(nblocks), "k"
    ).to_pandas()
    per_key = out.groupby("k")["split"].nunique()
    assert (per_key == 1).all()
    frac = out.drop_duplicates("k")["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["validation"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # python replica of the documented hash -> exact agreement
    h = (df["k"].to_numpy().astype(np.uint64) % np.uint64(2**31)) * np.uint64(
        2654435761
    ) % np.uint64(2**32)
    t1, t2 = int(0.8 * 2**32), int(0.9 * 2**32)
    want = np.where(h < t1, "train", np.where(h < t2, "validation", "test"))
    assert (out.sort_values("x")["split"].to_numpy() == want).all()


@pytest.mark.parametrize("nblocks", [1, 6])
def test_rate_sample_matches_hash_replica(nblocks):
    from pisa_ray.pipelines.relational import rate_sample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(9_000, dtype=np.int64),
            "src": np.repeat(["a", "b", "c"], 3_000),
        }
    )
    out = (
        rate_sample(
            rd.from_pandas(df).repartition(nblocks),
            {"a": 1.0, "b": 0.25},
            key_col="src",
            id_col="doc_id",
            default_rate=0.0,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    h = (df["doc_id"].to_numpy().astype(np.uint64) % np.uint64(2**31)) * np.uint64(
        2654435761
    ) % np.uint64(2**32)
    rate = df["src"].map({"a": 1.0, "b": 0.25, "c": 0.0}).to_numpy()
    want = df[h < np.floor(rate * 2**32).astype(np.uint64)].reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want)
    kept = out.groupby("src").size()
    assert kept.get("a", 0) == 3_000                  # rate 1.0 keeps all
    assert "c" not in kept                            # default 0 drops all
    assert abs(kept.get("b", 0) / 3_000 - 0.25) < 0.05


def test_exchange_preserves_reducer_schema_on_empty_input():
    """An empty-but-schema'd input must come out of the exchange with
    the REDUCER's schema (review finding: the 0-row-block drop made it
    pass the INPUT through unchanged)."""
    from pisa_ray.pipelines.dedup import jaccard_pairs
    from pisa_ray.pipelines.text import cross_doc_ngram_stats

    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                         "text": pd.array([], dtype="string")}))
    jp = jaccard_pairs(empty, threshold=0.5)
    assert jp.count() == 0
    assert set(jp.schema().names) >= {"id_a", "id_b", "jaccard"}
    xs = cross_doc_ngram_stats(empty, n=4)
    assert xs.count() == 0
    assert set(xs.schema().names) == {"doc_id", "n_grams", "n_dup", "dup_fraction"}
    # too-wide repartition (column-less degenerate blocks) still works
    short = pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "a b"]})
    out = cross_doc_ngram_stats(rd.from_pandas(short).repartition(8), n=2)
    assert out.count() == 2


def test_cc_nonconvergence_and_bad_max_iter_raise():
    from pisa_ray.pipelines.graph import connected_components

    pairs = rd.from_pandas(pd.DataFrame({"id_a": [1, 2, 3], "id_b": [2, 3, 4]}))
    with pytest.raises(ValueError):
        connected_components(pairs, max_iter=0)
    with pytest.raises(RuntimeError):
        # a 4-chain cannot reach the star fixpoint in one round
        connected_components(
            rd.from_pandas(
                pd.DataFrame({"id_a": range(0, 40), "id_b": range(1, 41)})
            ),
            max_iter=1,
        )


def test_hash_ops_reject_null_and_negative_keys():
    """ADVICE r2: null keys (NaN->uint64 undefined) and negative keys
    (numpy uint64 wrap vs SQL signed modulo) must raise, not silently
    produce nondeterministic split/keep decisions."""
    from pisa_ray.pipelines.relational import (
        hash_split,
        rate_sample,
        stratified_sample,
    )

    nulls = rd.from_arrow(
        pa.table({"k": pa.array([1, None, 3], pa.int64()),
                  "id": pa.array([1, 2, 3], pa.int64())})
    )
    with pytest.raises(Exception, match="null"):
        hash_split(nulls, "k").materialize()
    with pytest.raises(Exception, match="null"):
        rate_sample(nulls.rename_columns({"k": "v", "id": "k"})
                    .add_column("id", lambda d: d["k"]),
                    {"x": 0.5}, "k", "id").materialize()

    neg = rd.from_arrow(
        pa.table({"k": pa.array([-5, 2], pa.int64()),
                  "id": pa.array([-5, 2], pa.int64())})
    )
    with pytest.raises(Exception, match="negative"):
        hash_split(neg, "k").materialize()
    with pytest.raises(Exception, match="negative"):
        stratified_sample(neg, "k", 1, "id").materialize()


def test_prefix_sum_duplicate_keys_raise_within_block():
    """ADVICE r2: duplicate order keys that land entirely inside one
    block must fail loudly, same as boundary-straddling duplicates."""
    from pisa_ray.pipelines.relational import prefix_sum

    df = pd.DataFrame({"k": [1, 2, 2, 3], "v": [1, 1, 1, 1]})
    with pytest.raises(AssertionError, match="duplicate|unique"):
        prefix_sum(rd.from_pandas(df), "k", "v").materialize()


def test_prefix_sum_empty_input_keeps_out_col():
    """ADVICE r2: zero-block input must still carry the out_col."""
    from pisa_ray.pipelines.relational import prefix_sum

    empty = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    out = prefix_sum(empty, "k", "v", "off")
    assert out.count() == 0
    assert "off" in out.schema().names


def test_hll_nulls_ignored_and_p_validated():
    """ADVICE r2: NULLs must not count as a distinct value (SQL
    count(distinct) semantics) and out-of-range p must raise."""
    from pisa_ray.pipelines.sketch import hll_distinct

    with_nulls = rd.from_arrow(
        pa.table({"v": pa.array(["a", None, "b", None, ""], pa.string())})
    )
    no_nulls = rd.from_arrow(
        pa.table({"v": pa.array(["a", "b", ""], pa.string())})
    )
    r1 = hll_distinct(with_nulls, "v")
    r2 = hll_distinct(no_nulls, "v")
    assert r1 == r2  # bit-identical registers -> identical dict
    ints = rd.from_arrow(
        pa.table({"v": pa.array([1, None, 2], pa.int64())})
    )
    r3 = hll_distinct(ints, "v")
    assert round(r3["estimate"]) == 2
    with pytest.raises(ValueError):
        hll_distinct(no_nulls, "v", p=3)
    with pytest.raises(ValueError):
        hll_distinct(no_nulls, "v", p=19)


def test_quantile_sketch_error_bound_and_small_exact():
    """One-pass compactor sketch: measured rank error within the
    reported certificate on uniform + heavy-tail data at two
    parallelism levels; exact (== quantile_disc rank rule) when the
    input never compacts."""
    from pisa_ray.pipelines.sketch import quantile_sketch

    qs = [0.01, 0.25, 0.5, 0.75, 0.99]

    # small input, never compacts -> exact discrete quantiles
    small = np.arange(100, dtype=np.float64)
    res = quantile_sketch(rd.from_pandas(pd.DataFrame({"v": small})), "v", qs, k=512)
    assert res["n"] == 100 and res["eps_bound"] == 0.0
    for q in qs:
        assert res["quantiles"][q] == float(np.sort(small)[int(np.floor(99 * q))])

    rng = np.random.default_rng(7)
    n = 200_000
    for name, data in {
        "uniform": rng.uniform(0, 1, n),
        "zipf_tail": rng.zipf(1.3, n).astype(np.float64),
    }.items():
        s = np.sort(data)
        for nblocks in (2, 16):
            ds = rd.from_pandas(pd.DataFrame({"v": data})).repartition(nblocks)
            r = quantile_sketch(ds, "v", qs, k=256)
            assert r["n"] == n
            assert 0 < r["eps_bound"] < 0.05, (name, nblocks, r["eps_bound"])
            for q in qs:
                est = r["quantiles"][q]
                # measured rank error <= certificate (+1 for the
                # discrete target-rank rounding)
                # est occupies the rank interval [lo, hi]; error is the
                # distance from the target rank to that interval (0 if
                # inside — heavy duplicates make the interval wide)
                lo = np.searchsorted(s, est, side="left")
                hi = np.searchsorted(s, est, side="right") - 1
                target = int(np.floor((n - 1) * q))
                err = 0 if lo <= target <= hi else min(
                    abs(target - lo), abs(target - hi)
                )
                assert err <= r["eps_bound"] * n + 1, (name, nblocks, q, err)


def test_quantile_sketch_weight_conservation_and_nulls():
    from pisa_ray.pipelines.sketch import quantile_sketch

    df = pd.DataFrame({"v": [1.0, None, 2.0, None, 3.0] * 4000})
    r = quantile_sketch(rd.from_pandas(df).repartition(4), "v", [0.5], k=64)
    assert r["n"] == 12_000  # nulls ignored, total weight conserved
    assert r["quantiles"][0.5] == 2.0

    empty = pd.DataFrame({"v": pd.Series([], dtype="float64")})
    r0 = quantile_sketch(rd.from_pandas(empty), "v", [0.5], k=64)
    assert r0["n"] == 0 and r0["quantiles"][0.5] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        quantile_sketch(rd.from_pandas(df), "v", [0.5], k=4)
    with _pytest.raises(ValueError):
        quantile_sketch(rd.from_pandas(df), "v", [])


def test_profile_one_pass_stats():
    """One-pass profiler: exact counters/min/max, HLL distinct within
    rse, sketch quantiles within their certificate, heavy values exact
    when distinct <= capacity."""
    from pisa_ray.pipelines.profile import profile

    rng = np.random.default_rng(11)
    n = 60_000
    num = rng.normal(100.0, 15.0, n)
    num[::97] = np.nan  # pandas NaN -> arrow null after from_pandas? keep explicit
    cat = np.asarray(["alpha", "beta", "gamma", "delta"])[
        rng.integers(0, 4, n)
    ]
    df = pd.DataFrame({"x": num, "label": cat})
    df.loc[::97, "x"] = None
    prof = profile(rd.from_pandas(df).repartition(8), quantiles=(0.1, 0.5, 0.9))

    px = prof["x"]
    n_null = len(df.loc[::97])
    assert px["n"] == n and px["nulls"] == n_null
    xs = df["x"].dropna().to_numpy()
    assert px["min"] == xs.min() and px["max"] == xs.max()
    assert abs(px["distinct"] - len(np.unique(xs))) / len(np.unique(xs)) < 0.05
    s = np.sort(xs)
    for q, est in px["quantiles"].items():
        target = int(np.floor((s.size - 1) * q))
        lo = np.searchsorted(s, est, "left")
        hi = np.searchsorted(s, est, "right") - 1
        err = 0 if lo <= target <= hi else min(abs(target - lo), abs(target - hi))
        assert err <= px["quantile_rank_error"] * s.size + 1

    pl = prof["label"]
    assert pl["n"] == n and pl["nulls"] == 0
    assert pl["min"] == "alpha" and pl["max"] == "gamma"
    assert abs(pl["distinct"] - 4) < 0.5
    assert abs(pl["avg_len"] - np.mean([len(v) for v in cat])) < 1e-9
    # 4 distinct values <= capacity: counts EXACT, certificate 0
    assert pl["count_error"] == 0
    got = {d["value"]: d["count"] for d in pl["top_values"]}
    import collections

    assert got == dict(collections.Counter(cat))


def test_profile_heavy_values_certificate_and_validation():
    from pisa_ray.pipelines.profile import profile

    rng = np.random.default_rng(3)
    vals = rng.zipf(1.5, 80_000).astype(np.int64)  # >> 64 distinct
    df = pd.DataFrame({"v": vals})
    prof = profile(rd.from_pandas(df).repartition(6), top_k=5)["v"]
    import collections

    true = collections.Counter(vals.astype(str))
    for d in prof["top_values"]:
        t = true[d["value"]]
        assert d["count"] <= t <= d["count"] + prof["count_error"], (d, t)
    # the true #1 value must be reported first (its count dwarfs the error)
    assert prof["top_values"][0]["value"] == true.most_common(1)[0][0]

    import pytest as _pytest

    with _pytest.raises(KeyError):
        profile(rd.from_pandas(df), columns=["nope"])
    with _pytest.raises(ValueError):
        profile(rd.from_pandas(df), top_k=1000)


@pytest.mark.parametrize("nblocks", [1, 6])
def test_bottomk_sample_matches_sql_replica(nblocks):
    """Exact bottom-k key sample == the DuckDB ORDER BY hash,key LIMIT k
    replica; group-coherent (all rows of a selected key kept) and
    cross-table coherent (same seed -> same keys)."""
    import duckdb

    from pisa_ray.pipelines.relational import bottomk_sample

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 400, size=5_000)
    df = pd.DataFrame({"k": keys, "v": rng.normal(size=5_000)})
    seed, k = 9, 37
    got = (
        bottomk_sample(rd.from_pandas(df).repartition(nblocks), "k", k, seed=seed)
        .to_pandas()
        .sort_values(["k", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    sel = duckdb.sql(
        f"""
        SELECT k FROM (SELECT DISTINCT k FROM df)
        ORDER BY ((k + {seed}) % 2147483648) * 2654435761 % 4294967296, k
        LIMIT {k}
        """
    ).df()["k"]
    want = (
        df[df["k"].isin(set(sel))]
        .sort_values(["k", "v"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got["k"].nunique() == k

    # cross-table coherence: a second table sampled with the same seed
    # selects the same key set
    df2 = pd.DataFrame({"k": np.arange(400), "w": np.arange(400)})
    got2 = bottomk_sample(rd.from_pandas(df2), "k", k, seed=seed).to_pandas()
    assert set(got2["k"]) == set(sel)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bottomk_sample(rd.from_pandas(df), "k", 0)
    # k >= distinct keys: everything kept
    assert bottomk_sample(rd.from_pandas(df), "k", 10_000).count() == len(df)


def test_profile_mixed_block_long_text_drops_top_values_entirely():
    """If ANY block skips its heavy-values summary (long-text guard)
    the column's top_values must be absent — a partial summary would
    violate the count_error certificate."""
    from pisa_ray.pipelines.profile import profile

    short = pd.DataFrame({"s": ["aa"] * 500})
    long_ = pd.DataFrame({"s": ["x" * 400] * 500})
    ds = rd.from_pandas(short).union(rd.from_pandas(long_))
    p = profile(ds)["s"]
    assert p["n"] == 1000
    assert "top_values" not in p and "count_error" not in p
    # all-short input keeps the summary
    p2 = profile(rd.from_pandas(short))["s"]
    assert p2["top_values"][0] == {"value": "aa", "count": 500}


@pytest.mark.parametrize("nblocks", [1, 6])
def test_grouped_quantile_sketch_exact_small_groups(nblocks):
    """Groups that never compact return EXACT discrete quantiles (the
    floor((n-1)q) rank rule), per key, at any parallelism."""
    from pisa_ray.pipelines.sketch import grouped_quantile_sketch

    rng = np.random.default_rng(2)
    keys = np.repeat(["a", "b", "c"], [50, 120, 7])
    vals = rng.normal(size=keys.size) * 10
    df = pd.DataFrame({"src": keys, "v": vals})
    out = grouped_quantile_sketch(
        rd.from_pandas(df).repartition(nblocks), "src", "v", [0.0, 0.5, 1.0],
        k=256,
    )
    assert (out["eps_bound"] == 0.0).all()  # nothing compacts
    for kk, grp in df.groupby("src"):
        s = np.sort(grp["v"].to_numpy())
        for q in (0.0, 0.5, 1.0):
            row = out[(out["key"] == kk) & (out["q"] == q)].iloc[0]
            assert row["n"] == s.size
            assert row["value"] == s[int(np.floor((s.size - 1) * q))]


def test_grouped_quantile_sketch_error_bound_large_group():
    from pisa_ray.pipelines.sketch import grouped_quantile_sketch

    rng = np.random.default_rng(4)
    n = 50_000
    df = pd.DataFrame(
        {"src": np.where(np.arange(n) % 3 == 0, "x", "y"),
         "v": rng.uniform(0, 1, n)}
    )
    out = grouped_quantile_sketch(
        rd.from_pandas(df).repartition(8), "src", "v", [0.25, 0.75], k=128
    )
    for kk, grp in df.groupby("src"):
        s = np.sort(grp["v"].to_numpy())
        for q in (0.25, 0.75):
            row = out[(out["key"] == kk) & (out["q"] == q)].iloc[0]
            assert row["n"] == s.size and 0 < row["eps_bound"] < 0.1
            target = int(np.floor((s.size - 1) * q))
            lo = np.searchsorted(s, row["value"], "left")
            hi = np.searchsorted(s, row["value"], "right") - 1
            err = 0 if lo <= target <= hi else min(
                abs(target - lo), abs(target - hi)
            )
            assert err <= row["eps_bound"] * s.size + 1


# --------------------------------------------------------------------------
# PageRank
# --------------------------------------------------------------------------


def _pr_numpy(edges, damping=0.85, iters=200, tol=1e-12):
    """Dense power-iteration oracle over the same model (uniform
    teleport + uniform dangling redistribution)."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.zeros(n)
        for u, v in edges:
            new[idx[v]] += r[idx[u]] / outdeg[idx[u]]
        dangling = r[outdeg == 0].sum()
        new = (1 - damping) / n + damping * (new + dangling / n)
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return dict(zip(nodes, r))


def _pr_run(edges, **kw):
    from pisa_ray.pipelines.graph import pagerank

    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    out = pagerank(ds, **kw).to_pandas()
    return dict(zip(out["node"], out["rank"]))


def test_pagerank_vs_numpy_oracle():
    rng = np.random.default_rng(7)
    n = 60
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 400), rng.integers(0, n, 400))
        }
    )
    got = _pr_run(edges, tol=1e-12, max_iters=200, n_shards=4)
    want = _pr_numpy(edges, tol=1e-14, iters=500)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9, k
    assert abs(sum(got.values()) - 1.0) <= 1e-9


def test_pagerank_fixed_sweep_mode():
    """tol=None runs EXACTLY max_iters power sweeps (the driver-oracle
    replay contract): matches the numpy oracle at the same sweep
    count, emits no non-convergence warning, and differs from the
    converged fixpoint (proving it really stopped at the budget)."""
    import warnings

    rng = np.random.default_rng(13)
    n = 40
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 150), rng.integers(0, n, 150))
        }
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any pagerank warning -> fail
        got = _pr_run(edges, tol=None, max_iters=3, n_shards=2)
    want = _pr_numpy(edges, tol=-1.0, iters=3)  # tol<0: never breaks
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) <= 1e-12, key
    converged = _pr_numpy(edges, tol=1e-14, iters=500)
    assert max(abs(got[key] - converged[key]) for key in want) > 1e-9


def test_pagerank_known_graphs():
    # 3-cycle: symmetric -> uniform ranks
    got = _pr_run([(0, 1), (1, 2), (2, 0)], n_shards=3, tol=1e-13, max_iters=300)
    for v in got.values():
        assert abs(v - 1 / 3) <= 1e-9
    # star a->b, c->b, with b dangling: b highest
    got = _pr_run([(10, 99), (20, 99)], n_shards=2, tol=1e-13, max_iters=300)
    assert got[99] > got[10] and abs(got[10] - got[20]) <= 1e-12
    want = _pr_numpy([(10, 99), (20, 99)], tol=1e-15, iters=1000)
    for k in want:
        assert abs(got[k] - want[k]) <= 1e-9


def test_pagerank_parallelism_invariance_and_determinism():
    rng = np.random.default_rng(11)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 40, 250), rng.integers(0, 40, 250))
        }
    )
    a = _pr_run(edges, n_shards=2, tol=1e-12, max_iters=200)
    b = _pr_run(edges, n_shards=7, tol=1e-12, max_iters=200)
    c = _pr_run(edges, n_shards=7, tol=1e-12, max_iters=200)
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) <= 1e-9  # float order differs across S
        assert b[k] == c[k]  # same S -> bit-deterministic


def test_pagerank_rails_and_empty():
    import pytest as _pytest

    from pisa_ray.pipelines.graph import pagerank

    with _pytest.raises(ValueError, match="damping"):
        _pr_run([(0, 1)], damping=1.5)
    with _pytest.raises(ValueError, match="max_iters"):
        _pr_run([(0, 1)], max_iters=0)
    empty = pagerank(
        rd.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
    )
    # Ray's to_pandas drops columns on fully-empty datasets; assert on
    # the Dataset schema instead
    assert empty.schema().names == ["node", "rank"] and empty.count() == 0


def test_pagerank_n_shards_rail():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_shards"):
        _pr_run([(0, 1)], n_shards=-3)


def _pr_numpy_full(edges, weights=None, teleport=None, damping=0.85,
                   iters=500, tol=1e-14):
    """Dense oracle: weighted contributions + personalized teleport."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    w = weights if weights is not None else [1.0] * len(edges)
    outw = np.zeros(n)
    for (u, _), ww in zip(edges, w):
        outw[idx[u]] += ww
    if teleport is None:
        t = np.full(n, 1.0 / n)
    else:
        t = np.zeros(n)
        for k, v in teleport.items():
            if k in idx:
                t[idx[k]] = v
        t /= t.sum()
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.zeros(n)
        for (u, v), ww in zip(edges, w):
            new[idx[v]] += r[idx[u]] * ww / outw[idx[u]]
        dangling = r[outw == 0].sum()
        new = (1 - damping) * t + damping * (new + dangling * t)
        if np.abs(new - r).sum() <= tol:
            r = new
            break
        r = new
    return dict(zip(nodes, r))


def test_pagerank_weighted_vs_oracle():
    from pisa_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(21)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 30, 150), rng.integers(0, 30, 150))
        }
    )
    weights = [float(w) for w in rng.uniform(0.1, 5.0, len(edges))]
    ds = rd.from_items(
        [{"src": u, "dst": v, "w": w} for (u, v), w in zip(edges, weights)]
    )
    got = (
        pagerank(ds, weight_col="w", tol=1e-12, max_iters=300, n_shards=4)
        .to_pandas()
    )
    gm = dict(zip(got["node"], got["rank"]))
    want = _pr_numpy_full(edges, weights=weights)
    assert set(gm) == set(want)
    for k in want:
        assert abs(gm[k] - want[k]) <= 1e-9, k
    # uniform weights == unweighted model exactly (same float ops)
    ones = rd.from_items([{"src": u, "dst": v, "w": 1.0} for u, v in edges])
    plain = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    a = pagerank(ones, weight_col="w", tol=1e-12, max_iters=300, n_shards=3).to_pandas()
    b = pagerank(plain, tol=1e-12, max_iters=300, n_shards=3).to_pandas()
    assert (a["rank"].to_numpy() == b["rank"].to_numpy()).all()


def test_pagerank_personalized_vs_oracle():
    from pisa_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(31)
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, 40, 250), rng.integers(0, 40, 250))
        }
    )
    seeds = {0: 2.0, 7: 1.0, 99999: 5.0}  # 99999 absent: ignored
    ds = rd.from_items([{"src": u, "dst": v} for u, v in edges])
    got = (
        pagerank(ds, teleport=seeds, tol=1e-12, max_iters=400, n_shards=5)
        .to_pandas()
    )
    gm = dict(zip(got["node"], got["rank"]))
    want = _pr_numpy_full(edges, teleport=seeds)
    for k in want:
        assert abs(gm[k] - want[k]) <= 1e-9, k
    # seeds concentrate mass: seed 0 outranks the median node
    med = float(np.median(list(gm.values())))
    assert gm[0] > med
    # every teleport node absent -> loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="teleport"):
        pagerank(ds, teleport={10**9: 1.0}, n_shards=2)
    with _pytest.raises(ValueError, match=">= 0"):
        pagerank(ds, teleport={0: -1.0}, n_shards=2)


def test_pagerank_weight_rails():
    from pisa_ray.pipelines.graph import pagerank

    ds = rd.from_items([{"src": 0, "dst": 1, "w": -2.0}])
    import pytest as _pytest

    with _pytest.raises(Exception, match="weights must be finite"):
        pagerank(ds, weight_col="w", n_shards=2).to_pandas()
