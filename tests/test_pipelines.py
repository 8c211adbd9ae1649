"""Tests for the training-data pipeline operators (dedup, text,
similarity, relational, multimodal)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb():
    return rd.read_parquet(f"{SF}/embeddings.parquet")


# -- dedup ----------------------------------------------------------------


def test_dedup_exact_with_planted_dups(docs):
    from pisa_ray.pipelines.dedup import dedup_exact

    base = docs.to_pandas()
    dup = base.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000  # same text, later ids
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    out = dedup_exact(ds).to_pandas()
    # the 5 planted duplicates collapse onto the original (smaller) ids
    assert len(out) == len(base)
    assert set(out["doc_id"]) == set(base["doc_id"])


def test_dedup_exact_no_false_merge_on_prefix_collision(docs):
    """Narrowing the shuffle-key prefix to 1 byte forces many distinct
    texts into the same prefix group; the full-digest check inside the
    group must keep them all (no false merges)."""
    from pisa_ray.pipelines.dedup import dedup_exact

    base = docs.to_pandas()
    ds = rd.from_pandas(base)
    full = dedup_exact(ds).to_pandas()
    narrow = dedup_exact(ds, prefix_bytes=1).to_pandas()
    assert set(narrow["doc_id"]) == set(full["doc_id"])


def test_minhash_detects_planted_near_dups(docs):
    from pisa_ray.pipelines.dedup import minhash_lsh_dedup

    base = docs.to_pandas()[["doc_id", "text"]]
    dup = base.head(5).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    # identical text -> jaccard 1.0 -> must be flagged
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    out = minhash_lsh_dedup(ds, threshold=0.9).to_pandas()
    flagged = dict(zip(out["doc_id"], out["dup_of"]))
    for _, row in dup.iterrows():
        assert flagged.get(row["doc_id"]) == row["doc_id"] - 100_000


def test_minhash_distributed_verify_matches_driver_path(docs):
    """High-dup corpus (~50% dup rate): forcing max_driver_pairs=0
    routes through the fully distributed verify branch; the result
    must be identical to the driver-collect path."""
    from pisa_ray.pipelines.dedup import minhash_lsh_dedup

    base = docs.to_pandas()[["doc_id", "text"]]
    dup = base.copy()
    dup["doc_id"] = dup["doc_id"] + 100_000  # every doc duplicated
    pdf = pd.concat([base, dup], ignore_index=True)
    driver = (
        minhash_lsh_dedup(rd.from_pandas(pdf), threshold=0.9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    dist = (
        minhash_lsh_dedup(
            rd.from_pandas(pdf), threshold=0.9, max_driver_pairs=0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert dist.equals(driver)
    # every planted dup flagged against some earlier near-dup (the
    # fixture corpus itself contains repeated texts, so dup_of is the
    # MIN over all near-dups, not necessarily did - 100_000)
    flagged = dict(zip(dist["doc_id"], dist["dup_of"]))
    for did in dup["doc_id"]:
        assert flagged.get(did, did) < did


def test_verify_pairs_missing_doc_raises_on_both_branches(docs):
    """A candidate pair referencing a doc_id absent from docs must
    raise the SAME loud KeyError on the driver branch and the
    distributed fallback (review finding: the fallback used to drop
    the pair silently, so behavior depended on max_driver_pairs)."""
    import ray

    from pisa_ray.pipelines.dedup import verify_pairs_jaccard

    base = docs.to_pandas()[["doc_id", "text"]].head(10)
    good = int(base["doc_id"].iloc[0])
    pairs = rd.from_pandas(
        pd.DataFrame({"doc_id": [999_999_999], "dup_of": [good]})
    )
    ds = rd.from_pandas(base)
    with pytest.raises((KeyError, ray.exceptions.RayTaskError)):
        verify_pairs_jaccard(ds, pairs, threshold=0.5)
    with pytest.raises(KeyError):
        verify_pairs_jaccard(ds, pairs, threshold=0.5, max_driver_pairs=0)


def test_minhash_deterministic(docs):
    from pisa_ray.pipelines.dedup import minhash_lsh_dedup

    a = minhash_lsh_dedup(docs, threshold=0.7).to_pandas().sort_values("doc_id")
    b = minhash_lsh_dedup(docs, threshold=0.7).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_simhash_near_dup_and_jaccard(docs):
    from pisa_ray.pipelines.dedup import ngram_jaccard, simhash_dedup

    base = docs.to_pandas()[["doc_id", "text"]]
    dup = base.head(3).copy()
    dup["doc_id"] = dup["doc_id"] + 100_000
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    out = simhash_dedup(ds, max_hamming=0).to_pandas()
    flagged = dict(zip(out["doc_id"], out["dup_of"]))
    for _, row in dup.iterrows():
        assert flagged.get(row["doc_id"]) == row["doc_id"] - 100_000
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0


def test_embedding_dedup_planted(emb):
    from pisa_ray.pipelines.dedup import embedding_dedup

    base = emb.to_pandas()
    dup = base.head(4).copy()
    dup["vec_id"] = dup["vec_id"] + 100_000  # identical vectors
    ds = rd.from_pandas(pd.concat([base, dup], ignore_index=True))
    out = embedding_dedup(ds, threshold=0.999).to_pandas()
    flagged = dict(zip(out["vec_id"], out["dup_of"]))
    for _, row in dup.iterrows():
        assert flagged.get(row["vec_id"]) == row["vec_id"] - 100_000


# -- similarity -----------------------------------------------------------


def test_as_matrix_fast_path_bit_identical_to_pylist():
    """The zero-copy flatten+reshape decode must produce the exact
    same float64 matrix as the old to_pylist path on every Arrow list
    layout it fast-paths, and must still raise on ragged input."""
    from pisa_ray.pipelines.similarity import _as_matrix

    rng = np.random.default_rng(7)
    rows = rng.standard_normal((13, 4))
    want = rows.astype(np.float64)

    lists = [list(map(float, r)) for r in rows]
    cases = {
        "list_f64": pa.array(lists, type=pa.list_(pa.float64())),
        "large_list_f32": pa.array(
            lists, type=pa.large_list(pa.float32())
        ),
        "fixed_size_list": pa.array(
            lists, type=pa.list_(pa.float64(), 4)
        ),
    }
    for name, arr in cases.items():
        got = _as_matrix(arr)
        ref = np.asarray(arr.to_pylist(), dtype=np.float64)
        assert got.dtype == np.float64 and got.shape == (13, 4), name
        assert np.array_equal(got, ref), name
        if name == "list_f64":
            assert np.array_equal(got, want)
        # sliced (non-zero offset) views must respect the offset
        got_slice = _as_matrix(arr.slice(3, 6))
        assert np.array_equal(
            got_slice, np.asarray(arr.slice(3, 6).to_pylist(), np.float64)
        ), name
        # chunked columns take the combine_chunks path
        ch = pa.chunked_array([arr.slice(0, 5), arr.slice(5)])
        assert np.array_equal(_as_matrix(ch), ref), name

    empty = pa.array([], type=pa.list_(pa.float64()))
    assert _as_matrix(empty).shape[0] == 0

    ragged = pa.array([[1.0, 2.0], [3.0]], type=pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        _as_matrix(ragged)

    # null rows must not silently misalign: they take the fallback,
    # which raises (None is not convertible to float64 matrix rows)
    with_null = pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64()))
    with pytest.raises((ValueError, TypeError)):
        _as_matrix(with_null)


def test_brute_knn_matches_numpy_oracle(emb):
    from pisa_ray.pipelines.similarity import brute_knn

    pdf = emb.to_pandas()
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    q = m[:3]
    got = brute_knn(emb, q, k=5)
    for qi in range(3):
        sims = m @ q[qi]
        order = np.lexsort((ids, -np.round(sims, 12)))[:5]
        want = ids[order].tolist()
        sub = got[got.query_id == qi].sort_values("rank")
        assert sub["vec_id"].tolist() == want


def test_lsh_knn_self_hit(emb):
    from pisa_ray.pipelines.similarity import lsh_knn

    pdf = emb.to_pandas().head(3)
    q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    got = lsh_knn(emb, q, k=3)
    # each query's own vector shares its bucket -> rank-1 self hit
    for qi, vid in enumerate(pdf["vec_id"]):
        sub = got[(got.query_id == qi) & (got["rank"] == 1)]
        assert len(sub) == 1 and int(sub["vec_id"].iloc[0]) == int(vid)


# -- text -----------------------------------------------------------------


def test_token_stats_and_quality(docs):
    from pisa_ray.pipelines.text import quality_score, token_stats
    from pisa_ray.tokenizer import tokenize_py

    stats = token_stats(docs).to_pandas().set_index("doc_id")
    pdf = docs.to_pandas()
    for _, row in pdf.head(20).iterrows():
        toks = tokenize_py(row["text"])
        assert stats.loc[row["doc_id"], "n_tokens"] == len(toks)
        assert stats.loc[row["doc_id"], "n_distinct"] == len(set(toks))
    q = quality_score(docs).to_pandas()
    assert ((q["stopword_ratio"] >= 0) & (q["stopword_ratio"] <= 1)).all()


def test_text_stats_fused_and_custom_columns(docs):
    """The fused text_stats kernel must equal token_stats+repetition
    column-for-column, AND honor non-default text/id column names
    (regression: the old probe-extraction fusion silently dropped the
    caller's column names)."""
    import pandas as pd

    from pisa_ray.pipelines.text import (
        repetition_stats,
        text_stats,
        token_stats,
    )

    fused = text_stats(docs).to_pandas().set_index("doc_id").sort_index()
    ts = token_stats(docs).to_pandas().set_index("doc_id").sort_index()
    rep = repetition_stats(docs).to_pandas().set_index("doc_id").sort_index()
    for col in ("n_tokens", "n_chars", "n_distinct", "avg_token_len"):
        pd.testing.assert_series_equal(fused[col], ts[col])
    for col in ("top_token_frac", "dup_2gram_frac"):
        pd.testing.assert_series_equal(fused[col], rep[col])
    # renamed columns route through the same kernels
    renamed = docs.map_batches(
        lambda b: b.rename_columns(
            ["rid" if c == "doc_id" else "body" if c == "text" else c
             for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    fused2 = (
        text_stats(renamed, text_col="body", id_col="rid")
        .to_pandas()
        .set_index("rid")
        .sort_index()
    )
    assert (fused2["n_tokens"].to_numpy() == fused["n_tokens"].to_numpy()).all()
    assert (
        fused2["dup_2gram_frac"].to_numpy() == fused["dup_2gram_frac"].to_numpy()
    ).all()


def test_repetition_stats_vs_python_oracle(docs):
    from pisa_ray.pipelines.text import repetition_stats
    from pisa_ray.tokenizer import tokenize_py

    got = repetition_stats(docs).to_pandas().set_index("doc_id")
    pdf = docs.to_pandas()
    # include synthetic edge docs alongside real ones
    import pandas as pd

    extra = pd.DataFrame(
        {
            "doc_id": [990001, 990002, 990003, 990004],
            "text": ["", "word", "a a a a", "x y x y x y"],
        }
    )
    got2 = (
        repetition_stats(rd.from_pandas(extra)).to_pandas().set_index("doc_id")
    )
    for df_in, df_out in ((pdf.head(30), got), (extra, got2)):
        for _, row in df_in.iterrows():
            toks = tokenize_py(row["text"])
            r = df_out.loc[row["doc_id"]]
            assert r["n_tokens"] == len(toks)
            if toks:
                from collections import Counter

                top = Counter(toks).most_common(1)[0][1]
                exp_top = np.floor(top / len(toks) * 1e4 + 0.5) / 1e4
                assert r["top_token_frac"] == exp_top
            else:
                assert r["top_token_frac"] == 0.0
            grams = list(zip(toks, toks[1:]))
            if grams:
                exp = 1.0 - len(set(grams)) / len(grams)
                exp = np.floor(exp * 1e4 + 0.5) / 1e4
                assert r["dup_2gram_frac"] == exp
            else:
                assert r["dup_2gram_frac"] == 0.0


def test_text_kernels_edge_inputs():
    """Review-finding regressions: null text rows must not crash
    lang_id (NaN into the int64 votes matrix) or the stats kernels;
    fingerprint64 must accept large_string tokens (remove_dup_spans
    output); chunk_documents rejects negative overlap (it silently
    dropped tokens); unigram_model of a zero-token corpus returns an
    empty model; the ngram ops reject string ids up front."""
    from pisa_ray.pipelines.text import (
        chunk_documents, cross_doc_ngram_stats, fingerprint64, lang_id,
        remove_dup_spans, text_stats, unigram_model,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["the quick fox", None, "la casa de"]),
            "lang": pa.array(["en", "en", "es"]),
        }
    )
    li = lang_id(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert li["pred_lang"].tolist() == ["en", "unknown", "es"]
    ts = text_stats(rd.from_arrow(t), include_quality=True).to_pandas()
    assert ts.sort_values("doc_id")["n_tokens"].tolist() == [3, 0, 3]

    dup = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["a b c d e f g h i j", "a b c d e f g h x y"]),
        }
    )
    cleaned = remove_dup_spans(rd.from_arrow(dup), n=8)
    fp = fingerprint64(cleaned).to_pandas()  # used to ArrowNotImplemented
    assert len(fp) == 2

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_arrow(dup), max_tokens=5, overlap=-3)
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(rd.from_arrow(dup), max_tokens=0, overlap=0)

    empty_corpus = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["!!! ???", "..."]),
        }
    )
    m = unigram_model(rd.from_arrow(empty_corpus))
    assert m.num_rows == 0 and m.column_names == ["term", "logp"]
    m2 = unigram_model(rd.from_arrow(empty_corpus), top_v=10)
    assert m2.num_rows == 0

    str_ids = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "text": pa.array(["x y z w v u t s", "x y z w v u t q"]),
        }
    )
    with pytest.raises(TypeError, match="integer column"):
        cross_doc_ngram_stats(rd.from_arrow(str_ids), n=8)
    with pytest.raises(TypeError, match="integer column"):
        remove_dup_spans(rd.from_arrow(str_ids), n=8)


def test_tfidf_keywords_vs_python_oracle(docs):
    import math
    from collections import Counter

    from pisa_ray.pipelines.text import tfidf_keywords
    from pisa_ray.tokenizer import tokenize_py

    k = 3
    got = tfidf_keywords(docs, k=k).to_pandas()
    pdf = docs.to_pandas()
    n = len(pdf)
    df: Counter = Counter()
    toks_by_doc = {}
    for _, row in pdf.iterrows():
        toks = tokenize_py(row["text"])
        toks_by_doc[row["doc_id"]] = toks
        df.update(set(toks))
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    for doc_id, toks in list(toks_by_doc.items())[:40]:
        if not toks:
            assert doc_id not in by_doc
            continue
        tf = Counter(toks)
        scored = sorted(
            (
                (
                    -(math.floor(c * math.log((n + 1) / (df[t] + 1)) * 1e4 + 0.5) / 1e4),
                    t,
                )
                for t, c in tf.items()
            ),
        )[:k]
        g = by_doc[doc_id].sort_values("kw_rank")
        assert list(g["keyword"]) == [t for _, t in scored]
        assert list(g["score"]) == [-s for s, _ in scored]
        assert list(g["kw_rank"]) == list(range(1, len(scored) + 1))


def test_lang_id_on_multilingual_texts():
    """documents.lang is random metadata (texts are English-ish), so
    test the heuristic on purpose-built per-language texts."""
    from pisa_ray.pipelines.text import STOPWORDS, lang_id

    rows = []
    for i, (lang, words) in enumerate(sorted(STOPWORDS.items())):
        rows.append(
            {
                "doc_id": i,
                "lang": lang,
                "text": " ".join(sorted(words) * 3) + " foo bar baz",
            }
        )
    rows.append({"doc_id": 99, "lang": "unknown", "text": "qq ww ee rr"})
    out = lang_id(rd.from_items(rows)).to_pandas().set_index("doc_id")
    for i, lang in enumerate(sorted(STOPWORDS)):
        assert out.loc[i, "pred_lang"] == lang
    assert out.loc[99, "pred_lang"] == "unknown"


def test_fingerprint_properties(docs):
    from pisa_ray.pipelines.text import fingerprint64

    out = fingerprint64(docs).to_pandas()
    assert out["fingerprint"].nunique() > len(out) * 0.95
    # whitespace-insensitive, order-sensitive
    ds = rd.from_items(
        [
            {"doc_id": 0, "text": "a b   c"},
            {"doc_id": 1, "text": "a b c"},
            {"doc_id": 2, "text": "c b a"},
        ]
    )
    fp = fingerprint64(ds).to_pandas().set_index("doc_id")["fingerprint"]
    assert fp[0] == fp[1] and fp[0] != fp[2]


# -- relational -----------------------------------------------------------


def test_snapshot_blocks_reference_semantics():
    """hist/incre split matches the reference's positional rule
    (/root/reference/src/helpers/Reader.py:81-92) on a pandas oracle."""
    from pisa_ray.pipelines.relational import snapshot_blocks, snapshot_boundaries

    ev = rd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_id", "user_id"])
    pdf = ev.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    n = len(pdf)
    bounds = snapshot_boundaries(n, 0.6, 5)
    assert bounds[0] == int(n * 0.6) and bounds[-1] == n
    blocks = snapshot_blocks(ev, ["ts", "event_id"], 0.6, 5)
    assert len(blocks) == 6
    lo = 0
    for b, hi in zip(blocks, bounds):
        got = b.to_pandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
        want = pdf.iloc[lo:hi].reset_index(drop=True)
        assert got["event_id"].tolist() == want["event_id"].tolist()
        lo = hi


def test_broadcast_joins():
    from pisa_ray.pipelines.relational import (
        broadcast_anti_join,
        broadcast_inner_join,
        broadcast_semi_join,
    )

    cust = rd.read_parquet(f"{SF}/customer.parquet")
    orders = rd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    keys = orders.unique("o_custkey")
    semi = broadcast_semi_join(cust, keys, "c_custkey").to_pandas()
    anti = broadcast_anti_join(cust, keys, "c_custkey").to_pandas()
    total = cust.count()
    assert len(semi) + len(anti) == total
    anti_keys = set(anti["c_custkey"]) if len(anti) else set()
    assert set(semi["c_custkey"]).isdisjoint(anti_keys)
    small = pd.DataFrame({"c_custkey": semi["c_custkey"], "flag": 1})
    joined = broadcast_inner_join(cust, small, "c_custkey").to_pandas()
    assert len(joined) == len(semi)


def _hj_fixture():
    """Two medium tables with skew, null keys and non-matching rows."""
    rng = np.random.default_rng(7)
    n_l, n_r = 4000, 3000
    lk = rng.integers(0, 500, n_l).astype("float64")
    lk[::97] = np.nan  # null join keys: must never match (SQL semantics)
    lk[:400] = 7.0  # hot key on the left
    left = pd.DataFrame(
        {"k": pd.array(lk, dtype="Int64"), "lv": np.arange(n_l, dtype=np.int64)}
    )
    rk = rng.integers(100, 650, n_r)  # keys 500-649 match nothing on the left
    right = pd.DataFrame(
        {"rk": rk.astype(np.int64), "rv": rng.normal(size=n_r).round(6)}
    )
    return left, right


@pytest.mark.parametrize("how,sql", [
    ("inner", "SELECT l.k, l.lv, r.rv FROM left_t l JOIN right_t r ON l.k = r.rk"),
    ("left", "SELECT l.k, l.lv, r.rv FROM left_t l LEFT JOIN right_t r ON l.k = r.rk"),
    ("full", "SELECT coalesce(l.k, r.rk) AS k, l.lv, r.rv "
             "FROM left_t l FULL OUTER JOIN right_t r ON l.k = r.rk"),
    ("semi", "SELECT l.k, l.lv FROM left_t l WHERE l.k IN (SELECT rk FROM right_t)"),
    ("anti", "SELECT l.k, l.lv FROM left_t l WHERE l.k IS NULL "
             "OR l.k NOT IN (SELECT rk FROM right_t)"),
])
def test_hash_join_vs_duckdb(how, sql):
    import duckdb

    from pisa_ray.pipelines.relational import hash_join

    left, right = _hj_fixture()
    con = duckdb.connect()
    con.register("left_t", left)
    con.register("right_t", right)
    want = con.execute(sql).df()

    got = hash_join(
        rd.from_pandas(left).repartition(7),
        rd.from_pandas(right).repartition(5),
        on="k", right_on="rk", how=how, num_partitions=6,
    ).to_pandas()
    if how == "full":
        # the wrapper keeps both key columns null-filled on the
        # unmatched side; coalesce like the SQL for comparison
        got["k"] = got["k"].where(got["k"].notna(), got.get("rk"))
        got = got[["k", "lv", "rv"]]
    cols = list(want.columns)
    norm = lambda df: (
        df[cols].astype({c: "float64" for c in cols})
        .sort_values(cols, kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(norm(got), norm(want))


def test_hash_join_hot_keys_split_identical():
    from pisa_ray.pipelines.relational import hash_join

    left, right = _hj_fixture()
    l = rd.from_pandas(left.dropna(subset=["k"])).repartition(7)
    r = rd.from_pandas(right).repartition(5)
    plain = hash_join(l, r, on="k", right_on="rk", how="inner").to_pandas()
    split = hash_join(
        l, r, on="k", right_on="rk", how="inner", hot_keys=[7, 130]
    ).to_pandas()
    cols = sorted(plain.columns)
    norm = lambda df: (
        df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(norm(split), norm(plain), check_dtype=False)


# -- multimodal -----------------------------------------------------------


def test_multimodal_decode_deterministic():
    from pisa_ray.pipelines.multimodal import decode_features, synth_media

    media = synth_media(32)
    a = decode_features(rd.from_arrow(media)).to_pandas().sort_values("media_id")
    b = decode_features(rd.from_arrow(media)).to_pandas().sort_values("media_id")
    assert a["n_bytes"].tolist() == b["n_bytes"].tolist()
    fa = np.asarray([np.asarray(x) for x in a["features"]])
    fb = np.asarray([np.asarray(x) for x in b["features"]])
    assert np.array_equal(fa, fb)
    assert fa.shape == (32, 8)
    assert ((fa >= 0) & (fa <= 1)).all()


def test_multimodal_wav_decode_real():
    """Hand-built WAV fixture: a 1 kHz sine at amplitude 0.5 must decode
    to its true sample rate / duration and an RMS envelope of a/sqrt(2)."""
    import io
    import wave as wavmod

    from pisa_ray.pipelines.multimodal import MediaDecoder, decode_wav

    t = np.arange(8000) / 8000.0
    pcm = np.clip(0.5 * np.sin(2 * np.pi * 1000 * t) * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    payload = buf.getvalue()

    x, rate, ch = decode_wav(payload)
    assert (rate, ch, x.shape) == (8000, 1, (8000, 1))
    dec, feats, meta = MediaDecoder()._decode_one(payload)
    assert dec == "wav"
    assert meta["sample_rate_hz"] == 8000 and meta["n_channels"] == 1
    assert abs(meta["duration_s"] - 1.0) < 1e-12
    assert np.allclose(feats, 0.5 / np.sqrt(2), atol=1e-3)


def test_multimodal_png_decode_real():
    """PNG encode->decode round-trip over ALL five scanline filters is
    pixel-identical, and MediaDecoder features equal numpy pixel stats."""
    import struct
    import zlib

    from pisa_ray.pipelines.multimodal import (
        _PNG_MAGIC,
        MediaDecoder,
        _png_filter_row,
        decode_png,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 7, 3)).astype(np.uint8)
    prev = np.zeros(7 * 3, dtype=np.uint8)
    raw = bytearray()
    for r in range(10):
        cur = img[r].reshape(-1)
        raw.append(r % 5)  # cycle filter types 0..4
        raw.extend(_png_filter_row(r % 5, cur, prev, 3).tobytes())
        prev = cur

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (_PNG_MAGIC + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 10, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    px, w, h, c = decode_png(payload)
    assert (w, h, c) == (7, 10, 3)
    assert np.array_equal(px, img)

    dec, feats, meta = MediaDecoder()._decode_one(payload)
    assert dec == "png"
    assert (meta["width"], meta["height"], meta["n_channels"]) == (7, 10, 3)
    flat = img.reshape(-1, 3) / 255.0
    assert np.allclose(feats[:3], flat.mean(axis=0))
    assert np.isclose(feats[3], flat.mean())
    assert np.allclose(feats[4:7], flat.std(axis=0))
    assert np.isclose(feats[7], flat.std())


def test_multimodal_decoder_dispatch():
    """synth_media payloads route to the right decoder per kind; a
    corrupt container degrades to the stub instead of crashing."""
    from pisa_ray.pipelines.multimodal import MediaDecoder, decode_features, synth_media

    media = synth_media(48)
    out = decode_features(rd.from_arrow(media)).to_pandas().sort_values("media_id")
    kinds = media["kind"].to_pylist()
    expect = {"audio": {"wav"}, "image": {"png", "bmp"}, "video": {"stub"}}
    for got, k in zip(out["decoder"].tolist(), kinds):
        assert got in expect[k], (got, k)
    audio = out[out["kind"] == "audio"]
    assert (audio["sample_rate_hz"] == 8000).all()
    assert (audio["duration_s"] > 0).all()
    image = out[out["kind"] == "image"]
    assert (image["width"] == media["width"].to_pandas()[out["kind"] == "image"]).all()
    # truncated PNG -> stub, loudly-but-safely
    png = media["payload"][kinds.index("image")].as_py()
    dec, _, _ = MediaDecoder()._decode_one(png[:20])
    assert dec == "stub"


def test_multimodal_resize_and_frames():
    from pisa_ray.pipelines.multimodal import (
        decode_features,
        resize_images,
        sample_frames,
        synth_media,
    )

    media = rd.from_arrow(__import__("pisa_ray.pipelines.multimodal", fromlist=["synth_media"]).synth_media(16))
    resized = resize_images(media, 32, 32).to_pandas()
    assert (resized["width"] == 32).all() and (resized["height"] == 32).all()
    frames = sample_frames(media, n_frames=3).to_pandas()
    assert len(frames) == 16 * 3
    assert set(frames["frame"]) == {0, 1, 2}
    # resize -> decode chains (schema compatibility)
    chained = decode_features(resize_images(media, 16, 16)).to_pandas()
    assert len(chained) == 16


# -- vectorized-kernel bit-identity vs scalar references ------------------


def test_simhash_batch_identical_to_scalar():
    from pisa_ray.pipelines.dedup import SimHasher

    texts = [
        "the quick brown fox the fox",
        "",
        "hello world hello",
        "a b c a b c d",
        "ünïcode tökens ünïcode mixed CASE Tokens",
        "x" * 5,
        "lorem ipsum dolor sit amet " * 20,
    ]
    sh = SimHasher()
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)}
    )
    vec = sh(batch)["simhash"].to_pylist()
    assert vec == [sh.sim64(t) for t in texts]


def test_fingerprint_batch_identical_to_scalar_fnv():
    import re

    from pisa_ray.pipelines.text import fingerprint64
    from pisa_ray.tokenizer import TOKEN_SPLIT_RE

    rx = re.compile(TOKEN_SPLIT_RE)

    def scalar_fp(text: str) -> int:
        h = np.uint64(0xCBF29CE484222325)
        with np.errstate(over="ignore"):
            for tok in rx.split(text.lower()):
                if not tok:
                    continue
                for byt in tok.encode("utf-8"):
                    h = (h ^ np.uint64(byt)) * np.uint64(0x100000001B3)
                h = (h ^ np.uint64(32)) * np.uint64(0x100000001B3)
        return int(h)

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "GAMMA", "delta_1", "x9", "Übung", "foo.bar", "qq"]
    texts = ["", "x" * 7, "single"] + [
        " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
        for _ in range(100)
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts))), "text": pa.array(texts)})
    )
    out = fingerprint64(ds).to_pandas().sort_values("doc_id")
    assert [int(x) for x in out["fingerprint"]] == [scalar_fp(t) for t in texts]


# -- distributed k-means (SURVEY T5; reference PISA.py:91-134) ------------


def test_kmeans_matches_numpy_oracle_at_two_parallelisms():
    from pisa_ray.pipelines.clustering import kmeans, kmeans_oracle

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((4, 8)) * 6.0
    X = np.concatenate(
        [c + rng.standard_normal((60, 8)) for c in centers]
    )
    ids = np.arange(X.shape[0], dtype=np.int64)
    C_gold, a_gold = kmeans_oracle(X, ids, k=4, seed=17)

    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    for nblocks in (1, 8):
        ds = rd.from_pandas(df).repartition(nblocks)
        C, assign = kmeans(ds, k=4, seed=17)
        out = assign.to_pandas().sort_values("vec_id")
        assert np.allclose(C, C_gold, atol=1e-8)
        assert out["cluster"].to_numpy().tolist() == a_gold.tolist()


def test_kmeans_empty_cluster_reinit_deterministic():
    """k larger than the natural cluster count forces empty-cluster
    reinitialization; results must still match the oracle and be
    identical across parallelism levels."""
    from pisa_ray.pipelines.clustering import kmeans, kmeans_oracle

    rng = np.random.default_rng(5)
    X = np.concatenate(
        [np.zeros((50, 4)) + rng.standard_normal((50, 4)) * 0.01,
         np.full((3, 4), 50.0) + rng.standard_normal((3, 4)) * 0.01]
    )
    ids = np.arange(X.shape[0], dtype=np.int64)
    C_gold, a_gold = kmeans_oracle(X, ids, k=6, n_iter=8, seed=3)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X)})
    outs = []
    for nblocks in (1, 4):
        C, assign = kmeans(rd.from_pandas(df).repartition(nblocks),
                           k=6, n_iter=8, seed=3)
        outs.append(assign.to_pandas().sort_values("vec_id")["cluster"].tolist())
        assert np.allclose(C, C_gold, atol=1e-8)
    assert outs[0] == outs[1] == a_gold.tolist()


def test_jsd_softmax_weights_vs_numpy():
    """T6 two-sided kernel: distributed JSD(prev, cur) must match a
    numpy oracle and be identical at two parallelism levels; ids on
    only one side are dropped (semi-join semantics)."""
    from pisa_ray.pipelines.clustering import jsd_softmax_weights

    rng = np.random.default_rng(9)
    C = rng.standard_normal((5, 6)) * 3.0
    n = 150
    prev_X = rng.standard_normal((n, 6))
    cur_X = prev_X + rng.standard_normal((n, 6)) * 0.3
    ids = np.arange(n, dtype=np.int64)

    def soft(X):
        d2 = ((X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :])
        z = -d2
        z -= z.max(1, keepdims=True)
        p = np.exp(z)
        return p / p.sum(1, keepdims=True)

    P, Q = soft(prev_X), soft(cur_X)
    M = 0.5 * (P + Q)
    gold = 0.5 * (
        (P * np.log(P / M)).sum(1) + (Q * np.log(Q / M)).sum(1)
    )
    gold_w = 1.0 / (1.0 + np.exp(-(gold - gold.mean())))

    prev_df = pd.DataFrame({"vec_id": ids, "embedding": list(prev_X)})
    # drop a few ids from the current side: they must vanish from output
    cur_df = pd.DataFrame({"vec_id": ids, "embedding": list(cur_X)}).iloc[5:]
    for nblocks in (1, 6):
        out = (
            jsd_softmax_weights(
                rd.from_pandas(prev_df).repartition(nblocks),
                rd.from_pandas(cur_df).repartition(nblocks),
                C,
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        assert out["vec_id"].tolist() == ids[5:].tolist()
        keep = gold[5:]
        keep_w = 1.0 / (1.0 + np.exp(-(keep - keep.mean())))
        assert np.allclose(out["jsd"].to_numpy(), keep, atol=1e-12)
        assert np.allclose(out["weight"].to_numpy(), keep_w, atol=1e-9)


def test_sessionize_matches_pandas_oracle_at_any_parallelism():
    """Two-stage sessionize (local partials -> per-key merge) is exact
    and partition-invariant, including a hot key whose events are
    sprayed across many tiny blocks (the skew case the single-groupby
    shape chokes on)."""
    from pisa_ray.pipelines.relational import sessionize

    rng = np.random.default_rng(7)
    gap = 1800
    base = np.int64(1_700_000_000_000_000)  # us epoch
    rows = []
    eid = 0
    for user in range(1, 9):
        t = base + np.int64(rng.integers(0, 3600 * 1_000_000))
        for _ in range(int(rng.integers(3, 40))):
            t += np.int64(rng.integers(1, 2 * gap) * 1_000_000)
            rows.append((user, t, eid))
            eid += 1
    # hot key: 3000 events, mixed tiny and huge gaps
    t = base
    for _ in range(3000):
        t += np.int64(rng.integers(1, 3 * gap) * 1_000_000)
        rows.append((999, t, eid))
        eid += 1
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    # oracle: plain sorted scan per user
    want = []
    for user, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        tsec = g["ts"].to_numpy().view("i8") // 1_000_000
        new = np.ones(len(g), dtype=bool)
        new[1:] = np.diff(tsec) > gap
        sess = np.cumsum(new) - 1
        for s in range(sess[-1] + 1):
            m = sess == s
            want.append((user, s + 1, g["ts"].to_numpy()[m][0], int(m.sum())))
    want = (
        pd.DataFrame(want, columns=["user_id", "session_id", "session_start", "n_events"])
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    # shuffle rows so blocks interleave users/time, then run at 1 and 37 blocks
    shuf = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    for nblocks in (1, 37):
        ds = rd.from_pandas(shuf).repartition(nblocks)
        got = (
            sessionize(ds, gap_seconds=gap)
            .to_pandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        got["session_start"] = got["session_start"].astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lsh_knn_multiprobe_recall(emb):
    """Distance-1 multi-probe (lowest-margin bit flips) strictly
    improves recall vs single-probe against the exact brute-force
    top-k, and stays deterministic."""
    from pisa_ray.pipelines.similarity import brute_knn, lsh_knn

    pdf = emb.to_pandas().head(12)
    q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    exact = brute_knn(emb, q, k=5)

    def recall(got):
        hits = 0
        for qi in range(len(q)):
            want = set(exact[exact.query_id == qi]["vec_id"])
            have = set(got[got.query_id == qi]["vec_id"])
            hits += len(want & have)
        return hits / (len(q) * 5)

    # 6 planes so buckets hold ~8 of the 500 vectors (at 10 planes the
    # toy corpus is all singleton buckets and recall is floor-limited)
    single = lsh_knn(emb, q, k=5, n_planes=6, n_probes=0)
    multi = lsh_knn(emb, q, k=5, n_planes=6, n_probes=6)
    r0, r6 = recall(single), recall(multi)
    assert r6 > r0  # measured 0.417 vs 0.233 on the seeded fixture
    assert r6 >= 0.4
    # deterministic across runs
    again = lsh_knn(emb, q, k=5, n_planes=6, n_probes=6)
    pd.testing.assert_frame_equal(multi, again)
    # OR-amplification (8 independent tables) clears the documented
    # >=0.8 recall bar (measured 0.91/0.97 at L=8/12 on the sf0.01
    # fixture; single-table multiprobe plateaus ~0.4)
    amp = lsh_knn(emb, q, k=5, n_planes=6, n_probes=6, n_tables=8)
    assert recall(amp) >= 0.8
    # multi-table dedup keeps ranks contiguous and unique per query
    per_q = amp.groupby("query_id")["rank"].apply(list)
    assert all(r == list(range(1, len(r) + 1)) for r in per_q)


def test_ivf_knn_exact_at_full_probe_and_self_hit(emb):
    """IVF-Flat: probing EVERY cluster scores every doc exactly once
    (each doc lives in one cluster), so n_probe == n_clusters must
    reproduce brute_knn exactly; at partial probe the query's own
    vector is in its home (first-probed) cluster -> rank-1 self hit.
    Deterministic across runs (seeded k-means init/reinit)."""
    from pisa_ray.pipelines.similarity import brute_knn, ivf_knn

    pdf = emb.to_pandas().head(8)
    q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])

    exact = brute_knn(emb, q, k=5)
    full = ivf_knn(emb, q, k=5, n_clusters=8, n_probe=8)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), exact.reset_index(drop=True), check_dtype=False
    )

    part = ivf_knn(emb, q, k=5, n_clusters=8, n_probe=2)
    for qi, vid in enumerate(pdf["vec_id"]):
        sub = part[(part.query_id == qi) & (part["rank"] == 1)]
        assert len(sub) == 1 and int(sub["vec_id"].iloc[0]) == int(vid)

    again = ivf_knn(emb, q, k=5, n_clusters=8, n_probe=2)
    pd.testing.assert_frame_equal(part, again)


def test_seeded_shuffle_and_sampling(docs):
    """K3/K4 (SURVEY §2.6): seeded random_shuffle is deterministic at
    fixed parallelism; random_sample returns a plausible uniform
    fraction without replacement."""
    ids = lambda ds: ds.to_pandas()["doc_id"].tolist()
    a = ids(docs.random_shuffle(seed=11))
    b = ids(docs.random_shuffle(seed=11))
    assert a == b and sorted(a) == sorted(ids(docs))
    n = docs.count()
    s = docs.random_sample(0.3, seed=5).to_pandas()
    assert 0.1 * n < len(s) < 0.5 * n
    assert s["doc_id"].is_unique


def test_reducers_keep_big_int64_exact():
    """Values beyond float64's exact range (2^53) must survive the
    exchange reducers bit-exactly — the pandas round trips used to
    upcast null-holding int columns to float64 and silently round
    (review findings: per_group_topk, stratified cut, asof join)."""
    from pisa_ray.pipelines.relational import (
        asof_join, per_group_topk, stratified_sample,
    )

    import ray

    def arrow_of(ds) -> pa.Table:
        # read the BLOCKS as Arrow: a .to_pandas() here would itself
        # upcast null-holding int64 to float64 and mask the very
        # corruption under test
        tabs = [ray.get(r) for r in ds.to_arrow_refs()]
        return pa.concat_tables([t for t in tabs if t.num_rows])

    big = 2**53 + 1  # rounds to 2**53 through float64
    t = pa.table(
        {
            "g": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
            "s": pa.array([3.0, 1.0, 2.0, 9.0, 8.0]),
            # nullable big-int payload: the poison combination
            "payload": pa.array([big, None, big + 2, big + 4, None],
                                type=pa.int64()),
        }
    )
    out = arrow_of(per_group_topk(rd.from_arrow(t), "g", ["s"], [False], k=2))
    assert out.schema.field("payload").type == pa.int64()
    got = sorted(
        v for g, v in zip(out["g"].to_pylist(), out["payload"].to_pylist())
        if g == 1 and v is not None
    )
    assert got == [big, big + 2]

    samp = arrow_of(
        stratified_sample(
            rd.from_arrow(t.append_column(
                "id", pa.array([1, 2, 3, 4, 5], type=pa.int64())
            )),
            "g", 2, "id",
        )
    )
    assert samp.schema.field("payload").type == pa.int64()
    assert set(samp["payload"].to_pylist()) <= {big, big + 2, big + 4, None}

    left = pa.table(
        {
            "k": pa.array([1, 1], type=pa.int64()),
            "ts": pa.array([10, 20], type=pa.int64()),
            "lbig": pa.array([big, big + 2], type=pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array([1], type=pa.int64()),
            "ts": pa.array([15], type=pa.int64()),
            "rbig": pa.array([big + 4], type=pa.int64()),
        }
    )
    j = arrow_of(
        asof_join(rd.from_arrow(left), rd.from_arrow(right), "k", "ts",
                  ["rbig"])
    )
    assert j.schema.field("lbig").type == pa.int64()
    assert j.schema.field("rbig_right").type == pa.int64()
    assert sorted(j["lbig"].to_pylist()) == [big, big + 2]
    assert [v for v in j["rbig_right"].to_pylist() if v is not None] == [
        big + 4
    ]


def test_asof_join_guards_collision_and_key_dtype():
    """(a) suffixed right columns colliding with left columns raise
    up front (the left data used to be silently nulled); (b) a
    mismatched right key dtype casts to the left's instead of
    crashing pa.concat_tables deep in the exchange."""
    from pisa_ray.pipelines.relational import asof_join

    left = pa.table(
        {
            "k": pa.array([1], type=pa.int64()),
            "ts": pa.array([10], type=pa.int64()),
            "v_right": pa.array([7], type=pa.int64()),  # collides
        }
    )
    right = pa.table(
        {
            "k": pa.array([1], type=pa.int64()),
            "ts": pa.array([5], type=pa.int64()),
            "v": pa.array([1], type=pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right), "k", "ts",
                  ["v"])
    # int32 right key joins against an int64 left key
    left2 = pa.table(
        {
            "k": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([10, 10], type=pa.int64()),
        }
    )
    right2 = pa.table(
        {
            "k": pa.array([1], type=pa.int32()),
            "ts": pa.array([5], type=pa.int64()),
            "w": pa.array([3.5]),
        }
    )
    j = (
        asof_join(rd.from_arrow(left2), rd.from_arrow(right2), "k", "ts",
                  ["w"])
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(j["k"]) == [1, 2]
    assert j["w_right"].notna().tolist() == [True, False]


def test_fuzzy_join_rejects_null_ids_and_hopping_drops_null_ts():
    from pisa_ray.pipelines.relational import fuzzy_join, hopping_window_agg

    a = pa.table(
        {
            "left_id": pa.array([1, None], type=pa.int64()),
            "name": pa.array(["alpha", "beta"]),
        }
    )
    b = pa.table(
        {
            "right_id": pa.array([10], type=pa.int64()),
            "name": pa.array(["alpha"]),
        }
    )
    import ray

    with pytest.raises((ValueError, ray.exceptions.RayTaskError)) as ei:
        fuzzy_join(rd.from_arrow(a), rd.from_arrow(b), on="name").count()
    assert "contains nulls" in str(ei.value)

    ev = pa.table(
        {
            "ts": pa.array(
                [1_000_000, None, 7_000_000], type=pa.timestamp("us")
            ),
            "k": pa.array([1, 1, 1], type=pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = hopping_window_agg(
        rd.from_arrow(ev), "ts", "k", "v", size_seconds=10, hop_seconds=5
    ).to_pandas()
    # the null-ts row contributes to NO window: total events across
    # windows = 2 live rows x 2 covering windows each
    assert out["n_events"].sum() == 4
    assert out["sum_value"].sum() == (1.0 + 3.0) * 2


def test_asof_join_matches_pandas_oracle_at_any_parallelism():
    """Hash-partitioned as-of join (union + one groupby(key) +
    per-group merge_asof) equals a global pd.merge_asof(by=key) at
    every block layout, both directions, including keys with no right
    rows (null fill) and right-only keys (no output)."""
    from pisa_ray.pipelines.relational import asof_join

    rng = np.random.default_rng(11)
    base = np.int64(1_700_000_000_000_000)
    lrows, rrows = [], []
    for key in range(1, 8):
        for i in range(int(rng.integers(3, 25))):
            lrows.append((key, base + np.int64(rng.integers(0, 10**9)), len(lrows)))
        if key != 3:  # key 3 has no right rows at all
            for i in range(int(rng.integers(1, 20))):
                rrows.append((key, base + np.int64(rng.integers(0, 10**9)), float(len(rrows))))
    rrows.append((42, base, -1.0))  # right-only key: must not appear
    lf = pd.DataFrame(lrows, columns=["key", "ts", "lid"])
    rf = pd.DataFrame(rrows, columns=["key", "ts", "rv"])
    for c in (lf, rf):
        c["ts"] = c["ts"].astype("datetime64[us]")

    for direction in ("backward", "forward"):
        want = pd.merge_asof(
            lf.sort_values("ts", kind="mergesort"),
            rf.sort_values("ts", kind="mergesort").rename(
                columns={"ts": "ts_right", "rv": "rv_right"}
            ),
            left_on="ts",
            right_on="ts_right",
            by="key",
            direction=direction,
        ).sort_values("lid").reset_index(drop=True)
        for nblocks in (1, 13):
            got = (
                asof_join(
                    rd.from_pandas(lf).repartition(nblocks),
                    rd.from_pandas(rf).repartition(nblocks),
                    "key",
                    "ts",
                    ["rv"],
                    direction=direction,
                )
                .to_pandas()
                .sort_values("lid")
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got[want.columns.tolist()], want, check_dtype=False
            )
    # key 3 rows survive with nulls
    assert want[want["key"] == 3]["rv_right"].isna().all()
    assert (want["key"] != 42).all()


def test_asof_join_salted_matches_oracle_and_spreads_hot_key():
    """salt_bucket_seconds shards each key's rows into (key, ts bucket)
    groups with an exact carry pass. Checks: (a) salted == global
    pd.merge_asof on a multi-key fixture, both directions, including a
    key with no right rows; (b) a hot key holding 1e6 right rows
    spread over many blocks still joins exactly — no single reducer
    ever needs the whole key (the VERDICT #5 scale contract)."""
    from pisa_ray.pipelines.relational import asof_join

    rng = np.random.default_rng(23)
    base = np.int64(1_700_000_000_000_000)
    lrows, rrows = [], []
    for key in range(1, 7):
        for _ in range(int(rng.integers(5, 30))):
            lrows.append((key, base + np.int64(rng.integers(0, 10**9)), len(lrows)))
        if key != 4:  # key 4: no right rows -> null fill must survive salting
            for _ in range(int(rng.integers(1, 25))):
                rrows.append((key, base + np.int64(rng.integers(0, 10**9)), float(len(rrows))))
    lf = pd.DataFrame(lrows, columns=["key", "ts", "lid"])
    rf = pd.DataFrame(rrows, columns=["key", "ts", "rv"])
    for c in (lf, rf):
        c["ts"] = c["ts"].astype("datetime64[us]")

    for direction in ("backward", "forward"):
        want = pd.merge_asof(
            lf.sort_values("ts", kind="mergesort"),
            rf.sort_values("ts", kind="mergesort").rename(
                columns={"ts": "ts_right", "rv": "rv_right"}
            ),
            left_on="ts",
            right_on="ts_right",
            by="key",
            direction=direction,
        ).sort_values("lid").reset_index(drop=True)
        # bucket ~60 s vs a ~16 min ts span -> rows straddle many buckets
        got = (
            asof_join(
                rd.from_pandas(lf).repartition(9),
                rd.from_pandas(rf).repartition(9),
                "key",
                "ts",
                ["rv"],
                direction=direction,
                salt_bucket_seconds=60,
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False
        )
    assert want[want["key"] == 4]["rv_right"].isna().all()

    # (b) hot key: 1e6 right rows on ONE key; bucket size chosen so the
    # key shatters into ~250 groups. Distinct right timestamps (a
    # permutation) keep the oracle tie-free.
    n_r, n_l = 1_000_000, 3_000
    r_ts = base + rng.permutation(np.int64(4) * n_r)[:n_r].astype(np.int64)
    l_ts = base + rng.integers(-10**6, np.int64(4) * n_r + 10**6, n_l)
    hot_l = pd.DataFrame({"key": np.int64(7), "ts": l_ts, "lid": np.arange(n_l)})
    hot_r = pd.DataFrame(
        {"key": np.int64(7), "ts": r_ts, "rv": rng.standard_normal(n_r)}
    )
    for c in (hot_l, hot_r):
        c["ts"] = c["ts"].astype("datetime64[us]")
    want = pd.merge_asof(
        hot_l.sort_values("ts", kind="mergesort"),
        hot_r.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "ts_right", "rv": "rv_right"}
        ),
        left_on="ts",
        right_on="ts_right",
        by="key",
        direction="backward",
    ).sort_values("lid").reset_index(drop=True)
    got = (
        asof_join(
            rd.from_pandas(hot_l).repartition(8),
            rd.from_pandas(hot_r).repartition(32),
            "key",
            "ts",
            ["rv"],
            salt_bucket_seconds=16,  # 4e6 us span / 16 s ≈ 250 buckets
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_range_join_disjoint_and_overlapping():
    """Broadcast range join: searchsorted fast path on disjoint bands
    (inner + left), dense containment-mask path on overlapping ranges;
    both equal a brute-force per-row scan."""
    from pisa_ray.pipelines.relational import range_join

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"rid": np.arange(500), "v": np.round(rng.uniform(-10, 110, 500), 3)}
    )
    ds = rd.from_pandas(df).repartition(7)
    bands = pd.DataFrame(
        {"band": ["a", "b", "c"], "lo": [0.0, 25.0, 70.0], "hi": [25.0, 50.0, 100.0]}
    )

    def brute(ranges):
        rows = []
        for _, r in df.iterrows():
            for _, b in ranges.iterrows():
                if b["lo"] <= r["v"] < b["hi"]:
                    rows.append((r["rid"], r["v"], b["band"], b["lo"], b["hi"]))
        return (
            pd.DataFrame(rows, columns=["rid", "v", "band", "lo", "hi"])
            .sort_values(["rid", "band"])
            .reset_index(drop=True)
        )

    got = (
        range_join(ds, bands, "v")
        .to_pandas()
        .sort_values(["rid", "band"])
        .reset_index(drop=True)
    )
    got["rid"] = got["rid"].astype("int64")
    pd.testing.assert_frame_equal(got, brute(bands), check_dtype=False)

    left = range_join(ds, bands, "v", how="left").to_pandas()
    assert len(left) == len(df)
    miss = left["band"].isna()
    vv = df.sort_values("rid")["v"].to_numpy()
    want_miss = (vv < 0) | (vv >= 100) | ((vv >= 50) & (vv < 70))  # inter-band gap
    assert int(want_miss.sum()) == int(miss.sum())

    overl = pd.DataFrame(
        {"band": ["x", "y"], "lo": [0.0, 20.0], "hi": [60.0, 100.0]}
    )
    got2 = (
        range_join(ds, overl, "v")
        .to_pandas()
        .sort_values(["rid", "band"])
        .reset_index(drop=True)
    )
    got2["rid"] = got2["rid"].astype("int64")
    pd.testing.assert_frame_equal(got2, brute(overl), check_dtype=False)
    with pytest.raises(ValueError):
        range_join(ds, overl, "v", how="left")


def test_hopping_window_matches_brute_force():
    """size/hop fan-out inside map_batches + one groupby equals a
    per-event brute-force window enumeration, at two block layouts."""
    from pisa_ray.pipelines.relational import hopping_window_agg

    rng = np.random.default_rng(3)
    n = 700
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 6 * 3600 * 1_000_000, n)
    df = pd.DataFrame(
        {
            "ts": ts.astype("datetime64[us]"),
            "k": rng.choice(["a", "b"], n),
            "v": np.round(rng.uniform(0, 10, n), 3),
        }
    )
    size, hop = 3 * 3600, 3600
    rows = []
    for _, r in df.iterrows():
        t = int(pd.Timestamp(r["ts"]).value // 1000)  # us
        last = (t // (hop * 1_000_000)) * hop * 1_000_000
        s = last
        while s > t - size * 1_000_000:
            rows.append((np.datetime64(s, "us"), r["k"], r["v"]))
            s -= hop * 1_000_000
    want = (
        pd.DataFrame(rows, columns=["window", "k", "v"])
        .groupby(["window", "k"], as_index=False)
        .agg(n_events=("v", "size"), sum_value=("v", "sum"))
        .sort_values(["window", "k"])
        .reset_index(drop=True)
    )
    for nblocks in (1, 9):
        got = (
            hopping_window_agg(
                rd.from_pandas(df).repartition(nblocks), "ts", "k", "v", size, hop
            )
            .to_pandas()
            .sort_values(["window", "k"])
            .reset_index(drop=True)
        )
        got["window"] = got["window"].astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stratified_sample_deterministic_and_bounded():
    from pisa_ray.pipelines.relational import stratified_sample

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "id": np.arange(1000, dtype=np.int64),
            "key": rng.choice(["x", "y", "z", "rare"], 1000, p=[0.5, 0.3, 0.198, 0.002]),
        }
    )
    outs = []
    for nblocks in (1, 17):
        out = (
            stratified_sample(
                rd.from_pandas(df).repartition(nblocks), "key", 7, "id"
            )
            .to_pandas()
            .sort_values(["key", "id"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    cnt = outs[0].groupby("key").size()
    full = df.groupby("key").size()
    for k in full.index:
        assert cnt.get(k, 0) == min(7, full[k])  # rare keys keep all rows
    # a different seed picks a different subset
    other = (
        stratified_sample(rd.from_pandas(df), "key", 7, "id", seed=123)
        .to_pandas()
        .sort_values(["key", "id"])
        .reset_index(drop=True)
    )
    assert not other["id"].equals(outs[0]["id"])


def test_string_keys_route_through_exchange(monkeypatch):
    """String group keys no longer fall back to per-group map_groups:
    per_group_topk / stratified_sample / sessionize all route through
    hash_group_apply (FNV routing hash) and produce exactly what the
    generic pandas oracle produces."""
    import pisa_ray.shuffle as shuffle_mod
    from pisa_ray.pipelines.relational import (
        per_group_topk,
        sessionize,
        stratified_sample,
    )

    calls = []
    real = shuffle_mod.hash_group_apply

    def spy(ds, key_col, reduce_fn, *a, **kw):
        calls.append(key_col)
        return real(ds, key_col, reduce_fn, *a, **kw)

    monkeypatch.setattr(shuffle_mod, "hash_group_apply", spy)

    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame(
        {
            "cat": rng.choice(["alpha", "beta", "gamma", "δδ-unicode"], n),
            "score": rng.normal(size=n).round(6),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(9)

    got = (
        per_group_topk(ds, "cat", ["score", "id"], [False, True], 3)
        .to_pandas()
        .sort_values(["cat", "rank"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["score", "id"], ascending=[False, True])
        .groupby("cat")
        .head(3)
        .sort_values(["cat", "score"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == want["id"].tolist()

    samp = (
        stratified_sample(ds, "cat", 5, "id")
        .to_pandas()
        .sort_values(["cat", "id"])
        .reset_index(drop=True)
    )
    assert (samp.groupby("cat").size() <= 5).all()
    # deterministic at another parallelism
    samp2 = (
        stratified_sample(rd.from_pandas(df).repartition(2), "cat", 5, "id")
        .to_pandas()
        .sort_values(["cat", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(samp, samp2)

    ev = pd.DataFrame(
        {
            "user_id": rng.choice(["u-a", "u-b", "u-c"], 300),
            "ts": pd.to_datetime(
                1_700_000_000_000_000
                + np.sort(rng.integers(0, 3 * 3600, 300)) * 1_000_000,
                unit="us",
            ),
            "event_id": np.arange(300, dtype=np.int64),
        }
    )
    sess = (
        sessionize(rd.from_pandas(ev).repartition(7), gap_seconds=600)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    # oracle: sorted scan per user
    want_rows = []
    for user, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        tsec = g["ts"].astype("datetime64[us]").to_numpy().view("i8") // 1_000_000
        new = np.ones(len(g), dtype=bool)
        new[1:] = np.diff(tsec) > 600
        sid = np.cumsum(new)
        for s in range(1, sid[-1] + 1):
            m = sid == s
            want_rows.append((user, s, g["ts"].to_numpy()[m][0], int(m.sum())))
    want_sess = pd.DataFrame(
        want_rows, columns=["user_id", "session_id", "session_start", "n_events"]
    )
    sess["session_start"] = sess["session_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(sess, want_sess, check_dtype=False)

    assert calls == ["cat", "cat", "cat", "user_id"], calls


def test_jaccard_pairs_exact_join(docs):
    """Exact shingle-inverted-index Jaccard join: planted exact dups
    score 1.0, a lightly-mangled twin scores high, unrelated docs never
    cross the threshold; identical output at two parallelism levels."""
    from pisa_ray.pipelines.dedup import jaccard_pairs, ngram_jaccard

    base = docs.to_pandas()[["doc_id", "text"]].head(60)
    twin = base.head(4).copy()
    twin["doc_id"] = twin["doc_id"] + 100_000  # exact dups -> jaccard 1.0
    near = base.iloc[[5]].copy()
    near["doc_id"] = near["doc_id"] + 200_000
    near["text"] = near["text"] + " zzz qqq"  # near-dup, jaccard < 1
    df = pd.concat([base, twin, near], ignore_index=True)
    outs = []
    for nblocks in (1, 11):
        out = (
            jaccard_pairs(rd.from_pandas(df).repartition(nblocks), threshold=0.5)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = {(a, b): j for a, b, j in outs[0].itertuples(index=False)}
    for _, r in twin.iterrows():
        assert got.get((r["doc_id"] - 100_000, r["doc_id"])) == 1.0
    near_key = (near["doc_id"].iloc[0] - 200_000, near["doc_id"].iloc[0])
    want_j = ngram_jaccard(base.iloc[5]["text"], near["text"].iloc[0])
    assert abs(got[near_key] - want_j) < 1e-9
    # max_df skips ubiquitous shingles -> subset of the exact result
    capped = (
        jaccard_pairs(rd.from_pandas(df), threshold=0.5, max_df=3)
        .to_pandas()
    )
    assert set(zip(capped["id_a"], capped["id_b"])) <= set(got)


def test_quantile_disc_exact_vs_numpy():
    """Bit-pattern bisection quantiles equal the sorted-array element at
    floor((n-1)*q), including negatives, duplicates and exact-float
    landings, at two block layouts."""
    from pisa_ray.pipelines.relational import quantile_disc

    rng = np.random.default_rng(2)
    v = np.concatenate(
        [
            rng.normal(-50, 400, 3000).round(2),
            np.repeat([7.25, -1.5], 200),  # heavy duplicates
            [-0.0, 0.0],
        ]
    )
    df = pd.DataFrame({"x": v})
    s = np.sort(v)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    want = [s[min(len(s) - 1, int(np.floor((len(s) - 1) * q)))] for q in qs]
    for nblocks in (1, 9):
        out = quantile_disc(rd.from_pandas(df).repartition(nblocks), "x", qs)
        assert out["q"].tolist() == qs
        assert np.array_equal(out["x"].to_numpy(), np.asarray(want)), (
            out["x"].tolist(),
            want,
        )


def test_quantile_disc_excludes_nan():
    """NaN rows are excluded (SQL quantile_disc / NULL semantics) —
    they must neither count toward n nor surface as upper quantiles
    (advisor finding: the IEEE total-order view sorts NaN above +inf)."""
    from pisa_ray.pipelines.relational import quantile_disc

    rng = np.random.default_rng(7)
    clean = rng.normal(0, 10, 999).round(3)
    v = np.concatenate([clean, np.full(173, np.nan)])
    rng.shuffle(v)
    s = np.sort(clean)  # oracle over the NaN-free column
    qs = [0.0, 0.5, 0.9, 0.99, 1.0]
    want = [s[min(len(s) - 1, int(np.floor((len(s) - 1) * q)))] for q in qs]
    for nblocks in (1, 7):
        out = quantile_disc(
            rd.from_pandas(pd.DataFrame({"x": v})).repartition(nblocks), "x", qs
        )
        got = out["x"].to_numpy()
        assert not np.isnan(got).any()
        assert np.array_equal(got, np.asarray(want)), (got.tolist(), want)


# -- PII ---------------------------------------------------------------------


def test_pii_stats_and_redact():
    from pisa_ray.pipelines.text import pii_redact, pii_stats

    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "mail a@b.co and x.y+z@q.org twice",
                    "server 10.0.0.1 then call +4915112345678 ok",
                    "ssn 123-45-6789 here",
                    "clean text with no pii at all",
                ],
            }
        )
    )
    st = pii_stats(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert st["n_email"].tolist() == [2, 0, 0, 0]
    assert st["n_ipv4"].tolist() == [0, 1, 0, 0]
    assert st["n_phone"].tolist() == [0, 1, 0, 0]
    assert st["n_ssn"].tolist() == [0, 0, 1, 0]
    assert st["has_pii"].tolist() == [True, True, True, False]
    red = pii_redact(ds).to_pandas().sort_values("doc_id")["redacted"].tolist()
    assert red[0] == "mail <EMAIL> and <EMAIL> twice"
    assert red[1] == "server <IP> then call <PHONE> ok"
    assert red[2] == "ssn <SSN> here"
    assert red[3] == "clean text with no pii at all"


# -- decontamination ---------------------------------------------------------


def test_decontaminate_planted_overlap_any_parallelism():
    import ray

    from pisa_ray.pipelines.dedup import benchmark_kgrams, decontaminate

    bench = rd.from_pandas(
        pd.DataFrame({"text": ["the quick brown fox jumps over", "alpha beta gamma delta"]})
    )
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "we saw the quick brown fox jumps high today",  # 3 overlapping 3-grams
                "completely disjoint text with no shared grams",
                "ends with alpha beta gamma",  # 1 overlapping 3-gram
                "short",  # < k tokens
            ],
        }
    )
    grams = benchmark_kgrams(bench, k=3)
    ref = ray.put(grams)
    for parts in (1, 4):
        out = (
            decontaminate(rd.from_pandas(train).repartition(parts), ref, k=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["n_overlap"].tolist() == [3, 0, 1, 0]
        assert out["contaminated"].tolist() == [True, False, True, False]


# -- phrase search -----------------------------------------------------------


def test_phrase_search_vs_naive_oracle(tmp_path):
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.phrase import normalize_phrase, phrase_search
    from pisa_ray.tokenizer import tokenize_py

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "fast merge join over sorted runs",
                "merge join and hash join compared",
                "a merge then a join but not adjacent",
                "MERGE;;JOIN punctuation still matches",  # normalizes to "merge join"
                "hash join only here",
                "join merge reversed order",
                "fast merge join fast merge join twice",
                "unrelated content entirely",
            ],
        }
    )
    idx = str(tmp_path / "idx")
    build_index(
        pa.Table.from_pandas(docs),
        idx,
        IndexConfig(
            id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
            bucket_bits=1, term_parts=4, lineage_parts=1,
        ),
    )
    queries = [(0, "merge join"), (1, "fast merge join"), (2, "absent phrase")]
    out = phrase_search(queries, idx, rd.from_pandas(docs))

    def naive(phrase: str) -> list[int]:
        p = normalize_phrase(phrase)
        hits = []
        for did, text in zip(docs["doc_id"], docs["text"]):
            s = " " + " ".join(tokenize_py(text)) + " "
            if f" {p} " in s:
                hits.append(int(did))
        return sorted(hits)

    for qid, phrase in queries:
        got = out[out["query_id"] == qid]["doc_id"].tolist()
        assert got == naive(phrase), (qid, phrase)
    assert naive("merge join") == [0, 1, 3, 6]  # the fixture bites


def test_proximity_search_vs_naive_oracle(tmp_path):
    """Windowed co-occurrence: every (query, doc, span) must equal a
    brute-force min-cover scan over the tokenized corpus, including on
    a 150-doc synthetic corpus (not just the hand fixture)."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.phrase import _min_cover_span, proximity_search
    from pisa_ray.synth import make_corpus
    from pisa_ray.tokenizer import tokenize_py

    def naive(docs_df, queries, window):
        rows = []
        for qid, text in queries:
            terms = sorted(set(tokenize_py(text)))
            for did, t in zip(docs_df["doc_id"], docs_df["text"]):
                toks = tokenize_py(t)
                pos, lab = [], []
                for i, tok in enumerate(toks):
                    if tok in terms:
                        pos.append(i)
                        lab.append(terms.index(tok))
                if len(set(lab)) == len(terms):
                    span = _min_cover_span(
                        np.asarray(pos), np.asarray(lab), len(terms)
                    )
                    if span <= window:
                        rows.append((qid, int(did), span))
        return sorted(rows)

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "alpha x x beta",          # span 4
                "beta alpha",              # span 2 (unordered)
                "alpha x x x x x beta",    # span 7
                "alpha only here",
                "beta only here",
                "alpha beta alpha x beta",  # span 2
            ],
        }
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(
        id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
        bucket_bits=1, term_parts=4, lineage_parts=1,
    )
    build_index(pa.Table.from_pandas(docs), idx, cfg)
    queries = [(0, "alpha beta"), (1, "alpha missingterm")]
    out = proximity_search(queries, idx, rd.from_pandas(docs), window=4)
    got = sorted(zip(out["query_id"], out["doc_id"], out["span"]))
    assert got == naive(docs, queries, 4)
    assert (0, 0, 4) in got and (0, 1, 2) in got and (0, 5, 2) in got
    assert not any(q == 1 for q, _, _ in got)
    # window = k degenerates to unordered adjacency
    out2 = proximity_search(queries, idx, rd.from_pandas(docs), window=2)
    assert sorted(zip(out2["query_id"], out2["doc_id"], out2["span"])) == naive(
        docs, queries, 2
    )

    # synthetic corpus, 3-term query, two windows
    corpus = make_corpus(150, n_partitions=2)
    sdocs = pd.DataFrame(
        {
            "doc_id": np.arange(150, dtype=np.int64),
            "text": corpus["content"].to_pylist(),
        }
    )
    idx2 = str(tmp_path / "idx2")
    build_index(pa.Table.from_pandas(sdocs), idx2, cfg)
    toks0 = tokenize_py(sdocs["text"][0])
    q3 = [(7, " ".join(toks0[:3])), (8, toks0[0])]
    for w in (6, 12):
        out3 = proximity_search(q3, idx2, rd.from_pandas(sdocs), window=w)
        assert (
            sorted(zip(out3["query_id"], out3["doc_id"], out3["span"]))
            == naive(sdocs, q3, w)
        )


def test_snippets_best_window_and_token_space(tmp_path):
    """Snippet extraction picks the width-window with the most DISTINCT
    query terms (earliest on ties), emits normalized-token text, and
    only produces rows for requested (query, doc) hit pairs."""
    from pisa_ray.pipelines.phrase import snippets

    filler = " ".join(f"f{i}" for i in range(30))
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                # alpha alone early; alpha+beta together late -> the
                # 2-distinct window must win over the earlier 1-match
                f"alpha {filler} alpha x beta tail",
                "beta first here",
                f"ALPHA, beta! {filler}",  # normalization: both in window 0
                "no match at all",
            ],
        }
    )
    hits = pd.DataFrame(
        {"query_id": [0, 0, 0], "doc_id": [0, 2, 1]}
    )
    out = snippets(
        [(0, "alpha beta")], hits, rd.from_pandas(docs), width=6
    )
    assert list(out["doc_id"]) == [0, 1, 2]
    r0 = out[out.doc_id == 0].iloc[0]
    assert r0["n_matched"] == 2
    toks0 = docs["text"][0].lower().split()
    assert r0["tok_start"] > 1  # skipped the early single-term window
    assert "alpha x beta" in r0["snippet"]
    assert r0["snippet"] == " ".join(
        toks0[r0["tok_start"]:r0["tok_start"] + 6]
    )
    r1 = out[out.doc_id == 1].iloc[0]
    assert r1["n_matched"] == 1 and r1["tok_start"] == 0
    r2 = out[out.doc_id == 2].iloc[0]
    assert r2["n_matched"] == 2 and r2["snippet"].startswith("alpha beta")
    # doc 3 was not in hits: no row
    assert set(out["doc_id"]) == {0, 1, 2}
    # unknown query ids in hits are ignored, empty hits -> empty frame
    empty = snippets([(0, "alpha")], hits.iloc[:0], rd.from_pandas(docs))
    assert len(empty) == 0


def test_unigram_nll_vs_pandas_oracle(docs):
    from collections import Counter

    from pisa_ray.pipelines.text import unigram_nll
    from pisa_ray.tokenizer import tokenize_py

    out = unigram_nll(docs).to_pandas().set_index("doc_id")
    pdf = docs.to_pandas()
    tf = Counter()
    toks = {int(r.doc_id): tokenize_py(r.text) for r in pdf.itertuples()}
    for ts in toks.values():
        tf.update(ts)
    total = sum(tf.values())
    for did, ts in toks.items():
        if not ts:
            assert did not in out.index
            continue
        nll = -np.mean([np.log(tf[t] / total) for t in ts])
        assert out.loc[did, "n_tokens"] == len(ts)
        assert abs(out.loc[did, "nll"] - round(nll, 6)) <= 1e-6


def test_unigram_nll_external_model_oov_floor():
    from pisa_ray.pipelines.text import unigram_model, unigram_nll

    train = rd.from_items(
        [{"doc_id": 0, "text": "alpha beta beta"}, {"doc_id": 1, "text": "alpha"}]
    )
    model = unigram_model(train)
    score = unigram_nll(
        rd.from_items([{"doc_id": 7, "text": "zzz_unseen alpha"}]), model=model
    ).to_pandas()
    # alpha: ln(2/4); OOV floors at the model minimum ln(1/4)... beta has
    # tf 2 too, min logp is alpha/beta at ln(2/4)? no: vocab tfs are
    # alpha=2, beta=2 -> min logp = ln(0.5); OOV scores ln(0.5)
    exp = -(np.log(2 / 4) + np.log(2 / 4)) / 2
    assert abs(score["nll"][0] - round(exp, 6)) <= 1e-6


def test_semantic_dedup_planted(emb):
    from pisa_ray.pipelines.dedup import semantic_dedup

    base = emb.to_pandas()
    twins = base.head(4).copy()
    twins["vec_id"] = twins["vec_id"] + 50_000  # identical vectors, later ids
    ds = rd.from_pandas(pd.concat([base, twins], ignore_index=True))
    out = semantic_dedup(ds, n_clusters=4, threshold=0.999).to_pandas()
    planted = out[out["vec_id"] >= 50_000]
    # every planted twin is flagged against its original
    assert set(planted["vec_id"]) == set(twins["vec_id"])
    got = dict(zip(planted["vec_id"], planted["dup_of"]))
    for vid in twins["vec_id"]:
        assert got[vid] == vid - 50_000
    assert (planted["cosine"] >= 0.999).all()


def test_semantic_dedup_parallelism_invariant(emb):
    from pisa_ray.pipelines.dedup import semantic_dedup

    base = emb.to_pandas()
    twins = base.head(3).copy()
    twins["vec_id"] = twins["vec_id"] + 50_000
    both = pd.concat([base, twins], ignore_index=True)
    outs = []
    for nparts in (1, 7):
        ds = rd.from_pandas(both).repartition(nparts)
        outs.append(
            semantic_dedup(ds, n_clusters=4, threshold=0.999)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_unigram_model_top_v_cap():
    from pisa_ray.pipelines.text import unigram_model, unigram_nll

    train = rd.from_items(
        [
            {"doc_id": 0, "text": "aa aa aa bb bb cc"},  # tfs: aa=3 bb=2 cc=1
        ]
    )
    m = unigram_model(train, top_v=2).to_pandas().set_index("term")
    assert set(m.index) == {"aa", "bb"}
    # probabilities stay calibrated against the FULL total (6 tokens)
    assert abs(m.loc["aa", "logp"] - np.log(3 / 6)) < 1e-12
    assert abs(m.loc["bb", "logp"] - np.log(2 / 6)) < 1e-12
    # cc is now OOV -> scores at the calibrated OOV bucket: the cut
    # mass (1 token) spread over the 1 cut term = ln(1/6) — here
    # exactly cc's true probability, not the kept-vocab floor ln(2/6)
    s = unigram_nll(
        rd.from_items([{"doc_id": 1, "text": "cc"}]),
        model=unigram_model(train, top_v=2),
    ).to_pandas()
    assert abs(s["nll"][0] - round(-np.log(1 / 6), 6)) <= 1e-6
    # uncapped model keeps min-logp floor semantics for external OOV
    s2 = unigram_nll(
        rd.from_items([{"doc_id": 2, "text": "zz"}]),
        model=unigram_model(train),
    ).to_pandas()
    assert abs(s2["nll"][0] - round(-np.log(1 / 6), 6)) <= 1e-6


# -- grouped window functions ----------------------------------------------


def _win_fixture(dup_times: bool = False):
    rng = np.random.default_rng(11)
    n = 5000
    k = rng.integers(0, 120, n).astype(np.int64)
    t = rng.integers(0, 400 if dup_times else 10**6, n).astype(np.int64)
    if not dup_times:
        # unique (k, t): lag/row_number/cumsum need a total order
        df = pd.DataFrame({"k": k, "t": t}).drop_duplicates(["k", "t"])
    else:
        df = pd.DataFrame({"k": k, "t": t})
    df["v"] = rng.normal(size=len(df)).round(6)
    return df.reset_index(drop=True)


@pytest.mark.parametrize("parts", [3, 11])
def test_grouped_window_vs_duckdb(parts):
    import duckdb

    from pisa_ray.pipelines.window import grouped_window

    df = _win_fixture()
    con = duckdb.connect()
    con.register("t_", df)
    want = con.execute("""
        SELECT k, t, v,
          lag(v, 2) OVER w AS prev_v,
          lead(v, 1) OVER w AS next_v,
          row_number() OVER w AS rn,
          sum(v) OVER (PARTITION BY k ORDER BY t ROWS UNBOUNDED PRECEDING) AS run_v,
          sum(v) OVER (PARTITION BY k ORDER BY t
                       RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS w_sum,
          avg(v) OVER (PARTITION BY k ORDER BY t
                       RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS w_avg,
          count(*) OVER (PARTITION BY k ORDER BY t
                         RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS w_cnt
        FROM t_ WINDOW w AS (PARTITION BY k ORDER BY t)
    """).df()

    got = grouped_window(
        rd.from_pandas(df).repartition(parts),
        "k", "t",
        {
            "prev_v": ("lag", "v", 2),
            "next_v": ("lead", "v", 1),
            "rn": ("row_number",),
            "run_v": ("cumsum", "v"),
            "w_sum": ("rolling_sum", "v", 50000),
            "w_avg": ("rolling_mean", "v", 50000),
            "w_cnt": ("rolling_count", 50000),
        },
    ).to_pandas()
    cols = list(want.columns)
    norm = lambda d: (
        d[cols].astype({c: "float64" for c in cols})
        .sort_values(["k", "t"], kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(norm(got), norm(want), atol=1e-9)


def test_grouped_window_range_peers_vs_duckdb():
    """Duplicate order values: RANGE frames are tie-invariant and must
    include later peers (the case pandas groupby().rolling gets wrong)."""
    import duckdb

    from pisa_ray.pipelines.window import grouped_window

    df = _win_fixture(dup_times=True)
    con = duckdb.connect()
    con.register("t_", df)
    want = con.execute("""
        SELECT k, t, v,
          sum(v) OVER fr AS w_sum, count(*) OVER fr AS w_cnt
        FROM t_ WINDOW fr AS (PARTITION BY k ORDER BY t
                              RANGE BETWEEN 25 PRECEDING AND CURRENT ROW)
    """).df()
    got = grouped_window(
        rd.from_pandas(df).repartition(5), "k", "t",
        {"w_sum": ("rolling_sum", "v", 25), "w_cnt": ("rolling_count", 25)},
    ).to_pandas()
    cols = list(want.columns)
    norm = lambda d: (
        d[cols].astype({c: "float64" for c in cols})
        .sort_values(cols, kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(norm(got), norm(want), atol=1e-9)


def test_grouped_window_timestamps_and_string_keys():
    """Timestamp order column (widths in ns) + string keys route the
    exchange; spot-check one user against a scalar replay."""
    from pisa_ray.pipelines.window import grouped_window

    rng = np.random.default_rng(3)
    n = 800
    df = pd.DataFrame({
        "u": np.array([f"user_{i}" for i in rng.integers(0, 20, n)]),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 86_400, n), unit="s"),
        "amt": rng.integers(1, 100, n).astype(np.int64),
    }).drop_duplicates(["u", "ts"]).reset_index(drop=True)
    hour_ns = 3_600 * 10**9
    got = grouped_window(
        rd.from_pandas(df).repartition(4), "u", "ts",
        {"h_sum": ("rolling_sum", "amt", hour_ns), "rn": ("row_number",)},
    ).to_pandas()
    one = df[df.u == "user_7"].sort_values("ts")
    g1 = got[got.u == "user_7"].sort_values("ts")
    t = one.ts.to_numpy().astype("datetime64[ns]").view(np.int64)
    v = one.amt.to_numpy(dtype=np.float64)
    want = [v[(t >= t[i] - hour_ns) & (t <= t[i])].sum() for i in range(len(t))]
    np.testing.assert_allclose(g1.h_sum.to_numpy(), want)
    assert (g1.rn.to_numpy() == np.arange(1, len(one) + 1)).all()


def test_grouped_window_null_key_raises():
    from pisa_ray.pipelines.window import grouped_window

    df = pd.DataFrame({"k": pd.array([1, None, 2], dtype="Int64"),
                       "t": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    with pytest.raises(Exception, match="null"):
        grouped_window(
            rd.from_pandas(df), "k", "t", {"rn": ("row_number",)}
        ).to_pandas()


# -- bloom filter ------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_rate():
    from pisa_ray.pipelines.bloom import bloom_prefilter, build_bloom

    rng = np.random.default_rng(5)
    present = rng.choice(10**9, 5000, replace=False).astype(np.int64)
    right = rd.from_pandas(pd.DataFrame({"rk": present})).repartition(6)
    bloom = build_bloom(right, "rk", expected_distinct=5000, fp_rate=0.01)

    # every present key must pass
    kept = bloom_prefilter(
        rd.from_pandas(pd.DataFrame({"k": present})).repartition(4), "k", bloom
    ).to_pandas()
    assert sorted(kept.k) == sorted(present)

    # disjoint keys: measured fp rate within 3x of the sizing target
    absent = (rng.choice(10**9, 40000, replace=False) + 2 * 10**9).astype(np.int64)
    fp = len(
        bloom_prefilter(
            rd.from_pandas(pd.DataFrame({"k": absent})).repartition(4), "k", bloom
        ).to_pandas()
    )
    assert fp / 40000 < 0.03, fp


def test_bloom_string_keys():
    from pisa_ray.pipelines.bloom import build_bloom

    right = rd.from_items([{"s": f"key_{i}"} for i in range(1000)])
    bloom = build_bloom(right, "s", expected_distinct=1000)
    t = pa.table({"s": [f"key_{i}" for i in range(0, 2000, 7)]})
    hit = bloom.contains(t, "s")
    want_present = np.array([i < 1000 for i in range(0, 2000, 7)])
    assert (hit >= want_present).all()  # no false negatives
    assert hit[~want_present].mean() < 0.05


def test_hash_join_bloom_identity():
    from pisa_ray.pipelines.relational import hash_join

    left, right = _hj_fixture()
    left = left.dropna(subset=["k"])
    l = rd.from_pandas(left).repartition(7)
    r = rd.from_pandas(right).repartition(5)
    plain = hash_join(l, r, on="k", right_on="rk", how="inner").to_pandas()
    bloomed = hash_join(
        l, r, on="k", right_on="rk", how="inner",
        bloom_expected=600, bloom_fp_rate=0.001,
    ).to_pandas()
    cols = sorted(plain.columns)
    norm = lambda d: (
        d[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(norm(bloomed), norm(plain), check_dtype=False)

    semi_plain = hash_join(l, r, on="k", right_on="rk", how="semi").to_pandas()
    semi_bloom = hash_join(
        l, r, on="k", right_on="rk", how="semi", bloom_expected=600
    ).to_pandas()
    cols = sorted(semi_plain.columns)
    pd.testing.assert_frame_equal(
        norm(semi_bloom), norm(semi_plain), check_dtype=False
    )


def test_global_topk_vs_duckdb():
    import duckdb

    from pisa_ray.pipelines.relational import global_topk

    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "id": np.arange(3000, dtype=np.int64),
        "score": rng.normal(size=3000).round(4),
    })
    con = duckdb.connect()
    con.register("t_", df)
    want = con.execute(
        "SELECT id, score FROM t_ ORDER BY score DESC, id LIMIT 17"
    ).df()
    got = global_topk(
        rd.from_pandas(df).repartition(8), ["score", "id"], [False, True], 17
    )
    pd.testing.assert_frame_equal(
        got[["id", "score"]].reset_index(drop=True), want, check_dtype=False
    )
    # k larger than the dataset: returns everything, still ordered
    got_all = global_topk(
        rd.from_pandas(df.head(5)).repartition(3), ["score"], [True], 99
    )
    assert len(got_all) == 5
    assert (np.diff(got_all.score.to_numpy()) >= 0).all()


# -- second-stage rerank / hybrid retrieval --------------------------------


def _rerank_oracle(pdf, cand, q, qids, k):
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    pos_of = {int(v): i for i, v in enumerate(pdf["vec_id"])}
    rows = []
    for qrow, qi in enumerate(qids):
        docs = sorted(
            int(d) for d in cand.loc[cand.query_id == qi, "doc_id"]
            if int(d) in pos_of
        )
        sims = np.array([m[pos_of[d]] @ qn[qrow] for d in docs])
        order = np.lexsort((docs, -np.round(sims, 12)))[:k]
        for r, j in enumerate(order, 1):
            rows.append((int(qi), r, docs[j], sims[j]))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "cosine"])


@pytest.mark.parametrize("parts", [1, 8])
def test_rerank_topk_matches_numpy_oracle(emb, parts):
    from pisa_ray.pipelines.similarity import rerank_topk

    pdf = emb.to_pandas()
    ids = pdf["vec_id"].to_numpy(dtype=np.int64)
    m = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    q = m[:3]
    qids = ids[:3]
    # per-query candidate lists: overlapping slices + one id with NO
    # embedding row (must drop out, inner-join semantics)
    cand = pd.DataFrame(
        [
            (int(qids[qi]), int(d))
            for qi in range(3)
            for d in list(ids[qi * 5 : qi * 5 + 40]) + [987_654_321]
        ],
        columns=["query_id", "doc_id"],
    )
    ds = emb.repartition(parts) if parts > 1 else emb
    got = rerank_topk(cand, ds, q, qids, k=5)
    want = _rerank_oracle(pdf, cand, q, qids, k=5)
    assert got[["query_id", "rank", "doc_id"]].values.tolist() == \
        want[["query_id", "rank", "doc_id"]].values.tolist()
    np.testing.assert_allclose(
        got["cosine"].to_numpy(), want["cosine"].to_numpy(), atol=1e-12
    )
    assert 987_654_321 not in set(got["doc_id"])


def test_rerank_topk_empty_and_unknown_query(emb):
    from pisa_ray.pipelines.similarity import rerank_topk

    q = np.zeros((1, 64)) + 0.1
    out = rerank_topk(
        pd.DataFrame({"query_id": [], "doc_id": []}), emb, q,
        np.array([7], dtype=np.int64), k=3,
    )
    assert out.empty and list(out.columns) == ["query_id", "rank", "doc_id", "cosine"]
    with pytest.raises(ValueError, match="no query vector"):
        rerank_topk(
            pd.DataFrame({"query_id": [99], "doc_id": [0]}), emb, q,
            np.array([7], dtype=np.int64), k=3,
        )


def test_hybrid_search_matches_manual_two_stage(tmp_path):
    """hybrid_search == query_index top-N cut + rerank_topk, on a tiny
    built index with hashed doc ids and synthetic embeddings keyed by
    those ids (exercises the non-contiguous id path end-to-end)."""
    import ray.data as rd

    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.similarity import hybrid_search, rerank_topk
    from pisa_ray.scorer import query_index
    from pisa_ray.synth import make_corpus

    corpus = make_corpus(120, n_partitions=2)
    d = str(tmp_path / "idx")
    build_index(corpus, d, IndexConfig(bucket_bits=1, term_parts=4, lineage_parts=1))
    queries = rd.from_arrow(
        pa.table({"query_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["def return", "import class"])})
    )
    hits = query_index(queries, d, k=40, concurrency=2).to_pandas()
    all_ids = np.unique(hits["doc_id"].to_numpy())
    rng = np.random.default_rng(5)
    embs = pd.DataFrame(
        {"vec_id": all_ids, "embedding": list(rng.normal(size=(all_ids.size, 16)))}
    )
    emb_ds = rd.from_pandas(embs).repartition(3)
    qv = rng.normal(size=(2, 16))
    qids = np.array([0, 1], dtype=np.int64)
    got = hybrid_search(
        queries, d, emb_ds, qv, qids, n_candidates=10, k=4, concurrency=2
    )
    hits = hits.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    hits["crank"] = hits.groupby("query_id").cumcount() + 1
    cand = hits.loc[hits["crank"] <= 10, ["query_id", "doc_id"]]
    want = rerank_topk(cand, emb_ds, qv, qids, k=4)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_text_stats_quality_columns(docs):
    from pisa_ray.pipelines.text import STOPWORDS, text_stats
    from pisa_ray.tokenizer import tokenize_py

    out = (
        text_stats(docs, include_quality=True)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    pdf = docs.to_pandas().sort_values("doc_id").head(40)
    stop = STOPWORDS["en"]
    for _, row in pdf.iterrows():
        toks = tokenize_py(row["text"])
        assert out.loc[row["doc_id"], "n_stop_en"] == sum(t in stop for t in toks)
        assert out.loc[row["doc_id"], "n_digits"] == sum(c.isdigit() for c in row["text"])
        assert out.loc[row["doc_id"], "n_tokens"] == len(toks)


# -- exact duplicate-span removal -------------------------------------------


def _dup_span_oracle(texts, n, min_docs=2):
    import re as _re

    toks = {i: [t for t in _re.split(r"[^0-9a-z_]+", s.lower()) if t]
            for i, s in texts.items()}
    gram_docs = {}
    for i, ts in toks.items():
        for j in range(len(ts) - n + 1):
            gram_docs.setdefault(tuple(ts[j : j + n]), set()).add(i)
    out = {}
    for i, ts in toks.items():
        cover = np.zeros(len(ts), dtype=bool)
        for j in range(len(ts) - n + 1):
            if len(gram_docs[tuple(ts[j : j + n])]) >= min_docs:
                cover[j : j + n] = True
        out[i] = (
            " ".join(t for t, c in zip(ts, cover) if not c),
            len(ts),
            int(cover.sum()),
        )
    return out


@pytest.mark.parametrize("parts", [1, 6])
def test_remove_dup_spans_matches_python_oracle(parts):
    from pisa_ray.pipelines.text import remove_dup_spans

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    shared = " ".join(rng.choice(vocab, size=12))        # >= n-token dup run
    texts = {}
    for i in range(30):
        body = " ".join(rng.choice(vocab, size=25))
        if i % 3 == 0:
            body = body + " " + shared + " " + " ".join(rng.choice(vocab, 5))
        texts[i] = body
    texts[100] = "short doc only"                        # < n tokens
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = rd.from_pandas(df).repartition(parts)
    got = (
        remove_dup_spans(ds, n=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    want = _dup_span_oracle(texts, n=8)
    assert len(got) == len(texts)
    for i, (clean, ntok, nrem) in want.items():
        assert got.loc[i, "text"] == clean, i
        assert got.loc[i, "n_tokens"] == ntok
        assert got.loc[i, "n_removed"] == nrem
    # the planted shared run is actually removed somewhere
    assert sum(1 for v in want.values() if v[2] > 0) >= 10


def test_remove_dup_spans_no_dups_is_identity_stream():
    from pisa_ray.pipelines.text import remove_dup_spans

    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["alpha beta gamma delta", "Epsilon zeta ETA theta"],
        }
    )
    got = remove_dup_spans(rd.from_pandas(df), n=3).to_pandas()
    got = got.set_index("doc_id").sort_index()
    assert got.loc[0, "text"] == "alpha beta gamma delta"
    assert got.loc[1, "text"] == "epsilon zeta eta theta"  # lowered stream
    assert (got["n_removed"] == 0).all()


def test_remove_dup_spans_validation():
    from pisa_ray.pipelines.text import remove_dup_spans

    ds = rd.from_items([{"doc_id": 0, "text": "a b c"}])
    with pytest.raises(ValueError, match="min_docs"):
        remove_dup_spans(ds, n=2, min_docs=1)
    with pytest.raises(ValueError, match="n must be"):
        remove_dup_spans(ds, n=0)


# -- grouped HyperLogLog -----------------------------------------------------


def test_hll_distinct_by_accuracy_and_invariance():
    from pisa_ray.pipelines.sketch import hll_distinct_by

    rng = np.random.default_rng(3)
    keys = np.array(["a", "b", "c"])[rng.integers(0, 3, size=30000)]
    vals = rng.integers(0, 5000, size=30000)
    df = pd.DataFrame({"k": keys, "v": vals})
    exact = df.groupby("k")["v"].nunique()
    got1 = (
        hll_distinct_by(rd.from_pandas(df), "k", "v")
        .to_pandas().set_index("k").sort_index()
    )
    got8 = (
        hll_distinct_by(rd.from_pandas(df).repartition(8), "k", "v")
        .to_pandas().set_index("k").sort_index()
    )
    # bit-deterministic at any parallelism
    assert got1["estimate"].tolist() == got8["estimate"].tolist()
    assert got1["registers_nonzero"].tolist() == got8["registers_nonzero"].tolist()
    # within 3 sigma of exact (p=12 -> ~1.6% rel err)
    for k, est in got1["estimate"].items():
        assert abs(est - exact[k]) <= 3 * 0.0163 * exact[k] + 3, (k, est, exact[k])


def test_hll_distinct_by_matches_global_hll_per_single_group():
    from pisa_ray.pipelines.sketch import hll_distinct, hll_distinct_by

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"k": 7, "v": rng.integers(0, 800, size=5000)})
    ds = rd.from_pandas(df).repartition(4)
    grouped = hll_distinct_by(ds, "k", "v").to_pandas()
    single = hll_distinct(ds, "v")
    assert len(grouped) == 1
    assert grouped.loc[0, "estimate"] == pytest.approx(single["estimate"])
    assert int(grouped.loc[0, "registers_nonzero"]) == single["registers_nonzero"]


def test_hll_distinct_by_null_semantics_and_validation():
    from pisa_ray.pipelines.sketch import hll_distinct_by

    df = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, np.nan, 2.0]})
    tab = pa.table({"k": df["k"], "v": pa.array([1, None, 2], pa.int64())})
    got = (
        hll_distinct_by(rd.from_arrow(tab), "k", "v")
        .to_pandas().set_index("k").sort_index()
    )
    # the null value is ignored, not counted as a distinct
    assert got.loc["a", "registers_nonzero"] == 1
    with pytest.raises(ValueError, match="p must be"):
        hll_distinct_by(rd.from_arrow(tab), "k", "v", p=2)
    bad = pa.table({"k": pa.array(["a", None]), "v": pa.array([1, 2], pa.int64())})
    import ray.exceptions

    with pytest.raises(Exception, match="contains nulls"):
        hll_distinct_by(rd.from_arrow(bad), "k", "v").to_pandas()


def test_multimodal_bmp_decode_real():
    """BMP round-trip: synth pixels == decoded pixels (both orders),
    dispatch labels bmp, corrupt BMP degrades to the stub."""
    from pisa_ray.pipelines.multimodal import MediaDecoder, decode_bmp, synth_bmp

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(10, 7, 3)).astype(np.uint8)
    # hand-build from the same pixels synth_bmp would use
    payload = synth_bmp(np.random.default_rng(9), w=7, h=10)
    px, w, h, c = decode_bmp(payload)
    assert (w, h, c) == (7, 10, 3)
    np.testing.assert_array_equal(px, img)
    # top-down variant (negative height)
    import struct as _struct

    stride = (7 * 3 + 3) & ~3
    rows = bytearray()
    for r in range(10):
        rows.extend(img[r, :, ::-1].tobytes())
        rows.extend(b"\x00" * (stride - 21))
    info = _struct.pack("<IiiHHIIiiII", 40, 7, -10, 1, 24, 0, len(rows),
                        0, 0, 0, 0)
    td = _struct.pack("<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 54) + info + bytes(rows)
    px2, _, _, _ = decode_bmp(td)
    np.testing.assert_array_equal(px2, img)
    dec = MediaDecoder()
    kind, feats, meta = dec._decode_one(payload)
    assert kind == "bmp" and meta["width"] == 7 and meta["height"] == 10
    assert feats[3] == pytest.approx(img.reshape(-1, 3).mean() / 255.0)
    kind2, _, _ = dec._decode_one(payload[:40])  # truncated -> stub
    assert kind2 == "stub"


def test_multimodal_media_mix_includes_bmp():
    from pisa_ray.pipelines.multimodal import MediaDecoder, synth_media

    media = synth_media(64)
    dec = MediaDecoder()
    out = dec(media)
    kinds = set(out["decoder"].to_pylist())
    assert {"wav", "png", "bmp", "stub"} <= kinds


def test_grouped_window_string_lag_survives_empty_shards():
    """lag over a STRING column with fewer keys than reducers: empty
    shards must emit the same (string) dtype as populated shards."""
    from pisa_ray.pipelines.window import grouped_window

    df = pd.DataFrame(
        {
            "k": ["a"] * 3 + ["b"] * 3,
            "t": [1, 2, 3, 1, 2, 3],
            "item": list("xyzuvw"),
        }
    )
    out = (
        grouped_window(
            rd.from_pandas(df).repartition(2), "k", "t",
            {"prev_item": ("lag", "item", 1)},
        )
        .to_pandas()
        .sort_values(["k", "t"])
    )
    assert out["prev_item"].tolist() == [None, "x", "y", None, "u", "v"]


def test_grouped_quantile_sketch_preserves_int_key_dtype():
    from pisa_ray.pipelines.sketch import grouped_quantile_sketch

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {"k": rng.integers(0, 3, size=500), "v": rng.normal(size=500)}
    )
    out = grouped_quantile_sketch(rd.from_pandas(df), "k", "v", [0.5])
    assert out["key"].dtype == np.int64
    assert sorted(out["key"].unique().tolist()) == [0, 1, 2]


def test_profile_handles_dictionary_columns():
    from pisa_ray.pipelines.profile import profile

    df = pd.DataFrame({"c": pd.Categorical(["x", "y", "x", "z"])})
    stat = profile(rd.from_pandas(df))["c"]
    # before the dictionary unwrap this column degraded to counts-only
    assert stat["min"] == "x" and stat["max"] == "z"
    assert stat["distinct"] == pytest.approx(3, abs=1)
    assert stat["n"] == 4 and stat["nulls"] == 0


def test_tombstone_filenames_unique_per_writer(tmp_path):
    """Two tombstone writes never collide on a filename (glob-count
    races are defused by the per-writer unique suffix)."""
    import glob as _glob
    import json as _json

    from pisa_ray.delete import _write_tombstone

    idx = str(tmp_path / "idx")
    import os as _os

    _os.makedirs(idx)
    with open(_os.path.join(idx, "stats.json"), "w") as f:
        _json.dump({"id_mode": "keys"}, f)
    _write_tombstone(idx, np.array([1, 2], dtype=np.uint64))
    _write_tombstone(idx, np.array([3], dtype=np.uint64))
    files = _glob.glob(_os.path.join(idx, "tombstones", "*.parquet"))
    assert len(files) == 2
    from pisa_ray.delete import load_tombstones

    assert load_tombstones(idx).tolist() == [1, 2, 3]


def test_rrf_fuse_matches_hand_formula():
    """RRF fusion: hand-computed 1/(k0+rank) sums, union semantics,
    (score desc, id asc) tie-break, absent-doc robustness."""
    import pandas as pd

    from pisa_ray.pipelines.similarity import rrf_fuse

    bm25 = pd.DataFrame(
        {"query_id": [0, 0, 0, 1, 1], "rank": [1, 2, 3, 1, 2],
         "doc_id": [10, 20, 30, 40, 50]}
    )
    vec = pd.DataFrame(
        {"query_id": [0, 0, 1], "rank": [1, 2, 1], "doc_id": [20, 99, 50]}
    )
    out = rrf_fuse([bm25, vec], k=10, k0=60.0)
    got = {
        (int(q), int(d)): s
        for q, d, s in zip(out["query_id"], out["doc_id"], out["rrf_score"])
    }
    assert abs(got[(0, 20)] - (1 / 62 + 1 / 61)) < 1e-12  # both lists
    assert abs(got[(0, 99)] - 1 / 62) < 1e-12  # vector-only doc
    assert abs(got[(1, 50)] - (1 / 62 + 1 / 61)) < 1e-12
    # top of query 0 is doc 20 (sum of two reciprocal ranks beats rank-1 alone)
    q0 = out[out["query_id"] == 0]
    assert int(q0[q0["rank"] == 1]["doc_id"].iloc[0]) == 20
    # rank column synthesized when absent (row order = rank)
    out2 = rrf_fuse([bm25.drop(columns=["rank"]), vec], k=10)
    assert out2.equals(out)
    # rails
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k0"):
        rrf_fuse([bm25], k0=0)
    assert len(rrf_fuse([], k=5)) == 0


def test_rrf_fuse_end_to_end_hybrid(tiny_index):
    """BM25 top-k fused with a synthetic second ranking over real index
    output — ranks permute but the fused set stays within the union."""
    import pandas as pd
    import ray.data as rd

    from pisa_ray.pipelines.similarity import rrf_fuse
    from pisa_ray.scorer import query_index
    from pisa_ray.synth import make_queries

    qt = make_queries(8)
    hits = query_index(
        rd.from_arrow(qt), tiny_index, k=10, concurrency=2
    ).to_pandas()
    # second system: same docs, reversed per-query order
    rev = hits.sort_values(["query_id", "rank"], ascending=[True, False]).copy()
    rev["rank"] = rev.groupby("query_id").cumcount() + 1
    fused = rrf_fuse([hits, rev], k=5)
    assert len(fused) > 0
    union = set(zip(hits["query_id"], hits["doc_id"]))
    assert set(zip(fused["query_id"], fused["doc_id"])) <= union
    # symmetric contributions: forward rank r + reverse rank (n-r+1)
    # make the MIDDLE doc win for odd-length lists
    for q, grp in hits.groupby("query_id"):
        n = len(grp)
        if n % 2 == 1:
            mid = grp[grp["rank"] == (n + 1) // 2]["doc_id"].iloc[0]
            top = fused[(fused["query_id"] == q) & (fused["rank"] == 1)]
            assert int(top["doc_id"].iloc[0]) == int(mid)


def test_ivfpq_knn_recall_and_determinism(emb):
    """IVF-PQ with exact refine: high recall vs brute at generous
    probe/refine, rank-1 self hit, true-cosine scores (the refine
    stage re-scores exactly), deterministic across runs and
    parallelism."""
    from pisa_ray.pipelines.similarity import brute_knn, ivfpq_knn

    pdf = emb.to_pandas().head(10)
    q = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    exact = brute_knn(emb, q, k=5)
    got = ivfpq_knn(
        emb, q, k=5, n_clusters=8, n_probe=8, m_sub=16, nbits=6, refine=8
    )
    # scores are TRUE cosines: every (query, vec) pair present in both
    # frames carries the same cosine
    merged = got.merge(
        exact, on=["query_id", "vec_id"], suffixes=("_pq", "_ex")
    )
    assert np.allclose(merged["cosine_pq"], merged["cosine_ex"], atol=1e-9)
    # recall@5 against brute
    rec = len(merged) / len(exact)
    assert rec >= 0.9, rec
    # self hit at rank 1 (own vector survives any code precision after
    # exact refine)
    for qi, vid in enumerate(pdf["vec_id"]):
        sub = got[(got.query_id == qi) & (got["rank"] == 1)]
        assert len(sub) == 1 and int(sub["vec_id"].iloc[0]) == int(vid)
    again = ivfpq_knn(
        emb.repartition(7), q, k=5, n_clusters=8, n_probe=8, m_sub=16,
        nbits=6, refine=8,
    )
    pd.testing.assert_frame_equal(got, again)


def test_ivfpq_rails(emb):
    from pisa_ray.pipelines.similarity import ivfpq_knn, pq_train

    q = np.zeros((1, 64))
    with pytest.raises(ValueError, match="refine"):
        ivfpq_knn(emb, q, refine=0)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(np.zeros((300, 64)), m_sub=7)
    with pytest.raises(ValueError, match="sample"):
        pq_train(np.zeros((10, 64)), m_sub=8, nbits=6)


def test_pq_train_nbits_rail():
    from pisa_ray.pipelines.similarity import pq_train

    with pytest.raises(ValueError, match="nbits"):
        pq_train(np.zeros((600, 64)), m_sub=8, nbits=9)


def test_fuzzy_join_matches_bruteforce():
    """ED<=1 record linkage == brute-force DP over all pairs, at two
    parallelism levels; dist 0 for exact matches, 1 otherwise."""
    from pisa_ray.pipelines.relational import fuzzy_join

    left = pd.DataFrame(
        {
            "left_id": pd.array(range(1, 9), dtype="int64"),
            "name": [
                "merge", "sorted", "graph", "tablle", "query",
                "queue", "marge", "xylophone",
            ],
        }
    )
    right = pd.DataFrame(
        {
            "right_id": pd.array(range(101, 108), dtype="int64"),
            "name": [
                "merge", "sort", "table", "qurey", "queues",
                "graphs", "zebra",
            ],
        }
    )

    def dp(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            prev = cur
        return prev[-1]

    want = sorted(
        (int(li), int(ri), la, rb, dp(la, rb))
        for li, la in zip(left["left_id"], left["name"])
        for ri, rb in zip(right["right_id"], right["name"])
        if dp(la, rb) <= 1
    )
    assert want  # fixture really produces matches
    for parts in (1, 6):
        out = (
            fuzzy_join(
                rd.from_pandas(left).repartition(parts),
                rd.from_pandas(right).repartition(parts),
                on="name",
            )
            .to_pandas()
            .sort_values(["left_id", "right_id"])
            .reset_index(drop=True)
        )
        got = sorted(
            (int(r.left_id), int(r.right_id), r.name_left, r.name_right,
             int(r.dist))
            for r in out.itertuples()
        )
        assert got == want


def test_fuzzy_join_rails():
    from pisa_ray.pipelines.relational import fuzzy_join

    l = rd.from_pandas(
        pd.DataFrame({"left_id": pd.array([1], dtype="int64"), "name": ["a"]})
    )
    r = rd.from_pandas(
        pd.DataFrame({"right_id": pd.array([2], dtype="int64"), "name": ["b"]})
    )
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_join(l, r, on="name", max_dist=2)
    # single-char strings share the "" deletion variant: a vs b is
    # ED 1 and must be found through it
    out = fuzzy_join(l, r, on="name").to_pandas()
    assert len(out) == 1 and int(out["dist"][0]) == 1
