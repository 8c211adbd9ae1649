"""RM3 pseudo-relevance feedback (pipelines/feedback.py).

The naive reference below recomputes the RM3 arithmetic with plain
Python dicts over the raw corpus text (tokenize_py + Counter — no
reader internals, no codec), with stage-1 scores from score_taat,
which is itself oracle-checked end-to-end. Exact float64 equality."""

import collections
import random

import numpy as np
import pyarrow as pa
import pytest

VOCAB = [
    "merge", "sort", "parse", "json", "tree", "node",
    "hash", "map", "list", "queue", "heap", "stack",
]


def _rows(seed=5, n=300):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(5, 40))))
        for i in range(1, n + 1)
    ]


@pytest.fixture(scope="module")
def rm3_index(tmp_path_factory):
    from pisa_ray.build import IndexConfig, build_index

    rows = _rows()
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    d = str(tmp_path_factory.mktemp("rm3_idx"))
    build_index(
        tbl,
        d,
        IndexConfig(
            id_col="doc_id", content_col="text", meta_cols=(),
            bucket_bits=2, term_parts=8, lineage_parts=1,
        ),
    )
    return d, rows


def _naive_rm3(reader, rows, text, k, fb_docs, fb_terms, ow):
    from pisa_ray.scorer import score_taat
    from pisa_ray.tokenizer import tokenize_py

    toks = tokenize_py(text)
    qw = {t: toks.count(t) / len(toks) for t in set(toks) if reader.has_term(t)}
    base = score_taat(reader, text, fb_docs)
    if not base or ow == 1.0:
        weights = dict(qw)
    else:
        tot = sum(s for _, s in base)
        docs = dict(rows)
        rm: dict = collections.defaultdict(float)
        for d, s in base:
            dtoks = tokenize_py(docs[d])
            for t, tf in collections.Counter(dtoks).items():
                rm[t] += (s / tot) * tf / len(dtoks)
        top = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
        mass = sum(v for _, v in top)
        weights = {t: ow * v for t, v in qw.items()}
        for t, v in top:
            weights[t] = weights.get(t, 0.0) + (1 - ow) * v / mass
    scores: dict = collections.defaultdict(float)
    for t in sorted(weights):
        w = weights[t]
        _, contrib, pos = reader.term_contributions(t)
        out = reader.out_ids(reader.doc_sorted[pos])
        for o, c in zip(out, contrib):
            scores[int(o)] += w * c
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize(
    "text", ["merge sort", "parse json tree", "heap", "merge merge queue"]
)
def test_rm3_matches_naive_reference(rm3_index, text):
    from pisa_ray.pipelines.feedback import score_rm3
    from pisa_ray.scorer import IndexReader

    d, rows = rm3_index
    r = IndexReader(d)
    got = score_rm3(r, d, text, k=10, fb_docs=5, fb_terms=8, orig_weight=0.5)
    ref = _naive_rm3(r, rows, text, 10, 5, 8, 0.5)
    assert [x for x, _ in got] == [x for x, _ in ref]
    assert np.allclose([s for _, s in got], [s for _, s in ref], rtol=1e-12)
    assert len(got) > 0


def test_rm3_orig_weight_one_is_plain_ranking(rm3_index):
    from pisa_ray.pipelines.feedback import score_rm3
    from pisa_ray.scorer import IndexReader, score_taat

    d, _ = rm3_index
    r = IndexReader(d)
    for text in ("merge sort", "heap stack"):
        got = score_rm3(r, d, text, k=10, orig_weight=1.0)
        taat = score_taat(r, text, 10)
        assert [x for x, _ in got] == [x for x, _ in taat]


def test_rm3_expansion_adds_nonquery_terms(rm3_index):
    from pisa_ray.pipelines.feedback import rm3_expand
    from pisa_ray.scorer import IndexReader

    d, _ = rm3_index
    r = IndexReader(d)
    weights = dict(rm3_expand(r, d, "merge", fb_docs=5, fb_terms=8))
    assert "merge" in weights
    assert len(weights) > 1  # feedback surfaced co-occurring terms
    # interpolation conserves mass: qw sums to 1, RM mass renormalized
    assert abs(sum(weights.values()) - 1.0) < 1e-9


def test_rm3_rails(rm3_index):
    from pisa_ray.pipelines.feedback import rm3_expand, score_rm3
    from pisa_ray.scorer import IndexReader

    d, _ = rm3_index
    r = IndexReader(d)
    with pytest.raises(ValueError, match="orig_weight"):
        rm3_expand(r, d, "merge", orig_weight=1.5)
    assert score_rm3(r, d, "zzz_absent_token") == []
    assert score_rm3(r, d, "") == []


def test_rm3_batch_deterministic_across_concurrency(rm3_index):
    from pisa_ray.pipelines.feedback import query_index_rm3

    d, _ = rm3_index
    qs = [(0, "merge sort"), (1, "heap"), (2, "parse json")]
    a = query_index_rm3(qs, d, k=5, concurrency=1)
    b = query_index_rm3(qs, d, k=5, concurrency=3)
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0


def test_rm3_keys_mode_forward_lookup(tiny_index):
    """Keys-derived docIDs: the forward-store lookup keys on the raw
    engine uint64 ids (identity out_ids mapping) — exercise the whole
    path on the shared keys-mode fixture index."""
    from pisa_ray.pipelines.feedback import score_rm3
    from pisa_ray.scorer import IndexReader

    r = IndexReader(tiny_index)
    # pick real vocabulary from the index (synth corpus: keywords+vars)
    terms = sorted(r.df, key=lambda t: -int(r.df[t]))[:2]
    text = " ".join(terms)
    got = score_rm3(r, tiny_index, text, k=5)
    assert len(got) == 5
    got2 = score_rm3(r, tiny_index, text, k=5)
    assert got == got2


def test_rm3_reaches_generation_docs(rm3_index, tmp_path):
    """Feedback docs from an APPENDED generation must resolve in the
    forward store (generations keep their tokenized/ under
    generations/<g>/ — review finding: the lookup only globbed the
    base store and KeyError'd on any delta feedback doc)."""
    import shutil

    import pyarrow as pa

    from pisa_ray.build import build_incremental
    from pisa_ray.pipelines.feedback import score_rm3
    from pisa_ray.scorer import IndexReader

    base, rows = rm3_index
    idx = str(tmp_path / "rm3_gen")
    shutil.copytree(base, idx)
    # a term that exists ONLY in the delta: every feedback doc for it
    # is a generation doc, so the forward lookup MUST resolve them
    delta = pa.table(
        {
            "doc_id": pa.array(list(range(9001, 9031)), type=pa.int64()),
            "text": pa.array(["zzznew heap stack"] * 30),
        }
    )
    build_incremental(delta, idx, "g1")
    r = IndexReader(idx)
    got = score_rm3(r, idx, "zzznew", k=10, fb_docs=8)
    assert len(got) > 0
    assert all(d >= 9001 for d, _ in got[:5])  # delta docs dominate
    # and the expansion actually used their vectors (co-occurring terms)
    from pisa_ray.pipelines.feedback import rm3_expand

    weights = dict(rm3_expand(r, idx, "zzznew", fb_docs=8, fb_terms=5))
    assert "heap" in weights and "stack" in weights


# --------------------------------------------------------------------------
# MoreLikeThis
# --------------------------------------------------------------------------


def test_mlt_terms_matches_bruteforce(rm3_index):
    from pisa_ray.pipelines.feedback import mlt_terms
    from pisa_ray.scorer import IndexReader
    from pisa_ray.tokenizer import tokenize_py

    d, rows = rm3_index
    reader = IndexReader(d)
    text = rows[4][1]
    toks = tokenize_py(text)
    tf = collections.Counter(toks)
    terms, tfs = list(tf.keys()), np.array(list(tf.values()))
    for min_tf, min_df, mq in [(1, 1, 5), (2, 2, 3), (1, 1, 100)]:
        got = mlt_terms(
            reader, terms, tfs, max_query_terms=mq, min_tf=min_tf,
            min_df=min_df,
        )
        cand = [
            (-tf[t] * reader.idf(t), t)
            for t in tf
            if tf[t] >= min_tf and int(reader.df.get(t, 0)) >= min_df
        ]
        cand.sort()
        assert got == [t for _, t in cand[:mq]]
    # max_df_frac gates stop-ish terms
    full = mlt_terms(reader, terms, tfs, min_tf=1, min_df=1)
    gated = mlt_terms(
        reader, terms, tfs, min_tf=1, min_df=1, max_df_frac=0.0
    )
    assert gated == [] and full


def test_more_like_this_equals_explicit_term_query(rm3_index):
    from pisa_ray.pipelines.feedback import mlt_terms, more_like_this
    from pisa_ray.scorer import IndexReader, score_taat
    from pisa_ray.tokenizer import tokenize_py

    d, rows = rm3_index
    reader = IndexReader(d)
    srcs = [rows[0][0], rows[10][0], rows[50][0]]
    out = more_like_this(srcs, d, k=5, min_tf=1, min_df=1, concurrency=2)
    for src in srcs:
        text = dict(rows)[src]
        tf = collections.Counter(tokenize_py(text))
        qterms = mlt_terms(
            reader, list(tf), np.array(list(tf.values())), 25, 1, 1, 1.0
        )
        want = [
            (ed, es)
            for ed, es in score_taat(reader, "", 6, terms=sorted(qterms))
            if ed != src
        ][:5]
        sub = out[out.src_doc_id == src].sort_values("rank")
        assert list(sub["doc_id"]) == [d_ for d_, _ in want]
        assert np.allclose(sub["score"], [s for _, s in want], atol=0)
        assert src not in set(sub["doc_id"])


def test_more_like_this_finds_planted_twin(tmp_path):
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.feedback import more_like_this

    rows = _rows(seed=9, n=120)
    # give the source doc rare distinguishing terms and plant a
    # near-duplicate carrying them (MLT keys on high-idf terms; in a
    # 12-word shared vocab every doc looks alike without them)
    rare = " zzqx wwvy uuty"
    rows[0] = (rows[0][0], rows[0][1] + rare)
    twin_id = 5001
    rows.append((twin_id, rows[0][1] + " merge"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
        }
    )
    d = str(tmp_path / "mlt_idx")
    build_index(
        tbl, d,
        IndexConfig(id_col="doc_id", content_col="text", meta_cols=(),
                    bucket_bits=1, term_parts=4, lineage_parts=1),
    )
    out = more_like_this([rows[0][0]], d, k=3, min_tf=1, min_df=1)
    assert list(out["rank"]) == [1, 2, 3]
    assert out.iloc[0]["doc_id"] == twin_id  # the twin ranks first


def test_more_like_this_rails(rm3_index):
    from pisa_ray.pipelines.feedback import more_like_this

    d, rows = rm3_index
    with pytest.raises(KeyError, match="doc_ids not in this index"):
        more_like_this([10**12 + 5], d, k=3)
    empty = more_like_this([], d)
    assert list(empty.columns) == ["src_doc_id", "rank", "doc_id", "score"]
    assert len(empty) == 0


def test_more_like_this_missing_forward_store_is_loud(rm3_index, tmp_path):
    import shutil

    from pisa_ray.pipelines.feedback import more_like_this

    d, rows = rm3_index
    broken = str(tmp_path / "noforward")
    shutil.copytree(d, broken)
    shutil.rmtree(f"{broken}/tokenized")
    with pytest.raises(Exception, match="forward-store"):
        more_like_this([rows[0][0]], broken, k=3, min_tf=1, min_df=1)
