"""Wide-row and skew stress tests (SURVEY.md §7.5)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from pisa_ray.build import IndexConfig, build_index
from pisa_ray.docids import doc_ids_from_keys
from pisa_ray.oracle import OracleIndex
from pisa_ray.scorer import IndexReader, score_taat
from pisa_ray.synth import make_corpus


def test_wide_rows_and_stop_term_skew(tmp_path):
    """50k-token docs + a term in ~every doc: the tokenizer batches
    stay bounded, the stop term's postings split across buckets, and
    results remain oracle-identical."""
    corpus = make_corpus(80, n_partitions=2, wide_row_permille=0)
    # plant 3 wide rows and a universal term
    texts = corpus["content"].to_pylist()
    texts = [t + " omnipresent_term" for t in texts]
    for i in (5, 37, 66):
        texts[i] = " ".join(["wide_tok%d" % (j % 97) for j in range(50_000)])
    corpus = corpus.set_column(
        corpus.schema.get_field_index("content"),
        "content",
        pa.array(texts, type=pa.large_string()),
    )
    d = str(tmp_path / "idx")
    build_index(
        corpus,
        d,
        IndexConfig(bucket_bits=2, term_parts=4, lineage_parts=1,
                    tokenize_batch_size=16),
    )
    reader = IndexReader(d)
    # universal term present in all non-wide docs, split across buckets
    runs = reader.runs_of("omnipresent_term")
    assert int(reader.df["omnipresent_term"]) == 77
    assert len(runs) > 1, "stop-term postings should span multiple bucket runs"
    # wide docs round-trip: length == 50k, tf sums match
    ids = doc_ids_from_keys(corpus["repo"], corpus["path"], corpus["commit"])
    oracle = OracleIndex(ids, texts)
    for text in ("omnipresent_term", "wide_tok3 wide_tok11", "wide_tok5 omnipresent_term"):
        golden = oracle.score_query(text, 10)
        got = score_taat(reader, text, 10)
        assert [g[0] for g in golden] == [e[0] for e in got]
        assert all(abs(g[1] - e[1]) <= 1e-9 for g, e in zip(golden, got))


def test_verify_pairs_jaccard():
    from pisa_ray.pipelines.dedup import minhash_lsh_dedup, verify_pairs_jaccard

    base = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "alpha beta gamma delta epsilon zeta eta theta",  # exact dup of 0
                "alpha beta gamma delta epsilon zeta eta iota",   # near dup of 0
                "one two three four five six seven eight",
                "totally different words here nothing shared at all",
                "one two three four five six seven nine",          # near dup of 3
            ],
        }
    )
    ds = rd.from_pandas(base)
    pairs = minhash_lsh_dedup(ds, threshold=0.5)
    verified = verify_pairs_jaccard(ds, pairs, threshold=0.5)
    flagged = dict(zip(verified["doc_id"], verified["dup_of"]))
    assert flagged.get(1) == 0  # exact dup must survive exact verification
    assert 4 not in flagged
    assert (verified["jaccard"] <= 1.0).all() and (verified["jaccard"] >= 0.5).all()


def test_verify_pairs_jaccard_distributed_fallback_parity():
    """Forcing max_driver_pairs below the candidate count must route
    through the hash-exchange fallback (driver never holds the pair
    list or a corpus-scaled shingle dict) and produce EXACTLY the
    driver-path pairs and jaccard values — including a short doc that
    exercises the padding rule on both branches."""
    from pisa_ray.pipelines.dedup import verify_pairs_jaccard

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=12).tolist()) for _ in range(30)
    ]
    texts += [texts[i] + " extra" for i in range(8)]        # near dups
    texts += [texts[3], "ab", "ab"]                         # exact + short docs
    docs = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    ds = rd.from_pandas(docs)
    ids = docs["doc_id"].to_numpy()
    # candidate pairs: all near/exact twins vs their source + noise pairs
    cand = pd.DataFrame(
        {
            "doc_id": np.concatenate([ids[30:38], ids[[38, 40]], ids[:10]]),
            "dup_of": np.concatenate([ids[:8], ids[[3, 39]], ids[10:20]]),
        }
    )
    pairs = rd.from_pandas(cand)
    small = (
        verify_pairs_jaccard(ds, pairs, threshold=0.4)
        .sort_values(["doc_id", "dup_of"], kind="mergesort")
        .reset_index(drop=True)
    )
    big = verify_pairs_jaccard(ds, pairs, threshold=0.4, max_driver_pairs=1)
    assert small["doc_id"].tolist() == big["doc_id"].tolist()
    assert small["dup_of"].tolist() == big["dup_of"].tolist()
    assert np.array_equal(small["jaccard"].to_numpy(), big["jaccard"].to_numpy())
    assert 38 in set(big["doc_id"])      # exact twin survives
    assert 40 in set(big["doc_id"])      # short-doc padding rule pair
