"""Porter stemming analyzers ("porter", "code_porter").

The stemmer is implemented from the published 1980 algorithm; the
vectors below are full-pipeline outputs — including the two end-to-end
examples the paper itself gives (GENERALIZATIONS -> GENER, OSCILLATORS
-> OSCIL). The vectorized build path is pinned to tokenize_py by the
parametrized fuzz test in test_analyzer.py."""

import random

import numpy as np
import pyarrow as pa
import pytest

FULL_VECTORS = {
    "generalizations": "gener",  # the paper's own worked example
    "oscillators": "oscil",      # likewise (step-5b double-l)
    "running": "run",
    "cats": "cat",
    "ponies": "poni",
    "caresses": "caress",
    "agreed": "agre",
    "owned": "own",
    "humbled": "humbl",
    "sized": "size",
    "meeting": "meet",
    "stating": "state",
    "itemization": "item",
    "sensational": "sensat",
    "traditional": "tradit",
    "reference": "refer",
    "colonizer": "colon",
    "plotted": "plot",
    "flies": "fli",
    "mules": "mule",
    "hopping": "hop",
    "hoping": "hope",
    "sky": "sky",
    "happy": "happi",
    "controller": "control",
    "connection": "connect",
    "connections": "connect",
    "connected": "connect",
    "connecting": "connect",
}


def test_porter_full_pipeline_vectors():
    from pisa_ray.stem import porter_stem

    for w, want in FULL_VECTORS.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_short_and_degenerate_tokens():
    from pisa_ray.stem import porter_stem

    for w in ("a", "is", "be", "x1", ""):
        assert porter_stem(w) == w  # <=2 letters untouched
    # digit-bearing identifiers stay total and deterministic
    assert porter_stem("sha256") == porter_stem("sha256")
    assert porter_stem("utf8") == "utf8"


def test_tokenize_py_porter_composes():
    from pisa_ray.tokenizer import tokenize_py

    assert tokenize_py("running flies", "porter") == ["run", "fli"]
    # simple base keeps identifiers whole; the whole identifier stems
    from pisa_ray.stem import porter_stem

    assert tokenize_py("connected_flies", "porter") == [
        porter_stem("connected_flies")
    ]
    assert tokenize_py("parseConnections readFiles", "code_porter") == [
        "pars", "connect", "read", "file",
    ]


def _corpus() -> pa.Table:
    rng = random.Random(3)
    words = [
        "running", "runs", "connection", "connected", "connecting",
        "merge", "merging", "merged", "sorts", "sorting", "parser",
        "parsing", "table", "tables", "index", "indexing",
    ]
    rows = [
        " ".join(rng.choice(words) for _ in range(rng.randrange(6, 30)))
        for _ in range(200)
    ]
    return pa.table(
        {
            "doc_id": pa.array(list(range(200)), type=pa.int64()),
            "text": pa.array(rows),
        }
    )


@pytest.fixture(scope="module")
def porter_index(tmp_path_factory):
    from pisa_ray.build import IndexConfig, build_index

    corpus = _corpus()
    d = str(tmp_path_factory.mktemp("porter_idx"))
    build_index(
        corpus,
        d,
        IndexConfig(
            bucket_bits=2, term_parts=8, lineage_parts=1,
            id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
            analyzer="porter", positions=True,
        ),
    )
    return d, corpus


def test_porter_index_rank_identical_to_porter_oracle(porter_index):
    from pisa_ray.docids import doc_ids_from_int, unsplitmix64
    from pisa_ray.oracle import OracleIndex
    from pisa_ray.scorer import IndexReader, score_taat

    d, corpus = porter_index
    reader = IndexReader(d)
    assert reader.analyzer == "porter"
    oracle = OracleIndex(
        doc_ids_from_int(corpus["doc_id"]),
        corpus["text"].to_pylist(),
        analyzer="porter",
    )
    for text in ("running merge", "connections", "parse tables", "sorting index"):
        golden = [
            (int(unsplitmix64(np.array([d_], dtype=np.uint64))[0]), s)
            for d_, s in oracle.score_query(text, 10)
        ]
        got = score_taat(reader, text, 10)
        assert [round(s, 9) for _, s in got] == [round(s, 9) for _, s in golden]
        assert {d_ for d_, _ in got} == {d_ for d_, _ in golden}
        assert len(got) > 0, text


def test_porter_collapses_inflections_to_one_posting_list(porter_index):
    """THE point of stemming: 'connection(s)/connected/connecting' are
    ONE term; a query in any inflection hits docs in every other."""
    from pisa_ray.scorer import IndexReader, score_taat

    d, corpus = porter_index
    reader = IndexReader(d)
    assert reader.has_term("connect")
    for raw in ("connection", "connections", "connected", "connecting"):
        assert not reader.has_term(raw)
    a = score_taat(reader, "connection", 50)
    b = score_taat(reader, "connecting", 50)
    assert a == b and len(a) > 0


def test_porter_phrase_positions_parity(porter_index):
    """Stemmed positional phrase search: the index-native path equals
    the corpus-verify path (both tokenize with the index's analyzer,
    so both match stemmed-token adjacency)."""
    import ray.data as rd

    from pisa_ray.pipelines.phrase import phrase_search, phrase_search_index

    d, corpus = porter_index
    queries = [(0, "running merge"), (1, "connected tables"), (2, "sorting")]
    a = phrase_search(queries, d, rd.from_arrow(corpus), text_col="text", id_col="doc_id")
    b = phrase_search_index(queries, d)
    assert a.values.tolist() == b.values.tolist()
    assert len(a) > 0
    # inflection-insensitivity of the phrase itself: "runs merging"
    # stems to the same token sequence as "running merge"
    c = phrase_search_index([(0, "runs merging")], d)
    assert c["doc_id"].tolist() == b[b["query_id"] == 0]["doc_id"].tolist()
