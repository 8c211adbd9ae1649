"""Code-aware analyzer: camelCase / ACRONYMCase / snake_case identifier
splitting (the Zoekt / GitHub-code-search convention), chosen at build
time and applied to every query by the readers.

The byte-vectorized kernel is pinned against the two-regex pure-Python
reference; the end-to-end contract is pinned against the naive oracle
built with the same analyzer.
"""

import random
import string

import numpy as np
import pyarrow as pa
import pytest

from pisa_ray.tokenizer import ANALYZERS, tokenize_flat, tokenize_py


# --------------------------------------------------------------------------
# kernel == pure-python reference
# --------------------------------------------------------------------------


CODE_CASES = [
    ("parseJSONValue", ["parse", "json", "value"]),
    ("foo_bar", ["foo", "bar"]),
    ("HTTPServer2", ["http", "server2"]),
    ("v2Parser", ["v2", "parser"]),
    ("ALLCAPS", ["allcaps"]),
    ("MixedUPAndDown", ["mixed", "up", "and", "down"]),
    ("__init__", ["init"]),
    ("getHTTPResponseCode", ["get", "http", "response", "code"]),
    ("abc123Def", ["abc123", "def"]),
    ("9Lives", ["9", "lives"]),
    ("aB", ["a", "b"]),
    ("ABc", ["a", "bc"]),
    ("", []),
]


def test_code_tokenize_py_cases():
    for text, want in CODE_CASES:
        assert tokenize_py(text, "code") == want, text


def test_simple_analyzer_keeps_identifiers_whole():
    assert tokenize_py("parseJSONValue foo_bar", "simple") == [
        "parsejsonvalue",
        "foo_bar",
    ]


def _flatten(arr, analyzer):
    flat, parents, n = tokenize_flat(arr, analyzer)
    got = [[] for _ in range(n)]
    for t, p in zip(flat.to_pylist(), parents.tolist()):
        got[p].append(t)
    return got


@pytest.mark.parametrize("analyzer", ANALYZERS)
def test_byte_kernel_matches_regex_reference_fuzz(analyzer):
    """The vectorized byte kernel == tokenize_py on adversarial random
    docs for BOTH analyzers (token class, camel boundaries, doc
    boundaries, empties, nulls)."""
    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + "_ .,(){}[]<>=+-*/\\\"'\n\t@#$%"
    cases = [t for t, _ in CODE_CASES] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(1500)
    ]
    arr = pa.array(cases, type=pa.large_string())
    got = _flatten(arr, analyzer)
    for i, c in enumerate(cases):
        assert got[i] == tokenize_py(c, analyzer), (i, repr(c))


def test_code_kernel_doc_boundary_no_contamination():
    """An acronym ending one doc followed by a lowercase-starting doc
    must not split — the camel lookahead may not cross documents."""
    docs = ["endsFS", "starts lower", "AB", "c", "lowerEnd", "Xy"]
    got = _flatten(pa.array(docs, type=pa.large_string()), "code")
    assert got == [tokenize_py(d, "code") for d in docs]
    # the regression shape specifically: ...S| + s... stays one acronym
    assert got[0] == ["ends", "fs"]


def test_code_kernel_null_and_empty_rows():
    arr = pa.array(["fooBar", None, "", "baz_Q"], type=pa.large_string())
    assert _flatten(arr, "code") == [["foo", "bar"], [], [], ["baz", "q"]]


def test_unknown_analyzer_rejected():
    with pytest.raises(ValueError, match="analyzer"):
        tokenize_flat(pa.array(["x"], type=pa.large_string()), "stemmer")
    with pytest.raises(ValueError, match="analyzer"):
        tokenize_py("x", "stemmer")


# --------------------------------------------------------------------------
# end-to-end: build with analyzer="code", query with the index's analyzer
# --------------------------------------------------------------------------


def _code_corpus() -> pa.Table:
    rng = random.Random(5)
    idents = [
        "parseJSONValue", "parse_json_value", "HTTPServer", "http_server",
        "getUserID", "get_user_id", "fooBar", "foo_bar", "readFileSync",
        "read_file_sync", "maxRetryCount", "retryLimit", "openSocket",
        "close_socket", "XMLHttpRequest", "writeHTMLPage",
    ]
    rows = []
    for i in range(240):
        n = rng.randrange(8, 40)
        rows.append(" ".join(rng.choice(idents) for _ in range(n)))
    return pa.table(
        {
            "doc_id": pa.array(list(range(240)), type=pa.int64()),
            "text": pa.array(rows),
        }
    )


@pytest.fixture(scope="module")
def code_index(tmp_path_factory):
    from pisa_ray.build import IndexConfig, build_index

    corpus = _code_corpus()
    d = str(tmp_path_factory.mktemp("code_idx"))
    build_index(
        corpus,
        d,
        IndexConfig(
            bucket_bits=2, term_parts=8, lineage_parts=1,
            id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
            analyzer="code",
        ),
    )
    return d, corpus


def test_code_index_rank_identical_to_code_oracle(code_index):
    from pisa_ray.docids import doc_ids_from_int
    from pisa_ray.oracle import OracleIndex
    from pisa_ray.scorer import IndexReader, score_taat

    d, corpus = code_index
    reader = IndexReader(d)
    assert reader.analyzer == "code"
    oracle = OracleIndex(
        doc_ids_from_int(corpus["doc_id"]),
        corpus["text"].to_pylist(),
        analyzer="code",
    )
    # splitmix64 mapping: oracle doc ids are engine-internal; compare
    # via the reader's out_ids convention (int id_col -> original ids)
    queries = [
        "parseJSONValue", "parse json", "http server", "getUserID",
        "user_id", "retryLimit maxRetryCount", "xml http request",
    ]
    from pisa_ray.docids import unsplitmix64

    for text in queries:
        golden = [
            (int(unsplitmix64(np.array([d_], dtype=np.uint64))[0]), s)
            for d_, s in oracle.score_query(text, 10)
        ]
        # oracle tie-break is on internal uint64 ids; engine tie-breaks
        # on user-visible ids — compare as sets of (doc, score) and the
        # score sequence (identical scores => same ranking up to ties)
        got = score_taat(reader, text, 10)
        assert [round(s, 9) for _, s in got] == [round(s, 9) for _, s in golden]
        assert {d_ for d_, _ in got} == {d_ for d_, _ in golden}
        assert len(got) > 0, text


def test_code_analyzer_matches_across_naming_conventions(code_index):
    """THE point of the code analyzer: a camelCase query matches
    snake_case docs and vice versa (both sides analyze to the same
    sub-tokens)."""
    from pisa_ray.scorer import IndexReader, score_conj

    d, corpus = code_index
    reader = IndexReader(d)
    texts = corpus["text"].to_pylist()
    # conjunctive "parse json value" must hit docs containing EITHER
    # naming convention of the identifier
    hits = {doc for doc, _ in score_conj(reader, "parseJSONValue", k=240)}
    want = {
        i
        for i, t in enumerate(texts)
        if "parseJSONValue" in t or "parse_json_value" in t
    }
    assert hits == want and len(want) > 0


def test_analyzer_resume_guard(code_index, tmp_path):
    """Resuming a code-analyzer index with analyzer='simple' must fail
    loudly (mixed tokenizations silently corrupt)."""
    from pisa_ray.build import IndexConfig, build_index

    d, corpus = code_index
    with pytest.raises(ValueError, match="analyzer"):
        build_index(
            corpus,
            d,
            IndexConfig(
                bucket_bits=2, term_parts=8, lineage_parts=1,
                id_col="doc_id", key_cols=(), content_col="text",
                meta_cols=(), analyzer="simple",
            ),
            resume=True,
        )


def test_query_pool_uses_index_analyzer(code_index):
    """query_index needs no analyzer argument — the scorer pool reads
    it from the index (camelCase query hits snake_case docs through the
    full Dataset path)."""
    import ray.data as rd

    from pisa_ray.scorer import query_index

    d, _ = code_index
    q = pa.table(
        {"query_id": pa.array([0], type=pa.int64()), "text": ["getUserID"]}
    )
    hits = query_index(rd.from_arrow(q), d, k=5, concurrency=2).to_pandas()
    assert len(hits) == 5


def test_phrase_search_uses_index_analyzer(code_index):
    """Phrase verification re-tokenizes candidates with the INDEX's
    analyzer: the phrase 'parse json value' must match BOTH naming
    conventions (camelCase and snake_case analyze to the same
    contiguous sub-token stream)."""
    import ray.data as rd

    from pisa_ray.pipelines.phrase import phrase_search

    d, corpus = code_index
    texts = corpus["text"].to_pylist()
    out = phrase_search(
        [(0, "parse json value")],
        d,
        rd.from_arrow(corpus),
        text_col="text",
        id_col="doc_id",
        concurrency=2,
    )
    want = {
        i
        for i, t in enumerate(texts)
        if "parseJSONValue" in t or "parse_json_value" in t
    }
    assert set(out["doc_id"].tolist()) == want and len(want) > 0


def test_simple_analyzer_casemap_matches_build_kernel_unicode():
    """tokenize_py must lower through the SAME casemap as the build
    kernel (pyarrow utf8proc simple mapping): U+0130 'İ' lowers to a
    plain 'i' on both sides — str.lower()'s full mapping would insert
    a combining dot and split the token, making queries miss indexed
    docs."""
    cases = ["İstanbul matches", "ÉTÉ üFoo", "Émile naïveBayes", "ẞß ΣΤΙΓΜΑΣ"]
    for analyzer in ANALYZERS:
        arr = pa.array(cases, type=pa.large_string())
        got = _flatten(arr, analyzer)
        assert got == [tokenize_py(c, analyzer) for c in cases], analyzer
    assert tokenize_py("İstanbul", "simple") == ["istanbul"]
