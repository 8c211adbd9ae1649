"""Index-accelerated regex search (pipelines/phrase.regex_search).

Oracle = python `re.search` over every doc's raw text; patterns are
chosen RE2-compatible so both engines agree. The pruning analysis
(required_literals / required_index_terms) is pinned separately.
"""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def test_required_literals_conservative():
    from pisa_ray.pipelines.phrase import required_literals

    cases = {
        "merge_sort": ["merge_sort"],
        "foo.*bar": ["foo", "bar"],
        "a(bc)d": ["a", "bc", "d"],
        "x(?:yz)+w": ["x", "yz", "w"],   # min>=1 repeat recursed
        "x(?:yz)*w": ["x", "w"],         # optional: skipped
        "(ab|cd)e": ["e"],               # alternation: no requirement
        "[abc]def": ["def"],             # class breaks the run
        "colou?r": ["colo", "r"],        # optional char splits the run
        "^begin end$": ["begin end"],
        "a\\d+b": ["a", "b"],
    }
    for pat, want in cases.items():
        assert required_literals(pat) == want, pat
    # every required literal really does appear in every match
    rng = np.random.default_rng(0)
    for pat, lits in cases.items():
        probe = "xx merge_sort foo qq bar abcde xyzyzw colour begin end a77b def zz"
        m = re.search(pat, probe)
        if m:
            for lit in lits:
                assert lit in probe


def test_required_index_terms_interior_only():
    from pisa_ray.pipelines.phrase import required_index_terms

    # interior tokens only: first/last may be partial in a match
    assert required_index_terms("foo bar_x baz.*") == ["bar_x"]
    assert required_index_terms("merge") == []  # single token: droppable
    assert required_index_terms("a b c d") == ["b", "c"]
    # code analyzer splits camelCase inside the literal too
    assert required_index_terms("getFooBarBaz", "code") == ["bar", "foo"]


@pytest.fixture(scope="module")
def grep_index(tmp_path_factory):
    from pisa_ray.build import IndexConfig, build_index

    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, 9), dtype="int64"),
            "text": [
                "def merge_sort(arr): return sorted(arr)",
                "MERGE JOIN planner picks hash join instead",
                "class QuickSort: pass  # quick sort here",
                "merge conflicts in git are painful",
                "x = merge_sort(data); y = quick_sort(data)",
                "nothing relevant whatsoever",
                "mergesort without the underscore",
                "deep merge of json trees via recursion",
            ],
        }
    )
    d = str(tmp_path_factory.mktemp("grep_idx"))
    build_index(
        pa.Table.from_pandas(docs),
        d,
        IndexConfig(
            id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
            bucket_bits=1, term_parts=4, lineage_parts=1,
        ),
    )
    return d, docs


def test_regex_search_matches_python_re(grep_index):
    from pisa_ray.pipelines.phrase import regex_search

    d, docs = grep_index
    queries = [
        (0, r"merge_sort\(\w+\)"),     # pruned via merge_sort? interior-token rule applies
        (1, r"quick.?sort"),
        (2, r"merge.*json"),
        (3, r"zz_absent_zz"),
        (4, r"(hash|quick) (join|sort)"),  # alternation: full scan
    ]
    out = regex_search(queries, d, rd.from_pandas(docs), concurrency=2)
    for qid, pat in queries:
        want = sorted(
            int(i)
            for i, t in zip(docs["doc_id"], docs["text"])
            if re.search(pat, t)
        )
        got = out[out["query_id"] == qid]["doc_id"].tolist()
        assert got == want, (qid, pat, got, want)
    # determinism across parallelism
    out2 = regex_search(
        queries, d, rd.from_pandas(docs).repartition(5), concurrency=4
    )
    pd.testing.assert_frame_equal(out, out2)


def test_regex_search_pruning_is_exact(grep_index):
    """A query whose required terms prune to a small candidate set must
    return exactly the full-scan result (pruning = necessary filter)."""
    from pisa_ray.pipelines.phrase import (
        regex_search,
        required_index_terms,
    )

    d, docs = grep_index
    pat = r"x = merge_sort\(data\); y"
    assert required_index_terms(pat)  # really is pruned
    out = regex_search([(7, pat)], d, rd.from_pandas(docs))
    want = sorted(
        int(i) for i, t in zip(docs["doc_id"], docs["text"]) if re.search(pat, t)
    )
    assert out["doc_id"].tolist() == want and want  # non-trivial
    # empty candidate set short-circuits to an empty frame
    none = regex_search(
        [(8, r"a zz_nothing_here_at_all b")], d, rd.from_pandas(docs)
    )
    assert len(none) == 0
    assert list(none.columns) == ["query_id", "doc_id"]


def test_regex_search_empty_queries(grep_index):
    from pisa_ray.pipelines.phrase import regex_search

    d, docs = grep_index
    out = regex_search([], d, rd.from_pandas(docs))
    assert len(out) == 0 and list(out.columns) == ["query_id", "doc_id"]


def test_regex_search_sound_under_stemming(tmp_path):
    """Porter index: required interior tokens stem on BOTH sides, so
    pruning stays a necessary condition and results equal python re."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.phrase import regex_search, required_index_terms

    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, 5), dtype="int64"),
            "text": [
                "the running jumps fast over hurdles",
                "she runs and jumped quickly",
                "running shoes on sale",
                "totally unrelated words",
            ],
        }
    )
    d = str(tmp_path / "pidx")
    build_index(
        pa.Table.from_pandas(docs),
        d,
        IndexConfig(
            id_col="doc_id", key_cols=(), content_col="text", meta_cols=(),
            analyzer="porter", bucket_bits=1, term_parts=4, lineage_parts=1,
        ),
    )
    pat = r"the running jumps? fa"
    assert required_index_terms(pat, "porter")  # pruned path engages
    out = regex_search([(0, pat)], d, rd.from_pandas(docs))
    want = sorted(
        int(i) for i, t in zip(docs["doc_id"], docs["text"]) if re.search(pat, t)
    )
    assert out["doc_id"].tolist() == want and want


def test_regex_search_property_random_patterns(grep_index):
    """Property sweep: patterns composed from a restricted RE2-safe
    grammar over corpus words must match python-re exactly, pruned or
    not (seeded — deterministic)."""
    import itertools
    import random

    from pisa_ray.pipelines.phrase import regex_search

    d, docs = grep_index
    words = sorted(
        {w for t in docs["text"] for w in re.split(r"[^a-zA-Z0-9_]+", t) if w}
    )
    rng = random.Random(1234)
    pieces = [".*", r"\w+", r"\s", "?", ""]
    pats = []
    for _ in range(40):
        a, b = rng.choice(words), rng.choice(words)
        glue = rng.choice([".*", r"\W+", r"\s*x?", "|".join([rng.choice(words), rng.choice(words)])])
        shape = rng.randrange(4)
        if shape == 0:
            p = f"{re.escape(a)}{rng.choice(pieces)}"
        elif shape == 1:
            p = f"{re.escape(a)}.*{re.escape(b)}"
        elif shape == 2:
            p = f"({re.escape(a)}|{re.escape(b)}) {glue}"
        else:
            p = f"{re.escape(a)} {re.escape(b)}?"
        try:
            re.compile(p)
        except re.error:
            continue
        pats.append(p)
    queries = list(enumerate(pats))
    out = regex_search(queries, d, rd.from_pandas(docs), concurrency=3)
    for qid, pat in queries:
        want = sorted(
            int(i)
            for i, t in zip(docs["doc_id"], docs["text"])
            if re.search(pat, t)
        )
        got = out[out["query_id"] == qid]["doc_id"].tolist()
        assert got == want, (pat, got, want)


def test_regex_search_case_insensitive_code_analyzer(tmp_path):
    """(?i) under the case-splitting code analyzer disables pruning —
    a lowercase doc must not be pruned away by camelCase-derived
    required tokens (review finding)."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.pipelines.phrase import regex_search, required_index_terms

    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "text": ["x foobarbaz qux y", "x FooBarBaz qux y"],
        }
    )
    d = str(tmp_path / "ci_idx")
    build_index(
        pa.Table.from_pandas(docs), d,
        IndexConfig(id_col="doc_id", key_cols=(), content_col="text",
                    meta_cols=(), analyzer="code", bucket_bits=1,
                    term_parts=4, lineage_parts=1),
    )
    pat = r"(?i)x FooBarBaz qux"
    assert required_index_terms(pat, "code") == []  # pruning disabled
    out = regex_search([(0, pat)], d, rd.from_pandas(docs))
    assert out["doc_id"].tolist() == [1, 2]  # BOTH case variants found
    # case-sensitive form still prunes and stays exact
    pat_cs = r"x FooBarBaz qux"
    assert required_index_terms(pat_cs, "code")
    out2 = regex_search([(0, pat_cs)], d, rd.from_pandas(docs))
    assert out2["doc_id"].tolist() == [2]
    # folding analyzers keep pruning under (?i): simple lowercases
    # before splitting, so case variants tokenize identically
    assert required_index_terms(r"(?i)foo bar_z baz", "simple") == ["bar_z"]


def test_regex_search_tombstones_excluded_on_every_path(grep_index, tmp_path):
    """Deleted docs never resurface — not from the pruned tier, and
    not from a full-scan (literal-free) pattern (review finding)."""
    import shutil

    from pisa_ray.delete import delete_docs
    from pisa_ray.pipelines.phrase import regex_search

    d, docs = grep_index
    idx = str(tmp_path / "tomb_idx")
    shutil.copytree(d, idx)
    delete_docs(idx, [5])  # doc 5: "x = merge_sort(data); y = ..."
    queries = [
        (0, r"merge_sort\(\w+\)"),          # pruned tier
        (1, r"(merge|quick).*sort|sorted"),  # full-scan tier
    ]
    out = regex_search(queries, idx, rd.from_pandas(docs))
    assert 5 not in set(out["doc_id"])
    for qid, pat in queries:
        want = sorted(
            int(i)
            for i, t in zip(docs["doc_id"], docs["text"])
            if re.search(pat, t) and int(i) != 5
        )
        assert out[out["query_id"] == qid]["doc_id"].tolist() == want


def test_regex_search_mixed_batch_keeps_pruning(grep_index):
    """A literal-free query in the batch must not degrade the pruned
    queries to a full scan (review finding): results stay equal to
    running each query alone."""
    from pisa_ray.pipelines.phrase import regex_search

    d, docs = grep_index
    ds = rd.from_pandas(docs)
    mixed = [(0, r"merge_sort\(\w+\)"), (1, r".*")]
    out = regex_search(mixed, d, ds)
    for qid, pat in mixed:
        alone = regex_search([(qid, pat)], d, ds)
        assert (
            out[out["query_id"] == qid]["doc_id"].tolist()
            == alone["doc_id"].tolist()
        ), pat
    # the wildcard query matches everything; the pruned one stays exact
    assert len(out[out["query_id"] == 1]) == len(docs)


def test_regex_search_re2_only_syntax_falls_back(grep_index):
    """RE2-valid syntax the stdlib sre parser rejects (\\p{L}) must not
    crash literal extraction — the query falls back to the unpruned
    full scan and is judged by the Arrow RE2 engine (advisor finding)."""
    import pyarrow.compute as pc

    from pisa_ray.pipelines.phrase import (
        regex_search,
        required_index_terms,
        required_literals,
    )

    pat = r"\p{L}+_sort"
    assert required_literals(pat) == []          # no crash, no terms
    assert required_index_terms(pat) == []       # -> full-scan path

    d, docs = grep_index
    out = regex_search([(0, pat)], d, rd.from_pandas(docs), concurrency=2)
    want = sorted(
        int(i)
        for i, t in zip(docs["doc_id"], docs["text"])
        if pc.match_substring_regex(pa.array([t]), pat)[0].as_py()
    )
    assert out["doc_id"].tolist() == want
    assert want  # the fixture really exercises the RE2 branch
