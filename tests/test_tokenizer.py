"""Tokenizer kernel tests — vectorized Arrow path vs pure-Python reference."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from pisa_ray.tokenizer import doc_term_counts, sha256_column, tokenize_py


def test_tokenize_py_rule():
    assert tokenize_py("Def foo(bar): return Bar_1+foo") == [
        "def", "foo", "bar", "return", "bar_1", "foo",
    ]
    assert tokenize_py("") == []
    assert tokenize_py("  \n\t ") == []
    assert tokenize_py("x") == ["x"]


def test_doc_term_counts_matches_python():
    texts = [
        "Def foo(bar): return Bar_1 + foo",
        "",
        "a a a b",
        "self.self self, SELF",
        "123 1_2 _x __init__",
    ]
    col = pa.array(texts, type=pa.large_string())
    terms, tfs, dl = doc_term_counts(col)
    for i, text in enumerate(texts):
        want = Counter(tokenize_py(text))
        got = dict(zip(terms[i].as_py(), tfs[i].as_py()))
        assert got == dict(want), (i, got, want)
        assert dl[i] == sum(want.values())
        # per-doc term lists are sorted (deterministic layout)
        assert terms[i].as_py() == sorted(want.keys())


def test_doc_term_counts_random_roundtrip():
    rng = np.random.default_rng(5)
    vocab = ["def", "x", "var_1", "var_22", "z9"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 60)))
        for _ in range(50)
    ]
    col = pa.array(texts, type=pa.large_string())
    terms, tfs, dl = doc_term_counts(col)
    for i, text in enumerate(texts):
        want = Counter(tokenize_py(text))
        assert dict(zip(terms[i].as_py(), tfs[i].as_py())) == dict(want)
    # sum of tf over a doc equals its length
    assert all(
        sum(tfs[i].as_py()) == dl[i] for i in range(len(texts))
    )


def test_sha256_column():
    col = pa.array(["hello", "", "ünïcode"], type=pa.large_string())
    got = sha256_column(col)
    for i, s in enumerate(["hello", "", "ünïcode"]):
        assert got[i].as_py() == hashlib.sha256(s.encode("utf-8")).digest()


def test_tokenize_flat_matches_regex_rule():
    """Byte-vectorized flat tokenizer is bit-identical to regex-splitting
    utf8_lower on TOKEN_SPLIT_RE and dropping empties — including nulls,
    leading/trailing empty docs (boundary forcing), all-separator and
    all-empty batches, multibyte UTF-8, sliced (nonzero offset) and
    chunked inputs, both string widths."""
    import pyarrow.compute as pc

    from pisa_ray.tokenizer import tokenize_column, tokenize_flat

    def regex_ref(content):
        toks = tokenize_column(content)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        return flat.filter(keep).to_pylist(), parents[keep_np]

    cases = [
        ["hello world", "Foo_Bar123 baz"],
        ["", "a", "", ""],
        ["", "", "lead"],
        [None, "x y", None],
        ["", None, ""],
        ["!!!", "   ", "..."],
        ["ünïcödé tökens", "日本語 text mix"],
        ["tail_token", ""],
        ["", "y"],
        ["A-B_c.d", "e"],
        [],
    ]
    rng = np.random.default_rng(7)
    words = ["foo", "BAR", "b_z", "123", "ünï", "日本", "x!y", "", " ", "a" * 40]
    for _ in range(40):
        cases.append([
            None if rng.random() < 0.15
            else " ".join(rng.choice(words, size=rng.integers(0, 8)))
            for _ in range(rng.integers(0, 20))
        ])

    for case in cases:
        for typ in (pa.string(), pa.large_string()):
            arr = pa.array(case, type=typ)
            variants = [arr, pa.chunked_array([arr, arr])]
            if len(arr) > 2:
                variants.append(arr.slice(1, len(arr) - 2))
            for a in variants:
                flat, parents, n_docs = tokenize_flat(a)
                want_flat, want_parents = regex_ref(a)
                assert flat.to_pylist() == want_flat, case
                assert np.array_equal(parents, want_parents), case
                assert n_docs == len(a)
