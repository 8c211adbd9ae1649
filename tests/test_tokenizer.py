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
