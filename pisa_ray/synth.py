"""Deterministic synthetic source-code corpus + query set (FIXTURES.md F1/F2).

Seeded numpy RNG only — no wall clock, no external data — mirroring the
reference's reproducibility discipline
(/root/reference/src/utils/utils.py:82-87). Content is Zipf-distributed
over a code-like vocabulary with a handful of rank-1 stop tokens in
>90% of docs, to force the stop-word posting-list skew the salted /
bucketed merge must absorb.

Synthesis is partition-parallel: each partition's rows depend only on
(seed, partition index), so the corpus is byte-identical at any
parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

EXTS = ["py", "rs", "go", "js", "java"]
LANG_OF = {"py": "python", "rs": "rust", "go": "go", "js": "javascript", "java": "java"}

STOP_TOKENS = ["def", "return", "self", "if", "for"]
KEYWORDS = [
    "class", "import", "from", "while", "else", "elif", "try", "except",
    "lambda", "yield", "with", "assert", "break", "continue", "pass",
    "true", "false", "none", "int", "str", "float", "list", "dict", "set",
    "len", "range", "print", "open", "close", "read", "write", "append",
]


def _vocab(size: int = 30_000) -> list[str]:
    v = list(STOP_TOKENS) + list(KEYWORDS)
    v += [f"var_{i}" for i in range(size - len(v))]
    return v


def make_corpus(
    n_rows: int,
    seed: int = 42,
    n_partitions: int = 8,
    vocab_size: int = 30_000,
    min_tokens: int = 20,
    max_tokens: int = 2_000,
    wide_row_permille: int = 1,
) -> pa.Table:
    """Build the full corpus table (driver-side; partition-deterministic)."""
    parts = []
    base = n_rows // n_partitions
    rem = n_rows % n_partitions
    start = 0
    for p in range(n_partitions):
        rows = base + (1 if p < rem else 0)
        parts.append(
            make_corpus_partition(
                p, rows, start, seed, vocab_size, min_tokens, max_tokens,
                wide_row_permille,
            )
        )
        start += rows
    return pa.concat_tables(parts)


def make_corpus_partition(
    part: int,
    rows: int,
    row_offset: int,
    seed: int = 42,
    vocab_size: int = 30_000,
    min_tokens: int = 20,
    max_tokens: int = 2_000,
    wide_row_permille: int = 1,
) -> pa.Table:
    rng = np.random.default_rng(np.random.SeedSequence([seed, part]))
    vocab = np.array(_vocab(vocab_size))

    # Zipf(s=1.2) over vocab ranks, truncated to vocab_size.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** -1.2
    probs /= probs.sum()

    repo_i = rng.integers(0, 20, size=rows)
    repo_j = rng.zipf(1.5, size=rows) % 50
    repos = np.array([f"org{i}/repo{j}" for i, j in zip(repo_i, repo_j)])
    dir_a = rng.integers(0, 40, size=rows)
    file_b = row_offset + np.arange(rows)
    ext = np.array(EXTS)[rng.integers(0, len(EXTS), size=rows)]
    paths = np.array(
        [f"src/dir{a}/file{b}.{e}" for a, b, e in zip(dir_a, file_b, ext)]
    )
    commits = np.array(
        [
            hashlib.sha1(f"{r}\x00{p}\x00{int(d)}".encode()).hexdigest()
            for r, p, d in zip(repos, paths, rng.integers(0, 1 << 30, size=rows))
        ]
    )
    langs = np.array([LANG_OF[e] for e in ext])

    lengths = rng.integers(min_tokens, max_tokens + 1, size=rows)
    if wide_row_permille:
        wide = rng.random(rows) < wide_row_permille / 1000.0
        lengths = np.where(wide, 50_000, lengths)

    # draw ALL tokens for the partition at once (inverse-CDF sampling —
    # rng.choice(p=...) recomputes the cumsum per call and is ~100x slower)
    cdf = np.cumsum(probs)
    total = int(lengths.sum())
    codes = np.searchsorted(cdf, rng.random(total), side="right")
    codes = np.minimum(codes, vocab_size - 1)
    offsets = np.concatenate(([0], np.cumsum(lengths)))
    stoppy = rng.random(rows) < 0.92  # stop tokens in >90% of docs
    stop_codes = rng.integers(0, len(STOP_TOKENS), size=total)
    contents = []
    for i in range(rows):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        toks = codes[lo:hi]
        if stoppy[i]:
            n = hi - lo
            pos = rng.integers(0, n, size=max(1, n // 50))
            toks = toks.copy()
            toks[pos] = stop_codes[lo:lo + pos.size]
        contents.append(" ".join(vocab[toks]))

    return pa.table(
        {
            "repo": pa.array(repos.tolist(), type=pa.string()),
            "path": pa.array(paths.tolist(), type=pa.string()),
            "commit": pa.array(commits.tolist(), type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "content": pa.array(contents, type=pa.large_string()),
        }
    )


def make_queries(n: int = 200, seed: int = 43, vocab_size: int = 30_000) -> pa.Table:
    """Reference query set (FIXTURES.md F2): rare / common / multi-term /
    stop-token / out-of-vocabulary mixes."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)
    texts = []
    for qid in range(n):
        kind = qid % 5
        if kind == 0:  # single rare term
            texts.append(vocab[int(rng.integers(vocab_size // 2, vocab_size))])
        elif kind == 1:  # single common term
            texts.append(vocab[int(rng.integers(5, 200))])
        elif kind == 2:  # multi-term mixed
            k = int(rng.integers(2, 5))
            texts.append(" ".join(vocab[int(rng.integers(0, 2000))] for _ in range(k)))
        elif kind == 3:  # contains a stop token
            texts.append(
                STOP_TOKENS[int(rng.integers(0, len(STOP_TOKENS)))]
                + " "
                + vocab[int(rng.integers(200, 5000))]
            )
        else:  # out-of-vocabulary term (empty-result path)
            texts.append(f"zz_oov_{qid} " + vocab[int(rng.integers(0, 500))])
    return pa.table(
        {
            "query_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def make_bool_queries(n: int = 200, seed: int = 47, vocab_size: int = 30_000) -> pa.Table:
    """Boolean (AND/OR/NOT) benchmark query set: five predicate shapes
    cycling by query id, operands mixing common / mid / rare vocabulary
    ranks. Never emits a pure-negative query (those are rejected by the
    engine). Deterministic in (n, seed)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size)

    def common() -> str:
        return vocab[int(rng.integers(5, 200))]

    def mid() -> str:
        return vocab[int(rng.integers(200, 5000))]

    def rare() -> str:
        return vocab[int(rng.integers(vocab_size // 2, vocab_size))]

    texts = []
    for qid in range(n):
        kind = qid % 5
        if kind == 0:
            texts.append(f"{common()} AND {mid()}")
        elif kind == 1:
            texts.append(f"{mid()} OR {rare()}")
        elif kind == 2:
            texts.append(f"{common()} AND ({mid()} OR {mid()})")
        elif kind == 3:
            texts.append(f"{mid()} AND NOT {common()}")
        else:
            texts.append(f"({common()} OR {mid()}) AND NOT ({common()} OR {rare()})")
    return pa.table(
        {
            "query_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
