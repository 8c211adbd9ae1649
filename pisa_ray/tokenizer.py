"""Code tokenizer — zero-copy Arrow `map_batches` kernel.

Tokenization rule (shared verbatim by the engine, the numpy oracle and
the DuckDB oracle SQL): lowercase, split on any run of characters
outside ``[a-z0-9_]``, drop empties. This replaces the reference's
line parsers (/root/reference/src/utils/utils.py:18-31) with a
vectorized Arrow kernel: no Python-per-row work anywhere.

The per-doc (term, tf) aggregation is the analog of the reference's
``groupby('user_id')['item_id'].unique()`` clicked-set build
(/root/reference/src/helpers/Reader.py:188), done batch-locally so the
wide ``groupby(term)`` shuffle downstream only moves pre-aggregated
(term, doc, tf) triples, never raw tokens.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_SPLIT_RE = "[^a-z0-9_]+"
# The same rule for DuckDB oracle SQL (regexp_split_to_array input).
TOKEN_SPLIT_SQL = "[^a-z0-9_]+"


def tokenize_column(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """string column -> large_list<string> of lowercase tokens (may contain '')."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    lowered = pc.utf8_lower(content)
    return pc.split_pattern_regex(lowered, TOKEN_SPLIT_RE)


def doc_term_counts(
    content: pa.ChunkedArray | pa.Array,
) -> tuple[pa.LargeListArray, pa.LargeListArray, np.ndarray]:
    """Vectorized per-doc term counting.

    Returns (terms: list<string> per doc, tfs: list<uint32> per doc,
    doc_len: int64 token count per doc). Terms within a doc are sorted
    lexicographically (deterministic layout at any parallelism).
    """
    toks = tokenize_column(content)
    n_docs = len(toks)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    parents = parents[keep_np]

    # doc lengths (token counts after dropping empties)
    doc_len = np.zeros(n_docs, dtype=np.int64)
    np.add.at(doc_len, parents, 1)

    if len(flat) == 0:
        empty_terms = pa.LargeListArray.from_arrays(
            np.zeros(n_docs + 1, dtype=np.int64), pa.array([], type=pa.string())
        )
        empty_tfs = pa.LargeListArray.from_arrays(
            np.zeros(n_docs + 1, dtype=np.int64), pa.array([], type=pa.uint32())
        )
        return empty_terms, empty_tfs, doc_len

    # dictionary-encode tokens -> integer codes, then count (doc, code)
    dict_arr = flat.dictionary_encode()
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    codes = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = dict_arr.dictionary

    # sort vocab lexicographically so per-doc term lists come out sorted
    vorder = pc.array_sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty_like(vorder)
    rank[vorder] = np.arange(vorder.size)
    vocab_sorted = vocab.take(pa.array(vorder))
    ranks = rank[codes]

    key = parents.astype(np.int64) * np.int64(vorder.size) + ranks
    uniq, counts = np.unique(key, return_counts=True)
    u_parent = uniq // vorder.size
    u_rank = uniq % vorder.size

    # offsets per doc
    per_doc = np.zeros(n_docs, dtype=np.int64)
    np.add.at(per_doc, u_parent, 1)
    offsets = np.concatenate(([0], np.cumsum(per_doc)))

    term_vals = vocab_sorted.take(pa.array(u_rank)).cast(pa.string())
    tf_vals = pa.array(counts.astype(np.uint32))
    terms = pa.LargeListArray.from_arrays(offsets, term_vals)
    tfs = pa.LargeListArray.from_arrays(offsets, tf_vals)
    return terms, tfs, doc_len


def sha256_column(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256(utf8(content)) -> fixed_size_binary(32).

    hashlib per row (no vectorized sha256 in pyarrow); this is the
    per-row invariant column required by BASELINE.json input_hint.
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    out = [hashlib.sha256(s.encode("utf-8")).digest() for s in content.to_pylist()]
    return pa.array(out, type=pa.binary(32))


def tokenize_py(text: str) -> list[str]:
    """Single-string reference tokenizer (oracle + query parsing)."""
    import re

    return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
