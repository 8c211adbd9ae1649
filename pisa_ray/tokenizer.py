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

# Analyzers (chosen at BUILD time, recorded in stats.json, applied to
# queries by every reader — mixing analyzers between build and query
# silently empties results, so the index carries the truth):
#   "simple": lowercase, split on runs outside [a-z0-9_] (identifiers
#             stay whole: "parse_json"/"parseJSON" -> one token each).
#   "code":   identifier-aware (the Zoekt / GitHub-code-search
#             convention): underscore is a separator, camelCase and
#             ACRONYMCase transitions split BEFORE lowercasing —
#             "parseJSONValue" -> parse/json/value, "foo_bar" ->
#             foo/bar, "HTTPServer2" -> http/server2. Boundaries:
#             non-alphanumeric byte; lower|digit -> Upper; Upper ->
#             Upper+lower (acronym end). Digit<->letter stays joined.
# "porter" = simple tokenization + Porter stemming; "code_porter" =
# code-aware identifier splitting + Porter stemming (stem.py). The
# stem is applied per unique token (dictionary), not per occurrence.
ANALYZERS = ("simple", "code", "porter", "code_porter")


def tokenize_column(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """string column -> large_list<string> of lowercase tokens (may contain '')."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    lowered = pc.utf8_lower(content)
    return pc.split_pattern_regex(lowered, TOKEN_SPLIT_RE)


def _token_byte_class(buf: np.ndarray) -> np.ndarray:
    """Bool mask of bytes allowed inside a token ([a-z0-9_]).

    Wrapping uint8 subtraction turns each range test into one compare
    (4x faster than a 256-entry LUT gather, which defeats the
    hardware prefetcher).
    """
    v = (buf - np.uint8(ord("a"))) < np.uint8(26)
    v |= (buf - np.uint8(ord("0"))) < np.uint8(10)
    v |= buf == np.uint8(ord("_"))
    return v


def _tune_malloc() -> None:
    """Keep freed numpy temporaries on the glibc heap.

    The kernel below allocates ~6 buffer-sized temporaries per batch;
    with default glibc tunables those go through mmap and are munmap'd
    on free, so every batch re-faults ~150 MB of pages — measured 0.5 s
    vs 4-8 s per 27 MB batch on this host when the pages come back cold.
    Raising M_MMAP_THRESHOLD/M_TRIM_THRESHOLD retains the blocks for
    reuse (bounded by one batch's peak, not cumulative). Best-effort:
    silently a no-op off glibc.
    """
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 28)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_malloc()


def tokenize_flat(
    content: pa.ChunkedArray | pa.Array,
    analyzer: str = "simple",
) -> tuple[pa.Array, np.ndarray, int]:
    """(flat non-empty tokens, doc parent indices, n_docs) — the hot
    build path, byte-vectorized.

    ``analyzer="simple"`` is bit-identical to regex-splitting
    ``utf8_lower(content)`` on ``TOKEN_SPLIT_RE`` and dropping empties
    (the ``tokenize_column`` rule): the token byte class is pure ASCII
    and every byte of a multi-byte UTF-8 codepoint is >= 0x80 — a
    separator under both the byte view and the codepoint regex.
    Replaces the RE2 split that was ~63% of tokenize-kernel CPU with
    numpy boundary scans over the lowered string buffer.

    ``analyzer="code"`` scans the ORIGINAL bytes (case is the signal),
    adds camelCase/ACRONYMCase token-start bits and treats ``_`` as a
    separator, then ASCII-lowers only the gathered token bytes — same
    one-pass cost shape, no regex anywhere (equivalence to the
    two-regex pure-Python reference is pytest-pinned).
    """
    if analyzer not in ANALYZERS:
        raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    code = analyzer in ("code", "code_porter")
    stem = analyzer in ("porter", "code_porter")
    lowered = content if code else pc.utf8_lower(content)
    n_docs = len(lowered)
    if n_docs == 0:
        return pa.array([], type=pa.large_string()), np.empty(0, dtype=np.int64), 0
    off_dtype = np.int64 if pa.types.is_large_string(lowered.type) else np.int32
    raw_off = np.frombuffer(lowered.buffers()[1], dtype=off_dtype)
    offs = raw_off[lowered.offset : lowered.offset + n_docs + 1].astype(np.int64)
    lo, hi = int(offs[0]), int(offs[-1])
    databuf = lowered.buffers()[2]
    if databuf is None or hi == lo:
        # every row empty/null -> no tokens
        return pa.array([], type=pa.large_string()), np.empty(0, dtype=np.int64), n_docs
    data = np.frombuffer(databuf, dtype=np.uint8)
    buf = data[lo:hi]
    offs = offs - lo
    # nulls: their offsets are equal (zero-length span) -> no tokens,
    # matching the regex path where a null row flattens to nothing
    if code:
        upper = (buf - np.uint8(ord("A"))) < np.uint8(26)
        low = (buf - np.uint8(ord("a"))) < np.uint8(26)
        digit = (buf - np.uint8(ord("0"))) < np.uint8(10)
        v = upper | low | digit
    else:
        v = _token_byte_class(buf)
    start = v.copy()
    start[1:] &= ~v[:-1]
    # interior doc boundaries (the byte buffer is contiguous across
    # docs), needed below for both boundary forcing and the code
    # analyzer's lookahead masking
    inner = offs[1:-1]
    inner = inner[(inner > 0) & (inner < v.size)]
    if code:
        # camelCase: lower|digit -> Upper starts a token ("parseJSON").
        # Lookbehind may cross into the previous doc, but then i IS a
        # doc start and the boundary forcing below sets start[i] anyway.
        start[1:] |= upper[1:] & (low[:-1] | digit[:-1])
        if buf.size >= 3:
            # acronym end: Upper -> Upper+lower ("HTTPServer" -> S
            # starts). The LOOKAHEAD byte must belong to the same doc —
            # a doc ending "..FS" followed by one starting "s.." must
            # not split the acronym.
            same_doc_next = np.ones(buf.size, dtype=bool)
            if inner.size:
                same_doc_next[inner - 1] = False
            start[1:-1] |= (
                upper[1:-1] & upper[:-2] & low[2:] & same_doc_next[1:-1]
            )
    # force token breaks at document boundaries. Boundaries at 0 or
    # len(buf) (leading/trailing empty docs) need no forcing —
    # start[0]/end[-1] are already correct.
    start[inner[v[inner]]] = True
    # a token ends where the class run ends OR the next byte starts a
    # new token (camel transition / forced doc boundary)
    end = v.copy()
    end[:-1] &= (~v[1:]) | start[1:]
    starts = np.flatnonzero(start)
    ends = np.flatnonzero(end) + 1
    if starts.size == 0:
        return (
            pa.array([], type=pa.large_string()),
            np.empty(0, dtype=np.int64),
            n_docs,
        )
    lengths = ends - starts
    tok_off = np.empty(starts.size + 1, dtype=np.int64)
    tok_off[0] = 0
    np.cumsum(lengths, out=tok_off[1:])
    # concatenated token bytes == all token-class bytes in buffer order
    # (tokens are exactly the maximal runs of v, split only at interior
    # start bits — which drop no bytes), so a boolean mask replaces a
    # per-byte gather index
    tok_bytes = buf[v]
    if code:
        # ASCII-lower just the gathered token bytes (tokens are pure
        # [a-zA-Z0-9], so +32 on A-Z is exact lowercasing)
        tok_bytes[upper[v]] += np.uint8(32)
    flat = pa.Array.from_buffers(
        pa.large_string(),
        starts.size,
        [None, pa.py_buffer(tok_off), pa.py_buffer(tok_bytes)],
    )
    if stem:
        # stem the batch's token DICTIONARY (unique tokens ≪
        # occurrences) and gather back — token COUNT and positions are
        # unchanged (stemming is 1:1), so parents/doc lengths hold
        from .stem import stem_tokens

        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        stemmed = pa.array(
            stem_tokens(denc.dictionary.to_pylist()), type=pa.large_string()
        )
        flat = stemmed.take(denc.indices)
    # parents: count tokens per doc (n_docs small searches into the
    # sorted starts) then repeat — ~6x cheaper than searchsorted per
    # token. A start exactly at an inner doc boundary counts as < the
    # next boundary, so it lands in the doc that begins there; runs of
    # equal offsets (empty/null docs) yield zero counts.
    cuts = np.searchsorted(starts, offs[1:-1])
    counts = np.diff(np.concatenate(([0], cuts, [starts.size])))
    parents = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    return flat, parents, n_docs


def doc_term_counts(
    content: pa.ChunkedArray | pa.Array,
    analyzer: str = "simple",
    with_positions: bool = False,
) -> tuple:
    """Vectorized per-doc term counting.

    Returns (terms: list<string> per doc, tfs: list<uint32> per doc,
    doc_len: int64 token count per doc). Terms within a doc are sorted
    lexicographically (deterministic layout at any parallelism).

    ``with_positions=True`` appends a 4th element: per-doc
    ``list<large_binary>`` aligned with ``terms`` — each entry is the
    VARINT-encoded gap stream of the term's within-doc token positions
    (0-based, post-empty-drop; first value absolute, rest deltas, so
    the bytes are ready to concatenate into the index's positional
    posting blobs with no re-encode). tf == number of positions by
    construction, which is what lets readers split the flat stream
    without storing per-posting offsets."""
    flat, parents, n_docs = tokenize_flat(content, analyzer)

    # doc lengths (token counts after dropping empties)
    doc_len = np.bincount(parents, minlength=n_docs).astype(np.int64)

    if len(flat) == 0:
        empty_terms = pa.LargeListArray.from_arrays(
            np.zeros(n_docs + 1, dtype=np.int64), pa.array([], type=pa.string())
        )
        empty_tfs = pa.LargeListArray.from_arrays(
            np.zeros(n_docs + 1, dtype=np.int64), pa.array([], type=pa.uint32())
        )
        if with_positions:
            empty_pos = pa.LargeListArray.from_arrays(
                np.zeros(n_docs + 1, dtype=np.int64),
                pa.array([], type=pa.large_binary()),
            )
            return empty_terms, empty_tfs, doc_len, empty_pos
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

    # count (doc, rank) pairs: stable integer sort (numpy radix) + run
    # length encode — ~2x np.unique, which comparison-sorts. The key is
    # packed into uint32 when it fits (n_docs x vocab < 2^32 for any
    # sane batch size): LSD radix sorts per byte, so halving the key
    # width halves the sort passes (measured 20.6 -> ~10 us/doc).
    V = vorder.size
    if n_docs * V < 1 << 32:
        key = parents.astype(np.uint32) * np.uint32(V) + ranks.astype(np.uint32)
    else:
        key = parents.astype(np.int64) * np.int64(V) + ranks
    if with_positions:
        # positions need the permutation, not just the sorted keys: a
        # stable argsort keeps each (doc, term) group's occurrences in
        # original token order, i.e. strictly increasing position
        order = np.argsort(key, kind="stable")
        skey = key[order]
    else:
        skey = np.sort(key, kind="stable")
    mask = np.empty(skey.size, dtype=bool)
    mask[0] = True
    np.not_equal(skey[1:], skey[:-1], out=mask[1:])
    first = np.flatnonzero(mask)
    counts = np.diff(first, append=skey.size)
    uniq = skey[first]
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
    if not with_positions:
        return terms, tfs, doc_len

    from .codec import varint_encode, varint_lengths

    # within-doc token position of every flat token, gathered into the
    # sorted (doc, term) stream; gaps reset at group starts (`first`)
    doc_starts = np.concatenate(([0], np.cumsum(doc_len[:-1])))
    spos = (np.arange(parents.size, dtype=np.int64) - doc_starts[parents])[order]
    gaps = spos.copy()
    gaps[1:] -= spos[:-1]
    gaps[first] = spos[first]
    gaps_u = gaps.astype(np.uint64)
    blens = varint_lengths(gaps_u)
    pbytes = varint_encode(gaps_u, _nbytes=blens)
    goffs = np.zeros(first.size + 1, dtype=np.int64)
    np.cumsum(np.add.reduceat(blens, first), out=goffs[1:])
    pos_bin = pa.Array.from_buffers(
        pa.large_binary(),
        first.size,
        [None, pa.py_buffer(goffs), pa.py_buffer(np.ascontiguousarray(pbytes))],
    )
    poslists = pa.LargeListArray.from_arrays(offsets, pos_bin)
    return terms, tfs, doc_len, poslists


def sha256_column(content: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256(utf8(content)) -> fixed_size_binary(32).

    hashlib per row (no vectorized sha256 in pyarrow); this is the
    per-row invariant column required by BASELINE.json input_hint.
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    out = [hashlib.sha256(s.encode("utf-8")).digest() for s in content.to_pylist()]
    return pa.array(out, type=pa.binary(32))


def tokenize_py(text: str, analyzer: str = "simple") -> list[str]:
    """Single-string reference tokenizer (oracle + query parsing).

    ``analyzer="code"`` is the two-regex formulation of the byte
    kernel's rules: insert a break at lower|digit->Upper and at
    Upper->Upper+lower, split on non-alphanumeric (underscore included)
    in ORIGINAL case, then ASCII-lower each token."""
    import re

    if analyzer not in ANALYZERS:
        raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")
    if analyzer in ("porter", "code_porter"):
        from .stem import porter_stem

        base = "code" if analyzer == "code_porter" else "simple"
        return [porter_stem(t) for t in tokenize_py(text, base)]
    if analyzer == "code":
        s = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", text)
        s = re.sub(r"([A-Z])([A-Z][a-z])", r"\1 \2", s)
        # tokens are pure [a-zA-Z0-9]; .lower() on them is exact ASCII
        return [t.lower() for t in re.split(r"[^a-zA-Z0-9]+", s) if t]
    if text.isascii():
        # ASCII fast path (virtually every query): simple and full
        # case mappings agree, skip the pyarrow kernel dispatch
        return [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
    # lowercase through pyarrow (utf8proc SIMPLE case mapping), NOT
    # str.lower() (full mapping): the build kernel lowers with
    # pc.utf8_lower, and the two differ on e.g. U+0130 'İ' (simple: i;
    # full: i + combining dot, which would split the token) — queries
    # must tokenize EXACTLY like the indexed docs did.
    lowered = pc.utf8_lower(pa.array([text], type=pa.string()))[0].as_py()
    return [t for t in re.split(TOKEN_SPLIT_RE, lowered) if t]


def ed_le1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 (substitution/insert/delete) — shared
    by the query-typo expander (scorer.TermExpander) and the
    record-linkage join (relational.fuzzy_join): two-pointer scan, no
    DP table."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:  # exactly one substitution
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b = a with one insertion: two-pointer single skip
    i = j = 0
    skipped = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = True
            j += 1
    return True
