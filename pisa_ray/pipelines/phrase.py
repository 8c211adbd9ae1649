"""Phrase search: exact contiguous-token-sequence matching.

Two implementations, chosen by what the index stores:

* **Index-native** (``phrase_search_index`` / ``score_phrase``, plus
  the sharded variants): requires ``IndexConfig(positions=True)`` —
  adjacency resolves purely from positional postings, zero corpus
  access. This is the 100 TB path.
* **Composition** (``phrase_search``, below): when the index stores no
  token positions (posting payloads are docID gaps + tf), phrase
  matching is the classic two-stage composition real engines use when
  positions are absent:

1. **Prune on the index**: a doc matching the phrase necessarily
   contains every phrase term, so the conjunctive candidate set
   (``score_conj`` — intersection driven by the rarest term's postings)
   is a superset of the answer. This is the cheap, index-resident step.
2. **Verify on the corpus**: only candidate rows are re-tokenized; the
   normalized token stream is space-joined and the phrase becomes a
   plain substring probe (`` tok1 tok2 tok3 `` inside `` ...tokens... ``)
   — one vectorized RE2-free Arrow pass per batch.

Partitioning assumption (documented per the custom-operator rule): the
candidate (query_id, doc_id) table fits in the object store — true for
real phrase queries, whose rarest term bounds the candidate count. A
stop-word-only phrase degenerates to the full corpus; at that point a
positional posting format is the right tool, not this composition. The
verify pass streams the corpus (column-pruned to (id, text)) and
evaluates the join only on candidate rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..scorer import IndexReader, score_conj
from ..tokenizer import tokenize_flat, tokenize_py


def _index_analyzer(index_dir: str) -> str:
    """The analyzer the index was BUILT with (stats.json) — phrase /
    proximity / snippet verification must tokenize docs and queries
    exactly like the index did or candidates and matches diverge."""
    import json
    import os

    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f).get("analyzer", "simple")


def _flat_tokens(texts: pa.ChunkedArray | pa.Array, analyzer: str):
    """(flat tokens, parent row indices) via the canonical build-side
    byte kernel (empties already dropped, analyzer-aware)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, parents, _ = tokenize_flat(texts, analyzer)
    return flat, parents


def normalize_phrase(text: str, analyzer: str = "simple") -> str:
    """The phrase in index-token space: lowercase tokens joined by one
    space (the same normalization the verify pass applies to docs)."""
    return " ".join(tokenize_py(text, analyzer))


def _conj_candidates(
    queries: list[tuple[int, str]], index_dir: str, concurrency: int = 4
) -> pa.Table:
    """All docs containing every phrase term, per query — distributed
    over the query axis (each task holds the broadcast reader and
    intersects postings for its query slice)."""
    from ..scorer import _broadcast_reader

    reader_ref = _broadcast_reader(index_dir)

    @ray.remote(num_cpus=1)
    def part(qs: list[tuple[int, str]], ref) -> pa.Table:
        reader = ref if isinstance(ref, IndexReader) else ray.get(ref)
        qids, docs = [], []
        for qid, text in qs:
            hits = score_conj(reader, text, k=reader.n_docs)
            qids.extend([qid] * len(hits))
            docs.extend(d for d, _ in hits)
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "doc_id": pa.array(np.asarray(docs, dtype=np.uint64).view(np.int64)),
            }
        )

    n = max(1, min(concurrency, len(queries)))
    chunks = [queries[i::n] for i in range(n)]
    parts = ray.get([part.remote(c, reader_ref) for c in chunks if c])
    return pa.concat_tables(parts)


def phrase_search(
    queries: list[tuple[int, str]],
    index_dir: str,
    corpus: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> pd.DataFrame:
    """-> (query_id, doc_id) rows for every doc whose token stream
    contains the query phrase contiguously; deterministic order
    (query_id, doc_id). ``corpus`` must be the same table the index
    was built over (column-pruned by the caller to (id, text))."""
    analyzer = _index_analyzer(index_dir)
    phrases = [(qid, normalize_phrase(text, analyzer)) for qid, text in queries]
    phrases = [(qid, p) for qid, p in phrases if p]
    if not phrases:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"), "doc_id": pd.Series(dtype="int64")})

    cand = _conj_candidates(phrases, index_dir, concurrency=concurrency)
    cand_ids = pc.unique(cand["doc_id"])
    if len(cand_ids) == 0:
        return pd.DataFrame({"query_id": pd.Series(dtype="int64"), "doc_id": pd.Series(dtype="int64")})
    ids_ref = ray.put(cand_ids)
    # a phrase match implies conjunctive candidacy, so probing every
    # candidate doc against every phrase is exact — no per-query
    # candidate bookkeeping needed in the verify pass
    needles = [(qid, f" {p} ") for qid, p in phrases]

    def verify(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch[id_col], value_set=ray.get(ids_ref))
        batch = batch.filter(keep)
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        flat, parents = _flat_tokens(batch[text_col], analyzer)
        counts = np.bincount(parents, minlength=batch.num_rows).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)))
        # binary_join has no large_list/large_string kernel: narrow the
        # offsets (a verify batch's token bytes are far below 2 GiB)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), flat.cast(pa.string())
        )
        joined = pc.binary_join(lists, " ")
        # sentinel spaces so substring probes are token-aligned
        joined = pc.binary_join_element_wise(" ", joined, " ", "")
        out_q, out_d = [], []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for qid, needle in needles:
            hit = pc.match_substring(joined, needle).to_numpy(zero_copy_only=False)
            if hit.any():
                out_q.append(np.full(int(hit.sum()), qid, dtype=np.int64))
                out_d.append(ids[hit])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d).astype(np.int64)),
            }
        )

    hits = corpus.select_columns([id_col, text_col]).map_batches(
        verify, batch_format="pyarrow"
    )
    df = hits.to_pandas()
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


def snippets(
    queries: list[tuple[int, str]],
    hits,
    corpus: rd.Dataset,
    width: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "simple",
    index_dir: str | None = None,
) -> pd.DataFrame:
    """Result highlighting: for every (query_id, doc_id) hit row, the
    best ``width``-token window of the doc — the window containing the
    most DISTINCT query terms, earliest on ties — as a space-joined
    normalized-token snippet, plus ``n_matched`` (distinct terms in the
    window) and ``tok_start``. The full-text analog of the reference's
    per-user top-k result files (golden (doc, score) lists,
    /root/reference/src/helpers/Runner.py:94-98) upgraded with the
    evidence a search UI shows.

    One corpus pass, restricted to hit docs (``pc.is_in`` prune); the
    window choice is a two-pointer sweep over a doc's QUERY-TERM
    occurrences only (candidate-bounded, same argument as
    ``phrase_search``). Snippets are in normalized token space (the
    space every index/oracle comparison in this repo uses).

    Pass ``index_dir`` when the hits came from an index (the usual
    case): the analyzer is then read from its stats.json, overriding
    ``analyzer`` — highlighting must tokenize like the index that
    produced the hits or query terms never match the token stream."""
    if index_dir is not None:
        analyzer = _index_analyzer(index_dir)
    if isinstance(hits, pa.Table):
        hits = hits.to_pandas()
    parsed = {qid: sorted(set(tokenize_py(text, analyzer))) for qid, text in queries}
    pairs = {
        (int(q), int(d))
        for q, d in zip(hits["query_id"], hits[id_col])
        if int(q) in parsed
    }
    empty_df = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "snippet": pd.Series(dtype="object"),
            "n_matched": pd.Series(dtype="int64"),
            "tok_start": pd.Series(dtype="int64"),
        }
    )
    if not pairs:
        return empty_df
    out_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            ("doc_id", pa.int64()),
            ("snippet", pa.string()),
            ("n_matched", pa.int64()),
            ("tok_start", pa.int64()),
        ]
    )
    want_ids = pa.array(
        np.fromiter({d for _, d in pairs}, dtype=np.int64), type=pa.int64()
    )
    ids_ref = ray.put(want_ids)
    by_doc: dict[int, list[int]] = {}
    for q, d in pairs:
        by_doc.setdefault(d, []).append(q)

    def extract(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(batch[id_col], pa.int64()), value_set=ray.get(ids_ref))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return out_schema.empty_table()
        flat, parents = _flat_tokens(batch[text_col], analyzer)
        counts = np.bincount(parents, minlength=batch.num_rows).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)))
        flat_np = np.asarray(flat.to_pylist(), dtype=object)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # one vectorized label pass per (query, term) over the FLAT
        # token array (the same pc.equal-on-flat pattern as
        # proximity_search) — never per doc
        qlab: dict[int, np.ndarray] = {}
        for qid in {q for qs_ in by_doc.values() for q in qs_}:
            g = np.full(parents.size, -1, dtype=np.int64)
            for i, t in enumerate(parsed[qid]):
                g[pc.equal(flat, t).to_numpy(zero_copy_only=False)] = i
            qlab[qid] = g
        rows = []
        for r in range(batch.num_rows):
            did = int(ids[r])
            n = int(offs[r + 1] - offs[r])
            for qid in by_doc.get(did, ()):
                terms = parsed[qid]
                k = len(terms)
                lab = qlab[qid][offs[r]:offs[r + 1]]
                mpos = np.flatnonzero(lab >= 0)
                if mpos.size == 0:
                    start, best_cnt, best_l, best_r = 0, 0, 0, -1
                else:
                    mlab = lab[mpos]
                    cnt = np.zeros(k, dtype=np.int64)
                    best_cnt, best_l, best_r = 0, 0, 0
                    left = 0
                    for right in range(mpos.size):
                        cnt[mlab[right]] += 1
                        while mpos[right] - mpos[left] >= width:
                            cnt[mlab[left]] -= 1
                            left += 1
                        distinct = int(np.count_nonzero(cnt))
                        if distinct > best_cnt:
                            best_cnt = distinct
                            best_l, best_r = int(mpos[left]), int(mpos[right])
                    slack = width - (best_r - best_l + 1)
                    start = max(0, min(best_l - slack // 2, n - width))
                rows.append(
                    (
                        qid,
                        did,
                        " ".join(flat_np[offs[r] + start:offs[r] + start + width]),
                        best_cnt,
                        start,
                    )
                )
        if not rows:
            return out_schema.empty_table()
        out = pd.DataFrame(
            rows,
            columns=["query_id", "doc_id", "snippet", "n_matched", "tok_start"],
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    df = (
        corpus.select_columns([id_col, text_col])
        .map_batches(extract, batch_format="pyarrow")
        .to_pandas()
    )
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


def _min_cover_span(pos: np.ndarray, lab: np.ndarray, k: int) -> int:
    """Smallest token span [pos[l]..pos[r]] containing all k labels
    (classic sliding-window distinct-count); ``pos`` ascending. Returns
    a huge sentinel when some label is absent. O(matched positions) —
    the loop runs over a candidate doc's QUERY-TERM occurrences only,
    not its tokens (same candidate-bounded argument as the phrase
    verify pass)."""
    best = 1 << 60
    need = k
    cnt = np.zeros(k, dtype=np.int64)
    left = 0
    for right in range(pos.size):
        if cnt[lab[right]] == 0:
            need -= 1
        cnt[lab[right]] += 1
        while need == 0:
            span = int(pos[right] - pos[left]) + 1
            if span < best:
                best = span
            cnt[lab[left]] -= 1
            if cnt[lab[left]] == 0:
                need += 1
            left += 1
    return best


def proximity_search(
    queries: list[tuple[int, str]],
    index_dir: str,
    corpus: rd.Dataset,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> pd.DataFrame:
    """Windowed co-occurrence search: (query_id, doc_id, span) rows for
    every doc whose token stream contains ALL query terms within some
    window of ``span <= window`` tokens (unordered; ``span`` is the
    minimal cover span, so ``window = len(terms)`` degenerates to
    unordered-phrase adjacency). Same two-stage composition as
    ``phrase_search``: conjunctive index prune, then a vectorized
    corpus verify over candidate rows only — the positional-query
    capability engines get from positional postings, built on a
    position-free index."""
    analyzer = _index_analyzer(index_dir)
    parsed = []
    for qid, text in queries:
        terms = sorted(set(tokenize_py(text, analyzer)))
        if terms:
            parsed.append((qid, terms))
    empty_df = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "span": pd.Series(dtype="int64"),
        }
    )
    if not parsed:
        return empty_df

    cand = _conj_candidates(
        [(qid, " ".join(terms)) for qid, terms in parsed], index_dir,
        concurrency=concurrency,
    )
    cand_ids = pc.unique(cand["doc_id"])
    if len(cand_ids) == 0:
        return empty_df
    ids_ref = ray.put(cand_ids)

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "span": pa.array([], type=pa.int64()),
            }
        )
        keep = pc.is_in(batch[id_col], value_set=ray.get(ids_ref))
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return empty
        flat, parents = _flat_tokens(batch[text_col], analyzer)
        n_rows = batch.num_rows
        # token position WITHIN its doc (prefix-count per parent row)
        counts = np.bincount(parents, minlength=n_rows).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(counts)))
        within = np.arange(parents.size, dtype=np.int64) - offs[parents]
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q, out_d, out_s = [], [], []
        for qid, terms in parsed:
            k = len(terms)
            # one vectorized label pass per term (a token matches at
            # most one term — terms are de-duplicated)
            lab = np.full(parents.size, -1, dtype=np.int64)
            for i, t in enumerate(terms):
                lab[pc.equal(flat, t).to_numpy(zero_copy_only=False)] = i
            sel = lab >= 0
            if not sel.any():
                continue
            sp, sl, sd = within[sel], lab[sel], parents[sel]
            # docs holding all k labels (cheap pre-cut before the loop)
            have = np.zeros((n_rows, k), dtype=bool)
            have[sd, sl] = True
            full = np.flatnonzero(have.sum(axis=1) == k)
            doc_start = np.concatenate(([0], np.cumsum(np.bincount(sd, minlength=n_rows))))
            for d in full:
                lo, hi = doc_start[d], doc_start[d + 1]
                span = _min_cover_span(sp[lo:hi], sl[lo:hi], k)
                if span <= window:
                    out_q.append(qid)
                    out_d.append(int(ids[d]))
                    out_s.append(span)
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "doc_id": pa.array(out_d, type=pa.int64()),
                "span": pa.array(out_s, type=pa.int64()),
            }
        )

    hits = corpus.select_columns([id_col, text_col]).map_batches(
        verify, batch_format="pyarrow"
    )
    df = hits.to_pandas()
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


# --------------------------------------------------------------------------
# index-native positional kernels (IndexConfig(positions=True))
# --------------------------------------------------------------------------
#
# When the index stores positional postings, phrase and proximity
# queries resolve ENTIRELY from the index — no corpus re-read. At
# 100 TB the corpus-verify composition above re-streams candidate
# rows' full text per query batch; the positional path touches only
# the query terms' posting lists (the payload pattern real engines —
# PISA, Lucene — use for positional queries).

_POS_SHIFT = np.int64(1) << np.int64(32)  # doc-slot key packing; assumes
# within-doc token positions < 2^32 (a single doc with 4G+ tokens is
# rejected far earlier by batch sizing)


def _candidate_positions(reader: IndexReader, uniq_terms: list[str], doc_mask):
    """Conjunctive candidate docmap positions + per-term positional
    decodes. Returns (cand, per_term) or (empty, None) when any term
    is OOV / the intersection dies. Smallest-list-first intersection —
    cost bounded by the rarest term, same as ``score_conj``."""
    from ..scorer import _fold_live

    per: dict[str, tuple] = {}
    for t in uniq_terms:
        pos, _tfs, poff, tokpos = reader.decode_term_positions(t)
        if pos.size == 0:
            return np.empty(0, dtype=np.int64), None
        per[t] = (pos, poff, tokpos)
    mask = _fold_live(reader, doc_mask)
    cand = None
    for t in sorted(uniq_terms, key=lambda x: per[x][0].size):
        p = per[t][0]
        if cand is None:
            cand = p
        else:
            idx = np.minimum(np.searchsorted(p, cand), p.size - 1)
            cand = cand[p[idx] == cand]
        if cand.size == 0:
            return np.empty(0, dtype=np.int64), None
    if mask is not None:
        cand = cand[mask[cand]]
        if cand.size == 0:
            return np.empty(0, dtype=np.int64), None
    return cand.astype(np.int64), per


def _gather_occurrences(per_term_entry, cand: np.ndarray):
    """All within-doc token positions of one term in the candidate
    docs -> (cand_slot, tokpos) flat arrays (vectorized variable-length
    gather; every candidate is in the term's posting list)."""
    from ..codec import _segment_gather_index

    pos, poff, tokpos = per_term_entry
    idx = np.searchsorted(pos, cand)
    lens = poff[idx + 1] - poff[idx]
    flat_idx = _segment_gather_index(poff[idx], lens)
    slots = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
    return slots, tokpos[flat_idx]


def _hit_ids(reader: IndexReader, m: np.ndarray) -> tuple[np.ndarray, "pa.DataType"]:
    """Matched docmap positions -> user-visible ids in the engine's id
    domain (HITS convention): original int64 ids in ``id_col`` mode,
    RAW uint64 hashed ids in keys mode — never wrapped through int64
    (half the keys-mode id space is >= 2^63)."""
    out = reader.out_ids(reader.doc_sorted[m])
    if reader.id_mode == "int":
        return out.astype(np.int64), pa.int64()
    return out.astype(np.uint64), pa.uint64()


def score_phrase(
    reader: IndexReader, text: str, doc_mask: np.ndarray | None = None
) -> np.ndarray:
    """Docmap positions (ascending) of every live doc whose token
    stream contains the query phrase contiguously — resolved purely
    from positional postings.

    Exact adjacency by sorted-set algebra: occurrence of token i at
    position p contributes key (doc_slot, p - i); a phrase match is a
    key present for EVERY i (successive ``np.intersect1d`` over unique
    key sets). Repeated phrase tokens work unchanged (same list,
    different shifts). Cost: the query terms' postings + positions
    only."""
    tokens = reader.tokenize(text)
    if not tokens:
        return np.empty(0, dtype=np.int64)
    cand, per = _candidate_positions(reader, sorted(set(tokens)), doc_mask)
    if cand.size == 0:
        return cand
    if len(tokens) == 1:
        return cand
    cur = None
    for i, t in enumerate(tokens):
        slots, p = _gather_occurrences(per[t], cand)
        ok = p >= i
        keys = slots[ok] * _POS_SHIFT + (p[ok] - np.int64(i))
        cur = keys if cur is None else np.intersect1d(cur, keys, assume_unique=True)
        if cur.size == 0:
            return np.empty(0, dtype=np.int64)
    return cand[np.unique(cur >> np.int64(32))]


def phrase_search_index(
    queries: list[tuple[int, str]],
    index_dir: str,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Index-native ``phrase_search``: same (query_id, doc_id) result
    rows, zero corpus access (requires an index built with
    ``IndexConfig(positions=True)``). doc_id is the index's
    user-visible id domain (original int64 ids in ``id_col`` mode —
    the mode parity tests use; raw UINT64 hashed ids in keys mode,
    never wrapped through int64).
    Distributed over the query axis: each task holds the broadcast
    reader and resolves its query slice."""
    from ..scorer import _broadcast_reader

    if not queries:
        return pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "doc_id": pd.Series(dtype="int64")}
        )
    reader_ref = _broadcast_reader(index_dir)

    @ray.remote(num_cpus=1)
    def part(qs: list[tuple[int, str]], ref) -> pa.Table:
        reader = ref if isinstance(ref, IndexReader) else ray.get(ref)
        id_type = pa.int64() if reader.id_mode == "int" else pa.uint64()
        qids, docs = [], []
        for qid, text in qs:
            m = score_phrase(reader, text)
            if m.size:
                qids.append(np.full(m.size, qid, dtype=np.int64))
                docs.append(_hit_ids(reader, m)[0])
        if not qids:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=id_type),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                "doc_id": pa.array(np.concatenate(docs), type=id_type),
            }
        )

    n = max(1, min(concurrency, len(queries)))
    chunks = [queries[i::n] for i in range(n)]
    parts = ray.get([part.remote(c, reader_ref) for c in chunks if c])
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


def score_proximity(
    reader: IndexReader,
    text: str,
    window: int,
    doc_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(docmap positions, minimal cover spans) of every live doc whose
    token stream contains ALL query terms within ``span <= window``
    tokens — ``proximity_search`` semantics (unordered min-cover,
    ``_min_cover_span``), resolved purely from positional postings."""
    terms = sorted(set(reader.tokenize(text)))
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    cand, per = _candidate_positions(reader, terms, doc_mask)
    if cand.size == 0:
        return cand, np.empty(0, dtype=np.int64)
    k = len(terms)
    slot_parts, pos_parts, lab_parts = [], [], []
    for i, t in enumerate(terms):
        slots, p = _gather_occurrences(per[t], cand)
        slot_parts.append(slots)
        pos_parts.append(p)
        lab_parts.append(np.full(slots.size, i, dtype=np.int64))
    slots = np.concatenate(slot_parts)
    poss = np.concatenate(pos_parts)
    labs = np.concatenate(lab_parts)
    order = np.lexsort((poss, slots))
    slots, poss, labs = slots[order], poss[order], labs[order]
    # vectorized min-cover across ALL candidate docs at once (replaces
    # a per-doc Python sweep): the minimal covering window ENDING at
    # occurrence j uses, per label, that label's latest occurrence <= j
    # in the same doc; span_j = pos[j] - min_label(latest_pos) + 1, and
    # the doc's min-cover is the min span_j over its occurrences —
    # identical to the _min_cover_span two-pointer result.
    n = slots.size
    j = np.arange(n, dtype=np.int64)
    min_prev = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    valid = np.ones(n, dtype=bool)
    for lab in range(k):
        iL = np.flatnonzero(labs == lab)
        idx = np.searchsorted(iL, j, side="right") - 1
        ok = idx >= 0
        src = iL[np.maximum(idx, 0)]
        ok &= slots[src] == slots
        valid &= ok
        lp = np.where(ok, poss[src], np.iinfo(np.int64).max)
        np.minimum(min_prev, lp, out=min_prev)
    span = np.where(valid, poss - min_prev + 1, np.iinfo(np.int64).max)
    counts = np.bincount(slots, minlength=cand.size)
    starts = np.concatenate(([0], np.cumsum(counts)))
    best = np.full(cand.size, np.iinfo(np.int64).max, dtype=np.int64)
    nonempty = counts > 0  # every candidate has >=k occurrences, but be safe
    if n:
        red = np.minimum.reduceat(span, starts[:-1][nonempty])
        best[nonempty] = red
    hit = best <= window
    return cand[hit].astype(np.int64), best[hit]


def proximity_search_index(
    queries: list[tuple[int, str]],
    index_dir: str,
    window: int,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Index-native ``proximity_search``: same (query_id, doc_id, span)
    rows, zero corpus access (positional index required)."""
    from ..scorer import _broadcast_reader

    empty_df = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "span": pd.Series(dtype="int64"),
        }
    )
    if not queries:
        return empty_df
    reader_ref = _broadcast_reader(index_dir)

    @ray.remote(num_cpus=1)
    def part(qs: list[tuple[int, str]], ref) -> pa.Table:
        reader = ref if isinstance(ref, IndexReader) else ray.get(ref)
        id_type = pa.int64() if reader.id_mode == "int" else pa.uint64()
        qids, docs, spans = [], [], []
        for qid, text in qs:
            m, sp = score_proximity(reader, text, window)
            if m.size:
                qids.append(np.full(m.size, qid, dtype=np.int64))
                docs.append(_hit_ids(reader, m)[0])
                spans.append(sp)
        if not qids:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=id_type),
                    "span": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                "doc_id": pa.array(np.concatenate(docs), type=id_type),
                "span": pa.array(np.concatenate(spans)),
            }
        )

    n = max(1, min(concurrency, len(queries)))
    chunks = [queries[i::n] for i in range(n)]
    parts = ray.get([part.remote(c, reader_ref) for c in chunks if c])
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


def _bucket_shards(index_dir: str, n_shards: int) -> list[set[int]]:
    bucket_bits = IndexReader._manifest_bucket_bits(index_dir)
    if bucket_bits is None:
        # guessing here would silently DROP every bucket above the
        # guess (each shard reader's isin-filter just selects nothing)
        raise ValueError(
            f"{index_dir}/manifest.json has no config.bucket_bits — "
            "cannot shard by docID range (partial or corrupted index "
            "dir?); use the unsharded phrase_search_index instead"
        )
    n_buckets = 1 << bucket_bits
    n_shards = max(1, min(n_shards, n_buckets))
    return [
        {b for b in range(n_buckets) if b % n_shards == s}
        for s in range(n_shards)
    ]


def phrase_search_sharded(
    queries: list[tuple[int, str]],
    index_dir: str,
    n_shards: int = 2,
) -> pd.DataFrame:
    """Doc-sharded index-native phrase search — the multi-node shape:
    each task loads ONLY its docID-range buckets (positions included;
    per-shard memory ∝ 1/S, same contract as ``query_index_sharded``)
    and answers every query over its shard. Phrase matching is
    per-doc-local, so the union of per-shard matches is EXACT — no
    cross-shard merge logic at all, unlike top-k. Results identical to
    ``phrase_search_index`` (pytest-pinned)."""
    empty = pd.DataFrame(
        {"query_id": pd.Series(dtype="int64"), "doc_id": pd.Series(dtype="int64")}
    )
    if not queries:
        return empty

    @ray.remote(num_cpus=1)
    def shard_task(buckets: set[int]) -> pa.Table:
        reader = IndexReader(index_dir, buckets=buckets)
        id_type = pa.int64() if reader.id_mode == "int" else pa.uint64()
        qids, docs = [], []
        for qid, text in queries:
            m = score_phrase(reader, text)
            if m.size:
                qids.append(np.full(m.size, qid, dtype=np.int64))
                docs.append(_hit_ids(reader, m)[0])
        if not qids:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=id_type),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                "doc_id": pa.array(np.concatenate(docs), type=id_type),
            }
        )

    parts = ray.get(
        [shard_task.remote(s) for s in _bucket_shards(index_dir, n_shards)]
    )
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


def proximity_search_sharded(
    queries: list[tuple[int, str]],
    index_dir: str,
    window: int,
    n_shards: int = 2,
) -> pd.DataFrame:
    """Doc-sharded ``proximity_search_index`` (min-cover spans are
    per-doc-local, so the shard union is exact)."""
    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
            "span": pd.Series(dtype="int64"),
        }
    )
    if not queries:
        return empty

    @ray.remote(num_cpus=1)
    def shard_task(buckets: set[int]) -> pa.Table:
        reader = IndexReader(index_dir, buckets=buckets)
        id_type = pa.int64() if reader.id_mode == "int" else pa.uint64()
        qids, docs, spans = [], [], []
        for qid, text in queries:
            m, sp = score_proximity(reader, text, window)
            if m.size:
                qids.append(np.full(m.size, qid, dtype=np.int64))
                docs.append(_hit_ids(reader, m)[0])
                spans.append(sp)
        if not qids:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=id_type),
                    "span": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids)),
                "doc_id": pa.array(np.concatenate(docs), type=id_type),
                "span": pa.array(np.concatenate(spans)),
            }
        )

    parts = ray.get(
        [shard_task.remote(s) for s in _bucket_shards(index_dir, n_shards)]
    )
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )


# ---------------------------------------------------------------------------
# Index-accelerated regex search (the Google-Code-Search shape)


def required_literals(pattern: str) -> list[str]:
    """Conservative required-literal extraction from a regex: ASCII
    strings that MUST appear verbatim in any match, read off the
    stdlib parse tree (the necessary-substring analysis behind
    Google Code Search's trigram pruning — public idea; simplified to
    the index's term granularity here).

    Walks concatenations; recurses into groups and into repeats with
    min >= 1; BREAKS the current run (collecting nothing) at
    alternations, optional parts, character classes and non-ASCII —
    anything not literally required. The result is a safe NECESSARY
    condition, never a sufficient one."""
    try:
        import re._parser as sre  # Python 3.11+
    except ImportError:  # pragma: no cover - older stdlib layout
        import sre_parse as sre

    out: list[str] = []

    def walk(items) -> None:
        run: list[str] = []

        def flush() -> None:
            if run:
                out.append("".join(run))
                run.clear()

        for op, arg in items:
            name = str(op)
            if name == "LITERAL" and isinstance(arg, int) and 32 <= arg < 127:
                run.append(chr(arg))
                continue
            flush()
            if name == "SUBPATTERN":
                walk(arg[3])
            elif name in ("MAX_REPEAT", "MIN_REPEAT"):
                lo, _, sub = arg
                if lo >= 1:
                    walk(sub)
            # BRANCH / IN / ANY / CATEGORY / anchors: no requirement
        flush()

    import re as _re

    try:
        parsed = sre.parse(pattern)
    except _re.error:
        # RE2-valid syntax the stdlib parser rejects (e.g. \p{L}):
        # no required literals -> caller falls back to the unpruned
        # full-scan path instead of crashing; the Arrow RE2 engine
        # still judges the pattern itself at match time.
        return []
    walk(parsed)
    return [s for s in out if s]


def required_index_terms(
    pattern: str, analyzer: str = "simple"
) -> list[str]:
    """Index terms every matching document must contain: for each
    required literal run, tokenize it with the INDEX's analyzer and
    keep only the INTERIOR tokens — the run's first and last token may
    be partial words in an actual match (the match can extend the run
    mid-token), but interior tokens are flanked by non-token
    characters inside the literal itself, so they appear as full
    tokens in any matching document. The same analyzer on both sides
    keeps this sound under code-splitting and stemming.

    Case-insensitive patterns ((?i) globally or scoped) disable
    pruning under the case-SPLITTING analyzers (code / code_porter):
    their token boundaries depend on the literal's case, so a
    different-case match could tokenize differently than the literal
    — e.g. (?i)FooBar requires tokens {foo, bar} but the matching doc
    'foobar' holds one token. The case-FOLDING analyzers lowercase
    before splitting, so case variants tokenize identically and
    pruning stays sound."""
    import re as _re

    if analyzer in ("code", "code_porter"):
        try:
            ci = bool(_re.compile(pattern).flags & _re.IGNORECASE)
        except _re.error:
            ci = True  # unparseable here: let the RE2 verify complain
        if ci or "(?i" in pattern:
            return []
    terms: set[str] = set()
    for lit in required_literals(pattern):
        toks = tokenize_py(lit, analyzer)
        if len(toks) > 2:
            terms.update(toks[1:-1])
    return sorted(terms)


def regex_search(
    queries: list[tuple[int, str]],
    index_dir: str,
    corpus: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int = 4,
) -> pd.DataFrame:
    """Distributed grep over the corpus, index-pruned where the
    pattern allows -> (query_id, doc_id) rows, deterministic order.

    Per query: ``required_index_terms`` extracts terms every match
    must contain; queries that yield any run ONLY over the candidate
    docs (one conjunctive postings intersection through the broadcast
    reader — the union of the pruned queries' candidate sets is used,
    which is exact: a doc matching query q necessarily sits in q's own
    candidate set, so verification over a superset changes nothing).
    Literal-free patterns (pure wildcards/alternations) scan the full
    corpus — exactly like a trigram-indexed grep — WITHOUT degrading
    the pruned queries in the same batch, which keep their filtered
    scan. Verification is the ground truth: one vectorized RE2 pass
    (``pc.match_substring_regex``) per query, streamed through
    ``map_batches``. Tombstoned documents are excluded on EVERY path
    (the index's deletes hold even for full-scan patterns). Patterns
    must be RE2-compatible (pyarrow's regex engine; no
    backreferences)."""
    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "doc_id": pd.Series(dtype="int64"),
        }
    )
    if not queries:
        return empty
    analyzer = _index_analyzer(index_dir)
    req = {qid: required_index_terms(p, analyzer) for qid, p in queries}
    pruned = [(qid, p) for qid, p in queries if req[qid]]
    unpruned = [(qid, p) for qid, p in queries if not req[qid]]

    # candidate/tombstone id arrays are built in the CORPUS id column's
    # Arrow dtype so the `is_in` filters below never compare across a
    # signed/unsigned cast (keys-mode engine ids ride uint64 and may
    # exceed 2^63; int-mode user ids may be negative)
    schema = corpus.schema()
    id_type = dict(zip(schema.names, schema.types))[id_col]

    # deletes hold on every path: map engine tombstones to corpus ids
    excl_ref = None
    from ..delete import load_tombstones

    tombs = load_tombstones(index_dir)
    if tombs.size:
        import json as _json
        import os as _os

        with open(_os.path.join(index_dir, "stats.json")) as f:
            id_mode = _json.load(f).get("id_mode", "keys")
        if id_mode == "int":
            from ..docids import unsplitmix64

            excl = pa.array(unsplitmix64(tombs).astype(np.int64))
        else:
            excl = pa.array(np.asarray(tombs, dtype=np.uint64))
        excl_ref = ray.put(excl.cast(id_type))

    ids_ref = None
    if pruned:
        from ..scorer import _broadcast_reader

        reader_ref = _broadcast_reader(index_dir)

        @ray.remote(num_cpus=1)
        def cand(qs, ref) -> pa.Table:
            reader = ref if isinstance(ref, IndexReader) else ray.get(ref)
            docs = []
            for qid, _p in qs:
                hits = score_conj(
                    reader, "", k=reader.n_docs, terms=req[qid]
                )
                docs.extend(d for d, _ in hits)
            # user-visible ids (int-mode: signed, possibly negative;
            # keys-mode: uint64, possibly >= 2^63) built directly in
            # the corpus id dtype — no view()-based reinterpretation
            return pa.table({"doc_id": pa.array(docs, type=id_type)})

        n = max(1, min(concurrency, len(pruned)))
        chunks = [pruned[i::n] for i in range(n)]
        parts = ray.get([cand.remote(c, reader_ref) for c in chunks if c])
        cand_ids = pc.unique(pa.concat_tables(parts)["doc_id"])
        if len(cand_ids):
            ids_ref = ray.put(cand_ids)
        else:
            pruned = []  # no candidates: those queries match nothing
        if not pruned and not unpruned:
            return empty

    def verify(batch: pa.Table) -> pa.Table:
        if excl_ref is not None:
            batch = batch.filter(
                pc.invert(
                    pc.is_in(batch[id_col], value_set=ray.get(excl_ref))
                )
            )
        e = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return e
        out_q, out_d = [], []

        def run(qs, sub: pa.Table) -> None:
            if sub.num_rows == 0:
                return
            ids = sub[id_col].to_numpy(zero_copy_only=False)
            for qid, pattern in qs:
                hit = pc.match_substring_regex(
                    sub[text_col], pattern
                ).to_numpy(zero_copy_only=False)
                if hit.any():
                    out_q.append(np.full(int(hit.sum()), qid, dtype=np.int64))
                    out_d.append(ids[hit])

        if pruned and ids_ref is not None:
            run(
                pruned,
                batch.filter(
                    pc.is_in(batch[id_col], value_set=ray.get(ids_ref))
                ),
            )
        if unpruned:
            run(unpruned, batch)
        if not out_q:
            return e
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d).astype(np.int64)),
            }
        )

    df = (
        corpus.select_columns([id_col, text_col])
        .map_batches(verify, batch_format="pyarrow")
        .to_pandas()
    )
    if df.empty:
        return empty
    return df.sort_values(["query_id", "doc_id"], kind="mergesort").reset_index(
        drop=True
    )
