"""Multi-field weighted search: rank documents by a weighted sum of
per-field BM25 scores (content + path + ... ), each field served by
its own index over the SAME corpus.

This is the composition form of fielded ranking (Lucene's
per-field-query boolean-should shape): every field is a complete
pisa_ray index built over the same documents with the same identity
(same ``id_col``, or same ``key_cols`` — keys-derived docIDs are a
pure function of the key columns, so indexes over different CONTENT
columns of one corpus share the id domain by construction).

  score(d) = Σ_f  w_f · BM25_f(q, d)

with union semantics (a doc scoring in any field is a candidate; a
field without the doc contributes 0) and the engine's standard
(score desc, id asc) tie-break. Exact float64 — per field the full
query-term posting union is scored (the same work TAAT does), then the
sparse per-field score maps merge by doc id.

Both fielded forms live here: the weighted-sum composition above
(``score_multifield``/``multifield_search``) and TRUE BM25F
(``score_bm25f``/``bm25f_search``), which blends per-field
length-normalized tf BEFORE the k1 saturation with idf over the exact
per-term union df — computable at query time because every per-field
index carries its own lengths and avgdl (an earlier note here claimed
this needed a different posting format; it does not). Scale shape for
both: one broadcast reader per field, queries fan out over raw tasks,
each task scores its query slice against every field reader — no
shuffles, no corpus access.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..scorer import IndexReader


def _id_mode_of(index_dir: str) -> str:
    """id_mode from stats.json — the cheap metadata read; ray.get-ing
    the broadcast reader just for this would deserialize the full
    vocab-sized df/cf dicts onto the driver per field, per call."""
    import json
    import os

    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f).get("id_mode", "keys")


def _field_sparse_scores(
    reader: IndexReader, text: str
) -> tuple[np.ndarray, np.ndarray]:
    """(user-visible ids, exact f64 BM25 scores) over the query-term
    posting union of ONE field — the sparse score vector TAAT's top-k
    cut would otherwise throw away. Sorted-term accumulation, live
    mask folded, so per-doc values equal ``score_taat``'s exactly."""
    from ..scorer import _fold_live

    mask = _fold_live(reader, None)
    live = []
    for t in sorted(set(reader.tokenize(text))):
        _, contrib, pos = reader.term_contributions(t)
        if pos.size:
            live.append((pos, contrib))
    if not live:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
    nz = np.unique(np.concatenate([p for p, _ in live]))
    if mask is not None:
        nz = nz[mask[nz]]
        if nz.size == 0:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
    exact = np.zeros(nz.size, dtype=np.float64)
    for pos, contrib in live:
        idx = np.searchsorted(pos, nz)
        idx_c = np.minimum(idx, pos.size - 1)
        hit = pos[idx_c] == nz
        exact[hit] += contrib[idx_c[hit]]
    return reader.out_ids(reader.doc_sorted[nz]), exact


def score_multifield(
    readers: list[tuple[IndexReader, float]],
    text: str,
    k: int = 10,
) -> list[tuple[int, float]]:
    """Weighted-sum fielded BM25 for one query. ``readers`` =
    [(field reader, weight), ...]; weights may differ per call.
    Fully vectorized: per-field sparse (id, score) arrays merge by id
    via one unique + weighted bincount — no per-doc Python objects."""
    id_dtype = (
        np.int64 if readers and readers[0][0].id_mode == "int" else np.uint64
    )
    id_parts, sc_parts = [], []
    for reader, w in readers:
        if w == 0.0:
            continue
        ids, scores = _field_sparse_scores(reader, text)
        if ids.size:
            id_parts.append(ids.astype(id_dtype))
            sc_parts.append(w * scores)
    if not id_parts:
        return []
    all_ids = np.concatenate(id_parts)
    all_sc = np.concatenate(sc_parts)
    ids, inv = np.unique(all_ids, return_inverse=True)
    scores = np.bincount(inv, weights=all_sc, minlength=ids.size)
    order = np.lexsort((ids, -scores))[: min(k, ids.size)]
    return [(int(ids[i]), float(scores[i])) for i in order]


def multifield_search(
    queries: list[tuple[int, str]],
    fields: list[tuple[str, float]],
    k: int = 10,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Batch fielded search -> (query_id, rank, doc_id, score) rows.

    ``fields`` = [(index_dir, weight), ...]. All field indexes must
    share the id domain (same ``id_mode``; build them over the same
    corpus with the same id/key configuration)."""
    from ..scorer import _broadcast_reader

    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int32"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )
    if not queries or not fields:
        return empty
    refs = [(_broadcast_reader(d), float(w)) for d, w in fields]
    # id-domain rail: mixing an id_col index with a keys index would
    # silently merge disjoint id spaces into nonsense rankings
    modes = {_id_mode_of(d) for d, _ in fields}
    if len(modes) > 1:
        raise ValueError(
            f"field indexes disagree on id_mode ({sorted(modes)}) — build "
            "every field over the same corpus with the same id/key config"
        )
    id_mode = next(iter(modes))

    @ray.remote(num_cpus=1)
    def part(qs, rrefs) -> pa.Table:
        readers = [
            (r if isinstance(r, IndexReader) else ray.get(r), w) for r, w in rrefs
        ]
        rows_q, rows_r, rows_d, rows_s = [], [], [], []
        for qid, text in qs:
            for rk, (d, s) in enumerate(
                score_multifield(readers, text, k=k), start=1
            ):
                rows_q.append(qid)
                rows_r.append(rk)
                rows_d.append(d)
                rows_s.append(s)
        id_type = pa.int64() if id_mode == "int" else pa.uint64()
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "rank": pa.array(rows_r, type=pa.int32()),
                "doc_id": pa.array(rows_d, type=id_type),
                "score": pa.array(rows_s, type=pa.float64()),
            }
        )

    n = max(1, min(concurrency, len(queries)))
    chunks = [queries[i::n] for i in range(n)]
    parts = ray.get([part.remote(c, refs) for c in chunks if c])
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )


def score_bm25f(
    readers: list[tuple[IndexReader, float, float]],
    text: str,
    k: int = 10,
    k1: float = 0.9,
) -> list[tuple[int, float]]:
    """TRUE BM25F (Robertson & Zaragoza's field-blended form, public
    literature) for one query — per-field tf is length-normalized and
    weight-blended ACROSS fields BEFORE the k1 saturation, with idf
    over the union document frequency:

        tf~_f(t,d) = tf_f(t,d) / (1 - b_f + b_f * len_f(d)/avglen_f)
        tf~(t,d)   = sum_f  w_f * tf~_f(t,d)
        score(d)   = sum_t  idf_union(t) * tf~(t,d) / (k1 + tf~(t,d))

    ``readers`` = [(field reader, w_f, b_f), ...]. The round-3 note
    claiming this "needs per-field lengths in one posting payload" was
    wrong: every per-field index already carries its own lengths and
    avgdl, so the blend is EXACTLY computable at query time from the
    same per-field indexes ``score_multifield`` composes — df_union is
    the size of the per-term doc-id union (exact, from the postings),
    not an approximation. Per-field tombstone masks fold in; scores
    accumulate per doc in sorted-term order (the engine-wide
    determinism rule); tie-break (score desc, id asc)."""
    from ..codec import bm25_idf
    from ..scorer import _fold_live

    if not readers:
        return []
    primary = readers[0][0]
    analyzers = {r.analyzer for r, _, _ in readers}
    if len(analyzers) > 1:
        raise ValueError(
            f"field indexes disagree on analyzer ({sorted(analyzers)}) — a "
            "query tokenized differently per field silently misses"
        )
    n_docs = {r.n_docs for r, _, _ in readers}
    if len(n_docs) > 1:
        raise ValueError(
            f"field indexes disagree on n_docs ({sorted(n_docs)}) — build "
            "every field over the SAME corpus"
        )
    N = primary.n_docs
    id_dtype = np.int64 if primary.id_mode == "int" else np.uint64
    terms = sorted(set(primary.tokenize(text)))
    t_ids, t_sc = [], []
    for t in terms:
        id_parts, tf_parts = [], []
        for reader, w, b in readers:
            # w == 0 fields still COUNT toward the union df (BM25F's
            # document frequency is over the whole fielded document,
            # not just the weighted fields) — their tf contribution is
            # simply zero
            docs, tfs = reader.decode_term(t)
            if docs.size == 0:
                continue
            pos = reader._positions_of(docs)
            mask = _fold_live(reader, None)
            if mask is not None:
                keep = mask[pos]
                pos, tfs = pos[keep], tfs[keep]
                if pos.size == 0:
                    continue
            dl = reader.len_sorted[pos].astype(np.float64)
            denom = (1.0 - b) + b * (dl / reader.avgdl)
            id_parts.append(
                reader.out_ids(reader.doc_sorted[pos]).astype(id_dtype)
            )
            tf_parts.append(w * (tfs.astype(np.float64) / denom))
        if not id_parts:
            continue
        uids, inv = np.unique(np.concatenate(id_parts), return_inverse=True)
        # bincount sums weights in element order = FIELD order — the
        # documented blend order (oracle replicates it)
        blend = np.bincount(inv, weights=np.concatenate(tf_parts),
                            minlength=uids.size)
        idf = bm25_idf(uids.size, N)  # df_union = |union of field postings|
        t_ids.append(uids)
        t_sc.append(idf * blend / (k1 + blend))
    if not t_ids:
        return []
    all_ids = np.concatenate(t_ids)
    all_sc = np.concatenate(t_sc)
    ids, inv = np.unique(all_ids, return_inverse=True)
    scores = np.zeros(ids.size, dtype=np.float64)
    np.add.at(scores, inv, all_sc)  # row order = sorted-term-major
    order = np.lexsort((ids, -scores))[: min(k, ids.size)]
    return [(int(ids[i]), float(scores[i])) for i in order]


def bm25f_search(
    queries: list[tuple[int, str]],
    fields: list[tuple[str, float, float]],
    k: int = 10,
    k1: float = 0.9,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Batch TRUE-BM25F search -> (query_id, rank, doc_id, score).

    ``fields`` = [(index_dir, w_f, b_f), ...]; all field indexes must
    share the corpus identity (same id/key config — see
    ``multifield_search``). Same fan-out shape: one broadcast reader
    per field, queries sliced over raw tasks, no shuffles."""
    from ..scorer import _broadcast_reader

    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int32"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )
    if not queries or not fields:
        return empty
    refs = [(_broadcast_reader(d), float(w), float(b)) for d, w, b in fields]
    modes = {_id_mode_of(d) for d, _, _ in fields}
    if len(modes) > 1:
        raise ValueError(
            f"field indexes disagree on id_mode ({sorted(modes)}) — build "
            "every field over the same corpus with the same id/key config"
        )
    id_mode = next(iter(modes))

    @ray.remote(num_cpus=1)
    def part(qs, rrefs) -> pa.Table:
        readers = [
            (r if isinstance(r, IndexReader) else ray.get(r), w, b)
            for r, w, b in rrefs
        ]
        rows_q, rows_r, rows_d, rows_s = [], [], [], []
        for qid, text in qs:
            for rk, (d, s) in enumerate(
                score_bm25f(readers, text, k=k, k1=k1), start=1
            ):
                rows_q.append(qid)
                rows_r.append(rk)
                rows_d.append(d)
                rows_s.append(s)
        id_type = pa.int64() if id_mode == "int" else pa.uint64()
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "rank": pa.array(rows_r, type=pa.int32()),
                "doc_id": pa.array(rows_d, type=id_type),
                "score": pa.array(rows_s, type=pa.float64()),
            }
        )

    n = max(1, min(concurrency, len(queries)))
    chunks = [queries[i::n] for i in range(n)]
    parts = ray.get([part.remote(c, refs) for c in chunks if c])
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )
