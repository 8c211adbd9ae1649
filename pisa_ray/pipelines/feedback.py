"""RM3 pseudo-relevance feedback: query expansion from the top-ranked
documents of an initial retrieval pass (Lavrenko & Croft relevance
models, interpolated with the original query — the "RM3" variant every
mainstream engine ships; implemented from the published formulation,
no code consulted).

Pipeline per query (all index-resident; one narrow forward-store read):

1. initial BM25 pass -> top ``fb_docs`` (doc, score) (``score_taat``).
2. relevance model over the feedback set:
   ``P(w|R) ∝ Σ_d  (score_d / Σ score)  ·  tf(w,d) / |d|``
   — document weights are the normalized positive BM25 scores, term
   likelihoods are MLE from the doc's term vector. Term vectors come
   from the index's OWN tokenized store (the forward index the build
   already persists), pruned to the feedback docs' docID-range buckets
   and row-groups — at 10^12 docs this reads fb_docs point rows, never
   the corpus.
3. keep the ``fb_terms`` highest-mass terms (tie: term asc),
   renormalize to unit mass.
4. interpolate: ``w(t) = ow · qtf(t)/|q| + (1-ow) · P(t|R)``
   (``ow`` = ``orig_weight``; ow=1 degenerates to the original query,
   pinned rank-identical to TAAT in tests).
5. weighted exact-float64 re-score over the expanded term union,
   sorted-term accumulation, (score desc, id asc) tie-break — the same
   determinism contract as every other kernel in scorer.py.

Scale shape: stage 1 is the ordinary TAAT/actor path; stage 2's
forward lookups are bucket-pruned parquet reads of ~``fb_docs`` rows;
stage 5 costs one extra TAAT-shaped pass over ≤ fb_terms posting
lists. Queries fan out over raw tasks with the broadcast reader, like
every other query-axis operator here.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..docids import bucket_of, splitmix64
from ..scorer import IndexReader, _fold_live, score_taat


def _engine_ids(reader: IndexReader, out_ids: list[int]) -> np.ndarray:
    """User-visible hit ids -> engine uint64 doc_ids (tokenized-store
    key). Inverse of ``IndexReader.out_ids``."""
    if reader.id_mode == "int":
        # same int64 -> uint64 wrap as docids.doc_ids_from_int
        return splitmix64(np.asarray(out_ids, dtype=np.int64).astype(np.uint64))
    return np.asarray(out_ids, dtype=np.uint64)


def doc_term_vectors(
    index_dir: str, engine_ids: np.ndarray, bucket_bits: int | None = None
) -> dict[int, tuple[list, np.ndarray, int]]:
    """Forward-store point lookup: engine doc_id -> (terms, tfs, dl)
    from the index's tokenized/ checkpoint. File-level pruning via the
    hive ``bucket=N`` layout when present (per_bucket_merge builds),
    then a row-group-prunable ``isin`` filter."""
    if bucket_bits is None:
        bucket_bits = IndexReader._manifest_bucket_bits(index_dir)
    # base forward store + every appended generation's (build_incremental
    # keeps a generation's tokenized/ under generations/<g>/ — feedback
    # docs can come from any generation)
    files = sorted(
        glob.glob(
            os.path.join(index_dir, "tokenized", "**", "*.parquet"), recursive=True
        )
    ) + sorted(
        glob.glob(
            os.path.join(index_dir, "generations", "*", "tokenized", "**", "*.parquet"),
            recursive=True,
        )
    )
    if bucket_bits is not None:
        want = {int(b) for b in bucket_of(engine_ids, bucket_bits)}
        # exact path-segment match: "bucket=1" must not also keep
        # bucket=12/bucket=19 (over-reading, not incorrect — but at
        # scale it degrades the point read toward a scan)
        seps = {f"{os.sep}bucket={b}{os.sep}" for b in want}
        pruned = [
            f
            for f in files
            if any(sp in f for sp in seps) or "bucket=" not in f
        ]
        if pruned:
            files = pruned
    want_ids = pa.array(engine_ids.astype(np.uint64), type=pa.uint64())
    out: dict[int, tuple[list, np.ndarray, int]] = {}
    flt = pc.field("doc_id").isin(want_ids)
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "length", "term", "tf"], filters=flt)
        for i in range(t.num_rows):
            d = int(t["doc_id"][i].as_py())
            out[d] = (
                t["term"][i].as_py(),
                np.asarray(t["tf"][i].as_py(), dtype=np.float64),
                int(t["length"][i].as_py()),
            )
        if len(out) == len(engine_ids):
            break
    return out


def _rm3_weights(
    reader: IndexReader,
    text: str,
    base: list[tuple[int, float]],
    vecs: dict[int, tuple[list, np.ndarray, int]],
    fb_terms: int,
    orig_weight: float,
) -> list[tuple[str, float]]:
    """The RM3 interpolation arithmetic, shared by the single-query and
    batched paths so they can never diverge. ``vecs`` must contain a
    term vector for every feedback doc's engine id."""
    qtokens = reader.tokenize(text)
    if not qtokens:
        return []
    qw = {
        t: qtokens.count(t) / len(qtokens) for t in set(qtokens) if reader.has_term(t)
    }
    if not base or orig_weight == 1.0:
        return sorted(qw.items())
    scores = np.asarray([s for _, s in base], dtype=np.float64)
    wd = scores / scores.sum()  # BM25 scores are positive
    eids = _engine_ids(reader, [d for d, _ in base])
    rm: dict[str, float] = {}
    for w, eid in zip(wd, eids):
        try:
            terms, tfs, dl = vecs[int(eid)]
        except KeyError:
            raise ValueError(
                f"feedback doc {int(eid):#x} has no forward-store row — "
                "the index's tokenized/ checkpoint is incomplete or was "
                "deleted; RM3 needs the tokenized forward store"
            ) from None
        if dl == 0:
            continue
        contrib = w * tfs / dl
        for t, c in zip(terms, contrib):
            rm[t] = rm.get(t, 0.0) + float(c)
    top = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    mass = sum(v for _, v in top)
    weights: dict[str, float] = {t: orig_weight * v for t, v in qw.items()}
    if mass > 0:
        for t, v in top:
            weights[t] = weights.get(t, 0.0) + (1.0 - orig_weight) * (v / mass)
    return sorted(weights.items())


def rm3_expand(
    reader: IndexReader,
    index_dir: str,
    text: str,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    doc_mask: np.ndarray | None = None,
) -> list[tuple[str, float]]:
    """-> sorted (term, weight) list for the interpolated RM3 query.
    Falls back to the plain query weights when the initial pass returns
    nothing (OOV queries)."""
    if not 0.0 <= orig_weight <= 1.0:
        raise ValueError(f"orig_weight must be in [0,1], got {orig_weight}")
    base = score_taat(reader, text, fb_docs, doc_mask=doc_mask)
    vecs = (
        doc_term_vectors(index_dir, _engine_ids(reader, [d for d, _ in base]))
        if base and orig_weight < 1.0
        else {}
    )
    return _rm3_weights(reader, text, base, vecs, fb_terms, orig_weight)


def score_weighted(
    reader: IndexReader,
    term_weights: list[tuple[str, float]],
    k: int = 10,
    doc_mask: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact float64 weighted BM25 over the term union: score(d) =
    Σ_t w_t · contrib_t(d). Sorted-term accumulation, (score desc,
    id asc) tie-break — deterministic at any parallelism."""
    doc_mask = _fold_live(reader, doc_mask)
    live = []
    for t, w in term_weights:  # already sorted by term
        if w == 0.0:
            continue
        _, contrib, pos = reader.term_contributions(t)
        if pos.size:
            live.append((pos, contrib * w))
    if not live:
        return []
    nz = np.unique(np.concatenate([p for p, _ in live]))
    if doc_mask is not None:
        nz = nz[doc_mask[nz]]
        if nz.size == 0:
            return []
    exact = np.zeros(nz.size, dtype=np.float64)
    for pos, contrib in live:
        idx = np.searchsorted(pos, nz)
        idx_c = np.minimum(idx, pos.size - 1)
        hit = pos[idx_c] == nz
        exact[hit] += contrib[idx_c[hit]]
    out = reader.out_ids(reader.doc_sorted[nz])
    order = np.lexsort((out, -exact))[: min(k, nz.size)]
    return [(int(out[i]), float(exact[i])) for i in order]


def score_rm3(
    reader: IndexReader,
    index_dir: str,
    text: str,
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    doc_mask: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Full RM3 retrieval for one query: expand then weighted re-score."""
    weights = rm3_expand(
        reader, index_dir, text,
        fb_docs=fb_docs, fb_terms=fb_terms,
        orig_weight=orig_weight, doc_mask=doc_mask,
    )
    return score_weighted(reader, weights, k=k, doc_mask=doc_mask)


def query_index_rm3(
    queries: list[tuple[int, str]],
    index_dir: str,
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Batch RM3 over the query axis -> (query_id, rank, doc_id, score)
    rows, deterministic order. Each task holds the broadcast reader;
    forward-store lookups stay inside the task."""
    from ..scorer import _broadcast_reader

    empty = pd.DataFrame(
        {
            "query_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int32"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )
    if not queries:
        return empty
    reader_ref = _broadcast_reader(index_dir)

    @ray.remote(num_cpus=1)
    def part(qs, ref) -> pa.Table:
        reader = ref if isinstance(ref, IndexReader) else ray.get(ref)
        # stage 1 for every query first, then ONE forward-store read
        # for the union of feedback docs — per-task batching of the
        # narrow lookup (at scale: one bucket-pruned read per task,
        # not per query; measured 1.6x QPS even at toy scale where the
        # store is a handful of small files)
        bases = {qid: score_taat(reader, text, fb_docs) for qid, text in qs}
        fb_union = sorted({d for hits in bases.values() for d, _ in hits})
        vecs = (
            doc_term_vectors(index_dir, _engine_ids(reader, fb_union))
            if fb_union and orig_weight < 1.0
            else {}
        )
        rows_q, rows_r, rows_d, rows_s = [], [], [], []
        for qid, text in qs:
            weights = _rm3_weights(
                reader, text, bases[qid], vecs, fb_terms, orig_weight
            )
            hits = score_weighted(reader, weights, k=k)
            for r, (d, s) in enumerate(hits, start=1):
                rows_q.append(qid)
                rows_r.append(r)
                rows_d.append(d)
                rows_s.append(s)
        # id domain follows the index (HITS schema convention): raw
        # uint64 engine ids in keys mode, original int64 in id_col mode
        id_type = pa.int64() if reader.id_mode == "int" else pa.uint64()
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
    parts = ray.get([part.remote(c, reader_ref) for c in chunks if c])
    df = pa.concat_tables(parts).to_pandas()
    return df.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )


def mlt_terms(
    reader: IndexReader,
    terms: list,
    tfs: np.ndarray,
    max_query_terms: int = 25,
    min_tf: int = 2,
    min_df: int = 2,
    max_df_frac: float = 1.0,
) -> list[str]:
    """Lucene MoreLikeThis term selection: score a document's terms by
    tf * idf (the index's BM25 idf), keep the ``max_query_terms`` best
    (ties by term asc), after the classic noise gates — min term
    frequency, min document frequency, optional stop-ish max-df cut."""
    max_df = max_df_frac * reader.n_docs
    scored = []
    for t, tf in zip(terms, tfs):
        df = int(reader.df.get(t, 0))
        if tf < min_tf or df < min_df or df > max_df:
            continue
        scored.append((-float(tf) * reader.idf(t), t))
    scored.sort()
    return [t for _, t in scored[:max_query_terms]]


def more_like_this(
    doc_ids: list[int],
    index_dir: str,
    k: int = 10,
    max_query_terms: int = 25,
    min_tf: int = 2,
    min_df: int = 2,
    max_df_frac: float = 1.0,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Similar-document retrieval (the Lucene MoreLikeThis shape):
    for each source document, build a query from its own
    most-representative terms (``mlt_terms``) and return the top-k
    OTHER documents by BM25 — "related items" without an embedding
    model, straight off the inverted index.

    Same batch shape as ``query_index_rm3``: source docs fan out over
    raw tasks against the broadcast reader; each task makes ONE
    bucket- and row-group-pruned forward-store read for its union of
    source docs, then scores with the exact TAAT kernel (the source
    doc itself is dropped from its result). Unknown ids raise KeyError
    (loud, like ``explain_score``). -> pandas
    (src_doc_id, rank, doc_id, score), deterministic order."""
    from ..scorer import _broadcast_reader, score_taat

    empty = pd.DataFrame(
        {
            "src_doc_id": pd.Series(dtype="int64"),
            "rank": pd.Series(dtype="int32"),
            "doc_id": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        }
    )
    if not doc_ids:
        return empty
    reader_ref = _broadcast_reader(index_dir)

    @ray.remote(num_cpus=1)
    def part(ids, ref) -> pa.Table:
        reader = ref if isinstance(ref, IndexReader) else ray.get(ref)
        eids = _engine_ids(reader, list(ids))
        if reader.n_local == 0:
            raise KeyError(f"doc_ids not in this index: {sorted(ids)}")
        missing = [
            d
            for d, e in zip(ids, eids)
            if reader.doc_sorted[
                min(
                    int(np.searchsorted(reader.doc_sorted, e)),
                    reader.n_local - 1,
                )
            ]
            != e
        ]
        if missing:
            raise KeyError(f"doc_ids not in this index: {missing}")
        vecs = doc_term_vectors(index_dir, eids)
        lost = [s for s, e in zip(ids, eids) if int(e) not in vecs]
        if lost:
            # in the docmap but absent from tokenized/: a corrupt or
            # partially-written forward store — loud, not silent
            raise KeyError(
                f"doc_ids {lost} have no forward-store row "
                "(tokenized/ missing or incomplete for this index)"
            )
        rows_q, rows_r, rows_d, rows_s = [], [], [], []
        for src, eid in zip(ids, eids):
            terms, tfs, _dl = vecs[int(eid)]
            qterms = mlt_terms(
                reader, terms, tfs, max_query_terms, min_tf, min_df,
                max_df_frac,
            )
            if not qterms:
                continue
            # sorted-term order: the same float64 accumulation sequence
            # as every other kernel (and the memo/tie-break contract)
            hits = score_taat(reader, "", k + 1, terms=sorted(qterms))
            r = 0
            for d, s in hits:
                if d == src:
                    continue
                r += 1
                if r > k:
                    break
                rows_q.append(src)
                rows_r.append(r)
                rows_d.append(d)
                rows_s.append(s)
        id_type = pa.int64() if reader.id_mode == "int" else pa.uint64()
        return pa.table(
            {
                "src_doc_id": pa.array(rows_q, type=id_type),
                "rank": pa.array(rows_r, type=pa.int32()),
                "doc_id": pa.array(rows_d, type=id_type),
                "score": pa.array(rows_s, type=pa.float64()),
            }
        )

    ids = list(doc_ids)
    n = max(1, min(concurrency, len(ids)))
    chunks = [ids[i::n] for i in range(n)]
    parts = ray.get([part.remote(c, reader_ref) for c in chunks if c])
    df = pa.concat_tables(parts).to_pandas()
    if df.empty:
        return empty
    return df.sort_values(["src_doc_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )
