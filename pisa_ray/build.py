"""Index build pipeline — Ray-Data-first, per-partition lineage, skew-proof.

Stages (each checkpointed in ``manifest.json``, each resumable):

1. **tokenize** — ``read_parquet`` (columns pruned) → ``map_batches``
   (zero-copy Arrow kernel: docIDs, sha256 invariant, per-doc (term,tf))
   → write ``tokenized/part_<g>/bucket=<b>/`` Parquet, hive-partitioned
   by the docID-range bucket. ``content`` is dropped here — wide rows
   never travel past this stage. Lineage partition = input-file group.
2. **docmap + stats** — column-pruned re-read of ``tokenized`` →
   ``docmap/`` (doc_id, keys, length, content_sha256) + global stats
   (N, avgdl) + docID collision check (groupby count).
3. **segments** — per bucket: explode (term,tf) lists into
   (grp, term, doc_id, tf, dl) triples, ``groupby(grp)`` where
   ``grp = crc32(term) % term_parts`` → vectorized multi-term
   block-max encode → ``segments/bucket_<b>/``. The bucket loop is the
   doc-range salt: a stop word's postings split across all buckets, so
   no single shuffle group ever exceeds ~1/2^bucket_bits of the
   corpus; within a bucket terms spread over ``term_parts`` groups.
   Because blocks are self-contained, a term's runs from different
   buckets stitch back together by concatenation at read time.
4. **lexicon** — ``groupby(term).sum(df)`` over the (small) segment
   rows → global document frequencies.

Reference lineage analog: the snapshot-block materialization + three
skip-if-exists resume levels of /root/reference/src/helpers/Reader.py:148-178,
/root/reference/src/main.py:79-88 and
/root/reference/src/helpers/Runner.py:115-137.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import zlib
from dataclasses import asdict, dataclass
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data as rd

from .checkpoint import Manifest, StageTimer
from .codec import encode_postings
from .docids import bucket_of, doc_ids_from_int, doc_ids_from_keys, splitmix64
from .tokenizer import doc_term_counts, sha256_column


@dataclass
class IndexConfig:
    """Knobs sized for a 32-CPU node; scale notes inline.

    At 10^12 docs: raise ``bucket_bits`` to ~12 (4096 doc-range
    shards, each an independent resumable merge), ``term_parts`` to
    ~256, and ``lineage_parts`` to the input file-group count.
    """

    bucket_bits: int = 3          # 2^3 = 8 docID-range buckets
    term_parts: int = 32          # term-hash groups per bucket merge
    tokenize_batch_size: int = 512  # content rows per batch (wide-row guard)
    lineage_parts: int = 4        # input file groups (tokenize resume units)
    key_cols: tuple[str, ...] = ("repo", "path", "commit")
    id_col: str | None = None     # pre-existing unique int64 key column
    content_col: str = "content"
    meta_cols: tuple[str, ...] = ("lang",)
    # exact docID-collision detection + DETERMINISTIC RESOLUTION: a
    # narrow (doc_id, sha256) groupby finds ids shared by distinct
    # contents; colliding docs (all but the sha-smallest per id) are
    # rehashed and the tokenized store rewritten, iterating until
    # clean. 64-bit sha-prefix ids WILL collide at 10^10+ docs
    # (~n²/2^65 pairs); resolution keeps the 64-bit codec/scorer
    # format while removing the silent-merge failure mode.
    check_collisions: bool = True
    # Simulation knob: keep only the top ``id_bits`` of each docID so
    # toy corpora exercise the collision-resolution path for real
    # (id_bits=64 in production; keys-derived ids only).
    id_bits: int = 64
    # True: one merge job per docID bucket (finest resume granularity —
    # the 100TB setting, where each bucket is hours of work). False: ONE
    # groupby over (term-hash, bucket) — identical output, one shuffle,
    # no per-bucket job overhead (right when buckets are seconds each).
    per_bucket_merge: bool = True
    # False skips the separate docmap/ write: the docmap columns already
    # live in tokenized/ (column-pruned reads serve the same data) —
    # one less full pass when the docmap isn't consumed separately.
    write_docmap: bool = True
    # "docid": postings store raw 64-bit hashed doc_ids as gaps (simple,
    # generation-appendable, ~9 B/posting: gaps ~2^64/df). "position":
    # postings store the doc's RANK in the sorted docmap (gaps ~N/df,
    # ~2-3 B/posting, and scorers skip a searchsorted). Positions are
    # monotone in doc_id so every ordering/tie-break property carries
    # over. Incremental generation appends work in BOTH spaces: a
    # position-space generation stores ranks into its own docmap and
    # the reader translates them to global ranks at decode (BMW falls
    # back to exhaustive until compact_index re-ranks into the merged
    # docmap — same pruning-only degradation as docid-space appends).
    posting_space: str = "docid"
    # "simple": identifiers stay whole ("parseJSON"/"foo_bar" one token
    # each). "code": identifier-aware splitting (camelCase / ACRONYMCase
    # / snake_case sub-tokens, the code-search convention) — chosen at
    # build time, recorded in stats.json, and applied to every query by
    # the readers (a query analyzed differently from the index silently
    # misses).
    analyzer: str = "simple"
    # Posting-stream codec: "varint" (LEB128, the default) or "packed"
    # (block-wise bit packing, the SIMD-BP128 family's layout: per
    # block one width byte + varint absolute first doc + gaps/tfs at
    # the block-max bit width). Packed wins most in position space
    # (doc gaps ~N/df -> log2 bits) and on tf streams (1-4 bits vs a
    # 1-byte varint); raw docid-space gaps stay ~60 bits wide. Recorded
    # in stats.json; readers pick the decode path per index.
    codec: str = "varint"
    # True: store within-doc token positions per posting (varint gap
    # blobs, ~1-2 B/occurrence), enabling INDEX-NATIVE phrase and
    # proximity queries (pipelines/phrase.py) with no corpus re-read —
    # the posting-payload pattern real engines (PISA/Lucene) use. The
    # blobs are encoded once at tokenize time and travel as opaque
    # bytes through the merge shuffle (concatenated per term at encode,
    # never re-coded). False keeps the docs+tf-only format; phrase
    # queries then fall back to the conjunctive-prune + corpus-verify
    # composition.
    positions: bool = False


# --------------------------------------------------------------------------
# stage kernels (all vectorized, all pure functions of their batch)
# --------------------------------------------------------------------------


def make_tokenize_fn(cfg: IndexConfig):
    key_cols = () if cfg.id_col else cfg.key_cols
    carry = [c for c in (*key_cols, *cfg.meta_cols)]
    id_col, content_col, bucket_bits = cfg.id_col, cfg.content_col, cfg.bucket_bits

    id_bits = cfg.id_bits
    if id_bits < 64 and cfg.id_col is not None:
        raise ValueError("id_bits<64 requires keys-derived docIDs")
    analyzer = cfg.analyzer
    with_positions = cfg.positions
    if cfg.codec not in ("varint", "packed"):
        raise ValueError(f"unknown codec {cfg.codec!r} (choose varint or packed)")
    from .tokenizer import ANALYZERS

    if analyzer not in ANALYZERS:
        raise ValueError(f"unknown analyzer {analyzer!r} (choose from {ANALYZERS})")

    def tokenize(batch: pa.Table) -> pa.Table:
        content = batch[content_col]
        if id_col is not None:
            doc = doc_ids_from_int(batch[id_col])
        else:
            doc = doc_ids_from_keys(*[batch[c] for c in key_cols])
        if id_bits < 64:
            doc = doc & np.uint64(
                (~((1 << (64 - id_bits)) - 1)) & 0xFFFFFFFFFFFFFFFF
            )
        if with_positions:
            terms, tfs, dl, poslists = doc_term_counts(
                content, analyzer, with_positions=True
            )
        else:
            terms, tfs, dl = doc_term_counts(content, analyzer)
            poslists = None
        sha = sha256_column(content)
        # NOTE: when id_col is set, the engine doc_id is splitmix64(orig id)
        # — a bijection, so the original id is recoverable via
        # docids.unsplitmix64 (the scorer does this for output); the raw
        # column is NOT carried to avoid shadowing the canonical doc_id.
        cols: dict[str, Any] = {
            "doc_id": pa.array(doc, type=pa.uint64()),
            "bucket": pa.array(bucket_of(doc, bucket_bits), type=pa.uint32()),
        }
        for c in carry:
            cols[c] = batch[c]
        cols["length"] = pa.array(dl.astype(np.uint32))
        cols["content_sha256"] = sha
        cols["term"] = terms
        cols["tf"] = tfs
        if poslists is not None:
            cols["pos"] = poslists
        return pa.table(cols)

    return tokenize


def term_group_hash(vocab: pa.Array, n_parts: int) -> np.ndarray:
    """Deterministic term -> group id, per unique term. Vectorized
    FNV-1a over the dictionary's flat byte buffer (was a per-term
    Python crc32 loop — measured as a top cost of the explode stage).
    Any fixed hash works here: the group id only routes a term's
    postings to a shuffle partition; segment contents are per-term."""
    from .pipelines.text import fnv1a_batch

    if isinstance(vocab, pa.ChunkedArray):
        vocab = vocab.combine_chunks()
    arr = vocab.cast(pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint32)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)[offs[0] : offs[-1]]
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    h = fnv1a_batch(data, offs - offs[0])
    return (h % np.uint64(n_parts)).astype(np.uint32)


def make_explode_fn(cfg: IndexConfig, with_bucket: bool = False, emit_dl: bool = True):
    """Tokenized rows -> (grp, term, doc_id, tf[, dl]) triples.

    ``with_bucket=True`` folds the docID-range bucket into the group key
    (grp = term_hash * n_buckets + bucket) for the single-shuffle merge.
    ``emit_dl=False`` drops the per-posting doc-length column from the
    shuffle payload (~14% of row bytes); the encode stage then looks dl
    up in the broadcast per-bucket length map instead."""
    n_parts = cfg.term_parts
    n_buckets = 1 << cfg.bucket_bits
    bucket_bits = cfg.bucket_bits

    def explode(batch: pa.Table) -> pa.Table:
        terms = batch["term"]
        tfs = batch["tf"]
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        if isinstance(tfs, pa.ChunkedArray):
            tfs = tfs.combine_chunks()
        flat_t = pc.list_flatten(terms)
        parents = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
        flat_tf = pc.list_flatten(tfs)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[parents]
        denc = flat_t.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        grp = term_group_hash(denc.dictionary, n_parts)[codes]
        if with_bucket:
            bkt = bucket_of(doc, bucket_bits)
            grp = grp * np.uint32(n_buckets) + bkt
        cols = {
            "grp": pa.array(grp, type=pa.uint32()),
            "term": flat_t.cast(pa.string()),
            "doc_id": pa.array(doc, type=pa.uint64()),
            "tf": flat_tf.cast(pa.uint32()),
        }
        if "pos" in batch.column_names:
            # opaque pre-encoded position-gap bytes ride the shuffle
            # per posting; the encode stage concatenates them per term
            poss = batch["pos"]
            if isinstance(poss, pa.ChunkedArray):
                poss = poss.combine_chunks()
            cols["pos"] = pc.list_flatten(poss)
        if emit_dl:
            dl = batch["length"].to_numpy(zero_copy_only=False)[parents]
            cols["dl"] = pa.array(dl.astype(np.uint32))
        return pa.table(cols)

    return explode


def _bucket_rank_refs(tok_dir: str, bucket_bits: int, lazy: bool = False):
    """Per-bucket (sorted doc_id, aligned doc length) arrays (as plasma
    ObjectRefs) + global rank offsets, built by Ray tasks — the DRIVER
    never holds the full id array (round 1 ``np.sort``-ed every doc_id
    on the driver, ~8 TB at 10^12 docs). Buckets are the top bits of
    the doc_id, so bucket-major order IS global docmap order and
    ``global_rank = offset[bucket] + rank_within_bucket``. Lengths ride
    along so the merge shuffle can drop its per-posting ``dl`` column
    (encode looks dl up bucket-locally instead).

    Works on both tokenized layouts: hive ``bucket=`` dirs (per-bucket
    merge) are read directly; the flat single-shuffle layout gets a
    ONE-pass map/reduce — map tasks each read a file subset once and
    radix-partition (doc_id, length) by bucket, reduce tasks concat +
    sort per bucket (the old shape re-read every file once PER bucket:
    2^bucket_bits-fold read amplification of the id/length columns)."""
    import ray as _ray

    n_buckets = 1 << bucket_bits

    @_ray.remote
    def sorted_ids(files: list[str]):
        import pyarrow.parquet as _pq

        ids, lens = [], []
        for f in files:
            t = _pq.read_table(f, columns=["doc_id", "length"])
            ids.append(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
            lens.append(t["length"].to_numpy(zero_copy_only=False).astype(np.uint32))
        a = np.concatenate(ids)
        order = np.argsort(a)
        return a[order], np.concatenate(lens)[order]

    @_ray.remote
    def partition_ids(files: list[str]):
        """one read of this file subset -> per-bucket (ids, lens) shards
        (bucket is the TOP id bits, so an id sort is bucket-major; one
        argsort serves both the partition and the final order)."""
        import pyarrow.parquet as _pq

        ids, lens = [], []
        for f in files:
            t = _pq.read_table(f, columns=["doc_id", "length"])
            ids.append(t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
            lens.append(t["length"].to_numpy(zero_copy_only=False).astype(np.uint32))
        a = np.concatenate(ids)
        ln = np.concatenate(lens)
        order = np.argsort(a)
        a, ln = a[order], ln[order]
        bounds = np.searchsorted(
            a,
            (np.arange(n_buckets + 1, dtype=np.uint64) << np.uint64(64 - bucket_bits))
            if bucket_bits
            else np.array([0, 1 << 63], dtype=np.uint64),
        )
        bounds[-1] = a.size
        return tuple(
            (a[int(s) : int(e)], ln[int(s) : int(e)])
            for s, e in zip(bounds[:-1], bounds[1:])
        )

    @_ray.remote
    def merge_bucket(*shards):
        """k-way merge of already-sorted per-map shards (mergesort on
        pre-sorted runs beats a fresh argsort)."""
        live = [s for s in shards if s[0].size]
        if not live:
            return np.empty(0, np.uint64), np.empty(0, np.uint32)
        if len(live) == 1:
            return live[0]
        a = np.concatenate([s[0] for s in live])
        ln = np.concatenate([s[1] for s in live])
        order = np.argsort(a, kind="stable")
        return a[order], ln[order]

    @_ray.remote
    def size_of(pair) -> tuple[int, int]:
        return int(pair[0].size), int(pair[1].sum())

    refs = []
    hive_ok = True
    for b in range(n_buckets):
        bfiles = sorted(
            glob.glob(
                os.path.join(tok_dir, "**", f"bucket={b}", "*.parquet"),
                recursive=True,
            )
        )
        if bfiles:
            refs.append(sorted_ids.remote(bfiles))
        else:
            hive_ok = False
            break
    if not hive_ok:
        # flat layout: one-pass partition + per-bucket merge
        allfiles = sorted(
            glob.glob(os.path.join(tok_dir, "**", "*.parquet"), recursive=True)
        )
        if n_buckets == 1:
            refs = [sorted_ids.remote(allfiles)]
        else:
            ncpus = int(_ray.cluster_resources().get("CPU", 8))
            n_map = max(2, min(2 * ncpus, len(allfiles)))
            groups = [g for g in (allfiles[i::n_map] for i in range(n_map)) if g]
            shard_lists = [
                partition_ids.options(num_returns=n_buckets).remote(g)
                for g in groups
            ]
            refs = [
                merge_bucket.remote(*[sl[b] for sl in shard_lists])
                for b in range(n_buckets)
            ]
    size_refs = [size_of.remote(r) for r in refs]

    def finalize():
        """Block on the per-bucket sizes -> (offsets, (n_docs, tokens)).
        Deferred so the single-shuffle merge can launch its map tasks
        WHILE the rank map builds (the maps don't read it; only the
        reducers do) — the old eager get was a ~3-4 s serial barrier
        between tokenize and merge at 300k docs."""
        sizes = _ray.get(size_refs)
        counts = [s for s, _ in sizes]
        total_tokens = sum(t for _, t in sizes)
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1].astype(np.uint64)
        return offsets, (int(sum(counts)), int(total_tokens))

    if lazy:
        return refs, finalize
    offsets, totals = finalize()
    return offsets, refs, totals


def rank_map_from_sorted_ids(doc_sorted: np.ndarray, bucket_bits: int):
    """Rank map from an already-loaded global sorted id array (used by
    compaction, which holds the docmap anyway for length lookups —
    its decode emits a ``dl`` column, so the length slot is None)."""
    import ray as _ray

    n_buckets = 1 << bucket_bits
    bounds = np.searchsorted(
        doc_sorted,
        (np.arange(n_buckets, dtype=np.uint64) << np.uint64(64 - bucket_bits))
        if bucket_bits
        else np.zeros(1, dtype=np.uint64),
    )
    offsets = bounds.astype(np.uint64)
    ends = np.concatenate((bounds[1:], [doc_sorted.size]))
    refs = [
        _ray.put((doc_sorted[int(s) : int(e)], None))
        for s, e in zip(bounds, ends)
    ]
    return offsets, refs


def make_encode_group_fn(
    avgdl: float,
    bucket: int | None,
    n_buckets: int = 1,
    rank_map=None,
    use_ranks: bool | None = None,
    codec: str = "varint",
):
    """Encode every term of one (grp, bucket) shuffle group.

    Fully vectorized across ALL terms in the group: one lexsort, ONE
    varint encode of the whole group's doc-gap stream and tf stream
    (per-term/per-block resets expressed as masks), block metadata via
    ``reduceat``, and zero-copy Arrow assembly from flat buffers. No
    Python loop over terms — a ds.stats() audit showed 240k per-term
    codec calls costing ~0.5ms of fixed overhead each (~110s CPU per
    200k-doc build) before this.

    ``rank_map`` is ``(offsets, refs)`` with each ref a per-bucket
    ``(sorted_ids, lengths | None)`` pair. ``use_ranks`` controls the
    position-space doc->rank remap (default: rank_map present). When
    the input has no ``dl`` column, doc lengths come from the bucket's
    length array (saves shipping dl per posting through the shuffle).
    """
    remap = use_ranks if use_ranks is not None else (rank_map is not None)

    def encode_group(tbl: pa.Table) -> pa.Table:
        from .codec import BLOCK_SIZE, bm25_wnorm, varint_encode, varint_lengths

        if tbl.num_rows == 0:
            from .schema import SEGMENT

            return SEGMENT.empty_table()
        bkt = (
            bucket
            if bucket is not None
            else int(tbl["grp"][0].as_py()) % n_buckets
        )
        term_col = tbl["term"]
        if isinstance(term_col, pa.ChunkedArray):
            term_col = term_col.combine_chunks()
        denc = term_col.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary
        doc = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        tf = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.uint64)
        has_dl = "dl" in tbl.column_names
        dl = (
            tbl["dl"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if has_dl
            else None
        )

        order = np.lexsort((doc, codes))
        codes, doc, tf = codes[order], doc[order], tf[order]
        if dl is not None:
            dl = dl[order]
        if rank_map is not None and (remap or dl is None):
            # Every shuffle group is single-bucket, so only that
            # bucket's slice is pulled from plasma. The searchsorted
            # index serves both the position-space doc->GLOBAL-rank
            # remap (monotone in doc_id -> sort order and tie-breaks
            # unchanged) and the dl lookup.
            import ray as _ray

            offsets, refs = rank_map
            ids_b, lens_b = _ray.get(refs[bkt])
            pos_b = np.searchsorted(ids_b, doc)
            if dl is None:
                dl = lens_b[pos_b].astype(np.uint64)
            if remap:
                doc = pos_b.astype(np.uint64) + offsets[bkt]
        if dl is None:
            raise ValueError(
                "encode_group needs a dl column or a rank_map with lengths"
            )
        n = codes.size
        starts = np.concatenate(([0], np.flatnonzero(np.diff(codes)) + 1))
        starts_ext = np.concatenate((starts, [n]))  # T+1
        counts = np.diff(starts_ext)
        T = starts.size

        # block starts: every BLOCK_SIZE-th posting within a term (term
        # starts are block starts, so gaps never cross term boundaries)
        idx_in_term = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        block_start = (idx_in_term % BLOCK_SIZE) == 0
        prev = np.empty(n, dtype=np.uint64)
        prev[0] = 0
        prev[1:] = doc[:-1]
        vals = np.where(block_start, doc, doc - prev)

        bpos = np.flatnonzero(block_start)
        bend = np.concatenate((bpos[1:], [n]))
        bterm = np.searchsorted(starts, bpos, side="right") - 1
        wnorm = bm25_wnorm(tf, dl, avgdl)
        maxw_b = np.maximum.reduceat(wnorm, bpos)
        last_b = doc[bend - 1]
        cnt_b = (bend - bpos).astype(np.uint32)
        tb = np.searchsorted(bpos, starts_ext).astype(np.int64)  # T+1

        if codec == "packed":
            # block-wise bit packing (SIMD-BP128-family layout): byte
            # lengths are per BLOCK, so block/term offsets come from
            # the per-block length cumsum instead of per-value lengths
            from .codec import pack_stream

            doc_bytes, dblk = pack_stream(vals, bpos, bend, with_first=True)
            tf_bytes, tblk = pack_stream(tf, bpos, bend, with_first=False)
            dblk_cum = np.concatenate(([0], np.cumsum(dblk)))
            tblk_cum = np.concatenate(([0], np.cumsum(tblk)))
            term_d0 = dblk_cum[tb[:-1]]  # per-term blob start (T)
            term_t0 = tblk_cum[tb[:-1]]
            doff_b = (dblk_cum[:-1] - term_d0[bterm]).astype(np.uint32)
            toff_b = (tblk_cum[:-1] - term_t0[bterm]).astype(np.uint32)
            d_offs_term = dblk_cum[tb]
            t_offs_term = tblk_cum[tb]
        else:
            dlen = varint_lengths(vals)
            tlen = varint_lengths(tf)
            doc_bytes = varint_encode(vals, _nbytes=dlen)
            tf_bytes = varint_encode(tf, _nbytes=tlen)
            doc_cum = np.concatenate(([0], np.cumsum(dlen)))
            tf_cum = np.concatenate(([0], np.cumsum(tlen)))
            doff_b = (doc_cum[bpos] - doc_cum[starts][bterm]).astype(np.uint32)
            toff_b = (tf_cum[bpos] - tf_cum[starts][bterm]).astype(np.uint32)
            d_offs_term = doc_cum[starts_ext]
            t_offs_term = tf_cum[starts_ext]

        def _list_arr(values: np.ndarray, pa_type) -> pa.LargeListArray:
            return pa.LargeListArray.from_arrays(
                pa.array(tb, type=pa.int64()), pa.array(values, type=pa_type)
            )

        def _blob_arr(offs: np.ndarray, data: np.ndarray) -> pa.Array:
            return pa.Array.from_buffers(
                pa.large_binary(),
                T,
                [
                    None,
                    pa.py_buffer(offs.astype(np.int64).tobytes()),
                    pa.py_buffer(data.tobytes()),
                ],
            )

        # positional payload: per-posting pre-encoded varint gap bytes
        # arrive as an opaque binary column; gather them in the same
        # (term, doc) sort order and concatenate per term — no decode or
        # re-encode (within-doc gaps are ordering-independent)
        if "pos" in tbl.column_names:
            pos_col = tbl["pos"]
            if isinstance(pos_col, pa.ChunkedArray):
                pos_col = pos_col.combine_chunks()
            taken = pos_col.take(pa.array(order))
            poffs = np.frombuffer(taken.buffers()[1], dtype=np.int64)[
                taken.offset : taken.offset + len(taken) + 1
            ]
            pdata_buf = taken.buffers()[2]
            pos_data = (
                np.frombuffer(pdata_buf, dtype=np.uint8)[poffs[0] : poffs[-1]]
                if pdata_buf is not None
                else np.empty(0, dtype=np.uint8)
            )
            pos_cum = (poffs - poffs[0]).astype(np.int64)
            pos_blob = _blob_arr(pos_cum[starts_ext], pos_data)
        else:
            pos_blob = pa.Array.from_buffers(
                pa.large_binary(),
                T,
                [
                    None,
                    pa.py_buffer(np.zeros(T + 1, dtype=np.int64).tobytes()),
                    pa.py_buffer(b""),
                ],
            )

        term_vals = vocab.take(pa.array(codes[starts])).cast(pa.string())
        return pa.table(
            {
                "term": term_vals,
                "bucket": pa.array(np.full(T, bkt, dtype=np.uint32)),
                "df": pa.array(counts.astype(np.uint64)),
                "cf": pa.array(np.add.reduceat(tf.astype(np.uint64), starts)),
                "doc_blob": _blob_arr(d_offs_term, doc_bytes),
                "tf_blob": _blob_arr(t_offs_term, tf_bytes),
                "pos_blob": pos_blob,
                "block_last_doc": _list_arr(last_b, pa.uint64()),
                "block_doc_off": _list_arr(doff_b, pa.uint32()),
                "block_tf_off": _list_arr(toff_b, pa.uint32()),
                "block_count": _list_arr(cnt_b, pa.uint32()),
                "block_max_wnorm": _list_arr(maxw_b, pa.float64()),
                "avgdl": pa.array(np.full(T, float(avgdl))),
            }
        )

    return encode_group


# --------------------------------------------------------------------------
# build driver
# --------------------------------------------------------------------------


def _resolve_doc_collisions(tok_dir: str, cfg: IndexConfig, ncpus: int) -> int:
    """Detect docID collisions (one id, >1 distinct content) and
    resolve them DETERMINISTICALLY, keeping 64-bit ids end to end.

    Detection is scale-safe: a narrow (doc_id, sha256) groupby whose
    ``map_groups`` emits rows ONLY from multi-occupant groups — the
    driver sees just the colliding docs (expected ~n²/2^65; ~27k rows
    at 10^12 docs), never the id table. Resolution: within a colliding
    id, docs sort by sha256; the smallest keeps the id, the rest get
    ``splitmix64(old ^ sha64 ^ round) & id_mask`` and the tokenized
    store is rewritten (one proportional pass, only in the rare rounds
    where collisions exist). Iterates until clean — the mapping is a
    pure function of the colliding (id, sha) set, so results are
    identical at any parallelism. Two rows with the SAME (id, sha)
    mean duplicate input keys and raise.

    Returns the number of remapped docs. In ``id_col`` mode ids come
    from a bijective mix of unique int keys, so any collision IS a
    duplicate input key (always raises)."""
    import ray as _ray

    import pandas as pd

    id_mask = np.uint64((~((1 << (64 - cfg.id_bits)) - 1)) & 0xFFFFFFFFFFFFFFFF)
    total_fixed = 0
    for round_i in range(8):
        tok_files = sorted(
            glob.glob(os.path.join(tok_dir, "**", "*.parquet"), recursive=True)
        )

        def narrow(b: pa.Table) -> pa.Table:
            d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    # order-preserving u64 -> i64 view for the sort-based
                    # groupby (raw u64 > 2^63 breaks boundary sampling)
                    "doc_key": pa.array(
                        (d ^ np.uint64(1 << 63)).view(np.int64), type=pa.int64()
                    ),
                    "sha": b["content_sha256"],
                }
            )

        # detection: vectorized count aggregate over the narrow id
        # stream (no per-group Python), then only rows of COLLIDING ids
        # (broadcast the tiny dup-key set) reach the driver
        ids_ds = rd.read_parquet(
            tok_files,
            columns=["doc_id", "content_sha256"],
            override_num_blocks=2 * ncpus,
        )
        counts = (
            ids_ds.map_batches(
                lambda b: narrow(b).select(["doc_key"]), batch_format="pyarrow"
            )
            .groupby("doc_key")
            .count()
        )
        dup_df = counts.map_batches(
            lambda t: t.filter(pc.greater(t["count()"], 1)),
            batch_format="pyarrow",
        ).to_pandas()
        # an all-filtered-out dataset collapses to a zero-column frame
        dup_keys = (
            set(dup_df["doc_key"].tolist()) if "doc_key" in dup_df.columns else set()
        )
        if not dup_keys:
            return total_fixed
        dup_ref = _ray.put(pa.array(sorted(dup_keys), type=pa.int64()))

        def only_dups(b: pa.Table) -> pa.Table:
            t = narrow(b)
            keep = pc.is_in(t["doc_key"], value_set=_ray.get(dup_ref))
            return t.filter(keep)

        coll = ids_ds.map_batches(only_dups, batch_format="pyarrow").to_pandas()
        if cfg.id_col is not None:
            raise ValueError(
                "duplicate values in the id column (bijective ids cannot "
                "collide otherwise) — deduplicate the corpus keys"
            )
        mapping: dict[tuple[int, bytes], int] = {}
        for doc_key, grp in coll.groupby("doc_key", sort=True):
            shas = sorted(grp["sha"])
            if len(shas) != len(set(shas)):
                raise ValueError(
                    "duplicate (repo, path, commit) keys in the corpus — "
                    "deduplicate before indexing"
                )
            old = np.uint64(np.int64(doc_key)) ^ np.uint64(1 << 63)
            for sha in shas[1:]:  # smallest sha keeps the id
                sha64 = np.frombuffer(sha[:8], dtype=">u8")[0].astype(np.uint64)
                with np.errstate(over="ignore"):
                    new = (
                        splitmix64(
                            np.array(
                                [old ^ sha64 ^ np.uint64(round_i + 1)],
                                dtype=np.uint64,
                            )
                        )[0]
                        & id_mask
                    )
                mapping[(int(old), bytes(sha))] = int(new)
        map_ref = _ray.put(mapping)

        def rewrite(b: pa.Table) -> pa.Table:
            m = _ray.get(map_ref)
            d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64).copy()
            # vectorized pre-filter: only the tiny colliding id set can
            # match, so gate the per-row dict probe on np.isin instead
            # of walking the ENTIRE tokenized store in Python (review
            # finding — at 10^10+ docs the unfiltered loop is the cost)
            coll_ids = np.fromiter(
                (k[0] for k in m), dtype=np.uint64, count=len(m)
            )
            cand = np.flatnonzero(np.isin(d, coll_ids))
            if cand.size:
                shas = b["content_sha256"].take(pa.array(cand)).to_pylist()
                for i, si in zip(cand.tolist(), shas):
                    nd = m.get((int(d[i]), si))
                    if nd is not None:
                        d[i] = nd
            # always (re)build doc_id AND bucket: hive-layout reads of a
            # file LIST lose the bucket partition column, so recomputing
            # keeps the output schema identical across layouts
            cols = {c: b[c] for c in b.column_names}
            cols["doc_id"] = pa.array(d, type=pa.uint64())
            cols["bucket"] = pa.array(bucket_of(d, cfg.bucket_bits), type=pa.uint32())
            return pa.table(cols)

        wkw = {"partition_cols": ["bucket"]} if cfg.per_bucket_merge else {}
        fixed = rd.read_parquet(tok_files, override_num_blocks=2 * ncpus).map_batches(
            rewrite, batch_format="pyarrow"
        )
        _atomic_write(fixed, tok_dir + ".rewrite", **wkw)
        # park-then-swap so a crash never leaves tokenized/ missing
        parked = tok_dir + ".old"
        shutil.rmtree(parked, ignore_errors=True)
        os.rename(tok_dir, parked)
        os.rename(tok_dir + ".rewrite", tok_dir)
        shutil.rmtree(parked, ignore_errors=True)
        total_fixed += len(mapping)
    raise RuntimeError(
        "docID collision resolution did not converge in 8 rounds — "
        "id space too small for this corpus (raise id_bits)"
    )


def _settle_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` importable before write
    threads fan out. write_parquet's path resolution imports it on
    EVERY call (Ray catches ModuleNotFoundError); with aiohttp absent
    the import fails and is retried each time, and two threads racing
    the same failing first-import observe a partially-initialized
    module — a plain ImportError that escapes Ray's catch and kills a
    tokenize group. Registering an inert stub (its HTTPFileSystem
    matches no real filesystem) makes later imports deterministic and
    keeps Ray's ``_is_http_filesystem`` returning False, exactly as
    the ModuleNotFoundError path would."""
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:
        import sys as _sys
        import types as _types

        stub = _types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only — never instantiated
            pass

        stub.HTTPFileSystem = HTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = stub


def _norm_cfg_val(v: Any) -> Any:
    """JSON round-trips tuples to lists; compare them equal."""
    return list(v) if isinstance(v, tuple) else v


def _atomic_write(ds: rd.Dataset, final_dir: str, **write_kwargs: Any) -> None:
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)  # a fully-empty dataset writes no files at all
    ds.write_parquet(tmp, **write_kwargs)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)


def _read_files(
    files: list[str], columns: list[str], num_blocks: int | None = None
) -> rd.Dataset:
    """Format-dispatched source read (reference reads TSV logs,
    /root/reference/src/helpers/Reader.py:180-183; Parquet is the
    native format — CSV/TSV/JSONL are convenience ingests).

    ``num_blocks`` right-sizes parquet read tasks at the source: the
    default splitting yields per-file ~30 ms tasks whose scheduling
    overhead dominates (measured 2.5-4.8 s vs 0.7 s at 32 blocks for a
    64-file/387 MB corpus at 16 CPUs) — same fix the merge read got."""
    ext = os.path.splitext(files[0])[1].lower()
    if ext == ".parquet":
        kw = {"override_num_blocks": num_blocks} if num_blocks else {}
        return rd.read_parquet(files, columns=columns, **kw)
    if ext in (".csv", ".tsv"):
        from pyarrow import csv as pacsv

        parse = pacsv.ParseOptions(delimiter="\t" if ext == ".tsv" else ",")
        ds = rd.read_csv(files, parse_options=parse)
        return ds.select_columns([c for c in columns if c in ds.schema().names])
    if ext in (".json", ".jsonl", ".ndjson"):
        # file_extensions=None: paths are explicit files, and Ray's
        # default extension filter rejects .ndjson it can parse fine
        ds = rd.read_json(files, file_extensions=None)
        return ds.select_columns([c for c in columns if c in ds.schema().names])
    raise ValueError(f"unsupported corpus format: {ext}")


def _input_groups(source, n_groups: int) -> list[tuple[str, Any]]:
    """Split the input into lineage partitions (file groups)."""
    if isinstance(source, (str, os.PathLike)):
        p = str(source)
        if os.path.isdir(p):
            files = sorted(
                f
                for pat in ("*.parquet", "*.csv", "*.tsv", "*.json",
                            "*.jsonl", "*.ndjson")
                for f in glob.glob(os.path.join(p, "**", pat), recursive=True)
            )
            if not files:
                raise FileNotFoundError(
                    f"no supported corpus files under {p!r} (looked for "
                    "*.parquet/*.csv/*.tsv/*.json/*.jsonl/*.ndjson)"
                )
        else:
            files = [p]
        source = files
    if isinstance(source, (list, tuple)) and source and isinstance(source[0], str):
        files = list(source)
        n = max(1, min(n_groups, len(files)))
        return [(f"g{i}", files[i::n]) for i in range(n)]
    return [("all", source)]  # a Dataset / pa.Table: one lineage partition


_MERGE_TASKS = None


def _merge_task_fns():
    """Raw-Ray map/reduce tasks for the fused single-shuffle merge
    (defined once per process so re-builds don't re-export them)."""
    global _MERGE_TASKS
    if _MERGE_TASKS is not None:
        return _MERGE_TASKS
    import ray as _ray

    @_ray.remote
    def merge_map(files: list[str], cfg: IndexConfig, n_red: int):
        """read tokenized slice -> explode to triples -> partition by
        static group-hash range into n_red reducer shards."""
        import pyarrow.parquet as _pq

        explode = make_explode_fn(cfg, with_bucket=True, emit_dl=False)
        tok_cols = ["doc_id", "length", "term", "tf"] + (
            ["pos"] if cfg.positions else []
        )
        tbls = [explode(_pq.read_table(f, columns=tok_cols)) for f in files]
        t = pa.concat_tables(tbls).combine_chunks() if len(tbls) > 1 else tbls[0]
        n_grp = cfg.term_parts * (1 << cfg.bucket_bits)
        grp = t.column("grp").to_numpy(zero_copy_only=False)
        part = (grp.astype(np.uint64) * np.uint64(n_red) // np.uint64(n_grp)).astype(
            np.int64
        )
        # sort by grp itself (part is monotone in grp): every shard
        # arrives at its reducer already grp-sorted, so the reduce side
        # can slice grp runs via searchsorted instead of re-sorting
        order = np.argsort(grp, kind="stable")
        t = t.take(order)
        bounds = np.searchsorted(part[order], np.arange(n_red + 1))
        # ONE gather, then zero-copy slices: Ray's Arrow serializer
        # (ray._private.arrow_serialization) truncates sliced tables to
        # their logical range on put (verified: 1k-row slice of a 64 MB
        # table serializes to 32 KB), so each shard ships only its own
        # bytes. Per-shard take() instead costs n_red string gathers
        # (measured 27 s vs 9 s CPU per 300k-doc merge).
        return tuple(
            t.slice(int(s), int(e - s)) for s, e in zip(bounds[:-1], bounds[1:])
        )

    @_ray.remote
    def merge_reduce(
        out_path: str,
        avgdl: float,
        n_buckets: int,
        rank_map,
        use_ranks: bool,
        codec: str,
        *shards: pa.Table,
    ) -> int:
        """concat this reducer's shards -> split into grp runs ->
        vectorized per-group encode -> write ONE parquet file."""
        import pyarrow.parquet as _pq

        from .schema import SEGMENT

        live = [s for s in shards if s.num_rows]
        if not live:
            from .schema import LEXICON

            _pq.write_table(SEGMENT.empty_table(), out_path)
            return (0, LEXICON.empty_table(), 0, 0, 0, 0)
        # shards arrive grp-sorted (map sorts by grp), so each grp's
        # rows are one contiguous run per shard: searchsorted + slice
        # assembles every group zero-copy — no reduce-side sort/gather
        grps = [s.column("grp").to_numpy(zero_copy_only=False) for s in live]
        uniq = np.unique(np.concatenate([np.unique(g) for g in grps]))
        encode = make_encode_group_fn(
            avgdl, None, n_buckets, rank_map, use_ranks=use_ranks, codec=codec
        )
        outs = []
        for gv in uniq:
            pieces = []
            for s, g in zip(live, grps):
                lo = int(np.searchsorted(g, gv, side="left"))
                hi = int(np.searchsorted(g, gv, side="right"))
                if hi > lo:
                    pieces.append(s.slice(lo, hi - lo))
            outs.append(encode(pa.concat_tables(pieces)))
        seg = pa.concat_tables(outs)
        _pq.write_table(seg, out_path)
        # fold the lexicon/metrics pass into the reduce: each reducer
        # returns its (term, df) partial + size sums, so the build
        # never re-reads the segment files in a separate driver stage
        # (that pass was ~1-2 s of CONSTANT wall — pure Amdahl loss at
        # the high-parallelism leg)
        lex = (
            seg.select(["term", "df", "cf"])
            .group_by("term")
            .aggregate([("df", "sum"), ("cf", "sum")])
            .rename_columns(["term", "df", "cf"])
        )
        return (
            seg.num_rows,
            lex,
            int(pc.sum(seg["df"]).as_py() or 0),
            int(pc.sum(pc.binary_length(seg["doc_blob"])).as_py() or 0),
            int(pc.sum(pc.binary_length(seg["tf_blob"])).as_py() or 0),
            int(pc.sum(pc.binary_length(seg["pos_blob"])).as_py() or 0),
        )

    _MERGE_TASKS = (merge_map, merge_reduce)
    return _MERGE_TASKS


def _fused_merge_launch_maps(tok_files: list[str], cfg: IndexConfig, ncpus: int):
    """Launch the fused merge's map side (read+explode+partition) and
    return the in-flight per-reducer shard ObjectRef lists. Split out so
    ``build_index`` can start the maps while the rank map builds."""
    merge_map, _ = _merge_task_fns()
    n_red = max(4, 2 * ncpus)
    n_map = max(4, 2 * ncpus)
    groups = [g for g in (tok_files[i::n_map] for i in range(n_map)) if g]
    shard_lists = [
        merge_map.options(num_returns=n_red).remote(g, cfg, n_red) for g in groups
    ]
    return shard_lists, n_red


def _fused_shuffle_merge(
    tok_files: list[str],
    cfg: IndexConfig,
    avgdl: float,
    rank_map,
    use_ranks: bool,
    final_dir: str,
    ncpus: int,
    lex_dir: str | None = None,
    prelaunch=None,
) -> tuple[int, dict | None]:
    """Single-shuffle merge as a fused map-side-partition exchange.

    Semantically identical to ``triples.groupby("grp").map_groups(
    encode)``, but expressed as raw Ray tasks — one of the few places
    the Dataset API genuinely can't say what we need: its groupby is a
    sort exchange (sample boundaries -> SortMap -> SortReduce barrier)
    that measured ~3 effective cores of 16 on this stage, while the
    group key here is a uniform hash with a KNOWN static range
    (term_parts x n_buckets), so reducer assignment needs no sampling
    and no sort. Map tasks fuse read+explode+partition; reduce tasks
    fuse merge+encode+parquet-write (the write sink disappears as a
    separate operator). Measured: 10.2 s -> ~4 s on a 300k-doc merge
    at 16 CPUs.

    Scale shape (100 TB): identical data movement to any hash shuffle —
    every triple crosses the exchange exactly once as a plasma object;
    reducer count scales with the cluster (2 x total cores) so each
    reducer holds corpus/n_red triples (spillable). Map and reduce
    tasks are pure + idempotent: Ray lineage retries re-run them
    safely, and the tmp-dir + rename commit keeps the stage atomic for
    resume. Replaying the reference's posting merge
    (/root/reference/src/helpers/Reader.py:188 groupby semantics) at
    exchange level.
    """
    import ray as _ray

    _, merge_reduce = _merge_task_fns()
    shard_lists, n_red = (
        prelaunch
        if prelaunch is not None
        else _fused_merge_launch_maps(tok_files, cfg, ncpus)
    )
    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    red_refs = [
        merge_reduce.remote(
            os.path.join(tmp, f"part-{p:05d}.parquet"),
            avgdl,
            1 << cfg.bucket_bits,
            rank_map,
            use_ranks,
            cfg.codec,
            *[sl[p] for sl in shard_lists],
        )
        for p in range(n_red)
    ]
    results = _ray.get(red_refs)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.rename(tmp, final_dir)
    rows = sum(r[0] for r in results)
    metrics = None
    if lex_dir is not None:
        import pyarrow.parquet as pq

        # each reducer covers a disjoint grp range but a term's buckets
        # can straddle a reducer boundary, so re-sum the (tiny,
        # vocab-sized) partials on the driver before writing
        lex = (
            pa.concat_tables([r[1] for r in results])
            .group_by("term")
            .aggregate([("df", "sum"), ("cf", "sum")])
            .rename_columns(["term", "df", "cf"])
        )
        ltmp = lex_dir + ".tmp"
        shutil.rmtree(ltmp, ignore_errors=True)
        os.makedirs(ltmp)
        pq.write_table(lex, os.path.join(ltmp, "lexicon.parquet"))
        shutil.rmtree(lex_dir, ignore_errors=True)
        os.rename(ltmp, lex_dir)
        postings = sum(r[2] for r in results)
        doc_bytes = sum(r[3] for r in results)
        tf_bytes = sum(r[4] for r in results)
        pos_bytes = sum(r[5] for r in results)
        seg_files = glob.glob(os.path.join(final_dir, "*.parquet"))
        metrics = {
            "segment_rows": rows,
            "postings": postings,
            "doc_blob_bytes": doc_bytes,
            "tf_blob_bytes": tf_bytes,
            "bytes_per_posting": round(
                (doc_bytes + tf_bytes) / max(1, postings), 3
            ),
            "disk_bytes": sum(os.path.getsize(f) for f in seg_files),
        }
        if pos_bytes:
            metrics["pos_blob_bytes"] = pos_bytes
    return rows, metrics


def build_index(
    source: str | Sequence[str] | rd.Dataset | pa.Table,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume building) a full index under ``index_dir``.

    Returns the manifest dict (stats + per-stage metrics).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    if not resume:
        # tombstones/ MUST go too: doc ids are deterministic functions
        # of the keys, so tombstones surviving a from-scratch rebuild
        # would silently mask the rebuilt docs (review finding)
        for sub in ("tokenized", "docmap", "segments", "lexicon",
                    "tombstones", "manifest.json", "stats.json"):
            p = os.path.join(index_dir, sub)
            shutil.rmtree(p, ignore_errors=True) if os.path.isdir(p) else (
                os.remove(p) if os.path.exists(p) else None
            )
    man = Manifest(index_dir)
    stored_cfg = man.data.get("config")
    if resume and stored_cfg and man.data.get("stages"):
        # A partially-built index embeds its config in every completed
        # stage (bucket hive dirs, docid space, ...). Resuming with a
        # different config would silently mix layouts — e.g. a smaller
        # bucket_bits makes the per-bucket merge glob skip high buckets,
        # dropping postings while docmap/stats still count all docs.
        critical = (
            "bucket_bits", "term_parts", "key_cols", "id_col",
            "posting_space", "content_col", "block_size", "per_bucket_merge",
            "id_bits", "check_collisions", "analyzer", "positions", "codec",
        )
        new_cfg = asdict(cfg)
        diffs = {
            k: (stored_cfg.get(k), new_cfg.get(k))
            for k in critical
            if k in stored_cfg and _norm_cfg_val(stored_cfg.get(k)) != _norm_cfg_val(new_cfg.get(k))
        }
        if diffs:
            raise ValueError(
                f"resume=True but config differs from the stored manifest "
                f"config for {index_dir}: {diffs}. Pass resume=False to "
                f"rebuild, or reuse the original config."
            )
    man.data["config"] = asdict(cfg)
    n_buckets = 1 << cfg.bucket_bits
    tok_dir = os.path.join(index_dir, "tokenized")
    import ray as _ray

    ncpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8

    read_cols = list(
        dict.fromkeys(
            ([cfg.id_col] if cfg.id_col else list(cfg.key_cols))
            + list(cfg.meta_cols)
            + [cfg.content_col]
        )
    )

    # ---- stage 1: tokenize ---------------------------------------------
    if not man.stage_done("tokenized"):
        tok_fn = make_tokenize_fn(cfg)
        # hive-partition by bucket only when the merge reads
        # per-bucket (avoids num_groups x num_buckets small files —
        # measured: hive-partitioning the single-shuffle layout blew
        # tokenized/ up to ~1800 tiny files and throttled the merge
        # read to ~2 effective cores). The position-space rank map
        # handles both layouts (bucket-filtering inside its tasks).
        wkw = {"partition_cols": ["bucket"]} if cfg.per_bucket_merge else {}

        def prepare_group(ginput) -> rd.Dataset:
            if isinstance(ginput, list):
                # per-group blocks: groups run concurrently, so the
                # groups TOGETHER target ~2 tasks/core
                ds = _read_files(
                    ginput,
                    read_cols,
                    num_blocks=max(
                        4, (2 * ncpus) // max(1, cfg.lineage_parts)
                    ),
                )
            elif isinstance(ginput, pa.Table):
                ds = rd.from_arrow(ginput.select([c for c in read_cols if c in ginput.column_names]))
            else:
                ds = ginput
            return ds.map_batches(
                tok_fn, batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
            )

        def run_group(gname, out: rd.Dataset) -> None:
            t = StageTimer()
            part_dir = os.path.join(tok_dir, f"part_{gname}")
            _atomic_write(out, part_dir, **wkw)
            rows = pads.dataset(part_dir).count_rows()
            man.mark_partition("tokenized", gname, rows=rows, wall_s=t.elapsed())

        # groups run CONCURRENTLY (each is its own streaming job; Ray
        # schedules their tasks on one pool, so a group's ramp-up/tail
        # overlaps the others' steady state — sequential jobs left
        # ~2 s/group of the node idle). Lineage-partition resume is
        # preserved: each group still marks its own manifest partition.
        # Dataset CREATION stays on this thread: read_parquet's lazy
        # fsspec import is not thread-safe (concurrent first-imports
        # observe a partially-initialized module); only execution (the
        # write) fans out.
        pending = [
            (g, prepare_group(gi))
            for g, gi in _input_groups(source, cfg.lineage_parts)
            if not man.partition_done("tokenized", g)
        ]
        if len(pending) <= 1:
            for gname, out in pending:
                run_group(gname, out)
        else:
            _settle_fsspec_http()
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(pending)) as pool:
                futs = [pool.submit(run_group, g, out) for g, out in pending]
                for f in futs:
                    f.result()
        man.mark_stage("tokenized")

    if not glob.glob(os.path.join(tok_dir, "**", "*.parquet"), recursive=True):
        raise ValueError(
            f"corpus {source!r} produced zero tokenized rows — an index "
            "needs at least one document (empty deltas: skip the "
            "build_incremental call instead of appending an empty "
            "generation)"
        )

    # ---- stage 1.5: docID collision detect + resolve -------------------
    if cfg.check_collisions and not man.stage_done("collisions"):
        t = StageTimer()
        n_fixed = _resolve_doc_collisions(tok_dir, cfg, ncpus)
        man.mark_stage("collisions", rows=n_fixed, wall_s=t.elapsed())

    # per-bucket (sorted-id, length) refs built by Ray tasks — nothing
    # id-sized ever lands on the driver. Both posting spaces use the
    # length map (so the merge shuffle carries no per-posting dl);
    # position space additionally remaps doc -> global rank through it.
    # Built before stage 2: its per-bucket (count, token-sum) totals ARE
    # the global stats, so the docmap-skipping path needs no extra pass.
    rank_map = None
    rank_totals = None
    use_ranks = cfg.posting_space == "position"
    fused_prelaunch = None
    if not man.stage_done("segments"):
        refs_r, finalize_r = _bucket_rank_refs(tok_dir, cfg.bucket_bits, lazy=True)
        if not cfg.per_bucket_merge:
            # overlap: the fused merge's map tasks don't touch the rank
            # map (only reducers do) — launch them NOW so they run
            # concurrently with the rank-map tasks instead of after a
            # driver-side get barrier
            fused_tok_files = sorted(
                glob.glob(os.path.join(tok_dir, "**", "*.parquet"), recursive=True)
            )
            fused_prelaunch = _fused_merge_launch_maps(fused_tok_files, cfg, ncpus)
        offsets_r, rank_totals = finalize_r()
        rank_map = (offsets_r, refs_r)

    # ---- stage 2: docmap + stats ---------------------------------------
    if not man.stage_done("docmap"):
        t = StageTimer()
        tok_files = sorted(glob.glob(os.path.join(tok_dir, "**", "*.parquet"), recursive=True))
        all_cols = pads.dataset(tok_files[0]).schema.names
        dm_cols = [c for c in all_cols if c not in ("term", "tf", "pos")]
        if cfg.write_docmap:
            dm = rd.read_parquet(
                tok_files, columns=dm_cols, override_num_blocks=2 * ncpus
            ).repartition(max(8, ncpus))
            _atomic_write(dm, os.path.join(index_dir, "docmap"))
        if rank_totals is not None:
            n_docs, total_tokens = rank_totals
        else:
            # resume corner: docmap unfinished but segments done — the
            # rank map wasn't built, so aggregate the stats directly
            from ray.data.aggregate import Count, Sum

            dm2 = rd.read_parquet(
                tok_files, columns=["doc_id", "length"], override_num_blocks=ncpus
            )
            agg = dm2.aggregate(Count(), Sum("length"))
            n_docs = int(agg.get("count()", 0) or 0)
            total_tokens = int(agg.get("sum(length)", 0) or 0)
        # (docID uniqueness is guaranteed by the collision-resolution
        # stage above when check_collisions=True)
        stats = {
            "n_docs": int(n_docs),
            "total_tokens": int(total_tokens),
            "avgdl": (float(total_tokens) / n_docs) if n_docs else 0.0,
            "id_mode": "int" if cfg.id_col else "keys",
            "posting_space": cfg.posting_space,
            "analyzer": cfg.analyzer,
            "positions": bool(cfg.positions),
            "codec": cfg.codec,
        }
        man.data["stats"] = stats
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats, f)
        man.mark_stage("docmap", wall_s=t.elapsed(), rows=int(n_docs))

    stats = man.data["stats"]

    # ---- stage 3: merge into segments ----------------------------------
    if not man.stage_done("segments") and not cfg.per_bucket_merge:
        # single-shuffle mode: bucket folded into the group key; one job
        t = StageTimer()
        tok_files = sorted(
            glob.glob(os.path.join(tok_dir, "**", "*.parquet"), recursive=True)
        )
        _, fused_metrics = _fused_shuffle_merge(
            tok_files,
            cfg,
            stats["avgdl"],
            rank_map,
            use_ranks,
            os.path.join(index_dir, "segments", "all"),
            ncpus,
            lex_dir=os.path.join(index_dir, "lexicon"),
            prelaunch=fused_prelaunch,
        )
        man.mark_stage("segments", wall_s=t.elapsed())
        # lexicon + metrics came out of the SAME reduce pass
        man.data["index_metrics"] = fused_metrics
        man.mark_stage("lexicon", wall_s=0.0)

    if not man.stage_done("segments"):
        explode_fn = make_explode_fn(cfg, emit_dl=False)
        for b in range(n_buckets):
            pname = f"bucket_{b}"
            if man.partition_done("segments", pname):
                continue
            t = StageTimer()
            # both layouts: part_g*/bucket=b (fresh tokenize) and
            # bucket=b at the top (post-collision-rewrite)
            bfiles = sorted(
                glob.glob(
                    os.path.join(tok_dir, "**", f"bucket={b}", "*.parquet"),
                    recursive=True,
                )
            )
            seg_dir = os.path.join(index_dir, "segments", pname)
            if not bfiles:
                os.makedirs(seg_dir, exist_ok=True)
                man.mark_partition("segments", pname, rows=0, wall_s=t.elapsed())
                continue
            tk = rd.read_parquet(
                bfiles,
                columns=["doc_id", "length", "term", "tf"]
                + (["pos"] if cfg.positions else []),
                override_num_blocks=2 * ncpus,
            )
            triples = tk.map_batches(explode_fn, batch_format="pyarrow")
            seg = triples.groupby("grp").map_groups(
                make_encode_group_fn(
                    stats["avgdl"], b, rank_map=rank_map, use_ranks=use_ranks,
                    codec=cfg.codec,
                ),
                batch_format="pyarrow",
            )
            seg = seg.repartition(4)
            _atomic_write(seg, seg_dir)
            rows = pads.dataset(seg_dir).count_rows()
            man.mark_partition("segments", pname, rows=rows, wall_s=t.elapsed())
        man.mark_stage("segments")

    # ---- stage 4: lexicon (global df) + size metrics, ONE file pass -----
    if not man.stage_done("lexicon") or "index_metrics" not in man.data:
        t = StageTimer()
        seg_files = sorted(
            glob.glob(os.path.join(index_dir, "segments", "**", "*.parquet"), recursive=True)
        )
        metrics = _write_lexicon(
            seg_files, os.path.join(index_dir, "lexicon"), with_metrics=True
        )
        man.data["index_metrics"] = metrics
        man.mark_stage("lexicon", wall_s=t.elapsed())

    return man.data


def _write_lexicon(
    seg_files: list[str], lex_dir: str, with_metrics: bool = False
) -> dict | None:
    """Aggregate per-run df -> global df; optionally compute the index
    size metrics from the SAME single pass over the segment files
    (separate count/lexicon/metrics passes were ~2 s of fixed wall per
    build). Segment-row counts are vocab x buckets — small relative to
    the corpus — so below ~5M rows a single pyarrow group_by on the
    driver beats a distributed groupby's fixed costs by seconds; past
    that, the Ray path runs."""
    import pyarrow.parquet as pq

    # pre-v5 segments lack the cf column; fail with the same clear
    # rebuild message score_qld gives, not a raw Arrow field error
    # (compact_index / build_incremental read EXISTING segments)
    if seg_files and "cf" not in pads.dataset(seg_files[0]).schema.names:
        raise ValueError(
            "index segments have no cf column (built by a pre-v5 "
            "format) — rebuild the index with this version before "
            "compacting or appending to it"
        )
    n_rows = sum(pads.dataset(f).count_rows() for f in seg_files)
    has_pos = bool(seg_files) and "pos_blob" in pads.dataset(seg_files[0]).schema.names
    metrics = None
    if n_rows <= 5_000_000:
        from .schema import LEXICON

        cols = ["term", "df", "cf"] + (
            ["doc_blob", "tf_blob"] + (["pos_blob"] if has_pos else [])
            if with_metrics
            else []
        )
        tables = [pq.read_table(f, columns=cols) for f in seg_files]
        t = (
            pa.concat_tables(tables)
            if tables
            else (LEXICON.empty_table() if not with_metrics else None)
        )
        if with_metrics:
            if t is None:
                from .schema import SEGMENT

                t = SEGMENT.empty_table()
            doc_bytes = int(pc.sum(pc.binary_length(t["doc_blob"])).as_py() or 0)
            tf_bytes = int(pc.sum(pc.binary_length(t["tf_blob"])).as_py() or 0)
            pos_bytes = (
                int(pc.sum(pc.binary_length(t["pos_blob"])).as_py() or 0)
                if has_pos and "pos_blob" in t.column_names
                else 0
            )
            postings = int(pc.sum(t["df"]).as_py() or 0)
            metrics = {
                "segment_rows": t.num_rows,
                "postings": postings,
                "doc_blob_bytes": doc_bytes,
                "tf_blob_bytes": tf_bytes,
                "bytes_per_posting": round(
                    (doc_bytes + tf_bytes) / max(1, postings), 3
                ),
                "disk_bytes": sum(os.path.getsize(f) for f in seg_files),
            }
            if pos_bytes:
                metrics["pos_blob_bytes"] = pos_bytes
                metrics["pos_bytes_per_occurrence"] = round(
                    pos_bytes / max(1, int(pc.sum(t["cf"]).as_py() or 0)), 3
                )
            t = t.select(["term", "df", "cf"])
        lex = (
            t.group_by("term")
            .aggregate([("df", "sum"), ("cf", "sum")])
            .rename_columns(["term", "df", "cf"])
        )
        tmp = lex_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        pq.write_table(lex, os.path.join(tmp, "lexicon.parquet"))
        shutil.rmtree(lex_dir, ignore_errors=True)
        os.rename(tmp, lex_dir)
        return metrics
    from ray.data.aggregate import Sum

    lex = (
        rd.read_parquet(seg_files, columns=["term", "df", "cf"])
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    _atomic_write(lex, lex_dir)
    if with_metrics:
        # distributed single pass for the metrics sums
        def sizes(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "rows": pa.array([b.num_rows], type=pa.int64()),
                    "postings": pa.array(
                        [int(pc.sum(b["df"]).as_py() or 0)], type=pa.int64()
                    ),
                    "doc_b": pa.array(
                        [int(pc.sum(pc.binary_length(b["doc_blob"])).as_py() or 0)],
                        type=pa.int64(),
                    ),
                    "tf_b": pa.array(
                        [int(pc.sum(pc.binary_length(b["tf_blob"])).as_py() or 0)],
                        type=pa.int64(),
                    ),
                    "pos_b": pa.array(
                        [
                            int(pc.sum(pc.binary_length(b["pos_blob"])).as_py() or 0)
                            if "pos_blob" in b.column_names
                            else 0
                        ],
                        type=pa.int64(),
                    ),
                }
            )

        agg = (
            rd.read_parquet(
                seg_files,
                columns=["df", "doc_blob", "tf_blob"]
                + (["pos_blob"] if has_pos else []),
            )
            .map_batches(sizes, batch_format="pyarrow")
            .to_pandas()
            .sum()
        )
        metrics = {
            "segment_rows": int(agg["rows"]),
            "postings": int(agg["postings"]),
            "doc_blob_bytes": int(agg["doc_b"]),
            "tf_blob_bytes": int(agg["tf_b"]),
            "bytes_per_posting": round(
                (int(agg["doc_b"]) + int(agg["tf_b"])) / max(1, int(agg["postings"])), 3
            ),
            "disk_bytes": sum(os.path.getsize(f) for f in seg_files),
        }
        if int(agg["pos_b"]):
            metrics["pos_blob_bytes"] = int(agg["pos_b"])
    return metrics


def _linked_files(index_dir: str, sub: str, gen_names) -> list[str]:
    """Parquet files of ``sub`` (segments/ or docmap/) belonging to
    the BASE layout or a generation in ``gen_names`` — stale ``gen_*``
    link dirs left by a crashed append of an unrecorded generation are
    EXCLUDED, mirroring the readers' and compaction's skip (review
    finding: build_incremental's stats/lexicon recompute used to count
    phantom rows the readers never serve)."""
    names = set(gen_names)
    root = os.path.join(index_dir, sub)
    out = []
    for f in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True):
        top = os.path.relpath(f, root).split(os.sep)[0]
        if top.startswith("gen_") and top[4:] not in names:
            continue
        out.append(f)
    return sorted(out)


def build_incremental(
    delta_source: str | Sequence[str] | rd.Dataset | pa.Table,
    index_dir: str,
    generation: str,
) -> dict:
    """Append a delta corpus to an existing index (no rebuild).

    The reference's incremental-snapshot pattern
    (/root/reference/src/helpers/Reader.py:148-162: cumulative ``hist``
    vs delta ``incre`` blocks; warm-start at
    /root/reference/src/helpers/Runner.py:143-145) maps here to
    append-only index *generations*: the delta is built as a complete
    index under ``generations/<generation>/`` with the SAME config,
    then its segment rows are linked into the main ``segments/`` dir,
    the lexicon is re-aggregated (tiny groupby over segment rows) and
    global stats recomputed from both docmaps. Because a term's runs
    may now have overlapping docID ranges across generations, scorers
    re-sort decoded postings when runs interleave
    (``IndexReader.decode_term`` handles this already — tested).

    Requires delta doc keys to be disjoint from the base corpus
    (collision resolution applies within each generation; a
    cross-generation duplicate cannot be auto-remapped because the
    base postings are already encoded, so it is DETECTED here — a
    scale-safe (doc_id)-only groupby across all docmaps — and raises
    before the delta is linked, leaving the base index untouched).
    """
    import json as _json

    man = Manifest(index_dir)
    cfg = IndexConfig(**{**man.data["config"]})
    recorded = list(man.data["stats"].get("generations", []) or [])
    if generation in recorded:
        # a completed generation's manifest would make the inner
        # build_index(resume=True) return WITHOUT reading the new
        # delta — appending different data under a used name would be
        # silently dropped (review finding). Retrying a CRASHED append
        # (name not yet recorded) with the same delta stays supported.
        raise ValueError(
            f"generation {generation!r} is already appended to this "
            "index — pick a new generation name"
        )
    if not cfg.write_docmap:
        raise ValueError(
            "incremental generations need write_docmap=True (the global "
            "docmap glob would miss the base corpus otherwise)"
        )
    # format guard: new-code segments always carry pos_blob (v6);
    # linking them next to pre-v6 base segments would give the reader
    # a mixed schema (pa.concat_tables raises) and brick every query —
    # fail BEFORE building the delta, with a rebuild message
    base_seg = sorted(
        glob.glob(os.path.join(index_dir, "segments", "**", "*.parquet"), recursive=True)
    )
    if base_seg and "pos_blob" not in pads.dataset(base_seg[0]).schema.names:
        raise ValueError(
            "index segments lack the pos_blob column (built by a pre-v6 "
            "format) — rebuild the index with this version before "
            "appending generations to it"
        )
    gen_dir = os.path.join(index_dir, "generations", generation)
    build_index(delta_source, gen_dir, cfg, resume=True)

    # guard: delta doc_ids must be disjoint from every generation
    # already linked. Narrow 8-byte id shuffle only; the driver sees
    # just the (expected-empty) duplicate set.
    if cfg.check_collisions:
        # base = committed layout only: recorded generations + the
        # base docmap. This excludes THIS generation's own link dirs
        # (a crashed previous append of the same name would otherwise
        # fail every retry against its own earlier copy) AND any other
        # crashed append's stale unrecorded links (whose phantom rows
        # the readers skip).
        base_files = _linked_files(index_dir, "docmap", recorded)
        gen_files = sorted(
            glob.glob(os.path.join(gen_dir, "docmap", "**", "*.parquet"), recursive=True)
        )
        if base_files and gen_files:

            def _keyed(files: list[str]) -> rd.Dataset:
                def to_key(b: pa.Table) -> pa.Table:
                    d = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    return pa.table(
                        {
                            "doc_key": pa.array(
                                (d ^ np.uint64(1 << 63)).view(np.int64),
                                type=pa.int64(),
                            )
                        }
                    )

                return rd.read_parquet(files, columns=["doc_id"]).map_batches(
                    to_key, batch_format="pyarrow"
                )

            dups = (
                _keyed(base_files)
                .union(_keyed(gen_files))
                .groupby("doc_key")
                .count()
                .map_batches(
                    lambda t: t.filter(pc.greater(t["count()"], 1)),
                    batch_format="pyarrow",
                )
                .take(5)
            )
            if dups:
                sample = [
                    (int(r["doc_key"]) & 0xFFFFFFFFFFFFFFFF) ^ (1 << 63)
                    for r in dups
                ]
                # drop the unlinked build so a corrected retry does not
                # resume from this delta's stale manifest
                shutil.rmtree(gen_dir, ignore_errors=True)
                raise ValueError(
                    f"generation {generation!r} shares doc ids with the "
                    f"existing index (sample: {sample}); cross-generation "
                    "duplicates cannot be remapped after base postings are "
                    "encoded — dedup the delta or rebuild with compact_index"
                )

    # link the generation's segments + docmap into the main index
    seg_link = os.path.join(index_dir, "segments", f"gen_{generation}")
    dm_link = os.path.join(index_dir, "docmap", f"gen_{generation}")
    for src, dst in (
        (os.path.join(gen_dir, "segments"), seg_link),
        (os.path.join(gen_dir, "docmap"), dm_link),
    ):
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            # hardlink, not copy: segment/docmap files are immutable
            # once built, and a byte copy would duplicate every delta
            # on disk for the life of the index (review finding)
            shutil.copytree(src, dst, copy_function=os.link)
        except OSError:
            shutil.rmtree(dst, ignore_errors=True)
            shutil.copytree(src, dst)  # cross-device fallback

    # recompute global stats (N, avgdl) over the COMMITTED docmaps
    # (recorded generations + this one; stale unrecorded links are
    # excluded exactly as the readers exclude them)
    dm = rd.read_parquet(
        _linked_files(index_dir, "docmap", recorded + [generation]),
        columns=["doc_id", "length"],
    )
    n_docs = dm.count()
    total = dm.sum("length") or 0
    # update (not replace) the stored stats so keys a prior build
    # recorded — posting_space, id_mode, future additions — survive
    stats = dict(man.data["stats"])
    stats.update(
        {
            "n_docs": int(n_docs),
            "total_tokens": int(total),
            "avgdl": (float(total) / n_docs) if n_docs else 0.0,
            "generations": sorted(
                set(man.data["stats"].get("generations", []) + [generation])
            ),
        }
    )
    man.data["stats"] = stats
    with open(os.path.join(index_dir, "stats.json"), "w") as f:
        _json.dump(stats, f)

    # re-aggregate the lexicon over the COMMITTED segment rows
    _write_lexicon(
        _linked_files(index_dir, "segments", recorded + [generation]),
        os.path.join(index_dir, "lexicon"),
    )
    man.mark_stage(f"generation_{generation}")
    man.save()
    return man.data


def compact_index(index_dir: str) -> dict:
    """Merge all generations' segment runs into fresh single-generation
    segments (one doc-sorted run per (term, bucket)), re-encoded under
    the CURRENT global avgdl — restoring full block-max WAND usability
    after incremental appends (interleaved docID ranges force scorers
    onto the exhaustive path until compaction; cf. segment-merge
    policies in log-structured engines).

    Pipeline: read segment rows (grouped by GENERATION, path-derived)
    -> map_batches decode (postings back to (grp, term, doc_id, tf, dl)
    triples; position-space values are generation-LOCAL docmap ranks
    and are translated through that generation's broadcast docmap,
    docid-space lengths are looked up against the global docmap) ->
    the same groupby-encode merge as the build (position space
    re-ranks into the MERGED docmap order via the per-bucket rank
    map). Afterwards the docmap generation dirs are consolidated and
    the generation list cleared — post-compaction ranks reference the
    single merged space.
    """
    import ray

    man = Manifest(index_dir)
    cfg = IndexConfig(**{**man.data["config"]})
    stats = man.data["stats"]
    position = getattr(cfg, "posting_space", "docid") == "position"
    n_buckets = 1 << cfg.bucket_bits
    avgdl = float(stats["avgdl"])
    ncpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8

    # broadcast docmap lengths once
    from .delete import clear_tombstones
    from .scorer import IndexReader

    # snapshot the tombstone FILES this compaction may clear BEFORE the
    # reader loads them: the reader then purges a superset of this
    # snapshot (safe — an unsnapshotted-but-purged file is re-cleared
    # by the next compaction), never the reverse
    tomb_files = sorted(
        glob.glob(os.path.join(index_dir, "tombstones", "*.parquet"))
    )
    # docmap/tombstone state only — loading the posting blobs here
    # would put the ENTIRE index on the driver (review finding); the
    # postings stream through rd.read_parquet below instead
    reader = IndexReader(index_dir, skip_segments=True)
    # deletion purge (delete.py): tombstoned docs are dropped from the
    # decoded posting stream and the docmap, and N/avgdl are recomputed
    # over the survivors BEFORE encoding (block-max wnorms must use the
    # post-delete avgdl for fresh-build bit-identity). live_mask is the
    # reader's docmap-aligned survivor mask; tombstone ids absent from
    # the docmap only need the tombstone files cleared.
    live = reader.live_mask
    # a delete_docs() landing mid-compaction writes a new tombstone
    # file that survives the final clear (it was never in tomb_files)
    had_tombstones = len(tomb_files) > 0
    if live is not None:
        surv_ids = reader.doc_sorted[live]
        surv_lens = reader.len_sorted[live]
        n_docs_new = int(surv_ids.size)
        avgdl = (float(surv_lens.sum()) / n_docs_new) if n_docs_new else 0.0
        tomb_ref = ray.put(reader.doc_sorted[~live])  # sorted (doc_sorted is)
    else:
        surv_ids = reader.doc_sorted
        n_docs_new = int(stats["n_docs"])
        tomb_ref = None
    dl_ref = ray.put((reader.doc_sorted, reader.len_sorted))
    gen_ref = (
        ray.put((reader.gen_ids, reader.gen_lens))
        if position and reader.gens
        else None
    )
    n_parts = cfg.term_parts

    with_pos = bool(getattr(cfg, "positions", False))
    idx_codec = getattr(cfg, "codec", "varint")

    def make_decode_rows(gen_idx: int):
        def decode_rows(batch: pa.Table) -> pa.Table:
            from .codec import decode_run

            def _list_col(name):
                col = batch[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                return (
                    col.values.to_numpy(zero_copy_only=False),
                    col.offsets.to_numpy(),
                )

            terms_out, docs_out, tfs_out = [], [], []
            pos_parts, pos_len_parts = [], []
            doc_blobs = batch["doc_blob"].to_pylist()
            tf_blobs = batch["tf_blob"].to_pylist()
            pos_blobs = batch["pos_blob"].to_pylist() if with_pos else None
            cnt_vals, cnt_offs = _list_col("block_count")
            doff_vals, _ = _list_col("block_doc_off")
            toff_vals, _ = _list_col("block_tf_off")
            terms = batch["term"].to_pylist()
            for i in range(batch.num_rows):
                cnts = cnt_vals[cnt_offs[i]:cnt_offs[i + 1]]
                d, tf = decode_run(
                    doc_blobs[i], tf_blobs[i], cnts,
                    doff_vals[cnt_offs[i]:cnt_offs[i + 1]],
                    toff_vals[cnt_offs[i]:cnt_offs[i + 1]],
                    codec=idx_codec,
                )
                docs_out.append(d)
                tfs_out.append(tf)
                terms_out.append(np.full(d.size, i, dtype=np.int64))
                if with_pos:
                    # re-split the term's position blob into per-posting
                    # byte spans WITHOUT decoding: a varint ends on the
                    # first byte with the continuation bit clear, and
                    # posting j owns the next tf_j varints
                    blob = np.frombuffer(pos_blobs[i], dtype=np.uint8)
                    pos_parts.append(blob)
                    if tf.size:
                        vend = np.flatnonzero(blob < 128) + 1
                        cut = vend[np.cumsum(tf.astype(np.int64)) - 1]
                        pos_len_parts.append(
                            np.diff(np.concatenate(([0], cut)))
                        )
                    else:
                        pos_len_parts.append(np.empty(0, dtype=np.int64))
            if not docs_out:
                cols0 = {
                    "grp": pa.array([], type=pa.uint32()),
                    "term": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.uint64()),
                    "tf": pa.array([], type=pa.uint32()),
                    "dl": pa.array([], type=pa.uint32()),
                }
                if with_pos:
                    cols0["pos"] = pa.array([], type=pa.large_binary())
                return pa.table(cols0)
            row_idx = np.concatenate(terms_out)
            docs = np.concatenate(docs_out)
            tfs = np.concatenate(tfs_out)
            if with_pos:
                pdata = (
                    np.concatenate(pos_parts)
                    if pos_parts
                    else np.empty(0, dtype=np.uint8)
                )
                plens = (
                    np.concatenate(pos_len_parts).astype(np.int64)
                    if pos_len_parts
                    else np.empty(0, dtype=np.int64)
                )
            if position:
                if gen_ref is not None:
                    gi, gl = ray.get(gen_ref)
                    ids_g, lens_g = gi[gen_idx], gl[gen_idx]
                else:
                    ids_g, lens_g = ray.get(dl_ref)
                ranks = docs.astype(np.int64)
                dl = lens_g[ranks]
                docs = ids_g[ranks]
            else:
                doc_sorted, len_sorted = ray.get(dl_ref)
                dl = len_sorted[np.searchsorted(doc_sorted, docs)]
            if tomb_ref is not None:
                tmb = ray.get(tomb_ref)
                if tmb.size:
                    p = np.minimum(np.searchsorted(tmb, docs), tmb.size - 1)
                    keep = tmb[p] != docs
                    if with_pos and not keep.all():
                        # gather the surviving postings' variable-length
                        # byte spans (vectorized repeat/cumsum gather)
                        from .codec import _segment_gather_index

                        offs = np.concatenate(([0], np.cumsum(plens)))
                        sel = np.flatnonzero(keep)
                        pdata = pdata[
                            _segment_gather_index(offs[sel], plens[sel])
                        ]
                        plens = plens[sel]
                    row_idx, docs, tfs, dl = (
                        row_idx[keep], docs[keep], tfs[keep], dl[keep]
                    )
            term_arr = pa.array(terms, type=pa.string()).take(pa.array(row_idx))
            th = term_group_hash(pa.array(terms, type=pa.string()), n_parts)
            grp = th[row_idx] * np.uint32(n_buckets) + bucket_of(docs, cfg.bucket_bits)
            cols = {
                "grp": pa.array(grp, type=pa.uint32()),
                "term": term_arr,
                "doc_id": pa.array(docs, type=pa.uint64()),
                "tf": pa.array(tfs.astype(np.uint32)),
                "dl": pa.array(dl.astype(np.uint32)),
            }
            if with_pos:
                cols["pos"] = pa.Array.from_buffers(
                    pa.large_binary(),
                    plens.size,
                    [
                        None,
                        pa.py_buffer(
                            np.concatenate(([0], np.cumsum(plens))).tobytes()
                        ),
                        pa.py_buffer(np.ascontiguousarray(pdata)),
                    ],
                )
            return pa.table(cols)

        return decode_rows

    seg_root = os.path.join(index_dir, "segments")
    seg_files = sorted(glob.glob(os.path.join(seg_root, "**", "*.parquet"), recursive=True))
    gen_names = sorted(stats.get("generations", []))

    def gen_of(f: str) -> int | None:
        """None = gen_* dir NOT recorded in stats — the partial link a
        crashed build_incremental leaves (readers skip it too). It is
        garbage relative to this index's committed state: compaction
        ignores its postings and removes the dir at the end, so the
        compacted index is clean (the delta's own build under
        generations/ is untouched — the append can be retried)."""
        top = os.path.relpath(f, seg_root).split(os.sep)[0]
        if top.startswith("gen_"):
            name = top[4:]
            return 1 + gen_names.index(name) if name in gen_names else None
        return 0

    groups: dict[int, list[str]] = {}
    for f in seg_files:
        g = gen_of(f)
        if g is None:
            # stale segment dirs die with the parked segments/ rename
            # below; the docmap-side twins are swept by the gen_* glob
            continue
        groups.setdefault(g, []).append(f)
    parts = [
        rd.read_parquet(fs).map_batches(
            make_decode_rows(g), batch_format="pyarrow", batch_size=64
        )
        for g, fs in sorted(groups.items())
    ]
    if parts:
        triples = (
            parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        ).repartition(2 * ncpus)
        rank_map = (
            rank_map_from_sorted_ids(surv_ids, cfg.bucket_bits)
            if position
            else None
        )
        seg = triples.groupby("grp").map_groups(
            make_encode_group_fn(avgdl, None, n_buckets, rank_map,
                                 codec=cfg.codec),
            batch_format="pyarrow",
        )
        _atomic_write(seg, os.path.join(index_dir, "segments_compacted"))
    else:
        # zero segment files (e.g. every doc deleted, then a second
        # compaction): a valid empty index, not an IndexError (review
        # finding) — swap in an empty segments/ dir
        tmp = os.path.join(index_dir, "segments_compacted")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)

    # swap in atomically, drop generation links: park the old segments
    # aside first so a crash between steps never leaves the index with
    # no segments/ dir (which would read as an empty-but-valid index)
    old = os.path.join(index_dir, "segments")
    parked = os.path.join(index_dir, "segments.old")
    shutil.rmtree(parked, ignore_errors=True)
    if os.path.isdir(old):
        os.rename(old, parked)
    os.rename(os.path.join(index_dir, "segments_compacted"), old)
    shutil.rmtree(parked, ignore_errors=True)
    # stale (not-in-stats) generation links: their SEGMENT dirs died
    # with the parked segments/ above; drop the matching docmap dirs
    # BEFORE the consolidation glob below so a crashed append's rows
    # never leak into the flat docmap
    for d in glob.glob(os.path.join(index_dir, "docmap", "gen_*")):
        if os.path.isdir(d) and os.path.basename(d)[4:] not in gen_names:
            shutil.rmtree(d, ignore_errors=True)
    # consolidate docmap generation dirs into one flat generation and
    # clear the generation list — compacted postings reference the
    # merged docmap space (identity for position ranks from here on).
    # A deletion purge additionally filters the docmap rows and writes
    # the recomputed (n_docs, avgdl) so post-compaction queries are
    # bit-identical to a fresh build over the surviving corpus.
    purge = live is not None
    if gen_names or purge:
        dm_files = sorted(
            glob.glob(os.path.join(index_dir, "docmap", "**", "*.parquet"), recursive=True)
        )
        dm_cols = None
        if not dm_files:  # write_docmap=False: docmap columns live in tokenized/
            dm_files = sorted(
                glob.glob(
                    os.path.join(index_dir, "tokenized", "**", "*.parquet"),
                    recursive=True,
                )
            )
            from .schema import DOCMAP

            dm_cols = [f2.name for f2 in DOCMAP]
        dm = rd.read_parquet(dm_files, columns=dm_cols)
        if purge:
            tomb_np = reader.doc_sorted[~live]

            def drop_tombstoned(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                p = np.minimum(np.searchsorted(tomb_np, ids), tomb_np.size - 1)
                return batch.filter(pa.array(tomb_np[p] != ids))

            dm = dm.map_batches(drop_tombstoned, batch_format="pyarrow")
        dm = dm.repartition(max(8, ncpus))
        # park-then-swap like the segments/ replacement above: plain
        # _atomic_write rmtree's the LIVE docmap before renaming the
        # new one in, and a crash inside that window leaves an index
        # whose readers build a truncated doc_sorted (review finding)
        dm_new = os.path.join(index_dir, "docmap_compacted")
        _atomic_write(dm, dm_new)
        dm_dir = os.path.join(index_dir, "docmap")
        dm_parked = os.path.join(index_dir, "docmap.old")
        shutil.rmtree(dm_parked, ignore_errors=True)
        if os.path.isdir(dm_dir):
            os.rename(dm_dir, dm_parked)
        os.rename(dm_new, dm_dir)
        shutil.rmtree(dm_parked, ignore_errors=True)
        stats2 = dict(man.data["stats"])
        stats2["generations"] = []
        if purge:
            stats2["n_docs"] = n_docs_new
            stats2["avgdl"] = avgdl
        man.data["stats"] = stats2
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats2, f)
    if had_tombstones:
        clear_tombstones(index_dir, files=tomb_files)
    _write_lexicon(
        sorted(glob.glob(os.path.join(old, "**", "*.parquet"), recursive=True)),
        os.path.join(index_dir, "lexicon"),
    )
    man.mark_stage("compacted")
    return man.data


def upsert_docs(
    delta_source: str | Sequence[str] | rd.Dataset | pa.Table,
    index_dir: str,
    generation: str,
) -> dict:
    """Document UPDATE: replace existing versions of the delta's docs
    (matched by the index's id derivation) and add new ones, without a
    full rebuild.

    Why this is delete -> compact -> append and not just
    delete -> append: tombstones identify docs by ENGINE id, so if an
    id's OLD postings and NEW postings coexisted, neither readers nor
    the compaction purge could tell them apart (and the docmap would
    hold duplicate ids, which every searchsorted lookup assumes away).
    Compacting between the delete and the append physically removes
    the old version and clears its tombstone, so the re-add is clean —
    the log-structured "merge-on-update" policy. Cost model: ONE
    compaction per upsert BATCH (proportional to index size) — batch
    updates and amortize, exactly like any LSM merge. Pure inserts
    (no id overlap) skip the compaction entirely and degrade to
    ``build_incremental``.

    Returns the manifest dict. Rank/score results after an upsert are
    identical to a fresh build over the logically-current corpus
    (pytest-pinned)."""
    import pyarrow.parquet as pq

    man = Manifest(index_dir)
    cfg = IndexConfig(**{**man.data["config"]})

    # ---- derive the delta's engine ids (same derivation as the build)
    if isinstance(delta_source, pa.Table):
        tbl = delta_source
    elif isinstance(delta_source, rd.Dataset):
        cols = [cfg.id_col] if cfg.id_col else list(cfg.key_cols)
        tbl = pa.Table.from_pandas(delta_source.select_columns(cols).to_pandas())
    else:
        p = delta_source
        if isinstance(p, (str, os.PathLike)) and os.path.isdir(str(p)):
            files = sorted(
                f
                for pat in ("*.parquet", "*.csv", "*.tsv", "*.json",
                            "*.jsonl", "*.ndjson")
                for f in glob.glob(os.path.join(str(p), "**", pat),
                                   recursive=True)
            )
        else:
            files = list(p) if isinstance(p, (list, tuple)) else [str(p)]
        cols = [cfg.id_col] if cfg.id_col else list(cfg.key_cols)
        # _read_files, not pads.dataset: the latter is parquet-only,
        # but every other entry point accepts CSV/TSV/JSONL deltas
        # (review finding)
        tbl = pa.Table.from_pandas(
            _read_files(files, cols).to_pandas(), preserve_index=False
        )
    # ---- pre-validate BEFORE any destructive step: the tombstone +
    # compaction below physically removes the old versions, so a delta
    # that would fail its own build must be rejected FIRST (review
    # finding: a malformed delta used to destroy the current versions
    # and then raise, losing both). A crash DURING the append itself
    # still loses the old versions — the delta data stays in the
    # caller's hands, so the recovery is to retry build_incremental.
    need_cols = ([cfg.id_col] if cfg.id_col else list(cfg.key_cols)) + [
        cfg.content_col
    ]
    if isinstance(delta_source, pa.Table):
        have = set(delta_source.column_names)
    elif isinstance(delta_source, rd.Dataset):
        have = set(delta_source.schema().names)
    else:
        have = set(_read_files(files, need_cols).schema().names)
    missing_cols = [c for c in need_cols if c not in have]
    if missing_cols:
        raise ValueError(
            f"upsert_docs: delta is missing required columns "
            f"{missing_cols}"
        )
    if cfg.id_col:
        delta_ids = doc_ids_from_int(tbl[cfg.id_col])
    else:
        delta_ids = doc_ids_from_keys(*[tbl[c] for c in cfg.key_cols])
    if cfg.id_bits < 64:
        delta_ids = delta_ids & np.uint64(
            (~((1 << (64 - cfg.id_bits)) - 1)) & 0xFFFFFFFFFFFFFFFF
        )
    n_rows = delta_ids.size
    delta_ids = np.unique(delta_ids)
    if delta_ids.size != n_rows:
        raise ValueError(
            f"upsert_docs: delta contains {n_rows - delta_ids.size} "
            "duplicate document identities — dedup the delta first "
            "(which version should win is not inferable here)"
        )
    if delta_ids.size == 0:
        # empty delta (e.g. an ingest loop flushing an empty batch):
        # graceful no-op — the searchsorted probe below would index
        # [-1] into a zero-length array otherwise (review finding)
        return man.data

    # ---- which of them already live in the index? (narrow id read)
    dm_files = sorted(
        glob.glob(os.path.join(index_dir, "docmap", "**", "*.parquet"), recursive=True)
    ) or sorted(
        glob.glob(os.path.join(index_dir, "tokenized", "**", "*.parquet"), recursive=True)
    )
    existing_parts = []
    for f in dm_files:
        ids = (
            pq.read_table(f, columns=["doc_id"])["doc_id"]
            .to_numpy(zero_copy_only=False)
            .astype(np.uint64)
        )
        p = np.searchsorted(delta_ids, ids)
        p = np.minimum(p, delta_ids.size - 1)
        hit = ids[delta_ids[p] == ids]
        if hit.size:
            existing_parts.append(hit)

    if existing_parts:
        from .delete import _write_tombstone

        stale = np.unique(np.concatenate(existing_parts))
        _write_tombstone(index_dir, stale)
        compact_index(index_dir)  # purge old versions + their tombstones

    return build_incremental(delta_source, index_dir, generation)


def maintain_index(
    index_dir: str,
    max_generations: int = 4,
    max_tombstone_fraction: float = 0.2,
) -> bool:
    """Compaction POLICY — the piece a long-running ingest loop calls
    after each ``build_incremental``/``upsert_docs``/``delete_docs``
    batch: fold generations back into single per-(term, bucket) runs
    when either trigger fires, exactly like an LSM engine's merge
    policy. Returns True iff a compaction ran.

    Triggers:
    * ``len(generations) >= max_generations`` — interleaved generation
      runs force scorers off block-max pruning (``term_bmw_safe``), so
      unbounded appends decay query speed; compaction restores it.
    * tombstoned ids >= ``max_tombstone_fraction`` of the corpus —
      masked deletes cost a per-load searchsorted and keep stale stats;
      past the threshold the purge pays for itself.
    """
    import json as _json

    from .delete import load_tombstones

    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = _json.load(f)
    n_gens = len(stats.get("generations", []) or [])
    n_docs = max(1, int(stats.get("n_docs", 1)))
    n_tomb = int(load_tombstones(index_dir).size)
    if n_gens >= max_generations or n_tomb / n_docs >= max_tombstone_fraction:
        compact_index(index_dir)
        return True
    return False


def recode_index(index_dir: str, codec: str) -> dict:
    """Re-encode an index's posting segments with a different codec
    WITHOUT re-tokenizing: drop the segments/lexicon stages from the
    manifest and resume the build from the existing ``tokenized/``
    forward store. At scale the tokenize pass dominates the build, so
    flipping the codec knob (``varint`` <-> ``packed``) after the fact
    costs only the merge shuffle — the operational path for "the
    object store got tight, re-pack the postings".

    Docmap, stats (except the recorded codec), tombstones and the
    forward store are untouched; rank identity across codecs is the
    codec suite's pinned invariant. Refuses an index with live
    generations (their segments live outside the base layout —
    ``compact_index`` first). Returns the refreshed manifest dict."""
    if codec not in ("varint", "packed"):
        raise ValueError(
            f"recode_index: unknown codec {codec!r} (choose varint or packed)"
        )
    man = Manifest(index_dir)
    stored = man.data.get("config")
    interrupted = (
        stored is not None
        and not man.stage_done("segments")
        and man.stage_done("tokenized")
        and stored.get("codec", "varint") == codec
    )
    if not stored or (not man.stage_done("segments") and not interrupted):
        raise ValueError(
            f"recode_index: {index_dir} is not a completed index"
        )
    if glob.glob(os.path.join(index_dir, "generations", "*")):
        raise ValueError(
            "recode_index: index has live generations — compact_index "
            "first (generation segments live outside the base layout)"
        )
    # stale-forward-store rail: a deletion-purge compaction rewrites
    # docmap/stats but NOT tokenized/, so recoding from tokenized/
    # would resurrect purged docs' postings against a docmap that no
    # longer holds them (review finding: decode then misattributes or
    # crashes). Parquet metadata row counts make this a cheap check.
    tok_files = glob.glob(
        os.path.join(index_dir, "tokenized", "**", "*.parquet"), recursive=True
    )
    if tok_files:
        import pyarrow.parquet as _pq

        tok_rows = sum(_pq.read_metadata(f).num_rows for f in tok_files)
        n_docs = int(man.data.get("stats", {}).get("n_docs", tok_rows))
        if tok_rows != n_docs:
            raise ValueError(
                f"recode_index: tokenized/ holds {tok_rows} docs but "
                f"stats.json records n_docs={n_docs} — the forward store "
                "is stale relative to a deletion purge; rebuild the index "
                "(build_index(resume=False)) instead of recoding"
            )
    if not interrupted and stored.get("codec", "varint") == codec:
        return man.data  # no-op
    # ``interrupted``: a previous recode to THIS codec died after the
    # manifest was patched but before the merge finished — fall through
    # and resume the rebuild (the stage drop below is then a no-op)
    # normalize stored config (json round-trip turned tuples into lists)
    kwargs = dict(stored)
    for k in ("key_cols", "meta_cols"):
        if k in kwargs and isinstance(kwargs[k], list):
            kwargs[k] = tuple(kwargs[k])
    cfg = IndexConfig(**{**kwargs, "codec": codec})
    with man._lock:
        for st in ("segments", "lexicon"):
            man.data["stages"].pop(st, None)
        man.data.pop("index_metrics", None)
        man.data["config"]["codec"] = codec
        if "stats" in man.data and man.data["stats"]:
            man.data["stats"]["codec"] = codec
        man.save()
    for sub in ("segments", "lexicon"):
        shutil.rmtree(os.path.join(index_dir, sub), ignore_errors=True)
    stats_path = os.path.join(index_dir, "stats.json")
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            st = json.load(f)
        st["codec"] = codec
        with open(stats_path + ".tmp", "w") as f:
            json.dump(st, f)
        os.replace(stats_path + ".tmp", stats_path)
    # stage 1 is marked done, so the source argument is never read;
    # stages 2-4 rebuild from tokenized/ alone
    return build_index(index_dir, index_dir, cfg, resume=True)
