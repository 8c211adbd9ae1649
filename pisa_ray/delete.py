"""Document deletion: append-only tombstones + purge at compaction.

Log-structured engines never rewrite segments in place: a delete
appends a tombstone set, readers mask tombstoned docs at query time,
and a later ``compact_index()`` physically drops them. The reference's
analog is the exclusion mask over already-seen items at evaluation
time (/root/reference/src/Inference.py:233-238) — candidates are
removed without touching the trained state; here the "state" is the
encoded posting blobs.

Contract (tested in tests/test_delete.py):

- **Masked phase** (after ``delete_docs`` / ``delete_where``, before
  compaction): query results never contain a deleted doc, but BM25
  global stats (N, avgdl, df) remain those of the build — scores are
  bit-identical to querying the full index with an exclusion
  ``doc_mask`` over the same docs. This is exactly Lucene's
  "deleted docs still count toward stats until merge" behavior, and it
  keeps deletes O(|deleted ids|): no segment is touched.
- **After ``compact_index()``**: tombstoned docs are dropped from the
  decoded posting stream, the docmap is filtered, N/avgdl/df are
  recomputed over the survivors, and the tombstone files are removed —
  results are then bit-identical to a fresh build over the surviving
  corpus (docIDs are content-hash-derived, so they don't shift).

Visibility: tombstones are loaded at ``IndexReader`` construction.
``query_index``'s driver-side broadcast cache keys on the tombstone
file set, so the next call after a delete reloads; a LIVE
``serve.BM25Service`` keeps serving its loaded view until
reconstructed — the point-in-time reader semantics every
log-structured engine has (reopen to observe deletes).

Scale shape: a tombstone file is a narrow uint64 column; readers apply
it as one vectorized ``searchsorted`` against their (shard-local)
docmap at load. Nothing per-query, nothing per-posting. At 10^12 docs
a GDPR-sized delete batch (millions of ids) is a few MB broadcast once
per actor load, while the purge rides the compaction the engine
already owes after incremental appends.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TOMB_DIR = "tombstones"


def _tomb_dir(index_dir: str) -> str:
    return os.path.join(index_dir, TOMB_DIR)


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique engine-space doc_ids of every tombstone file
    (empty array when none exist)."""
    files = sorted(glob.glob(os.path.join(_tomb_dir(index_dir), "*.parquet")))
    if not files:
        return np.empty(0, dtype=np.uint64)
    parts = [
        pq.read_table(f, columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
        .astype(np.uint64)
        for f in files
    ]
    return np.unique(np.concatenate(parts))


def _write_tombstone(index_dir: str, ids: np.ndarray) -> int:
    """Append one tombstone file; returns the number of NEW ids (ids
    already tombstoned are not double-counted)."""
    from .shuffle import sorted_isin

    ids = np.unique(np.asarray(ids, dtype=np.uint64))
    existing = load_tombstones(index_dir)
    if existing.size:
        ids = ids[~sorted_isin(existing, ids)]
    if ids.size == 0:
        return 0
    d = _tomb_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    # Unique name per writer: a glob-count name lets two concurrent
    # delete jobs pick the same file and silently drop one batch (the
    # reader unions ALL files, so names only need to not collide;
    # ordering is irrelevant because tombstones are a set).
    n = len(glob.glob(os.path.join(d, "*.parquet")))
    suffix = f"{os.getpid():x}_{uuid.uuid4().hex[:8]}"
    name = f"del_{n:06d}_{suffix}.parquet"
    tmp = os.path.join(d, f".{name}.tmp")
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.uint64())}), tmp)
    os.replace(tmp, os.path.join(d, name))
    return int(ids.size)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone the given docs. ``doc_ids`` are in the USER id space:
    original int64 keys for an ``id_col`` index (``id_mode == "int"``,
    mapped through the same splitmix64 bijection the build uses), raw
    engine uint64 ids for a key-column index. Returns the number of
    newly tombstoned ids. Ids not present in the index are recorded
    too (idempotent-delete semantics). Note a tombstoned id cannot be
    re-added while its tombstone is live: the id is still in the
    docmap, so ``build_incremental``'s cross-generation duplicate
    guard rejects the delta; re-adding becomes possible only after
    ``compact_index`` purges both the doc and its tombstone. This is
    what keeps docmap ids unique, which the purge accounting relies
    on."""
    with open(os.path.join(index_dir, "stats.json")) as f:
        id_mode = json.load(f).get("id_mode", "keys")
    # build the array with an EXPLICIT dtype: np.asarray over a python
    # list mixing ids below and above 2^63 infers float64 and silently
    # rounds the ids (tombstones then miss their docs — found by the
    # term-sharded delete test); int64/uint64 construction from python
    # ints is exact and overflow-checked
    if isinstance(doc_ids, np.ndarray) and doc_ids.dtype.kind in "iu":
        arr = doc_ids
    else:
        arr = np.array(
            list(doc_ids),
            dtype=np.int64 if id_mode == "int" else np.uint64,
        )
    if arr.size == 0:
        return 0
    if id_mode == "int":
        from .docids import splitmix64

        eng = splitmix64(arr.astype(np.int64).view(np.uint64))
    else:
        eng = arr.astype(np.uint64)
    return _write_tombstone(index_dir, eng)


def delete_where(index_dir: str, col: str, value) -> int:
    """Tombstone every doc whose docmap metadata column equals
    ``value`` (e.g. ``delete_where(d, "repo", "org/leaky-repo")``) —
    the predicate runs over the docmap/tokenized parquet with column
    pruning, never over postings. A string ``value`` against a
    non-string column (the CLI surface) is cast to the column type.
    Returns newly tombstoned count."""
    dm_files = sorted(
        glob.glob(os.path.join(index_dir, "docmap", "**", "*.parquet"), recursive=True)
    ) or sorted(
        glob.glob(os.path.join(index_dir, "tokenized", "**", "*.parquet"), recursive=True)
    )
    hits = []
    val_scalar = None
    for f in dm_files:
        t = pq.read_table(f, columns=["doc_id", col])
        if val_scalar is None:
            ftype = t.schema.field(col).type
            try:
                val_scalar = pc.cast(pa.scalar(value), ftype)
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError) as e:
                raise ValueError(
                    f"delete_where: cannot compare {value!r} against "
                    f"column {col!r} of type {ftype}"
                ) from e
        keep = pc.fill_null(pc.equal(t[col], val_scalar), False)
        ids = t.filter(keep)["doc_id"].to_numpy(zero_copy_only=False)
        if ids.size:
            hits.append(ids.astype(np.uint64))
    if not hits:
        return 0
    return _write_tombstone(index_dir, np.concatenate(hits))


def clear_tombstones(index_dir: str, files: list[str] | None = None) -> None:
    """Remove tombstone files (called by compact_index after the purge
    lands). ``files`` restricts removal to the snapshot the compaction
    actually purged — a ``delete_docs`` landing MID-compaction writes a
    new file that must survive (it was neither masked into the
    compaction's reader nor purged)."""
    import shutil

    if files is None:
        shutil.rmtree(_tomb_dir(index_dir), ignore_errors=True)
        return
    for f in files:
        try:
            os.remove(f)
        except FileNotFoundError:
            pass
    try:
        os.rmdir(_tomb_dir(index_dir))  # only if now empty
    except OSError:
        pass
