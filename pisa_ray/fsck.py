"""Index integrity checker (`python -m pisa_ray fsck`).

Verifies the cross-file invariants the engine's correctness rests on,
the way an operator would after a crash, a partial copy, or a storage
incident — each check names the invariant it guards:

* **stats/manifest presence + config echo** — stats.json and
  manifest.json parse; posting_space/analyzer/codec/positions recorded.
* **segment decode** — every segment file readable with the v6 schema;
  per term-run: ``df == Σ block_count == decoded posting count``,
  ``cf == Σ decoded tf``, decoded docs strictly ascending,
  ``block_last_doc`` equals each block's actual last doc, and (when
  positions are on) the pos blob holds exactly ``cf`` varints.
* **lexicon consistency** — lexicon (term, df, cf) equals the groupby
  sum over segment runs.
* **docmap consistency** — row count equals stats.n_docs, doc_ids are
  unique, and avgdl recomputes from lengths.

Runs as one ``map_batches`` pass over segment files plus narrow
docmap aggregates — proportional work, no driver-side posting data.
Returns ``{"ok": bool, "errors": [...], "checked": {...}}``; every
error is a named invariant with a sample, never a bare traceback.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _check_segment_batch(
    batch: pa.Table, codec: str, positions: bool
) -> pa.Table:
    """Per-run invariant checks -> (term, df, cf, n_errors, sample) rows."""
    from .codec import decode_run, varint_count

    def _list_col(name):
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return (
            col.values.to_numpy(zero_copy_only=False),
            col.offsets.to_numpy(),
        )

    cnt_vals, cnt_offs = _list_col("block_count")
    doff_vals, _ = _list_col("block_doc_off")
    toff_vals, _ = _list_col("block_tf_off")
    last_vals, _ = _list_col("block_last_doc")
    doc_blobs = batch["doc_blob"].to_pylist()
    tf_blobs = batch["tf_blob"].to_pylist()
    pos_blobs = batch["pos_blob"].to_pylist() if positions else None
    terms = batch["term"].to_pylist()
    dfs = batch["df"].to_numpy(zero_copy_only=False)
    cfs = batch["cf"].to_numpy(zero_copy_only=False)

    errs: list[str] = []
    for i in range(batch.num_rows):
        sl = slice(cnt_offs[i], cnt_offs[i + 1])
        cnts = cnt_vals[sl]
        try:
            d, tf = decode_run(
                doc_blobs[i], tf_blobs[i], cnts, doff_vals[sl], toff_vals[sl],
                codec=codec,
            )
        except Exception as e:  # decoding itself must never throw
            errs.append(f"term {terms[i]!r}: decode failed ({e})")
            continue
        if d.size != int(dfs[i]) or int(cnts.sum()) != int(dfs[i]):
            errs.append(
                f"term {terms[i]!r}: df={int(dfs[i])} but decoded "
                f"{d.size} postings / block_count sum {int(cnts.sum())}"
            )
        if int(tf.sum()) != int(cfs[i]):
            errs.append(
                f"term {terms[i]!r}: cf={int(cfs[i])} but decoded tf sum "
                f"{int(tf.sum())}"
            )
        if d.size > 1 and not np.all(d[1:] > d[:-1]):
            errs.append(f"term {terms[i]!r}: decoded docs not strictly ascending")
        lasts = last_vals[cnt_offs[i]:cnt_offs[i + 1]]
        ends = np.cumsum(cnts.astype(np.int64))
        if d.size and not np.array_equal(d[ends - 1], lasts):
            errs.append(f"term {terms[i]!r}: block_last_doc mismatch")
        if positions:
            nv = varint_count(np.frombuffer(pos_blobs[i], dtype=np.uint8))
            if nv != int(cfs[i]):
                errs.append(
                    f"term {terms[i]!r}: pos blob holds {nv} varints, "
                    f"expected cf={int(cfs[i])}"
                )
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(dfs.astype(np.uint64)),
            "cf": pa.array(cfs.astype(np.uint64)),
            "errors": pa.array(
                ["\n".join(errs) if errs else ""] * 1
                + [""] * (batch.num_rows - 1)
                if batch.num_rows
                else [],
                type=pa.string(),
            ),
        }
    )


def check_index(index_dir: str, max_errors: int = 20) -> dict:
    """Run every integrity check; see module docstring."""
    import ray.data as rd

    errors: list[str] = []
    checked: dict = {}

    # ---- stats + manifest --------------------------------------------
    stats = cfg = None
    for name in ("stats.json", "manifest.json"):
        p = os.path.join(index_dir, name)
        if not os.path.exists(p):
            errors.append(f"{name} missing")
            continue
        try:
            with open(p) as f:
                data = json.load(f)
        except ValueError as e:
            errors.append(f"{name} unparseable: {e}")
            continue
        if name == "stats.json":
            stats = data
        else:
            cfg = data.get("config", {})
    if stats is None or cfg is None:
        return {"ok": False, "errors": errors, "checked": checked}
    codec = stats.get("codec", "varint")
    positions = bool(stats.get("positions", False))
    checked["codec"] = codec
    checked["positions"] = positions
    checked["posting_space"] = stats.get("posting_space", "docid")
    checked["analyzer"] = stats.get("analyzer", "simple")

    # ---- segments ----------------------------------------------------
    seg_files = sorted(
        glob.glob(os.path.join(index_dir, "segments", "**", "*.parquet"), recursive=True)
    )
    n_runs = 0
    lex_from_segs: dict[str, tuple[int, int]] = {}
    need = {
        "term", "bucket", "df", "cf", "doc_blob", "tf_blob", "pos_blob",
        "block_last_doc", "block_doc_off", "block_tf_off", "block_count",
        "block_max_wnorm", "avgdl",
    }
    for f in seg_files:
        try:
            schema_names = set(pq.read_schema(f).names)
        except Exception as e:
            errors.append(f"segment {os.path.basename(f)} unreadable: {e}")
            continue
        missing = need - schema_names
        if missing:
            errors.append(
                f"segment {os.path.basename(f)} missing columns {sorted(missing)}"
            )
    if not any(e.startswith("segment ") for e in errors) and seg_files:
        seg_ds = rd.read_parquet(seg_files)

        def run_checks(b: pa.Table) -> pa.Table:
            return _check_segment_batch(b, codec, positions)

        out = seg_ds.map_batches(
            run_checks, batch_format="pyarrow", batch_size=256
        )
        agg = out.materialize()
        n_runs = agg.count()
        for row in agg.filter(lambda r: bool(r["errors"])).take(max_errors):
            errors.extend(x for x in row["errors"].split("\n") if x)
        # lexicon sums from the same pass
        import pandas as pd

        lex_df = (
            agg.select_columns(["term", "df", "cf"])
            .to_pandas()
            .groupby("term", as_index=False)
            .sum()
        )
        lex_from_segs = {
            t: (int(d), int(c))
            for t, d, c in zip(lex_df["term"], lex_df["df"], lex_df["cf"])
        }
    checked["segment_runs"] = int(n_runs)

    # ---- lexicon -----------------------------------------------------
    lex_files = sorted(
        glob.glob(os.path.join(index_dir, "lexicon", "**", "*.parquet"), recursive=True)
    )
    if lex_files:
        lex = pa.concat_tables([pq.read_table(f) for f in lex_files])
        got = {
            t: (int(d), int(c))
            for t, d, c in zip(
                lex["term"].to_pylist(),
                lex["df"].to_numpy(zero_copy_only=False),
                lex["cf"].to_numpy(zero_copy_only=False),
            )
        }
        if lex_from_segs and got != lex_from_segs:
            only_lex = set(got) - set(lex_from_segs)
            only_seg = set(lex_from_segs) - set(got)
            diff = [
                t
                for t in set(got) & set(lex_from_segs)
                if got[t] != lex_from_segs[t]
            ]
            errors.append(
                "lexicon != segment sums: "
                f"{len(only_lex)} lexicon-only, {len(only_seg)} segment-only, "
                f"{len(diff)} value mismatches (sample: {sorted(diff)[:3]})"
            )
        checked["lexicon_terms"] = len(got)
    elif seg_files:
        errors.append("lexicon/ missing but segments exist")

    # ---- docmap ------------------------------------------------------
    dm_files = sorted(
        glob.glob(os.path.join(index_dir, "docmap", "**", "*.parquet"), recursive=True)
    ) or sorted(
        glob.glob(os.path.join(index_dir, "tokenized", "**", "*.parquet"), recursive=True)
    )
    if dm_files:
        dm = pa.concat_tables(
            [pq.read_table(f, columns=["doc_id", "length"]) for f in dm_files]
        )
        n = dm.num_rows
        checked["docmap_rows"] = n
        if n != int(stats.get("n_docs", -1)):
            errors.append(
                f"docmap rows {n} != stats.n_docs {stats.get('n_docs')}"
            )
        n_uniq = pc.count_distinct(dm["doc_id"]).as_py()
        if n_uniq != n:
            errors.append(f"docmap has {n - n_uniq} duplicate doc_ids")
        total = int(pc.sum(dm["length"]).as_py() or 0)
        if n:
            avgdl = total / n
            if abs(avgdl - float(stats.get("avgdl", -1))) > 1e-9:
                errors.append(
                    f"avgdl recomputes to {avgdl} != stats {stats.get('avgdl')}"
                )
    elif int(stats.get("n_docs", 0)) > 0:
        errors.append("docmap/tokenized missing but stats.n_docs > 0")

    return {"ok": not errors, "errors": errors[:max_errors], "checked": checked}
