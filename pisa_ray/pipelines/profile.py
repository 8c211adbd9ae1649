"""One-pass dataset profiler: every per-column statistic a corpus
intake job wants, from a SINGLE streaming scan.

At 100 TB the scan is the expensive thing — running count/min/max,
then a distinct-count job, then a quantile job, then a top-values job
means FOUR passes over the same bytes. This operator computes, per
column, in one ``map_batches`` pass over zero-copy Arrow blocks:

- ``n`` / ``nulls`` — exact counts
- ``min`` / ``max`` — exact (numeric and string)
- ``distinct`` — HyperLogLog estimate (mergeable registers,
  deterministic at any parallelism; ~1.04/sqrt(2^p) rse)
- ``quantiles`` — one-pass compactor sketch (numeric columns) with a
  per-run rank-error certificate (see ``sketch.quantile_sketch``)
- ``top_values`` — Misra-Gries-style heavy-values summary with a
  per-run max-undercount certificate (truncation deductions are
  tracked, not bounded by formula)
- ``avg_len`` — mean UTF-8 length (string columns)

Every partial is MERGEABLE (sums, elementwise max, level concat,
count-sum + truncate), so blocks reduce associatively: the driver only
ever holds one small summary per column — registers (4 KB), sketch
levels (k*log2(n/k) floats), m heavy entries — never data. This is the
same partial/combiner discipline as the index build's posting merge,
applied to profiling.

Reference analog: the corpus-stats object the reference pickles once
and reuses (n_users/n_items/dataset_size at
/root/reference/src/helpers/Reader.py:62,81-92) — generalized to a
schema-wide, sketch-backed profile.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .sketch import (
    _block_registers,
    _hash64,
    _hll_estimate,
    _qs_insert,
    _qs_merge,
    _qs_quantiles,
)

_QS_K = 256  # quantile-sketch buffer per level
_HLL_P = 12
_HH_M = 64  # heavy-values summary capacity


def _is_numeric(t) -> bool:
    return isinstance(t, pa.DataType) and (
        pa.types.is_integer(t) or pa.types.is_floating(t)
    )


def _is_stringy(t) -> bool:
    return isinstance(t, pa.DataType) and (
        pa.types.is_string(t) or pa.types.is_large_string(t)
    )


def _partial_for(columns: Sequence[str]):
    out_schema = pa.schema(
        [
            ("col", pa.string()),
            ("kind", pa.string()),
            ("f", pa.large_list(pa.float64())),
            ("i", pa.large_list(pa.int64())),
            ("s", pa.large_list(pa.string())),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        cols, kinds, fs, is_, ss = [], [], [], [], []

        def emit(col, kind, f=(), i=(), s=()):
            cols.append(col)
            kinds.append(kind)
            fs.append([float(x) for x in f])
            is_.append([int(x) for x in i])
            ss.append([str(x) for x in s])

        for name in columns:
            c = t[name].combine_chunks()
            if pa.types.is_dictionary(c.type):
                # categoricals/dictionary-read parquet: profile the
                # VALUES, not the codes (matches sketch.py's casts)
                c = c.cast(c.type.value_type)
            n = len(c)
            nn = c.drop_null()
            nulls = n - len(nn)
            emit(name, "count", i=[n, nulls])
            if len(nn) == 0:
                continue
            # the block's REAL Arrow type decides the stat family
            # (Dataset.schema() reports Python types for pandas blocks)
            numeric = _is_numeric(nn.type)
            if not numeric and not _is_stringy(nn.type):
                continue  # nested/binary: counts only
            if numeric:
                v = nn.to_numpy(zero_copy_only=False).astype(np.float64)
                emit(name, "minmax", f=[float(v.min()), float(v.max())])
                levels: list[np.ndarray] = []
                parity: list[int] = []
                _qs_insert(levels, parity, 0, v, _QS_K)
                for lvl, arr in enumerate(levels):
                    if arr.size:
                        emit(name, "qs", f=arr, i=[lvl])
                err = sum(p * (2.0 ** j) for j, p in enumerate(parity))
                if err:
                    emit(name, "qs_err", f=[err])
            else:
                # long-text guard: min/max strings are reported as
                # 128-char prefixes (a full `content` document must
                # never ride the summary rows to the driver)
                mn = pc.min_max(nn)
                emit(
                    name,
                    "minmax_s",
                    s=[mn["min"].as_py()[:128], mn["max"].as_py()[:128]],
                )
                emit(
                    name,
                    "len",
                    f=[float(pc.sum(pc.utf8_length(nn)).as_py() or 0)],
                )
            # HLL registers (nonzero only); floats hash their IEEE-754
            # bit pattern (_hash64 covers int/string columns)
            if numeric and pa.types.is_floating(nn.type):
                hashed = _hash64(
                    pa.array(
                        nn.to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                        .view(np.int64)
                    )
                )
            else:
                hashed = _hash64(nn)
            regs = _block_registers(hashed, _HLL_P)
            nz = np.flatnonzero(regs)
            emit(name, "hll", i=np.concatenate((nz, regs[nz])))
            # heavy-values summary: exact block value_counts on the
            # NATIVE type (only the <= m kept values are stringified),
            # truncated to the top m with the (m+1)th count deducted
            # (SpaceSaving-style); the deduction is the summary's
            # undercount bound. Long-text guard: a free-text column
            # (block mean length > 256) has no meaningful "top values"
            # and its summary would ship m full documents per block —
            # emit an explicit skip marker so the driver drops
            # top_values for the WHOLE column (a partial summary would
            # silently break the count_error certificate).
            if not numeric:
                mean_len = pc.mean(pc.utf8_length(nn)).as_py() or 0.0
                if mean_len > 256:
                    emit(name, "hh_skip")
                    continue
            vc = pc.value_counts(nn)
            vals = vc.field("values")
            cnts = vc.field("counts").to_numpy(zero_copy_only=False)
            if cnts.size > _HH_M:
                order = np.argsort(-cnts, kind="stable")
                cut = int(cnts[order[_HH_M]])
                keep = order[:_HH_M]
                pos = keep[cnts[keep] - cut > 0]
                kept_vals = pc.cast(vals.take(pa.array(pos)), pa.string())
                emit(
                    name,
                    "hh",
                    i=np.concatenate(((cnts[pos] - cut), [cut])),
                    s=kept_vals.to_pylist() + [""],
                )
            else:
                emit(
                    name,
                    "hh",
                    i=np.concatenate((cnts, [0])),
                    s=pc.cast(vals, pa.string()).to_pylist() + [""],
                )
        return pa.table(
            {
                "col": pa.array(cols, type=pa.string()),
                "kind": pa.array(kinds, type=pa.string()),
                "f": pa.array(fs, type=pa.large_list(pa.float64())),
                "i": pa.array(is_, type=pa.large_list(pa.int64())),
                "s": pa.array(ss, type=pa.large_list(pa.string())),
            },
            schema=out_schema,
        )

    return partial


def profile(
    ds: rd.Dataset,
    columns: Sequence[str] | None = None,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    top_k: int = 10,
) -> dict[str, dict]:
    """Profile ``columns`` (default: all) in ONE streaming pass; see
    module docstring for the stat set and merge discipline. ``top_k``
    heavy values (<= the summary capacity 64) are returned with
    APPROXIMATE counts and a ``count_error`` certificate: each true
    count is in [count, count + count_error]."""
    schema = ds.schema()
    names = list(schema.names)
    if columns is None:
        columns = names  # non-scalar columns degrade to counts-only
    if top_k > _HH_M:
        raise ValueError(f"profile: top_k must be <= {_HH_M}, got {top_k}")
    bad = [c for c in columns if c not in names]
    if bad:
        raise KeyError(f"profile: unknown columns {bad}")

    rows = ds.map_batches(
        _partial_for(columns), batch_format="pyarrow", batch_size=None
    ).to_pandas()  # whole blocks: one summary set per block per column

    out: dict[str, dict] = {}
    for name in columns:
        r = rows[rows["col"] == name]
        # the stat family each block emitted (real Arrow types)
        numeric = (r["kind"] == "minmax").any()
        stringy = (r["kind"] == "minmax_s").any()
        stat: dict = {"n": 0, "nulls": 0}
        # exact counters
        for iv in r[r["kind"] == "count"]["i"]:
            stat["n"] += int(iv[0])
            stat["nulls"] += int(iv[1])
        present = stat["n"] - stat["nulls"]
        if present == 0:
            out[name] = stat
            continue
        if numeric:
            mm = np.asarray(
                [fv for fv in r[r["kind"] == "minmax"]["f"]], dtype=np.float64
            )
            stat["min"], stat["max"] = float(mm[:, 0].min()), float(mm[:, 1].max())
        elif stringy:
            mins = [sv[0] for sv in r[r["kind"] == "minmax_s"]["s"]]
            maxs = [sv[1] for sv in r[r["kind"] == "minmax_s"]["s"]]
            stat["min"], stat["max"] = min(mins), max(maxs)
            tot_len = sum(float(fv[0]) for fv in r[r["kind"] == "len"]["f"])
            stat["avg_len"] = tot_len / present
        else:
            out[name] = stat  # nested/binary column: counts only
            continue
        # HLL max-merge (estimator shared with sketch.hll_distinct)
        m = 1 << _HLL_P
        regs = np.zeros(m, dtype=np.float64)
        for iv in r[r["kind"] == "hll"]["i"]:
            half = len(iv) // 2
            idx = np.asarray(iv[:half], dtype=np.int64)
            np.maximum.at(regs, idx, np.asarray(iv[half:], dtype=np.float64))
        stat["distinct"] = _hll_estimate(regs)
        # quantile-sketch merge (numeric only; shared with
        # sketch.quantile_sketch — level -1 rows carry block errors)
        if numeric:
            by_level: dict[int, list[np.ndarray]] = {
                -1: [
                    np.asarray([float(fv[0])])
                    for fv in r[r["kind"] == "qs_err"]["f"]
                ]
            }
            if not by_level[-1]:
                del by_level[-1]
            for fv, iv in zip(r[r["kind"] == "qs"]["f"], r[r["kind"] == "qs"]["i"]):
                by_level.setdefault(int(iv[0]), []).append(
                    np.asarray(fv, dtype=np.float64)
                )
            levels, err = _qs_merge(by_level, _QS_K)
            stat["quantiles"], _nw = _qs_quantiles(levels, quantiles)
            stat["quantile_rank_error"] = err / present
        # heavy-values merge: sum partial counts, then one final
        # truncation to capacity; certificate = per-block deductions +
        # final cut. If ANY block skipped its summary (long-text guard)
        # the certificate cannot hold — top_values is then absent for
        # the whole column rather than silently wrong.
        if (r["kind"] == "hh_skip").any() or not (r["kind"] == "hh").any():
            out[name] = stat
            continue
        agg: dict[str, int] = {}
        deducted = 0
        for iv, sv in zip(r[r["kind"] == "hh"]["i"], r[r["kind"] == "hh"]["s"]):
            deducted += int(iv[-1])
            for val, cnt in zip(sv[:-1], iv[:-1]):
                agg[val] = agg.get(val, 0) + int(cnt)
        items = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        if len(items) > _HH_M:
            cut = items[_HH_M][1]
            deducted += cut
            items = [(v, c - cut) for v, c in items[:_HH_M] if c - cut > 0]
        stat["top_values"] = [
            {"value": v, "count": c} for v, c in items[:top_k]
        ]
        stat["count_error"] = int(deducted)
        out[name] = stat
    return out
