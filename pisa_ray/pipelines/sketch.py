"""Mergeable sketches: HyperLogLog distinct counting, exact heavy
hitters via a two-pass threshold summary.

At 100 TB an exact ``ds.unique()`` / ``count_distinct`` is an
all-to-all shuffle of every distinct value; a cardinality estimate is
usually what the pipeline actually needs (vocabulary growth, dedup-
rate monitoring, per-source distinct users). HyperLogLog (Flajolet et
al. 2007; public algorithm) gives ~1.04/sqrt(2^p) relative error from
2^p one-byte registers.

Distributed shape: one vectorized pass per block computes the block's
register array (2^p bytes); blocks reduce by ELEMENTWISE MAX — an
associative, commutative, idempotent merge, so the result is exactly
deterministic at any parallelism/block layout (the estimate has
sketch error, but the same bytes come out of every layout). The merge
runs as (register, val) rows through ``groupby(register).max`` —
O(#blocks * 2^p) small rows, never a value shuffle; the driver only
ever holds one 2^p register array.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# splitmix64 finalizer — the repo's standard 64-bit mixer
_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic 64-bit hash of any column: integers mix directly;
    string/binary content hashes in ONE vectorized pass — each byte is
    mixed with its in-string position, then XOR-segmented per string
    with ``np.bitwise_xor.reduceat`` (total work O(bytes), no
    per-byte-POSITION interpreter loop like the strictly-sequential
    FNV, which is ~60x slower on multi-KB documents). Position mixing
    makes permuted/shifted contents hash differently; the final mix
    folds in the length."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        # categorical parquet columns arrive dictionary-encoded; decode
        # before dispatch (heavy_hitters does the same — review finding:
        # the cast below raised ArrowInvalid for dict<int>)
        col = col.dictionary_decode()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    if pa.types.is_integer(col.type) or pa.types.is_boolean(col.type):
        return _mix(
            col.cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
    if not (
        pa.types.is_string(col.type)
        or pa.types.is_large_string(col.type)
        or pa.types.is_binary(col.type)
        or pa.types.is_large_binary(col.type)
    ):
        raise TypeError(
            f"_hash64: unsupported column type {col.type} — hashable "
            "columns are integer/boolean/string/binary (cast floats or "
            "timestamps to one of those explicitly first)"
        )
    s = col.cast(pa.large_binary())
    n = len(s)
    offs = np.frombuffer(s.buffers()[1], dtype=np.int64)[
        s.offset : s.offset + n + 1
    ]
    lens = np.diff(offs).view(np.uint64)
    h = np.full(n, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    starts = (offs[:-1] - offs[0]).astype(np.int64)
    nz = np.flatnonzero(lens)
    if nz.size:
        data = np.frombuffer(s.buffers()[2], dtype=np.uint8)[
            offs[0] : offs[-1]
        ].astype(np.uint64)
        reps = lens[nz].astype(np.int64)
        pos = np.arange(data.size, dtype=np.uint64)
        pos -= starts[nz].astype(np.uint64).repeat(reps)
        with np.errstate(over="ignore"):
            elem = _mix(data * _C1 ^ (pos + np.uint64(1)) * _C2)
        # zero-length strings are excluded from the reduceat index
        # list, so each segment spans exactly one nonzero string
        h[nz] = np.bitwise_xor.reduceat(elem, starts[nz])
    with np.errstate(over="ignore"):
        return _mix(h ^ lens * _C1)


def _mix(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * _C1
        h = (h ^ (h >> np.uint64(27))) * _C2
        return h ^ (h >> np.uint64(31))


def _reg_rank(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-hash (register index, leading-zero rank) pairs.

    rank = position of the first 1 bit of the low 64-p bits (left-
    aligned), in 1..64-p+1 — exact vectorized count-leading-zeros
    (6 shift/compare passes; float log2 would mis-round just below
    powers of two)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining bits, left-aligned
    nbits = 64 - p
    rank = np.full(h.size, nbits + 1, dtype=np.uint8)
    nz = w != 0
    ww = w[nz]
    clz = np.zeros(ww.size, dtype=np.uint64)
    for sh in (32, 16, 8, 4, 2, 1):
        small = ww < (np.uint64(1) << np.uint64(64 - sh))
        clz[small] += np.uint64(sh)
        with np.errstate(over="ignore"):
            ww = np.where(small, ww << np.uint64(sh), ww)
    rank[nz] = (clz + np.uint64(1)).astype(np.uint8)
    return idx, rank


def _block_registers(h: np.ndarray, p: int) -> np.ndarray:
    """2^p register maxima of (leading-zero rank of the low 64-p bits)."""
    m = 1 << p
    idx, rank = _reg_rank(h, p)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Register array -> cardinality estimate (raw HLL + small-range
    linear-counting correction). Shared by hll_distinct and profile."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.sum(regs == 0))
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(raw)


def hll_registers(ds: rd.Dataset, col: str, p: int = 12):
    """Merged nonzero HyperLogLog registers of ``col`` as a pandas
    frame ``(reg, val)`` — the sketch's full state, PURE INTEGER, so a
    SQL oracle can replay it exactly (splitmix64 is three mod-2^64
    multiply/xor/shift rounds; the ``distinct_hll`` driver entry does
    exactly that in DuckDB HUGEINT arithmetic). Deterministic at any
    parallelism: registers merge by elementwise max.
    """
    if not 4 <= p <= 18:
        # outside the standard HLL precision range the register shifts
        # (64-p / p bits) silently go undefined for numpy uint64
        raise ValueError(f"hll_registers: p must be in [4, 18], got {p}")

    def partial(t: pa.Table) -> pa.Table:
        # SQL count(distinct) ignores NULLs; hashing them would conflate
        # NULL with '' (strings) or feed NaN→uint64 (ints, undefined)
        c = t[col].combine_chunks().drop_null()
        if len(c) == 0:
            return pa.table(
                {"reg": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
            )
        regs = _block_registers(_hash64(c), p)
        nz = np.flatnonzero(regs)
        return pa.table(
            {"reg": nz.astype(np.int64), "val": regs[nz].astype(np.int64)}
        )

    def reg_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"reg": pa.array([], pa.int64()), "val": pa.array([], pa.int64())}
            )
        from ..shuffle import run_starts

        r = t["reg"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["val"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(r, kind="stable")
        rs, vs = r[order], v[order]
        idx = np.flatnonzero(run_starts(rs))
        seg = np.concatenate((idx, [rs.size]))
        return pa.table(
            {
                "reg": pa.array(rs[idx]),
                "val": pa.array(np.maximum.reduceat(vs, seg[:-1])),
            }
        )

    from ..shuffle import hash_group_apply

    merged = hash_group_apply(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        "reg",
        reg_reduce,
    ).to_pandas()
    return merged.sort_values("reg").reset_index(drop=True).astype(
        {"reg": "int64", "val": "int64"}
    )


def hll_distinct(ds: rd.Dataset, col: str, p: int = 12) -> dict:
    """HyperLogLog estimate of ``count_distinct(col)``.

    Returns ``{"estimate": float, "p": p, "registers_nonzero": int}``.
    Relative standard error ~= 1.04 / sqrt(2^p) (p=12 -> ~1.6%).
    Deterministic for a fixed input at any parallelism (max-merge).
    """
    m = 1 << p
    merged = hll_registers(ds, col, p)
    regs = np.zeros(m, dtype=np.float64)
    regs[merged["reg"].to_numpy()] = merged["val"].to_numpy()
    return {
        "estimate": _hll_estimate(regs),
        "p": p,
        "registers_nonzero": int(np.sum(regs > 0)),
    }


def _value_counts(c: pa.Array) -> tuple[pa.Array, np.ndarray]:
    vc = pc.value_counts(c)
    return vc.field("values"), vc.field("counts").to_numpy(zero_copy_only=False)


def heavy_hitters(
    ds: rd.Dataset,
    col: str,
    k: int,
    summary_size: int | None = None,
    fallback: bool = True,
) -> pa.Table:
    """EXACT global top-``k`` most frequent values of ``col`` (count
    desc, value asc tie-break) without shuffling the full value
    distribution — the TPUT-style two-pass threshold algorithm
    (Fagin et al. / Cao & Wang 2004; public).

    Pass 1 (candidate discovery): each block keeps only its top-``m``
    exact value counts (``m = summary_size``, default ``max(64, 8k)``)
    plus its truncation threshold ``thr_b`` = the (m+1)-th count; one
    narrow exchange sums the retained counts per value, and each
    reducer ships its top-``m`` survivors, its own truncation cutoff
    and the threshold mass to the driver — O(n_red * m) rows total,
    never the value distribution. For any value, true count <=
    retained sum + T where T = sum_b thr_b, so with ``kth`` = the k-th
    largest retained sum, the true top-k (including k-th-place ties)
    provably all sit inside ``candidates = {v : lower_v + T >= kth}``
    as long as ``max_r(cutoff_r) + T < kth``.

    Pass 2: the candidate set (small) broadcasts once via ``ray.put``;
    each block recounts ONLY candidate rows (``pc.is_in`` + value
    counts) and a second narrow exchange sums them — exact counts,
    exact top-k.

    When the guard fails (near-uniform data or ``summary_size`` too
    small for the skew) the result would not be provably exact, so the
    operator loudly falls back to a full exact count exchange
    (per-reducer top-k, still one shuffle) — or raises if
    ``fallback=False``. At 100 TB the summary pass moves O(blocks * m)
    rows instead of O(distinct values); the data itself is read twice
    but never shuffled.
    """
    if k < 1:
        raise ValueError(f"heavy_hitters: k must be >= 1, got {k}")
    m = summary_size if summary_size is not None else max(64, 8 * k)
    if m < k:
        raise ValueError(f"heavy_hitters: summary_size {m} < k {k}")

    from ..shuffle import hash_group_apply

    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if hasattr(base, "field"):
        vtype = base.field(col).type
        if pa.types.is_dictionary(vtype):
            vtype = vtype.value_type
    else:  # pandas-block schema: names/types only
        d = np.dtype(base.types[list(base.names).index(col)])
        # object columns surface as str after the exchange's
        # Table.from_pandas conversion
        vtype = pa.string() if d == np.dtype(object) else pa.from_numpy_dtype(d)
    out_schema = pa.schema([("value", vtype), ("cnt", pa.int64())])
    sum_schema = pa.schema(
        [("value", vtype), ("cnt", pa.int64()), ("kind", pa.int8())]
    )
    placeholder = "" if (
        pa.types.is_string(vtype)
        or pa.types.is_large_string(vtype)
        or pa.types.is_binary(vtype)
        or pa.types.is_large_binary(vtype)
    ) else 0

    def _col(t: pa.Table) -> pa.Array:
        c = t[col].combine_chunks().drop_null()
        if pa.types.is_dictionary(c.type):
            c = c.cast(c.type.value_type)
        return c

    def summarize(t: pa.Table) -> pa.Table:
        c = _col(t)
        if len(c) == 0:
            return sum_schema.empty_table()
        values, counts = _value_counts(c)
        thr = 0
        if counts.size > m:
            part = np.argpartition(counts, -m)
            # (m+1)-th largest = max of the dropped (unordered) region
            thr = int(counts[part[: counts.size - m]].max())
            keep = part[-m:]
            values, counts = values.take(pa.array(keep)), counts[keep]
        tbl = pa.table(
            {
                "value": values,
                "cnt": pa.array(counts.astype(np.int64)),
                "kind": pa.array(np.zeros(len(values), dtype=np.int8)),
            },
            schema=sum_schema,
        )
        if thr:
            tbl = pa.concat_tables(
                [
                    tbl,
                    pa.table(
                        {
                            "value": pa.array([placeholder], vtype),
                            "cnt": pa.array([thr], pa.int64()),
                            "kind": pa.array([1], pa.int8()),
                        },
                        schema=sum_schema,
                    ),
                ]
            )
        return tbl

    def merge_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sum_schema.empty_table()
        kind = t["kind"].combine_chunks().to_numpy(zero_copy_only=False)
        cnt = t["cnt"].combine_chunks().to_numpy(zero_copy_only=False)
        out = []
        thr_sum = int(cnt[kind == 1].sum())
        if thr_sum:
            out.append((placeholder, thr_sum, 1))
        vrows = t.filter(pa.array(kind == 0))
        if vrows.num_rows:
            df = vrows.select(["value", "cnt"]).to_pandas()
            g = df.groupby("value", sort=False)["cnt"].sum()
            lows = g.to_numpy()
            vals = g.index.to_numpy()
            if lows.size > m:
                part = np.argpartition(lows, -m)
                cutoff = int(lows[part[: lows.size - m]].max())
                keep = part[-m:]
                vals, lows = vals[keep], lows[keep]
                out.append((placeholder, cutoff, 2))
            vt = pa.table(
                {
                    "value": pa.array(vals, vtype),
                    "cnt": pa.array(lows.astype(np.int64)),
                    "kind": pa.array(np.zeros(vals.size, dtype=np.int8)),
                },
                schema=sum_schema,
            )
        else:
            vt = sum_schema.empty_table()
        if out:
            ov, oc, okind = zip(*out)
            vt = pa.concat_tables(
                [
                    vt,
                    pa.table(
                        {
                            "value": pa.array(list(ov), vtype),
                            "cnt": pa.array(list(oc), pa.int64()),
                            "kind": pa.array(list(okind), pa.int8()),
                        },
                        schema=sum_schema,
                    ),
                ]
            )
        return vt

    summary = hash_group_apply(
        ds, "value", merge_summary, map_fn=summarize
    ).to_pandas()
    if summary.empty:
        return out_schema.empty_table()
    kinds = summary["kind"].to_numpy()
    T = int(summary.loc[kinds == 1, "cnt"].sum())
    cutoff_max = int(summary.loc[kinds == 2, "cnt"].max()) if (kinds == 2).any() else 0
    vals_df = summary.loc[kinds == 0, ["value", "cnt"]]
    if vals_df.empty:
        return out_schema.empty_table()
    lowers = np.sort(vals_df["cnt"].to_numpy())[::-1]
    kth = int(lowers[min(k, lowers.size) - 1])

    if cutoff_max + T >= kth:
        # the summary cannot PROVE the candidate set contains the true
        # top-k (too little skew for this summary_size) — exact path
        if not fallback:
            raise ValueError(
                "heavy_hitters: exactness guard failed "
                f"(cutoff_max {cutoff_max} + T {T} >= kth lower bound "
                f"{kth}); raise summary_size or allow fallback"
            )

        def full_counts(t: pa.Table) -> pa.Table:
            c = _col(t)
            if len(c) == 0:
                return out_schema.empty_table()
            values, counts = _value_counts(c)
            return pa.table(
                {"value": values, "cnt": pa.array(counts.astype(np.int64))},
                schema=out_schema,
            )

        def reduce_topk(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            df = t.to_pandas().groupby("value", sort=False, as_index=False)["cnt"].sum()
            df = df.sort_values(
                ["cnt", "value"], ascending=[False, True], kind="stable"
            ).head(k)
            return pa.Table.from_pandas(df, schema=out_schema, preserve_index=False)

        cand_df = (
            hash_group_apply(ds, "value", reduce_topk, map_fn=full_counts)
            .to_pandas()
        )
    else:
        cand_vals = vals_df.loc[
            vals_df["cnt"].to_numpy() + T >= kth, "value"
        ].to_numpy()
        cand_ref = ray.put(pa.array(cand_vals, vtype))

        def recount(t: pa.Table) -> pa.Table:
            c = _col(t)
            if len(c) == 0:
                return out_schema.empty_table()
            f = c.filter(pc.is_in(c, value_set=ray.get(cand_ref)))
            if len(f) == 0:
                return out_schema.empty_table()
            values, counts = _value_counts(f)
            return pa.table(
                {"value": values, "cnt": pa.array(counts.astype(np.int64))},
                schema=out_schema,
            )

        def sum_counts(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            df = t.to_pandas().groupby("value", sort=False, as_index=False)["cnt"].sum()
            return pa.Table.from_pandas(df, schema=out_schema, preserve_index=False)

        cand_df = (
            hash_group_apply(ds, "value", sum_counts, map_fn=recount).to_pandas()
        )
    top = cand_df.sort_values(
        ["cnt", "value"], ascending=[False, True], kind="stable"
    ).head(k)
    return pa.Table.from_pandas(top, schema=out_schema, preserve_index=False)


# --------------------------------------------------------------------------
# one-pass mergeable quantile sketch (KLL/MRL compactor stack)
# --------------------------------------------------------------------------


def _qs_insert(levels: list[np.ndarray], parity: list[int], lvl: int,
               vals: np.ndarray, k: int) -> None:
    """Add ``vals`` at ``lvl`` and compact upward: any level holding
    more than ``k`` values is sorted and halved (keep every other
    element, alternating the start offset per level — the
    deterministic-offset variant of MRL'98/KLL compaction), survivors
    carry weight 2^(level+1) one level up. All numpy; no per-value
    Python work."""
    while len(levels) <= lvl:
        levels.append(np.empty(0, dtype=np.float64))
        parity.append(0)
    levels[lvl] = np.concatenate((levels[lvl], vals))
    i = lvl
    while i < len(levels) and levels[i].size > k:
        v = np.sort(levels[i], kind="stable")
        off = parity[i] & 1
        parity[i] += 1
        # odd-sized buffers: the unpaired element stays at this level
        # (keeps total weight exact — sum(2^i * len) == n always)
        if v.size % 2 == 1:
            if off == 0:
                keep_here = v[-1:]
                v = v[:-1]
            else:
                keep_here = v[:1]
                v = v[1:]
        else:
            keep_here = np.empty(0, dtype=np.float64)
        levels[i] = keep_here
        promoted = v[off::2]
        if len(levels) <= i + 1:
            levels.append(np.empty(0, dtype=np.float64))
            parity.append(0)
        levels[i + 1] = np.concatenate((levels[i + 1], promoted))
        i += 1


def _qs_merge(
    by_level: dict[int, list[np.ndarray]], k: int
) -> tuple[list[np.ndarray], float]:
    """Driver-side compactor merge: fold per-level partial arrays
    bottom-up (level -1 entries carry the blocks' own weighted
    compaction errors) -> (levels, total weighted compaction error).
    Shared by quantile_sketch and profile."""
    levels: list[np.ndarray] = []
    parity: list[int] = []
    block_errs = 0.0
    if -1 in by_level:
        block_errs = float(sum(a.sum() for a in by_level.pop(-1)))
    for lvl in sorted(by_level):
        _qs_insert(levels, parity, lvl, np.concatenate(by_level[lvl]), k)
    # certificate: one compaction of level i shifts any weighted rank
    # by at most the level weight 2^i
    err = block_errs + sum(p * (2.0 ** i) for i, p in enumerate(parity))
    return levels, err


def _qs_quantiles(
    levels: list[np.ndarray], qs: Sequence[float]
) -> tuple[dict[float, float], int]:
    """Weighted discrete quantiles (rank rule floor((n-1)q), matching
    relational.quantile_disc) over merged compactor levels -> (values
    by q, total weight n)."""
    vals = np.concatenate([a for a in levels if a.size])
    w = np.concatenate(
        [np.full(a.size, 2.0 ** i) for i, a in enumerate(levels) if a.size]
    )
    order = np.argsort(vals, kind="stable")
    vals, w = vals[order], w[order]
    cw = np.cumsum(w)
    n = int(round(cw[-1]))
    out = {}
    for q in qs:
        target = int(np.floor((n - 1) * float(q))) + 1  # 1-based weighted rank
        idx = int(np.searchsorted(cw, target, side="left"))
        out[float(q)] = float(vals[min(idx, vals.size - 1)])
    return out, n


def quantile_sketch(
    ds: rd.Dataset, col: str, qs: Sequence[float], k: int = 512
) -> dict:
    """Approximate discrete quantiles in ONE streaming pass via a
    mergeable compactor-stack sketch (Manku-Rajagopalan-Lindsay 1998 /
    Karnin-Lang-Liberty 2016 family, deterministic alternating-offset
    compaction; public algorithms, no code consulted).

    Returns ``{"quantiles": {q: value}, "n": int, "eps_bound": float}``
    where each value's WEIGHTED RANK is within ``eps_bound * n`` of the
    exact target rank ``floor((n-1) * q)`` (the same rank rule as the
    exact ``relational.quantile_disc``; every returned value is a real
    element of the column). NULLs are ignored (SQL aggregate
    semantics).

    vs ``quantile_disc``: that one is EXACT but needs four streaming
    passes; this is one pass with ~k*log2(n/k) resident floats — the
    right tool inside a single-pass profiling job (e.g. alongside
    ``hll_distinct`` over the same scan) or when the input is a
    non-replayable stream. Worst-case rank error of the deterministic
    offset scheme is bounded by sum_i (#compactions at level i) * 2^i
    <= 2*H*n/k with H = log2(n/k) compacting levels; ``eps_bound``
    reports that sum computed from the ACTUAL compaction counts, so
    callers get a certificate, not a formula.

    Distributed shape: one ``map_batches`` pass emits each block's
    compacted levels as narrow (level, values) rows — k*log2(B/k)
    floats per block, never the column; the driver merges level-wise
    (multiset-canonical: each level is re-sorted before halving, so
    the result is independent of partial arrival ORDER, though like
    every compactor sketch the estimate depends on the block layout;
    the ERROR BOUND holds at any parallelism). Mergeability is what
    makes it a 100-TB operator: partials fold associatively, so a
    256-node fleet produces the same size sketch as one node.
    """
    if not qs:
        raise ValueError("quantile_sketch: no quantiles requested")
    if k < 8:
        raise ValueError(f"quantile_sketch: k must be >= 8, got {k}")

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks().drop_null()
        out_schema = pa.schema(
            [("level", pa.int32()), ("vals", pa.large_list(pa.float64()))]
        )
        if len(c) == 0:
            return out_schema.empty_table()
        v = c.to_numpy(zero_copy_only=False).astype(np.float64)
        levels: list[np.ndarray] = []
        parity: list[int] = []
        _qs_insert(levels, parity, 0, v, k)
        lv = [i for i, arr in enumerate(levels) if arr.size]
        out_lv = [np.asarray(lv, dtype=np.int32)]
        out_vals = [levels[i].tolist() for i in lv]
        # level -1 row: this block's weighted compaction count, so the
        # driver's error certificate covers in-block compactions too
        block_err = sum(p * (2.0 ** i) for i, p in enumerate(parity))
        if block_err:
            out_lv.append(np.asarray([-1], dtype=np.int32))
            out_vals.append([block_err])
        return pa.table(
            {
                "level": pa.array(np.concatenate(out_lv)),
                "vals": pa.array(out_vals, type=pa.large_list(pa.float64())),
            },
            schema=out_schema,
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()  # whole blocks: fewer partials -> fewer compactions
    if rows.empty:  # empty/all-null input: no partial emitted any row
        return {"quantiles": {float(q): None for q in qs}, "n": 0, "eps_bound": 0.0}
    # driver merge: concatenate per level (order-canonical — compaction
    # sorts), then compact bottom-up with fresh parity counters
    by_level: dict[int, list[np.ndarray]] = {}
    for lvl, vals in zip(rows["level"], rows["vals"]):
        by_level.setdefault(int(lvl), []).append(np.asarray(vals, dtype=np.float64))
    levels, compactions_weighted = _qs_merge(by_level, k)
    if not any(arr.size for arr in levels):
        return {"quantiles": {float(q): None for q in qs}, "n": 0, "eps_bound": 0.0}
    out, n = _qs_quantiles(levels, qs)
    return {
        "quantiles": out,
        "n": n,
        "eps_bound": float(compactions_weighted) / n if n else 0.0,
    }


def grouped_quantile_sketch(
    ds: rd.Dataset,
    key_col: str,
    col: str,
    qs: Sequence[float],
    k: int = 256,
) -> "pd.DataFrame":
    """Per-group approximate discrete quantiles in ONE streaming pass —
    e.g. per-source document-length distributions across a training
    mixture. Same compactor-stack sketch, certificate and rank rule as
    :func:`quantile_sketch`, evaluated independently per key.

    Shape: the scan emits each block's per-group compacted levels as
    narrow (key, level, vals) rows; ONE hash exchange groups them by
    key and each reducer merges its keys' sketches vectorized-per-key
    (``_qs_merge`` + ``_qs_quantiles`` are numpy on the group's level
    arrays). Driver receives only (key, q, value, n, eps_bound) rows —
    groups x quantiles, never data. Exact for groups that never
    compact (fewer than k values per block and k after merge — the
    overwhelmingly common case for per-source stats).

    Returns a pandas frame (key, q, value, n, eps_bound) sorted by
    (key, q). Rows with a NULL key or NULL measure are ignored (SQL
    aggregate semantics).
    """
    import pandas as pd

    if not qs:
        raise ValueError("grouped_quantile_sketch: no quantiles requested")
    if k < 8:
        raise ValueError(f"grouped_quantile_sketch: k must be >= 8, got {k}")

    out_schema = pa.schema(
        [
            ("key", pa.string()),
            ("level", pa.int32()),
            ("vals", pa.large_list(pa.float64())),
        ]
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.drop_null()
        if t.num_rows == 0:
            return out_schema.empty_table()
        keys = pc.cast(t[key_col], pa.string()).to_numpy(zero_copy_only=False)
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        keys, v = keys[order], v[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1, [keys.size])
        )
        out_k, out_l, out_v = [], [], []
        for a, b in zip(starts[:-1], starts[1:]):
            levels: list[np.ndarray] = []
            parity: list[int] = []
            _qs_insert(levels, parity, 0, v[a:b], k)
            for lvl, arr in enumerate(levels):
                if arr.size:
                    out_k.append(keys[a])
                    out_l.append(lvl)
                    out_v.append(arr.tolist())
            err = sum(p * (2.0 ** i) for i, p in enumerate(parity))
            if err:
                out_k.append(keys[a])
                out_l.append(-1)
                out_v.append([err])
        return pa.table(
            {
                "key": pa.array(out_k, type=pa.string()),
                "level": pa.array(np.asarray(out_l, dtype=np.int32)),
                "vals": pa.array(out_v, type=pa.large_list(pa.float64())),
            },
            schema=out_schema,
        )

    def reduce_keys(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "key": pa.array([], pa.string()),
                    "q": pa.array([], pa.float64()),
                    "value": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                    "eps_bound": pa.array([], pa.float64()),
                }
            )
        keys = t["key"].to_numpy(zero_copy_only=False)
        lvls = t["level"].to_numpy(zero_copy_only=False)
        vals = t["vals"].to_pylist()
        order = np.argsort(keys, kind="stable")
        out_rows = {"key": [], "q": [], "value": [], "n": [], "eps_bound": []}
        i = 0
        while i < order.size:
            j = i
            kk = keys[order[i]]
            by_level: dict[int, list[np.ndarray]] = {}
            while j < order.size and keys[order[j]] == kk:
                by_level.setdefault(int(lvls[order[j]]), []).append(
                    np.asarray(vals[order[j]], dtype=np.float64)
                )
                j += 1
            levels, err = _qs_merge(by_level, k)
            quants, n = _qs_quantiles(levels, qs)
            for q, val in quants.items():
                out_rows["key"].append(kk)
                out_rows["q"].append(q)
                out_rows["value"].append(val)
                out_rows["n"].append(n)
                out_rows["eps_bound"].append(err / n if n else 0.0)
            i = j
        return pa.table(
            {
                "key": pa.array(out_rows["key"], pa.string()),
                "q": pa.array(out_rows["q"], pa.float64()),
                "value": pa.array(out_rows["value"], pa.float64()),
                "n": pa.array(out_rows["n"], pa.int64()),
                "eps_bound": pa.array(out_rows["eps_bound"], pa.float64()),
            }
        )

    from ..shuffle import hash_group_apply

    # keys travel the exchange as strings (one schema for any key
    # type); restore the caller's native key dtype on the way out so
    # the result joins back to the source and sorts numerically
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch)
    if hasattr(base, "field"):
        key_type = base.field(key_col).type
        if pa.types.is_dictionary(key_type):
            key_type = key_type.value_type
    else:  # pandas-block schema: names/types only
        d = np.dtype(base.types[list(base.names).index(key_col)])
        key_type = pa.string() if d == np.dtype(object) else pa.from_numpy_dtype(d)

    parts = ds.select_columns([key_col, col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    out = hash_group_apply(parts, "key", reduce_keys).to_pandas()
    if not (pa.types.is_string(key_type) or pa.types.is_large_string(key_type)):
        out["key"] = (
            pc.cast(pa.array(out["key"], pa.string()), key_type)
            .to_pandas()
        )
    return out.sort_values(["key", "q"], kind="mergesort").reset_index(drop=True)


def hll_distinct_by(
    ds: rd.Dataset, key_col: str, col: str, p: int = 12
) -> rd.Dataset:
    """Per-group HyperLogLog: approximate ``count_distinct(col)`` for
    every ``key_col`` group in ONE pass (distinct users per day /
    source / shard — the monitoring aggregate exact distinct-per-group
    makes ruinously expensive at 100 TB).

    Output rows: ``(key_col, estimate, registers_nonzero)`` — estimate
    is deterministic at any parallelism (registers max-merge; the
    harmonic sum runs in sorted register order).

    Scale shape: each block pre-aggregates to its per-(key, register)
    maxima inside ``map_batches`` — the exchange moves
    O(blocks x keys_per_block x min(2^p, block_distinct)) narrow rows,
    never the values, and a group's reducer state is <= 2^p registers
    REGARDLESS of group size — the skew armor an exact
    distinct-per-group (whose hot group holds all its values) lacks.
    Right when groups are much fewer than rows; at key cardinality
    near row count an exact ``groupby().count_distinct`` is cheaper.
    NULL values are ignored (SQL count(distinct) semantics); NULL keys
    raise.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"hll_distinct_by: p must be in [4, 18], got {p}")
    m = 1 << p
    from ..shuffle import hash_group_apply, run_starts

    def _group_codes(t: pa.Table):
        kc = t[key_col].combine_chunks()
        if kc.null_count:
            raise ValueError(f"hll_distinct_by: {key_col!r} contains nulls")
        denc = kc.dictionary_encode()
        return (
            denc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            denc.dictionary,
        )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[col]))
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "reg": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
        codes, dic = _group_codes(t)
        idx, rank = _reg_rank(_hash64(t[col].combine_chunks()), p)
        order = np.lexsort((idx, codes))
        cs, xs, rs = codes[order], idx[order], rank[order]
        starts = run_starts(cs, xs)
        sidx = np.flatnonzero(starts)
        seg = np.concatenate((sidx, [cs.size]))
        vmax = np.maximum.reduceat(rs, seg[:-1])
        return pa.table(
            {
                key_col: dic.take(pa.array(cs[sidx])),
                "reg": pa.array(xs[sidx]),
                "val": pa.array(vmax.astype(np.int64)),
            }
        )

    alpha = 0.7213 / (1 + 1.079 / m)

    def reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.schema.field(key_col).type),
                    "estimate": pa.array([], pa.float64()),
                    "registers_nonzero": pa.array([], pa.int64()),
                }
            )
        codes, dic = _group_codes(t)
        reg = t["reg"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["val"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((reg, codes))
        cs, xs, vs = codes[order], reg[order], val[order]
        pstarts = run_starts(cs, xs)
        pidx = np.flatnonzero(pstarts)
        pseg = np.concatenate((pidx, [cs.size]))
        vmax = np.maximum.reduceat(vs, pseg[:-1])      # per (key, reg)
        kc, kx = cs[pidx], xs[pidx]
        kstarts = run_starts(kc)
        kidx = np.flatnonzero(kstarts)
        kseg = np.concatenate((kidx, [kc.size]))
        nnz = np.diff(kseg)
        s = np.add.reduceat(np.exp2(-vmax.astype(np.float64)), kseg[:-1])
        zeros = (m - nnz).astype(np.float64)
        raw = alpha * m * m / (zeros + s)
        with np.errstate(divide="ignore"):
            lin = m * np.log(np.where(zeros > 0, m / np.maximum(zeros, 1), 1.0))
        est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
        _ = kx  # register ids only needed for the (key, reg) merge
        return pa.table(
            {
                key_col: dic.take(pa.array(kc[kidx])),
                "estimate": pa.array(est),
                "registers_nonzero": pa.array(nnz.astype(np.int64)),
            }
        )

    return hash_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"), key_col, reduce
    )

