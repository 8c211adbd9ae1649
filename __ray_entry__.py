"""Driver contract: entry() / queries() / oracle_sql().

Ray is initialised by the driver BEFORE this module is imported —
nothing here (or in pisa_ray) calls ray.init/shutdown.

Determinism conventions shared with every oracle SQL string:
- tokenize rule: lowercase, split on [^a-z0-9_]+, drop empties
- BM25: k1=0.9, b=0.4, idf = ln(1 + (N-df+0.5)/(df+0.5))
- float aggregates are rounded on BOTH sides (and, where a ranking
  depends on a float, the rank is computed over the ROUNDED value with
  an explicit id tie-break) so value-hashes are association-order-proof
- every computed column is named identically in Ray and SQL
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_SPLIT_SQL = "[^a-z0-9_]+"
_TOK = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), x -> x <> '')"
)

# fixed BM25 benchmark query set (terms drawn from the documents vocab,
# plus a stop-ish term and an OOV term for the empty path)
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "merge join"),
    (1, "window"),
    (2, "group order data"),
    (3, "stream filter"),
    (4, "scan"),
    (5, "slow query table"),
    (6, "spark row"),
    (7, "zz_absent_token partition"),
]

# conjunctive runs the same mix PLUS a rare-term conjunction ("dup"
# df≈25/500 at sf0.01) so the AND restriction provably bites — without
# it every common-term top-10 happens to contain all query terms and
# the HAVING oracle would be vacuous
CONJ_QUERIES: list[tuple[int, str]] = BM25_QUERIES + [(8, "dup value fast")]

# BM25F runs the same mix PLUS queries hitting the second field's
# source tags (src* terms live ONLY in the title field), so the
# union-df idf provably differs from the content df and the per-field
# blend is load-bearing, not a pass-through of single-field BM25
BM25F_QUERIES: list[tuple[int, str]] = BM25_QUERIES + [
    (8, "src3 merge"),
    (9, "window src17 src5"),
]


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _tbl(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _index_dir(sf_dir: str, codec: str = "varint") -> str:
    """Build (or reuse — the manifest makes this idempotent) the
    full-text index over the documents table of this sf_dir.

    ``codec="packed"`` builds a SECOND cached index with block-wise
    bit-packed posting streams — the ``bm25_bmw`` entry queries it, so
    the driver hash-checks the packed codec (including BMW's per-block
    packed decode) directly against the DuckDB BM25 replay, not just
    against the varint path's pytest bit-identity."""
    from pisa_ray.build import IndexConfig, build_index

    from pisa_ray import INDEX_FORMAT_VERSION

    out = os.path.join(
        f"/tmp/pisa_ray_idx/v{INDEX_FORMAT_VERSION}",
        os.path.basename(os.path.normpath(sf_dir)),
        "documents" if codec == "varint" else f"documents_{codec}",
    )
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        out,
        IndexConfig(
            id_col="doc_id",
            key_cols=(),
            content_col="text",
            meta_cols=("lang", "source"),
            bucket_bits=2,
            term_parts=16,
            posting_space="position",  # rank-gap postings (4x smaller)
            positions=True,  # positional payload: phrase/proximity
            # entries resolve index-natively (no corpus re-read)
            codec=codec,
        ),
        resume=True,
    )
    return out


def _title_index_dir(sf_dir: str) -> str:
    """Second FIELD index over the same corpus identity (id_col
    doc_id): a derived ``title`` column = the first 8 engine tokens of
    ``text`` plus the lowercased ``source`` tag. Gives the BM25F entry
    real cross-field term overlap (title ⊂ text tokens blend inside
    one saturation) AND field-exclusive terms (src* live only here, so
    union-df ≠ content-df). DuckDB replays the derivation with
    ``list_filter(split)[1:8]`` + ``lower(source)``."""
    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.tokenizer import tokenize_py

    from pisa_ray import INDEX_FORMAT_VERSION

    out = os.path.join(
        f"/tmp/pisa_ray_idx/v{INDEX_FORMAT_VERSION}",
        os.path.basename(os.path.normpath(sf_dir)),
        "documents_field_title",
    )

    def mk(b: pd.DataFrame) -> pd.DataFrame:
        titles = [
            " ".join(tokenize_py(t)[:8] + [s.lower()])
            for t, s in zip(b["text"], b["source"])
        ]
        return pd.DataFrame({"doc_id": b["doc_id"], "title": titles})

    title = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        mk, batch_format="pandas"
    )
    build_index(
        title,
        out,
        IndexConfig(
            id_col="doc_id",
            key_cols=(),
            content_col="title",
            meta_cols=(),
            bucket_bits=2,
            term_parts=8,
            lineage_parts=1,
        ),
        resume=True,
    )
    return out


def _term_explode(distinct: bool):
    import pyarrow.compute as pc

    from pisa_ray.tokenizer import doc_term_counts

    def fn(batch: pa.Table) -> pa.Table:
        terms, tfs, _ = doc_term_counts(batch["text"])
        flat_t = pc.list_flatten(terms)
        parents = pc.list_parent_indices(terms).to_numpy(zero_copy_only=False)
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)[parents]
        cols = {"term": flat_t.cast(pa.string()), "doc_id": pa.array(doc)}
        if not distinct:
            cols["tf"] = pc.list_flatten(tfs).cast(pa.int64())
        return pa.table(cols)

    return fn


# --------------------------------------------------------------------------
# engine queries
# --------------------------------------------------------------------------


def q_term_stats(sf_dir: str):
    """Per-term df (doc count) AND total tf in ONE tokenize + groupby
    pass — the round-2 `term_df` / `term_tf` entries consolidated (the
    explode already collapses (doc, term) to one row with its tf, so
    Count gives df and Sum gives corpus tf from the same exchange)."""
    from ray.data.aggregate import Count, Sum

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(_term_explode(distinct=False), batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="df"), Sum("tf", alias_name="tf"))
    )


def q_index_lexicon(sf_dir: str):
    """Global df table read back from the BUILT index — checks the whole
    tokenize -> bucketed merge -> lexicon pipeline against SQL."""
    import ray.data as rd

    idx = _index_dir(sf_dir)
    lex = rd.read_parquet(os.path.join(idx, "lexicon"))

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"term": batch["term"], "df": batch["df"].cast(pa.int64())}
        )

    return lex.map_batches(cast, batch_format="pyarrow")


def q_docmap(sf_dir: str):
    """(doc_id, length) from the built index's docmap — doc ids are
    recovered through the inverse splitmix bijection."""
    import ray.data as rd

    from pisa_ray.docids import unsplitmix64

    idx = _index_dir(sf_dir)
    dm = rd.read_parquet(os.path.join(idx, "docmap"), columns=["doc_id", "length"])

    def fn(batch: pa.Table) -> pa.Table:
        orig = unsplitmix64(
            batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(orig),
                "length": batch["length"].cast(pa.int64()),
            }
        )

    return dm.map_batches(fn, batch_format="pyarrow")


def _bm25_query_table() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([q[0] for q in BM25_QUERIES], type=pa.int64()),
            "text": pa.array([q[1] for q in BM25_QUERIES], type=pa.string()),
        }
    )


def _canon_topk(hits: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize k=50 hits to the SQL oracle's shape: rank over
    ROUNDED score (+ doc_id tie-break) exactly as the SQL does, cut to
    top-10."""
    if hits.empty:
        return pd.DataFrame(
            {"query_id": pd.Series(dtype="int64"), "rank": pd.Series(dtype="int64"),
             "doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )
    hits = hits.copy()
    hits["score"] = np.round(hits["score"].to_numpy(), 4)
    hits = hits.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    hits["rank"] = hits.groupby("query_id").cumcount() + 1
    hits = hits[hits["rank"] <= 10].reset_index(drop=True)
    return hits[["query_id", "rank", "doc_id", "score"]].astype(
        {"query_id": "int64", "rank": "int64", "doc_id": "int64"}
    )


def q_bm25_topk(sf_dir: str):
    import ray.data as rd

    from pisa_ray.scorer import query_index

    idx = _index_dir(sf_dir)
    hits = query_index(
        rd.from_arrow(_bm25_query_table()), idx, k=50, concurrency=2
    ).to_pandas()
    return _canon_topk(hits)


def q_bm25_filtered(sf_dir: str):
    """BM25 top-10 restricted to lang='en' docs (global stats, filtered
    candidates) — the reference's group-restricted evaluation
    (/root/reference/src/Inference.py:85-88) as a query-time predicate."""
    import ray.data as rd

    from pisa_ray.scorer import query_index

    idx = _index_dir(sf_dir)
    hits = query_index(
        rd.from_arrow(_bm25_query_table()),
        idx,
        k=50,
        concurrency=2,
        doc_filter=("lang", "en"),
    ).to_pandas()
    return _canon_topk(hits)


def q_qld_topk(sf_dir: str):
    """Dirichlet query-likelihood (QLD) top-10 on the same query set —
    the engine's second ranker (method='qld'), scored end-to-end
    through the actor pool against build-time collection-frequency
    lexicon statistics."""
    import ray.data as rd

    from pisa_ray.scorer import query_index

    idx = _index_dir(sf_dir)
    hits = query_index(
        rd.from_arrow(_bm25_query_table()), idx, k=50, concurrency=2, method="qld"
    ).to_pandas()
    return _canon_topk(hits)


def q_bm25f_topk(sf_dir: str):
    """TRUE BM25F (Robertson & Zaragoza field-blended form) top-10
    over two fields of the same corpus — content (``text``, w=1.0,
    b=0.4) and a derived title field (first 8 content tokens + source
    tag, w=0.5, b=0.75): per-field length-normalized tf is
    weight-blended BEFORE the k1 saturation, idf over the exact
    per-term UNION document frequency. DuckDB replays both field
    tokenizations, the blend, and the union df exactly."""
    from pisa_ray.pipelines.fields import bm25f_search

    idx_text = _index_dir(sf_dir)
    idx_title = _title_index_dir(sf_dir)
    hits = bm25f_search(
        list(BM25F_QUERIES),
        [(idx_text, 1.0, 0.4), (idx_title, 0.5, 0.75)],
        k=50,
        k1=0.9,
        concurrency=2,
    )
    return _canon_topk(hits)


# --------------------------------------------------------------------------
# relational queries (reference operator surface, SURVEY.md §2)
# --------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate (reference A1-A6 analogs)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    ds = _tbl(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        return batch.append_column("rev", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("rev", alias_name="sum_rev"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out["sum_qty"] = np.round(out["sum_qty"], 2)
    out["sum_rev"] = np.round(out["sum_rev"], 2)
    out["avg_disc"] = np.round(out["avg_disc"], 4)
    return out


def q_top_customers(sf_dir: str):
    """Broadcast join (small dim via ray.put) + grouped sum + top-10."""
    from ray.data.aggregate import Sum

    from pisa_ray.pipelines.relational import broadcast_inner_join

    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    orders = _tbl(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_inner_join(
        orders.map_batches(
            lambda b: b.rename_columns(["c_custkey", "o_totalprice"]),
            batch_format="pyarrow",
        ),
        cust,
        on="c_custkey",
    )
    from pisa_ray.pipelines.relational import global_topk

    def round_rev(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("revenue")
        return b.set_column(
            i, "revenue", pa.array(np.round(b["revenue"].to_numpy(), 2))
        )

    agg = joined.groupby("c_custkey").aggregate(
        Sum("o_totalprice", alias_name="revenue")
    )
    # oracle ranks by ROUNDED revenue -> round before the top-k;
    # streaming ORDER BY .. LIMIT: per-block top-k, k rows/block merge
    agg = agg.map_batches(round_rev, batch_format="pyarrow")
    agg = global_topk(agg, ["revenue", "c_custkey"], [False, True], 10)
    agg = agg.merge(cust, on="c_custkey", sort=False)
    agg["rank"] = np.arange(1, len(agg) + 1, dtype=np.int64)
    return agg[["rank", "c_custkey", "c_name", "revenue"]].reset_index(drop=True)


def q_order_membership(sf_dir: str):
    """Broadcast semi-join ∪ anti-join against the orders key set —
    every customer labeled has_orders 1/0. One driver row exercising
    BOTH set-membership operators (the round-2 `customers_with_orders`
    / `customers_without_orders` entries, consolidated)."""
    from pisa_ray.pipelines.relational import (
        broadcast_anti_join,
        broadcast_semi_join,
    )

    cust = _tbl(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _tbl(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    empty = pd.DataFrame(
        {
            "c_custkey": pd.Series(dtype="int64"),
            "c_name": pd.Series(dtype="object"),
        }
    )
    parts = []
    for join, flag in (
        (broadcast_semi_join, np.int64(1)),
        (broadcast_anti_join, np.int64(0)),
    ):
        side = join(cust, keys, "c_custkey").to_pandas()
        if side.empty:  # an all-empty Dataset loses its schema
            side = empty.copy()
        side["has_orders"] = flag
        parts.append(side)
    out = pd.concat(parts, ignore_index=True)
    return out[["c_custkey", "c_name", "has_orders"]].astype(
        {"c_custkey": "int64", "has_orders": "int64"}
    )


def q_distinct_segments(sf_dir: str):
    vals = sorted(_tbl(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": pd.Series(vals, dtype="object")})


def q_events_hourly(sf_dir: str):
    from pisa_ray.pipelines.relational import tumbling_window_agg

    out = tumbling_window_agg(
        _tbl(sf_dir, "events", ["ts", "event_type", "value"]),
        "ts",
        "event_type",
        "value",
        window="hour",
    ).to_pandas()
    out["sum_value"] = np.round(out["sum_value"], 2)
    # DuckDB timestamps are microsecond; floor_temporal kept the input
    # second unit — same values, align the dtype for the driver hash
    out["window"] = out["window"].astype("datetime64[us]")
    return out


def q_topn_accuracy(sf_dir: str):
    """The reference's FULL evaluation path (Reader clicked sets ->
    all-items scoring -> train-item exclusion mask -> per-user top-k ->
    Recall/NDCG/MRR/Precision@K pivot, SURVEY S9/A4/T4) under the
    driver hash. Interactions derive deterministically from events
    (item_id = event_id % 50; event_id % 5 == 4 is the test split);
    the 'model' is train-split item popularity (same score for every
    user), masked per user by their train-clicked set — so every rank,
    tie-break (count desc, item asc — float32 counts are exact) and
    metric replays as window arithmetic in DuckDB. Output: one row per
    (metric, K), mean over users with >= 1 positive, rounded 6."""

    from pisa_ray.pipelines.interactions import (
        clicked_sets,
        topk_excluding,
        topn_accuracy,
    )

    N_ITEMS, K_LIST = 50, (5, 10, 20)
    ev = _tbl(sf_dir, "events", ["event_id", "user_id"])

    def derive(b: pa.Table, want_test: bool) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        mask = (eid % 5 == 4) if want_test else (eid % 5 != 4)
        return pa.table(
            {
                "user_id": b["user_id"].filter(pa.array(mask)),
                "item_id": pa.array(
                    (eid[mask] % N_ITEMS).astype(np.int64)
                ),
            }
        )

    train = ev.map_batches(
        lambda b: derive(b, False), batch_format="pyarrow"
    )
    test = ev.map_batches(lambda b: derive(b, True), batch_format="pyarrow")

    # distributed popularity counts -> the 50-float score vector
    pop = train.groupby("item_id").count().to_pandas()
    scores = np.zeros(N_ITEMS, dtype=np.float32)
    scores[pop["item_id"].to_numpy()] = pop["count()"].to_numpy()

    # per-user train exclusion sets (the broadcast clicked dict)
    cl = clicked_sets(train).to_pandas()
    clicked = {
        int(u): np.asarray(list(it), dtype=np.int64)
        for u, it in zip(cl["user_id"], cl["items"])
    }
    tdf = test.to_pandas().drop_duplicates(["user_id", "item_id"])
    positives = {
        int(u): set(g["item_id"].tolist())
        for u, g in tdf.groupby("user_id")
    }
    users = sorted(positives)
    topk = topk_excluding(
        users,
        N_ITEMS,
        lambda u: np.tile(scores, (len(u), 1)),
        clicked,
        k=max(K_LIST),
    ).to_pandas()
    metrics = topn_accuracy(topk, positives, ks=K_LIST)
    keys = sorted(metrics)
    return pd.DataFrame(
        {"metric": keys, "value": [metrics[k] for k in keys]}
    )


def q_snapshot_counts(sf_dir: str):
    """The reference's size-based snapshot split
    (/root/reference/src/helpers/Reader.py:81-92,148-178): sort the
    event log, split at boundaries, count rows + distinct users per
    block (block 0 = train, 1..5 = incremental)."""
    from pisa_ray.pipelines.relational import snapshot_blocks

    ev = _tbl(sf_dir, "events", ["ts", "event_id", "user_id"])
    blocks = snapshot_blocks(ev, ["ts", "event_id"], train_ratio=0.6, n_snapshots=5)
    rows = []
    for i, b in enumerate(blocks):
        rows.append(
            {
                "snap": i,
                "n_rows": b.count(),
                "n_users": len(b.unique("user_id")),
            }
        )
    return pd.DataFrame(rows).astype(
        {"snap": "int64", "n_rows": "int64", "n_users": "int64"}
    )


def q_sessions(sf_dir: str):
    """Session windows (30-min gap) per user — streaming semantics on
    the batch engine; one groupby(user), sessions inside sorted groups."""
    from pisa_ray.pipelines.relational import sessionize

    out = sessionize(
        _tbl(sf_dir, "events", ["user_id", "ts", "event_id"]),
        gap_seconds=1800,
    ).to_pandas()
    return out.astype({"user_id": "int64", "session_id": "int64", "n_events": "int64"})


def q_asof_last_error(sf_dir: str):
    """As-of join: every purchase event picks up the user's most recent
    error event at-or-before it (hash-partitioned by user, per-group
    merge_asof) — DuckDB's ASOF LEFT JOIN is the oracle."""
    from pisa_ray.pipelines.relational import asof_join

    ev = _tbl(sf_dir, "events", ["event_id", "ts", "user_id", "event_type", "value"])
    left = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id", "value"]
    )
    right = ev.filter(expr="event_type == 'error'").select_columns(
        ["ts", "user_id", "value"]
    )
    out = asof_join(left, right, "user_id", "ts", ["value"]).to_pandas()
    out["value"] = np.round(out["value"].to_numpy(), 2)
    out["value_right"] = np.round(out["value_right"].to_numpy(), 2)
    return out.astype({"event_id": "int64", "user_id": "int64"})


def q_price_bands(sf_dir: str):
    """Broadcast range join (lo <= value < hi) of lineitem prices onto
    a band table, aggregated per band."""
    from pisa_ray.pipelines.relational import range_join

    li = _tbl(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    bands = pd.DataFrame(
        {
            "band": ["low", "mid", "high", "lux"],
            "lo": [0.0, 20000.0, 40000.0, 60000.0],
            "hi": [20000.0, 40000.0, 60000.0, 1e18],
        }
    )
    joined = range_join(li, bands, "l_extendedprice")
    from ray.data.aggregate import Count, Sum

    out = (
        joined.groupby("band")
        .aggregate(Count(alias_name="n"), Sum("l_extendedprice", alias_name="rev"))
        .to_pandas()
    )
    out["rev"] = np.round(out["rev"].to_numpy(), 2)
    return out.astype({"n": "int64"})


def q_events_hopping(sf_dir: str):
    """Hopping windows (size 2h, hop 1h) per event type — each event
    fans out to its 2 covering windows inside map_batches, one groupby."""
    from pisa_ray.pipelines.relational import hopping_window_agg

    out = hopping_window_agg(
        _tbl(sf_dir, "events", ["ts", "event_type", "value"]),
        "ts",
        "event_type",
        "value",
        size_seconds=7200,
        hop_seconds=3600,
    ).to_pandas()
    out["sum_value"] = np.round(out["sum_value"].to_numpy(), 2)
    out["window"] = out["window"].astype("datetime64[us]")
    return out.astype({"n_events": "int64"})


def q_events_windows(sf_dir: str):
    """Tumbling (1h) AND hopping (2h size / 1h hop) window aggregates
    over events in ONE driver entry, labeled by kind — consolidated so
    both window families keep a CORRECTNESS row under the driver's
    50-entry cap."""
    import pandas as pd

    parts = []
    for kind, fn in (("tumbling", q_events_hourly), ("hopping", q_events_hopping)):
        df = fn(sf_dir).copy()
        df["kind"] = kind
        parts.append(df.astype({"n_events": "int64"}))
    out = pd.concat(parts, ignore_index=True)
    return out[["kind", "window", "event_type", "n_events", "sum_value"]]


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: 5 events per type, picked by a
    SQL-replayable seeded hash rank — same rows at any parallelism."""
    from pisa_ray.pipelines.relational import stratified_sample

    out = stratified_sample(
        _tbl(sf_dir, "events", ["event_id", "event_type", "user_id"]),
        "event_type",
        5,
        "event_id",
    ).to_pandas()
    return out.astype({"event_id": "int64", "user_id": "int64"})[
        ["event_id", "event_type", "user_id"]
    ]


def q_quantiles(sf_dir: str):
    """Exact discrete quantiles WITHOUT a global sort: radix histogram
    refinement over the value bit-pattern domain, 16 bits per pass —
    4 streaming passes total for all quantiles."""
    from pisa_ray.pipelines.relational import quantile_disc

    out = quantile_disc(
        _tbl(sf_dir, "lineitem", ["l_extendedprice"]),
        "l_extendedprice",
        [0.01, 0.25, 0.5, 0.75, 0.99],
    )
    return out


def q_user_top_events(sf_dir: str):
    """Per-user top-3 event types (reference per-user top-k,
    /root/reference/src/Inference.py:240), rank ties by event_type."""
    from ray.data.aggregate import Count

    from pisa_ray.pipelines.relational import per_group_topk

    counts = (
        _tbl(sf_dir, "events", ["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
    )
    out = per_group_topk(
        counts, "user_id", ["n", "event_type"], [False, True], k=3
    ).to_pandas()
    return out.astype({"user_id": "int64", "n": "int64", "rank": "int64"})[
        ["user_id", "event_type", "n", "rank"]
    ]


def q_nation_region(sf_dir: str):
    from ray.data.aggregate import Count

    from pisa_ray.pipelines.relational import broadcast_inner_join

    region = _tbl(sf_dir, "region").to_pandas()
    nation = _tbl(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    joined = broadcast_inner_join(
        nation.map_batches(
            lambda b: b.rename_columns(["n_nationkey", "r_regionkey"]),
            batch_format="pyarrow",
        ),
        region,
        on="r_regionkey",
    )
    return joined.groupby("r_name").aggregate(Count(alias_name="n_nations"))


# --------------------------------------------------------------------------
# training-data queries
# --------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    from pisa_ray.pipelines.dedup import dedup_exact

    out = dedup_exact(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
    return out[["doc_id"]].astype({"doc_id": "int64"})


def q_heavy_hitters(sf_dir: str):
    """Exact global top-20 most frequent users in the events stream
    via the TPUT-style two-pass threshold summary (per-block top-m +
    truncation thresholds through one NARROW exchange, candidate-set
    recount) — never shuffles the value distribution."""
    from pisa_ray.pipelines.sketch import heavy_hitters

    out = heavy_hitters(
        _tbl(sf_dir, "events", ["user_id"]), "user_id", 20
    ).to_pandas()
    return out.rename(columns={"value": "user_id", "cnt": "n"}).astype(
        {"user_id": "int64", "n": "int64"}
    )


def q_grouped_window(sf_dir: str):
    """SQL window functions per user over the events stream — lag,
    row_number, running sum and a trailing RANGE frame count in ONE
    hash exchange (order = event_id, unique, so frames are
    deterministic; value becomes integer cents via the half-up
    formula both engines compute identically in double math)."""
    from pisa_ray.pipelines.window import grouped_window

    def cents(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    ds = _tbl(sf_dir, "events", ["event_id", "user_id", "value"]).map_batches(
        cents, batch_format="pyarrow"
    )
    out = grouped_window(
        ds,
        "user_id",
        "event_id",
        {
            "prev_cents": ("lag", "cents", 1),
            "rn": ("row_number",),
            "cum_cents": ("cumsum", "cents"),
            "roll_cnt": ("rolling_count", 1000),
        },
    ).to_pandas()
    out["prev_cents"] = out["prev_cents"].astype("float64")
    return out.astype(
        {"event_id": "int64", "user_id": "int64", "cents": "int64",
         "rn": "int64", "cum_cents": "int64", "roll_cnt": "int64"}
    )[["event_id", "user_id", "cents", "prev_cents", "rn", "cum_cents", "roll_cnt"]]


def q_hash_join(sf_dir: str):
    """Large × large distributed hash join (both sides shuffled by
    key, no broadcast): orders ⋈ customer on custkey."""
    from pisa_ray.pipelines.relational import hash_join

    out = hash_join(
        _tbl(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        _tbl(sf_dir, "customer", ["c_custkey", "c_name"]),
        on="o_custkey",
        right_on="c_custkey",
        how="inner",
    ).to_pandas()
    return out[["o_orderkey", "o_custkey", "o_totalprice", "c_name"]].astype(
        {"o_orderkey": "int64", "o_custkey": "int64", "o_totalprice": "float64"}
    )


def q_hybrid_search(sf_dir: str):
    """Two-stage retrieve-then-rerank: BM25 top-15 candidates from the
    inverted index (actor pool), re-scored by embedding cosine against
    the query's vector (embeddings stream; candidates broadcast once).
    Query vectors are the embedding rows with vec_id == query_id; docs
    without an embedding row drop out (inner-join semantics)."""
    import ray.data as rd

    from pisa_ray.pipelines.similarity import hybrid_search

    idx = _index_dir(sf_dir)
    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir, 8)
    out = hybrid_search(
        rd.from_arrow(_bm25_query_table()),
        idx,
        emb,
        q,
        qids,
        n_candidates=15,
        k=10,
        fetch_k=100,
        concurrency=2,
        candidate_rank_round=4,
    )
    out = _duckdb_cosine_rerank(
        out.rename(columns={"doc_id": "vec_id"}), sf_dir, qids, k=5
    )
    return out.rename(columns={"vec_id": "doc_id"})[
        ["query_id", "rank", "doc_id", "cosine"]
    ]


def _query_vectors(sf_dir: str, max_id: int):
    """Query matrix + ids = the embedding rows with vec_id < max_id
    (shared by the knn / ivf / hybrid entries)."""
    qtab = (
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(expr=f"vec_id < {max_id}")
        .to_pandas()
        .sort_values("vec_id")
    )
    q = np.asarray([np.asarray(v, dtype=np.float64) for v in qtab["embedding"]])
    return q, qtab["vec_id"].to_numpy(dtype=np.int64)


def _duckdb_cosine_rerank(out, sf_dir: str, qids, k: int = 5):
    """Recompute the winners' cosines in DuckDB's exact accumulation
    order (sequential dot; dot/(sqrt(na)*sqrt(nb))) so the rounded
    value is bit-identical to list_cosine_similarity and can never
    straddle a rounding boundary differently; then re-rank and cut to
    the final k (callers fetch extra rows so the re-round can only
    reorder inside the fetched set)."""
    import math

    from pisa_ray.pipelines.relational import broadcast_semi_join

    need = set(out["vec_id"]) | set(int(i) for i in qids)
    vecs = broadcast_semi_join(
        _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]), need, "vec_id"
    ).to_pandas()
    vec_of = {
        int(i): [float(x) for x in v]
        for i, v in zip(vecs["vec_id"], vecs["embedding"])
    }

    def duck_cos(a: list[float], b: list[float]) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    out = out.copy()
    out["cosine"] = np.round(
        [
            duck_cos(vec_of[int(qi)], vec_of[int(vi)])
            for qi, vi in zip(out["query_id"], out["vec_id"])
        ],
        5,
    )
    out = out.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out = out[out["rank"] <= k].reset_index(drop=True)
    return out[["query_id", "rank", "vec_id", "cosine"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"}
    )


def q_knn_cosine(sf_dir: str):
    """Exact cosine top-5 for query vectors vec_id 0..4 (self included;
    rank over rounded cosine + vec_id tie-break, mirroring the SQL)."""
    from pisa_ray.pipelines.similarity import brute_knn

    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir, 5)
    out = brute_knn(emb, q, k=10, query_ids=qids)
    return _duckdb_cosine_rerank(out, sf_dir, qids, k=5)


# ---- rows-only (no SQL oracle: heuristic / hash / stub semantics) --------


def q_text_stats(sf_dir: str):
    """Fused per-doc text statistics — the ``token_stats`` columns plus
    the Gopher-style ``repetition_stats`` features plus the integer
    quality-signal counts (stopwords, digits) in one kernel (the
    round-2 `token_stats`, `repetition` and `quality_counts` entries,
    consolidated so every operator family fits the driver's 50-entry
    cap) — now ALSO carrying the stopword-voting ``lang_id``
    prediction via one doc_id hash_join (the round-4 `lang_id` entry,
    folded in to free a 50-cap slot for `pagerank`; its oracle joins
    the same two replays)."""
    from pisa_ray.pipelines.relational import hash_join
    from pisa_ray.pipelines.text import lang_id, text_stats

    stats = text_stats(_docs(sf_dir, ["doc_id", "text"]), include_quality=True)
    langs = lang_id(
        _docs(sf_dir, ["doc_id", "text", "lang"])
    ).select_columns(["doc_id", "lang", "pred_lang"])
    return hash_join(stats, langs, on="doc_id")


def q_unigram_nll(sf_dir: str):
    """CCNet-style LM-perplexity quality score: per-doc mean unigram
    negative log-likelihood under a corpus-trained unigram model
    (pisa_ray.pipelines.text.unigram_nll, self-scored)."""
    from pisa_ray.pipelines.text import unigram_nll

    return unigram_nll(_docs(sf_dir, ["doc_id", "text"]))


def q_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means clusters over embeddings + exact in-cluster
    pairwise cosine. SQL-checked end-to-end: the synthetic embeddings
    have no natural near-dups, so the ONLY pairs at cosine >= 0.999
    anywhere in the augmented corpus are the planted exact twins
    (vec_id + 100000) — and exact twins always co-cluster (identical
    vectors share an assignment), so the engine's
    in-cluster-restricted pair set EQUALS the global all-pairs set the
    DuckDB oracle computes with ``list_cosine_similarity``. The input
    is augmented with deterministic exact-duplicate vectors that the
    operator must flag against their originals."""
    import ray.data as rd

    from pisa_ray.pipelines.dedup import semantic_dedup

    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"]).to_pandas()
    twins = emb.sort_values("vec_id").head(10).copy()
    twins["vec_id"] = twins["vec_id"] + 100_000
    both = rd.from_pandas(
        pd.concat([emb, twins], ignore_index=True)
    )
    return semantic_dedup(both, n_clusters=8, threshold=0.999, seed=17)


def q_tfidf_keywords(sf_dir: str):
    from pisa_ray.pipelines.text import tfidf_keywords

    return tfidf_keywords(_docs(sf_dir, ["doc_id", "text"]), k=3)


def q_pagerank(sf_dir: str):
    """Fixed-sweep (8-iteration) damped PageRank over a deterministic
    graph derived from events — src = user_id % 128, dst = 128 +
    event_id % 64, so the dst half has NO out-edges and the
    dangling-mass redistribution is load-bearing every sweep. The
    DuckDB oracle unrolls the 8 power-iteration sweeps as plain CTEs
    (no recursion needed at fixed depth); both sides round ranks to
    8 dp — engine float error ~1e-15 is ~1e6 below the 5e-9 half-ulp,
    the kmeans-entry margin discipline."""
    from pisa_ray.pipelines.graph import pagerank

    def mk(t: pa.Table) -> pa.Table:
        ev = t["event_id"].to_numpy(zero_copy_only=False)
        us = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array((us % 128).astype(np.int64)),
                "dst": pa.array((128 + ev % 64).astype(np.int64)),
            }
        )

    edges = _tbl(sf_dir, "events", ["event_id", "user_id"]).map_batches(
        mk, batch_format="pyarrow"
    )
    pr = pagerank(edges, damping=0.85, max_iters=8, tol=None)

    def rnd(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t["node"].cast(pa.int64()),
                "rank": pa.array(
                    np.round(
                        t["rank"].to_numpy(zero_copy_only=False), 8
                    ),
                    type=pa.float64(),
                ),
            }
        )

    return pr.map_batches(rnd, batch_format="pyarrow")


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup over documents ∪ exact separator-mangled
    twins (doc_id+1M, doc_id%3==0) ∪ token-appended NEAR twins
    (doc_id+2M, doc_id%5==0). SQL-checked end-to-end: the sha256-prefix
    token hash (pisa_ray.pipelines.dedup.token_hash32) makes the ENTIRE
    pipeline — shingle hashes, the 64 (a*x+b) mod 2^61-1 permutation
    minima, the per-band FNV-1a fold, bucket reps, and the
    signature-agreement threshold — exact integer arithmetic that
    DuckDB replays with HUGEINT modular ops, so even the probabilistic
    near-twin decisions hash-match. Oracle assumes every doc has >= 3
    tokens (true of the testdata; short docs use the engine's padding
    rule, covered by pytest)."""
    from pisa_ray.pipelines.dedup import minhash_lsh_dedup

    return minhash_lsh_dedup(_minhash_corpus(sf_dir), threshold=0.7)


def _minhash_corpus(sf_dir: str):
    """documents ∪ exact twins ∪ near twins (see q_minhash_dedup)."""
    import pyarrow.compute as pc

    docs = _docs(sf_dir, ["doc_id", "text"])

    def exact_twin(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 3 == 0))
        return pa.table(
            {
                "doc_id": pc.add(b["doc_id"], 1_000_000),
                "text": pc.replace_substring(b["text"], " ", "  ;; "),
            }
        )

    def near_twin(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids % 5 == 0))
        return pa.table(
            {
                "doc_id": pc.add(b["doc_id"], 2_000_000),
                "text": pc.binary_join_element_wise(
                    b["text"], "zz9 qq8 vv7", " "
                ),
            }
        )

    return docs.union(
        docs.map_batches(exact_twin, batch_format="pyarrow"),
        docs.map_batches(near_twin, batch_format="pyarrow"),
    )


def q_simhash(sf_dir: str):
    """Per-doc 64-bit SimHash (bit 63 masked so the value rides int64).
    SQL-checked: the sha256-prefix token hash lets DuckDB replay the
    tf-weighted per-bit majority vote exactly (HUGEINT modular
    arithmetic for the high-word extension hash)."""
    from pisa_ray.pipelines.dedup import simhash_signatures

    def cast(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pc.bit_wise_and(
                    batch["simhash"], pa.scalar((1 << 63) - 1, type=pa.uint64())
                ).cast(pa.int64()),
            }
        )

    return simhash_signatures(_docs(sf_dir, ["doc_id", "text"])).map_batches(
        cast, batch_format="pyarrow"
    )


def q_fingerprint(sf_dir: str):
    """SQL-checked via equivalence classes: the FNV-1a token-stream
    fingerprint is whitespace/punctuation-insensitive and
    order-sensitive, so grouping (documents ∪ separator-mangled twins)
    by fingerprint must equal grouping by the normalized token string —
    which DuckDB can compute directly. canon_id = min doc_id per class."""
    import pyarrow.compute as pc

    from pisa_ray.pipelines.text import fingerprint64

    docs = _docs(sf_dir, ["doc_id", "text"])

    def mangle(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(b["doc_id"], 1_000_000),
                "text": pc.replace_substring(b["text"], " ", "  ;; "),
            }
        )

    def canon(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype("int64"),
                "canon_id": np.int64(g["doc_id"].min()),
            }
        )

    u = docs.union(docs.map_batches(mangle, batch_format="pyarrow"))
    return (
        fingerprint64(u)
        .groupby("fingerprint")
        .map_groups(canon, batch_format="pandas")
    )


def q_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard similarity join (shingle-inverted-index
    self-join, no LSH) — finds the planted near-dup pairs; DuckDB
    replays the identical shingle/intersection arithmetic."""
    from pisa_ray.pipelines.dedup import jaccard_pairs

    out = jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), threshold=0.5
    ).to_pandas()
    out["jaccard"] = np.round(out["jaccard"].to_numpy(), 4)
    return out.astype({"id_a": "int64", "id_b": "int64"})


def q_dup_clusters(sf_dir: str):
    """Near-dup pairs (exact n-gram Jaccard join over documents ∪ an
    exact twin ∪ a suffix-mangled near twin) -> distributed connected
    components (star contraction) -> one canonical id per transitive
    duplicate cluster. DuckDB replays the pair join and closes it with
    a recursive CTE."""
    import pyarrow.compute as pc

    from pisa_ray.pipelines.dedup import jaccard_pairs
    from pisa_ray.pipelines.graph import connected_components

    docs = _docs(sf_dir, ["doc_id", "text"])

    def near(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.add(b["doc_id"], 1_000_000),
                "text": pc.binary_join_element_wise(b["text"], "zz9 qq8 vv7", " "),
            }
        )

    def exact(b: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.add(b["doc_id"], 2_000_000), "text": b["text"]}
        )

    aug = docs.union(
        docs.map_batches(near, batch_format="pyarrow"),
        docs.map_batches(exact, batch_format="pyarrow"),
    )
    pairs = jaccard_pairs(aug, threshold=0.5)
    cc = connected_components(pairs).materialize()

    # survivor selection on top of the SAME clusters (verdict item 6:
    # promote keep_best_per_cluster to a driver row without a new
    # 50-cap slot): quality signal = char length, ties → min doc_id.
    # keep=1 marks the cluster's best member; DuckDB replays it with
    # row_number() over (length DESC, doc_id ASC) per canon_id.
    from pisa_ray.pipelines.dedup import keep_best_per_cluster
    from pisa_ray.pipelines.relational import hash_join

    def with_len(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "len": pc.utf8_length(b["text"]).cast(pa.int64()),
            }
        )

    scored = aug.map_batches(with_len, batch_format="pyarrow")
    surv = keep_best_per_cluster(scored, cc, score_col="len").map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "keep": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), type=pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    lab = cc.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["id"].cast(pa.int64()),
                "canon_id": t["comp_id"].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    out = hash_join(lab, surv, on="doc_id", how="left").to_pandas()
    out["keep"] = out["keep"].fillna(0).astype("int64")
    return (
        out.astype({"doc_id": "int64", "canon_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "canon_id", "keep"]]
    )


def q_doc_chunks(sf_dir: str):
    """Overlapping token-budget chunking (context-window prep):
    max_tokens=64, overlap=16, chunk text = space-rejoined tokens.
    DuckDB replays it with list slicing over the same tokenizer."""
    from pisa_ray.pipelines.text import chunk_documents

    return chunk_documents(
        _docs(sf_dir, ["doc_id", "text"]), max_tokens=64, overlap=16
    )


def q_split_mix(sf_dir: str):
    """The round-4 ``dataset_split`` and ``source_mix`` entries under
    ONE labeled union (events_windows precedent — the driver caps
    queries() at 50 rows, and the freed slot funds ``bm25f_topk``).
    kind='split': leakage-safe train/validation/test assignment keyed
    by doc_id (group-coherent integer Knuth hash). kind='mix':
    training-mixture rate sampling over the documents sources (src0
    fully, src1 at 0.5, src2 at 0.2, else 0.1). DuckDB replays both
    hashes and thresholds exactly."""
    from pisa_ray.pipelines.relational import hash_split, rate_sample

    split = hash_split(_docs(sf_dir, ["doc_id"]), "doc_id")
    mix = rate_sample(
        _docs(sf_dir, ["doc_id", "source"]),
        {"src0": 1.0, "src1": 0.5, "src2": 0.2},
        key_col="source",
        id_col="doc_id",
        default_rate=0.1,
    )

    def lab(kind: str, col: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "kind": pa.array([kind] * t.num_rows, type=pa.string()),
                    "label": t[col].cast(pa.string()),
                }
            )

        return fn

    return split.map_batches(lab("split", "split"), batch_format="pyarrow").union(
        mix.map_batches(lab("mix", "source"), batch_format="pyarrow")
    )


def q_dup_spans(sf_dir: str):
    """Cross-document duplicated-span stats (token 8-grams): per doc,
    its 8-gram occurrence count and how many of those occurrences use
    an 8-gram appearing in >= 2 documents — the exact-substring-dedup
    signal. DuckDB replays it with an unnest + df join."""
    from pisa_ray.pipelines.text import cross_doc_ngram_stats

    return cross_doc_ngram_stats(_docs(sf_dir, ["doc_id", "text"]), n=8)


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk training-sequence packing (budget=128) over
    the documents token stream in doc_id order: one row per
    document x sequence overlap with the doc-local token span. The
    global offsets come from the distributed prefix-sum scan; DuckDB
    replays them with a window sum."""
    from pisa_ray.pipelines.text import pack_sequences

    return pack_sequences(_docs(sf_dir, ["doc_id", "text"]), budget=128)


def q_distinct_hll(sf_dir: str):
    """HyperLogLog distinct-user sketch over events — the entry
    returns the sketch's FULL integer state (nonzero registers
    (reg, val)), which a DuckDB oracle replays exactly: splitmix64 is
    three mod-2^64 multiply/xor/shift rounds, expressible in HUGEINT
    arithmetic with 32-bit decomposition, and the leading-zero rank is
    a binary-format length. Registers max-merge, so the state is
    bit-deterministic at any parallelism; at 100 TB this replaces the
    all-to-all shuffle an exact distinct costs with 4 KB of mergeable
    state. (The float estimate derived from these registers stays
    pytest-checked — 3-sigma accuracy + duplicate invariance.)"""
    from pisa_ray.pipelines.sketch import hll_registers

    return hll_registers(_tbl(sf_dir, "events", ["user_id"]), "user_id")


def q_kmeans(sf_dir: str):
    """Distributed Lloyd's over the embeddings table — PER-VECTOR
    assignments, SQL-checked: the iterative refinement itself is not
    SQL-expressible, but the FINAL assignment is pure argmin distance
    to the converged centroids, and ``oracle_sql`` recomputes those
    centroids with the INDEPENDENT single-process numpy reference
    (``clustering.kmeans_oracle`` — same seeded init/reinit rules,
    different execution) and replays the argmin in DuckDB. Assignment
    margins on this data (min best-vs-2nd gap ~3e-4) dwarf the ~1e-12
    float-summation noise between the two implementations, so the
    hash comparison is stable. Deterministic seeded init +
    deterministic empty-cluster reinit, so rows are stable at any
    parallelism."""
    from pisa_ray.pipelines.clustering import kmeans

    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, assign = kmeans(emb, k=8, seed=17)
    return assign.select_columns(["vec_id", "cluster"])


def q_multimodal(sf_dir: str):
    """Actor-pool media decode over the deterministic synthetic
    corpus, SQL-checked against the SYNTHESIS-side ground truth:
    ``oracle_sql`` embeds ``synth_media_manifest`` — expected decode
    results computed from the pre-encode PCM/pixel arrays and
    container parameters, NOT by running the decoders — as literals.
    WAV/PNG/BMP are lossless, so a correct decoder must reproduce the
    manifest bit-exactly (container parse, scanline unfilter, BGR
    swap, PCM scaling, feature kernels); stub rows pin the sha256
    identity/dispatch layer. Features ride as f0..f7 scalar columns;
    payload sha256 is attached so row identity is pinned too."""
    import hashlib

    import ray.data as rd

    from pisa_ray.pipelines.multimodal import decode_features, synth_media

    media = synth_media(64)
    dec = (
        decode_features(rd.from_arrow(media))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    F = np.vstack([np.asarray(f, dtype=np.float64) for f in dec["features"]])
    for j in range(F.shape[1]):
        dec[f"f{j}"] = F[:, j]
    sha = {
        int(i): hashlib.sha256(p).hexdigest()
        for i, p in zip(
            media["media_id"].to_pylist(), media["payload"].to_pylist()
        )
    }
    dec["sha256"] = [sha[int(i)] for i in dec["media_id"]]
    cols = [
        "media_id", "kind", "decoder", "sha256", "n_bytes", "width",
        "height", "n_channels", "sample_rate_hz", "duration_s",
    ] + [f"f{j}" for j in range(F.shape[1])]
    return dec[cols].astype(
        {c: "int64" for c in
         ["media_id", "n_bytes", "width", "height", "n_channels",
          "sample_rate_hz"]}
    )


def q_bm25_bmw(sf_dir: str):
    """Same top-k via the block-max WAND path, over a PACKED-codec
    index — SQL-checked against the same exhaustive-BM25 oracle as
    bm25_topk, so the driver proves both the pruned scorer AND the
    bit-packed posting codec (including BMW's per-block packed decode)
    rank-identical to DuckDB (pytest additionally pins BMW ≡ TAAT and
    packed ≡ varint per query)."""
    import ray.data as rd

    from pisa_ray.scorer import query_index

    idx = _index_dir(sf_dir, codec="packed")
    hits = query_index(
        rd.from_arrow(_bm25_query_table()), idx, k=50, method="bmw", concurrency=2
    ).to_pandas()
    return _canon_topk(hits)


def q_bm25_conjunctive(sf_dir: str):
    """Conjunctive (AND) BM25: only docs containing EVERY query term,
    ranked by the same BM25 sum — the high-precision query mode
    (scorer.score_conj; intersection cost bounded by the rarest term).
    Query 7 contains an absent token, so its conjunction is empty."""
    import ray.data as rd

    from pisa_ray.scorer import query_index

    idx = _index_dir(sf_dir)
    qt = pa.table(
        {
            "query_id": pa.array([q[0] for q in CONJ_QUERIES], type=pa.int64()),
            "text": pa.array([q[1] for q in CONJ_QUERIES], type=pa.string()),
        }
    )
    hits = query_index(
        rd.from_arrow(qt), idx, k=50, method="conj", concurrency=2
    ).to_pandas()
    return _canon_topk(hits)


def q_knn(sf_dir: str):
    """Brute-force exact cosine AND IVF-Flat at full probe in ONE
    labeled entry (consolidated under the driver's 50-entry cap):
    full-probe IVF must reproduce the exact top-k (each doc lives in
    exactly one cluster, every list probed — identity pytest-pinned),
    so both ANN paths ride the same exact-cosine SQL oracle."""
    import pandas as pd

    a = q_knn_cosine(sf_dir).copy()
    a["method"] = "brute"
    b = q_ivf_knn(sf_dir).copy()
    b["method"] = "ivf"
    out = pd.concat([a, b], ignore_index=True)
    return out[["method", *[c for c in out.columns if c != "method"]]]


def q_facet_counts(sf_dir: str):
    """Faceted search (aggregation-over-search): per BM25 query, the
    count of docs matching ALL the query's terms, grouped by the
    ``lang`` metadata column — docmap-aligned facet codes broadcast
    once, zero shuffles."""
    from pisa_ray.scorer import facet_counts

    idx = _index_dir(sf_dir)
    return facet_counts(BM25_QUERIES, idx, "lang", mode="conj", concurrency=2)


def q_ivf_knn(sf_dir: str):
    """IVF-Flat ANN at FULL probe: k-means coarse quantizer
    (distributed Lloyd's), corpus shuffled once by cluster, every list
    probed — which must reproduce the exact cosine top-k (each doc
    lives in exactly one cluster; identity to brute_knn is
    pytest-pinned), so the whole IVF machinery is SQL-checkable
    against the same exact-top-k oracle as ``knn_cosine``.
    Partial-probe recall behavior stays pytest-covered."""
    from pisa_ray.pipelines.similarity import ivf_knn

    emb = _tbl(sf_dir, "embeddings", ["vec_id", "embedding"])
    q, qids = _query_vectors(sf_dir, 5)
    out = ivf_knn(emb, q, k=10, n_clusters=8, n_probe=8)
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return _duckdb_cosine_rerank(out, sf_dir, qids, k=5)


# fixed phrase-query benchmark set (contiguous token sequences from the
# documents vocab, a selective 3-gram, and an absent phrase)
PHRASE_QUERIES: list[tuple[int, str]] = [
    (0, "merge join"),
    (1, "table scan"),
    (2, "scan merge part"),
    (3, "group order data"),
    (4, "zz_absent_token window"),
]

DECONTAM_K = 3  # token k-gram width (3 keeps the 26-word synthetic vocab discriminative: ~1/3 of sf0.01 docs overlap the eval split)


def q_phrase_search(sf_dir: str):
    """Exact phrase (contiguous token sequence) matching, resolved
    INDEX-NATIVELY from positional postings (IndexConfig(positions=
    True), pipelines/phrase.py score_phrase) — zero corpus access; the
    DuckDB oracle still verifies against the raw text, so the entire
    positional pipeline (tokenize-time gap encode, shuffle, segment
    pos_blob, reader decode, adjacency set algebra) is hash-checked."""
    from pisa_ray.pipelines.phrase import phrase_search_index

    return phrase_search_index(PHRASE_QUERIES, _index_dir(sf_dir))


def q_decontaminate(sf_dir: str):
    """Train/test decontamination: docs sharing any token k-gram with
    the benchmark split (doc_id % 97 == 0 — the deterministic stand-in
    for an eval set). Benchmark k-gram set broadcast once via ray.put;
    one vectorized membership pass over the training split."""
    import ray.data as rd

    from pisa_ray.pipelines.dedup import benchmark_kgrams, decontaminate

    def split(want_bench: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            mask = (ids % 97 == 0) if want_bench else (ids % 97 != 0)
            return batch.filter(pa.array(mask))

        return _docs(sf_dir, ["doc_id", "text"]).map_batches(
            fn, batch_format="pyarrow"
        )

    grams = benchmark_kgrams(split(True), k=DECONTAM_K)
    return decontaminate(split(False), grams, k=DECONTAM_K)


def _pii_augment(sf_dir: str):
    """documents with deterministic PII planted by doc_id residue (the
    synthetic corpus has none) — identical expression in the oracle SQL
    so the regex stages provably fire."""
    import pyarrow.compute as pc

    docs = _docs(sf_dir, ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        ids_s = pc.cast(ids, pa.string())

        def when(mod: int, pieces) -> pa.Array:
            cond = pa.array(ids_np % mod == 0)
            s = pc.binary_join_element_wise(*pieces, "")
            return pc.if_else(cond, s, "")

        s7 = when(7, [" contact user", ids_s, "@example.com now"])
        s11 = when(11, [" host 10.1.2.3 port", ids_s])
        s13 = when(13, [" call +491511234567 asap", ""])
        s17 = when(17, [" ssn 123-45-6789 end", ""])
        aug = pc.binary_join_element_wise(batch["text"], s7, s11, s13, s17, "")
        return pa.table({"doc_id": ids, "text": aug})

    return docs.map_batches(fn, batch_format="pyarrow")


_PII_AUG_SQL = """
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
               || CASE WHEN doc_id % 11 = 0 THEN ' host 10.1.2.3 port' || doc_id ELSE '' END
               || CASE WHEN doc_id % 13 = 0 THEN ' call +491511234567 asap' ELSE '' END
               || CASE WHEN doc_id % 17 = 0 THEN ' ssn 123-45-6789 end' ELSE '' END
               AS text
        FROM documents
"""


def q_pii_scan(sf_dir: str):
    """Fused PII detect+redact over the planted corpus (the round-2
    `pii_counts` and `pii_redact` entries consolidated — they share the
    RE2 kernel): per-category counts, has_pii, and the full redacted
    strings value-compared against DuckDB's nested regexp_replace —
    pyarrow and DuckDB both run RE2, so matches are identical."""
    from pisa_ray.pipelines.text import pii_scan

    return pii_scan(_pii_augment(sf_dir))


# --------------------------------------------------------------------------
# contract
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship: build the full-text index over sf0.001 documents and
    answer the benchmark query set."""
    return q_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "term_stats": q_term_stats,
        "index_lexicon": q_index_lexicon,
        "index_docmap": q_docmap,
        "bm25_topk": q_bm25_topk,
        "qld_topk": q_qld_topk,
        "bm25f_topk": q_bm25f_topk,
        "bm25_filtered": q_bm25_filtered,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "order_membership": q_order_membership,
        "distinct_segments": q_distinct_segments,
        "events_windows": q_events_windows,
        "topn_accuracy": q_topn_accuracy,
        "snapshot_counts": q_snapshot_counts,
        "sessions": q_sessions,
        "asof_last_error": q_asof_last_error,
        "price_bands": q_price_bands,
        "stratified_sample": q_stratified_sample,
        "quantiles": q_quantiles,
        "user_top_events": q_user_top_events,
        "nation_region": q_nation_region,
        "dedup_exact": q_dedup_exact,
        "jaccard_pairs": q_jaccard_pairs,
        "dup_clusters": q_dup_clusters,
        "doc_chunks": q_doc_chunks,
        "pack_sequences": q_pack_sequences,
        "dup_spans": q_dup_spans,
        "split_mix": q_split_mix,
        "heavy_hitters": q_heavy_hitters,
        "grouped_window": q_grouped_window,
        "hash_join": q_hash_join,
        "hybrid_search": q_hybrid_search,
        "knn": q_knn,
        "facet_counts": q_facet_counts,
        "text_stats": q_text_stats,
        "unigram_nll": q_unigram_nll,
        "tfidf_keywords": q_tfidf_keywords,
        "pagerank": q_pagerank,
        "fingerprint": q_fingerprint,
        "phrase_search": q_phrase_search,
        "decontaminate": q_decontaminate,
        "pii_scan": q_pii_scan,
        "bm25_bmw": q_bm25_bmw,
        "bm25_conjunctive": q_bm25_conjunctive,
        "minhash_dedup": q_minhash_dedup,
        "simhash": q_simhash,
        "distinct_hll": q_distinct_hll,
        # rows-only (non-SQL-expressible: iterative k-means quantizers
        # and stub decoders) — all pytest-covered; kept after the
        # SQL-checked block so the driver's 50-entry cap can never
        # silently drop an oracle row
        "semantic_dedup": q_semantic_dedup,
        "kmeans_clusters": q_kmeans,
        "multimodal_decode": q_multimodal,
    }


def _hll_sql(p: int = 12) -> str:
    """DuckDB replica of the HyperLogLog register build over
    events.user_id: splitmix64 in HUGEINT arithmetic (mod-2^64
    multiplies via 32-bit decomposition, xor/shift via per-half BIGINT
    xor and integer division), register = top p bits, rank = leading
    zeros of the low 64-p bits + 1 (binary-format length — integer-
    exact, no float log2)."""
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    b32, b64 = 1 << 32, 1 << 64
    nbits = 64 - p

    def xor64(a: str, b: str) -> str:
        return (
            f"(xor((({a})//{b32})::BIGINT, (({b})//{b32})::BIGINT)::HUGEINT"
            f" * {b32}"
            f" + xor((({a})%{b32})::BIGINT, (({b})%{b32})::BIGINT)::HUGEINT)"
        )

    def mulmod(a: str, c: int) -> str:
        ch, cl = c // b32, c % b32
        return (
            f"(((({a})%{b32})*{cl}"
            f" + (((({a})//{b32})*{cl} + (({a})%{b32})*{ch}) % {b32})"
            f" * {b32}) % {b64})"
        )

    return f"""
        WITH vals AS (SELECT DISTINCT user_id::HUGEINT AS u FROM events
                      WHERE user_id IS NOT NULL),
        s1 AS (SELECT {xor64('u', f'u//{1 << 30}')} AS x1 FROM vals),
        s2 AS (SELECT {mulmod('x1', c1)} AS h1 FROM s1),
        s3 AS (SELECT {xor64('h1', f'h1//{1 << 27}')} AS x2 FROM s2),
        s4 AS (SELECT {mulmod('x2', c2)} AS h2 FROM s3),
        s5 AS (SELECT {xor64('h2', f'h2//{1 << 31}')} AS h FROM s4),
        rw AS (SELECT (h // {1 << nbits})::BIGINT AS reg,
                      (h % {1 << nbits})::BIGINT AS w FROM s5)
        SELECT reg, max(CASE WHEN w = 0 THEN {nbits + 1}
                             ELSE {nbits + 1} - length(format('{{:b}}', w))
                        END)::BIGINT AS val
        FROM rw GROUP BY reg
    """


def _pagerank_sql(iters: int = 8, d: str = "0.85") -> str:
    """DuckDB replica of the fixed-sweep damped PageRank: the power
    iteration unrolled as ``iters`` plain CTE stages (fixed depth
    needs no recursion). Each stage: dangling mass D = sum of the
    previous ranks over out-degree-0 nodes; inflow per node = sum over
    in-edges of prev_rank/out_degree (edge MULTIPLICITY counts, like
    the engine's per-edge contributions); new rank = (1-d)/N +
    d*(inflow + D/N)."""
    ctes = [
        """edges AS (
            SELECT user_id % 128 AS src, 128 + event_id % 64 AS dst
            FROM events
        ),
        nodes AS (
            SELECT DISTINCT nd FROM (
                SELECT src AS nd FROM edges
                UNION ALL SELECT dst FROM edges)
        ),
        nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
        outdeg AS (
            SELECT src AS nd, count(*)::DOUBLE AS deg
            FROM edges GROUP BY src
        ),
        pr0 AS (SELECT nd, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)"""
    ]
    prev = "pr0"
    for k in range(1, iters + 1):
        ctes.append(
            f"""dang{k} AS (
            SELECT coalesce(sum(p.pr), 0) AS m
            FROM {prev} p LEFT JOIN outdeg o ON o.nd = p.nd
            WHERE o.nd IS NULL
        ),
        infl{k} AS (
            SELECT e.dst AS nd, sum(p.pr / o.deg) AS s
            FROM edges e
            JOIN {prev} p ON p.nd = e.src
            JOIN outdeg o ON o.nd = e.src
            GROUP BY e.dst
        ),
        pr{k} AS (
            SELECT n.nd,
                   (1 - {d}) / nn.n
                   + {d} * (coalesce(i.s, 0) + dang{k}.m / nn.n) AS pr
            FROM nodes n CROSS JOIN nn CROSS JOIN dang{k}
            LEFT JOIN infl{k} i ON i.nd = n.nd
        )"""
        )
        prev = f"pr{k}"
    return (
        "WITH "
        + ",\n        ".join(ctes)
        + f"\n        SELECT nd AS node, round(pr, 8) AS rank FROM {prev}"
    )


def _lang_id_sql() -> str:
    """DuckDB replica of the stopword-voting LangId: per-language token
    membership counts (latin) + per-character substring counts (CJK),
    argmax with alphabetically-first tie-break, 'unknown' at zero votes.
    Generated from the same STOPWORDS table the engine uses."""
    from pisa_ray.pipelines.text import STOPWORDS

    langs = sorted(STOPWORDS)
    vote_cols, case_arms = [], []
    for lang in langs:
        latin = sorted(
            w for w in STOPWORDS[lang] if not (len(w) == 1 and ord(w) > 0x2E7F)
        )
        cjk = sorted(
            w for w in STOPWORDS[lang] if len(w) == 1 and ord(w) > 0x2E7F
        )
        parts = []
        if latin:
            in_list = ", ".join(f"'{w}'" for w in latin)
            parts.append(
                f"coalesce(sum(CASE WHEN tok IN ({in_list}) THEN 1 ELSE 0 END), 0)"
            )
        for ch in cjk:
            parts.append(
                f"any_value(length(text) - length(replace(text, '{ch}', '')))"
            )
        vote_cols.append(f"{' + '.join(parts)} AS v_{lang}")
        case_arms.append(f"WHEN v_{lang} = g THEN '{lang}'")
    g = "greatest(" + ", ".join(f"v_{lang}" for lang in langs) + ")"
    return f"""
        WITH toks AS (
            SELECT doc_id, text, unnest(
                CASE WHEN len({_TOK}) = 0 THEN [''] ELSE {_TOK} END
            ) AS tok
            FROM documents
        ),
        v AS (
            SELECT doc_id, {", ".join(vote_cols)}
            FROM toks GROUP BY doc_id, text
        ),
        p AS (SELECT doc_id, {g} AS g, * FROM v)
        SELECT d.doc_id, d.lang,
               CASE WHEN g = 0 THEN 'unknown'
                    {' '.join(case_arms)} END AS pred_lang
        FROM documents d JOIN p USING (doc_id)
    """


# shared integer-replay constants for the MinHash/SimHash oracles:
# token hash = first 8 sha256 hex chars (== pisa_ray token_hash32);
# all 64-bit wrap arithmetic is replayed via HUGEINT `% 2^64`
_H32 = "('0x' || substr(sha256({t}), 1, 8))::UBIGINT"
_M64 = "18446744073709551616"  # 2^64
_M61 = "2305843009213693952"  # 2^61
_MERS = "2305843009213693951"  # 2^61 - 1
_SPLITMIX_C1 = "11400714819323198485"  # 0x9E3779B97F4A7C15
_SHINGLE_C2 = "14029467366897019727"  # 0xC2B2AE3D27D4EB4F
_FNV_BASIS = "14695981039346656037"  # 0xCBF29CE484222325
_FNV_PRIME = "1099511628211"  # 0x100000001B3


def _simhash_sql() -> str:
    """DuckDB replica of SimHasher: per-(doc, token-hash) tf, the
    splitmix high-word extension hash, a tf-weighted majority vote per
    bit, bits 0..62 summed into the masked int64 the entry emits."""
    h = _H32.format(t="tok")
    return f"""
        WITH toks AS (SELECT doc_id, unnest({_TOK}) AS tok FROM documents),
        th AS (
            SELECT doc_id, h, count(*)::BIGINT AS tf FROM (
                SELECT doc_id, {h}::BIGINT AS h FROM toks
            ) GROUP BY doc_id, h
        ),
        hh AS (
            SELECT doc_id, h, tf,
                   (((h::HUGEINT * {_SPLITMIX_C1}) % {_M64})
                    // 4294967296)::BIGINT AS h2
            FROM th
        ),
        bits AS (
            SELECT doc_id, j,
                   sum(tf * (2 * (((CASE WHEN j < 32 THEN h ELSE h2 END)
                                   >> (j % 32)) & 1) - 1)) AS v
            FROM hh, (SELECT unnest(range(63)) AS j) js
            GROUP BY doc_id, j
        ),
        sh AS (
            SELECT doc_id,
                   sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
                       AS simhash
            FROM bits GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash
        FROM documents d LEFT JOIN sh USING (doc_id)
    """


def _minhash_sql(threshold: float = 0.7, num_perm: int = 64, num_bands: int = 8) -> str:
    """DuckDB replica of the FULL minhash_lsh_dedup pipeline over the
    q_minhash_dedup corpus: shingle hashes (64-bit wrap), the num_perm
    (a*x+b) folds mod 2^61-1, per-band FNV-1a keys, bucket minima as
    candidate pairs, and the exact signature-agreement threshold.
    Assumes every doc has >= shingle_k tokens (testdata min is 10)."""
    from pisa_ray.pipelines.dedup import _minhash_params

    a, b = _minhash_params(num_perm)
    perm_rows = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)"
        for p in range(num_perm)
    )
    rpb = num_perm // num_bands
    h1, h2, h3 = (_H32.format(t=f"t[i{o}]") for o in ("", "+1", "+2"))
    # per-band FNV-1a fold over the band's rpb signature values
    fold = f"{_FNV_BASIS}::UBIGINT"
    for r in range(rpb):
        fold = (
            f"((xor({fold}, s{r}::UBIGINT)::HUGEINT * {_FNV_PRIME})"
            f" % {_M64})::UBIGINT"
        )
    pivot_cols = ", ".join(
        f"max(CASE WHEN r = {r} THEN s END) AS s{r}" for r in range(rpb)
    )
    return f"""
        WITH docs0 AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, replace(text, ' ', '  ;; ')
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id + 2000000, text || ' zz9 qq8 vv7'
            FROM documents WHERE doc_id % 5 = 0
        ),
        tk AS (SELECT doc_id, {_TOK} AS t FROM docs0),
        idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM tk),
        sh AS (
            SELECT DISTINCT doc_id,
                   ((({h1}::HUGEINT * {_SPLITMIX_C1}
                      + {h2}::HUGEINT * {_SHINGLE_C2}
                      + {h3}::HUGEINT) % {_M64}) % {_M61})::HUGEINT AS x
            FROM idx
        ),
        perms(p, aa, bb) AS (VALUES {perm_rows}),
        sig AS (
            SELECT doc_id, p,
                   min(CASE WHEN f >= {_MERS} THEN f - {_MERS} ELSE f END)
                       AS s
            FROM (
                SELECT doc_id, p,
                       (p0 % {_M61}) + (p0 // {_M61}) AS f
                FROM (
                    SELECT doc_id, p,
                           ((aa * x + bb) % {_M64}) AS p0
                    FROM sh, perms
                )
            ) GROUP BY doc_id, p
        ),
        piv AS (
            SELECT doc_id, band, {pivot_cols} FROM (
                SELECT doc_id, p // {rpb} AS band, p % {rpb} AS r, s
                FROM sig
            ) GROUP BY doc_id, band
        ),
        bkt AS (
            SELECT doc_id,
                   (band::UBIGINT * 288230376151711744
                    + ({fold}) // 64)::BIGINT AS key
            FROM piv
        ),
        reps AS (SELECT key, min(doc_id) AS rep FROM bkt GROUP BY key),
        cand AS (
            SELECT DISTINCT b.doc_id, r.rep AS dup_of
            FROM bkt b JOIN reps r USING (key)
            WHERE b.doc_id > r.rep
        ),
        ver AS (
            SELECT c.doc_id, c.dup_of,
                   sum(CASE WHEN sd.s = sr.s THEN 1 ELSE 0 END) AS agree
            FROM cand c
            JOIN sig sd ON sd.doc_id = c.doc_id
            JOIN sig sr ON sr.doc_id = c.dup_of AND sr.p = sd.p
            GROUP BY c.doc_id, c.dup_of
        )
        SELECT doc_id, min(dup_of) AS dup_of
        FROM ver
        WHERE (agree / {float(num_perm)}) >= {threshold}
        GROUP BY doc_id
    """


def _jaccard_ctes(src: str) -> str:
    """CTE chain (no leading WITH) replaying the exact 3-gram Jaccard
    similarity join over relation ``src`` (doc_id, text); final CTE
    ``jac`` holds (id_a, id_b, jaccard>=0.5, rounded to 4dp)."""
    return f"""toks AS (SELECT doc_id, {_TOK} AS t FROM {src}),
            idx AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
                    FROM toks),
            sh AS (SELECT DISTINCT doc_id,
                          t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                   FROM idx),
            sizes AS (SELECT doc_id, count(*) AS s FROM sh GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*)::BIGINT AS c
                FROM sh a
                JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            jac AS (
                SELECT id_a, id_b,
                       round(c::DOUBLE / (sa.s + sb.s - c), 4) AS jaccard
                FROM pairs JOIN sizes sa ON sa.doc_id = pairs.id_a
                           JOIN sizes sb ON sb.doc_id = pairs.id_b
                WHERE c::DOUBLE / (sa.s + sb.s - c) >= 0.5
            )"""


def _sql_double(v: float) -> str:
    """A float64 literal DuckDB parses BIT-EXACTLY: bare decimal
    literals are DECIMAL (whose DOUBLE cast can differ in the last
    ulp), but a VARCHAR->DOUBLE cast is shortest-round-trip parse."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def _oracle_sf_dir() -> str:
    """The sf dir the driver's DuckDB views point at (the correctness
    gate runs at sf0.01). Only the kmeans oracle needs it: its
    centroid literals are computed by the independent single-process
    numpy reference over the same table the views expose."""
    import os

    return os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _kmeans_sql(k: int = 8, seed: int = 17) -> str:
    """Replay of the engine's FINAL k-means assignment in DuckDB: the
    centroid CTE comes from ``clustering.kmeans_oracle`` — the
    INDEPENDENT single-process numpy Lloyd's (same seeded init +
    deterministic reinit rules, different execution) that the pytest
    oracle pins the distributed path against — computed here over the
    driver's sf0.01 embeddings parquet (no Ray involved). The SQL then
    assigns every vector by (distance, cluster) argmin and must match
    the engine's per-vector output hash-exactly (margins ~3e-4 >>
    float noise ~1e-12 on this data)."""
    import pyarrow.parquet as pq

    from pisa_ray.pipelines.clustering import kmeans_oracle

    t = pq.read_table(
        f"{_oracle_sf_dir()}/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    X = np.asarray(t["embedding"].combine_chunks().to_pylist(), dtype=np.float64)
    C, _ = kmeans_oracle(X, t["vec_id"].to_numpy(), k=k, seed=seed)
    cent_vals = ", ".join(
        "({}::BIGINT, [{}]::DOUBLE[])".format(
            c, ", ".join(_sql_double(v) for v in C[c])
        )
        for c in range(C.shape[0])
    )
    return f"""
            WITH centroids(cluster, c) AS (VALUES {cent_vals}),
            d AS (
                SELECT e.vec_id, ct.cluster,
                       list_distance(CAST(e.embedding AS DOUBLE[]), ct.c) AS dist
                FROM embeddings e CROSS JOIN centroids ct
            )
            SELECT vec_id, cluster FROM (
                SELECT vec_id, cluster,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dist, cluster
                       ) AS rn
                FROM d
            ) WHERE rn = 1 ORDER BY vec_id
        """


def _semantic_dedup_sql(threshold: float = 0.999, n_twins: int = 10) -> str:
    """Global all-pairs cosine replay of ``semantic_dedup`` — exact on
    this fixture because the only pairs >= threshold are the planted
    exact twins, which always co-cluster (see q_semantic_dedup)."""
    return f"""
            WITH aug AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 100000 AS vec_id, embedding
                FROM (SELECT vec_id, embedding FROM embeddings
                      ORDER BY vec_id LIMIT {n_twins})
            ),
            pairs AS (
                SELECT b.vec_id AS vec_id, a.vec_id AS dup_of,
                       round(list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])), 6) AS cosine
                FROM aug a JOIN aug b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                          CAST(a.embedding AS DOUBLE[]),
                          CAST(b.embedding AS DOUBLE[])) >= {threshold}
            )
            SELECT vec_id, dup_of, cosine FROM (
                SELECT vec_id, dup_of, cosine,
                       row_number() OVER (
                           PARTITION BY vec_id ORDER BY dup_of
                       ) AS rn
                FROM pairs
            ) WHERE rn = 1 ORDER BY vec_id
        """


def _multimodal_sql(n: int = 64, seed: int = 42) -> str:
    """The synthesis-side expected-decode manifest
    (``multimodal.synth_media_manifest`` — ground truth from the
    pre-encode PCM/pixel arrays, not from running the decoders)
    embedded as SQL literals. Pure Python, no Ray, no base tables."""
    from pisa_ray.pipelines.multimodal import synth_media_manifest

    man = synth_media_manifest(n, seed).to_pylist()
    fcols = [f"f{j}" for j in range(8)]

    def row(r: dict) -> str:
        vals = [
            f"{r['media_id']}::BIGINT",
            f"'{r['kind']}'", f"'{r['decoder']}'", f"'{r['sha256']}'",
            f"{r['n_bytes']}::BIGINT", f"{r['width']}::BIGINT",
            f"{r['height']}::BIGINT", f"{r['n_channels']}::BIGINT",
            f"{r['sample_rate_hz']}::BIGINT",
            _sql_double(r["duration_s"]),
        ] + [_sql_double(r[c]) for c in fcols]
        return "(" + ", ".join(vals) + ")"

    cols = ("media_id, kind, decoder, sha256, n_bytes, width, height, "
            "n_channels, sample_rate_hz, duration_s, " + ", ".join(fcols))
    values = ",\n            ".join(row(r) for r in man)
    return f"""
            SELECT * FROM (VALUES
            {values}
            ) AS t({cols}) ORDER BY media_id
        """


def _topn_accuracy_sql(n_items: int = 50, ks: tuple = (5, 10, 20)) -> str:
    """Window-arithmetic replay of the reference eval path (see
    q_topn_accuracy): popularity ranking with per-user train-item
    exclusion, then Recall/NDCG/MRR/Precision@K means. log2 both
    sides is IEEE-correctly rounded for these tiny integer args, and
    per-metric means are rounded at 6 decimals like the engine."""
    k_list = ", ".join(str(k) for k in ks)
    return f"""
            WITH inter AS (
                SELECT user_id, event_id % {n_items} AS item_id, event_id
                FROM events
            ),
            train AS (SELECT * FROM inter WHERE event_id % 5 <> 4),
            test AS (
                SELECT DISTINCT user_id, item_id FROM inter
                WHERE event_id % 5 = 4
            ),
            pop AS (
                SELECT item_id, count(*)::DOUBLE AS cnt
                FROM train GROUP BY item_id
            ),
            users AS (SELECT DISTINCT user_id FROM test),
            utrain AS (SELECT DISTINCT user_id, item_id FROM train),
            cand AS (
                -- reference semantics: train-clicked items are masked
                -- to -inf but STAY in the ranking (they surface at the
                -- tail, tie-broken by item index, and can still be
                -- test positives) — exactly the engine's topk over the
                -- full score vector
                SELECT u.user_id, i.item_id, coalesce(p.cnt, 0) AS cnt,
                       CASE WHEN t.item_id IS NOT NULL THEN 1 ELSE 0 END
                           AS excl
                FROM users u
                CROSS JOIN (SELECT unnest(range({n_items})) AS item_id) i
                LEFT JOIN pop p USING (item_id)
                LEFT JOIN utrain t
                  ON t.user_id = u.user_id AND t.item_id = i.item_id
            ),
            topk AS (
                SELECT user_id, item_id, rnk FROM (
                    SELECT user_id, item_id,
                           row_number() OVER (
                               PARTITION BY user_id
                               ORDER BY excl,
                                        CASE WHEN excl = 1 THEN 0
                                             ELSE cnt END DESC,
                                        item_id
                           ) AS rnk
                    FROM cand
                ) WHERE rnk <= {max(ks)}
            ),
            hits AS (
                SELECT t.user_id, t.rnk,
                       CASE WHEN te.item_id IS NOT NULL
                            THEN 1.0 ELSE 0.0 END AS hit
                FROM topk t
                LEFT JOIN test te
                  ON te.user_id = t.user_id AND te.item_id = t.item_id
            ),
            npos AS (
                SELECT user_id, count(*)::BIGINT AS np
                FROM test GROUP BY user_id
            ),
            firsthit AS (
                SELECT user_id, min(rnk) AS fr FROM hits
                WHERE hit = 1 GROUP BY user_id
            ),
            kk AS (SELECT unnest([{k_list}]) AS k),
            per_user AS (
                SELECT h.user_id, kk.k,
                       sum(CASE WHEN h.rnk <= kk.k THEN h.hit ELSE 0 END)
                           AS nhit,
                       sum(CASE WHEN h.rnk <= kk.k
                                THEN h.hit / log2(h.rnk + 1) ELSE 0 END)
                           AS dcg
                FROM hits h CROSS JOIN kk
                GROUP BY h.user_id, kk.k
            ),
            idcg AS (
                SELECT n.user_id, kk.k, sum(1.0 / log2(i.i + 1)) AS idcg
                FROM npos n CROSS JOIN kk
                JOIN (SELECT unnest(range(1, {max(ks)} + 1)) AS i) i
                  ON i.i <= least(n.np, kk.k)
                GROUP BY n.user_id, kk.k
            ),
            pu AS (
                SELECT p.user_id, p.k,
                       p.nhit / n.np AS recall,
                       p.nhit / p.k AS prec,
                       coalesce(
                           CASE WHEN f.fr <= p.k THEN 1.0 / f.fr END, 0.0
                       ) AS mrr,
                       p.dcg / i.idcg AS ndcg
                FROM per_user p
                JOIN npos n USING (user_id)
                JOIN idcg i ON i.user_id = p.user_id AND i.k = p.k
                LEFT JOIN firsthit f ON f.user_id = p.user_id
            )
            SELECT metric, value FROM (
                SELECT 'MRR@' || k AS metric, round(avg(mrr), 6) AS value,
                       k FROM pu GROUP BY k
                UNION ALL
                SELECT 'NDCG@' || k, round(avg(ndcg), 6), k
                FROM pu GROUP BY k
                UNION ALL
                SELECT 'Precision@' || k, round(avg(prec), 6), k
                FROM pu GROUP BY k
                UNION ALL
                SELECT 'Recall@' || k, round(avg(recall), 6), k
                FROM pu GROUP BY k
            ) ORDER BY metric
        """


def _phrase_values() -> str:
    from pisa_ray.pipelines.phrase import normalize_phrase

    return ", ".join(
        f"({qid}::BIGINT, '{normalize_phrase(text)}')"
        for qid, text in PHRASE_QUERIES
    )


def _pii_count_cols() -> str:
    from pisa_ray.pipelines.text import PII_PATTERNS

    return ",\n                   ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )


def _pii_count_sum() -> str:
    from pisa_ray.pipelines.text import PII_PATTERNS

    return " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for _, pat, _ in PII_PATTERNS
    )


def _pii_redact_expr() -> str:
    from pisa_ray.pipelines.text import PII_PATTERNS

    expr = "text"
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def oracle_sql() -> dict[str, str]:
    tok_docs = f"SELECT doc_id, unnest({_TOK}) AS term FROM documents"
    # literal ::BIGINT so DuckDB types query_id int64 like the engine
    # (bare small-int literals infer INT32; the driver hash is
    # dtype-sensitive — round 1's `sessions` red cell was exactly this)
    bm25_values = ", ".join(
        f"({qid}::BIGINT, '{t}')"
        for qid, text in BM25_QUERIES
        for t in sorted(set(text.split()))
    )
    conj_values = ", ".join(
        f"({qid}::BIGINT, '{t}')"
        for qid, text in CONJ_QUERIES
        for t in sorted(set(text.split()))
    )
    bm25_topk_sql = f"""
            WITH tok AS ({tok_docs}),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            q(query_id, term) AS (VALUES {bm25_values}),
            scores AS (
                SELECT q.query_id, tf.doc_id,
                       sum( ln(1 + (s.n - df.df + 0.5)/(df.df + 0.5))
                            * (tf.tf * 1.9 / (tf.tf + 0.9*(1 - 0.4 + 0.4 * dl.dl / s.avgdl))) ) AS score
                FROM q
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT sc.query_id, sc.doc_id, round(sc.score, 4) AS score,
                       row_number() OVER (
                           PARTITION BY sc.query_id
                           ORDER BY round(sc.score, 4) DESC, sc.doc_id
                       ) AS rank
                FROM scores sc
            ) WHERE rank <= 10
        """
    # TRUE BM25F replay: per-field tf/dl/avgdl CTEs, the title field
    # re-derived in SQL exactly as the entry derives it (first 8
    # filtered tokens + lower(source)), per-field length-normalized tf
    # weight-blended BEFORE the k1 saturation, idf over the per-term
    # UNION document frequency — same rounding/tie discipline as
    # bm25_topk_sql
    bm25f_values = ", ".join(
        f"({qid}::BIGINT, '{t}')"
        for qid, text in BM25F_QUERIES
        for t in sorted(set(text.split()))
    )
    bm25f_topk_sql = f"""
            WITH tok_c AS ({tok_docs}),
            tok_t AS (
                SELECT doc_id, unnest({_TOK}[1:8]) AS term FROM documents
                UNION ALL
                SELECT doc_id, lower(source) AS term FROM documents
            ),
            tf_c AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok_c GROUP BY doc_id, term),
            tf_t AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok_t GROUP BY doc_id, term),
            dl_c AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok_c GROUP BY doc_id),
            dl_t AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok_t GROUP BY doc_id),
            s_c AS (SELECT avg(dl) AS avgdl FROM dl_c),
            s_t AS (SELECT avg(dl) AS avgdl FROM dl_t),
            nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
            q(query_id, term) AS (VALUES {bm25f_values}),
            fields AS (
                SELECT term, doc_id,
                       1.0 * tf_c.tf / (1 - 0.4 + 0.4 * dl_c.dl / s_c.avgdl) AS part
                FROM tf_c JOIN dl_c USING (doc_id) CROSS JOIN s_c
                UNION ALL
                SELECT term, doc_id,
                       0.5 * tf_t.tf / (1 - 0.75 + 0.75 * dl_t.dl / s_t.avgdl) AS part
                FROM tf_t JOIN dl_t USING (doc_id) CROSS JOIN s_t
            ),
            tilde AS (
                SELECT q.query_id, f.term, f.doc_id, sum(f.part) AS tfb
                FROM q JOIN fields f USING (term)
                GROUP BY q.query_id, f.term, f.doc_id
            ),
            df_u AS (
                SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
                FROM (SELECT doc_id, term FROM tok_c
                      UNION SELECT doc_id, term FROM tok_t)
                GROUP BY term
            ),
            scores AS (
                SELECT t.query_id, t.doc_id,
                       sum( ln(1 + (nn.n - df_u.df + 0.5)/(df_u.df + 0.5))
                            * t.tfb / (0.9 + t.tfb) ) AS score
                FROM tilde t JOIN df_u USING (term) CROSS JOIN nn
                GROUP BY t.query_id, t.doc_id
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT sc.query_id, sc.doc_id, round(sc.score, 4) AS score,
                       row_number() OVER (
                           PARTITION BY sc.query_id
                           ORDER BY round(sc.score, 4) DESC, sc.doc_id
                       ) AS rank
                FROM scores sc
            ) WHERE rank <= 10
        """
    hybrid_sql = f"""
            WITH tok AS ({tok_docs}),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            q(query_id, term) AS (VALUES {bm25_values}),
            scores AS (
                SELECT q.query_id, tf.doc_id,
                       sum( ln(1 + (s.n - df.df + 0.5)/(df.df + 0.5))
                            * (tf.tf * 1.9 / (tf.tf + 0.9*(1 - 0.4 + 0.4 * dl.dl / s.avgdl))) ) AS score
                FROM q
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
                GROUP BY q.query_id, tf.doc_id
            ),
            cand AS (
                SELECT query_id, doc_id FROM (
                    SELECT sc.query_id, sc.doc_id,
                           row_number() OVER (
                               PARTITION BY sc.query_id
                               ORDER BY round(sc.score, 4) DESC, sc.doc_id
                           ) AS crank
                    FROM scores sc
                ) WHERE crank <= 15
            ),
            qe AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 8)
            SELECT query_id, rank, doc_id, cosine FROM (
                SELECT c.query_id, c.doc_id,
                       round(list_cosine_similarity(
                           CAST(qe.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])
                       ), 5) AS cosine,
                       row_number() OVER (
                           PARTITION BY c.query_id
                           ORDER BY round(list_cosine_similarity(
                               CAST(qe.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])
                           ), 5) DESC, c.doc_id
                       ) AS rank
                FROM cand c
                JOIN embeddings e ON e.vec_id = c.doc_id
                JOIN qe ON qe.query_id = c.query_id
            ) WHERE rank <= 5
        """
    out = {
        "hybrid_search": hybrid_sql,
        "distinct_hll": _hll_sql(),
        "term_stats": f"""
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS tf
            FROM (SELECT doc_id, term, count(*) AS tf FROM ({tok_docs})
                  GROUP BY doc_id, term)
            GROUP BY term
        """,
        "index_lexicon": f"""
            SELECT term, count(*) AS df
            FROM (SELECT doc_id, unnest(list_distinct({_TOK})) AS term FROM documents)
            GROUP BY term
        """,
        "index_docmap": f"""
            SELECT doc_id, len({_TOK}) AS length FROM documents
        """,
        "bm25_topk": bm25_topk_sql,
        "bm25f_topk": bm25f_topk_sql,
        # Dirichlet query likelihood (Zhai & Lafferty 2001), replayed
        # exactly: cf = per-term collection frequency, C = total token
        # count, mu = 1000, ranked set = docs matching >=1 indexed
        # query term, m = # distinct indexed query terms
        "qld_topk": f"""
            WITH tok AS ({tok_docs}),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            cf AS (SELECT term, sum(tf) AS cf FROM tf GROUP BY term),
            ctot AS (SELECT sum(dl) AS c FROM dl),
            q(query_id, term) AS (VALUES {bm25_values}),
            qm AS (SELECT q.query_id, count(*)::DOUBLE AS m
                   FROM q JOIN cf USING (term) GROUP BY q.query_id),
            acc AS (
                SELECT q.query_id, tf.doc_id,
                       sum(ln(1 + tf.tf / (1000.0 * cf.cf / ctot.c))) AS s
                FROM q
                JOIN tf USING (term)
                JOIN cf USING (term)
                CROSS JOIN ctot
                GROUP BY q.query_id, tf.doc_id
            ),
            scores AS (
                SELECT a.query_id, a.doc_id,
                       a.s + qm.m * ln(1000.0 / (dl.dl + 1000.0)) AS score
                FROM acc a
                JOIN dl USING (doc_id)
                JOIN qm USING (query_id)
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT sc.query_id, sc.doc_id, round(sc.score, 4) AS score,
                       row_number() OVER (
                           PARTITION BY sc.query_id
                           ORDER BY round(sc.score, 4) DESC, sc.doc_id
                       ) AS rank
                FROM scores sc
            ) WHERE rank <= 10
        """,
        # faceted search: conjunctive match (docs containing ALL the
        # query's distinct terms) grouped by the lang metadata column
        "facet_counts": f"""
            WITH tok AS ({tok_docs}),
            q(query_id, term) AS (VALUES {bm25_values}),
            nq AS (SELECT query_id, count(*)::BIGINT AS n FROM q GROUP BY 1),
            m AS (
                SELECT q.query_id, t.doc_id, count(*)::BIGINT AS hit
                FROM q
                JOIN (SELECT DISTINCT doc_id, term FROM tok) t USING (term)
                GROUP BY 1, 2
            )
            SELECT m.query_id, d.lang, count(*) AS n_docs
            FROM m
            JOIN nq USING (query_id)
            JOIN documents d USING (doc_id)
            -- the engine excludes null facet values (code -1) from
            -- the output; mirror that here
            WHERE m.hit = nq.n AND d.lang IS NOT NULL
            GROUP BY 1, 2
        """,
        # block-max WAND must be rank-identical to exhaustive BM25 —
        # the oracle is literally the same exhaustive-scoring SQL
        "bm25_bmw": bm25_topk_sql,
        # conjunctive = same scores, docs matching ALL the query's
        # terms (n_match == the query's distinct-term count)
        "bm25_conjunctive": f"""
            WITH tok AS ({tok_docs}),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            q(query_id, term) AS (VALUES {conj_values}),
            qn AS (SELECT query_id, count(*) AS n_terms FROM q GROUP BY query_id),
            scores AS (
                SELECT q.query_id, tf.doc_id,
                       sum( ln(1 + (s.n - df.df + 0.5)/(df.df + 0.5))
                            * (tf.tf * 1.9 / (tf.tf + 0.9*(1 - 0.4 + 0.4 * dl.dl / s.avgdl))) ) AS score,
                       count(*) AS n_match
                FROM q
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT sc.query_id, sc.doc_id, round(sc.score, 4) AS score,
                       row_number() OVER (
                           PARTITION BY sc.query_id
                           ORDER BY round(sc.score, 4) DESC, sc.doc_id
                       ) AS rank
                FROM scores sc
                JOIN qn ON qn.query_id = sc.query_id AND sc.n_match = qn.n_terms
            ) WHERE rank <= 10
        """,
        "bm25_filtered": f"""
            WITH tok AS ({tok_docs}),
            tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM tok GROUP BY doc_id),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
            df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
            q(query_id, term) AS (VALUES {bm25_values}),
            scores AS (
                SELECT q.query_id, tf.doc_id,
                       sum( ln(1 + (s.n - df.df + 0.5)/(df.df + 0.5))
                            * (tf.tf * 1.9 / (tf.tf + 0.9*(1 - 0.4 + 0.4 * dl.dl / s.avgdl))) ) AS score
                FROM q
                JOIN tf USING (term)
                JOIN df USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
                GROUP BY q.query_id, tf.doc_id
            )
            SELECT query_id, rank, doc_id, score FROM (
                SELECT sc.query_id, sc.doc_id, round(sc.score, 4) AS score,
                       row_number() OVER (
                           PARTITION BY sc.query_id
                           ORDER BY round(sc.score, 4) DESC, sc.doc_id
                       ) AS rank
                FROM scores sc {{filter_join}}
            ) WHERE rank <= 10
        """.format(
            filter_join="JOIN documents fd ON fd.doc_id = sc.doc_id AND fd.lang = 'en'"
        ),
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_rev,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT rank, c_custkey, c_name, revenue FROM (
                SELECT c.c_custkey, c.c_name, revenue,
                       row_number() OVER (ORDER BY revenue DESC, c.c_custkey) AS rank
                FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
                      FROM orders GROUP BY o_custkey) o
                JOIN customer c ON c.c_custkey = o.o_custkey
            ) WHERE rank <= 10
        """,
        "order_membership": """
            SELECT c_custkey, c_name,
                   CASE WHEN EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_custkey = c.c_custkey)
                        THEN 1 ELSE 0 END::BIGINT AS has_orders
            FROM customer c
        """,
        "heavy_hitters": """
            SELECT user_id, count(*) AS n FROM events
            GROUP BY user_id ORDER BY n DESC, user_id LIMIT 20
        """,
        "grouped_window": """
            WITH e AS (
                SELECT event_id, user_id,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            )
            SELECT event_id, user_id, cents,
                   CAST(lag(cents, 1) OVER w AS DOUBLE) AS prev_cents,
                   row_number() OVER w AS rn,
                   CAST(sum(cents) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
                   count(*) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS roll_cnt
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        """,
        "hash_join": """
            SELECT o_orderkey, o_custkey, o_totalprice, c_name
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "distinct_segments": """
            SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment
        """,
        "events_windows": """
            SELECT 'tumbling' AS kind, date_trunc('hour', ts) AS "window",
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2, 3
            UNION ALL
            -- hopping, size 2h / hop 1h: every event covers exactly 2
            -- windows. epoch_us (not epoch(..)::BIGINT, which ROUNDS
            -- sub-second fractions) so hour bucketing floors exactly
            -- like the engine
            SELECT 'hopping' AS kind,
                   make_timestamp((epoch_us(ts) // 3600000000 - k)
                                  * 3600000000) AS "window",
                   event_type, count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events, (VALUES (0), (1)) t(k)
            GROUP BY 1, 2, 3
        """,
        "topn_accuracy": _topn_accuracy_sql(),
        "snapshot_counts": """
            -- int(n*0.6) truncates in Python: use floor, then integer div
            WITH p AS (SELECT count(*) AS n,
                              floor(count(*) * 0.6)::BIGINT AS n_train FROM events),
            p2 AS (SELECT n, n_train, (n - n_train) // 5 AS incre FROM p),
            ordered AS (
                SELECT user_id, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn
                FROM events
            )
            SELECT CASE WHEN rn < n_train THEN 0
                        ELSE least(5, (rn - n_train) // incre + 1) END AS snap,
                   count(*) AS n_rows, count(DISTINCT user_id) AS n_users
            FROM ordered CROSS JOIN p2
            GROUP BY 1
        """,
        "sessions": """
            WITH gaps AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                                 OR lag(ts) OVER w IS NULL
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            labeled AS (
                SELECT user_id, ts,
                       CAST(sum(new_sess) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS BIGINT) AS session_id
                FROM gaps
            )
            SELECT user_id, session_id, min(ts) AS session_start,
                   count(*) AS n_events
            FROM labeled GROUP BY user_id, session_id
        """,
        "asof_last_error": """
            SELECT l.event_id, l.ts, l.user_id, round(l.value, 2) AS value,
                   r.ts AS ts_right, round(r.value, 2) AS value_right
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
              ON l.user_id = r.user_id AND r.ts <= l.ts
        """,
        "price_bands": """
            SELECT b.band, count(*) AS n, round(sum(l.l_extendedprice), 2) AS rev
            FROM lineitem l
            JOIN (VALUES ('low', 0.0, 20000.0), ('mid', 20000.0, 40000.0),
                         ('high', 40000.0, 60000.0), ('lux', 60000.0, 1e18))
                 b(band, lo, hi)
              ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
            GROUP BY b.band
        """,
        "quantiles": """
            -- quantile params must be constants: list form + unnest
            WITH ql AS (SELECT quantile_disc(l_extendedprice,
                            [0.01, 0.25, 0.5, 0.75, 0.99]) AS v
                        FROM lineitem)
            SELECT t.q::DOUBLE AS q, v[t.i] AS l_extendedprice
            FROM ql, (VALUES (1, 0.01), (2, 0.25), (3, 0.5),
                             (4, 0.75), (5, 0.99)) t(i, q)
        """,
        "stratified_sample": """
            SELECT event_id, event_type, user_id FROM (
                SELECT event_id, event_type, user_id,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY ((event_id % 2147483648) * 2654435761)
                                    % 4294967296, event_id
                       ) AS rn
                FROM events
            ) WHERE rn <= 5
        """,
        "user_top_events": """
            SELECT user_id, event_type, n, rank FROM (
                SELECT user_id, event_type, n,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY n DESC, event_type
                       ) AS rank
                FROM (SELECT user_id, event_type, count(*) AS n
                      FROM events GROUP BY 1, 2)
            ) WHERE rank <= 3
        """,
        "nation_region": """
            SELECT r.r_name, count(*) AS n_nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "jaccard_pairs": f"""
            WITH {_jaccard_ctes("documents")}
            SELECT id_a, id_b, jaccard FROM jac
        """,
        "dup_clusters": f"""
            WITH RECURSIVE docs_aug AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, text || ' zz9 qq8 vv7' FROM documents
                UNION ALL
                SELECT doc_id + 2000000, text FROM documents
            ),
            {_jaccard_ctes("docs_aug")},
            edges AS (
                SELECT id_a AS u, id_b AS v FROM jac
                UNION SELECT id_b, id_a FROM jac
            ),
            walk AS (
                SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
                UNION
                SELECT e.u, w.lbl FROM edges e JOIN walk w ON e.v = w.u
            ),
            cl AS (
                SELECT u AS doc_id, min(lbl) AS canon_id FROM walk GROUP BY u
            ),
            ranked AS (
                SELECT cl.doc_id, cl.canon_id,
                       row_number() OVER (
                           PARTITION BY cl.canon_id
                           ORDER BY length(d.text) DESC, cl.doc_id
                       ) AS rn
                FROM cl JOIN docs_aug d USING (doc_id)
            )
            SELECT doc_id, canon_id,
                   CASE WHEN rn = 1 THEN 1 ELSE 0 END::BIGINT AS keep
            FROM ranked
        """,
        "split_mix": """
            SELECT doc_id, 'split' AS kind,
                   CASE WHEN h < 3435973836 THEN 'train'
                        WHEN h < 3865470566 THEN 'validation'
                        ELSE 'test' END AS label
            FROM (SELECT doc_id,
                         (doc_id % 2147483648) * 2654435761 % 4294967296 AS h
                  FROM documents)
            UNION ALL
            SELECT doc_id, 'mix' AS kind, source AS label FROM (
                SELECT doc_id, source,
                       (doc_id % 2147483648) * 2654435761 % 4294967296 AS h,
                       CASE source WHEN 'src0' THEN 4294967296
                                   WHEN 'src1' THEN 2147483648
                                   WHEN 'src2' THEN 858993459
                                   ELSE 429496729 END AS t
                FROM documents)
            WHERE h < t
        """,
        "dup_spans": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            g AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS gram
                  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
                        FROM toks)),
            df AS (SELECT gram, count(DISTINCT doc_id) AS nd
                   FROM g GROUP BY gram),
            j AS (SELECT doc_id, CASE WHEN nd > 1 THEN 1 ELSE 0 END AS x
                  FROM g JOIN df USING (gram))
            SELECT doc_id, count(*)::BIGINT AS n_grams,
                   sum(x)::BIGINT AS n_dup,
                   round(sum(x)::DOUBLE / count(*), 4) AS dup_fraction
            FROM j GROUP BY doc_id
        """,
        "pack_sequences": f"""
            WITH t AS (SELECT doc_id, len({_TOK}) AS n FROM documents),
            o AS (SELECT doc_id, n,
                         CAST(coalesce(SUM(n) OVER (
                             ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                         ), 0) AS BIGINT) AS off
                  FROM t),
            s AS (SELECT doc_id, n, off,
                         unnest(range(off // 128, (off + n - 1) // 128 + 1)) AS seq_id
                  FROM o WHERE n > 0)
            SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
                   CAST(greatest(0, seq_id * 128 - off) AS BIGINT) AS tok_start,
                   CAST(least(n, (seq_id + 1) * 128 - off) AS BIGINT) AS tok_end
            FROM s
        """,
        "doc_chunks": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS tk FROM documents),
            n AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
            s AS (SELECT doc_id, tk, n,
                         unnest(range(0, greatest(n - 16, 1), 48)) AS st
                  FROM n)
            SELECT doc_id,
                   CAST(st // 48 AS BIGINT) AS chunk_id,
                   CAST(least(64, n - st) AS BIGINT) AS n_tokens,
                   array_to_string(tk[st+1:st+64], ' ') AS chunk_text
            FROM s
        """,
        # brute-force AND IVF-Flat-at-full-probe ride the same
        # exact-top-k oracle (full-probe IVF is exact — every doc lives
        # in exactly one cluster and every list is probed; identity to
        # brute_knn pytest-pinned)
        "knn": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 5),
            exact AS (
                SELECT query_id, rank, vec_id, cosine FROM (
                    SELECT q.query_id, e.vec_id,
                           round(list_cosine_similarity(
                               CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])
                           ), 5) AS cosine,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY round(list_cosine_similarity(
                                   CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])
                               ), 5) DESC, e.vec_id
                           ) AS rank
                    FROM q CROSS JOIN embeddings e
                ) WHERE rank <= 5
            )
            SELECT 'brute' AS method, * FROM exact
            UNION ALL
            SELECT 'ivf' AS method, * FROM exact
        """,
        # fingerprint is checked through its equivalence classes: the
        # FNV-1a token-stream hash groups (docs ∪ separator-mangled
        # twins) exactly as grouping by the normalized token string
        # (whitespace-insensitive, order-sensitive) — which DuckDB can
        # compute even though it cannot compute the hash itself
        "fingerprint": f"""
            WITH u AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000, replace(text, ' ', '  ;; ')
                FROM documents
            ),
            n AS (
                SELECT doc_id, array_to_string({_TOK}, ' ') AS norm FROM u
            )
            SELECT doc_id, min(doc_id) OVER (PARTITION BY norm) AS canon_id
            FROM n
        """,
        "pagerank": _pagerank_sql(),
        "minhash_dedup": _minhash_sql(),
        "simhash": _simhash_sql(),
        # exact phrase match = the normalized phrase as a contiguous
        # token subsequence = substring of the space-joined token
        # stream (space sentinels keep probes token-aligned)
        "phrase_search": f"""
            WITH j AS (
                SELECT doc_id, ' ' || array_to_string({_TOK}, ' ') || ' ' AS s
                FROM documents
            ),
            q(query_id, phrase) AS (VALUES {_phrase_values()})
            SELECT q.query_id, j.doc_id
            FROM q JOIN j ON contains(j.s, ' ' || q.phrase || ' ')
        """,
        "decontaminate": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            g AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(t) - {DECONTAM_K} + 2),
                    i -> array_to_string(list_slice(t, i, i + {DECONTAM_K} - 1), ' ')
                ))) AS gram
                FROM toks WHERE len(t) >= {DECONTAM_K}
            ),
            bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
            ov AS (
                SELECT doc_id, count(*) AS n_overlap
                FROM g JOIN bench USING (gram)
                WHERE doc_id % 97 <> 0 GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
                   coalesce(ov.n_overlap, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
            LEFT JOIN ov USING (doc_id)
        """,
        "pii_scan": f"""
            WITH aug AS ({_PII_AUG_SQL})
            SELECT doc_id,
                   {_pii_count_cols()},
                   ({_pii_count_sum()}) > 0 AS has_pii,
                   {_pii_redact_expr()} AS redacted
            FROM aug
        """,
        "tfidf_keywords": f"""
            WITH tk AS (SELECT doc_id, {_TOK} AS toks FROM documents),
            flat AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
            tf AS (
                SELECT doc_id, tok, count(*) AS tf
                FROM flat GROUP BY doc_id, tok
            ),
            df AS (
                SELECT tok, count(DISTINCT doc_id) AS df
                FROM flat GROUP BY tok
            ),
            nn AS (SELECT count(*) AS n FROM documents),
            sc AS (
                -- round half-up at 4 decimals BEFORE ranking (the
                -- engine ranks on the rounded score too, so the top-k
                -- cut is identical)
                SELECT tf.doc_id, tf.tok AS keyword,
                       round(tf.tf * ln((nn.n + 1.0) / (df.df + 1.0)), 4)
                           AS score
                FROM tf JOIN df USING (tok), nn
            )
            SELECT doc_id, keyword, kw_rank, score FROM (
                SELECT doc_id, keyword, score,
                       row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY score DESC, keyword
                       ) AS kw_rank
                FROM sc
            ) WHERE kw_rank <= 3
        """,
        "text_stats": f"""
            WITH tk AS (SELECT doc_id, {_TOK} AS toks, text FROM documents),
            flat AS (
                SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS i
                FROM tk
            ),
            tops AS (
                SELECT doc_id, max(c) AS top FROM (
                    SELECT doc_id, tok, count(*) AS c
                    FROM flat GROUP BY doc_id, tok
                ) GROUP BY doc_id
            ),
            bia AS (
                SELECT a.doc_id, count(*) AS n2,
                       count(DISTINCT a.tok || chr(1) || b.tok) AS d2
                FROM flat a JOIN flat b
                  ON a.doc_id = b.doc_id AND b.i = a.i + 1
                GROUP BY a.doc_id
            )
            SELECT tk.doc_id,
                   len(toks) AS n_tokens,
                   length(text) AS n_chars,
                   len(list_distinct(toks)) AS n_distinct,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE round(
                            list_sum(list_transform(toks, x -> length(x)))
                            / len(toks), 4)
                   END AS avg_token_len,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE round(tops.top::DOUBLE / len(toks), 4)
                   END AS top_token_frac,
                   CASE WHEN coalesce(bia.n2, 0) = 0 THEN 0.0
                        ELSE round(1.0 - bia.d2::DOUBLE / bia.n2, 4)
                   END AS dup_2gram_frac,
                   len(list_filter(toks,
                       x -> list_contains(['a','and','for','in','is','it','of','that','the','to','with'], x)
                   )) AS n_stop_en,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                   li.lang, li.pred_lang
            FROM tk
            LEFT JOIN tops USING (doc_id)
            LEFT JOIN bia USING (doc_id)
            JOIN ({_lang_id_sql()}) li USING (doc_id)
        """,
        "unigram_nll": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_TOK}) AS term FROM documents
            ),
            tf AS (
                SELECT term, count(*)::DOUBLE AS tf FROM tok GROUP BY term
            ),
            tot AS (SELECT sum(tf) AS total FROM tf)
            SELECT tok.doc_id,
                   count(*) AS n_tokens,
                   round(-avg(ln(tf.tf / (SELECT total FROM tot))), 6) AS nll
            FROM tok JOIN tf USING (term)
            GROUP BY tok.doc_id
        """,
        "semantic_dedup": _semantic_dedup_sql(),
        "multimodal_decode": _multimodal_sql(),
    }
    # the kmeans oracle alone needs the embeddings parquet on disk
    # (numpy reference centroids -> literals); an environment without
    # it degrades THAT entry to rows-only instead of breaking every
    # oracle in this dict
    try:
        out["kmeans_clusters"] = _kmeans_sql()
    except OSError:
        pass
    return out
