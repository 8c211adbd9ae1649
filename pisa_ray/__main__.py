"""CLI entry point — the ``ray job submit`` surface.

On a real cluster:

    ray job submit --working-dir . -- python -m pisa_ray build \\
        --corpus s3://bucket/code-parquet/ --index /mnt/shared/idx \\
        --bucket-bits 12 --term-parts 256

    ray job submit --working-dir . -- python -m pisa_ray query \\
        --index /mnt/shared/idx --queries queries.parquet --k 10

Locally the same commands run against ``ray.init(address="local")``.
This is the only module in the package that may own a Ray session
(guarded — under ``ray job submit`` the session already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m pisa_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--corpus", required=True, help="parquet/csv/tsv/jsonl dir or file")
    b.add_argument("--index", required=True)
    b.add_argument("--bucket-bits", type=int, default=3)
    b.add_argument("--term-parts", type=int, default=64)
    b.add_argument("--lineage-parts", type=int, default=4)
    b.add_argument("--id-col", default=None)
    b.add_argument("--content-col", default="content")
    b.add_argument("--key-cols", default="repo,path,commit")
    b.add_argument("--meta-cols", default="lang")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--per-bucket-merge", action="store_true")
    b.add_argument(
        "--codec",
        default="varint",
        choices=["varint", "packed"],
        help="posting-stream codec: LEB128 varints or block-wise "
        "bit packing (SIMD-BP128-style)",
    )
    b.add_argument(
        "--positions",
        action="store_true",
        help="store within-doc token positions (index-native phrase/"
        "proximity queries)",
    )
    b.add_argument(
        "--analyzer",
        default="simple",
        choices=["simple", "code", "porter", "code_porter"],
        help="'code' splits camelCase/snake_case identifiers into "
        "sub-tokens; 'porter'/'code_porter' add Porter stemming",
    )

    a = sub.add_parser("append", help="append a delta corpus as a new generation")
    a.add_argument("--corpus", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--generation", required=True)

    u = sub.add_parser(
        "upsert",
        help="replace existing versions of the delta's docs and add new "
        "ones (delete -> compact -> append)",
    )
    u.add_argument("--corpus", required=True)
    u.add_argument("--index", required=True)
    u.add_argument("--generation", required=True)

    mt = sub.add_parser(
        "maintain",
        help="compaction policy: fold generations / purge tombstones "
        "when thresholds are crossed",
    )
    mt.add_argument("--index", required=True)
    mt.add_argument("--max-generations", type=int, default=4)
    mt.add_argument("--max-tombstone-fraction", type=float, default=0.2)

    c = sub.add_parser(
        "compact",
        help="merge generations into single runs (and purge tombstones)",
    )
    c.add_argument("--index", required=True)

    an = sub.add_parser(
        "analyze",
        help="show how text tokenizes under an analyzer (or an "
        "index's analyzer) — the Elasticsearch _analyze analog",
    )
    an.add_argument("--text", required=True)
    an.add_argument(
        "--analyzer",
        default=None,
        choices=["simple", "code", "porter", "code_porter"],
    )
    an.add_argument("--index", default=None,
                    help="use this index's recorded analyzer")

    rc = sub.add_parser(
        "recode",
        help="re-encode posting segments with a different codec from "
        "the existing tokenized/ store (no re-tokenize)",
    )
    rc.add_argument("--index", required=True)
    rc.add_argument("--codec", required=True, choices=["varint", "packed"])

    d = sub.add_parser(
        "delete",
        help="tombstone documents (masked immediately; purged at compact)",
    )
    d.add_argument("--index", required=True)
    grp = d.add_mutually_exclusive_group(required=True)
    grp.add_argument("--ids", default=None, help="comma-separated doc ids")
    grp.add_argument(
        "--ids-parquet", default=None, help="parquet file with a doc_id column"
    )
    grp.add_argument("--where", default=None, help="col=value metadata predicate")

    pr = sub.add_parser(
        "profile",
        help="one-pass per-column profile of a parquet table (counts, "
        "min/max, HLL distinct, sketch quantiles, heavy values)",
    )
    pr.add_argument("--table", required=True, help="parquet dir or file")
    pr.add_argument("--columns", default=None, help="comma-separated (default: all)")
    pr.add_argument("--quantiles", default="0.25,0.5,0.75")
    pr.add_argument("--top-k", type=int, default=10)

    inf = sub.add_parser(
        "info", help="index stats, config, components and memory breakdown"
    )
    inf.add_argument("--index", required=True)

    fs = sub.add_parser(
        "fsck",
        help="index integrity check: decode every run, verify df/cf/"
        "block metadata, lexicon sums, docmap invariants",
    )
    fs.add_argument("--index", required=True)
    fs.add_argument("--max-errors", type=int, default=20)

    sg = sub.add_parser(
        "suggest", help="search-box term completion from the index lexicon"
    )
    sg.add_argument("--index", required=True)
    sg.add_argument("--prefix", required=True)
    sg.add_argument("--k", type=int, default=10)

    gp = sub.add_parser(
        "grep",
        help="regex search over the corpus (RE2 pattern), pruned "
        "through the index where the pattern's required literals allow",
    )
    gp.add_argument("--index", required=True)
    gp.add_argument("--corpus", required=True, help="corpus parquet path")
    gp.add_argument("--pattern", required=True)
    gp.add_argument("--id-col", default="doc_id")
    gp.add_argument("--text-col", default="text")

    ml = sub.add_parser(
        "mlt",
        help="MoreLikeThis: top-k documents similar to the given ones, "
        "queried from their own most-representative index terms",
    )
    ml.add_argument("--index", required=True)
    ml.add_argument(
        "--doc-ids", required=True,
        help="comma-separated source document ids",
    )
    ml.add_argument("--k", type=int, default=10)
    ml.add_argument("--max-query-terms", type=int, default=25)
    ml.add_argument("--min-tf", type=int, default=2)
    ml.add_argument("--min-df", type=int, default=2)

    ex = sub.add_parser(
        "explain",
        help="per-term BM25 score breakdown for one document "
        "(Lucene-explain analog; total is bit-identical to TAAT)",
    )
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("--doc-id", required=True, type=int)

    ph = sub.add_parser(
        "phrase",
        help="exact phrase (or proximity-window) matching; index-native "
        "on positional indexes, prune+corpus-verify otherwise",
    )
    ph.add_argument("--index", required=True)
    ph.add_argument("--queries", required=True, help="parquet with (query_id, text)")
    ph.add_argument(
        "--window",
        type=int,
        default=None,
        help="unordered proximity within this token span instead of "
        "exact adjacency",
    )
    ph.add_argument(
        "--corpus",
        default=None,
        help="corpus parquet (required only for a positions=False "
        "index: the verify pass re-reads candidate text)",
    )
    ph.add_argument("--text-col", default="text")
    ph.add_argument("--id-col", default="doc_id")
    ph.add_argument("--shards", type=int, default=1)
    ph.add_argument("--out", default=None)

    q = sub.add_parser("query", help="run BM25 top-k queries")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="parquet with (query_id, text)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument(
        "--method",
        default="auto",
        choices=["auto", "taat", "bmw", "conj", "bool", "qld", "maxscore", "rm3"],
    )
    q.add_argument("--concurrency", type=int, default=4)
    q.add_argument("--fb-docs", type=int, default=10, help="rm3: feedback docs")
    q.add_argument("--fb-terms", type=int, default=10, help="rm3: expansion terms")
    q.add_argument(
        "--orig-weight", type=float, default=0.5,
        help="rm3: original-query interpolation weight (1.0 = no feedback)",
    )
    q.add_argument("--out", default=None, help="output parquet dir (default: stdout)")
    q.add_argument("--filter", default=None, help="col=value metadata predicate")
    q.add_argument(
        "--expand",
        default=None,
        choices=["prefix", "fuzzy1", "wildcard"],
        help="query-time term expansion (merg* prefixes / typo "
        "tolerance / m?rge* globs)",
    )
    q.add_argument(
        "--synonyms",
        default=None,
        help="JSON file mapping terms to synonym lists (query-time "
        "OR expansion, analyzed with the index's analyzer)",
    )

    fq = sub.add_parser(
        "fieldquery",
        help="multi-field search across per-field indexes over one "
        "corpus (weighted-sum BM25 merge, or true BM25F with --bm25f)",
    )
    fq.add_argument(
        "--fields",
        required=True,
        help="comma list dir:weight (weighted-sum) or dir:weight:b "
        "(per-field length-norm b, used by --bm25f; default 0.75)",
    )
    fq.add_argument("--queries", required=True, help="parquet with (query_id, text)")
    fq.add_argument("--k", type=int, default=10)
    fq.add_argument(
        "--bm25f", action="store_true",
        help="true BM25F: blend per-field tf before saturation, idf "
        "over the exact union df",
    )
    fq.add_argument("--k1", type=float, default=0.9, help="bm25f saturation")
    fq.add_argument("--concurrency", type=int, default=4)
    fq.add_argument("--out", default=None, help="output parquet path")

    s = sub.add_parser(
        "serve",
        help="persistent scorer pool: answer a query burst (optionally "
        "bucket-sharded pools, the multi-node serving shape)",
    )
    s.add_argument("--index", required=True)
    s.add_argument("--queries", required=True, help="parquet with (query_id, text)")
    s.add_argument("--k", type=int, default=10)
    s.add_argument(
        "--method",
        default="auto",
        choices=["auto", "taat", "bmw", "conj", "bool", "qld", "maxscore"],
    )
    s.add_argument("--actors", type=int, default=4, help="scorer actors (per shard)")
    s.add_argument(
        "--shards",
        type=int,
        default=1,
        help="split the index's docID buckets across this many shard pools",
    )
    s.add_argument(
        "--term-shards",
        type=int,
        default=1,
        help="vocabulary-partitioned pool instead: each actor holds 1/S of "
        "the TERM dictionary's postings (taat-exact; excludes --shards, "
        "--method, --filter work as usual except method is fixed taat)",
    )
    s.add_argument(
        "--prune",
        action="store_true",
        help="with --term-shards: TPUT-style three-phase pruned protocol "
        "(only candidate docs' exact partial rows cross the wire; results "
        "stay bit-identical to TAAT)",
    )
    s.add_argument("--filter", default=None, help="col=value metadata predicate")
    s.add_argument("--repeat", type=int, default=1, help="re-run the burst N times (warm-pool QPS)")
    s.add_argument("--out", default=None, help="output parquet dir (default: summary to stdout)")

    args = p.parse_args(argv)
    _ensure_ray()
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.cmd == "build":
        from pisa_ray.build import IndexConfig, build_index

        cfg = IndexConfig(
            bucket_bits=args.bucket_bits,
            term_parts=args.term_parts,
            lineage_parts=args.lineage_parts,
            id_col=args.id_col,
            content_col=args.content_col,
            key_cols=tuple(x for x in args.key_cols.split(",") if x) if not args.id_col else (),
            meta_cols=tuple(x for x in args.meta_cols.split(",") if x),
            per_bucket_merge=args.per_bucket_merge,
            analyzer=args.analyzer,
            positions=args.positions,
            codec=args.codec,
        )
        man = build_index(args.corpus, args.index, cfg, resume=not args.no_resume)
        print(json.dumps(man["stats"]))
    elif args.cmd == "append":
        from pisa_ray.build import build_incremental

        man = build_incremental(args.corpus, args.index, args.generation)
        print(json.dumps(man["stats"]))
    elif args.cmd == "phrase":
        import json as _json

        import pyarrow.parquet as pq

        with open(os.path.join(args.index, "stats.json")) as f:
            has_pos = bool(_json.load(f).get("positions", False))
        qt = pq.read_table(args.queries)
        qlist = [
            (int(a), str(b))
            for a, b in zip(qt["query_id"].to_pylist(), qt["text"].to_pylist())
        ]
        if has_pos:
            from pisa_ray.pipelines import phrase as ph_mod

            if args.window is not None:
                df = (
                    ph_mod.proximity_search_sharded(
                        qlist, args.index, args.window, n_shards=args.shards
                    )
                    if args.shards > 1
                    else ph_mod.proximity_search_index(qlist, args.index, args.window)
                )
            else:
                df = (
                    ph_mod.phrase_search_sharded(qlist, args.index, n_shards=args.shards)
                    if args.shards > 1
                    else ph_mod.phrase_search_index(qlist, args.index)
                )
        else:
            if not args.corpus:
                raise SystemExit(
                    "this index has no positional payload; pass --corpus "
                    "for the prune+verify path (or rebuild with --positions)"
                )
            import ray.data as rd

            from pisa_ray.pipelines import phrase as ph_mod

            corpus = rd.read_parquet(args.corpus)
            if args.window is not None:
                df = ph_mod.proximity_search(
                    qlist, args.index, corpus, args.window,
                    text_col=args.text_col, id_col=args.id_col,
                )
            else:
                df = ph_mod.phrase_search(
                    qlist, args.index, corpus,
                    text_col=args.text_col, id_col=args.id_col,
                )
        if args.out:
            import pyarrow as pa_

            pq.write_table(pa_.Table.from_pandas(df), args.out)
            print(json.dumps({"rows": len(df), "out": args.out}))
        else:
            for row in df.itertuples(index=False):
                print(json.dumps(row._asdict()))
    elif args.cmd == "upsert":
        from pisa_ray.build import upsert_docs

        man = upsert_docs(args.corpus, args.index, args.generation)
        print(json.dumps(man["stats"]))
    elif args.cmd == "maintain":
        from pisa_ray.build import maintain_index

        ran = maintain_index(
            args.index,
            max_generations=args.max_generations,
            max_tombstone_fraction=args.max_tombstone_fraction,
        )
        print(json.dumps({"compacted": bool(ran)}))
    elif args.cmd == "analyze":
        from pisa_ray.tokenizer import tokenize_py

        analyzer = args.analyzer
        if args.index:
            from pisa_ray.scorer import IndexReader

            analyzer = IndexReader(args.index).analyzer
        analyzer = analyzer or "simple"
        print(
            json.dumps(
                {"analyzer": analyzer,
                 "tokens": tokenize_py(args.text, analyzer)}
            )
        )
    elif args.cmd == "recode":
        from pisa_ray.build import recode_index

        man = recode_index(args.index, args.codec)
        print(json.dumps({"codec": man["config"]["codec"],
                          "stats": man.get("stats", {})}))
    elif args.cmd == "fsck":
        from pisa_ray.fsck import check_index

        rep = check_index(args.index, max_errors=args.max_errors)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 1
    elif args.cmd == "compact":
        from pisa_ray.build import compact_index

        compact_index(args.index)
        print(json.dumps({"status": "compacted"}))
    elif args.cmd == "delete":
        from pisa_ray.delete import delete_docs, delete_where

        if args.where:
            col, _, val = args.where.partition("=")
            n = delete_where(args.index, col, val)
        else:
            if args.ids_parquet:
                import pyarrow.parquet as pq

                ids = pq.read_table(args.ids_parquet, columns=["doc_id"])[
                    "doc_id"
                ].to_pylist()
            else:
                ids = [int(x) for x in args.ids.split(",") if x]
            n = delete_docs(args.index, ids)
        print(json.dumps({"tombstoned": n}))
    elif args.cmd == "info":
        import glob as _glob

        from pisa_ray.delete import load_tombstones
        from pisa_ray.scorer import IndexReader

        reader = IndexReader(args.index)
        seg_files = _glob.glob(
            os.path.join(args.index, "segments", "**", "*.parquet"), recursive=True
        )
        gens = sorted(
            os.path.basename(p)
            for p in _glob.glob(os.path.join(args.index, "generations", "*"))
        )
        tomb = load_tombstones(args.index)
        man_path = os.path.join(args.index, "manifest.json")
        cfg = {}
        if os.path.exists(man_path):
            with open(man_path) as f:
                cfg = json.load(f).get("config", {})
        print(
            json.dumps(
                {
                    "stats": reader.stats,
                    "config": cfg,
                    "n_terms": len(reader.df),
                    "n_segment_files": len(seg_files),
                    "segment_bytes": sum(os.path.getsize(f) for f in seg_files),
                    "generations": gens,
                    "n_tombstones": int(tomb.size) if tomb is not None else 0,
                    "memory": reader.resident_bytes(),
                }
            )
        )
    elif args.cmd == "suggest":
        from pisa_ray.scorer import IndexReader

        reader = IndexReader(args.index)
        for term, df in reader.suggest(args.prefix, args.k):
            print(json.dumps({"term": term, "df": df}))
    elif args.cmd == "explain":
        from pisa_ray.scorer import explain_score

        print(json.dumps(explain_score(args.index, args.query, args.doc_id)))
    elif args.cmd == "grep":
        import ray.data as rd

        from pisa_ray.pipelines.phrase import regex_search

        out = regex_search(
            [(0, args.pattern)],
            args.index,
            rd.read_parquet(args.corpus),
            text_col=args.text_col,
            id_col=args.id_col,
        )
        for row in out.itertuples(index=False):
            print(json.dumps({"doc_id": int(row.doc_id)}))
    elif args.cmd == "mlt":
        from pisa_ray.pipelines.feedback import more_like_this

        ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
        out = more_like_this(
            ids, args.index, k=args.k,
            max_query_terms=args.max_query_terms,
            min_tf=args.min_tf, min_df=args.min_df,
        )
        for row in out.itertuples(index=False):
            print(json.dumps(row._asdict()))
    elif args.cmd == "profile":
        import ray.data as rd

        from pisa_ray.pipelines.profile import profile

        cols = (
            [x for x in args.columns.split(",") if x] if args.columns else None
        )
        qs = tuple(float(x) for x in args.quantiles.split(",") if x)
        out = profile(
            rd.read_parquet(args.table), columns=cols, quantiles=qs,
            top_k=args.top_k,
        )
        print(json.dumps(out, default=float))
    elif args.cmd == "query":
        import ray.data as rd

        from pisa_ray.scorer import query_index

        doc_filter = None
        if args.filter:
            col, _, val = args.filter.partition("=")
            doc_filter = (col, val)
        if args.method == "rm3":
            import pyarrow.parquet as pq

            from pisa_ray.pipelines.feedback import query_index_rm3

            if doc_filter or args.expand or args.synonyms:
                raise SystemExit(
                    "--method rm3 does not combine with --filter/--expand/--synonyms"
                )
            qt = pq.read_table(args.queries)
            df = query_index_rm3(
                [
                    (int(a), str(b))
                    for a, b in zip(
                        qt["query_id"].to_pylist(), qt["text"].to_pylist()
                    )
                ],
                args.index,
                k=args.k,
                fb_docs=args.fb_docs,
                fb_terms=args.fb_terms,
                orig_weight=args.orig_weight,
                concurrency=args.concurrency,
            )
            if args.out:
                import pyarrow as pa_

                pq.write_table(pa_.Table.from_pandas(df), args.out)
                print(json.dumps({"rows": len(df), "out": args.out}))
            else:
                for row in df.itertuples(index=False):
                    print(json.dumps(row._asdict()))
            return 0
        synonyms = None
        if args.synonyms:
            with open(args.synonyms) as f:
                synonyms = json.load(f)
        hits = query_index(
            rd.read_parquet(args.queries),
            args.index,
            k=args.k,
            method=args.method,
            concurrency=args.concurrency,
            doc_filter=doc_filter,
            expand=args.expand,
            synonyms=synonyms,
        )
        if args.out:
            hits.write_parquet(args.out)
            print(json.dumps({"rows": hits.count(), "out": args.out}))
        else:
            for row in hits.to_pandas().itertuples(index=False):
                print(json.dumps(row._asdict()))
    elif args.cmd == "fieldquery":
        import pyarrow as pa_
        import pyarrow.parquet as pq

        qt = pq.read_table(args.queries)
        queries = [
            (int(a), str(b))
            for a, b in zip(qt["query_id"].to_pylist(), qt["text"].to_pylist())
        ]
        specs = []
        for spec in args.fields.split(","):
            parts = spec.split(":")
            if len(parts) == 2:
                specs.append((parts[0], float(parts[1]), 0.75))
            elif len(parts) == 3:
                specs.append((parts[0], float(parts[1]), float(parts[2])))
            else:
                raise SystemExit(f"bad --fields entry {spec!r} (dir:weight[:b])")
        if args.bm25f:
            from pisa_ray.pipelines.fields import bm25f_search

            df = bm25f_search(
                queries, specs, k=args.k, k1=args.k1,
                concurrency=args.concurrency,
            )
        else:
            from pisa_ray.pipelines.fields import multifield_search

            df = multifield_search(
                queries, [(d, w) for d, w, _ in specs], k=args.k,
                concurrency=args.concurrency,
            )
        if args.out:
            pq.write_table(pa_.Table.from_pandas(df), args.out)
            print(json.dumps({"rows": len(df), "out": args.out}))
        else:
            for row in df.itertuples(index=False):
                print(json.dumps(row._asdict()))
        return 0

    elif args.cmd == "serve":
        import time

        import pyarrow.parquet as pq

        from pisa_ray.serve import (
            BM25Service,
            ShardedBM25Service,
            TermShardedBM25Service,
        )

        doc_filter = None
        if args.filter:
            col, _, val = args.filter.partition("=")
            doc_filter = (col, val)
        queries = pq.read_table(args.queries)
        if args.prune and args.term_shards <= 1:
            raise SystemExit("--prune requires --term-shards > 1")
        if args.term_shards > 1:
            if args.shards > 1:
                raise SystemExit(
                    "--term-shards and --shards are alternative layouts; "
                    "pick one"
                )
            if args.method not in ("auto", "taat"):
                raise SystemExit(
                    "--term-shards serves the exact TAAT ranking (partial "
                    f"sums merge bit-identically); --method {args.method} "
                    "is not available on this layout"
                )
            svc = TermShardedBM25Service(
                args.index,
                n_shards=args.term_shards,
                k=args.k,
                doc_filter=doc_filter,
                prune=args.prune,
            )
        elif args.shards > 1:
            with open(os.path.join(args.index, "manifest.json")) as f:
                bucket_bits = json.load(f)["config"].get("bucket_bits", 3)
            n_buckets = 1 << bucket_bits
            n_shards = min(args.shards, n_buckets)
            shards = [
                {b for b in range(n_buckets) if b % n_shards == s}
                for s in range(n_shards)
            ]
            svc = ShardedBM25Service(
                args.index,
                shards,
                k=args.k,
                method=args.method,
                actors_per_shard=args.actors,
                doc_filter=doc_filter,
            )
        else:
            svc = BM25Service(
                args.index,
                k=args.k,
                method=args.method,
                num_actors=args.actors,
                doc_filter=doc_filter,
            )
        t0 = time.perf_counter()
        for _ in range(args.repeat):
            hits = svc.query(queries)
        dt = (time.perf_counter() - t0) / max(1, args.repeat)
        svc.shutdown()
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(hits, os.path.join(args.out, "hits.parquet"))
        print(
            json.dumps(
                {
                    "queries": queries.num_rows,
                    "hits": hits.num_rows,
                    "burst_sec": round(dt, 4),
                    "qps": round(queries.num_rows / dt, 1) if dt else None,
                    **({"out": args.out} if args.out else {}),
                }
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
