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

    a = sub.add_parser("append", help="append a delta corpus as a new generation")
    a.add_argument("--corpus", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--generation", required=True)

    c = sub.add_parser("compact", help="merge generations into single runs")
    c.add_argument("--index", required=True)

    q = sub.add_parser("query", help="run BM25 top-k queries")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="parquet with (query_id, text)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--method", default="auto", choices=["auto", "taat", "bmw"])
    q.add_argument("--concurrency", type=int, default=4)
    q.add_argument("--out", default=None, help="output parquet dir (default: stdout)")
    q.add_argument("--filter", default=None, help="col=value metadata predicate")

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
        )
        man = build_index(args.corpus, args.index, cfg, resume=not args.no_resume)
        print(json.dumps(man["stats"]))
    elif args.cmd == "append":
        from pisa_ray.build import build_incremental

        man = build_incremental(args.corpus, args.index, args.generation)
        print(json.dumps(man["stats"]))
    elif args.cmd == "compact":
        from pisa_ray.build import compact_index

        compact_index(args.index)
        print(json.dumps({"status": "compacted"}))
    elif args.cmd == "query":
        import ray.data as rd

        from pisa_ray.scorer import query_index

        doc_filter = None
        if args.filter:
            col, _, val = args.filter.partition("=")
            doc_filter = (col, val)
        hits = query_index(
            rd.read_parquet(args.queries),
            args.index,
            k=args.k,
            method=args.method,
            concurrency=args.concurrency,
            doc_filter=doc_filter,
        )
        if args.out:
            hits.write_parquet(args.out)
            print(json.dumps({"rows": hits.count(), "out": args.out}))
        else:
            for row in hits.to_pandas().itertuples(index=False):
                print(json.dumps(row._asdict()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
