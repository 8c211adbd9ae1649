"""Scale rehearsal (VERDICT round-3 item 6): build + query the flagship
index at ~10x the scaling corpus (default 3M synthetic source-code docs,
~1.2B tokens) in BOTH merge layouts, recording wall, peak RSS and object
-store spill — evidence for the IndexConfig scale notes instead of
assertions.

Configs exercised:
  single : the bench layout — one (term-hash, bucket) shuffle,
           posting_space="position" (the throughput shape).
  sharded: the 100TB-documented shape — per_bucket_merge=True with
           bucket_bits=6 (64 independent, individually-resumable bucket
           merges), term_parts=128, check_collisions=True. At 10^12 docs
           the docs say bucket_bits~12/term_parts~256; on one box that
           many merge JOBS is pure fixed overhead, so the rehearsal
           scales the shard count to keep >=1s of work per bucket while
           exercising the identical code path.

Both indexes must answer the reference query mix RANK-IDENTICALLY
(digest equality is asserted, not eyeballed).

Usage: python tools/scale_rehearsal.py [--docs 3000000] [--cpus 32]
Writes one JSON line per config; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem_used_gib() -> float:
    """Box-wide anon usage (MemTotal - MemAvailable): page cache counts
    as available, so this tracks heap+plasma, which is what the scale
    notes bound."""
    info = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            info[k] = int(v.split()[0])
    return (info["MemTotal"] - info["MemAvailable"]) / (1 << 20)


class PeakRss(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.base = _mem_used_gib()
        self.peak = self.base
        self._halt = threading.Event()  # NOT _stop: Thread owns that name

    def run(self):
        while not self._halt.is_set():
            self.peak = max(self.peak, _mem_used_gib())
            time.sleep(0.5)

    def stop(self) -> float:
        self._halt.set()
        self.join()
        return self.peak


def _spilled_mib() -> float | None:
    """Bytes currently sitting in the session's spill directory (the
    gRPC memory-summary API is unavailable in this container, so
    measure the spill files directly). Returns None — NOT 0 — when no
    live session dir is found, so 'not measured' can never masquerade
    as 'zero spill' in the recorded evidence."""
    bases = [
        b for b in ("/tmp/ray/ray/session_latest", "/tmp/ray/session_latest")
        if os.path.isdir(b)
    ]
    if not bases:
        return None
    total = 0
    for base in bases:
        d = os.path.join(base, "ray_spilled_objects")
        if os.path.isdir(d):
            for dp, _, fs in os.walk(d):
                for f in fs:
                    try:
                        total += os.path.getsize(os.path.join(dp, f))
                    except OSError:
                        pass
    return total / (1 << 20)


def prepare_corpus(n_docs: int, out_dir: str) -> str:
    """Partition-parallel deterministic generation via Ray tasks (the
    generator is pure (seed, partition) -> rows, so any parallelism
    yields byte-identical files)."""
    import ray

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    @ray.remote(num_cpus=1)
    def gen(p: int, rows: int, start: int) -> int:
        import pyarrow.parquet as pq

        from pisa_ray.synth import make_corpus_partition

        t = make_corpus_partition(p, rows, start, max_tokens=800)
        pq.write_table(t, os.path.join(out_dir, f"part_{p:03d}.parquet"))
        return t.num_rows

    n_parts = 128
    base, rem = divmod(n_docs, n_parts)
    refs, start = [], 0
    for p in range(n_parts):
        rows = base + (1 if p < rem else 0)
        refs.append(gen.remote(p, rows, start))
        start += rows
    total = sum(ray.get(refs))
    assert total == n_docs, (total, n_docs)
    open(done, "w").write("ok")
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=3_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--configs", default="single,sharded")
    ap.add_argument("--term-queries", type=int, default=100,
                    dest="term_queries")
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from pisa_ray.build import IndexConfig, build_index
    from pisa_ray.scorer import hits_digest as digest_of, query_index
    from pisa_ray.synth import make_queries

    root = "/tmp/pisa_ray_scale"
    corpus = prepare_corpus(args.docs, f"{root}/synth_{args.docs}_p128")
    rd.read_parquet(corpus).count()  # warm page cache

    cfgs = {
        "single": IndexConfig(
            bucket_bits=3, term_parts=max(32, 2 * args.cpus),
            lineage_parts=8, tokenize_batch_size=512,
            check_collisions=False, per_bucket_merge=False,
            write_docmap=False, posting_space="position",
        ),
        "sharded": IndexConfig(
            bucket_bits=6, term_parts=128, lineage_parts=8,
            tokenize_batch_size=512, check_collisions=True,
            per_bucket_merge=True, write_docmap=False,
            posting_space="position",
        ),
    }
    qt = make_queries(args.queries)
    digests = {}
    for name in args.configs.split(","):
        cfg = cfgs[name]
        idx = f"{root}/idx_{name}_{args.docs}"
        shutil.rmtree(idx, ignore_errors=True)
        spill0 = _spilled_mib()
        mon = PeakRss()
        mon.start()
        t0 = time.perf_counter()
        build_index(corpus, idx, cfg, resume=False)
        build_s = time.perf_counter() - t0
        peak = mon.stop()
        spill1 = _spilled_mib()

        t0 = time.perf_counter()
        hits = query_index(
            rd.from_arrow(qt), idx, k=10, method="taat",
            concurrency=max(2, args.cpus // 2),
        ).to_pandas()
        q_s = time.perf_counter() - t0
        digests[name] = digest_of(hits)

        # ---- the shapes that actually answer queries at this scale
        # (VERDICT r4 item 4: the rehearsal used to price TAAT only).
        # BMW: block-max pruning through the same Dataset path.
        t0 = time.perf_counter()
        bmw_hits = query_index(
            rd.from_arrow(qt), idx, k=10, method="bmw",
            concurrency=max(2, args.cpus // 2),
        ).to_pandas()
        bmw_s = time.perf_counter() - t0
        bmw_digest = digest_of(bmw_hits)
        assert bmw_digest == digests[name], (
            f"BMW digest diverged from TAAT on {name}"
        )

        # Doc-range sharded persistent pool (the multi-node serving
        # shape): 4 shards over the bucket space, pool built untimed
        # (a server is), one timed burst.
        from pisa_ray.serve import ShardedBM25Service

        n_buckets = 1 << cfg.bucket_bits
        n_sh = min(4, n_buckets)
        shards = [
            {b for b in range(n_buckets) if b % n_sh == s}
            for s in range(n_sh)
        ]
        svc = ShardedBM25Service(
            idx, shards, k=10, method="taat",
            actors_per_shard=max(1, args.cpus // (2 * n_sh)),
        )
        t0 = time.perf_counter()
        sh_hits = svc.query(qt, batch_size=32).to_pandas()
        serve_s = time.perf_counter() - t0
        svc.shutdown()
        serve_digest = digest_of(sh_hits)
        assert serve_digest == digests[name], (
            f"sharded-serve digest diverged from TAAT on {name}"
        )

        # Term-sharded tier, plain vs prune=True (TPUT) — the pruning
        # exists FOR this scale (wire cost ∝ query-term df, and stop
        # terms here have ~n_docs postings); smaller burst, digest
        # compared on the same query prefix.
        from pisa_ray.serve import TermShardedBM25Service

        n_tsq = min(args.term_queries, args.queries)
        ts_qt = qt.slice(0, n_tsq)
        ref_digest = digest_of(
            hits[hits["query_id"] < n_tsq]
        )
        ts_stats = {}
        for label, prune in (("term_sharded", False),
                             ("term_sharded_pruned", True)):
            tsvc = TermShardedBM25Service(idx, n_shards=4, k=10, prune=prune)
            t0 = time.perf_counter()
            th = tsvc.query(ts_qt, batch_size=32).to_pandas()
            ts_s = time.perf_counter() - t0
            tsvc.shutdown()
            assert digest_of(th) == ref_digest, (
                f"{label} digest diverged from TAAT on {name}"
            )
            ts_stats[f"{label}_sec"] = round(ts_s, 2)
            ts_stats[f"{label}_qps"] = round(n_tsq / ts_s, 1)
        idx_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(idx) for f in fs
        )
        print(json.dumps({
            "config": name,
            "n_docs": args.docs,
            "cpus": args.cpus,
            "build_sec": round(build_s, 1),
            "docs_per_s": round(args.docs / build_s, 1),
            "query_sec": round(q_s, 2),
            "qps": round(args.queries / q_s, 1),
            "bmw_query_sec": round(bmw_s, 2),
            "bmw_qps": round(args.queries / bmw_s, 1),
            "bmw_matches_taat": True,  # asserted above
            "serve_query_sec": round(serve_s, 2),
            "serve_qps": round(args.queries / serve_s, 1),
            "serve_shards": n_sh,
            "serve_matches_taat": True,  # asserted above
            **ts_stats,
            "term_queries": n_tsq,
            "term_sharded_matches_taat": True,  # asserted above
            "hits": int(len(hits)),
            "digest": digests[name],
            "peak_mem_gib": round(mon.peak, 2),
            "base_mem_gib": round(mon.base, 2),
            "spilled_mib_delta": (
                round(spill1 - spill0, 1)
                if spill1 is not None and spill0 is not None
                else None
            ),
            "index_gib": round(idx_bytes / (1 << 30), 2),
        }), flush=True)
    if len(digests) == 2:
        vals = list(digests.values())
        assert vals[0] == vals[1], f"rank-identity violated: {digests}"
        print("RANK-IDENTICAL across merge layouts: OK", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
