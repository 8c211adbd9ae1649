"""pisa_ray — a Ray-Data-native full-text index build + BM25 query engine,
with the data-processing capability profile of the reference repo
(hsyoo32/pisa) re-expressed Ray-Data-first, plus the training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus pipeline needs.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — the
caller (driver, bench.py, tests' conftest) owns the Ray session.
"""

# bump when the on-disk segment/docmap layout changes (callers key
# their /tmp index caches by this so stale-format dirs are never reused)
INDEX_FORMAT_VERSION = 6  # v6: positional posting payload (pos_blob)

from .build import (IndexConfig, build_incremental, build_index,
                    compact_index, maintain_index, recode_index,
                    upsert_docs)
from .delete import delete_docs, delete_where, load_tombstones
from .serve import BM25Service
from .scorer import (
    BM25Scorer,
    IndexReader,
    did_you_mean,
    explain_score,
    facet_counts,
    facet_histogram,
    query_index,
    query_index_sharded,
    score_bmw,
    score_taat,
)

__all__ = [
    "INDEX_FORMAT_VERSION",
    "IndexConfig",
    "build_index",
    "build_incremental",
    "compact_index",
    "upsert_docs",
    "maintain_index",
    "recode_index",
    "delete_docs",
    "delete_where",
    "load_tombstones",
    "BM25Scorer",
    "BM25Service",
    "IndexReader",
    "did_you_mean",
    "explain_score",
    "query_index",
    "query_index_sharded",
    "score_taat",
    "score_bmw",
]
