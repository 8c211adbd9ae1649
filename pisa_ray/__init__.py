"""pisa_ray — a Ray-Data-native full-text index build + BM25 query engine,
with the data-processing capability profile of the reference repo
(hsyoo32/pisa) re-expressed Ray-Data-first, plus the training-data
pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB corpus pipeline needs.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — the
caller (driver, bench.py, tests' conftest) owns the Ray session.
"""

from .build import IndexConfig, build_index
from .scorer import BM25Scorer, IndexReader, query_index, score_bmw, score_taat

__all__ = [
    "IndexConfig",
    "build_index",
    "BM25Scorer",
    "IndexReader",
    "query_index",
    "score_taat",
    "score_bmw",
]
