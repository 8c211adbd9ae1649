"""Arrow schemas for every table the engine produces or consumes.

The corpus schema is fixed by the build target (BASELINE.json
``input_hint``): a Parquet table of source code
``(repo, path, commit, lang, content)``. The reference repo's analog is
the implicit 3-column interaction schema hard-coded at
/root/reference/src/helpers/Reader.py:180-183; here every table gets an
explicit pyarrow schema instead.
"""

from __future__ import annotations

import pyarrow as pa

CORPUS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

# One row per document; ``content`` is dropped as early as possible
# (wide-row discipline) and replaced by its sha256 (per-row invariant
# vs the source table) + the token-count length used by BM25.
DOCMAP = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("length", pa.uint32()),
        ("content_sha256", pa.binary(32)),
    ]
)

# Tokenized checkpoint: docmap columns + per-doc (term, tf) pairs.
TOKENIZED = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("bucket", pa.uint32()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("length", pa.uint32()),
        ("content_sha256", pa.binary(32)),
        ("term", pa.large_list(pa.string())),
        ("tf", pa.large_list(pa.uint32())),
    ]
)

# Final index segment rows. A term may appear in many rows, one per
# (bucket = docID range); scorers stitch runs back together, which is
# what makes stop-word skew bounded and incremental merges append-only.
SEGMENT = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.uint32()),
        ("df", pa.uint64()),
        # collection frequency (total tf across the run's postings):
        # summed into the lexicon, it is the term-dictionary statistic
        # the query-likelihood (Dirichlet) ranker needs — stored at
        # build time like any real engine's term dictionary, because a
        # doc-range-sharded scorer cannot reconstruct a GLOBAL cf from
        # its shard's postings at query time.
        ("cf", pa.uint64()),
        ("doc_blob", pa.large_binary()),
        ("tf_blob", pa.large_binary()),
        # within-doc token positions (IndexConfig.positions=True):
        # varint gap streams concatenated in posting order — posting i
        # owns the next tf_i varints, so no per-posting offsets are
        # stored. Empty per term when the index was built without
        # positions (readers gate on stats.json "positions").
        ("pos_blob", pa.large_binary()),
        ("block_last_doc", pa.large_list(pa.uint64())),
        ("block_doc_off", pa.large_list(pa.uint32())),
        ("block_tf_off", pa.large_list(pa.uint32())),
        ("block_count", pa.large_list(pa.uint32())),
        ("block_max_wnorm", pa.large_list(pa.float64())),
        # the global avgdl under which block_max_wnorm was computed:
        # wnorm is increasing in avgdl, so if the CURRENT avgdl (after
        # incremental generations) exceeds this, the scorer scales the
        # bound by avgdl_now/avgdl_built to keep it a true upper bound
        ("avgdl", pa.float64()),
    ]
)

LEXICON = pa.schema(
    [("term", pa.string()), ("df", pa.uint64()), ("cf", pa.uint64())]
)

QUERIES = pa.schema([("query_id", pa.int64()), ("text", pa.string())])

HITS = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.uint64()),
        ("score", pa.float64()),
    ]
)
