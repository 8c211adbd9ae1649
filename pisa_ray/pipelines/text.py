"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language ID, document fingerprinting.

All stages are vectorized ``map_batches`` kernels; language ID is a
stateful actor-pool stage (stopword tables built once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..tokenizer import TOKEN_SPLIT_RE

# Tiny per-language stopword lists (public common words); enough for a
# deterministic n-gram/stopword heuristic. Real deployments would load
# fasttext-style models in the actor __init__ — same plumbing.
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans", "pour"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "nicht", "mit", "ein"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "不", "人", "这"},
}


def _tok_shared(batch: pa.Table, text_col: str) -> dict:
    """ONE tokenize for every per-doc stat kernel: the byte-vectorized
    ``tokenize_flat`` (bit-identical to the RE2 split the kernels used
    to run — pinned in tokenizer.py) plus one ``doc_term_counts``.
    ``text_stats`` computes this once per batch and hands it to all
    its sub-kernels (review finding: the fused stage tokenized the
    same batch up to four times, twice through the RE2 path the
    tokenizer replaced for being ~63% of kernel CPU)."""
    from ..tokenizer import doc_term_counts, tokenize_flat

    flat, parents, _ = tokenize_flat(batch[text_col])
    terms, tfs, dl = doc_term_counts(batch[text_col])
    return {"flat": flat, "parents": parents, "dtc": (terms, tfs, dl)}


def _token_stats_fn(text_col: str, id_col: str):
    """Batch kernel behind ``token_stats`` — exposed as a factory so
    ``text_stats`` can fuse it with the repetition kernel under any
    column names (no probe-extraction fragility)."""

    def fn(batch: pa.Table, shared: dict | None = None) -> pa.Table:
        sh = shared if shared is not None else _tok_shared(batch, text_col)
        flat, parents = sh["flat"], sh["parents"]
        terms, _, dl = sh["dtc"]
        n = len(batch)
        n_tokens = dl.astype(np.int64)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        sum_len = np.zeros(n, dtype=np.int64)
        np.add.at(sum_len, parents, lens)
        n_distinct = np.diff(terms.offsets.to_numpy(zero_copy_only=False))
        avg = np.where(n_tokens > 0, sum_len / np.maximum(n_tokens, 1), 0.0)
        # half-up at 4 decimals (np.round is half-even; DuckDB/SQL
        # oracles round half-up — .5 boundaries hit often with /2^k)
        avg = np.floor(avg * 1e4 + 0.5) / 1e4
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens),
                "n_chars": pc.utf8_length(batch[text_col]).cast(pa.int64()),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "avg_token_len": pa.array(avg),
            }
        )

    return fn


def token_stats(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Per-doc token count, char count, distinct-token count,
    mean token length — one vectorized Arrow pass."""
    return ds.map_batches(
        _token_stats_fn(text_col, id_col), batch_format="pyarrow"
    )


def _quality_counts_fn(text_col: str, id_col: str, lang: str = "en"):
    """Batch kernel: integer quality-signal counts per doc — stopword
    occurrences (``n_stop_<lang>``) and digit characters (``n_digits``).
    Exact-comparable (no float ratios), so SQL oracles can replay it."""
    stop = pa.array(sorted(STOPWORDS[lang]))
    stop_col = f"n_stop_{lang}"

    def fn(batch: pa.Table, shared: dict | None = None) -> pa.Table:
        sh = shared if shared is not None else _tok_shared(batch, text_col)
        flat, parents = sh["flat"], sh["parents"]
        n = len(batch)
        is_stop = pc.is_in(flat, value_set=stop).to_numpy(zero_copy_only=False)
        n_stop = np.zeros(n, dtype=np.int64)
        np.add.at(n_stop, parents, is_stop.astype(np.int64))
        digits = (
            pc.fill_null(pc.count_substring_regex(batch[text_col], "[0-9]"), 0)
            .to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                stop_col: pa.array(n_stop),
                "n_digits": pa.array(digits.astype(np.int64)),
            }
        )

    return fn


def text_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_quality: bool = False,
) -> rd.Dataset:
    """Fused per-doc text statistics: the ``token_stats`` columns
    (n_tokens, n_chars, n_distinct, avg_token_len) plus the
    ``repetition_stats`` quality features (top_token_frac,
    dup_2gram_frac) in one stage — both kernels share the tokenize
    pass's input batch, so fusing halves the read/decode work when a
    pipeline wants the full per-doc stat row (the common case for a
    quality-filter stage). ``include_quality=True`` appends the
    integer quality-signal counts (``n_stop_en``, ``n_digits``) from
    the same pass."""
    fns = [_token_stats_fn(text_col, id_col), _repetition_stats_fn(text_col, id_col)]
    if include_quality:
        fns.append(_quality_counts_fn(text_col, id_col))

    def fn(batch: pa.Table) -> pa.Table:
        sh = _tok_shared(batch, text_col)  # ONE tokenize for all kernels
        parts = [f(batch, sh) for f in fns]
        cols = {name: parts[0][name] for name in parts[0].column_names}
        for t in parts[1:]:
            for name in t.column_names:
                if name not in cols:
                    cols[name] = t[name]
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _pii_fn(text_col: str, id_col: str, counts: bool, redact: bool):
    """THE PII kernel (single copy of the ``PII_PATTERNS`` loop):
    per-category non-overlapping match counts and/or the fully
    redacted text, one RE2 pass per category per requested side."""

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict = {id_col: batch[id_col]}
        any_hit = np.zeros(len(batch), dtype=bool)
        red = batch[text_col]
        for name, pat, repl in PII_PATTERNS:
            if counts:
                cnt = pc.count_substring_regex(batch[text_col], pat).cast(
                    pa.int64()
                )
                cols[f"n_{name}"] = cnt
                any_hit |= cnt.to_numpy(zero_copy_only=False) > 0
            if redact:
                red = pc.replace_substring_regex(red, pat, repl)
        if counts:
            cols["has_pii"] = pa.array(any_hit)
        if redact:
            cols["redacted"] = red
        return pa.table(cols)

    return fn


def pii_scan(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Fused PII stage: per-category match counts + ``has_pii`` flag +
    the fully redacted text in ONE RE2 pass per category (the count and
    the rewrite share the compiled pattern; a policy pipeline almost
    always wants both — log the hits, store the redaction)."""
    return ds.map_batches(
        _pii_fn(text_col, id_col, counts=True, redact=True),
        batch_format="pyarrow",
    )


def unigram_model(
    ds: rd.Dataset, text_col: str = "text", top_v: int | None = None
) -> pa.Table:
    """Corpus unigram LM: (term, logp) with p = tf / total over the
    whole corpus — the model side of CCNet-style LM-perplexity quality
    filtering.

    Distributed shape: per-batch (term, tf) partials (pre-aggregated
    inside ``map_batches``, so the shuffle moves vocab-sized rows, not
    tokens) -> one ``groupby(term).sum`` -> collected ONCE (the model
    is the declared driver-sized object). ``top_v`` is the 100-TB
    knob: the vocabulary is cut to the V most frequent terms by a
    DISTRIBUTED sort+limit before anything reaches the driver;
    probabilities stay calibrated against the full-corpus token total
    (computed pre-cut). The cut terms' probability mass is aggregated
    into a calibrated OOV bucket — per-unseen-term logp
    ``log((total - kept_mass) / n_cut_terms / total)`` — carried in
    the table's schema metadata (``oov_logp``) and used by
    ``unigram_nll``; an uncapped model has no metadata and unseen
    terms floor at the kept vocabulary's minimum logp."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), TOKEN_SPLIT_RE)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = flat.value_counts()
        return pa.table(
            {
                "term": vc.field("values").cast(pa.string()),
                "tf": vc.field("counts").cast(pa.int64()),
            }
        )

    counts_ds = ds.map_batches(partial, batch_format="pyarrow").groupby("term").sum(
        "tf"
    )
    empty_model = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "logp": pa.array([], type=pa.float64()),
        }
    )
    meta = None
    if top_v is not None:
        counts_ds = counts_ds.materialize()
        if counts_ds.count() == 0:
            # zero-token corpus: a graceful empty model (scoring
            # floors every term; docs with no tokens are omitted
            # anyway) — the raw path crashed with KeyError/TypeError
            # (review finding)
            return empty_model
        total = float(counts_ds.sum("sum(tf)"))
        n_terms = counts_ds.count()
        counts = (
            counts_ds.sort(["sum(tf)", "term"], descending=[True, False])
            .limit(top_v)
            .to_pandas()
        )
        n_oov = n_terms - len(counts)
        oov_mass = total - float(counts["sum(tf)"].sum())
        if n_oov > 0 and oov_mass > 0:
            meta = {"oov_logp": repr(float(np.log(oov_mass / n_oov / total)))}
    else:
        counts = counts_ds.to_pandas()
        if counts.empty or "sum(tf)" not in counts.columns:
            return empty_model
        total = float(counts["sum(tf)"].sum())
    tf = counts["sum(tf)"].to_numpy().astype(np.float64)
    tbl = pa.table(
        {
            "term": pa.array(counts["term"], type=pa.string()),
            "logp": pa.array(np.log(tf / total)),
        }
    )
    return tbl.replace_schema_metadata(meta) if meta else tbl


def unigram_nll(
    ds: rd.Dataset,
    model: pa.Table | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-doc mean unigram negative log-likelihood — the LM-perplexity
    quality score of CCNet/CC-pipeline filtering (low = stereotypical
    text, high = rare-token soup; both tails get filtered).

    ``model``: a ``unigram_model`` table; defaults to self-scoring
    (model built on ``ds`` itself, so there are no OOV terms). The
    model broadcasts once via ``ray.put``; scoring is one vectorized
    pass per batch (dictionary-encode the batch's tokens, ONE
    ``pc.index_in`` per batch vocabulary, gather + segmented sum).
    Unseen terms (external model) score at the model's calibrated OOV
    logp when present (``top_v``-capped models carry it in schema
    metadata), else at the model's minimum logp.
    Docs with zero tokens are omitted (mean undefined — matches the
    SQL oracle's GROUP BY). Output: (id, n_tokens, nll) with nll
    rounded to 6 decimals."""
    import ray

    if model is None:
        model = unigram_model(ds, text_col)
    ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        terms = m["term"]
        logp = m["logp"].to_numpy(zero_copy_only=False)
        md = m.schema.metadata or {}
        if b"oov_logp" in md:
            floor = float(md[b"oov_logp"])
        else:
            floor = float(logp.min()) if len(logp) else 0.0
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), TOKEN_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n = len(batch)
        denc = flat.dictionary_encode()
        if isinstance(denc, pa.ChunkedArray):
            denc = denc.combine_chunks()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        pos = pc.index_in(denc.dictionary, value_set=terms)
        pos_np = pos.to_numpy(zero_copy_only=False).astype(np.float64)
        if logp.size == 0:
            # empty model: every token scores at the floor — np.where
            # would still eagerly index logp[0] and crash otherwise
            vocab_logp = np.full(len(denc.dictionary), floor)
        else:
            vocab_logp = np.where(
                np.isnan(pos_np),
                floor,
                logp[np.nan_to_num(pos_np).astype(np.int64)],
            )
        n_tokens = np.zeros(n, dtype=np.int64)
        nll_sum = np.zeros(n, dtype=np.float64)
        if codes.size:
            np.add.at(n_tokens, parents, 1)
            np.add.at(nll_sum, parents, -vocab_logp[codes])
        has = n_tokens > 0
        nll = np.round(nll_sum[has] / n_tokens[has], 6)
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(has)),
                "n_tokens": pa.array(n_tokens[has]),
                "nll": pa.array(nll),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


class LangId:
    """Stopword-voting language identifier (actor-pool stage).

    ``__init__`` once per actor: builds the token->language table.
    ``__call__`` per batch: vectorized membership votes.
    """

    def __init__(self):
        self.char_votes: list[tuple[str, str]] = []  # (char, lang) for CJK
        self.word_sets: dict[str, pa.Array] = {}  # lang -> latin stopwords
        for lang, words in STOPWORDS.items():
            latin = []
            for w in words:
                if len(w) == 1 and ord(w) > 0x2E7F:  # CJK: the latin
                    self.char_votes.append((w, lang))  # tokenizer drops these
                else:
                    latin.append(w)
            if latin:
                self.word_sets[lang] = pa.array(sorted(latin))
        self.langs = sorted(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one pc.is_in membership pass per language over the flat token
        # stream + np.add.at scatter — no per-token Python (same pattern
        # as quality_score)
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]), TOKEN_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = len(batch)
        votes = np.zeros((len(self.langs), n), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            ws = self.word_sets.get(lang)
            if ws is not None and len(flat):
                hit = pc.is_in(flat, value_set=ws).to_numpy(zero_copy_only=False)
                np.add.at(votes[li], parents, hit.astype(np.int64))
        for ch, lang in self.char_votes:
            # fill_null: a null text row yields a null count, whose
            # to_numpy is float64 NaN — adding that into the int64
            # votes matrix raised a numpy casting error and aborted
            # the dataset (review finding); null text votes 0
            votes[self.langs.index(lang)] += (
                pc.fill_null(pc.count_substring(batch["text"], ch), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        # ties break to the alphabetically-first language (argmax picks
        # the first max) — same rule as the scalar voter
        best = votes.argmax(axis=0)
        pred = np.asarray(self.langs, dtype=object)[best]
        pred = np.where(votes.max(axis=0) > 0, pred, "unknown")
        return batch.append_column(
            "pred_lang", pa.array(pred.tolist(), type=pa.string())
        )


def lang_id(ds: rd.Dataset, concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=1
    )


def quality_score(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Heuristic quality features: stopword ratio (en), digit ratio,
    mean word length band — the shape of C4/Gopher-style filters."""
    counts_fn = _quality_counts_fn(text_col, id_col)

    def fn(batch: pa.Table) -> pa.Table:
        # ratios derived from the SHARED counting kernel (review
        # finding: this function re-implemented _quality_counts_fn's
        # tokenize/stopword/digit sequence verbatim — the two could
        # silently diverge)
        sh = _tok_shared(batch, text_col)
        counts = counts_fn(batch, sh)
        n_tokens = sh["dtc"][2].astype(np.int64)
        n_stop = counts["n_stop_en"].to_numpy(zero_copy_only=False)
        digits = counts["n_digits"].to_numpy(zero_copy_only=False)
        chars = (
            pc.fill_null(pc.utf8_length(batch[text_col]), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        denom = np.maximum(n_tokens, 1)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens),
                "stopword_ratio": pa.array(np.round(n_stop / denom, 4)),
                "digit_ratio": pa.array(
                    np.round(digits / np.maximum(chars, 1), 4)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _repetition_stats_fn(text_col: str, id_col: str):
    """Batch kernel behind ``repetition_stats`` (factory, see
    ``_token_stats_fn``)."""

    def fn(batch: pa.Table, shared: dict | None = None) -> pa.Table:
        sh = shared if shared is not None else _tok_shared(batch, text_col)
        n = len(batch)
        # per-doc (term, tf) lists give n_tokens and the max tf directly
        terms, tfs, dl = sh["dtc"]
        toffs = tfs.offsets.to_numpy(zero_copy_only=False)
        tf_flat = tfs.values.to_numpy(zero_copy_only=False).astype(np.int64)
        top = np.zeros(n, dtype=np.int64)
        if tf_flat.size:
            # segmented max over each doc's tf run (docs with no tokens
            # keep 0): maximum.reduceat needs non-empty segments
            nonempty = np.flatnonzero(np.diff(toffs) > 0)
            if nonempty.size:
                top[nonempty] = np.maximum.reduceat(tf_flat, toffs[nonempty])
        n_tokens = dl.astype(np.int64)

        # word-2grams: dictionary-encode the flat token stream once,
        # pair adjacent codes within a doc, count distinct pairs per doc
        flat, parents = sh["flat"], sh["parents"]
        n2 = np.maximum(n_tokens - 1, 0)
        dup2 = np.zeros(n, dtype=np.float64)
        if len(flat) > 1:
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
            same_doc = parents[1:] == parents[:-1]
            V = np.uint64(len(denc.dictionary))
            gpar = parents[:-1][same_doc]
            # distinct (doc, pair) count via sort + run-length. The
            # packed single-key sort needs n*V^2 < 2^63 — past that the
            # uint64 key WRAPS and merges unrelated (doc, pair) keys
            # (review finding), so fall back to an unpacked 3-key
            # lexsort (identical counts, no range limit).
            if float(n) * float(V) * float(V) < 2.0**63:
                pair = (codes[:-1] * V + codes[1:])[same_doc]
                key = gpar.astype(np.uint64) * (V * V) + pair
                order = np.argsort(key, kind="stable")
                skey = key[order]
                first = np.ones(skey.size, dtype=bool)
                np.not_equal(skey[1:], skey[:-1], out=first[1:])
            else:
                c0 = codes[:-1][same_doc]
                c1 = codes[1:][same_doc]
                order = np.lexsort((c1, c0, gpar))
                g_s, c0_s, c1_s = gpar[order], c0[order], c1[order]
                first = np.ones(order.size, dtype=bool)
                first[1:] = (
                    (g_s[1:] != g_s[:-1])
                    | (c0_s[1:] != c0_s[:-1])
                    | (c1_s[1:] != c1_s[:-1])
                )
            n_distinct2 = np.zeros(n, dtype=np.int64)
            np.add.at(n_distinct2, gpar[order[first]], 1)
            with np.errstate(invalid="ignore", divide="ignore"):
                dup2 = np.where(
                    n2 > 0, 1.0 - n_distinct2 / np.maximum(n2, 1), 0.0
                )
        denom = np.maximum(n_tokens, 1)
        # half-up rounding at 4 decimals (SQL oracles round half-up)
        top_frac = np.floor((top / denom) * 1e4 + 0.5) / 1e4
        dup2 = np.floor(dup2 * 1e4 + 0.5) / 1e4
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens),
                "top_token_frac": pa.array(top_frac),
                "dup_2gram_frac": pa.array(dup2),
            }
        )

    return fn


def repetition_stats(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Gopher-style repetition quality features, one vectorized pass:

    - ``top_token_frac``: count of the most frequent token / n_tokens
      (ties irrelevant — only the max count matters)
    - ``dup_2gram_frac``: 1 - distinct word-2grams / total word-2grams
      (2-grams never cross document boundaries)

    Repetition filters are a standard LLM-training-data curation stage
    (boilerplate / spam removal); both features are exact, deterministic
    and DuckDB-checkable. Zero Python-per-row: tokens come from the
    shared flatten path, 2-grams are integer code pairs counted with
    the same radix sort-unique used by the tokenizer. Analog of the
    reference's per-user interaction-degree features
    (/root/reference/src/helpers/Reader.py:188 groupby-count shape).
    """
    return ds.map_batches(
        _repetition_stats_fn(text_col, id_col), batch_format="pyarrow"
    )


def tfidf_keywords(
    ds: rd.Dataset,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Top-k tf-idf keywords per document.

    Two stages, the broadcast-small-side shape:
    1. one distributed pass builds the (vocab-sized) global df table,
       which is broadcast via ``ray.put`` — never re-shipped per batch;
    2. a ``map_batches`` pass scores every (doc, term) as
       ``tf * ln((N + 1) / (df + 1))`` and keeps each doc's top ``k``
       (score desc, term asc tie-break; score rounded half-up at 4
       decimals BEFORE ranking so the cut is SQL-replayable).

    At 100 TB the df table is vocab-sized (millions of rows, not
    corpus-sized) — small enough to broadcast; if vocab outgrew memory
    the same pipeline re-expresses as an explode + shuffle join on
    term. Reference analog: the global user/item degree statistics
    loaded once and reused across batches
    (/root/reference/src/helpers/Reader.py:188).
    """
    import ray

    from ..tokenizer import doc_term_counts

    # ---- stage 1: global df + N (one pre-aggregated shuffle) ------------
    def partial_df(batch: pa.Table) -> pa.Table:
        terms, _, _ = doc_term_counts(batch[text_col])
        flat = terms.values
        # per-doc term lists are already unique -> df partial = count
        return pa.table(
            {
                "term": flat.cast(pa.string()),
                "df": pa.array(np.ones(len(flat), dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    df_tbl = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    # lexicographic vocab order: index_in positions then double as the
    # integer tie-break key (int lexsort, no object-dtype compares)
    df_tbl = df_tbl.sort_values("term").reset_index(drop=True)
    n_docs = ds.count()
    df_ref = ray.put(
        (
            pa.array(df_tbl["term"].to_numpy(), type=pa.string()),
            df_tbl["df"].to_numpy().astype(np.int64),
        )
    )

    # ---- stage 2: per-doc top-k against the broadcast df ----------------
    def topk(batch: pa.Table) -> pa.Table:
        terms_ls, tfs_ls, _ = doc_term_counts(batch[text_col])
        flat_terms = terms_ls.values
        offs = terms_ls.offsets.to_numpy(zero_copy_only=False)
        parents = np.repeat(
            np.arange(len(batch), dtype=np.int64), np.diff(offs)
        )
        tf = tfs_ls.values.to_numpy(zero_copy_only=False).astype(np.float64)
        vocab, dfv = ray.get(df_ref)
        pos = pc.index_in(flat_terms, value_set=vocab).to_numpy(
            zero_copy_only=False
        )
        # every term of every doc is in the global vocab by construction
        df = dfv[pos.astype(np.int64)]
        score = tf * np.log((n_docs + 1.0) / (df + 1.0))
        score = np.floor(score * 1e4 + 0.5) / 1e4  # half-up, pre-rank
        if score.size == 0:
            return pa.table(
                {
                    id_col: batch[id_col].slice(0, 0),
                    "keyword": pa.array([], type=pa.string()),
                    "kw_rank": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        # rank within doc by (-score, term): terms are unique per doc so
        # the order is total; vocab is term-sorted, so pos IS the
        # lexicographic tie-break key
        order = np.lexsort((pos.astype(np.int64), -score, parents))
        boundaries = np.flatnonzero(
            np.diff(parents[order], prepend=-1)
        )
        ranks = np.arange(order.size, dtype=np.int64)
        ranks -= np.repeat(ranks[boundaries], np.diff(np.append(boundaries, order.size)))
        keep = ranks < k
        sel = order[keep]
        doc_idx = parents[sel]
        return pa.table(
            {
                id_col: batch[id_col].take(pa.array(doc_idx)),
                "keyword": flat_terms.take(pa.array(sel)).cast(pa.string()),
                "kw_rank": pa.array(ranks[keep] + 1),
                "score": pa.array(score[sel]),
            }
        )

    return ds.map_batches(topk, batch_format="pyarrow")


_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a_batch(
    streams: np.ndarray, offs: np.ndarray, max_tile_bytes: int = 256 << 20
) -> np.ndarray:
    """FNV-1a over many byte streams at once (``streams`` is the
    concatenated uint8 data, ``offs`` the per-doc boundaries).

    FNV-1a is strictly sequential per byte (h = (h^b)*p), so the only
    vectorization axis is ACROSS documents: one interpreter iteration
    per byte *position*, each a numpy op over the whole batch — ~10^2
    iterations per batch instead of 10^6 per-byte interpreter ops."""
    n = offs.size - 1
    lens = np.diff(offs)
    out = np.full(n, _FNV_BASIS, dtype=np.uint64)
    if n == 0 or streams.size == 0:
        return out
    # Rows are processed length-sorted in TILES bounded by
    # rows x tile_max_len bytes: the old single (n, max_len) padded
    # matrix multiplied one long document's length by the whole batch
    # size (one 10 MB doc in a 4096-row batch = 40 GB — review
    # finding). Per-doc hashes are independent, so tiling is exact.
    order = np.argsort(-lens, kind="stable")
    max_tile = int(max_tile_bytes)
    starts_all = offs[:-1]
    pos = 0
    while pos < n:
        L = int(lens[order[pos]])  # tile max length (desc order)
        if L == 0:
            break  # remaining rows are empty -> basis hash stands
        rows_cap = max(1, max_tile // L)
        tile = order[pos : pos + rows_cap]
        pos += tile.size
        tl = lens[tile]
        total = int(tl.sum())
        # gather the tile's bytes row-major from the concatenated stream
        idx = (
            np.repeat(
                starts_all[tile]
                - np.concatenate(([0], np.cumsum(tl)[:-1])),
                tl,
            )
            + np.arange(total)
        )
        mask = np.arange(L)[None, :] < tl[:, None]
        pad = np.zeros((tile.size, L), dtype=np.uint8)
        pad[mask] = streams[idx]
        h = np.full(tile.size, _FNV_BASIS, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(L):
                # shrink the active set as shorter docs finish (rows
                # are length-desc within the tile)
                m = int(np.searchsorted(-tl, -j, side="left"))
                if m == 0:
                    break
                h[:m] = (h[:m] ^ pad[:m, j].astype(np.uint64)) * _FNV_PRIME
        out[tile] = h
    return out


def fingerprint64(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """64-bit FNV-1a rolling document fingerprint (order-sensitive,
    whitespace-insensitive): hash of the token byte sequence, one space
    byte after every token. Vectorized: Arrow builds the normalized
    per-doc byte stream (tokenize -> join with spaces), then
    ``fnv1a_batch`` folds all docs simultaneously."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), TOKEN_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n = len(batch)
        counts = np.zeros(n, dtype=np.int64)
        np.add.at(counts, parents, 1)
        offs = np.concatenate(([0], np.cumsum(counts)))
        vals = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
        lists = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), vals)
        # byte stream per doc = "tok1 tok2 ... tokN " (trailing space:
        # the scalar reference hashes a space byte after EVERY token).
        # Separator typed to the TOKEN type: a plain-str separator has
        # no kernel for list<large_string> (which remove_dup_spans
        # emits), so fingerprint64(remove_dup_spans(ds)) used to crash
        # (review finding; chunk_documents had the same workaround)
        sep = pa.scalar(" ", type=vals.type)
        joined = pc.binary_join(lists, sep)
        joined = pc.if_else(
            pa.array(counts > 0),
            pc.binary_join_element_wise(joined, pa.scalar("", type=vals.type), sep),
            joined,
        )
        jb = joined.cast(pa.large_binary())
        if isinstance(jb, pa.ChunkedArray):
            jb = jb.combine_chunks()
        boffs = np.frombuffer(jb.buffers()[1], dtype=np.int64)[
            jb.offset : jb.offset + len(jb) + 1
        ]
        data_buf = jb.buffers()[2]
        data = (
            np.frombuffer(data_buf, dtype=np.uint8)[boffs[0] : boffs[-1]]
            if data_buf is not None
            else np.empty(0, dtype=np.uint8)
        )
        out = fnv1a_batch(data, boffs - boffs[0])
        return pa.table(
            {id_col: batch[id_col], "fingerprint": pa.array(out, type=pa.uint64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# RE2 patterns (pyarrow.compute and DuckDB both run RE2, so the engine
# and the SQL oracle match EXACTLY — same matches, same non-overlap
# semantics). Order matters for redaction: EMAIL first (an address
# contains dot-runs an IPv4 pattern could otherwise claim).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
)


def pii_stats(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Per-doc PII match counts (non-overlapping, per category) plus a
    ``has_pii`` flag — the detect side of a C4/RefinedWeb-style PII
    policy stage (the shared ``_pii_fn`` kernel, counts only)."""
    return ds.map_batches(
        _pii_fn(text_col, id_col, counts=True, redact=False),
        batch_format="pyarrow",
    )


def pii_redact(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Replace every PII match with its placeholder token, in the fixed
    ``PII_PATTERNS`` order. Returns (id, redacted) — the transform side
    of the policy stage (the shared ``_pii_fn`` kernel, rewrite only)."""
    return ds.map_batches(
        _pii_fn(text_col, id_col, counts=False, redact=True),
        batch_format="pyarrow",
    )


def chunk_documents(
    ds: rd.Dataset,
    max_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Split documents into overlapping fixed-token-budget chunks —
    the context-window prep stage of a training/RAG pipeline.

    Chunk c of a doc with n tokens covers tokens
    ``[c*stride, c*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; chunk starts are
    ``range(0, max(n - overlap, 1), stride)``, so every doc (even an
    empty one) yields at least one chunk, every token is covered, and
    no chunk is a suffix of its predecessor. Chunk text is the tokens
    re-joined with single spaces (tokenizer-normalized — original
    whitespace/punctuation is not preserved; that is the standard
    contract for token-budget chunking).

    Fully vectorized per batch: one `tokenize_flat` byte scan, numpy
    offset arithmetic for the chunk->token gather (overlap rows
    duplicate only their overlapping token ids), one Arrow
    ``binary_join`` to materialize chunk strings. Embarrassingly
    parallel — no shuffle, chunk ids are doc-local, output order is
    parallelism-invariant after a (doc_id, chunk_id) sort.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    if not 0 <= overlap < max_tokens:
        # negative overlap would stride PAST tokens and silently drop
        # them from every chunk (review finding) — the every-token-
        # covered invariant needs 0 <= overlap < max_tokens
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    def fn(batch: pa.Table) -> pa.Table:
        from ..tokenizer import tokenize_flat

        flat, parents, n_docs = tokenize_flat(batch[text_col])
        counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
        n_chunks = (np.maximum(counts - overlap, 1) + stride - 1) // stride
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
        chunk_off = np.concatenate(([0], np.cumsum(n_chunks)))
        chunk_idx = np.arange(doc_of.size, dtype=np.int64) - chunk_off[
            :-1
        ].repeat(n_chunks)
        tok_start = chunk_idx * stride
        chunk_len = np.minimum(max_tokens, counts[doc_of] - tok_start)
        chunk_len = np.maximum(chunk_len, 0)  # empty docs: one 0-token chunk
        doc_tok_off = np.concatenate(([0], np.cumsum(counts)))
        abs_start = doc_tok_off[doc_of] + tok_start
        out_off = np.concatenate(([0], np.cumsum(chunk_len)))
        pos = np.arange(out_off[-1], dtype=np.int64)
        idx = abs_start.repeat(chunk_len) + (pos - out_off[:-1].repeat(chunk_len))
        toks = flat.take(pa.array(idx))
        lists = pa.LargeListArray.from_arrays(pa.array(out_off), toks)
        # the scalar separator must be large_string to match the
        # large_list<large_string> kernel signature
        text = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
        ids = batch[id_col].combine_chunks().take(pa.array(doc_of))
        return pa.table(
            {
                id_col: ids,
                "chunk_id": pa.array(chunk_idx),
                "n_tokens": pa.array(chunk_len),
                "chunk_text": text,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(
    ds: rd.Dataset,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Concat-and-chunk sequence packing (the GPT-style training-data
    layout): documents are concatenated in ``id_col`` order into one
    global token stream, which is cut into fixed-``budget`` training
    sequences; emits one row per (document x sequence) overlap with
    the document-local token span ``[tok_start, tok_end)`` that lands
    in that sequence. Zero padding waste by construction.

    The only coordination is the global token offset per doc —
    ``relational.prefix_sum`` (distributed scan: O(#blocks) driver
    state); counting and span explosion are embarrassingly parallel
    vectorized passes. Deterministic for unique ids at any
    parallelism.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    def count(batch: pa.Table) -> pa.Table:
        from ..tokenizer import tokenize_flat

        _, parents, n = tokenize_flat(batch[text_col])
        c = np.bincount(parents, minlength=n).astype(np.int64)
        return pa.table({id_col: batch[id_col], "n_tokens": pa.array(c)})

    from .relational import prefix_sum

    with_off = prefix_sum(
        ds.map_batches(count, batch_format="pyarrow"), id_col, "n_tokens", "off"
    )

    def explode(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].combine_chunks().to_numpy(zero_copy_only=False)
        off = t["off"].combine_chunks().to_numpy(zero_copy_only=False)
        ids = t[id_col].combine_chunks()
        keep = n > 0  # empty docs occupy no stream positions
        n, off, ids = n[keep], off[keep], ids.filter(pa.array(keep))
        first = off // budget
        spans = (off + n - 1) // budget - first + 1
        doc_of = np.repeat(np.arange(n.size, dtype=np.int64), spans)
        span_off = np.concatenate(([0], np.cumsum(spans)))
        seq = first.repeat(spans) + (
            np.arange(span_off[-1], dtype=np.int64) - span_off[:-1].repeat(spans)
        )
        tok_start = np.maximum(0, seq * budget - off[doc_of])
        tok_end = np.minimum(n[doc_of], (seq + 1) * budget - off[doc_of])
        return pa.table(
            {
                "seq_id": pa.array(seq),
                id_col: ids.take(pa.array(doc_of)),
                "tok_start": pa.array(tok_start),
                "tok_end": pa.array(tok_end),
            }
        )

    return with_off.map_batches(explode, batch_format="pyarrow")


def _token_hash_stream(content) -> tuple[np.ndarray, np.ndarray]:
    """(per-token 64-bit FNV hashes, doc parent indices) for a text
    column — dictionary-encode the batch's tokens so each DISTINCT
    token hashes once, then gather (shared by the n-gram operators)."""
    from ..tokenizer import tokenize_flat

    flat, parents, _ = tokenize_flat(content)
    if isinstance(flat, pa.ChunkedArray):  # pragma: no cover
        flat = flat.combine_chunks()
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    d = denc.dictionary.cast(pa.large_binary())
    offs = np.frombuffer(d.buffers()[1], dtype=np.int64)[
        d.offset : d.offset + len(d) + 1
    ]
    data = (
        np.frombuffer(d.buffers()[2], dtype=np.uint8)
        if d.buffers()[2] is not None
        else np.empty(0, np.uint8)
    )
    tok_h = fnv1a_batch(data[offs[0] : offs[-1]], offs - offs[0])
    return tok_h[codes], parents


def _require_int_ids(ds: rd.Dataset, id_col: str, op: str) -> None:
    """Loud up-front rail: these operators route doc ids as int64
    through the gram exchange; a string id column used to crash with
    an opaque ArrowInvalid deep inside the shuffle (review finding),
    and numeric STRINGS would silently change dtype."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", sch) if sch is not None else None
    if base is None or not hasattr(base, "field"):
        return  # pandas-block/unknown: the kernel's cast still guards
    try:
        t = base.field(id_col).type
    except KeyError:
        return
    if not pa.types.is_integer(t):
        raise TypeError(
            f"{op}: {id_col!r} must be an integer column (got {t}) — "
            "ids ride the gram exchange as int64; map string ids to "
            "ints first"
        )


def cross_doc_ngram_stats(
    ds: rd.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-doc duplicated-span signal: of the doc's token n-gram
    OCCURRENCES, how many use an n-gram that also appears in at least
    one OTHER document (the cross-doc substring-dup metric of
    exact-substring dedup pipelines; complements the intra-doc
    `repetition_stats` and the vs-benchmark `decontaminate`).

    Output: (id, n_grams, n_dup, dup_fraction) for docs with >= 1
    n-gram (docs shorter than n tokens emit nothing, matching the SQL
    oracle's GROUP BY).

    Scale shape: gram hashing is vectorized (dictionary-encode the
    batch's tokens, FNV each DISTINCT token once, polynomial window
    combine — n numpy ops); the corpus crosses ONE exchange as
    (gram_hash, doc_id) rows whose reducers pre-aggregate to
    (doc, occurrences, cross-doc occurrences) partials; a second tiny
    exchange sums partials per doc. 64-bit gram identity (collision
    odds ~m^2/2^65, the repo's standing hash-identity contract).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    _require_int_ids(ds, id_col, "cross_doc_ngram_stats")
    from ..shuffle import _mix64, hash_group_apply, run_starts
    from ..tokenizer import tokenize_flat

    P = np.uint64(0x100000001B3)

    def gram_map(batch: pa.Table) -> pa.Table:
        th, parents = _token_hash_stream(batch[text_col])
        T = th.size
        if T < n:
            return pa.table(
                {"gram": pa.array([], pa.int64()), id_col: pa.array([], pa.int64())}
            )
        W = T - n + 1
        valid = parents[:W] == parents[n - 1 :]
        acc = np.zeros(W, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                acc = acc * P + th[j : W + j]
            acc = _mix64(acc)
        ids = (
            batch[id_col]
            .combine_chunks()
            .cast(pa.int64())
            .take(pa.array(parents[:W][valid]))
        )
        return pa.table(
            {"gram": pa.array(acc[valid].view(np.int64)), id_col: ids}
        )

    def gram_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        g = t["gram"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((d, g))
        gs, ds_ = g[order], d[order]
        pair_start = run_starts(gs, ds_)
        # occurrences per (gram, doc) run
        pidx = np.flatnonzero(pair_start)
        occ = np.diff(np.concatenate((pidx, [gs.size])))
        pg, pd_ = gs[pidx], ds_[pidx]
        # distinct docs per gram, broadcast to its (gram, doc) runs
        gstart = run_starts(pg)
        gidx = np.flatnonzero(gstart)
        ndocs = np.diff(np.concatenate((gidx, [pg.size])))
        cross = ndocs[np.cumsum(gstart) - 1] > 1
        dup = np.where(cross, occ, 0)
        # pre-aggregate per doc within the shard
        dorder = np.argsort(pd_, kind="stable")
        dd = pd_[dorder]
        dstart = run_starts(dd)
        didx = np.flatnonzero(dstart)
        seg = np.concatenate((didx, [dd.size]))
        occ_d = np.add.reduceat(occ[dorder], seg[:-1])
        dup_d = np.add.reduceat(dup[dorder], seg[:-1])
        return pa.table(
            {
                id_col: pa.array(dd[didx]),
                "n_grams": pa.array(occ_d.astype(np.int64)),
                "n_dup": pa.array(dup_d.astype(np.int64)),
            }
        )

    def doc_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                    "dup_fraction": pa.array([], pa.float64()),
                }
            )
        d = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        dd = d[order]
        starts = run_starts(dd)
        idx = np.flatnonzero(starts)
        seg = np.concatenate((idx, [dd.size]))
        ng = np.add.reduceat(
            t["n_grams"].combine_chunks().to_numpy(zero_copy_only=False)[order],
            seg[:-1],
        )
        nd = np.add.reduceat(
            t["n_dup"].combine_chunks().to_numpy(zero_copy_only=False)[order],
            seg[:-1],
        )
        frac = np.floor(nd / ng * 1e4 + 0.5) / 1e4  # half-up, 4dp (SQL round)
        return pa.table(
            {
                id_col: pa.array(dd[idx]),
                "n_grams": pa.array(ng.astype(np.int64)),
                "n_dup": pa.array(nd.astype(np.int64)),
                "dup_fraction": pa.array(frac),
            }
        )

    partials = hash_group_apply(ds, "gram", gram_reduce, map_fn=gram_map)
    return hash_group_apply(partials, id_col, doc_reduce)


def remove_dup_spans(
    ds: rd.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> rd.Dataset:
    """Exact duplicate-span REMOVAL — the transform stage of
    exact-substring dedup (the public ExactSubstr recipe of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better";
    no code consulted): every token position covered by a token
    ``n``-gram that also occurs in >= ``min_docs`` distinct documents
    is cut, and the doc's surviving tokens are re-joined. Complements
    :func:`cross_doc_ngram_stats`, which only MEASURES the signal.

    Output rows (one per input doc, including docs shorter than ``n``
    tokens, which pass through untouched): ``(id, text, n_tokens,
    n_removed)`` where ``text`` is the cleaned, lowercased TOKEN
    STREAM re-joined with single spaces — span removal is defined at
    token level, so the normalized stream is the faithful output (the
    standard shape for this stage in training-data pipelines).

    Scale shape: two narrow hash exchanges and zero broadcasts.
    Exchange 1 (key = 64-bit gram hash) ships (gram, doc, pos) rows
    and returns ONLY the duplicated occurrences' (doc, pos) rows —
    sparse unless the corpus is heavily duplicated. Exchange 2 (key =
    doc id) co-locates each doc's text row with its dup positions via
    a tagged union (pos = -1 marks the text row), and the reducer
    rebuilds every doc in one vectorized pass (coverage via +1/-1
    deltas + cumsum; surviving tokens gathered and re-joined with
    ``binary_join``). Gram identity is the 64-bit hash (collision
    odds ~m^2/2^65, the repo's standing hash-identity contract); doc
    ids must be unique.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    _require_int_ids(ds, id_col, "remove_dup_spans")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would cut every token)")
    from ..shuffle import _mix64, hash_group_apply, run_starts
    from ..tokenizer import tokenize_flat

    P = np.uint64(0x100000001B3)

    def gram_map(batch: pa.Table) -> pa.Table:
        th, parents = _token_hash_stream(batch[text_col])
        T = th.size
        empty = pa.table(
            {
                "gram": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            }
        )
        if T < n:
            return empty
        W = T - n + 1
        valid = parents[:W] == parents[n - 1 :]
        acc = np.zeros(W, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(n):
                acc = acc * P + th[j : W + j]
            acc = _mix64(acc)
        # token position within its doc (parents ascending)
        rs = np.flatnonzero(run_starts(parents))
        run_id = np.cumsum(run_starts(parents)) - 1
        pos_in_doc = np.arange(T, dtype=np.int64) - rs[run_id]
        ids = (
            batch[id_col]
            .combine_chunks()
            .cast(pa.int64())
            .take(pa.array(parents[:W][valid]))
        )
        return pa.table(
            {
                "gram": pa.array(acc[valid].view(np.int64)),
                id_col: ids,
                "pos": pa.array(pos_in_doc[:W][valid]),
            }
        )

    def dup_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        g = t["gram"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d, g))
        gs, ds_, ps = g[order], d[order], p[order]
        grs = run_starts(gs)
        grun = np.cumsum(grs) - 1
        # distinct docs per gram: count (gram, doc) runs inside each gram run
        pair_first = run_starts(gs, ds_)
        gidx = np.flatnonzero(grs)
        seg = np.concatenate((gidx, [gs.size]))
        ndocs = np.add.reduceat(pair_first.astype(np.int64), seg[:-1])
        keep = ndocs[grun] >= min_docs
        return pa.table({id_col: pa.array(ds_[keep]), "pos": pa.array(ps[keep])})

    dup_pos = hash_group_apply(ds, "gram", dup_reduce, map_fn=gram_map)

    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "pos": pa.array(np.full(len(batch), -1, dtype=np.int64)),
                text_col: batch[text_col].cast(pa.large_string()),
            }
        )

    def tag_spans(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "pos": batch["pos"].cast(pa.int64()),
                text_col: pa.array([""] * len(batch), pa.large_string()),
            }
        )

    tagged = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        dup_pos.map_batches(tag_spans, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (text_col, pa.large_string()),
            ("n_tokens", pa.int64()),
            ("n_removed", pa.int64()),
        ]
    )

    def clean_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        pos = t["pos"].combine_chunks().to_numpy(zero_copy_only=False)
        is_doc = pos < 0
        doc_tbl = t.filter(pa.array(is_doc))
        ids = doc_tbl[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, parents, n_docs = tokenize_flat(doc_tbl[text_col])
        if isinstance(flat, pa.ChunkedArray):  # pragma: no cover
            flat = flat.combine_chunks()
        T = len(flat)
        counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
        doc_off = np.concatenate(([0], np.cumsum(counts)))
        sid = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)[~is_doc]
        spos = pos[~is_doc]
        keep_tok = np.ones(T, dtype=bool)
        if sid.size:
            from ..shuffle import sorted_lookup

            order = np.argsort(ids, kind="stable")
            found, loc = sorted_lookup(ids[order], sid)
            if not found.all():
                raise ValueError(
                    "remove_dup_spans: span rows reference ids missing from "
                    "the doc table (duplicate or inconsistent doc ids?)"
                )
            row = order[loc]
            start = doc_off[row] + spos
            delta = np.zeros(T + 1, dtype=np.int64)
            np.add.at(delta, start, 1)
            np.add.at(delta, start + n, -1)
            keep_tok = np.cumsum(delta[:-1]) == 0
        kcum = np.concatenate(([0], np.cumsum(keep_tok.astype(np.int64))))
        kept = kcum[doc_off[1:]] - kcum[doc_off[:-1]]
        kept_flat = flat.filter(pa.array(keep_tok))
        la = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(kept))), pa.int64()), kept_flat
        )
        clean = pc.binary_join(la, pa.scalar(" ", pa.large_string()))
        return pa.table(
            {
                id_col: pa.array(ids),
                text_col: clean,
                "n_tokens": pa.array(counts),
                "n_removed": pa.array(counts - kept),
            },
            schema=out_schema,
        )

    return hash_group_apply(tagged, id_col, clean_reduce)
