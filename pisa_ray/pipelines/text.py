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


def token_stats(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Per-doc token count, char count, distinct-token count,
    mean token length — one vectorized Arrow pass."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), TOKEN_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parents = parents[keep]
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)[keep]
        n = len(batch)
        n_tokens = np.zeros(n, dtype=np.int64)
        np.add.at(n_tokens, parents, 1)
        sum_len = np.zeros(n, dtype=np.int64)
        np.add.at(sum_len, parents, lens)
        # distinct terms per doc via the same flatten path
        from ..tokenizer import doc_term_counts

        terms, _, _ = doc_term_counts(batch[text_col])
        n_distinct = np.diff(terms.offsets.to_numpy(zero_copy_only=False))
        avg = np.where(n_tokens > 0, sum_len / np.maximum(n_tokens, 1), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tokens),
                "n_chars": pc.utf8_length(batch[text_col]).cast(pa.int64()),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "avg_token_len": pa.array(np.round(avg, 4)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class LangId:
    """Stopword-voting language identifier (actor-pool stage).

    ``__init__`` once per actor: builds the token->language table.
    ``__call__`` per batch: vectorized membership votes.
    """

    def __init__(self):
        self.table: dict[str, list[str]] = {}
        self.char_votes: list[tuple[str, str]] = []  # (char, lang) for CJK
        for lang, words in STOPWORDS.items():
            for w in words:
                if len(w) == 1 and ord(w) > 0x2E7F:  # CJK: the latin
                    self.char_votes.append((w, lang))  # tokenizer drops these
                else:
                    self.table.setdefault(w, []).append(lang)
        self.langs = sorted(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch["text"]), TOKEN_SPLIT_RE)
        n = len(batch)
        votes_mat = {L: np.zeros(n, dtype=np.int64) for L in self.langs}
        for ch, lang in self.char_votes:
            votes_mat[lang] += pc.count_substring(batch["text"], ch).to_numpy(
                zero_copy_only=False
            )
        out = []
        for i, lst in enumerate(toks.to_pylist()):
            votes = {L: int(votes_mat[L][i]) for L in self.langs}
            for t in lst:
                for lang in self.table.get(t, ()):
                    votes[lang] += 1
            best = max(self.langs, key=lambda L: (votes[L], -self.langs.index(L)))
            out.append(best if votes[best] > 0 else "unknown")
        return batch.append_column("pred_lang", pa.array(out, type=pa.string()))


def lang_id(ds: rd.Dataset, concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, concurrency), num_cpus=1
    )


def quality_score(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Heuristic quality features: stopword ratio (en), digit ratio,
    mean word length band — the shape of C4/Gopher-style filters."""
    stop = sorted(STOPWORDS["en"])

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(batch[text_col]), TOKEN_SPLIT_RE)
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        parents = parents[keep]
        flat = flat.filter(pa.array(keep))
        n = len(batch)
        n_tokens = np.zeros(n, dtype=np.int64)
        np.add.at(n_tokens, parents, 1)
        is_stop = pc.is_in(flat, value_set=pa.array(stop)).to_numpy(zero_copy_only=False)
        n_stop = np.zeros(n, dtype=np.int64)
        np.add.at(n_stop, parents, is_stop.astype(np.int64))
        digits = pc.count_substring_regex(batch[text_col], "[0-9]").to_numpy(
            zero_copy_only=False
        )
        chars = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False)
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


def fingerprint64(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """64-bit FNV-1a rolling document fingerprint (order-sensitive,
    whitespace-insensitive): hash of the token sequence."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        import re

        rx = re.compile(TOKEN_SPLIT_RE)
        out = np.empty(len(batch), dtype=np.uint64)
        for i, text in enumerate(batch[text_col]):
            h = np.uint64(0xCBF29CE484222325)
            with np.errstate(over="ignore"):
                for tok in rx.split(text.lower()):
                    if not tok:
                        continue
                    for byt in tok.encode("utf-8"):
                        h = (h ^ np.uint64(byt)) * np.uint64(0x100000001B3)
                    h = (h ^ np.uint64(32)) * np.uint64(0x100000001B3)
            out[i] = h
        return pd.DataFrame({id_col: batch[id_col], "fingerprint": out})

    return ds.map_batches(fn, batch_format="pandas")
