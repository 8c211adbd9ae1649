"""Naive single-process BM25 oracle — the golden implementation.

Plays the role of the reference's checked-in golden result files
(/root/reference/test_result/**/test_snap*.json, written by
/root/reference/src/helpers/Runner.py:94-98): the distributed engine
must be rank-identical against it (same top-k doc_ids, scores equal to
<= 1e-9), at any parallelism level.

Determinism contract shared with the engine:
* tokenize rule: tokenizer.tokenize_py (lowercase, [^a-z0-9_]+ split)
* idf = ln(1 + (N - df + 0.5)/(df + 0.5))   (always >= 0)
* per-doc score = sum over UNIQUE query terms in SORTED order, float64
* tie-break: (score desc, doc_id asc)
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from .codec import B, K1
from .tokenizer import tokenize_py


class OracleIndex:
    def __init__(
        self, doc_ids: np.ndarray, contents: list[str], analyzer: str = "simple"
    ):
        order = np.argsort(np.asarray(doc_ids, dtype=np.uint64), kind="stable")
        self.doc_ids = np.asarray(doc_ids, dtype=np.uint64)[order]
        self.analyzer = analyzer
        self.tf: list[Counter] = []
        self.df: Counter = Counter()
        self.cf: Counter = Counter()  # collection term frequency (QLD)
        lengths = []
        for i in order:
            toks = tokenize_py(contents[int(i)], analyzer)
            c = Counter(toks)
            self.tf.append(c)
            self.df.update(c.keys())
            self.cf.update(c)
            lengths.append(len(toks))
        self.dl = np.array(lengths, dtype=np.float64)
        self.n_docs = len(contents)
        self.avgdl = float(self.dl.mean()) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return float(np.log1p((self.n_docs - df + 0.5) / (df + 0.5)))

    def score_query(self, text: str, k: int = 10) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize_py(text, self.analyzer)))
        scores = np.zeros(self.n_docs, dtype=np.float64)
        for t in terms:
            if self.df.get(t, 0) == 0:
                continue
            idf = self.idf(t)
            tf = np.array([c.get(t, 0) for c in self.tf], dtype=np.float64)
            # association order matches the engine exactly:
            # contribution = idf * wnorm, wnorm = tf*(k1+1)/denom
            denom = tf + K1 * (1.0 - B + B * (self.dl / self.avgdl))
            with np.errstate(invalid="ignore"):
                contrib = np.where(tf > 0.0, idf * (tf * (K1 + 1.0) / denom), 0.0)
            scores = scores + contrib
        hit = np.flatnonzero(scores > 0.0)
        if hit.size == 0:
            return []
        order = np.lexsort((self.doc_ids[hit], -scores[hit]))[:k]
        sel = hit[order]
        return [(int(self.doc_ids[i]), float(scores[i])) for i in sel]

    def score_query_qld(
        self, text: str, k: int = 10, mu: float = 1000.0
    ) -> list[tuple[int, float]]:
        """Dirichlet-smoothed query likelihood, mirroring the engine's
        ``score_qld`` contract exactly: ranked set = docs matching >=1
        indexed query term, score = sum ln(1 + tf/(mu*cf/C)) +
        m*ln(mu/(dl+mu)) with C = avgdl*n_docs and m = # distinct
        indexed query terms."""
        terms = [
            t
            for t in sorted(set(tokenize_py(text, self.analyzer)))
            if self.df.get(t, 0)
        ]
        if not terms:
            return []
        m = len(terms)
        c_total = self.avgdl * self.n_docs
        scores = np.zeros(self.n_docs, dtype=np.float64)
        matched = np.zeros(self.n_docs, dtype=bool)
        for t in terms:
            p_t = self.cf[t] / c_total
            tf = np.array([c.get(t, 0) for c in self.tf], dtype=np.float64)
            scores += np.where(tf > 0.0, np.log1p(tf / (mu * p_t)), 0.0)
            matched |= tf > 0.0
        scores = scores + m * np.log(mu / (self.dl + mu))
        hit = np.flatnonzero(matched)
        if hit.size == 0:
            return []
        order = np.lexsort((self.doc_ids[hit], -scores[hit]))[:k]
        sel = hit[order]
        return [(int(self.doc_ids[i]), float(scores[i])) for i in sel]

    def score_all(self, queries: list[tuple[int, str]], k: int = 10):
        """-> list of (query_id, rank, doc_id, score) tuples."""
        out = []
        for qid, text in queries:
            for rank, (doc, score) in enumerate(self.score_query(text, k), start=1):
                out.append((qid, rank, doc, score))
        return out
