"""Pure-Python scalar oracle: a literal, unoptimized implementation of the
reference's query semantics (SURVEY.md §2.9) over uncompressed in-memory
postings. Deliberately structured like the C++ (per-doc loops, sorted-term
score sums, strict-``>`` boundary heap) so it is an independent check of
the vectorized engine."""

from __future__ import annotations

import math
from collections import Counter

from searchenginepp_ray.config import NormalizerProfile
from searchenginepp_ray.normalizer.word_normalizer import term_frequencies


class OracleIndex:
    def __init__(self, docs: list[tuple[str, str]], profile: NormalizerProfile,
                 k1: float = 0.82, b: float = 0.68):
        """docs: list of (docno, text); docid = 1-based position."""
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.doclen: dict[int, int] = {}
        self.docno: dict[int, str] = {}
        self.k1, self.b = k1, b
        for pos, (docno, text) in enumerate(docs):
            docid = pos + 1
            tf = term_frequencies(text, profile)
            self.docno[docid] = docno
            self.doclen[docid] = sum(tf.values())
            for term, f in tf.items():
                self.postings.setdefault(term, []).append((docid, f))
        self.n_docs = len(docs)
        self.sum_doclen = sum(self.doclen.values())
        self.avgdl = self.sum_doclen / max(self.n_docs, 1)
        self.df = {t: len(pl) for t, pl in self.postings.items()}

    def idf(self, term: str) -> float:
        return math.log2(self.n_docs / self.df[term])

    def score_one(self, term: str, tf: int, docid: int, scorer: str) -> float:
        idf = self.idf(term)
        if scorer == "tfidf":
            return (1 + math.log2(tf)) * idf if tf else 0.0
        dl = self.doclen[docid]
        return tf / (self.k1 * ((1 - self.b) + self.b * dl / self.avgdl) + tf) * idf

    def query_lm(self, qterms: list[str], k: int,
                 mu: float = 2000.0) -> list[tuple[int, str, float]]:
        """Dirichlet query likelihood (rank-equivalent matching-terms
        decomposition), scalar reference for QueryEngine.search_lm_batch."""
        terms = [t for t in sorted(set(qterms)) if t in self.postings]
        if not terms:
            return []
        T = float(self.sum_doclen)
        nq = len(terms)
        ctf = {t: sum(tf for _, tf in self.postings[t]) for t in terms}
        per_doc: dict[int, float] = {}
        for t in terms:
            for docid, tf in self.postings[t]:
                per_doc[docid] = per_doc.get(docid, 0.0) + math.log2(
                    1.0 + (tf * T) / (mu * ctf[t]))
        results = [
            (d, s + nq * math.log2(mu / (self.doclen[d] + mu)))
            for d, s in sorted(per_doc.items())
        ]
        results.sort(key=lambda r: (-r[1], r[0]))
        return [(d, self.docno[d], s) for d, s in results[:k]]

    def query(self, qterms: list[str], k: int, conj: bool = False,
              scorer: str = "bm25") -> list[tuple[int, str, float]]:
        terms = sorted(set(qterms))
        terms = [t for t in terms if t in self.postings]
        if conj and len(terms) != len(sorted(set(qterms))):
            return []
        if not terms:
            return []
        # gather per-doc tf maps in sorted-term order
        per_doc: dict[int, list[tuple[str, int]]] = {}
        for t in terms:
            for docid, tf in self.postings[t]:
                per_doc.setdefault(docid, []).append((t, tf))
        results: list[tuple[int, float]] = []
        for docid in sorted(per_doc):
            hits = per_doc[docid]
            if conj and len(hits) != len(terms):
                continue
            score = 0.0
            for t, tf in hits:  # sorted-term order by construction
                score += self.score_one(t, tf, docid, scorer)
            results.append((docid, score))
        # heap semantics collapse to: sort by (score desc, docid asc), top k
        results.sort(key=lambda r: (-r[1], r[0]))
        return [(d, self.docno[d], s) for d, s in results[:k]]
