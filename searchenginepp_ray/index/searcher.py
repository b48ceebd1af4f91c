"""Segment searcher — the query-time half of the engine.

One :class:`SegmentSearcher` per index segment, used either directly (in
tests) or as a Ray actor in a pool (the reference's per-segment
``index_worker_t`` + thread-per-segment scatter, reference
src/index_worker.hpp:14-34, src/engine.cpp:66-126). Loading happens once
in ``__init__`` (ST3 in SURVEY §2.3); per-query work is vectorized numpy
over decoded posting arrays.

Scoring semantics are rank-identical to the reference:

- per-doc score = Σ over query terms *in lexicographic term order* of
  scorer(tf, idf, dl, avgdl) — queries are ``std::set``-deduplicated and
  iterated sorted (reference src/engine.cpp:88-96,
  src/index/Index.template.hpp:60), and our term-major accumulation adds
  every doc's contributions in exactly that order, so double-precision
  sums match bit-for-bit.
- DAAT disjunctive/conjunctive (reference src/index/Index.template.hpp:98-165)
  via dense per-segment accumulators; conjunctive keeps docs whose
  matched-term count equals the query length.
- top-k tie-break standardized to (score desc, docid asc) — the
  reference's boundary-keeping min-heap keeps lowest docids on ties
  (strict ``>``, reference src/index/Index.hpp:60-77) and its final
  cross-segment sort leaves equal scores in unspecified order
  (src/engine.cpp:124); we document the deterministic choice.
- ``mode="bmm"`` — vectorized Maxscore with sigma-ordered safe pruning
  (:meth:`SegmentSearcher.query_maxscore`); results are exactly DAAT's
  (the quantization-truncated sigmas get their one-quantum margin back,
  so the bound is sound).
- ``mode="bmm_ref"`` — the reference's per-posting Block-Max Maxscore
  cursor loop (reference src/index/Index.cpp:15-133), including its
  fixed-point-truncated upper bounds (types.hpp:120-131): like the
  reference binary, it can deviate from DAAT when the kth-score boundary
  falls inside a 0.01 quantization gap.
"""

from __future__ import annotations

import heapq
import json
import os
from collections import OrderedDict

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..codecs import unary, varbyte
from .scorer import Bm25Scorer, TfidfScorer, make_scorer


def _np_offsets(binary_arr) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (offsets, values) views of a LargeBinary array."""
    arr = binary_arr.combine_chunks() if hasattr(binary_arr, "combine_chunks") else binary_arr
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    values = np.frombuffer(bufs[2], dtype=np.uint8)
    return offsets, values


class SegmentSearcher:
    def __init__(
        self,
        seg_dir: str,
        n_docs_global: int,
        avgdl: float,
        scorer: str = "bm25",
        k1: float = 0.82,
        b: float = 0.68,
        cache_terms: int = 8192,
        prewarm_df: int | None = 5000,
    ):
        with open(os.path.join(seg_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
        self.terms = t["term"].to_pylist()
        self.term_index = {term: i for i, term in enumerate(self.terms)}
        self.idf = t["idf"].to_numpy()
        self.df_local = t["df_local"].to_numpy()
        self.bm25_sigma = t["bm25_sigma"].to_numpy()
        self.tfidf_sigma = t["tfidf_sigma"].to_numpy()
        self._docid_offs, self._docid_vals = _np_offsets(t["docid_bytes"])
        self._freq_offs, self._freq_vals = _np_offsets(t["freq_bytes"])
        skips = t.select(
            ["skip_last_docid", "skip_bm25_ub", "skip_tfidf_ub",
             "skip_docid_off", "skip_freq_off"]
        ).combine_chunks()
        self._skip_last = skips["skip_last_docid"]
        self._skip_bm25 = skips["skip_bm25_ub"]
        self._skip_tfidf = skips["skip_tfidf_ub"]
        self._skip_docid_off = skips["skip_docid_off"]
        self._skip_freq_off = skips["skip_freq_off"]
        # Only the dgap-blockrestart encoding exists on disk (pre-dgap
        # indexes lack the skip_*_off columns selected above, so they can
        # never reach this point anyway — the legacy branch was dead code).
        enc = self.manifest.get("docid_encoding")
        if enc != "varbyte-dgap-blockrestart":
            raise ValueError(f"unsupported docid encoding {enc!r} in {seg_dir}")
        # The delta-gap restart period is baked into the encoded docid
        # streams — decoding with a different B silently corrupts docids
        # from block 2 on, so it MUST come from the segment manifest.
        if "skip_block_size" not in self.manifest:
            raise ValueError(
                f"segment manifest {seg_dir} records no skip_block_size; "
                "rebuild the index (older builds always used the 15000 "
                "default — add it to the manifest if a rebuild is impossible)"
            )
        self.skip_block_size = int(self.manifest["skip_block_size"])

        # doc index (J3): docid-sorted doclen array + docno column
        files = self.manifest["doc_files"]
        dt = pads.dataset(files).to_table(columns=["docid", "docno", "doclen"])
        dt = dt.take(pc.sort_indices(dt, sort_keys=[("docid", "ascending")]))
        docids = dt["docid"].to_numpy()
        self.base_docid = int(docids[0]) if len(docids) else 0
        self.n_docs_seg = len(docids)
        assert self.n_docs_seg == 0 or (
            int(docids[-1]) - self.base_docid == self.n_docs_seg - 1
        ), "docids must be dense within a segment"
        self.doclen = dt["doclen"].to_numpy().astype(np.float64)
        self.docnos = dt["docno"]

        self.n_docs_global = n_docs_global
        self.avgdl = avgdl
        self.default_scorer = make_scorer(scorer, k1, b)
        self._cache: OrderedDict[int, tuple[np.ndarray, np.ndarray]] = OrderedDict()
        self._cache_cap = cache_terms
        if prewarm_df:
            # eagerly decode hot-term posting lists at load (once per
            # actor, parallel across the pool) so first queries don't pay
            # the big decodes; cold terms stay lazy + LRU-cached
            hot = np.flatnonzero(self.df_local >= prewarm_df)
            for ti in hot[: cache_terms // 2]:
                self.postings(int(ti))

    # ---------- posting access ----------

    def postings(self, ti: int) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (docids, tfs) for term index ``ti`` (LRU-cached)."""
        hit = self._cache.get(ti)
        if hit is not None:
            self._cache.move_to_end(ti)
            return hit
        docids = varbyte.decode(self._docid_vals[self._docid_offs[ti] : self._docid_offs[ti + 1]])
        # delta-gap with absolute restarts every skip-block: a grouped
        # cumsum per block reconstructs absolute docids
        n_ = len(docids)
        B = self.skip_block_size
        if n_ > 0:
            c = np.cumsum(docids)
            starts = np.arange(0, n_, B)
            base = c[starts] - docids[starts]
            counts = np.diff(np.concatenate((starts, [n_])))
            docids = c - np.repeat(base, counts)
        n = len(docids)
        tfs = unary.decode(self._freq_vals[self._freq_offs[ti] : self._freq_offs[ti + 1]], n)
        self._cache[ti] = (docids, tfs)
        if len(self._cache) > self._cache_cap:
            self._cache.popitem(last=False)
        return docids, tfs

    def decode_block(self, ti: int, block: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode ONE skip block of term ``ti`` directly from the packed
        streams using the stored skip offsets — the reference's ``nextGEQ``
        block repositioning (src/index/Index.cpp:169-214): the docid
        offset is a byte offset into the term's (delta-gap) docid stream,
        whose block starts are absolute restarts, and the freq offset is a
        bit offset into the term's unary stream (F7 packing). No upstream
        state is needed."""
        df = int(self.df_local[ti])
        B = self.skip_block_size
        n_blocks = (df + B - 1) // B
        assert 0 <= block < n_blocks, (block, n_blocks)
        n_in_block = min(B, df - block * B)

        docid_off = int(self._skip_docid_off[ti][block].as_py())
        next_off = (
            int(self._skip_docid_off[ti][block + 1].as_py())
            if block + 1 < n_blocks
            else int(self._docid_offs[ti + 1] - self._docid_offs[ti])
        )
        base = int(self._docid_offs[ti])
        gaps = varbyte.decode(self._docid_vals[base + docid_off : base + next_off])
        assert len(gaps) == n_in_block
        docids = np.cumsum(gaps)

        freq_bit = int(self._skip_freq_off[ti][block].as_py())
        fbase = int(self._freq_offs[ti])
        fend = int(self._freq_offs[ti + 1])
        byte_off, bit_off = divmod(freq_bit, 8)
        tfs = unary.decode(
            self._freq_vals[fbase + byte_off : fend], n_in_block, start_bit=bit_off
        )
        return docids.astype(np.uint64), tfs

    def _resolve_terms(self, qterms: list[str], conj: bool):
        """Semi/anti-join of query terms vs the local lexicon (J1)."""
        idxs = []
        for term in sorted(set(qterms)):
            i = self.term_index.get(term)
            if i is None:
                if conj:
                    return None  # conjunctive: any missing term ⇒ ∅
                continue
            idxs.append(i)
        return idxs

    # ---------- DAAT (Q2/Q3) ----------

    def query_daat(self, qterms: list[str], k: int, conj: bool = False, scorer=None):
        scorer = scorer or self.default_scorer
        idxs = self._resolve_terms(qterms, conj)
        if not idxs:
            return []
        acc = np.zeros(self.n_docs_seg, dtype=np.float64)
        cnt = np.zeros(self.n_docs_seg, dtype=np.int32)
        touched = []
        for i in idxs:
            docids, tfs = self.postings(i)
            local = (docids - self.base_docid).astype(np.int64)
            s = scorer.score(tfs, self.idf[i], self.doclen[local], self.avgdl)
            acc[local] += s
            cnt[local] += 1
            touched.append(local)
        cand = np.unique(np.concatenate(touched))
        if conj:
            cand = cand[cnt[cand] == len(idxs)]
            if len(cand) == 0:
                return []
        return self._topk(cand, acc[cand], k)

    def _topk(self, local_ids: np.ndarray, scores: np.ndarray, k: int):
        k_eff = min(k, len(local_ids))
        if len(local_ids) > 4 * k_eff:
            # tie-safe prefilter: keep everything scoring >= the k-th best
            # (ties at the boundary are resolved by docid in the sort below)
            thresh = np.partition(scores, len(scores) - k_eff)[len(scores) - k_eff]
            keep = scores >= thresh
            local_ids, scores = local_ids[keep], scores[keep]
        order = np.lexsort((local_ids, -scores))[:k_eff]
        out = []
        for j in order:
            lid = int(local_ids[j])
            out.append(
                (lid + self.base_docid, self.docnos[lid].as_py(), float(scores[j]))
            )
        return out

    # ---------- BMM (Q4) ----------

    def query_bmm(self, qterms: list[str], k: int, scorer=None):
        """Block-Max Maxscore, mirroring reference src/index/Index.cpp:15-133.

        Lists sorted by whole-list sigma ascending; essential lists (from
        the pivot up) are scored DAAT-style; non-essential lists are
        probed right-to-left only while the accumulated block upper bounds
        can still beat θ. Uses the quantized sigmas/block-UBs, so pruning
        decisions match the reference bit-for-bit; final scores equal
        DAAT's up to float addition order (the reference adds in
        sigma-order too).
        """
        scorer = scorer or self.default_scorer
        idxs = self._resolve_terms(qterms, conj=False)
        if not idxs:
            return []
        use_bm25 = isinstance(scorer, Bm25Scorer)
        sigmas = (self.bm25_sigma if use_bm25 else self.tfidf_sigma)[idxs]
        order = np.argsort(sigmas, kind="stable")
        lists = []
        for j in order:
            i = idxs[j]
            docids, tfs = self.postings(i)
            local = (docids - self.base_docid).astype(np.int64)
            s = scorer.score(tfs, self.idf[i], self.doclen[local], self.avgdl)
            ub_col = self._skip_bm25 if use_bm25 else self._skip_tfidf
            block_ubs = np.asarray(ub_col[i].as_py(), dtype=np.float64)
            lists.append({"docids": docids, "scores": s, "pos": 0,
                          "sigma": float(sigmas[j]), "block_ubs": block_ubs})

        upper_bounds = np.cumsum([pl["sigma"] for pl in lists])
        heap: list[tuple[float, int]] = []  # min-heap of (score, -docid)
        theta = 0.0
        pivot = 0
        curr = min(int(pl["docids"][0]) for pl in lists)
        B = self.skip_block_size

        while lists and pivot < len(lists):
            score = 0.0
            nxt = np.iinfo(np.int64).max
            # essential lists
            for pl in lists[pivot:]:
                d = pl["docids"]
                p = pl["pos"]
                if p < len(d) and int(d[p]) == curr:
                    score += float(pl["scores"][p])
                    pl["pos"] = p = p + 1
                if p < len(d):
                    nxt = min(nxt, int(d[p]))
            # non-essential lists, right to left, while UBs can beat θ
            if pivot != 0 and score + upper_bounds[pivot - 1] > theta:
                bub = np.cumsum([pl["block_ubs"][min(pl["pos"] // B, len(pl["block_ubs"]) - 1)]
                                 for pl in lists[:pivot]])
                for i in range(pivot - 1, -1, -1):
                    if score + bub[i] <= theta:
                        break
                    pl = lists[i]
                    d = pl["docids"]
                    # nextGEQ via searchsorted (galloping ≙ block skip)
                    p = int(np.searchsorted(d, curr, side="left"))
                    if p > pl["pos"]:
                        pl["pos"] = p
                    if pl["pos"] < len(d) and int(d[pl["pos"]]) == curr:
                        score += float(pl["scores"][pl["pos"]])
            # heap insert (strict >, reference Index.hpp:60-77)
            if len(heap) < k or score > heap[0][0]:
                heapq.heappush(heap, (score, -curr))
                if len(heap) > k:
                    heapq.heappop(heap)
                # θ is only a valid pruning threshold once the heap is
                # full — with fewer than k results every doc must still
                # be examined (reference keeps θ=0 until size==k)
                if len(heap) == k:
                    theta = heap[0][0]
                while pivot < len(lists) and upper_bounds[pivot] <= theta:
                    pivot += 1
            # drop exhausted lists, shifting the pivot when a list before
            # it is removed (reference src/index/Index.cpp:107-127; like
            # the reference, upper_bounds is *not* rebuilt — stale bounds
            # are only larger, so pruning stays safe)
            kept = []
            for pl in lists:
                if pl["pos"] >= len(pl["docids"]):
                    if pivot > len(kept):
                        pivot -= 1
                else:
                    kept.append(pl)
            lists = kept
            if nxt == np.iinfo(np.int64).max:
                break
            curr = nxt

        results = [(-negd, s) for s, negd in heap]
        results.sort(key=lambda r: (-r[1], r[0]))
        return [
            (d, self.docnos[d - self.base_docid].as_py(), s) for d, s in results
        ]

    # ---------- vectorized Maxscore (fast path for Q4's semantics) ----------

    def query_maxscore(self, qterms: list[str], k: int, scorer=None):
        """Maxscore with sigma-ordered safe pruning, vectorized.

        Same *semantics* as the reference's Block-Max Maxscore (a safe
        pruning of the disjunctive top-k — reference src/index/Index.cpp:15-133):
        lists are ranked by whole-list sigma; candidate docs are drawn from
        lists in descending-sigma order, and the scan stops as soon as the
        remaining lists' cumulative upper bound cannot beat θ — every
        unscored doc then has score ≤ θ. Scoring of each candidate sums
        contributions in lexicographic term order, so returned scores are
        bit-identical to DAAT's (the selection is what's pruned, not the
        arithmetic). Per-posting work is numpy ``searchsorted`` gathers
        instead of the reference's cursor loop.
        """
        scorer = scorer or self.default_scorer
        idxs = self._resolve_terms(qterms, conj=False)
        if not idxs:
            return []
        use_bm25 = isinstance(scorer, Bm25Scorer)
        sigmas = (self.bm25_sigma if use_bm25 else self.tfidf_sigma)[idxs]
        order = np.argsort(sigmas, kind="stable")  # ascending sigma
        # stored sigmas are fixed-point-TRUNCATED like the reference's
        # (types.hpp: static_cast<uint64_t>(sigma*100)), i.e. up to one
        # quantum BELOW the true list max; add the quantum back so the
        # bound is safe and results stay exactly DAAT's. (The reference's
        # own BMM prunes with the truncated value and can therefore
        # deviate from its DAAT at quantization boundaries — mirrored
        # faithfully by mode="bmm_ref".)
        upper_bounds = np.cumsum(sigmas[order] + 0.01)

        # decode + score each list once (lexicographic order = idxs order)
        lex_lists = []
        for i in idxs:
            docids, tfs = self.postings(i)
            local = (docids - self.base_docid).astype(np.int64)
            s = scorer.score(tfs, self.idf[i], self.doclen[local], self.avgdl)
            lex_lists.append((local, s))

        theta = -np.inf
        cand_ids: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        seen: np.ndarray | None = None
        n_collected = 0
        for rank in range(len(order) - 1, -1, -1):
            # strict <: docs scoring exactly θ still get scored so the
            # (score desc, docid asc) tie-break stays exact vs DAAT
            if n_collected >= k and upper_bounds[rank] < theta:
                break  # no unscored doc can beat θ — safe stop
            cand = lex_lists[order[rank]][0]
            if seen is not None:
                cand = cand[
                    seen[np.searchsorted(seen, cand).clip(0, len(seen) - 1)] != cand
                ] if len(seen) else cand
            if len(cand) == 0:
                continue
            acc = np.zeros(len(cand), dtype=np.float64)
            for local, s in lex_lists:  # lexicographic addition order
                pos = np.searchsorted(local, cand)
                pos_c = pos.clip(0, len(local) - 1)
                m = local[pos_c] == cand
                acc[m] += s[pos_c[m]]
            cand_ids.append(cand)
            cand_scores.append(acc)
            n_collected += len(cand)
            seen = np.concatenate(cand_ids)
            seen.sort()
            if n_collected >= k:
                allsc = np.concatenate(cand_scores)
                kth = np.partition(allsc, len(allsc) - k)[len(allsc) - k]
                theta = max(theta, kth)
        if not cand_ids:
            return []
        return self._topk(np.concatenate(cand_ids), np.concatenate(cand_scores), k)

    # ---------- generic dispatch ----------

    def query(self, qterms: list[str], k: int, mode: str = "daat", scorer_name: str | None = None):
        scorer = make_scorer(scorer_name) if scorer_name else None
        if mode == "daat":
            return self.query_daat(qterms, k, conj=False, scorer=scorer)
        if mode == "daat_conj":
            return self.query_daat(qterms, k, conj=True, scorer=scorer)
        if mode == "bmm":
            return self.query_maxscore(qterms, k, scorer=scorer)
        if mode == "bmm_ref":
            return self.query_bmm(qterms, k, scorer=scorer)
        raise ValueError(f"unknown mode {mode!r}")

    def query_batch(self, queries: list[list[str]], k: int, mode: str = "daat",
                    scorer_name: str | None = None):
        return [self.query(q, k, mode, scorer_name) for q in queries]
