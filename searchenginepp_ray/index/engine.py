"""Multi-segment query engine: scatter/gather over a SegmentSearcher pool.

Mirrors the reference engine's lifecycle (reference src/engine.cpp:15-140):
load global metadata once, one worker per segment, normalize the query
with the *same* normalizer as the build, scatter to every segment, merge
the per-segment top-k into a global top-k. Per-segment workers are Ray
actors (one per segment, ``num_cpus`` configurable); a ``use_actors=False``
mode runs them in-process for tests/tools.

The cross-segment merge sorts by (score desc, docid asc) — deterministic
where the reference's unstable sort is not (src/engine.cpp:124).
"""

from __future__ import annotations

import json
import os

import ray

from ..config import BuildConfig, NormalizerProfile
from ..normalizer.word_normalizer import normalize_tokens
from .searcher import SegmentSearcher


class QueryEngine:
    def __init__(
        self,
        index_dir: str,
        scorer: str = "bm25",
        use_actors: bool = True,
        profile: NormalizerProfile | None = None,
        cfg: BuildConfig | None = None,
        num_cpus_per_actor: float = 1,
    ):
        cfg = cfg or BuildConfig()
        self.profile = profile or cfg.profile
        with open(os.path.join(index_dir, "global", "metadata.json")) as f:
            self.meta = json.load(f)
        if self.meta["profile_id"] != self.profile.profile_id:
            raise ValueError(
                "normalizer profile mismatch: index was built with a different "
                "profile than the query engine is configured with"
            )
        self.seg_dirs = sorted(
            (os.path.join(index_dir, d) for d in os.listdir(index_dir) if d.startswith("db_")),
            key=lambda p: int(p.rsplit("_", 1)[1]),
        )
        args = dict(
            n_docs_global=self.meta["n_docs"],
            avgdl=self.meta["avgdl"],
            scorer=scorer,
            k1=cfg.bm25_k1,
            b=cfg.bm25_b,
        )
        self.use_actors = use_actors
        if use_actors:
            actor_cls = ray.remote(SegmentSearcher)
            self.workers = [
                actor_cls.options(num_cpus=num_cpus_per_actor).remote(d, **args)
                for d in self.seg_dirs
            ]
        else:
            self.workers = [SegmentSearcher(d, **args) for d in self.seg_dirs]

    # ---------- query path ----------

    def normalize_query(self, text: str) -> list[str]:
        """Same normalizer as the build; dedup+sort (reference
        src/engine.cpp:88-96)."""
        return sorted(set(normalize_tokens(text, self.profile)))

    def search(self, query: str | list[str], k: int = 10, mode: str = "daat",
               scorer_name: str | None = None):
        return self.search_batch([query], k, mode, scorer_name)[0]

    def search_batch(self, queries, k: int = 10, mode: str = "daat",
                     scorer_name: str | None = None):
        """Batch scatter/gather: one remote call per segment for the whole
        batch (amortizes RPC), then a tiny driver-side merge per query
        (k × n_segments rows)."""
        toks = [
            self.normalize_query(q) if isinstance(q, str) else sorted(set(q))
            for q in queries
        ]
        if self.use_actors:
            per_seg = ray.get(
                [w.query_batch.remote(toks, k, mode, scorer_name) for w in self.workers]
            )
        else:
            per_seg = [w.query_batch(toks, k, mode, scorer_name) for w in self.workers]
        out = []
        for qi in range(len(toks)):
            merged = [r for seg in per_seg for r in seg[qi]]
            merged.sort(key=lambda r: (-r[2], r[0]))
            out.append(merged[:k])
        return out

    def trec_lines(self, query_id, results, run_name: str = "seppray") -> list[str]:
        """TREC run format (reference src/engine.cpp:132-135)."""
        return [
            f"{query_id} Q0 {docno} {rank} {score} {run_name}"
            for rank, (_docid, docno, score) in enumerate(results, start=1)
        ]
