"""Index integrity verification — ``fsck`` for a built index.

Answers "is this index servable, and does every stored invariant
actually hold?" without trusting any cached state: each segment is
re-opened from disk and every posting list fully decoded and checked
against the invariants the build promises (the checks the reference
implicitly relies on mmap + its unit tests for; here they are a
first-class operational tool for indexes that move between machines,
survive crashes mid-merge, or age across engine versions).

Per segment (one Ray task each — fsck of a 10^12-doc index is a
parallel scan of segment-sized units, never a driver loop):

* manifest sanity: required keys (incl. ``skip_block_size`` — pre-r2
  indexes without it are unservable), counts non-negative.
* doc table: row count == ``n_docs``, docids DENSE from
  ``base_docid``, doclens non-negative, sum == ``sum_doclen``.
* terms: sorted ascending, unique; per term the decoded posting list
  is strictly increasing, within the segment's docid range, its length
  == ``df_local``, the freq stream decodes to the same length with all
  tfs ≥ 1; Σ df_local == ``n_postings``.
* skip metadata: per-block fences (``skip_last_docid``) equal the last
  docid of each decoded block, and block-by-block decode concatenates
  to the full-list decode (the lazy query paths' load-bearing
  invariant).
* tombstones (if present): sorted, unique.

``deep=True`` adds the CROSS-segment check: every term's
``df_global`` recorded in the segments equals the sum of its
``df_local`` over all segments (one vectorized aggregation over the
per-segment term tables — vocabulary-sized traffic, no text).

Returns a report dict; ``ok`` is False iff any check failed. The CLI
(``fsck`` subcommand) prints the report as JSON and exits non-zero on
corruption.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import ray

_REQUIRED_MANIFEST = (
    "seg", "base_docid", "n_docs", "n_terms", "n_postings",
    "sum_doclen", "doc_files", "skip_block_size", "profile_id",
)


def _fsck_segment(seg_dir: str, deep: bool = False) -> dict:
    """All single-segment checks; returns {seg, errors: [...], n_terms,
    n_postings, (term, df_local) arrays for the deep check}."""
    errors: list[str] = []

    def err(msg: str) -> None:
        if len(errors) < 50:  # bound the report
            errors.append(msg)

    try:
        with open(os.path.join(seg_dir, "manifest.json")) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        return {"seg_dir": seg_dir, "errors": [f"manifest unreadable: {e}"]}
    for k in _REQUIRED_MANIFEST:
        if k not in manifest:
            err(f"manifest missing key {k!r}")
    if errors:
        return {"seg_dir": seg_dir, "errors": errors}

    from .searcher import SegmentSearcher

    try:
        s = SegmentSearcher(seg_dir, n_docs_global=1, avgdl=1.0,
                            prewarm_df=None)
    except Exception as e:  # noqa: BLE001 — fsck must report, not raise
        return {"seg_dir": seg_dir, "errors": [f"segment unloadable: {e}"]}

    # --- doc table ---
    if s.n_docs_seg != manifest["n_docs"]:
        err(f"doc rows {s.n_docs_seg} != manifest n_docs "
            f"{manifest['n_docs']}")
    if (s.doclen < 0).any():
        err("negative doclen")
    if int(s.doclen.sum()) != manifest["sum_doclen"]:
        err(f"sum(doclen) {int(s.doclen.sum())} != manifest sum_doclen "
            f"{manifest['sum_doclen']}")

    # --- terms + postings ---
    terms = s.terms
    if len(terms) != manifest["n_terms"]:
        err(f"{len(terms)} terms != manifest n_terms "
            f"{manifest['n_terms']}")
    if any(terms[i] >= terms[i + 1] for i in range(len(terms) - 1)):
        err("terms not sorted/unique")
    lo = s.base_docid
    hi = s.base_docid + s.n_docs_seg
    total_postings = 0
    for ti in range(len(terms)):
        try:
            docids, tfs = s.postings(ti)
        except Exception as e:  # noqa: BLE001
            err(f"term {terms[ti]!r}: postings undecodable: {e}")
            continue
        total_postings += len(docids)
        if len(docids) != int(s.df_local[ti]):
            err(f"term {terms[ti]!r}: decoded {len(docids)} postings, "
                f"df_local {int(s.df_local[ti])}")
        if len(tfs) != len(docids) or (len(tfs) and tfs.min() < 1):
            err(f"term {terms[ti]!r}: freq stream length/values invalid")
        if len(docids):
            d = docids.astype(np.int64)
            if (np.diff(d) <= 0).any():
                err(f"term {terms[ti]!r}: docids not strictly increasing")
            if d[0] < lo or d[-1] >= hi:
                err(f"term {terms[ti]!r}: docid outside segment range")
        # skip fences + block-decode ≡ full-decode (the decoder's own
        # asserts fire on inconsistent metadata — report, don't crash)
        try:
            nb = s.n_blocks(ti)
            off = s._skip_offs[ti]
            fences = s._skip_last_v[off: s._skip_offs[ti + 1]]
            parts = []
            for b in range(nb):
                bd, _ = s.block(ti, b)
                parts.append(bd)
                if len(bd) and int(fences[b]) != int(bd[-1]):
                    err(f"term {terms[ti]!r}: block {b} fence "
                        f"{int(fences[b])} != last docid {int(bd[-1])}")
            if parts and not np.array_equal(np.concatenate(parts), docids):
                err(f"term {terms[ti]!r}: block decode != full decode")
        except Exception as e:  # noqa: BLE001
            err(f"term {terms[ti]!r}: block decode failed: {e!r}")
    if total_postings != manifest["n_postings"]:
        err(f"Σ postings {total_postings} != manifest n_postings "
            f"{manifest['n_postings']}")

    # --- positional sidecar (when the manifest declares one) ---
    if manifest.get("positions"):
        if not os.path.exists(os.path.join(seg_dir, "positions.parquet")):
            err("manifest says positions but positions.parquet missing")
        else:
            for ti in range(len(terms)):
                try:
                    docids, tfs, pos = s.term_positions(ti)
                except Exception as e:  # noqa: BLE001
                    err(f"term {terms[ti]!r}: positions undecodable: {e!r}")
                    continue
                if len(pos) != int(tfs.sum()):
                    err(f"term {terms[ti]!r}: {len(pos)} positions != "
                        f"Σtf {int(tfs.sum())}")
                    continue
                if len(pos):
                    # within each posting, positions strictly ascend and
                    # start non-negative
                    tf64 = tfs.astype(np.int64)
                    starts = np.cumsum(tf64) - tf64
                    bad = np.diff(pos) <= 0
                    bad[starts[1:] - 1] = False  # posting boundaries
                    if bad.any() or (pos[starts] < 0).any():
                        err(f"term {terms[ti]!r}: positions not strictly "
                            "ascending within a posting")

    out = {
        "seg_dir": seg_dir,
        "seg": manifest["seg"],
        "errors": errors,
        "n_docs": int(s.n_docs_seg),
        "n_postings": total_postings,
    }
    if deep:
        # vocabulary-sized payload ONLY in deep mode — a shallow fsck of
        # a huge index must not funnel every term string to the driver.
        # df_global isn't held by the searcher (it only needs idf) —
        # read it straight from the term table for the cross-segment
        # consistency check.
        out["terms"] = list(terms)
        out["df_local"] = s.df_local.astype(np.int64).tolist()
        out["df_global"] = pq.read_table(
            os.path.join(seg_dir, "terms.parquet"),
            columns=["df_global"],
        )["df_global"].to_numpy().astype(np.int64).tolist()
    return out


def fsck_index(index_dir: str, deep: bool = False) -> dict:
    """Verify a whole index; see module docstring. One Ray task per
    segment, a small driver merge (error strings + vocabulary-sized df
    arrays in deep mode only)."""
    report: dict = {"index_dir": index_dir, "ok": True, "errors": []}
    gmeta_path = os.path.join(index_dir, "global", "metadata.json")
    try:
        with open(gmeta_path) as f:
            gmeta = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        report["ok"] = False
        report["errors"].append(f"global metadata unreadable: {e}")
        return report
    if "n_docs" not in gmeta:
        report["ok"] = False
        report["errors"].append("global metadata missing n_docs")
        return report

    from .engine import list_segment_dirs

    seg_dirs = list_segment_dirs(index_dir)
    if not seg_dirs:
        report["ok"] = False
        report["errors"].append("no segments")
        return report

    fsck_remote = ray.remote(num_cpus=1)(_fsck_segment)
    results = ray.get([fsck_remote.remote(d, deep) for d in seg_dirs])

    n_docs = 0
    df_sum: dict[str, int] = {}
    df_global_seen: dict[str, int] = {}
    for r in results:
        for e in r["errors"]:
            report["errors"].append(f"{os.path.basename(r['seg_dir'])}: {e}")
        n_docs += r.get("n_docs", 0)
        if deep and not r["errors"] and "terms" in r:
            for t, dl in zip(r["terms"], r["df_local"]):
                df_sum[t] = df_sum.get(t, 0) + dl
            if r.get("df_global"):
                for t, dg in zip(r["terms"], r["df_global"]):
                    prev = df_global_seen.setdefault(t, dg)
                    if prev != dg:
                        report["errors"].append(
                            f"term {t!r}: df_global disagrees across "
                            f"segments ({prev} vs {dg})")

    if n_docs != gmeta["n_docs"]:
        report["errors"].append(
            f"Σ segment docs {n_docs} != global n_docs {gmeta['n_docs']}")

    if deep:
        for t, dg in df_global_seen.items():
            if df_sum.get(t) != dg:
                report["errors"].append(
                    f"term {t!r}: df_global {dg} != Σ df_local "
                    f"{df_sum.get(t)}")

    tomb = os.path.join(index_dir, "global", "tombstones.parquet")
    if os.path.exists(tomb):
        try:
            tl = pq.read_table(tomb, columns=["docno"])["docno"].to_pylist()
            if tl != sorted(set(tl)):
                report["errors"].append("tombstones not sorted/unique")
            report["n_tombstones"] = len(tl)
        except Exception as e:  # noqa: BLE001
            report["errors"].append(f"tombstones unreadable: {e}")

    report["n_segments"] = len(seg_dirs)
    report["n_docs"] = n_docs
    report["ok"] = not report["errors"]
    return report
