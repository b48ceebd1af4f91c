"""Corpus compaction — the small-file repair utility for parquet corpora.

At crawl scale a corpus arrives as millions of small parquet files (one
per fetch batch); every downstream read then pays per-file open/plan
costs and the scheduler drowns in tiny blocks. ``compact_corpus``
rewrites such a layout into ~``target_mb`` files with:

- **deterministic planning**: inputs sorted by path, greedy bin-packed
  by on-disk size — the plan is a pure function of the input listing,
  so reruns and different cluster sizes produce the identical layout;
- **streaming copy**: each output file is written by one Ray task that
  iterates its inputs' record batches through a ``ParquetWriter`` —
  memory is bounded by one row group, never a whole output file;
- **per-partition lineage + resumability**: every part writes a
  ``part-K.manifest.json`` carrying the plan's lineage key, input list
  and row count under ``out_dir/_manifests/`` (the "_" prefix keeps
  parquet dataset discovery away); a rerun skips parts whose manifest
  matches (the index build's checkpoint contract, `index/build.py`),
  and files are written
  atomically (tmp + ``os.replace``) so a crash never leaves a torn
  part behind a matching manifest.

Row ORDER is preserved (files concatenated in sorted-path order), so a
layout-derived docid assignment over the compacted corpus equals the
assignment over the original shard list read in the same order.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def plan_compaction(inputs: list[str], target_mb: float = 256
                    ) -> list[list[str]]:
    """Greedy size bin-packing in sorted-path order: a new output part
    starts when adding the next file would exceed ``target_mb`` (a part
    always takes at least one file, so oversized inputs pass through
    1:1)."""
    target = int(target_mb * (1 << 20))
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for p in sorted(inputs):
        sz = os.path.getsize(p)
        if cur and cur_bytes + sz > target:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(p)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def compact_corpus(inputs: list[str] | str, out_dir: str,
                   target_mb: float = 256, force: bool = False) -> dict:
    """Compact ``inputs`` (a directory of ``*.parquet`` or an explicit
    file list) into ``out_dir/part-K.parquet`` files of ~``target_mb``.
    Returns ``{"out_dir", "n_parts", "n_rows", "n_skipped",
    "lineage_key"}``."""
    if isinstance(inputs, str):
        files = [os.path.join(inputs, f) for f in os.listdir(inputs)
                 if f.endswith(".parquet")]
    else:
        files = list(inputs)
    if not files:
        raise ValueError("compact_corpus: no input parquet files")
    groups = plan_compaction(files, target_mb)
    lineage_key = hashlib.sha256(json.dumps(
        [[(os.path.basename(p), os.path.getsize(p)) for p in g]
         for g in groups] + [target_mb]
    ).encode()).hexdigest()[:16]
    os.makedirs(out_dir, exist_ok=True)

    def compact_part(batch: dict) -> "pa.Table":
        rows = []
        for part, group in zip(batch["part"], batch["files"]):
            part = int(part)
            # zero-padded so sorted-path order == part order (docid
            # derivation reads files in sorted-path order)
            out = os.path.join(out_dir, f"part-{part:05d}.parquet")
            # under _manifests/ — the "_" prefix keeps dataset
            # discovery (ignore_prefixes) from reading them as data
            man = os.path.join(out_dir, "_manifests",
                               f"part-{part:05d}.json")
            os.makedirs(os.path.dirname(man), exist_ok=True)
            if not force and os.path.exists(man) and os.path.exists(out):
                with open(man) as f:
                    m = json.load(f)
                if m.get("lineage_key") == lineage_key:
                    m["skipped"] = True
                    rows.append(m)
                    continue
            schema = pq.ParquetFile(group[0]).schema_arrow
            n_rows = 0
            with pq.ParquetWriter(out + ".tmp", schema) as w:
                for p in group:
                    pf = pq.ParquetFile(p)
                    for b in pf.iter_batches():
                        t = pa.Table.from_batches([b]).cast(schema)
                        w.write_table(t)
                        n_rows += len(t)
                    pf.close()
            os.replace(out + ".tmp", out)
            m = {"part": part, "n_rows": n_rows,
                 "n_files_in": len(group),
                 "files": [os.path.basename(p) for p in group],
                 "lineage_key": lineage_key, "skipped": False}
            with open(man + ".tmp", "w") as f:
                json.dump(m, f)
            os.replace(man + ".tmp", man)
            rows.append(m)
        return pa.table({
            "part": pa.array([r["part"] for r in rows], pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
            "n_files_in": pa.array([r["n_files_in"] for r in rows],
                                   pa.int64()),
            "skipped": pa.array([bool(r["skipped"]) for r in rows]),
        })

    manifest = (
        ray.data.from_items(
            [{"part": i, "files": g} for i, g in enumerate(groups)]
        )
        .map_batches(compact_part, batch_size=1)
        .to_pandas()  # one row per output part — bounded by the plan
    )
    return {
        "out_dir": out_dir,
        "n_parts": len(groups),
        "n_rows": int(manifest["n_rows"].sum()) if len(manifest) else 0,
        "n_skipped": int(manifest["skipped"].sum()) if len(manifest) else 0,
        "lineage_key": lineage_key,
    }
