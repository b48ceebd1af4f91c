"""Document deletes without a rebuild — tombstones.

The missing third phase of the index lifecycle (build → serve →
**delete/compact**): :func:`delete_docs` marks documents dead in a
served index in O(deletes) time; every query path then excludes them
exactly (the searcher's alive-mask routes through the same masked
DAAT/Maxscore machinery as faceted search, so a deleted doc can never
appear in, or displace anything from, a top-k). Collection statistics
(idf, avgdl, sigmas) intentionally keep the deleted docs until a
merge/compaction reclaims them — the standard tombstone contract
(deletes must be cheap and immediately visible; statistics converge
when the index is next rebuilt over the alive corpus — see below).
Beyond-reference: the C++ engine has no delete path at all.

Scale shape: the tombstone set is delete-sized, not corpus-sized — one
small sorted Parquet under ``global/`` read once per engine construction
and turned into a per-segment bool mask inside each actor (an ``is_in``
against the segment's own docnos; segments with no deleted docs keep a
``None`` mask and an untouched fast path).

PHYSICAL reclaim is a rebuild, not a merge: ``merge_segments`` carries
the tombstone file into the merged index (the masked serving view is
preserved — post-merge deletes re-sync) but deleted docs still occupy
postings and the collection statistics still count them. A delete-heavy
index converges stats and reclaims space by rebuilding over the alive
corpus (the append-incremental build machinery makes that a
stages-2-3-only cost for the unchanged shards); merge-time physical
drop (filter + docid renumber + stat recompute inside MergeAssemble)
is the designed-but-unshipped optimization.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Iterable

import pyarrow as pa
import pyarrow.parquet as pq

TOMBSTONE_FILE = "tombstones.parquet"


def _path(index_dir: str) -> str:
    return os.path.join(index_dir, "global", TOMBSTONE_FILE)


def load_tombstones(index_dir: str) -> list[str]:
    """Sorted docnos of all deleted docs (empty when none)."""
    p = _path(index_dir)
    if not os.path.exists(p):
        return []
    return pq.read_table(p, columns=["docno"])["docno"].to_pylist()


def delete_docs(index_dir: str, docnos: Iterable[str]) -> int:
    """Mark documents deleted by docno. Idempotent (a docno may be
    deleted twice), incremental (merges with prior tombstones), atomic
    (tmp + rename — a crash never leaves a torn tombstone file).
    Returns the total number of tombstoned docs after the merge.

    Engines constructed BEFORE the call keep serving the old view
    (actors hold their masks); re-construct the engine — or serve
    through a fresh one — to observe the deletes, the same
    read-your-writes contract as adding segments."""
    merged = sorted(set(load_tombstones(index_dir))
                    | {str(d) for d in docnos})
    gdir = os.path.join(index_dir, "global")
    os.makedirs(gdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=gdir, suffix=".tombstones.tmp")
    os.close(fd)
    try:
        pq.write_table(
            pa.table({"docno": pa.array(merged, pa.string())}), tmp)
        os.replace(tmp, _path(index_dir))
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    # keep an audit line in the global metadata for lineage inspectors
    meta_path = os.path.join(gdir, "metadata.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        meta["n_tombstones"] = len(merged)
        fd, tmp = tempfile.mkstemp(dir=gdir, suffix=".meta.tmp")
        os.close(fd)
        try:
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, meta_path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
    return len(merged)
