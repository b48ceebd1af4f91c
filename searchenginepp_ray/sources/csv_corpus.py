"""CSV corpus source — full RFC-quoting support via a per-file staging
conversion rather than byte-range line sharding.

Unlike TSV/JSONL, CSV records may contain EMBEDDED NEWLINES inside
quoted fields, so the shared byte-range line scanner
(:func:`.tsv_corpus.scan_line_shards`) cannot cut shard boundaries
safely. The correct distributed shape is a one-time staging pass: one
Ray task per input file runs pyarrow's vectorized CSV parser (quoting,
escapes and embedded newlines handled by Arrow's C++ reader — no
per-line Python) and writes ONE parquet file per input file, so the
staged layout is a pure function of the input file list (deterministic,
retry-stable, resumable per file) and every downstream consumer — the
index build's layout-derived docids included — sees an ordinary parquet
corpus. The staging directory is content-addressed by the input files'
(path, size, mtime) fingerprint, so re-running skips finished files and
regenerated inputs invalidate cleanly."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from .tsv_corpus import _list_files


def _fingerprint(files: list[str]) -> str:
    h = hashlib.sha256()
    for p in files:
        st = os.stat(p)
        h.update(f"{os.path.abspath(p)}:{st.st_size}:{st.st_mtime_ns};"
                 .encode())
    return h.hexdigest()[:12]


def stage_csv_to_parquet(paths: list[str] | str,
                         stage_root: str = "/tmp/seppray_csv_stage"
                         ) -> str:
    """Convert CSV file(s) to a staged parquet corpus directory (one
    parquet per input file, input order preserved in the file names).
    Returns the staging directory; repeated calls are no-ops while the
    inputs are unchanged."""
    import ray

    files = _list_files(paths, ".csv")
    if not files:
        raise ValueError(f"no .csv files under {paths!r}")
    out_dir = os.path.join(stage_root, _fingerprint(files))
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def stage_one(path: str, out_path: str) -> int:
        import pyarrow.csv as pcsv
        import pyarrow.parquet as pq

        t = pcsv.read_csv(path)  # vectorized; quoting/newlines handled
        tmp = out_path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, out_path)  # atomic: no torn files on retry
        return len(t)

    refs = []
    for i, p in enumerate(files):
        out_path = os.path.join(out_dir, f"part-{i:05d}.parquet")
        if not os.path.exists(out_path):
            refs.append(stage_one.remote(p, out_path))
    if refs:
        ray.get(refs)
    return out_dir
