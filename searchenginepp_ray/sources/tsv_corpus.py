"""TSV corpus source — the reference's native input format.

The reference ``builder`` parses ``<docno>\\t<text>\\n`` lines from stdin
single-threaded and assigns ``docid = 1-based line number``
(reference src/builder.cpp:33-38, 304-330). Distributed equivalent: one
driver-side metadata pass scans each file in large chunks counting
newlines to cut ~``rows_per_shard``-line shards at exact line boundaries;
every shard records ``(byte_start, byte_end, base_docid)`` so read tasks
parse their slice independently and docids stay a pure function of the
input layout (same retry-stable property as the Parquet source's
row-group shards). The scan is I/O-bound sequential reading — metadata
cost, not a data pass (no parsing, no decoding).

``tsv_to_shard_table`` adapts a TSV shard to the engine's
``(docno, text)`` model so the same :class:`~..index.build.TokenizeShards`
machinery drives both formats (ColumnSpec ``TSV_CORPUS``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

from .parquet_corpus import ColumnSpec

#: TSV rows present as (docno, text) columns after parsing
TSV_CORPUS = ColumnSpec(text_col="text", docno_cols=("docno",))

_SCAN_CHUNK = 32 * 1024 * 1024


@dataclass(frozen=True)
class TsvShard:
    path: str
    byte_start: int
    byte_end: int
    base_docid: int  # docid of this shard's first line (1-based)
    num_rows: int


def _list_files(paths: list[str] | str, ext: str) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(ext)
            )
        else:
            files.append(p)
    files.sort()
    return files


def scan_line_shards(files: list[str], rows_per_shard: int = 4096
                     ) -> list[tuple[str, int, int, int, int]]:
    """Metadata pass shared by every line-delimited source (TSV, JSONL):
    newline-count each file in chunks, cutting shards at exact line
    boundaries every ``rows_per_shard`` lines. Returns
    (path, byte_start, byte_end, base_docid, num_rows) tuples."""
    shards: list[tuple[str, int, int, int, int]] = []
    base = 1
    for path in files:
        size = os.path.getsize(path)
        cut_offsets = [0]
        lines_total = 0
        lines_since_cut = 0
        with open(path, "rb") as f:
            pos = 0
            while True:
                chunk = f.read(_SCAN_CHUNK)
                if not chunk:
                    break
                start = 0
                while True:
                    nl = chunk.find(b"\n", start)
                    if nl == -1:
                        break
                    lines_total += 1
                    lines_since_cut += 1
                    if lines_since_cut == rows_per_shard:
                        cut_offsets.append(pos + nl + 1)
                        lines_since_cut = 0
                    start = nl + 1
                pos += len(chunk)
        # trailing line without newline
        if size and cut_offsets[-1] < size:
            with open(path, "rb") as f:
                f.seek(size - 1)
                if f.read(1) != b"\n":
                    lines_total += 1
                    lines_since_cut += 1
        if cut_offsets[-1] >= size:
            cut_offsets.pop()
        for i, off in enumerate(cut_offsets):
            end = cut_offsets[i + 1] if i + 1 < len(cut_offsets) else size
            n = min(rows_per_shard, lines_total - i * rows_per_shard)
            shards.append((path, off, end, base, n))
            base += n
    return shards


def tsv_shards(paths: list[str] | str, rows_per_shard: int = 4096) -> list[TsvShard]:
    """TSV shard enumeration over the shared line scanner."""
    return [TsvShard(*t)
            for t in scan_line_shards(_list_files(paths, ".tsv"), rows_per_shard)]


def read_tsv_shard(shard: TsvShard) -> pa.Table:
    """Parse one shard's byte slice into a ``(docno, text)`` table.

    Mirrors the reference's line parse (``getline(pid, '\\t')`` +
    ``getline(doc)``): the first tab splits docno from text; lines with no
    tab become ``(line, "")``."""
    with open(shard.path, "rb") as f:
        f.seek(shard.byte_start)
        blob = f.read(shard.byte_end - shard.byte_start)
    lines = blob.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    docnos, texts = [], []
    for ln in lines:
        docno, _, text = ln.partition(b"\t")
        # strict UTF-8 expected (MS MARCO-style input; latin1 mojibake IS
        # valid UTF-8); invalid bytes are replaced — documented deviation
        # from the reference's raw-byte passthrough
        docnos.append(docno.decode("utf8", "replace"))
        texts.append(text.decode("utf8", "replace"))
    assert len(docnos) == shard.num_rows, (len(docnos), shard.num_rows)
    return pa.table(
        {"docno": pa.array(docnos, pa.string()), "text": pa.array(texts, pa.string())}
    )
