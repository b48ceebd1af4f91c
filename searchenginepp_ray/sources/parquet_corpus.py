"""Corpus source: Parquet shards with deterministic, layout-derived docids.

The reference assigns ``docid = 1-based input line number``
(reference src/builder.cpp:277-278, 304-330) from a single-threaded stdin
read. Distributed equivalent: enumerate (file, row-group) pairs in
deterministic order (sorted file path, row-group index), compute each
shard's base docid from cumulative row counts in the Parquet footers, and
let every read task derive ``docid = base + row_index + 1`` locally. Docids
are then a pure function of the input layout — stable under any task
ordering or retry, with no global pass over the data (only the footers,
which are metadata-sized).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow.dataset as pads
import pyarrow.parquet as pq


@dataclass(frozen=True)
class CorpusShard:
    path: str
    row_group: int
    base_docid: int  # docid of this shard's first row (1-based)
    num_rows: int


@dataclass(frozen=True)
class ColumnSpec:
    """Maps an arbitrary corpus table onto the engine's (docno, text) model."""

    text_col: str
    docno_cols: tuple[str, ...]  # joined as repo:path@commit style, or a single col

    def docno_format(self) -> str:
        if len(self.docno_cols) == 3:
            return "{}:{}@{}"
        return "{}" + ":{}" * (len(self.docno_cols) - 1)


#: input_hint shape: (repo, path, commit, lang, content)
CODE_CORPUS = ColumnSpec(text_col="content", docno_cols=("repo", "path", "commit"))
#: /root/testdata documents table: (doc_id, text, lang, source, n_chars)
DOCUMENTS_CORPUS = ColumnSpec(text_col="text", docno_cols=("doc_id",))


def corpus_shards(paths: list[str] | str) -> list[CorpusShard]:
    """Enumerate row-group shards with cumulative base docids.

    Reads only Parquet footers. File order is sorted-path order so docids
    are independent of listing order.
    """
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        expanded = [f for f in pads.dataset(p).files]
        files.extend(expanded)
    files.sort()

    shards: list[CorpusShard] = []
    base = 1  # docids are 1-based, reference src/builder.cpp:277-278
    for f in files:
        meta = pq.read_metadata(f)
        for rg in range(meta.num_row_groups):
            n = meta.row_group(rg).num_rows
            shards.append(CorpusShard(f, rg, base, n))
            base += n
    return shards


def read_shard(shard: CorpusShard, columns: list[str]):
    """Read one row-group with column pruning (a task-local read)."""
    f = pq.ParquetFile(shard.path)
    return f.read_row_group(shard.row_group, columns=columns)
