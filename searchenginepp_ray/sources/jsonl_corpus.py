"""JSONL corpus source — line-delimited JSON, the lingua franca of web
crawl / training-data interchange (one JSON object per line).

Sharding reuses the TSV source's byte-range line scanner
(:func:`.tsv_corpus.scan_line_shards`): one driver-side metadata pass
cuts ~``rows_per_shard``-line shards at exact newline boundaries, each
recording ``(byte_start, byte_end, base_docid)``, so read tasks parse
their slice independently and docids stay a pure function of the input
layout (retry-stable, no global data pass). Parsing is pyarrow's
vectorized line-delimited JSON reader over the shard's byte slice — no
per-line Python. Any JSON fields come through as table columns; the
engine's ``ColumnSpec`` maps them onto (docno, text) as usual."""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from .parquet_corpus import ColumnSpec
from .tsv_corpus import _list_files, scan_line_shards

#: default field mapping: {"docno": ..., "text": ...} objects
JSONL_CORPUS = ColumnSpec(text_col="text", docno_cols=("docno",))


@dataclass(frozen=True)
class JsonlShard:
    path: str
    byte_start: int
    byte_end: int
    base_docid: int  # docid of this shard's first line (1-based)
    num_rows: int


def jsonl_shards(paths: list[str] | str,
                 rows_per_shard: int = 4096) -> list[JsonlShard]:
    return [JsonlShard(*t)
            for t in scan_line_shards(_list_files(paths, ".jsonl"),
                                      rows_per_shard)]


def read_jsonl_shard(shard: JsonlShard) -> pa.Table:
    """Parse one shard's byte slice with pyarrow's vectorized JSON
    reader. Column order/type comes from the JSON objects themselves."""
    import io

    import pyarrow.json as pj

    with open(shard.path, "rb") as f:
        f.seek(shard.byte_start)
        blob = f.read(shard.byte_end - shard.byte_start)
    t = pj.read_json(io.BytesIO(blob))
    assert len(t) == shard.num_rows, (len(t), shard.num_rows)
    return t
