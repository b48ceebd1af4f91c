"""Ray-Data-native inverted-index build pipeline.

Three super-stages, exchanging data through partitioned Parquet (the
disk-based shuffle also serves as the checkpoint boundary — a rerun skips
any stage/partition whose manifest matches):

1. **Tokenize** — ``Dataset`` of (file, row-group) shards →
   ``map_batches(TokenizeShards)`` (stateless tasks; normalizer state is
   process-cached) → per-doc rows ``(docid, docno, doclen, sha256, seg,
   terms, tfs)`` written as Parquet partitioned by ``seg``
   (segment = docid range, replacing the reference's 700 MB chunk cut,
   reference src/builder.cpp:23, 304-330).
2. **Global stats** — the tokenize tasks already wrote vocabulary-sized
   per-shard df/doclen partials; a tiny ``groupby("term").sum`` over them
   (the partial/final pattern replacing the reference's k-way lexicon
   merge, reference src/builder.cpp:127-170) yields the global lexicon +
   collection metadata (reference src/builder.cpp:177-181) without
   re-reading the tokenized table.
3. **Assemble segments** — one task per segment reads its partition,
   explodes to postings, sorts by (term, docid), VarByte/unary-encodes
   whole columns in single numpy passes, computes sigmas + 15,000-posting
   block-max skip pointers (reference src/builder.cpp:192-268), and
   writes ``db_<seg>/terms.parquet`` + a lineage manifest.

Skew note: posting lists are keyed by (term, segment); the segment (a
bounded docid range) acts as the salt for hot terms — a term's postings
in one group are capped at ``docs_per_segment`` and the per-segment
sub-lists concatenate in docid order by construction. This is the
salted-key split of SURVEY.md §7.4 with salt == segment id.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import BuildConfig
from ..normalizer.batch import tokenize_batch
from ..codecs import varbyte
from ..sources.parquet_corpus import ColumnSpec, CorpusShard, corpus_shards, read_shard
from . import scorer as scorer_mod

#: On-disk build format version, folded into the lineage key so caches
#: from older layouts (single-file global lexicon, seg-less partials)
#: rebuild instead of half-loading. Bump on any layout change.
_BUILD_FORMAT = "fmt3"

DOCS_SCHEMA = pa.schema(
    [
        ("docid", pa.uint64()),
        ("docno", pa.string()),
        ("doclen", pa.uint64()),
        ("sha256", pa.string()),
        ("seg", pa.int32()),
        ("terms", pa.list_(pa.string())),
        ("tfs", pa.list_(pa.uint32())),
    ]
)

#: positional-build doc schema: per doc, the flat 0-based token
#: positions of every posting's occurrences in (term, occurrence)
#: order (slice boundaries derivable from tfs; flat length == doclen)
DOCS_SCHEMA_POS = DOCS_SCHEMA.append(pa.field("poss", pa.list_(pa.uint32())))


class TokenizeShards:
    """map_batches callable over shard-descriptor rows.

    Stateless task-compatible: normalizer state (stem cache, compiled
    regexes) lives at module level and is built once per worker process.

    When constructed with ``docs_dir`` the task writes its own partitioned
    Parquet output (``seg=N/part-<shard>.parquet``, write-temp-then-rename
    so retries are idempotent) and returns only tiny manifest rows — the
    multi-hundred-MB tokenized blocks never transit the object store,
    which is both the 100 TB-scale shape (each task streams to shared
    storage) and much faster on plasma-constrained hosts.
    """

    def __init__(self, spec: ColumnSpec, cfg: BuildConfig, docs_dir: str | None = None):
        self.spec = spec
        self.cfg = cfg
        self.docs_dir = docs_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        shards = [_shard_from_item(row) for row in batch.to_pylist()]
        if self.docs_dir is None:
            out_tables = [self._tokenize_shard(s) for s in shards]
            return pa.concat_tables(out_tables) if out_tables else pa.table([], schema=DOCS_SCHEMA)
        rows = []
        for s in shards:
            rows.extend(self._tokenize_and_write(s))
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("seg", pa.int32()), ("file", pa.string()), ("n_docs", pa.int64())]
            ),
        )

    def _tokenize_and_write(self, shard) -> list[dict]:
        t = self._tokenize_shard(shard)
        out = []
        # a shard spans at most a couple of docid-range segments
        for seg in pc.unique(t["seg"]).to_pylist():
            part = t.filter(pc.equal(t["seg"], seg)).drop_columns(["seg"])
            seg_dir = os.path.join(self.docs_dir, f"seg={seg}")
            os.makedirs(seg_dir, exist_ok=True)
            name = f"part-{shard.base_docid:012d}-{_shard_ordinal(shard):05d}.parquet"
            final = os.path.join(seg_dir, name)
            tmp = final + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, final)
            out.append({"seg": int(seg), "file": final, "n_docs": part.num_rows})
        # shard-local df/doclen partials (vocabulary-sized) written beside
        # the docs: the global-stats stage aggregates these tiny files
        # instead of re-reading the full tokenized table (A1/A2 partials)
        pdir = os.path.join(self.docs_dir, "_partials")
        os.makedirs(pdir, exist_ok=True)
        pfinal = os.path.join(
            pdir, f"part-{shard.base_docid:012d}-{_shard_ordinal(shard):05d}.parquet"
        )
        ptmp = pfinal + ".tmp"
        pq.write_table(_partial_df(t), ptmp)
        os.replace(ptmp, pfinal)
        return out

    def _tokenize_shard(self, shard) -> pa.Table:
        cols = list(dict.fromkeys((*self.spec.docno_cols, self.spec.text_col)))
        t = _read_shard_any(shard, cols)
        texts = t[self.spec.text_col].to_pylist()
        docno_parts = [t[c].to_pylist() for c in self.spec.docno_cols]
        fmt = self.spec.docno_format()
        n = len(texts)

        docids = np.arange(shard.base_docid, shard.base_docid + n, dtype=np.uint64)
        segs = ((docids - 1) // self.cfg.docs_per_segment).astype(np.int32)
        docnos = [fmt.format(*(p[i] for p in docno_parts)) for i in range(n)]
        sha256s = [hashlib.sha256(x.encode("utf8")).hexdigest() for x in texts]
        # vectorized tokenizer: per-doc term-sorted unique terms + tfs
        # (the lexicon is term-sorted everywhere in the reference,
        # std::map, reference src/indexBuilder/IndexBuilder.hpp:41)
        cols_out = {}
        if self.cfg.positions:
            from ..normalizer.batch import tokenize_batch_positions

            doclens, terms_list, tfs_list, pos_list = \
                tokenize_batch_positions(texts, self.cfg.profile)
            cols_out["poss"] = pos_list.cast(pa.list_(pa.uint32()))
        else:
            doclens, terms_list, tfs_list = tokenize_batch(
                texts, self.cfg.profile)

        return pa.table(
            {
                "docid": docids,
                "docno": pa.array(docnos, pa.string()),
                "doclen": doclens,
                "sha256": pa.array(sha256s, pa.string()),
                "seg": segs,
                "terms": terms_list.cast(pa.list_(pa.string())),
                "tfs": tfs_list.cast(pa.list_(pa.uint32())),
                **cols_out,
            },
            schema=DOCS_SCHEMA_POS if self.cfg.positions else DOCS_SCHEMA,
        )


def _finalize_term_part(df, n_docs: int, term_df_dir: str):
    """Stage-2 term-partition kernel: global df + idf for this term-hash
    partition, written as one file of the partitioned global lexicon;
    returns the (seg, term, df, idf) rows for the per-segment exchange."""
    part = int(df["_part"].iloc[0])
    g = df.groupby("term", as_index=False, sort=True).agg(df=("df_part", "sum"))
    g["idf"] = scorer_mod.idf(n_docs, g["df"].to_numpy())
    final = os.path.join(term_df_dir, f"part-{part:05d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
    os.replace(tmp, final)
    # (seg, term) is globally unique after the drop_duplicates
    # (each term lives in exactly one term partition)
    st = df[["seg", "term"]].drop_duplicates().merge(g, on="term")
    return st[["seg", "term", "df", "idf"]]


def _write_seg_df(df, seg_df_dir: str):
    """Stage-2 segment-partition kernel: each segment's vocabulary slice
    of the global lexicon, term-sorted for searchsorted semi-joins."""
    import pandas as pd

    rows = []
    for seg, sub in df.groupby("seg", sort=False):
        sub = sub.sort_values("term")  # searchsorted order
        d = os.path.join(seg_df_dir, f"seg={int(seg)}")
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, "terms.parquet")
        tmp = final + ".tmp"
        pq.write_table(
            pa.Table.from_pandas(sub[["term", "df", "idf"]], preserve_index=False),
            tmp,
        )
        os.replace(tmp, final)
        rows.append({"seg": int(seg), "n_terms": len(sub)})
    return pd.DataFrame(rows) if rows else pd.DataFrame(
        {"seg": pd.Series([], dtype=np.int64),
         "n_terms": pd.Series([], dtype=np.int64)}
    )


@ray.remote
def _global_stage_single(
    partial_files: list[str], n_docs: int, term_df_dir: str, seg_df_dir: str,
    P: int,
) -> int:
    """Build stage 2 in one task — the small-vocabulary arm of the
    cost-based dispatch. Runs the SAME kernels over the same term-hash
    partition ids as the distributed arm (same term_df/part-K layout,
    same per-seg files, byte-identical), just without the two all-to-all
    exchanges, which cost more than the data when the partial set is
    tiny. Returns sum_doclen."""
    import pandas as pd

    from ..pipelines.agg import _key_hash

    t = pa.concat_tables([pq.read_table(f) for f in partial_files])
    sum_doclen = int(pc.sum(t["doclen_part"]).as_py() or 0)
    part = (_key_hash(t, ["term"]) % np.uint64(P)).astype(np.int32)
    df = t.to_pandas()
    df["_part"] = part
    seg_parts = [
        _finalize_term_part(sub, n_docs, term_df_dir)
        for _, sub in df.groupby("_part", sort=False)
    ]
    _write_seg_df(pd.concat(seg_parts, ignore_index=True), seg_df_dir)
    return sum_doclen


@ray.remote
def _fanout_split(files: list[str], P: int) -> list:
    """Fan-out arm wave 1: read a slice of the partial files, hash-
    partition rows by term (same hash, same ``P`` as the other two
    arms), and return ``[sum_doclen_slice, piece_0, …, piece_{P-1}]``
    via ``num_returns`` so each wave-2 task fetches only its own
    partition's pieces from the object store."""
    from ..pipelines.agg import _key_hash

    t = pa.concat_tables([pq.read_table(f) for f in files])
    sum_doclen = int(pc.sum(t["doclen_part"]).as_py() or 0)
    part = (_key_hash(t, ["term"]) % np.uint64(P)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    t = t.take(pa.array(order))  # take copies: slices below are views of a fresh table
    bounds = np.searchsorted(part[order], np.arange(P + 1))
    return [sum_doclen] + [
        t.slice(bounds[k], bounds[k + 1] - bounds[k]) for k in range(P)
    ]


@ray.remote
def _fanout_finalize(part: int, n_docs: int, term_df_dir: str, W: int,
                     *pieces: pa.Table) -> list:
    """Fan-out arm wave 2: one term-hash partition, the SAME
    :func:`_finalize_term_part` kernel as both other arms (groupby sums
    are order-independent ints, keys sorted, so the part-K file is
    byte-identical regardless of which arm ran). Returns the partition's
    (seg, term, df, idf) rows split ``seg % W`` ways for wave 3."""
    import pandas as pd

    tabs = [p for p in pieces if p.num_rows]
    empty = pa.table({"seg": pa.array([], pa.int32()),
                      "term": pa.array([], pa.string()),
                      "df": pa.array([], pa.int64()),
                      "idf": pa.array([], pa.float64())})
    if not tabs:
        # empty partition: no part-K file, matching the other arms
        return [empty] * W
    df = pa.concat_tables(tabs).to_pandas()
    df["_part"] = part
    st = _finalize_term_part(df, n_docs, term_df_dir)
    out = pa.Table.from_pandas(
        st[["seg", "term", "df", "idf"]], preserve_index=False)
    w = np.mod(st["seg"].to_numpy().astype(np.int64), W)
    return [out.filter(pa.array(w == i)) if (w == i).any() else empty
            for i in range(W)]


@ray.remote
def _fanout_write_seg(seg_df_dir: str, *tables: pa.Table) -> int:
    """Fan-out arm wave 3: write the per-segment lexicon slices for the
    segments routed here (``_write_seg_df`` sorts each segment's rows by
    term, so file bytes are independent of arrival order)."""
    tabs = [t for t in tables if t.num_rows]
    if tabs:
        _write_seg_df(pa.concat_tables(tabs).to_pandas(), seg_df_dir)
    return 0


def _global_stage_fanout(partial_files: list[str], n_docs: int,
                         term_df_dir: str, seg_df_dir: str, P: int) -> int:
    """Build stage 2 as three waves of plain Ray tasks — the middle arm
    of the cost-based dispatch. Same kernels, same term-hash partition
    ids, byte-identical ``global/`` output (pinned by
    test_global_stage_paths_identical), but parallel across the cluster
    without the per-exchange fixed cost of the Dataset arm, which
    dominates at the few-hundred-MB partial sets where the single-task
    arm is a flat serial constant. Returns sum_doclen."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    M = max(1, min(len(partial_files), cpus))
    W = P
    split = [
        _fanout_split.options(num_returns=P + 1).remote(partial_files[j::M], P)
        for j in range(M)
    ]
    doclen_refs = [refs[0] for refs in split]
    finalize = [
        _fanout_finalize.options(num_returns=W).remote(
            k, n_docs, term_df_dir, W, *[refs[1 + k] for refs in split])
        for k in range(P)
    ]
    writes = [
        _fanout_write_seg.remote(seg_df_dir, *[refs[w] for refs in finalize])
        for w in range(W)
    ]
    sum_doclen = sum(ray.get(doclen_refs))
    ray.get(writes)
    return sum_doclen


def _partial_df(batch: pa.Table) -> pa.Table:
    """Per-(segment, term) partial document frequency (terms are unique
    per doc; a shard spans at most a couple of segments), plus each
    segment's doclen sum spread on its first row (so the global groupby
    yields Σdoclen for free without a second pass over the docs).

    Carrying the segment id is what lets build stage 2 emit per-SEGMENT
    global-df semi-join files instead of materializing one global lexicon
    on the driver and broadcasting it to every assemble task."""
    out = []
    for seg in pc.unique(batch["seg"]).to_pylist():
        part = batch.filter(pc.equal(batch["seg"], seg))
        flat = pc.list_flatten(part["terms"])
        vc = flat.value_counts()
        n = len(vc)
        if n == 0:
            continue
        doclen_part = np.zeros(n, dtype=np.int64)
        doclen_part[0] = int(pc.sum(part["doclen"]).as_py() or 0)
        out.append(
            pa.table(
                {
                    "term": vc.field("values"),
                    "seg": pa.array(np.full(n, seg, np.int32)),
                    "df_part": vc.field("counts").cast(pa.int64()),
                    "doclen_part": pa.array(doclen_part, pa.int64()),
                }
            )
        )
    if not out:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "seg": pa.array([], pa.int32()),
                "df_part": pa.array([], pa.int64()),
                "doclen_part": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(out)


def _shard_ordinal(shard) -> int:
    """A per-file ordinal for output filenames (row-group index for
    Parquet shards, 0 for byte-range TSV shards — base_docid already
    makes the name unique)."""
    return getattr(shard, "row_group", 0)


def _shard_from_item(row: dict):
    """Rebuild a shard dataclass from its Dataset item dict."""
    if row.get("kind") == "tsv":
        from ..sources.tsv_corpus import TsvShard

        return TsvShard(row["path"], row["byte_start"], row["byte_end"],
                        row["base_docid"], row["num_rows"])
    if row.get("kind") == "jsonl":
        from ..sources.jsonl_corpus import JsonlShard

        return JsonlShard(row["path"], row["byte_start"], row["byte_end"],
                          row["base_docid"], row["num_rows"])
    return CorpusShard(row["path"], row["row_group"], row["base_docid"], row["num_rows"])


def _shard_to_item(shard) -> dict:
    from ..sources.jsonl_corpus import JsonlShard
    from ..sources.tsv_corpus import TsvShard

    if isinstance(shard, (TsvShard, JsonlShard)):
        kind = "tsv" if isinstance(shard, TsvShard) else "jsonl"
        return {"kind": kind, "path": shard.path, "byte_start": shard.byte_start,
                "byte_end": shard.byte_end, "base_docid": shard.base_docid,
                "num_rows": shard.num_rows}
    return {"kind": "parquet", "path": shard.path, "row_group": shard.row_group,
            "base_docid": shard.base_docid, "num_rows": shard.num_rows}


def _read_shard_any(shard, columns):
    from ..sources.jsonl_corpus import JsonlShard, read_jsonl_shard
    from ..sources.tsv_corpus import TsvShard, read_tsv_shard

    if isinstance(shard, TsvShard):
        return read_tsv_shard(shard)
    if isinstance(shard, JsonlShard):
        return read_jsonl_shard(shard)
    return read_shard(shard, columns)


def _append_compatible(sig_path: str, new_sig: dict) -> bool:
    """True iff the previously-built shard list is a prefix of the new
    one under identical params/format — the append-only case where every
    old shard's bytes, base docid and segment assignment are unchanged,
    so its stage-1 outputs remain valid verbatim."""
    try:
        with open(sig_path) as f:
            old = json.load(f)
    except (OSError, ValueError):
        return False
    if old.get("params") != new_sig["params"] or \
            old.get("format") != new_sig["format"]:
        return False
    old_shards = old.get("shards", [])
    new_shards = new_sig["shards"]
    return (0 < len(old_shards) <= len(new_shards)
            and new_shards[:len(old_shards)] == old_shards)


def _stage_marker(path: str, key: str) -> bool:
    try:
        return open(path).read() == key
    except OSError:
        return False


def _task_num_cpus() -> float:
    """CPU slots per heavy build task.

    Default 1 (one task per core — the right answer on real multi-node
    clusters). ``SEPPRAY_TASK_CPUS`` overrides; on virtualized single
    hosts whose memory-fault path degrades with many concurrently
    allocating processes, a value like 4 caps the number of simultaneous
    heavy tasks at ``cluster_cpus / 4`` while leaving semantics unchanged.
    """
    v = os.environ.get("SEPPRAY_TASK_CPUS")
    if v:
        return float(v)
    return 1.0


def _global_stage(docs_dir: str, global_dir: str, n_docs: int,
                  cfg: BuildConfig, lineage_key: str) -> None:
    """Build stage 2 (global stats): aggregate the per-shard
    ``docs/_partials`` into the partitioned global lexicon
    (``global/term_df/part-K``) + per-segment semi-join slices
    (``global/seg_df/seg=N``) and write ``global/metadata.json``.
    Shared by :func:`build_index` and :func:`compact_index` — both run
    it over a docs/ layout, so a compacted index's global state is
    byte-identical to a fresh build's over the same alive docs."""
    shutil.rmtree(global_dir, ignore_errors=True)
    os.makedirs(global_dir)
    term_df_dir = os.path.join(global_dir, "term_df")
    seg_df_dir = os.path.join(global_dir, "seg_df")
    os.makedirs(term_df_dir)
    os.makedirs(seg_df_dir)
    from ..pipelines.agg import hash_groupby_apply  # no import cycle
    from ..pipelines.dedup import _shuffle_width

    pdir = os.path.join(docs_dir, "_partials")
    partial_files = sorted(
        os.path.join(pdir, f)
        for f in os.listdir(pdir)
        if f.endswith(".parquet")
    )
    # the same partition width in both dispatch arms, fixed on the
    # driver, so their term_df/part-K layouts are identical
    P = _shuffle_width()
    psize = sum(os.path.getsize(f) for f in partial_files)
    # Cost-based three-way dispatch, all three arms byte-identical
    # (pinned by test_global_stage_paths_identical):
    #   tiny    -> one task (exchange fixed costs exceed the data)
    #   medium  -> fan-out task waves (parallel, no Dataset exchange
    #              fixed cost; removes the flat serial constant that
    #              capped strong scaling at 2M-row corpora)
    #   huge    -> Dataset arm (backpressure + spill for vocabularies
    #              that outgrow task heaps)
    single_cap = (
        int(os.environ.get("SEPPRAY_GLOBAL_SINGLE_TASK_MB", "16")) << 20
    )
    # bytes alone under-dispatch: a big corpus with a bounded vocabulary
    # has TINY partials spread over hundreds of files feeding thousands
    # of per-segment writes — serial per-file latency, not data volume,
    # is what the single task pays (measured 2.4 s at 2M docs / 3.9 MB /
    # 489 files). File count is the proxy for that latency.
    single_files_cap = int(
        os.environ.get("SEPPRAY_GLOBAL_SINGLE_TASK_FILES", "64"))
    fanout_cap = (
        int(os.environ.get("SEPPRAY_GLOBAL_FANOUT_MB", "4096")) << 20
    )
    if psize <= single_cap and len(partial_files) <= single_files_cap:
        sum_doclen = ray.get(
            _global_stage_single.remote(
                partial_files, n_docs, term_df_dir, seg_df_dir, P
            )
        )
    elif psize <= fanout_cap:
        sum_doclen = _global_stage_fanout(
            partial_files, n_docs, term_df_dir, seg_df_dir, P
        )
    else:
        parts_ds = ray.data.read_parquet(pdir)
        sum_doclen = int(parts_ds.sum("doclen_part") or 0)
        seg_rows = hash_groupby_apply(
            parts_ds,
            ["term"],
            lambda df: _finalize_term_part(df, n_docs, term_df_dir),
            P=P,
            keep_part=True,
        )
        # consuming the manifest rows executes the partitioned writes;
        # only (seg, n_terms) scalars ever reach the driver
        hash_groupby_apply(
            seg_rows, ["seg"], lambda df: _write_seg_df(df, seg_df_dir), P=P
        ).count()
    n_terms_global = sum(
        pq.read_metadata(os.path.join(term_df_dir, f)).num_rows
        for f in os.listdir(term_df_dir)
        if f.endswith(".parquet")
    )
    with open(os.path.join(global_dir, "metadata.json"), "w") as f:
        json.dump(
            {
                "n_docs": n_docs,
                "sum_doclen": sum_doclen,
                "avgdl": sum_doclen / max(n_docs, 1),
                "n_terms_global": n_terms_global,
                "params_id": cfg.params_id,
                "profile_id": cfg.profile.profile_id,
                # flags spelled out so query-side tooling can adopt
                # the build profile without being told (the reference
                # pins these at compile time, CMakeLists.txt:29-32)
                "profile_flags": {
                    "stemming": cfg.profile.stemming,
                    "fix_latin1": cfg.profile.fix_latin1,
                    "latin1_case": cfg.profile.latin1_case,
                },
                # build constants baked into the on-disk encoding
                # (delta-gap restart period, sigma/UB scoring params):
                # readers and merge MUST use these, not their own
                # defaults
                "build_params": {
                    "skip_block_size": cfg.skip_block_size,
                    "bm25_k1": cfg.bm25_k1,
                    "bm25_b": cfg.bm25_b,
                    "docs_per_segment": cfg.docs_per_segment,
                    "positions": cfg.positions,
                },
                "lineage_key": lineage_key,
            },
            f,
        )


def build_index(
    corpus_paths: list[str] | str,
    out_dir: str,
    cfg: BuildConfig | None = None,
    spec: ColumnSpec | None = None,
    *,
    force: bool = False,
    source_format: str = "parquet",
) -> dict:
    """Run the full build. Returns summary stats (docs, terms, postings…).

    Resumable: each super-stage writes a marker keyed on the input shard
    list + build params; a rerun with the same key skips the stage, and
    segment assembly additionally skips per-segment on its manifest.
    """
    import time as _time

    from ..sources.parquet_corpus import CODE_CORPUS

    stage_secs: dict[str, float] = {}
    _t0 = _time.perf_counter()

    cfg = cfg or BuildConfig()
    if source_format == "csv":
        # CSV cannot be byte-range line-sharded (quoted fields may embed
        # newlines) — one staging pass converts per input file to
        # parquet (sources/csv_corpus.py), then the ordinary parquet
        # build runs over the staged, deterministic layout
        from ..sources.csv_corpus import stage_csv_to_parquet
        from ..sources.jsonl_corpus import JSONL_CORPUS

        corpus_paths = stage_csv_to_parquet(corpus_paths)
        spec = spec or JSONL_CORPUS  # same (docno, text) field mapping
        source_format = "parquet"
    if source_format == "tsv":
        from ..sources.tsv_corpus import TSV_CORPUS, tsv_shards

        spec = spec or TSV_CORPUS
        shards = tsv_shards(corpus_paths)
    elif source_format == "jsonl":
        from ..sources.jsonl_corpus import JSONL_CORPUS, jsonl_shards

        spec = spec or JSONL_CORPUS
        shards = jsonl_shards(corpus_paths)
    else:
        spec = spec or CODE_CORPUS
        shards = corpus_shards(corpus_paths)
    n_docs_total = sum(s.num_rows for s in shards)
    lineage_key = hashlib.sha256(
        json.dumps([sorted(_shard_to_item(s).items()) for s in shards]).encode()
        + cfg.params_id.encode()
        + _BUILD_FORMAT.encode()
    ).hexdigest()[:16]

    docs_dir = os.path.join(out_dir, "docs")
    global_dir = os.path.join(out_dir, "global")
    os.makedirs(out_dir, exist_ok=True)

    # ---- stage 1: tokenize → per-doc parquet partitioned by segment ----
    marker1 = os.path.join(out_dir, "_docs_done")
    # append-incremental contract: the shard-list signature lets a rerun
    # whose NEW shard list starts with the old one (same params/format,
    # files only appended — base docids of old shards unchanged) keep the
    # old shards' tokenize outputs and partials; only the appended shards
    # tokenize. Stages 2-3 always recompute on a lineage change (df/idf
    # shift with N), which is exactly the correct split: tokenize cost is
    # per-byte-of-corpus, assemble cost is per-index.
    sig_path = os.path.join(out_dir, "_docs_shards.json")
    shard_sig = json.loads(json.dumps({
        "params": cfg.params_id, "format": _BUILD_FORMAT,
        "shards": [sorted(_shard_to_item(s).items()) for s in shards],
    }))
    if force or not _stage_marker(marker1, lineage_key):
        # crash-resume within the stage: an in-progress marker carries the
        # lineage key; if it matches, completed shards (their partial file
        # exists — written last, atomically) are skipped instead of wiping
        # the whole stage. A key mismatch wipes UNLESS the old shard list
        # is a strict prefix of the new one (append-incremental).
        wip = os.path.join(out_dir, "_docs_wip")
        if force or not _stage_marker(wip, lineage_key):
            if force or not _append_compatible(sig_path, shard_sig):
                shutil.rmtree(docs_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        with open(wip, "w") as f:
            f.write(lineage_key)
        with open(sig_path + ".tmp", "w") as f:
            json.dump(shard_sig, f)
        os.replace(sig_path + ".tmp", sig_path)
        pdir = os.path.join(docs_dir, "_partials")
        done = set(os.listdir(pdir)) if os.path.isdir(pdir) else set()
        shard_items = [
            _shard_to_item(s)
            for s in shards
            if f"part-{s.base_docid:012d}-{_shard_ordinal(s):05d}.parquet" not in done
        ]
        if shard_items:
            ds = ray.data.from_items(shard_items, override_num_blocks=len(shard_items))
            # tasks write their own seg=N/part-*.parquet files; only tiny
            # manifest rows come back through the object store
            ds.map_batches(
                TokenizeShards(spec, cfg, docs_dir=docs_dir),
                batch_format="pyarrow", batch_size=None,
                num_cpus=_task_num_cpus(),
            ).materialize()
        with open(marker1, "w") as f:
            f.write(lineage_key)
        os.remove(wip)
    stage_secs["tokenize"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()

    # ---- stage 2: global stats (df + metadata) ----
    # Fully distributed — the driver never holds a term. The per-shard
    # (seg, term) partials are hash-partitioned BY TERM; each partition
    # task computes its slice of the global df + idf, writes it as one
    # file of the partitioned global lexicon (global/term_df/part-K),
    # and emits (seg, term, df, idf) rows that a second exchange BY SEG
    # turns into per-segment semi-join files (global/seg_df/seg=N) —
    # exactly the vocabulary each assemble task needs, pre-sorted, read
    # with one pruned file read instead of a whole-lexicon broadcast.
    # (The reference merges its lexicon on one thread and mmaps it
    # everywhere, src/builder.cpp:127-181 — fine at 14 MB, not at the
    # tens-of-GB vocabulary of a 100 TB code corpus.)
    marker2 = os.path.join(out_dir, "_global_done")
    if force or not _stage_marker(marker2, lineage_key):
        _global_stage(docs_dir, global_dir, n_docs_total, cfg, lineage_key)
        with open(marker2, "w") as f:
            f.write(lineage_key)
    stage_secs["global_stats"] = _time.perf_counter() - _t0
    _t0 = _time.perf_counter()

    with open(os.path.join(global_dir, "metadata.json")) as f:
        meta = json.load(f)

    # ---- stage 3: assemble segments ----
    manifests = _assemble_stage(
        out_dir, docs_dir, global_dir, meta, cfg, lineage_key, force
    )
    stage_secs["assemble"] = _time.perf_counter() - _t0

    summary = {
        "stage_secs": {k: round(v, 3) for k, v in stage_secs.items()},
        "n_docs": meta["n_docs"],
        "sum_doclen": meta["sum_doclen"],
        "avgdl": meta["avgdl"],
        "n_segments": len(manifests),
        "n_terms_global": int(meta["n_terms_global"]),
        "n_postings": int(sum(m["n_postings"] for m in manifests)),
        "out_dir": out_dir,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


def _assemble_stage(out_dir: str, docs_dir: str, global_dir: str,
                    meta: dict, cfg: BuildConfig, lineage_key: str,
                    force: bool) -> list[dict]:
    """Build stage 3 (segment assembly) over a docs/ layout; one task
    per segment, each writing its own ``db_N/``. Shared by
    :func:`build_index` and :func:`compact_index`."""
    seg_ids = sorted(
        int(name.split("=")[1])
        for name in os.listdir(docs_dir)
        if name.startswith("seg=")
    )
    assemble = AssembleSegment(
        out_dir=out_dir,
        docs_dir=docs_dir,
        cfg=cfg,
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        global_dir=global_dir,
        lineage_key=lineage_key,
        force=force,
    )
    seg_ds = ray.data.from_items(
        [{"seg": s} for s in seg_ids], override_num_blocks=len(seg_ids)
    )
    return seg_ds.map_batches(
        assemble, batch_format="pyarrow", batch_size=None,
        num_cpus=_task_num_cpus()
    ).take_all()


class AssembleSegment:
    """Builds one index segment per input row. Each task semi-joins ONLY
    its source segments' vocabularies against the global lexicon via the
    per-segment ``global/seg_df/seg=N`` files stage 2 wrote — a pruned
    O(segment-vocab) read per task, replacing the round-2 whole-lexicon
    ``ray.put`` broadcast (unbounded at a 100 TB code corpus's
    identifier vocabulary)."""

    def __init__(self, out_dir, docs_dir, cfg, n_docs, avgdl, global_dir,
                 lineage_key, force, seg_groups=None):
        self.out_dir = out_dir
        self.docs_dir = docs_dir
        self.cfg = cfg
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.lineage_key = lineage_key
        self.force = force
        # seg_groups: merged-segment id -> list of source docs/seg=N ids
        # (None = identity: segment seg reads seg=<seg>); used by the
        # segment-merge/compaction phase
        self.seg_groups = seg_groups
        self.global_dir = global_dir
        self._terms = None

    def _load_global_for(self, src_segs: list[int]) -> None:
        """Sets the (term-sorted) ``_terms/_df/_idf`` arrays to the union
        of the source segments' global-df slices — exactly the vocabulary
        this task's postings can reference, nothing more."""
        tables = []
        for s in src_segs:
            f = os.path.join(
                self.global_dir, "seg_df", f"seg={s}", "terms.parquet"
            )
            if os.path.exists(f):
                tables.append(pq.read_table(f))
        if not tables:
            self._terms = np.empty(0, dtype=object)
            self._df = np.empty(0, dtype=np.int64)
            self._idf = np.empty(0, dtype=np.float64)
            return
        t = tables[0] if len(tables) == 1 else pa.concat_tables(tables)
        terms = np.asarray(t["term"].to_pylist(), dtype=object)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        idf = t["idf"].to_numpy(zero_copy_only=False)
        if len(tables) > 1:
            # merge path: union of per-seg vocabularies → sort + dedup
            # (a term's (df, idf) row is identical across segments)
            order = np.argsort(terms, kind="stable")
            terms, dfv, idf = terms[order], dfv[order], idf[order]
            keep = np.ones(len(terms), dtype=bool)
            keep[1:] = terms[1:] != terms[:-1]
            terms, dfv, idf = terms[keep], dfv[keep], idf[keep]
        self._terms, self._df, self._idf = terms, dfv, idf

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._assemble(int(seg)) for seg in batch["seg"].to_pylist()]
        return pa.Table.from_pylist(rows)

    def _assemble(self, seg: int) -> dict:
        import time as _time

        seg_dir = os.path.join(self.out_dir, f"db_{seg}")
        manifest_path = os.path.join(seg_dir, "manifest.json")
        if not self.force and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            if m.get("lineage_key") == self.lineage_key:
                return m  # checkpointed — skip

        _timings = {}
        _t = _time.perf_counter()
        src_segs = self.seg_groups[seg] if self.seg_groups else [seg]
        self._load_global_for(src_segs)
        files = sorted(
            os.path.join(self.docs_dir, f"seg={s}", f)
            for s in src_segs
            for f in os.listdir(os.path.join(self.docs_dir, f"seg={s}"))
            if f.endswith(".parquet")
        )
        cols = ["docid", "doclen", "terms", "tfs"]
        if self.cfg.positions:
            cols.append("poss")
        t = pads.dataset(files).to_table(columns=cols)
        order = pc.sort_indices(t, sort_keys=[("docid", "ascending")])
        t = t.take(order)
        _timings["read"] = _time.perf_counter() - _t
        _t = _time.perf_counter()

        docid = t["docid"].to_numpy(zero_copy_only=False)
        doclen = t["doclen"].to_numpy(zero_copy_only=False)
        if len(docid) == 0 or int(pc.sum(pc.list_value_length(t["terms"])).as_py() or 0) == 0:
            return self._write_empty(seg, files)
        terms_col = t["terms"].combine_chunks()
        tfs_col = t["tfs"].combine_chunks()
        list_lens = np.asarray(pc.list_value_length(terms_col))
        # dictionary-encode in Arrow so term comparisons happen in C once;
        # np.unique over 10^6 Python strings would dominate the task
        de = pc.dictionary_encode(pc.list_flatten(terms_col))
        dict_arr = de.dictionary if hasattr(de, "dictionary") else de.combine_chunks().dictionary
        tfs_flat = np.asarray(pc.list_flatten(tfs_col))
        docid_rep = np.repeat(docid, list_lens)
        doclen_rep = np.repeat(doclen, list_lens)
        _timings["flatten"] = _time.perf_counter() - _t
        _t = _time.perf_counter()

        # (term, docid) sort — docids are already increasing, terms are
        # sorted within each doc, so a stable sort on term codes alone
        # yields (term, docid) order (O2 in SURVEY §2.6).
        # dictionary codes are keyed by first appearance, not sorted;
        # remap through the sorted dictionary permutation.
        dict_sort = np.asarray(pc.array_sort_indices(dict_arr))
        rank = np.empty(len(dict_sort), dtype=np.int64)
        rank[dict_sort] = np.arange(len(dict_sort))
        raw_codes = np.asarray(
            de.indices if hasattr(de, "indices") else de.combine_chunks().indices
        ).astype(np.int64)
        codes = rank[raw_codes]
        uniq_terms = np.asarray(dict_arr.take(pa.array(dict_sort)).to_pylist(), dtype=object)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        docid_s = docid_rep[order]
        tf_s = tfs_flat[order].astype(np.int64)
        dl_s = doclen_rep[order]
        pos_s = None
        if self.cfg.positions:
            # per-pair position slices follow the pair permutation: the
            # flat stream is already in (doc, term, occurrence) order,
            # pair starts are the per-pair tf prefix sums
            pos_flat = np.asarray(pc.list_flatten(t["poss"].combine_chunks()))
            tfs64 = tfs_flat.astype(np.int64)
            pair_starts = np.cumsum(tfs64) - tfs64
            gather = np.repeat(pair_starts[order], tf_s) + _ranges(tf_s)
            pos_s = pos_flat[gather]
        _timings["sort"] = _time.perf_counter() - _t
        _t = _time.perf_counter()

        return self._encode_write(
            seg, files, docid, doclen, uniq_terms, codes_s, docid_s, tf_s,
            dl_s, _timings, pos_s=pos_s,
        )

    def _encode_write(self, seg, files, docid, doclen, uniq_terms, codes_s,
                      docid_s, tf_s, dl_s, _timings, pos_s=None) -> dict:
        """Shared encode tail: (term-code, docid)-sorted posting arrays →
        encoded segment on disk. Used by the raw-docs build path (the
        merge path chunks by term range and calls :meth:`_encode_terms`
        directly). ``pos_s`` (positional builds): per-posting flat
        occurrence positions aligned with the sorted posting order
        (posting i owns the ``tf_s[i]`` values after ``sum(tf_s[:i])``)."""
        import time as _time

        _t = _time.perf_counter()
        terms_table, pos_table = self._encode_terms(
            uniq_terms, codes_s, docid_s, tf_s, dl_s, pos_s=pos_s)
        _timings["encode"] = _time.perf_counter() - _t
        return self._write_segment(
            seg, files, docid, doclen, [terms_table],
            [pos_table] if pos_table is not None else None,
            int(len(docid_s)), _timings)

    def _encode_terms(self, uniq_terms, codes_s, docid_s, tf_s, dl_s,
                      pos_s=None) -> tuple[pa.Table, pa.Table | None]:
        """Encode ONE term-range chunk of (term-code, docid)-sorted
        posting arrays into per-term lexicon rows. Every value in a row
        is term-local (byte slices, block offsets relative to the term's
        own streams), so chunk tables concatenate into a full segment
        table with no offset fixup — the property the bounded-memory
        merge relies on. Returns ``(terms_table, positions_table|None)``."""
        n_terms = len(uniq_terms)
        df_local = np.bincount(codes_s, minlength=n_terms).astype(np.int64)
        term_starts = np.concatenate(([0], np.cumsum(df_local)[:-1]))
        term_ends = np.cumsum(df_local)

        # global idf lookup (broadcast table; J2 baked in at build time)
        gidx = np.searchsorted(self._terms, uniq_terms)
        assert (self._terms[gidx] == uniq_terms).all(), "local lexicon ⊄ global"
        idf_per_term = self._idf[gidx]
        df_global = self._df[gidx]
        idf_per_posting = idf_per_term[codes_s]

        # ---- encode docids: delta-gap + VarByte (the reference VarBytes
        # absolute docids, src/indexBuilder/IndexBuilder.hpp:63-69; we gap
        # within each term's list for ~2-4x smaller docid streams, with an
        # ABSOLUTE restart at every skip-block boundary so block-skip
        # resume never needs upstream state) ----
        B = self.cfg.skip_block_size
        gaps = np.empty_like(docid_s)
        gaps[1:] = docid_s[1:] - docid_s[:-1]
        gaps[0] = docid_s[0]
        # restart points: term starts and every B-th posting within a term
        in_term_pos = np.arange(len(docid_s)) - term_starts[codes_s]
        restart = in_term_pos % B == 0
        gaps[restart] = docid_s[restart]
        db_bytes, db_lens = varbyte.encode(gaps)
        byte_offs = np.concatenate(([0], np.cumsum(db_lens)))  # per posting
        term_byte_offs = byte_offs[np.concatenate((term_starts, [len(docid_s)]))]

        # ---- encode freqs (unary, byte-aligned per term) ----
        bits_per_posting = tf_s
        bit_cum = np.concatenate(([0], np.cumsum(bits_per_posting)))
        term_bit_start = bit_cum[term_starts]
        term_bits = bit_cum[term_ends] - term_bit_start
        term_freq_bytes = (term_bits + 7) // 8
        term_freq_byte_offs = np.concatenate(([0], np.cumsum(term_freq_bytes)))
        total_freq_bits = int(term_freq_bytes.sum() * 8)
        # per-posting start bit within the padded global stream
        pad_base = (term_freq_byte_offs[:-1] * 8) - term_bit_start
        posting_bit_start = bit_cum[:-1] + pad_base[codes_s]
        # diff-trick to fill (tf-1) one-bits per posting
        delta = np.zeros(total_freq_bits + 1, dtype=np.int32)
        np.add.at(delta, posting_bit_start, 1)
        np.add.at(delta, posting_bit_start + tf_s - 1, -1)
        bits = (np.cumsum(delta[:-1]) > 0).astype(np.uint8)
        fq_bytes = np.packbits(bits, bitorder="little")

        # ---- scores → sigmas + skip-pointer block maxima (Q7) ----
        bm25 = scorer_mod.Bm25Scorer(self.cfg.bm25_k1, self.cfg.bm25_b)
        tfidf = scorer_mod.TfidfScorer()
        bm25_s = bm25.score(tf_s, idf_per_posting, dl_s, self.avgdl)
        tfidf_s = tfidf.score(tf_s, idf_per_posting)

        B = self.cfg.skip_block_size
        # block starts: every B postings within each term
        n_blocks_per_term = (df_local + B - 1) // B
        block_term = np.repeat(np.arange(n_terms), n_blocks_per_term)
        block_idx_in_term = np.concatenate(
            [np.arange(k) for k in n_blocks_per_term]
        ) if n_terms else np.zeros(0, dtype=np.int64)
        block_starts = term_starts[block_term] + block_idx_in_term * B
        block_ends = np.minimum(block_starts + B, term_ends[block_term])

        bm25_ub = np.maximum.reduceat(bm25_s, block_starts) if len(block_starts) else np.zeros(0)
        tfidf_ub = np.maximum.reduceat(tfidf_s, block_starts) if len(block_starts) else np.zeros(0)
        # reduceat quirk: reduceat uses [start_i, start_{i+1}) ranges; since
        # block starts are strictly increasing and blocks tile the posting
        # array contiguously, ranges match [block_start, block_end).
        last_docid = docid_s[block_ends - 1] if len(block_ends) else np.zeros(0, dtype=np.uint64)
        # offsets relative to the term's stream starts (reference
        # src/index/Index.template.hpp:210-219)
        blk_docid_off = byte_offs[block_starts] - term_byte_offs[:-1][block_term]
        # (byte_off << 3) | bit_off == the plain bit offset within the
        # term's freq stream (reference src/codes/unary.hpp:18-22)
        blk_freq_off = posting_bit_start[block_starts] - term_freq_byte_offs[block_term] * 8

        # quantize exactly like the on-disk reference (types.hpp:120-131)
        q = scorer_mod.quantize_scores
        dq = scorer_mod.dequantize_scores
        bm25_sigma = dq(q(np.maximum.reduceat(bm25_s, term_starts)))
        tfidf_sigma = dq(q(np.maximum.reduceat(tfidf_s, term_starts)))
        bm25_ub = dq(q(bm25_ub))
        tfidf_ub = dq(q(tfidf_ub))

        block_bounds = np.concatenate(
            ([0], np.cumsum(n_blocks_per_term))
        ).astype(np.int32)

        def _binary_col(values: np.ndarray, offsets: np.ndarray) -> pa.Array:
            return pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                len(offsets) - 1,
                [None, pa.py_buffer(offsets.astype(np.int64)), pa.py_buffer(values)],
            )

        def _list_f64(values: np.ndarray) -> pa.Array:
            return pa.ListArray.from_arrays(block_bounds, pa.array(values, pa.float64()))

        def _list_u64(values: np.ndarray) -> pa.Array:
            return pa.ListArray.from_arrays(block_bounds, pa.array(values.astype(np.uint64)))

        terms_table = pa.table(
            {
                "term": pa.array(uniq_terms, pa.string()),
                "df_local": pa.array(df_local, pa.uint64()),
                "df_global": pa.array(df_global, pa.uint64()),
                "idf": pa.array(idf_per_term, pa.float64()),
                "docid_bytes": _binary_col(db_bytes, term_byte_offs),
                "freq_bytes": _binary_col(fq_bytes, term_freq_byte_offs),
                "bm25_sigma": pa.array(bm25_sigma, pa.float64()),
                "tfidf_sigma": pa.array(tfidf_sigma, pa.float64()),
                "skip_last_docid": _list_u64(last_docid),
                "skip_bm25_ub": _list_f64(bm25_ub),
                "skip_tfidf_ub": _list_f64(tfidf_ub),
                "skip_docid_off": _list_u64(blk_docid_off),
                "skip_freq_off": _list_u64(blk_freq_off),
            }
        )

        pos_table = None
        if pos_s is not None:
            # ---- positional sidecar: per posting, occurrence positions
            # delta-gapped (absolute restart at each posting's first
            # occurrence), one VarByte stream per term, aligned with the
            # term table's row order ----
            tf64 = tf_s.astype(np.int64)
            p_starts = np.cumsum(tf64) - tf64
            pos64 = pos_s.astype(np.int64)
            pgaps = np.empty_like(pos64)
            pgaps[1:] = pos64[1:] - pos64[:-1]
            pgaps[p_starts] = pos64[p_starts]
            pb_bytes, pb_lens = varbyte.encode(pgaps.astype(np.uint64))
            val_offs = np.concatenate(([0], np.cumsum(pb_lens)))
            term_pos_offs = np.concatenate(
                (val_offs[p_starts[term_starts]], [val_offs[-1]]))
            pos_table = pa.table({
                "term": pa.array(uniq_terms, pa.string()),
                "pos_bytes": _binary_col(pb_bytes, term_pos_offs),
            })
        return terms_table, pos_table

    def _write_segment(self, seg, files, docid, doclen, terms_tables,
                       pos_tables, n_postings, _timings) -> dict:
        """Write tail shared by the single-chunk build path and the
        term-range-chunked merge: concatenate chunk tables (pure row
        concat — every row is term-local), write the segment files
        atomically, record the manifest."""
        import time as _time

        _t = _time.perf_counter()
        seg_dir = os.path.join(self.out_dir, f"db_{seg}")
        manifest_path = os.path.join(seg_dir, "manifest.json")
        terms_table = (terms_tables[0] if len(terms_tables) == 1
                       else pa.concat_tables(terms_tables).combine_chunks())
        os.makedirs(seg_dir, exist_ok=True)
        tmp = os.path.join(seg_dir, "terms.parquet.tmp")
        pq.write_table(terms_table, tmp)
        os.replace(tmp, os.path.join(seg_dir, "terms.parquet"))
        if pos_tables is not None:
            pos_table = (pos_tables[0] if len(pos_tables) == 1
                         else pa.concat_tables(pos_tables).combine_chunks())
            tmp = os.path.join(seg_dir, "positions.parquet.tmp")
            pq.write_table(pos_table, tmp)
            os.replace(tmp, os.path.join(seg_dir, "positions.parquet"))
        _timings["write"] = _time.perf_counter() - _t

        manifest = {
            "timings": {k: round(v, 3) for k, v in _timings.items()},
            "seg": seg,
            "base_docid": int(docid.min()) if len(docid) else 0,
            "n_docs": int(len(docid)),
            "n_terms": int(len(terms_table)),
            "n_postings": int(n_postings),
            "sum_doclen": int(doclen.sum()),
            "doc_files": files,
            "docid_encoding": "varbyte-dgap-blockrestart",
            "freq_encoding": "unary-lsb",
            "positions": pos_tables is not None,
            "skip_block_size": self.cfg.skip_block_size,
            "params_id": self.cfg.params_id,
            "profile_id": self.cfg.profile.profile_id,
            "lineage_key": self.lineage_key,
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)
        return manifest

    def _write_empty(self, seg: int, files: list[str]) -> dict:
        seg_dir = os.path.join(self.out_dir, f"db_{seg}")
        os.makedirs(seg_dir, exist_ok=True)
        empty = pa.table(
            {
                "term": pa.array([], pa.string()),
                "df_local": pa.array([], pa.uint64()),
                "df_global": pa.array([], pa.uint64()),
                "idf": pa.array([], pa.float64()),
                "docid_bytes": pa.array([], pa.large_binary()),
                "freq_bytes": pa.array([], pa.large_binary()),
                "bm25_sigma": pa.array([], pa.float64()),
                "tfidf_sigma": pa.array([], pa.float64()),
                "skip_last_docid": pa.array([], pa.list_(pa.uint64())),
                "skip_bm25_ub": pa.array([], pa.list_(pa.float64())),
                "skip_tfidf_ub": pa.array([], pa.list_(pa.float64())),
                "skip_docid_off": pa.array([], pa.list_(pa.uint64())),
                "skip_freq_off": pa.array([], pa.list_(pa.uint64())),
            }
        )
        pq.write_table(empty, os.path.join(seg_dir, "terms.parquet"))
        if self.cfg.positions:
            # the positional sidecar must exist (empty) for every
            # positional segment — the merge reads it unconditionally
            pq.write_table(
                pa.table({"term": pa.array([], pa.string()),
                          "pos_bytes": pa.array([], pa.large_binary())}),
                os.path.join(seg_dir, "positions.parquet"))
        manifest = {
            "seg": seg, "base_docid": 0, "n_docs": 0, "n_terms": 0,
            "n_postings": 0, "sum_doclen": 0, "doc_files": files,
            "docid_encoding": "varbyte-dgap-blockrestart", "freq_encoding": "unary-lsb",
            "positions": self.cfg.positions,
            "skip_block_size": self.cfg.skip_block_size,
            "params_id": self.cfg.params_id,
            "profile_id": self.cfg.profile.profile_id,
            "lineage_key": self.lineage_key,
        }
        with open(os.path.join(seg_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        return manifest


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(c)`` for every c in counts (vectorized)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(ends - counts, counts)
    return out


def decode_pos_stream(gaps: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    """Absolute occurrence positions from a decoded delta-gap stream:
    each posting's first gap is absolute (the encode's restart), the
    rest are deltas; ``tfs`` gives the per-posting run lengths. Shared
    by the positional merge and the searcher's phrase path."""
    tf64 = np.asarray(tfs, dtype=np.int64)
    if len(gaps) == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.cumsum(tf64) - tf64
    c = np.cumsum(gaps.astype(np.int64))
    base = c[starts] - gaps[starts].astype(np.int64)
    return c - np.repeat(base, tf64)


def read_segment_positions(seg_dir: str, tfs: np.ndarray) -> np.ndarray:
    """Fully-decoded flat occurrence positions of a built positional
    segment, aligned with :func:`read_segment_postings`'s posting order
    (``tfs`` is that function's per-posting frequency array)."""
    from .searcher import _np_offsets

    t = pq.read_table(os.path.join(seg_dir, "positions.parquet"),
                      columns=["pos_bytes"])
    if len(t) == 0:
        return np.zeros(0, dtype=np.int64)
    offs, vals = _np_offsets(t["pos_bytes"])
    gaps = varbyte.decode(vals[offs[0]: offs[-1]])
    out = decode_pos_stream(gaps, tfs)
    assert len(out) == int(np.asarray(tfs, dtype=np.int64).sum())
    return out


def decode_postings_rows(t: pa.Table, B: int) -> dict:
    """Vectorized decode of a (row-subset of a) segment term table —
    each row is one term's two encoded streams: whole-column delta-gap
    VarByte docid decode (one pass over the concatenated streams) and
    whole-column unary freq decode (bit-unpack once; each row's values
    end at its first ``df`` zero-bits, so the phantom padding never
    parses as data). ``B`` is the stream's skip-block restart period.
    Works on any row gather/slice because every row's byte slices are
    self-contained (restarts at row start + every B within the row)."""
    from .searcher import _np_offsets

    df = t["df_local"].to_numpy().astype(np.int64)
    P = int(df.sum())
    if P == 0:
        return {"df": df,
                "docids": np.empty(0, dtype=np.uint64),
                "tfs": np.empty(0, dtype=np.int64)}

    d_offs, d_vals = _np_offsets(t["docid_bytes"])
    gaps = varbyte.decode(d_vals[d_offs[0] : d_offs[-1]])
    assert len(gaps) == P, (len(gaps), P)
    term_starts = np.concatenate(([0], np.cumsum(df)[:-1]))
    codes = np.repeat(np.arange(len(df)), df)
    in_term = np.arange(P) - term_starts[codes]
    ridx = np.flatnonzero(in_term % B == 0)
    c = np.cumsum(gaps)
    base = c[ridx] - gaps[ridx]
    counts = np.diff(np.append(ridx, P))
    docids = (c - np.repeat(base, counts)).astype(np.uint64)

    f_offs, f_vals = _np_offsets(t["freq_bytes"])
    bits = np.unpackbits(f_vals[f_offs[0] : f_offs[-1]], bitorder="little")
    zpos = np.flatnonzero(bits == 0)
    rs_bits = (f_offs[:-1] - f_offs[0]).astype(np.int64) * 8
    z0 = np.searchsorted(zpos, rs_bits)
    ends = zpos[np.repeat(z0, df) + _ranges(df)]
    starts = np.empty(P, dtype=np.int64)
    starts[1:] = ends[:-1] + 1
    starts[0] = rs_bits[0]
    nz = df > 0
    starts[term_starts[nz]] = rs_bits[nz]  # term streams are byte-aligned
    tfs = (ends - starts + 1).astype(np.int64)
    return {"df": df, "docids": docids, "tfs": tfs}


def read_segment_postings(seg_dir: str) -> dict:
    """Fully-decoded posting data of a built segment (the whole-segment
    form of :func:`decode_postings_rows`).

    This is the read side of the k-way segment merge: because segments
    are disjoint increasing docid ranges, per-term posting lists
    CONCATENATE in (term, docid) order — no per-posting sort exists in
    the merge at all (S5, the reference's k-way lexicon merge
    src/builder.cpp:127-170 re-expressed over column batches)."""
    with open(os.path.join(seg_dir, "manifest.json")) as f:
        manifest = json.load(f)
    B = int(manifest["skip_block_size"])
    t = pq.read_table(
        os.path.join(seg_dir, "terms.parquet"),
        columns=["term", "df_local", "docid_bytes", "freq_bytes"],
    )
    out = decode_postings_rows(t, B)
    out["terms"] = t["term"].combine_chunks()
    return out


#: per-chunk decoded-posting budget for the streaming k-way merge — the
#: bound on a merge task's DECODED working set (flat int64 arrays are
#: ~10-20× the encoded bytes, so this is what actually sizes task RSS).
#: 4M postings ≈ 4M × ~50 B of flats/scratch ≈ 200 MB peak per chunk.
MERGE_CHUNK_POSTINGS = int(os.environ.get(
    "SEPPRAY_MERGE_CHUNK_POSTINGS", str(4_000_000)))


class MergeAssemble(AssembleSegment):
    """Segment-merge assembly: reads the SOURCE SEGMENTS (not raw docs)
    and concatenates their per-term posting lists — already (term,
    docid)-sorted by construction.

    STREAMING by term range: the task holds every source segment's term
    table in its ENCODED form (byte streams stay varbyte/unary), then
    decodes → merges → re-encodes one bounded chunk of the merged
    vocabulary at a time (``SEPPRAY_MERGE_CHUNK_POSTINGS`` postings per
    chunk, cut at term boundaries). Peak RSS per task is therefore
    encoded-segment size + ONE chunk's decoded flats — constant in the
    merged-segment size — instead of the whole merged segment decoded
    at once. Every lexicon row is term-local, so chunk tables
    concatenate into the final segment table with no offset fixup."""

    def __init__(self, src_index_dir: str, chunk_postings: int | None = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.src_index_dir = src_index_dir
        # captured driver-side and serialized with the callable, so the
        # env override works regardless of worker-process environment
        self.chunk_postings = int(chunk_postings or MERGE_CHUNK_POSTINGS)

    def _assemble(self, seg: int) -> dict:
        import time as _time

        seg_dir = os.path.join(self.out_dir, f"db_{seg}")
        manifest_path = os.path.join(seg_dir, "manifest.json")
        if not self.force and os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            if m.get("lineage_key") == self.lineage_key:
                return m  # checkpointed — skip

        _timings = {}
        _t = _time.perf_counter()
        src_segs = self.seg_groups[seg] if self.seg_groups else [seg]
        self._load_global_for(src_segs)
        src_dirs = [os.path.join(self.src_index_dir, f"db_{s}") for s in src_segs]
        files_set: set[str] = set()
        skip_B = None
        for d in src_dirs:
            with open(os.path.join(d, "manifest.json")) as f:
                sm = json.load(f)
            files_set.update(sm["doc_files"])
            b = int(sm["skip_block_size"])
            # decode applies ONE restart period to every source's
            # streams — mixed-B sources would decode silently wrong
            assert skip_B is None or skip_B == b, \
                f"mixed skip_block_size across source segments ({skip_B} vs {b})"
            skip_B = b
        files = sorted(files_set)
        dt = pads.dataset(files).to_table(columns=["docid", "doclen"])
        dt = dt.take(pc.sort_indices(dt, sort_keys=[("docid", "ascending")]))
        docid = dt["docid"].to_numpy(zero_copy_only=False)
        doclen = dt["doclen"].to_numpy(zero_copy_only=False)

        # encoded term tables only — byte streams stay compressed until
        # their chunk decodes them
        cols = ["term", "df_local", "docid_bytes", "freq_bytes"]
        metas = [
            pq.read_table(os.path.join(d, "terms.parquet"), columns=cols)
            for d in src_dirs
        ]
        concat = pa.concat_tables(metas).combine_chunks()
        pos_concat = None
        if self.cfg.positions:
            pos_concat = pa.concat_tables([
                pq.read_table(os.path.join(d, "positions.parquet"),
                              columns=["pos_bytes"])
                for d in src_dirs
            ]).combine_chunks()
        lens = concat["df_local"].to_numpy().astype(np.int64)
        _timings["read"] = _time.perf_counter() - _t
        _t = _time.perf_counter()

        if len(docid) == 0 or int(lens.sum()) == 0:
            return self._write_empty(seg, files)

        # term union: dictionary-encode the concatenated per-segment term
        # columns (row count = Σ per-seg vocab, not Σ postings)
        de = pc.dictionary_encode(concat["term"])
        dict_arr = de.dictionary if hasattr(de, "dictionary") else de.combine_chunks().dictionary
        dict_sort = np.asarray(pc.array_sort_indices(dict_arr))
        rank = np.empty(len(dict_sort), dtype=np.int64)
        rank[dict_sort] = np.arange(len(dict_sort))
        raw_codes = np.asarray(
            de.indices if hasattr(de, "indices") else de.combine_chunks().indices
        ).astype(np.int64)
        row_codes = rank[raw_codes]
        uniq_terms = np.asarray(dict_arr.take(pa.array(dict_sort)).to_pylist(), dtype=object)
        n_terms = len(uniq_terms)

        # rows are seg-major; a STABLE sort by term code yields (term,
        # seg) = (term, docid) row order — no per-posting sort anywhere
        row_order = np.argsort(row_codes, kind="stable")
        codes_o = row_codes[row_order]
        lens_o = lens[row_order]

        # chunk cuts: term boundaries in the ordered row space, greedy
        # up to the posting budget (≥ 1 term per chunk so a megaterm
        # still fits in one chunk by itself)
        term_row_bounds = np.searchsorted(codes_o, np.arange(n_terms + 1))
        post_cum = np.concatenate(([0], np.cumsum(lens_o)))
        term_post_cum = post_cum[term_row_bounds]
        base0 = int(docid[0])
        assert int(docid[-1]) - base0 == len(docid) - 1, "docids must be dense"

        terms_tables, pos_tables = [], []
        n_postings = 0
        _timings["kway"] = 0.0
        _timings["encode"] = 0.0
        ta = 0
        while ta < n_terms:
            _t = _time.perf_counter()
            tb = int(np.searchsorted(
                term_post_cum, term_post_cum[ta] + self.chunk_postings,
                side="right")) - 1
            tb = min(max(tb, ta + 1), n_terms)
            rows = row_order[term_row_bounds[ta]: term_row_bounds[tb]]
            sub = concat.take(pa.array(rows))
            dec = decode_postings_rows(sub, skip_B)
            docid_s, tf_s = dec["docids"], dec["tfs"]
            chunk_lens = lens_o[term_row_bounds[ta]: term_row_bounds[tb]]
            codes_s = np.repeat(
                codes_o[term_row_bounds[ta]: term_row_bounds[tb]] - ta,
                chunk_lens)
            dl_s = doclen[(docid_s.astype(np.int64) - base0)]
            pos_s = None
            if pos_concat is not None:
                from .searcher import _np_offsets

                psub = pos_concat.take(pa.array(rows))
                offs, vals = _np_offsets(psub["pos_bytes"])
                pgaps = varbyte.decode(vals[offs[0]: offs[-1]]) if len(
                    psub) else np.zeros(0, np.uint64)
                pos_s = decode_pos_stream(pgaps, tf_s)
            _timings["kway"] += _time.perf_counter() - _t
            _t = _time.perf_counter()
            tt, pt = self._encode_terms(
                uniq_terms[ta:tb], codes_s, docid_s, tf_s, dl_s, pos_s=pos_s)
            terms_tables.append(tt)
            if pt is not None:
                pos_tables.append(pt)
            n_postings += int(len(docid_s))
            _timings["encode"] += _time.perf_counter() - _t
            ta = tb

        return self._write_segment(
            seg, files, docid, doclen, terms_tables,
            pos_tables if pos_concat is not None else None,
            n_postings, _timings)


def read_global_term_df(
    index_dir: str, columns: list[str] | None = None
) -> pa.Table:
    """Read the build's global lexicon (term → df, idf), term-sorted.

    The lexicon is stored term-hash-PARTITIONED (``global/term_df/part-K``)
    so stage 2 never funnels it through one process; this helper is for
    tools/tests that genuinely want the whole table (vocabulary-sized —
    callers at 100 TB scale should prefer the per-segment
    ``global/seg_df/seg=N`` slices or a pruned read of the partitions).
    Falls back to the pre-fmt3 single-file layout."""
    d = os.path.join(index_dir, "global", "term_df")
    if os.path.isdir(d):
        t = pads.dataset(d).to_table(columns=columns)
    else:  # legacy single-file layout
        t = pq.read_table(
            os.path.join(index_dir, "global", "term_df.parquet"), columns=columns
        )
    return t.take(pc.sort_indices(t, sort_keys=[("term", "ascending")]))


def merge_segments(
    index_dir: str,
    out_dir: str,
    group_size: int = 32,
    cfg: BuildConfig | None = None,
    chunk_postings: int | None = None,
) -> dict:
    """Segment merge/compaction: combine ``group_size`` adjacent
    docid-range segments into one (the analog of the reference's
    per-700MB-chunk segment granularity, reference src/builder.cpp:23).

    Small segments are right for the *build* (bounded per-task memory,
    fine-grained retries); serving wants fewer, larger segments (less
    per-segment overhead per query). Because segments are docid ranges,
    merging = re-assembling from the union of the source doc partitions —
    posting lists concatenate docid-sorted by construction, and sigmas /
    block-max skip pointers are recomputed for the merged lists. The
    merged index shares the source's ``docs/`` and ``global/`` state.
    """
    import time as _time

    t0 = _time.perf_counter()
    docs_dir = os.path.join(index_dir, "docs")
    with open(os.path.join(index_dir, "global", "metadata.json")) as f:
        meta = json.load(f)
    # Derive the merge cfg from the params the index was BUILT with
    # (recorded in global/metadata.json) — re-encoding restarts or
    # recomputing sigmas with different constants would silently corrupt
    # the merged index. An explicitly-passed cfg must agree.
    bp = meta.get("build_params")
    if bp is not None:
        from ..config import NormalizerProfile as _NP

        derived = BuildConfig(
            profile=_NP(**meta["profile_flags"]),
            docs_per_segment=bp["docs_per_segment"],
            skip_block_size=bp["skip_block_size"],
            bm25_k1=bp["bm25_k1"],
            bm25_b=bp["bm25_b"],
            positions=bp.get("positions", False),
        )
        if cfg is not None and cfg.params_id != derived.params_id:
            raise ValueError(
                "merge cfg disagrees with the index's recorded build params "
                f"({cfg.params_id} != {derived.params_id}); pass cfg=None to "
                "derive it from the index"
            )
        cfg = derived
    else:
        cfg = cfg or BuildConfig()
    if meta["profile_id"] != cfg.profile.profile_id:
        raise ValueError("profile mismatch between index and merge cfg")

    os.makedirs(out_dir, exist_ok=True)
    out_global = os.path.join(out_dir, "global")
    # a pre-existing out_dir may hold the global/ of a PREVIOUS build of
    # the same source path — segments would be rebuilt (their per-segment
    # lineage check fails) but n_docs/avgdl/idf would stay stale. Compare
    # lineage keys and wipe the whole merged output on mismatch.
    if os.path.isdir(out_global):
        try:
            with open(os.path.join(out_global, "metadata.json")) as f:
                existing_key = json.load(f).get("lineage_key")
        except OSError:
            existing_key = None
        if existing_key != meta["lineage_key"]:
            for d in os.listdir(out_dir):
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    if not os.path.isdir(out_global):
        shutil.copytree(os.path.join(index_dir, "global"), out_global)
    else:
        # tombstones grow AFTER a merge is materialized (delete_docs on
        # the source changes no lineage key), so the delete-sized file is
        # re-synced unconditionally — the source index is authoritative;
        # without this a post-merge delete would resurrect in the merged
        # copy
        from .tombstone import TOMBSTONE_FILE

        src_tomb = os.path.join(index_dir, "global", TOMBSTONE_FILE)
        dst_tomb = os.path.join(out_global, TOMBSTONE_FILE)
        n_tombs = 0
        if os.path.exists(src_tomb):
            shutil.copy2(src_tomb, dst_tomb)
            import pyarrow.parquet as _pq

            n_tombs = _pq.ParquetFile(dst_tomb).metadata.num_rows
        elif os.path.exists(dst_tomb):
            os.remove(dst_tomb)
        # keep the merged metadata's audit count in step with the file
        mpath = os.path.join(out_global, "metadata.json")
        with open(mpath) as f:
            mmeta = json.load(f)
        if mmeta.get("n_tombstones", 0) != n_tombs:
            mmeta["n_tombstones"] = n_tombs
            with open(mpath, "w") as f:
                json.dump(mmeta, f)

    src_segs = sorted(
        int(d.split("=")[1]) for d in os.listdir(docs_dir) if d.startswith("seg=")
    )
    groups = {}
    for s in src_segs:
        groups.setdefault(s // group_size, []).append(s)

    assemble = MergeAssemble(
        src_index_dir=index_dir,
        chunk_postings=chunk_postings,
        out_dir=out_dir,
        docs_dir=docs_dir,
        cfg=cfg,
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        # merge tasks semi-join the same per-source-segment global-df
        # slices the build wrote — no whole-lexicon broadcast here either
        global_dir=os.path.join(index_dir, "global"),
        lineage_key=meta["lineage_key"] + f":merged{group_size}",
        force=False,
        seg_groups=groups,
    )
    seg_ds = ray.data.from_items(
        [{"seg": m} for m in sorted(groups)], override_num_blocks=len(groups)
    )
    # Merge concurrency. The round-4 streaming term-range merge bounds
    # each task's working set to the chunk budget, which flipped the
    # old fault-bound guidance ("one worker fastest", measured when a
    # task held a whole merged segment): re-measured at 2M docs ×32
    # post-streaming, fully parallel merges in 4.0 s vs 33.6 s
    # serialized, byte-identical output. Default one task per core;
    # SEPPRAY_MERGE_TASK_CPUS overrides.
    merge_cpus = int(os.environ.get(
        "SEPPRAY_MERGE_TASK_CPUS", _task_num_cpus()
    ))
    manifests = seg_ds.map_batches(
        assemble, batch_format="pyarrow", batch_size=None,
        num_cpus=merge_cpus,
    ).take_all()

    summary = {
        "n_docs": meta["n_docs"],
        "sum_doclen": meta["sum_doclen"],
        "avgdl": meta["avgdl"],
        "n_segments": len(groups),
        "group_size": group_size,
        "n_postings": int(sum(m["n_postings"] for m in manifests)),
        "merge_secs": round(_time.perf_counter() - t0, 3),
        "out_dir": out_dir,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary


@ray.remote(num_cpus=1)
def _alive_count(doc_file: str, tomb_ref) -> dict:
    """Stage-A1 of compaction: (file, first docid, alive rows) from a
    two-column pruned read — the driver needs only these scalars to
    assign dense renumber offsets."""
    t = pq.read_table(doc_file, columns=["docid", "docno"])
    if len(t) == 0:
        return {"file": doc_file, "min_docid": 0, "n_alive": 0}
    dead = pc.is_in(t["docno"], value_set=pa.array(tomb_ref, pa.string()))
    return {
        "file": doc_file,
        "min_docid": int(pc.min(t["docid"]).as_py()),
        "n_alive": int(len(t) - (pc.sum(dead).as_py() or 0)),
    }


@ray.remote(num_cpus=1)
def _compact_doc_file(doc_file: str, tomb_ref, new_base: int,
                      docs_per_segment: int, out_docs_dir: str) -> int:
    """Stage-A2 of compaction: drop tombstoned rows, renumber docids
    densely from ``new_base``, re-derive segment ids from the NEW
    docids, and write per-segment doc parts + vocabulary-sized
    ``_partials`` — the exact layout stage 1 of a fresh build writes,
    so stages 2-3 run unchanged over it."""
    t = pq.read_table(doc_file)
    if len(t):
        alive = pc.invert(
            pc.is_in(t["docno"], value_set=pa.array(tomb_ref, pa.string())))
        t = t.filter(alive)
    n = len(t)
    if n == 0:
        return 0
    docids = np.arange(new_base, new_base + n, dtype=np.uint64)
    segs = ((docids - 1) // docs_per_segment).astype(np.int32)
    has_pos = "poss" in t.column_names
    t = pa.table(
        {
            "docid": pa.array(docids),
            "docno": t["docno"],
            "doclen": t["doclen"],
            "sha256": t["sha256"],
            "seg": pa.array(segs),
            "terms": t["terms"],
            "tfs": t["tfs"],
            **({"poss": t["poss"]} if has_pos else {}),
        },
        schema=DOCS_SCHEMA_POS if has_pos else DOCS_SCHEMA,
    )
    name = f"part-{new_base:012d}-00000.parquet"
    for seg in pc.unique(t["seg"]).to_pylist():
        part = t.filter(pc.equal(t["seg"], seg)).drop_columns(["seg"])
        seg_dir = os.path.join(out_docs_dir, f"seg={seg}")
        os.makedirs(seg_dir, exist_ok=True)
        final = os.path.join(seg_dir, name)
        tmp = final + ".tmp"
        pq.write_table(part, tmp)
        os.replace(tmp, final)
    pdir = os.path.join(out_docs_dir, "_partials")
    os.makedirs(pdir, exist_ok=True)
    pfinal = os.path.join(pdir, name)
    ptmp = pfinal + ".tmp"
    pq.write_table(_partial_df(t), ptmp)
    os.replace(ptmp, pfinal)
    return n


def compact_index(index_dir: str, out_dir: str, force: bool = False) -> dict:
    """PHYSICAL tombstone reclaim — the index lifecycle's fourth phase
    (build → delete → merge → compact). Produces at ``out_dir`` an
    index over only the ALIVE documents: postings dropped, docids
    renumbered densely, df/idf/avgdl/n_docs/sigmas all recomputed — the
    statistics that :mod:`tombstone` intentionally leaves stale finally
    converge here. The output carries no tombstone file.

    Equivalence contract: the result is BYTE-IDENTICAL to a fresh
    ``build_index`` over the alive corpus with the same config
    (pytest-pinned) — compaction IS that rebuild, minus its dominant
    cost: stage 1's per-byte tokenize never reruns because the doc
    partitions already hold the token lists; only the per-index stages
    (global stats + assembly) recompute, exactly the append-incremental
    build's cost split. Beyond-reference: the C++ engine has no delete
    or reclaim path (its builder is one-shot, src/builder.cpp).

    Scale shape: stage A maps over doc-part files (one counting pass
    for dense renumber offsets — scalars to the driver — then one
    filter+renumber+write pass, each task writing its own partitioned
    output); stages 2-3 are the build's own distributed machinery. The
    tombstone set is delete-sized and ray.put-broadcast once.
    Idempotent/resumable via the same stage markers as a build."""
    import time as _time

    from .tombstone import load_tombstones

    t0 = _time.perf_counter()
    with open(os.path.join(index_dir, "global", "metadata.json")) as f:
        meta = json.load(f)
    bp = meta.get("build_params")
    if bp is None:
        raise ValueError("source index predates build_params metadata")
    from ..config import NormalizerProfile as _NP

    cfg = BuildConfig(
        profile=_NP(**meta["profile_flags"]),
        docs_per_segment=bp["docs_per_segment"],
        skip_block_size=bp["skip_block_size"],
        bm25_k1=bp["bm25_k1"],
        bm25_b=bp["bm25_b"],
        positions=bp.get("positions", False),
    )
    tombs = load_tombstones(index_dir)
    lineage_key = hashlib.sha256(
        (meta["lineage_key"] + ":compact:"
         + hashlib.sha256("\x00".join(tombs).encode()).hexdigest()).encode()
    ).hexdigest()[:16]

    src_docs = os.path.join(index_dir, "docs")
    out_docs = os.path.join(out_dir, "docs")
    out_global = os.path.join(out_dir, "global")
    os.makedirs(out_dir, exist_ok=True)
    # a reused out_dir may hold a PREVIOUS compaction (e.g. fewer deletes
    # → more segments): stale db_N dirs beyond the new segment count
    # would be served by list_segment_dirs with resurrected docs and
    # wrong numbering. Same lineage-mismatch wipe as merge_segments.
    if os.path.isdir(out_global):
        try:
            with open(os.path.join(out_global, "metadata.json")) as f:
                existing_key = json.load(f).get("lineage_key")
        except OSError:
            existing_key = None
        if existing_key != lineage_key:
            for d in os.listdir(out_dir):
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
                if os.path.isfile(os.path.join(out_dir, d)):
                    os.remove(os.path.join(out_dir, d))
    stage_secs: dict[str, float] = {}

    # ---- stage A: filtered + renumbered docs ----
    marker_a = os.path.join(out_dir, "_docs_done")
    if force or not _stage_marker(marker_a, lineage_key):
        shutil.rmtree(out_docs, ignore_errors=True)
        tomb_ref = ray.put(tombs)
        files = sorted(
            os.path.join(src_docs, d, f)
            for d in os.listdir(src_docs)
            if d.startswith("seg=")
            for f in os.listdir(os.path.join(src_docs, d))
            if f.endswith(".parquet")
        )
        counts = ray.get([_alive_count.remote(f, tomb_ref) for f in files])
        # global docid order = per-file min docid order (each doc file
        # covers a contiguous, disjoint docid range by construction)
        counts = [c for c in sorted(counts, key=lambda c: c["min_docid"])
                  if c["n_alive"] > 0]
        bases = 1 + np.concatenate(
            ([0], np.cumsum([c["n_alive"] for c in counts])[:-1])
        ).astype(np.int64) if counts else np.zeros(0, np.int64)
        ray.get([
            _compact_doc_file.remote(
                c["file"], tomb_ref, int(b), cfg.docs_per_segment, out_docs)
            for c, b in zip(counts, bases)
        ])
        n_alive_total = int(sum(c["n_alive"] for c in counts))
        with open(os.path.join(out_dir, "_n_docs.json"), "w") as f:
            json.dump({"n_docs": n_alive_total}, f)
        with open(marker_a, "w") as f:
            f.write(lineage_key)
    with open(os.path.join(out_dir, "_n_docs.json")) as f:
        n_alive_total = json.load(f)["n_docs"]
    stage_secs["compact_docs"] = _time.perf_counter() - t0
    _t = _time.perf_counter()

    # ---- stages 2-3: the build's own machinery over the new docs ----
    marker2 = os.path.join(out_dir, "_global_done")
    if force or not _stage_marker(marker2, lineage_key):
        _global_stage(out_docs, out_global, n_alive_total, cfg, lineage_key)
        with open(marker2, "w") as f:
            f.write(lineage_key)
    stage_secs["global_stats"] = _time.perf_counter() - _t
    _t = _time.perf_counter()
    with open(os.path.join(out_global, "metadata.json")) as f:
        out_meta = json.load(f)
    manifests = _assemble_stage(
        out_dir, out_docs, out_global, out_meta, cfg, lineage_key, force
    )
    stage_secs["assemble"] = _time.perf_counter() - _t

    summary = {
        "stage_secs": {k: round(v, 3) for k, v in stage_secs.items()},
        "n_docs": out_meta["n_docs"],
        "n_reclaimed": int(meta["n_docs"]) - int(out_meta["n_docs"]),
        "sum_doclen": out_meta["sum_doclen"],
        "avgdl": out_meta["avgdl"],
        "n_segments": len(manifests),
        "n_terms_global": int(out_meta["n_terms_global"]),
        "n_postings": int(sum(m["n_postings"] for m in manifests)),
        "out_dir": out_dir,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    return summary
