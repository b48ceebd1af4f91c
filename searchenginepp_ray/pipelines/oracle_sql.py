"""DuckDB oracle SQL for every SQL-expressible pipeline.

The tokenizer CTE is generated from the *same* punctuation tables the
Python normalizer uses (SIMPLE profile: punctuation→space, lowercase,
ASCII-whitespace split, drop empties), so Python and SQL tokenize
identically. Aggregate column names match the Ray-side outputs exactly
(the driver's compare requires it).
"""

from __future__ import annotations

from ..config import BuildConfig
from ..normalizer.punctuation import ALL_MARKS
from .search_docs import DOC_QUERIES
from .text_stats import QUALITY_STOPS


def _regex_class() -> str:
    """RE2 character class matching every punctuation mark + ASCII ws."""
    specials = set("\\]^-[")
    chars = []
    for c in sorted(set(ALL_MARKS) | set(" \t\n\v\f\r")):
        if c in specials:
            chars.append("\\" + c)
        elif c == "\t":
            chars.append("\\t")
        elif c == "\n":
            chars.append("\\n")
        elif c == "\r":
            chars.append("\\r")
        elif c == "\v":
            chars.append("\\x0b")
        elif c == "\f":
            chars.append("\\x0c")
        else:
            chars.append(c)
    return "[" + "".join(chars) + "]"


def tok_cte(source: str = "documents") -> str:
    """CTE ``toks(doc_id, term)`` — one row per token occurrence of the
    given corpus ``source`` (a view or an earlier CTE)."""
    cls = _regex_class().replace("'", "''")
    return f"""
toks AS (
    SELECT doc_id, t.term
    FROM {source},
         unnest(string_split_regex(
             trim(regexp_replace(lower(text), '{cls}', ' ', 'g')),
             ' +')) AS t(term)
    WHERE t.term <> ''
)"""


def doclen_stats_sql() -> str:
    return f"""WITH {tok_cte()}
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       (SELECT COUNT(*) FROM toks) AS sum_doclen,
       (SELECT COUNT(*) FROM toks) * 1.0 / (SELECT COUNT(*) FROM documents) AS avgdl"""


def term_df_sql() -> str:
    return f"""WITH {tok_cte()}
SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY term"""


def term_tf_sql() -> str:
    return f"""WITH {tok_cte()}
SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY term"""


def unigram_logprob_sql() -> str:
    """Oracle for text_stats.unigram_logprob: per-doc mean log2 unigram
    probability under the corpus unigram LM, via the same
    Σ tf·log2(ctf) − n·log2(T) decomposition and the shared
    floor(x*1e6+0.5)/1e6 rounding rule."""
    return f"""WITH {tok_cte()},
ctf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM toks),
d AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(log2(c.c)) AS s
      FROM toks t JOIN ctf c USING (term) GROUP BY t.doc_id)
SELECT doc_id, n_tokens,
       floor((s - n_tokens * log2((SELECT t FROM tot))) / n_tokens * 1e6 + 0.5)
           / 1e6 AS avg_logprob
FROM d"""


def corpus_report_sql() -> str:
    """Oracle for text_stats.corpus_report: per-lang dataset-card
    rollup — token counts via the shared tok CTE, dup membership by
    full md5(text) corpus-wide, mean on the 6 dp floor grid."""
    return f"""WITH {tok_cte()},
d AS (SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS chars,
             md5(text) AS h
      FROM documents),
tc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
       FROM toks GROUP BY doc_id),
dd AS (SELECT h, COUNT(*) AS c FROM d GROUP BY h),
j AS (SELECT d.lang, d.chars, COALESCE(tc.n_tok, 0) AS n_tok,
             CASE WHEN dd.c >= 2 THEN 1 ELSE 0 END AS dup
      FROM d LEFT JOIN tc USING (doc_id) JOIN dd USING (h))
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(dup) AS BIGINT) AS n_dup_docs,
       CAST(SUM(chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       floor(SUM(n_tok) * 1.0 / COUNT(*) * 1e6 + 0.5) / 1e6
           AS mean_doclen
FROM j GROUP BY lang"""


def token_count_sql() -> str:
    return f"""WITH {tok_cte()}
SELECT d.doc_id,
       CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(t.n_distinct, 0) AS BIGINT) AS n_distinct
FROM documents d
LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT term) AS n_distinct
    FROM toks GROUP BY doc_id
) t USING (doc_id)"""


def quality_score_sql() -> str:
    stops = ", ".join(f"'{s}'" for s in QUALITY_STOPS)
    return f"""WITH {tok_cte()},
per AS (
    SELECT doc_id,
           COUNT(*) AS n_tok,
           COUNT(DISTINCT term) AS n_dis,
           SUM(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS n_stop,
           SUM(length(term)) AS tot_len
    FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tok, 0) AS BIGINT) AS n_tokens,
       floor((COALESCE(p.n_dis * 1.0 / p.n_tok, 0.0)) * 1000000 + 0.5) / 1000000 AS distinct_ratio,
       floor((COALESCE(p.n_stop * 1.0 / p.n_tok, 0.0)) * 1000000 + 0.5) / 1000000 AS stopword_ratio,
       floor((COALESCE(p.tot_len * 1.0 / p.n_tok, 0.0)) * 1000000 + 0.5) / 1000000 AS mean_token_len
FROM documents d LEFT JOIN per p USING (doc_id)"""


def lang_id_sql(threshold: float = 0.08) -> str:
    stops = ", ".join(f"'{s}'" for s in QUALITY_STOPS)
    return f"""WITH {tok_cte()},
per AS (
    SELECT doc_id,
           SUM(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS ratio
    FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN COALESCE(p.ratio, 0.0) >= {threshold} THEN 'en' ELSE 'unk' END AS lang_pred
FROM documents d LEFT JOIN per p USING (doc_id)"""


def _clean_ctes(
    min_tokens: int = 5, min_distinct_ratio: float = 0.2,
    max_stopword_ratio: float = 0.9, lang_threshold: float = 0.08,
) -> str:
    """CTE chain ``per, pass, kept`` mirroring pipelines.clean.corpus_clean
    (assumes ``toks`` is already defined): quality + language floors, then
    the min doc_id of each exact-content group among the passers."""
    stops = ", ".join(f"'{s}'" for s in QUALITY_STOPS)
    return f"""per AS (
    SELECT doc_id,
           COUNT(*) AS n_tok,
           COUNT(DISTINCT term) AS n_dis,
           SUM(CASE WHEN term IN ({stops}) THEN 1 ELSE 0 END) AS n_stop
    FROM toks GROUP BY doc_id
),
pass AS (
    SELECT d.doc_id, md5(d.text) AS h
    FROM documents d JOIN per p USING (doc_id)
    WHERE p.n_tok >= {min_tokens}
      AND p.n_dis * 1.0 / p.n_tok >= {min_distinct_ratio}
      AND p.n_stop * 1.0 / p.n_tok <= {max_stopword_ratio}
      AND p.n_stop * 1.0 / p.n_tok >= {lang_threshold}
),
kept AS (SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id FROM pass GROUP BY h)"""


def corpus_clean_sql(
    min_tokens: int = 5, min_distinct_ratio: float = 0.2,
    max_stopword_ratio: float = 0.9, lang_threshold: float = 0.08,
) -> str:
    """Oracle for pipelines.clean.corpus_clean."""
    ctes = _clean_ctes(min_tokens, min_distinct_ratio, max_stopword_ratio,
                       lang_threshold)
    return f"""WITH {tok_cte()},
{ctes}
SELECT doc_id FROM kept"""


def search_topk_cleaned_sql(scorer: str = "bm25", k: int = 10) -> str:
    """Oracle for the composed clean → index → search pipeline
    (pipelines.search_docs.search_topk_cleaned): the corpus is first
    restricted to corpus_clean's keepers, then the ENTIRE scoring stack
    (tf, doclen, N, avgdl, df) is recomputed over the cleaned corpus —
    exactly what rebuilding the index over the cleaned parquet does."""
    cfg = BuildConfig()
    rows, _ = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b) if scorer == "bm25" else _tfidf_score_expr()
    return f"""WITH {tok_cte()},
{_clean_ctes()},
ctoks AS (SELECT t.doc_id, t.term FROM toks t JOIN kept USING (doc_id)),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ctoks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM ctoks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM kept) AS n_docs,
                 (SELECT COUNT(*) FROM ctoks) * 1.0
                   / (SELECT COUNT(*) FROM kept) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM ctoks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {k}"""


def exact_dedup_sql() -> str:
    return """SELECT md5(text) AS text_md5,
       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)"""


def _query_values(cfg: BuildConfig | None = None) -> tuple[str, dict[int, list[str]]]:
    """VALUES rows (query_id, term) from the *Python* normalizer, so query
    tokenization can't diverge between the two systems."""
    from ..config import SIMPLE_PROFILE
    from ..normalizer.word_normalizer import normalize_tokens

    per_q = {
        qi: sorted(set(normalize_tokens(q, SIMPLE_PROFILE)))
        for qi, q in enumerate(DOC_QUERIES)
    }
    rows = ", ".join(
        f"({qi}, '{t}')" for qi, terms in per_q.items() for t in terms
    )
    return rows, per_q


def _bm25_score_expr(k1: float, b: float) -> str:
    # mirrors Bm25Scorer.score's operation order exactly:
    # tf / (k1*((1-b) + b*dl/avgdl) + tf) * idf,  idf = log2(N/df)
    return (
        f"(tf.tf / ({k1}*((1-{b}) + ({b}*dl.dl)/stats.avgdl) + tf.tf))"
        " * log2(stats.n_docs/df.df)"
    )


def _tfidf_score_expr() -> str:
    return "(1 + log2(tf.tf)) * log2(stats.n_docs/df.df)"


def search_topk_sql(scorer: str = "bm25", conj: bool = False, k: int = 10,
                    rank_lo: int = 0) -> str:
    cfg = BuildConfig()
    rows, per_q = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b) if scorer == "bm25" else _tfidf_score_expr()
    conj_having = ""
    if conj:
        counts = " ".join(f"WHEN q.query_id = {qi} THEN {len(ts)}" for qi, ts in per_q.items())
        conj_having = f"HAVING COUNT(DISTINCT q.term) = MAX(CASE {counts} END)"
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
    {conj_having}
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank > {rank_lo} AND rank <= {k}"""


def search_did_you_mean_sql(k: int = 10) -> str:
    """Oracle for search_docs.search_did_you_mean: per-token correction
    (levenshtein <= 1 over the vocabulary — the same unit-cost metric as
    the pipeline's DP verifier — picked by dist, then df DESC, then term
    ASC; uncorrectable tokens pass through) feeding the standard BM25
    stack. One statement value-checks the whole composition."""
    from .search_docs import DYM_QUERIES

    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    vals = ", ".join(
        f"({qi}, '{t}')" for qi, q in enumerate(DYM_QUERIES) for t in q)
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df0 AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dfi
        FROM toks GROUP BY term),
df AS (SELECT term, CAST(dfi AS DOUBLE) AS df FROM df0),
mq(query_id, tok) AS (VALUES {vals}),
cand AS (
  SELECT m.query_id, m.tok, v.term, v.dfi,
         levenshtein(m.tok, v.term) AS dist
  FROM mq m JOIN df0 v ON levenshtein(m.tok, v.term) <= 1),
best AS (
  SELECT query_id, tok, term,
         row_number() OVER (PARTITION BY query_id, tok
                            ORDER BY dist, dfi DESC, term) AS rn
  FROM cand),
q AS (SELECT DISTINCT m.query_id, COALESCE(b.term, m.tok) AS term
      FROM mq m LEFT JOIN (SELECT query_id, tok, term FROM best
                           WHERE rn = 1) b
        ON b.query_id = m.query_id AND b.tok = m.tok),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {k}"""


def search_after_page_sql(k: int = 10) -> str:
    """Oracle for search_docs.search_bm25_page2: the standard BM25 stack
    sliced to ranks k+1..2k — the cursor path must be rank-identical to
    the global slice. Queries with < k page-1 hits have no rank > k rows,
    matching the engine's empty-page-after-short-page contract."""
    return search_topk_sql("bm25", conj=False, k=2 * k, rank_lo=k)


def search_explain_sql(k: int = 10) -> str:
    """Oracle for search_docs.search_explain: the BM25 stack WITHOUT the
    final SUM — one row per (query, hit, matching term), joined back to
    the ranked top-k. The per-term expression is the identical scorer
    formula, so contributions match the engine's doubles on the 6 dp
    grid; zero contributions (idf == 0 terms) are filtered on both
    engines."""
    cfg = BuildConfig()
    rows, _ = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(r.query_id AS BIGINT) AS query_id, CAST(r.rank AS BIGINT) AS rank,
       r.doc_id, q.term,
       ROUND({expr}, 6) AS contribution, ROUND(r.s, 6) AS score
FROM ranked r
JOIN q ON q.query_id = r.query_id
JOIN tf ON tf.doc_id = r.doc_id AND tf.term = q.term
JOIN df ON df.term = q.term
JOIN dl ON dl.doc_id = r.doc_id, stats
WHERE r.rank <= {k} AND {expr} <> 0"""


def search_lm_dirichlet_sql(mu: float = 2000.0, k: int = 10) -> str:
    """Oracle for pipelines.search_docs.search_lm_dirichlet: Dirichlet
    query likelihood recomputed from the corpus. Mirrors the engine's
    rank-equivalent decomposition and operand order exactly:
    Σ_{t∈q∩d} log2(1 + tf·T/(μ·ctf)) + |q'|·log2(μ/(dl+μ)), where |q'|
    counts the query's collection-present terms (p(t|C)=0 terms are
    dropped on both sides) and candidates are docs matching ≥1 term."""
    rows, _ = _query_values()
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
ctf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY term),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM toks),
q(query_id, term) AS (VALUES {rows}),
qk AS (SELECT q.query_id, q.term, ctf.c FROM q JOIN ctf USING (term)),
nq AS (SELECT query_id, COUNT(*) AS n FROM qk GROUP BY query_id),
scores AS (
    SELECT qk.query_id, tf.doc_id,
           SUM(log2(1 + (tf.tf * tot.t) / ({mu} * qk.c)))
             + MAX(nq.n) * log2({mu} / (dl.dl + {mu})) AS s
    FROM qk
    JOIN tf ON tf.term = qk.term
    JOIN dl ON dl.doc_id = tf.doc_id
    JOIN nq ON nq.query_id = qk.query_id, tot
    GROUP BY qk.query_id, tf.doc_id, dl.dl
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {k}"""


def search_bm25_rm3_sql(k_fb: int = 5, m_exp: int = 3, k: int = 10) -> str:
    """Oracle for search_docs.search_bm25_rm3: first-pass BM25 top-k_fb,
    TF-IDF expansion-term selection on the shared 6 dp grid (original
    terms anti-joined out, ties → term ASC), second-pass BM25 over the
    union term set — ONE statement for the whole two-pass loop."""
    cfg = BuildConfig()
    rows, _ = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
s1 AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id),
fb AS (
    SELECT query_id, doc_id FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY s DESC, doc_id ASC) AS rn
        FROM s1) WHERE rn <= {int(k_fb)}),
cand AS (
    SELECT fb.query_id, tf.term,
           floor(SUM(tf.tf * log2((SELECT n_docs FROM stats) / df.df))
                 * 1e6 + 0.5) / 1e6 AS w
    FROM fb
    JOIN tf USING (doc_id)
    JOIN df ON df.term = tf.term
    LEFT JOIN q qq ON qq.query_id = fb.query_id AND qq.term = tf.term
    WHERE qq.term IS NULL
    GROUP BY fb.query_id, tf.term),
expd AS (
    SELECT query_id, term FROM (
        SELECT query_id, term,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY w DESC, term ASC) AS rn
        FROM cand) WHERE rn <= {int(m_exp)}),
q2 AS (SELECT query_id, term FROM q
       UNION SELECT query_id, term FROM expd),
scores AS (
    SELECT q2.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q2
    JOIN tf ON tf.term = q2.term
    JOIN df ON df.term = q2.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q2.query_id, tf.doc_id),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {int(k)}"""


def index_stats_sql() -> str:
    return f"""WITH {tok_cte()}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM toks) AS sum_doclen,
       (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM toks) AS n_terms,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT doc_id, term FROM toks)) AS n_postings"""


def knn_brute_force_sql(n_queries: int = 5, k: int = 5) -> str:
    return f"""WITH q AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {n_queries}
),
sims AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS cos
    FROM q CROSS JOIN embeddings e
),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM sims
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, floor(cos * 1e6 + 0.5) / 1e6 AS cosine
FROM ranked WHERE rank <= {k}"""


def embedding_norm_stats_sql() -> str:
    return """SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), 'sum'))), 6) AS mean_norm
FROM embeddings GROUP BY label"""


def windowed_agg_sql(window_s: int = 3600) -> str:
    return f"""SELECT event_type,
       (epoch_us(ts) // 1000000 // {window_s}) * {window_s} AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS value_sum,
       MIN(value) AS value_min,
       MAX(value) AS value_max
FROM events GROUP BY event_type, window_start"""


def sliding_window_agg_sql(window_s: int = 3600, slide_s: int = 900) -> str:
    """Oracle for pipelines.events.sliding_window_agg: expand each event
    into every covering window start (a multiple of slide_s)."""
    return f"""
SELECT event_type,
       CAST(k * {slide_s} AS BIGINT) AS window_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS value_sum
FROM (SELECT event_type, value, epoch_us(ts) // 1000000 AS e FROM events),
     unnest(range((e - {window_s}) // {slide_s} + 1, e // {slide_s} + 1)) AS r(k)
GROUP BY 1, 2
"""


def sessionize_sql(gap_s: int = 1800) -> str:
    return f"""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t FROM events),
o AS (SELECT user_id, t, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
s AS (SELECT user_id, t,
             CASE WHEN pt IS NULL OR t - pt > {gap_s} THEN 1 ELSE 0 END AS ns
      FROM o),
g AS (SELECT user_id, t,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM s),
c AS (SELECT user_id, sid, COUNT(*) AS n FROM g GROUP BY user_id, sid)
SELECT user_id,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n) AS BIGINT) AS max_session_events
FROM c GROUP BY user_id"""


def event_type_stats_sql() -> str:
    return """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS value_sum
FROM events GROUP BY event_type"""


def media_byte_stats_sql() -> str:
    """Oracle for pipelines.multimodal.media_byte_stats: the media table
    derives payload = UTF-8 text bytes, kind = doc_id % 3 cycling."""
    return """
        SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS kind,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1 ORDER BY 1
    """


def event_user_distinct_hll_sql() -> str:
    """Oracle for events.event_user_distinct_hll: the SAME HyperLogLog
    sketch evaluated in SQL — 52-bit md5-prefix hash, bucket = hash %
    512, ρ = 44 − bit_length of the 43-bit suffix (bit_length via the
    exact smear+popcount identity, no float log2), harmonic denominator
    as an exact BIGINT Σ 1<<(44−M), identical α·m²·2^44/denom estimate
    and small-range branch. Register-for-register identical to the Ray
    side, so the hash gate pins the sketch bit-exactly."""
    return """
WITH h AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
              AS BIGINT) AS v
  FROM events),
r0 AS (SELECT event_type, v % 512 AS bucket, v // 512 AS x FROM h),
s1 AS (SELECT event_type, bucket, x | (x >> 1) AS a FROM r0),
s2 AS (SELECT event_type, bucket, a | (a >> 2) AS a FROM s1),
s3 AS (SELECT event_type, bucket, a | (a >> 4) AS a FROM s2),
s4 AS (SELECT event_type, bucket, a | (a >> 8) AS a FROM s3),
s5 AS (SELECT event_type, bucket, a | (a >> 16) AS a FROM s4),
s6 AS (SELECT event_type, bucket, a | (a >> 32) AS a FROM s5),
r AS (SELECT event_type, bucket,
             44 - bit_count(CAST(a AS BIGINT)) AS rho FROM s6),
regs AS (SELECT event_type, bucket, MAX(rho) AS m FROM r GROUP BY 1, 2),
grid AS (
  SELECT et.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) et,
       (SELECT unnest(generate_series(0, 511)) AS bucket) g),
filled AS (
  SELECT grid.event_type, grid.bucket, coalesce(regs.m, 0) AS m
  FROM grid LEFT JOIN regs USING (event_type, bucket)),
agg AS (
  SELECT event_type,
         CAST(SUM(CAST(1 AS BIGINT) << (44 - m)) AS BIGINT) AS denom,
         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
  FROM filled GROUP BY event_type),
est AS (
  SELECT event_type, zeros,
         (0.7213 / (1.0 + 1.079 / 512.0)) * 262144.0 * 17592186044416.0
             / denom AS e_raw
  FROM agg)
SELECT event_type, zeros AS zero_registers,
       floor(CASE WHEN e_raw <= 1280.0 AND zeros > 0
             THEN 512.0 * ln(512.0 / zeros) ELSE e_raw END * 1e6 + 0.5)
           / 1e6 AS hll_users
FROM est"""


def vocab_distinct_hll_sql() -> str:
    """Oracle for sample.vocab_distinct_hll: the identical portable HLL
    over the corpus's distinct vocabulary (shared tok CTE) — same
    register math as event_user_distinct_hll_sql, global (no grouping),
    one output row."""
    return f"""WITH {tok_cte()},
vocab AS (SELECT DISTINCT term FROM toks),
h AS (SELECT CAST(('0x' || substr(md5(term), 1, 13)) AS BIGINT) AS v
      FROM vocab),
r0 AS (SELECT v % 512 AS bucket, v // 512 AS x FROM h),
s1 AS (SELECT bucket, x | (x >> 1) AS a FROM r0),
s2 AS (SELECT bucket, a | (a >> 2) AS a FROM s1),
s3 AS (SELECT bucket, a | (a >> 4) AS a FROM s2),
s4 AS (SELECT bucket, a | (a >> 8) AS a FROM s3),
s5 AS (SELECT bucket, a | (a >> 16) AS a FROM s4),
s6 AS (SELECT bucket, a | (a >> 32) AS a FROM s5),
r AS (SELECT bucket, 44 - bit_count(CAST(a AS BIGINT)) AS rho FROM s6),
regs AS (SELECT bucket, MAX(rho) AS m FROM r GROUP BY bucket),
grid AS (SELECT unnest(generate_series(0, 511)) AS bucket),
filled AS (SELECT grid.bucket, coalesce(regs.m, 0) AS m
           FROM grid LEFT JOIN regs USING (bucket)),
agg AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (44 - m)) AS BIGINT) AS denom,
               CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zeros
        FROM filled),
est AS (SELECT zeros,
               (0.7213 / (1.0 + 1.079 / 512.0)) * 262144.0
                   * 17592186044416.0 / denom AS e_raw
        FROM agg)
SELECT CAST(512 AS BIGINT) AS n_registers,
       zeros AS zero_registers,
       floor(CASE WHEN e_raw <= 1280.0 AND zeros > 0
             THEN 512.0 * ln(512.0 / zeros) ELSE e_raw END * 1e6 + 0.5)
           / 1e6 AS distinct_terms_hll
FROM est"""


def media_real_features_sql() -> str:
    """Oracle for pipelines.multimodal.media_real_features: the REAL
    container round-trip (text bytes → BMP/WAV/AVI encode →
    vendored-parser decode → features) re-expressed directly over the
    text bytes, kind cycling by doc_id % 3. Images (kind 0): 24-bit BMP,
    pixel grid = first w·h bytes zero-padded; decoded (h, w, 3) so
    n_samples = 3·w·h, mean = sum(grid)/(w·h) (3s/3n ≡ s/n in float64).
    Audio (kind 1): PCM-16 WAV, mean = Σ(b−128)/(128·nb). Video
    (kind 2): uncompressed AVI whose frames TILE the bytes into
    nf·h·w (nf = nb % 7 + 2); the tiled sum is full·Σall + prefix(rem)
    with full = (nf·h·w) // nb, rem = (nf·h·w) % nb — exact integers.
    n_bytes is the container size: 54 + stride·h (BMP),
    44 + 2·nb (WAV), 224 + nf·(8 + stride·h) (AVI; stride = 3·w padded
    to 4, already a multiple of 4 for w ∈ {4, 8}). Pure-ASCII corpus ⇒
    ascii(char) == byte (media_byte_stats pins it)."""
    return """
WITH v AS (
  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS nb,
         CAST(CASE WHEN length(text) >= 64 THEN 8 ELSE 4 END AS BIGINT) AS w
  FROM documents WHERE length(text) > 0),
g AS (SELECT media_id, text, nb, w, greatest(nb // w, 1) AS h,
             nb % 7 + 2 AS nf
      FROM v),
s AS (
  SELECT media_id,
         SUM(CASE WHEN i <= least(nb, w * h)
             THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END)
             AS sum_grid,
         SUM(CASE WHEN i <= (nf * h * w) % nb
             THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END)
             AS sum_rem,
         SUM(ascii(substr(text, CAST(i AS INT), 1))) AS sum_all
  FROM g, LATERAL (SELECT unnest(generate_series(1, nb)) AS i)
  GROUP BY media_id)
SELECT g.media_id,
  CASE g.media_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS kind,
  CAST(CASE g.media_id % 3
       WHEN 0 THEN 54 + ((g.w * 3 + 3) // 4) * 4 * g.h
       WHEN 1 THEN 44 + 2 * g.nb
       ELSE 224 + g.nf * (8 + ((g.w * 3 + 3) // 4) * 4 * g.h)
       END AS BIGINT) AS n_bytes,
  CAST(CASE g.media_id % 3 WHEN 0 THEN g.w * g.h * 3
       WHEN 1 THEN g.nb
       ELSE g.nf * g.h * g.w * 3 END AS BIGINT) AS n_samples,
  floor(CASE g.media_id % 3
        WHEN 0 THEN CAST(s.sum_grid AS DOUBLE) / (g.w * g.h)
        WHEN 1 THEN (CAST(s.sum_all AS DOUBLE) - 128 * g.nb)
                    / (128 * g.nb)
        ELSE CAST((g.nf * g.h * g.w) // g.nb * s.sum_all + s.sum_rem
                  AS DOUBLE) / (g.nf * g.h * g.w)
        END * 1e6 + 0.5) / 1e6 AS mean_value
FROM g JOIN s USING (media_id)"""


def compression_ratio_stored_sql() -> str:
    """Oracle for filters.compression_ratio_stored: zlib level-0 STORED
    framing below one deflate block is exactly n + 11 bytes (2-byte
    zlib header + 5-byte stored-block header + payload + 4-byte
    adler32), so the whole pipeline reduces to one expression on the
    shared 6-dp floor grid."""
    return """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) + 11 AS BIGINT) AS compressed_bytes,
       floor((octet_length(encode(text)) + 11.0)
             / greatest(octet_length(encode(text)), 1) * 1e6 + 0.5) / 1e6
           AS ratio
FROM documents"""


def price_quantiles_hdr_sql(m: int = 16,
                            qs: tuple = (0.25, 0.5, 0.9, 0.99)) -> str:
    """Oracle for events.price_quantiles_hdr: the ENTIRE log-linear
    sketch reproduced in SQL — exponent from the binary digit count
    (exact), power-of-two mantissa bucketing (exact IEEE ops),
    cumulative rank pick at ceil(q·n), representative
    floor((1 + s/m)·2^e)."""
    vals = ", ".join(f"({q})" for q in qs)
    return f"""
WITH x AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
  FROM orders WHERE floor(o_totalprice * 100 + 0.5) > 0),
b AS (
  SELECT (length(printf('%b', c)) - 1) * {m}
         + CAST(floor((CAST(c AS DOUBLE)
                       / power(2.0, length(printf('%b', c)) - 1) - 1.0)
                      * {m}) AS BIGINT) AS bid,
         COUNT(*) AS cnt
  FROM x GROUP BY 1),
cum AS (SELECT bid, SUM(cnt) OVER (ORDER BY bid) AS cum,
               SUM(cnt) OVER () AS n
        FROM b),
qv(q) AS (VALUES {vals})
SELECT CAST(q AS DOUBLE) AS q,
       (SELECT CAST(floor((1.0 + (bid % {m}) * 1.0 / {m})
                          * power(2.0, bid // {m})) AS BIGINT)
        FROM cum
        WHERE cum >= greatest(CAST(ceil(CAST(q AS DOUBLE) * n) AS BIGINT),
                              1)
        ORDER BY bid LIMIT 1) AS est_cents,
       (SELECT CAST(n AS BIGINT) FROM cum LIMIT 1) AS n
FROM qv"""


def media_png_features_sql() -> str:
    """Oracle for multimodal.media_png_features: the decoded PNG pixel
    grid equals the first w·h text bytes zero-padded (the compressed
    container round-trips exactly), so n_samples = w·h and
    mean = Σgrid / (w·h) — the BMP image oracle without the ×3 channel
    replication or the (non-closed-form) container size."""
    return """
WITH v AS (
  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS nb,
         CAST(CASE WHEN length(text) >= 64 THEN 8 ELSE 4 END AS BIGINT) AS w
  FROM documents WHERE length(text) > 0),
g AS (SELECT media_id, text, nb, w, greatest(nb // w, 1) AS h FROM v),
s AS (
  SELECT media_id,
         SUM(CASE WHEN i <= least(nb, w * h)
             THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END)
             AS sum_grid
  FROM g, LATERAL (SELECT unnest(generate_series(1, nb)) AS i)
  GROUP BY media_id)
SELECT g.media_id, g.w AS width, g.h AS height,
       CAST(g.w * g.h AS BIGINT) AS n_samples,
       floor(CAST(s.sum_grid AS DOUBLE) / (g.w * g.h) * 1e6 + 0.5) / 1e6
           AS mean_value
FROM g JOIN s USING (media_id)"""


def media_jpeg_features_sql() -> str:
    """Oracle for multimodal.media_jpeg_features: block-constant images
    under unit quantization round-trip the lossy codec EXACTLY, so each
    decoded 8×8 block equals its source text byte — the PNG grid oracle
    with width/height/n_samples scaled ×8/×8/×64 and the identical
    mean (each byte replicated 64× leaves the mean unchanged)."""
    return """
WITH v AS (
  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS nb,
         CAST(CASE WHEN length(text) >= 64 THEN 8 ELSE 4 END AS BIGINT) AS w
  FROM documents WHERE length(text) > 0),
g AS (SELECT media_id, text, nb, w, greatest(nb // w, 1) AS h FROM v),
s AS (
  SELECT media_id,
         SUM(CASE WHEN i <= least(nb, w * h)
             THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END)
             AS sum_grid
  FROM g, LATERAL (SELECT unnest(generate_series(1, nb)) AS i)
  GROUP BY media_id)
SELECT g.media_id, 8 * g.w AS width, 8 * g.h AS height,
       CAST(64 * g.w * g.h AS BIGINT) AS n_samples,
       floor(CAST(s.sum_grid AS DOUBLE) / (g.w * g.h) * 1e6 + 0.5) / 1e6
           AS mean_value
FROM g JOIN s USING (media_id)"""


def image_resize_sql(out: int = 4) -> str:
    """Oracle for multimodal.image_resize (real-BMP default tier): the
    decoded pixel grid is the first w·h text bytes zero-padded
    (h = max(nb // w, 1)); the resize crops to hh = (h//4)·4 rows (or
    TILES to 4 when h < 4 — np.resize semantics) with ww = w (already a
    multiple of 4 for w ∈ {4, 8}); and the emitted statistic — the mean
    of the o×o equal-block means — equals the grand mean of the resized
    grid, one exact-integer division. Tiling unifies both cases as
    full·Σgrid + prefix(rem) with full = (hh·w) // (w·h),
    rem = (hh·w) % (w·h), exactly like the AVI volume oracle."""
    o = int(out)
    return f"""
WITH v AS (
  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS nb,
         CAST(CASE WHEN length(text) >= 64 THEN 8 ELSE 4 END AS BIGINT) AS w
  FROM documents WHERE doc_id % 3 = 0 AND length(text) > 0),
g AS (SELECT media_id, text, nb, w, greatest(nb // w, 1) AS h FROM v),
d AS (SELECT media_id, text, nb, w, h,
             CASE WHEN h >= {o} THEN (h // {o}) * {o} ELSE {o} END AS hh
      FROM g),
s AS (
  SELECT media_id,
         SUM(CASE WHEN i <= least(nb, w * h)
             THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END)
             AS sum_grid,
         SUM(CASE WHEN i <= least((hh * w) % (w * h), nb)
             THEN ascii(substr(text, CAST(i AS INT), 1)) ELSE 0 END)
             AS sum_rem
  FROM d, LATERAL (SELECT unnest(generate_series(1, nb)) AS i)
  GROUP BY media_id)
SELECT d.media_id,
       floor(CAST((d.hh * d.w) // (d.w * d.h) * s.sum_grid + s.sum_rem
             AS DOUBLE) / (d.hh * d.w) * 1e6 + 0.5) / 1e6 AS resized_mean,
       CAST({o} AS BIGINT) AS out_h, CAST({o} AS BIGINT) AS out_w
FROM d JOIN s USING (media_id)"""


def doc_fingerprint_sql(window: int = 4) -> str:
    """Oracle for pipelines.text_stats.fingerprint: min 16-hex-char md5
    prefix over all ``window``-token grams of the normalized token list
    (whole-doc gram when shorter; md5('') for empty docs)."""
    cls = _regex_class().replace("'", "''")
    w = window
    return f"""
WITH tl AS (
    SELECT doc_id,
           list_filter(string_split_regex(
               trim(regexp_replace(lower(text), '{cls}', ' ', 'g')), ' +'),
               x -> x <> '') AS toks
    FROM documents
)
SELECT doc_id,
       min(substr(md5(coalesce(array_to_string(toks[i : i + {w - 1}], ' '), '')),
                  1, 16)) AS fingerprint
FROM tl, unnest(range(1, greatest(len(toks) - {w} + 1, 1) + 1)) AS r(i)
GROUP BY doc_id
"""


def ngram_jaccard_sql(shingle: int = 3, thr_num: int = 4, thr_den: int = 5) -> str:
    """Oracle for pipelines.dedup.ngram_jaccard_dedup: EXACT O(N²)
    token-shingle Jaccard over raw whitespace tokens (str.split()
    semantics), emitted as exact integers — the Ray side must find the
    identical pair set through its LSH + verify path."""
    k = shingle
    pad_empty = "'" + " " * (k - 1) + "'"
    return f"""
WITH tl AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '[ \t\n\r\x0b\x0c]+'),
                       x -> x <> '') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id,
        CASE
            WHEN len(toks) = 0 THEN [{pad_empty}]
            WHEN len(toks) < {k} THEN
                [array_to_string(toks, ' ') || repeat(' ', {k} - len(toks))]
            ELSE list_distinct(list_transform(range(1, len(toks) - {k} + 2),
                     i -> array_to_string(toks[i : i + {k - 1}], ' ')))
        END AS s
    FROM tl
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS n_common,
       CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT)
           AS n_union
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * {thr_den}
      >= (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) * {thr_num}
"""


def dedup_incremental_minhash_sql(mod: int = 2, shingle: int = 3,
                                  thr_num: int = 4,
                                  thr_den: int = 5) -> str:
    """Oracle for dedup.dedup_incremental_minhash: EXACT
    O(N_new × N_base) shipment-vs-baseline anti-join on token-shingle
    Jaccard >= thr_num/thr_den (same shingle CTE and no-collision stance
    as :func:`ngram_jaccard_sql`); the Ray side must keep the identical
    doc set through its persisted-band-table probe + verify path."""
    k = shingle
    m = int(mod)
    pad_empty = "'" + " " * (k - 1) + "'"
    return f"""
WITH tl AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '[ \t\n\r\x0b\x0c]+'),
                       x -> x <> '') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id,
        CASE
            WHEN len(toks) = 0 THEN [{pad_empty}]
            WHEN len(toks) < {k} THEN
                [array_to_string(toks, ' ') || repeat(' ', {k} - len(toks))]
            ELSE list_distinct(list_transform(range(1, len(toks) - {k} + 2),
                     i -> array_to_string(toks[i : i + {k - 1}], ' ')))
        END AS s
    FROM tl
)
SELECT n.doc_id FROM sh n
WHERE n.doc_id % {m} <> 0
  AND NOT EXISTS (
    SELECT 1 FROM sh b
    WHERE b.doc_id % {m} = 0
      AND len(list_intersect(n.s, b.s)) * {thr_den}
          >= (len(n.s) + len(b.s) - len(list_intersect(n.s, b.s)))
             * {thr_num})
"""


def term_postings_global_sql() -> str:
    """Oracle for index.term_index.term_postings_stats over the
    simple-profile documents index: per-term global (df, tf)."""
    return f"""WITH {tok_cte()}
SELECT term,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM toks GROUP BY term"""


def embedding_near_dup_sql(threshold: float = 0.45) -> str:
    return f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(round(CAST(list_cosine_similarity(a.embedding, b.embedding)
                               AS DOUBLE) * 1000) AS BIGINT) AS cosine_milli
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
    """


def bpe_token_count_sql() -> str:
    from .text_stats import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
        SELECT doc_id,
               CAST(len(list_filter(regexp_extract_all(text, '{pat}'),
                                    m -> NOT regexp_matches(m, '^[ \t\n\x0b\x0c\r]+$'))) AS BIGINT)
                   AS n_bpe_tokens
        FROM documents
    """


def nation_revenue_sql() -> str:
    """Oracle for relational.nation_revenue: orders ⋈ customer ⋈ nation
    revenue rollup (distributed shuffle join + broadcast dim lookup)."""
    return """
        SELECT n_name,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """


def pricing_summary_sql(cutoff: str = "2000-12-01") -> str:
    """Oracle for relational.pricing_summary (the TPC-H Q1 shape)."""
    return f"""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
               ROUND(SUM(l_extendedprice) / COUNT(*), 6) AS avg_price,
               ROUND(SUM(l_discount) / COUNT(*), 6) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '{cutoff}'
        GROUP BY l_returnflag, l_linestatus
    """


def asof_join_sql(left_type: str = "purchase", right_type: str = "click") -> str:
    """Oracle for events.asof_join — the as-of semantics spelled out as a
    deterministic window spec (ties on ts break to the larger event_id,
    matching merge_asof's last-row-wins over the (ts, event_id) sort)."""
    return f"""
        SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
               COALESCE(c.event_id, -1) AS matched_event_id,
               COALESCE(epoch_us(c.ts), -1) AS matched_ts_us,
               COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = '{left_type}') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = '{right_type}') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
        QUALIFY row_number() OVER (PARTITION BY p.event_id
                                   ORDER BY c.ts DESC, c.event_id DESC) = 1
    """


def range_join_sql(window_s: int = 86_400, left_type: str = "purchase",
                   right_type: str = "click") -> str:
    """Oracle for events.range_join (trailing-window band join)."""
    return f"""
        SELECT p.event_id, p.user_id, c.event_id AS matched_event_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = '{left_type}') p
        JOIN (SELECT * FROM events WHERE event_type = '{right_type}') c
          ON p.user_id = c.user_id
         AND c.ts BETWEEN p.ts - INTERVAL {int(window_s)} SECOND AND p.ts
    """


def top_events_per_user_sql(k: int = 2) -> str:
    """Oracle for events.top_events_per_user (grouped top-k, deterministic
    tie-break)."""
    return f"""
        SELECT user_id,
               CAST(row_number() OVER w AS BIGINT) AS rnk,
               event_id, value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
        QUALIFY row_number() OVER w <= {int(k)}
    """


def value_quantiles_sql(qs: tuple = (0.5, 0.9, 0.99)) -> str:
    """Oracle for events.value_quantiles — quantile_cont over the same
    2-decimal fixed-point grid the histogram uses."""
    cols = ",\n               ".join(
        f"floor(quantile_cont(round(value, 2), {q}) * 1e6 + 0.5) / 1e6 "
        f"AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               {cols}
        FROM events GROUP BY event_type
    """


def dup_components_sql(shingle: int = 3, thr_num: int = 4,
                       thr_den: int = 5) -> str:
    """Oracle for dedup.dup_components: recursive-CTE reachability
    closure over the exact-Jaccard pair graph, component = min reachable
    doc_id (symmetric edges make every node its own src)."""
    pairs = ngram_jaccard_sql(shingle, thr_num, thr_den)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id,
       CAST(LEAST(src, MIN(dst)) AS BIGINT) AS component
FROM reach GROUP BY src
"""


def dup_components_best_sql(shingle: int = 3, thr_num: int = 4,
                            thr_den: int = 5) -> str:
    """Oracle for dedup.dup_components_best: the reachability-closure
    components joined with per-doc token counts, keep-longest (ties to
    lowest doc_id) via a window."""
    pairs = ngram_jaccard_sql(shingle, thr_num, thr_den)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION
    SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (
    SELECT src AS doc_id, CAST(LEAST(src, MIN(dst)) AS BIGINT) AS component
    FROM reach GROUP BY src
),{tok_cte()},
tc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
j AS (SELECT c.component, c.doc_id, COALESCE(tc.n, 0) AS n
      FROM comp c LEFT JOIN tc USING (doc_id)),
r AS (SELECT component, doc_id, n,
             row_number() OVER (PARTITION BY component
                                ORDER BY n DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS m
      FROM j)
SELECT component, doc_id AS keep_doc_id, CAST(n AS BIGINT) AS n_tokens,
       CAST(m AS BIGINT) AS n_members
FROM r WHERE rn = 1
"""


def deterministic_sample_sql(frac: float = 0.1) -> str:
    """Oracle for sample.deterministic_sample — the same md5-prefix rule
    in SQL (lexicographic hex comparison == numeric comparison)."""
    from .sample import _threshold_hex

    thr = _threshold_hex(frac)
    return f"""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, {len(thr)}) < '{thr}'
    """


def event_transitions_sql() -> str:
    """Oracle for events.event_transitions: per-user consecutive-event
    pairs via LAG over the same (ts, event_id) total order, global pair
    counts, P(next|prev) on the shared 6 dp grid."""
    return """WITH ordered AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ordered WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       floor(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type) * 1e6 + 0.5)
           / 1e6 AS prob
FROM counts"""


def naive_bayes_lang_sql() -> str:
    """Oracle for classifier.naive_bayes_lang: multinomial NB with
    add-one smoothing, recomputed in SQL with the identical decomposition
    log2 p(l) + Σ tf·log2(ctf_{t,l}+1) − n_d·log2(T_l+V) and the shared
    6 dp grid + lang-ASC argmax tie-break. Zero-token docs are excluded
    (no dl row); unseen (term, lang) pairs contribute log2(1)=0 and are
    simply absent from the join."""
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
v AS (SELECT CAST(COUNT(DISTINCT term) AS DOUBLE) AS v FROM toks),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
pri AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS nd FROM documents GROUP BY lang),
tl AS (SELECT d.lang, CAST(COUNT(*) AS DOUBLE) AS t
       FROM toks JOIN documents d USING (doc_id) GROUP BY d.lang),
ctfl AS (SELECT t.term, d.lang, CAST(COUNT(*) AS DOUBLE) AS c
         FROM toks t JOIN documents d USING (doc_id) GROUP BY t.term, d.lang),
spart AS (SELECT tf.doc_id, c.lang, SUM(tf.tf * log2(c.c + 1)) AS s
          FROM tf JOIN ctfl c USING (term) GROUP BY tf.doc_id, c.lang),
cand AS (
    SELECT dl.doc_id, p.lang,
           log2(p.nd / (SELECT n FROM nn))
             + COALESCE(s.s, 0.0)
             - dl.n * log2(COALESCE(t.t, 0) + (SELECT v FROM v)) AS score
    FROM dl CROSS JOIN pri p
    LEFT JOIN spart s ON s.doc_id = dl.doc_id AND s.lang = p.lang
    LEFT JOIN tl t ON t.lang = p.lang
),
pred AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY doc_id
               ORDER BY floor(score * 1e6 + 0.5) / 1e6 DESC, lang ASC) AS rn
    FROM cand
)
SELECT d.lang, p.lang AS lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred p JOIN documents d USING (doc_id)
WHERE p.rn = 1
GROUP BY d.lang, p.lang"""


def event_props_stats_sql() -> str:
    """Oracle for events.event_props_stats: the identical JSON
    extraction expression, aggregated per type."""
    return """WITH x AS (
    SELECT event_type, CAST(props ->> 'k' AS BIGINT) AS k FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(MAX(k) AS BIGINT) AS k_max,
       floor(SUM(k) * 1.0 / COUNT(*) * 1e6 + 0.5) / 1e6 AS k_avg
FROM x GROUP BY event_type"""


def corpus_diff_sql(add_mod: int = 13, add_res: int = 3, rm_res: int = 7,
                    chg_mod: int = 11, chg_res: int = 4) -> str:
    """Oracle for dedup.corpus_diff: the two version slices as CTEs,
    FULL OUTER JOIN on doc_id, CASE status on md5 equality."""
    return f"""WITH old AS (
    SELECT doc_id, md5(text) AS m FROM documents
    WHERE doc_id % {add_mod} <> {add_res}),
new AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % {chg_mod} = {chg_res}
                    THEN text || ' [rev2]' ELSE text END) AS m
    FROM documents WHERE doc_id % {add_mod} <> {rm_res})
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.m <> n.m THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id"""


def lang_mix_sample_sql(weights_pm: dict[str, int] | None = None,
                        salt: str = "mix1") -> str:
    """Oracle for sample.lang_mix_sample: per-language counts → integer
    T and caps → per-language row_number over the identical salted
    md5-prefix key."""
    from .sample import MIX_WEIGHTS_PM

    weights_pm = weights_pm or MIX_WEIGHTS_PM
    w_rows = ", ".join(f"('{k}', {v})" for k, v in sorted(weights_pm.items()))
    return f"""WITH w(lang, pm) AS (VALUES {w_rows}),
cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY lang),
tt AS (SELECT MIN(cnt.n * 1000 // w.pm) AS t
       FROM w JOIN cnt USING (lang)),
caps AS (SELECT w.lang, w.pm * (SELECT t FROM tt) // 1000 AS cap FROM w),
keyed AS (
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)),
                                1, 13)) AS BIGINT) AS key
    FROM documents),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY key, doc_id) AS mix_rank
      FROM keyed)
SELECT r.doc_id, r.lang, CAST(r.mix_rank AS BIGINT) AS mix_rank
FROM r JOIN caps ON caps.lang = r.lang
WHERE r.mix_rank <= caps.cap"""


def simhash_md5_sql() -> str:
    """Oracle for dedup.simhash_md5: per-occurrence md5-half token
    hashes, exploded to 64 bit positions, ±1 vote sums, fingerprint
    halves reassembled by bit-weight sums."""
    return f"""WITH {_word_toks_cte()},
ft AS (SELECT doc_id, unnest(w) AS term FROM wtoks),
h AS (SELECT doc_id,
             CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h1,
             CAST(('0x' || substr(md5(term), 9, 8)) AS BIGINT) AS h2
      FROM ft),
expl AS (SELECT doc_id, h1, h2,
                unnest(generate_series(0, 63)) AS j
         FROM h),
votes AS (SELECT doc_id, j,
                 SUM(CASE WHEN ((CASE WHEN j >= 32 THEN h1 ELSE h2 END)
                                >> (j % 32)) & 1 = 1
                          THEN 1 ELSE -1 END) AS v
          FROM expl GROUP BY doc_id, j)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 AND j >= 32
                     THEN (CAST(1 AS BIGINT) << (j - 32)) ELSE 0 END)
            AS BIGINT) AS fp_hi,
       CAST(SUM(CASE WHEN v > 0 AND j < 32
                     THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
            AS BIGINT) AS fp_lo
FROM votes GROUP BY doc_id"""


def source_cap_sql(cap: int = 15, salt: str = "cap1") -> str:
    """Oracle for sample.source_cap: per-source row_number over the
    identical 52-bit salted md5-prefix key (ties → doc_id)."""
    return f"""WITH keyed AS (
    SELECT doc_id, source,
           CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)),
                                1, 13)) AS BIGINT) AS key
    FROM documents)
SELECT doc_id, source,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY key, doc_id) AS BIGINT) AS src_rank,
       CAST((row_number() OVER (PARTITION BY source
                                ORDER BY key, doc_id) <= {int(cap)})
            AS BIGINT) AS keep
FROM keyed"""


def source_mixture_sql() -> str:
    """Oracle for sample.source_mixture: per-(source, lang) doc/token
    counts over the word-token arrays, share on the shared 6 dp grid."""
    return f"""WITH {_word_toks_cte()},
tc AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM wtoks),
j AS (SELECT d.source, d.lang, tc.n
      FROM documents d JOIN tc USING (doc_id)),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM j)
SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       floor(SUM(n) / (SELECT t FROM tot) * 1e6 + 0.5) / 1e6 AS token_share
FROM j GROUP BY source, lang"""


def customers_without_orders_sql(priority: str = "1-URGENT") -> str:
    """Oracle for relational.customers_without_orders (distributed
    anti-join; only deduplicated right-side keys cross the exchange)."""
    return f"""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '{priority}')
    """


def customer_order_counts_sql() -> str:
    """Oracle for relational.customer_order_counts (LEFT OUTER aggregate
    join — customers with zero orders kept at 0/0.0)."""
    return """
        SELECT c_custkey, c_mktsegment,
               CAST(COUNT(o_totalprice) AS BIGINT) AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_mktsegment
    """


def user_value_running_sql() -> str:
    """Oracle for events.user_value_running: per-user running sum (exact
    integer cents — the same fixed-point grid value_quantiles uses, so
    the comparison is summation-order-exact) + lag."""
    return """
        SELECT event_id, user_id,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w
                    AS BIGINT) AS cum_value_cents,
               LAG(value) OVER w AS prev_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


def event_user_distinct_sql() -> str:
    """Oracle for events.event_user_distinct (exact grouped
    COUNT DISTINCT, twin of the HLL sketch)."""
    return """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    """


def stratified_sample_sql(fracs: dict | None = None,
                          default_frac: float | None = None) -> str:
    """Oracle for sample.stratified_sample — the per-stratum md5 rule as
    a CASE over the lang column."""
    from .sample import STRATA_DEFAULT_FRAC, STRATA_FRACS, _threshold_hex

    fracs = STRATA_FRACS if fracs is None else fracs
    default_frac = STRATA_DEFAULT_FRAC if default_frac is None else default_frac
    arms = "\n                 ".join(
        f"WHEN '{lang}' THEN '{_threshold_hex(f)}'"
        for lang, f in sorted(fracs.items())
    )
    return f"""
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE lang {arms}
                 ELSE '{_threshold_hex(default_frac)}' END
    """


def part_components_sql(rounds: int = 12) -> str:
    """Oracle for graph.part_components: plain min-label propagation
    unrolled ``rounds`` times over the distinct co-purchase pair graph.
    The required rounds grow with the graph's min-propagation diameter
    (measured: 2 at sf0.01, 3 at sf0.1), so the unroll carries a wide
    margin; the engine's pointer jumping accelerates but cannot change
    the fixpoint the unroll converges to."""
    its = []
    for i in range(1, int(rounds) + 1):
        its.append(f"""d{i} AS (
    SELECT node, MIN(lbl) AS lbl FROM (
        SELECT node, lbl FROM d{i - 1}
        UNION ALL
        SELECT e.b AS node, d.lbl AS lbl
        FROM d{i - 1} d JOIN edges e ON e.a = d.node
    ) GROUP BY node
)""")
    chain = ",\n".join(its)
    return f"""
WITH pairs AS MATERIALIZED (
    SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
    WHERE l1.l_partkey < l2.l_partkey
),
edges AS MATERIALIZED (
    -- materialized: each unrolled round re-references edges; without
    -- this DuckDB re-expands the parquet scan per round and a deep
    -- unroll exhausts file descriptors
    SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs
),
d0 AS (
    SELECT DISTINCT a AS node, a AS lbl FROM edges
),
{chain}
SELECT node AS part_key, CAST(lbl AS BIGINT) AS component
FROM d{int(rounds)}"""


def part_bfs_sql(seed_mod: int = 31, rounds: int = 3) -> str:
    """Oracle for graph.part_bfs: the level-synchronous BFS relaxation
    unrolled as chained min-merge CTEs over the distinct co-purchase
    pair graph."""
    its = []
    for i in range(1, rounds + 1):
        its.append(f"""d{i} AS (
    SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT p.dst AS node, d.dist + 1 AS dist
        FROM d{i - 1} d JOIN pairs p ON p.src = d.node
    ) GROUP BY node
)""")
    chain = ",\n".join(its)
    return f"""
WITH pairs AS (
    SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
    WHERE l1.l_partkey <> l2.l_partkey
),
d0 AS (
    SELECT DISTINCT src AS node, 0 AS dist FROM pairs
    WHERE src % {int(seed_mod)} = 0
),
{chain}
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"""


def part_pagerank_sql(damping: float = 0.85, iters: int = 5) -> str:
    """Oracle for graph.part_pagerank: the fixed-iteration recurrence
    unrolled as chained CTEs over the DISTINCT co-purchase pair graph
    (symmetric ⇒ no dangling nodes ⇒ the plain SUM form is exact)."""
    its = []
    for i in range(1, iters + 1):
        its.append(f"""r{i} AS (
    SELECT p.dst AS node,
           (1 - {damping}) / (SELECT n FROM nn)
           + {damping} * SUM(r.pr / d.deg) AS pr
    FROM pairs p
    JOIN r{i - 1} r ON r.node = p.src
    JOIN deg d ON d.src = p.src
    GROUP BY p.dst
)""")
    chain = ",\n".join(its)
    return f"""
WITH pairs AS (
    SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                    AND l1.l_partkey <> l2.l_partkey
),
deg AS (
    SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM pairs GROUP BY src
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS pr FROM deg),
{chain}
SELECT node AS part_key, ROUND(pr, 10) AS pagerank FROM r{iters}
"""


def doc_embedding_sql(dims: int = 64) -> str:
    """Oracle for embed.doc_embedding: feature-hashed TF-IDF in long
    format — the md5 bucket expression is literally the one the Ray
    kernel evaluates (both run DuckDB md5), so dims agree bit-for-bit;
    weights are rounded to 6 dp against cross-engine log2/sum ULPs."""
    return f"""WITH {tok_cte()},
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, term
),
dfs AS (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks GROUP BY term
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
SELECT t.doc_id,
       CAST(('0x' || substr(md5(t.term), 1, 8)) AS BIGINT) % {int(dims)} AS dim,
       ROUND(SUM(t.tf * log2((SELECT n FROM nn) / d.df)), 6) AS weight
FROM tf t JOIN dfs d USING (term)
GROUP BY t.doc_id, dim
"""


def top_orders_by_revenue_sql(k: int = 10) -> str:
    """Oracle for relational.top_orders_by_revenue: exact-integer revenue
    in 1e-4 units, rank ties on o_orderkey ASC."""
    return f"""WITH rev AS (
    SELECT l_orderkey AS o_orderkey,
           SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS rev_e4
    FROM lineitem GROUP BY l_orderkey),
r AS (
    SELECT o_orderkey, rev_e4,
           row_number() OVER (ORDER BY rev_e4 DESC, o_orderkey ASC) AS rank
    FROM rev)
SELECT o_orderkey, CAST(rank AS BIGINT) AS rank, rev_e4 / 10000.0 AS revenue
FROM r WHERE rank <= {int(k)}"""


def dataset_split_sql(val_frac: float = 0.1, test_frac: float = 0.1,
                      salt: str = "split") -> str:
    """Oracle for sample.dataset_split: the identical salted md5-prefix
    CASE rule."""
    from .sample import _threshold_hex

    t_test = _threshold_hex(test_frac)
    t_val = _threshold_hex(test_frac + val_frac)
    return f"""SELECT doc_id,
       CASE WHEN substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{t_test}' THEN 'test'
            WHEN substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 4)
                 < '{t_val}' THEN 'val'
            ELSE 'train' END AS split
FROM documents"""


def kmeans_embeddings_sql(k: int = 8, iters: int = 3) -> str:
    """Oracle for similarity.kmeans_embeddings: the Lloyd recurrence
    unrolled as chained CTEs. Init = k lowest-vec_id vectors; assignment
    ties break to the lowest cluster id (row_number ORDER BY dist,
    cluster); centroid update = member mean under the SHARED
    floor(x*1e9+0.5)/1e9 rounding rule, so both engines iterate on
    identical centroid doubles; empty clusters COALESCE to their previous
    centroid."""


    parts = _kmeans_ctes(k, iters)
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT vec_id, cluster FROM a{iters + 1}")


def _lloyd_assign_cte(i: int, csrc: str) -> str:
    """Assignment step of the shared Lloyd recurrence: argmin
    list_distance with ties to the lowest cluster id."""
    return f"""a{i} AS (SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c.v) ASC,
                                       c.cluster ASC) AS rn
    FROM e CROSS JOIN {csrc} c) WHERE rn = 1)"""


def _lloyd_update_cte(i: int) -> str:
    """Update step of the shared Lloyd recurrence: member mean under the
    shared 9 dp half-away rounding, empty clusters keep the previous
    centroid."""
    return f"""x{i} AS (SELECT a.cluster,
           CAST(generate_subscripts(e.v, 1) AS BIGINT) AS dim,
           unnest(e.v) AS x
    FROM a{i} a JOIN e USING (vec_id)),
g{i} AS (SELECT cluster, list(floor(mx * 1e9 + 0.5) / 1e9 ORDER BY dim) AS v
    FROM (SELECT cluster, dim, AVG(x) AS mx FROM x{i} GROUP BY cluster, dim)
    GROUP BY cluster),
c{i} AS (SELECT p.cluster, COALESCE(g.v, p.v) AS v
    FROM c{i - 1} p LEFT JOIN g{i} g USING (cluster))"""


def _kmeans_ctes(k: int, iters: int,
                 assign_cte=_lloyd_assign_cte,
                 update_cte=_lloyd_update_cte) -> list[str]:
    """The shared Lloyd-recurrence CTE chain: ``e`` (cast vectors),
    ``c0``..``c{iters}`` (centroids), ``a{iters+1}`` (final
    assignment)."""
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
           AS cluster, v
    FROM (SELECT * FROM e ORDER BY vec_id LIMIT {int(k)}))""",
    ]
    for i in range(1, iters + 1):
        parts.append(assign_cte(i, f"c{i - 1}"))
        parts.append(update_cte(i))
    parts.append(assign_cte(iters + 1, f"c{iters}"))
    return parts


def semantic_dedup_sql(k: int = 8, iters: int = 3,
                       threshold_micro: int = 450_000) -> str:
    """Oracle for similarity.semantic_dedup: the kmeans CTE chain
    (identical recurrence to :func:`kmeans_embeddings_sql`), then
    within-cluster pairs thresholded on the shared integer micro-unit
    cosine grid, recursive reachability closure (component = min
    reachable vec_id), and keep = row 1 per component ordered by
    (rounded centroid cosine ASC, vec_id ASC)."""


    parts = _kmeans_ctes(k, iters)
    fa, fc = f"a{iters + 1}", f"c{iters}"
    parts.append(f"""asn AS (SELECT a.vec_id, a.cluster, e.v
    FROM {fa} a JOIN e USING (vec_id))""")
    parts.append(f"""ccz AS (SELECT a.vec_id, a.cluster,
           CAST(floor(list_cosine_similarity(a.v, c.v) * 1e6 + 0.5)
                AS BIGINT) AS ccos_micro
    FROM asn a JOIN {fc} c USING (cluster))""")
    parts.append(f"""pr AS (SELECT x.vec_id AS a, y.vec_id AS b
    FROM asn x JOIN asn y
      ON x.cluster = y.cluster AND x.vec_id < y.vec_id
    WHERE floor(list_cosine_similarity(x.v, y.v) * 1e6 + 0.5)
          >= {int(threshold_micro)})""")
    parts.append("edges AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr)")
    parts.append("""reach(src, dst) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.src, e2.b FROM reach r JOIN edges e2 ON r.dst = e2.a)""")
    parts.append("""comp AS (SELECT src AS vec_id,
           CAST(LEAST(src, MIN(dst)) AS BIGINT) AS component
    FROM reach GROUP BY src)""")
    parts.append("""mem AS (SELECT z.vec_id, z.cluster, z.ccos_micro,
           COALESCE(cp.component, z.vec_id) AS component
    FROM ccz z LEFT JOIN comp cp USING (vec_id))""")
    parts.append("""rr AS (SELECT mem.*,
           row_number() OVER (PARTITION BY component
                              ORDER BY ccos_micro ASC, vec_id ASC) AS rn
    FROM mem)""")
    return ("WITH RECURSIVE " + ",\n".join(parts) + """
SELECT vec_id, cluster, component, ccos_micro / 1e6 AS centroid_cos,
       CAST((rn = 1) AS BIGINT) AS keep
FROM rr""")


def kmeans_inertia_sql(k: int = 8, iters: int = 3) -> str:
    """Oracle for similarity.kmeans_inertia: ONE shared Lloyd CTE chain
    (it already contains both the final assignment and the final
    centroids), then per-cluster COUNT + SUM(list_distance²) on the
    6 dp floor grid."""
    parts = _kmeans_ctes(k, iters)
    return ("WITH " + ",\n".join(parts) + f"""
SELECT a.cluster, CAST(COUNT(*) AS BIGINT) AS n,
       floor(SUM(power(list_distance(e.v, c.v), 2)) * 1e6 + 0.5) / 1e6
           AS inertia
FROM a{iters + 1} a
JOIN e USING (vec_id)
JOIN c{iters} c USING (cluster)
GROUP BY a.cluster""")


def ngram_diversity_sql(max_n: int = 3) -> str:
    """Oracle for filters.ngram_diversity: per-n distinct/total gram
    counts over the word-token arrays, diversity on the shared 6 dp
    grid."""
    branches = []
    for n in range(1, max_n + 1):
        branches.append(f"""SELECT {n} AS n,
       CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_grams,
       CAST(COUNT(*) AS BIGINT) AS total_grams
FROM (SELECT array_to_string(w[i:i+{n - 1}], ' ') AS g
      FROM (SELECT w, unnest(generate_series(1, greatest(len(w) - {n - 1}, 0))) AS i
            FROM wtoks))""")
    un = "\nUNION ALL\n".join(branches)
    return f"""WITH {_word_toks_cte()}
SELECT n, distinct_grams, total_grams,
       floor(distinct_grams * 1.0 / total_grams * 1e6 + 0.5) / 1e6 AS diversity
FROM ({un})
WHERE total_grams > 0"""


def doc_keywords_sql(m: int = 5) -> str:
    """Oracle for embed.doc_keywords: top-m TF-IDF terms per doc via
    row_number over UNROUNDED weights (term ASC tie-break), weight
    reported under the shared floor rule."""
    return f"""WITH {tok_cte()},
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, term
),
dfs AS (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks GROUP BY term
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
w AS (
    SELECT t.doc_id, t.term,
           t.tf * log2((SELECT n FROM nn) / d.df) AS w
    FROM tf t JOIN dfs d USING (term)
),
r AS (
    SELECT doc_id, term, w,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY w DESC, term ASC) AS rank
    FROM w
)
SELECT doc_id, term, CAST(rank AS BIGINT) AS rank,
       floor(w * 1e6 + 0.5) / 1e6 AS weight
FROM r WHERE rank <= {int(m)}"""


def embedding_covariance_sql() -> str:
    """Oracle for similarity.embedding_covariance: upper-triangle
    covariance via the Σxᵢxⱼ / per-dim sums / N decomposition (the same
    quantities the augmented-Gram partials carry)."""
    return """WITH expl AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings),
s AS (SELECT a.dim AS i, b.dim AS j, SUM(a.x * b.x) AS s
      FROM expl a JOIN expl b USING (vec_id)
      WHERE a.dim <= b.dim GROUP BY i, j),
m AS (SELECT dim, SUM(x) AS m FROM expl GROUP BY dim),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM embeddings)
SELECT s.i AS dim_i, s.j AS dim_j,
       floor((s.s - ma.m * mb.m / (SELECT v FROM n)) / (SELECT v FROM n)
             * 1e6 + 0.5) / 1e6 AS cov
FROM s JOIN m ma ON ma.dim = s.i JOIN m mb ON mb.dim = s.j"""


def text_knn_sql(n_queries: int = 5, k: int = 5, dims: int = 64) -> str:
    """Oracle for embed.text_knn: ONE statement composing the
    doc_embedding weights (rounded 6 dp — bit-identical across engines,
    proven by the doc_embedding gate) with cosine top-k; ranking over
    the ROUNDED cosine, ties to neighbor_id ASC."""
    emb = doc_embedding_sql(dims)
    return f"""WITH emb AS ({emb}),
nrm AS (SELECT doc_id, sqrt(SUM(weight * weight)) AS nn
        FROM emb GROUP BY doc_id),
q AS (SELECT * FROM emb WHERE doc_id < {int(n_queries)}),
dots AS (SELECT q.doc_id AS query_id, e.doc_id AS neighbor_id,
                SUM(q.weight * e.weight) AS dot
         FROM q JOIN emb e USING (dim) GROUP BY query_id, neighbor_id),
cosv AS (SELECT d.query_id, d.neighbor_id,
                floor(d.dot / (nq.nn * ne.nn) * 1e6 + 0.5) / 1e6 AS cosine
         FROM dots d
         JOIN nrm nq ON nq.doc_id = d.query_id
         JOIN nrm ne ON ne.doc_id = d.neighbor_id),
r AS (SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id ASC)
                 AS rank
      FROM cosv)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM r WHERE rank <= {int(k)}"""


def label_centroids_sql() -> str:
    """Oracle for similarity.label_centroids (per-label mean vector,
    long format via unnest + generate_subscripts)."""
    return """
        WITH expl AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                   unnest(embedding) AS x
            FROM embeddings)
        SELECT label, dim, ROUND(AVG(x), 6) AS mean_weight
        FROM expl GROUP BY label, dim
    """


# ---------- training-data filters (pipelines/filters.py) ----------

def _word_toks_cte() -> str:
    """CTE ``wtoks(doc_id, w)`` — the filters family's word tokenization
    (lowercase, split on non-[a-z0-9] runs, empties dropped), kept
    verbatim-identical to ``filters.WORD_SPLIT``."""
    return """
wtoks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> '') AS w
    FROM documents
)"""


def dup_span_stats_sql(w: int = 8) -> str:
    """Oracle for filters.dup_span_stats: exact corpus-global window
    counts over gram STRINGS (the Ray side uses 64-bit gram hashes;
    this gate pins the no-collision assumption at sf scale)."""
    return f"""WITH {_word_toks_cte()},
gpos AS (SELECT doc_id, w,
                unnest(generate_series(1, greatest(len(w) - {w - 1}, 0))) AS i
         FROM wtoks),
gr AS (SELECT doc_id, array_to_string(w[i:i+{w - 1}], ' ') AS g FROM gpos),
cnt AS (SELECT g, COUNT(*) AS c FROM gr GROUP BY g),
per AS (SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows
        FROM gr JOIN cnt USING (g) GROUP BY doc_id)
SELECT doc_id, n_windows, n_dup_windows,
       floor(n_dup_windows * 1.0 / n_windows * 1e6 + 0.5) / 1e6 AS dup_frac
FROM per"""


def collocations_sql(min_count: int = 5, k: int = 20) -> str:
    """Oracle for filters.collocations: PMI with the identical operand
    order (log2(c_ab) + 2 log2(Tu) - log2(Tb) - log2(c_a) - log2(c_b))
    and gram-ASC tie-break on the unrounded value."""
    return f"""WITH {_word_toks_cte()},
uni AS (SELECT unnest(w) AS t FROM wtoks),
uc AS (SELECT t AS w, COUNT(*) AS c FROM uni GROUP BY t),
tu AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni),
bpos AS (SELECT doc_id, w,
                unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
         FROM wtoks),
bi AS (SELECT array_to_string(w[i:i+1], ' ') AS g FROM bpos),
bc AS (SELECT g, COUNT(*) AS c FROM bi GROUP BY g),
tb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM bi),
parts AS (SELECT g, c,
                 string_split(g, ' ')[1] AS a,
                 string_split(g, ' ')[2] AS b
          FROM bc WHERE c >= {int(min_count)}),
wt AS (SELECT p.g, p.c,
              log2(CAST(p.c AS DOUBLE)) + 2 * log2((SELECT v FROM tu))
              - log2((SELECT v FROM tb))
              - log2(CAST(ua.c AS DOUBLE)) - log2(CAST(ub.c AS DOUBLE)) AS pmi
       FROM parts p JOIN uc ua ON ua.w = p.a JOIN uc ub ON ub.w = p.b),
r AS (SELECT g, c, pmi,
             row_number() OVER (ORDER BY pmi DESC, g ASC) AS rank
      FROM wt)
SELECT g AS gram, CAST(c AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank,
       floor(pmi * 1e6 + 0.5) / 1e6 AS pmi
FROM r WHERE rank <= {int(k)}"""


def bpe_pair_counts_sql(k: int = 50) -> str:
    """Oracle for tokenizer.bpe_pair_counts: adjacent char pairs of the
    word-frequency dict, top-k by weighted count, (a, b) ASC ties."""
    return f"""WITH {_word_toks_cte()},
uw AS (SELECT unnest(w) AS word FROM wtoks),
wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM uw GROUP BY word),
pos AS (SELECT word, n, unnest(generate_series(1, length(word) - 1)) AS i
        FROM wc WHERE length(word) >= 2),
pcnt AS (SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b,
                SUM(n) AS n
         FROM pos GROUP BY a, b),
r AS (SELECT a, b, n,
             row_number() OVER (ORDER BY n DESC, a ASC, b ASC) AS rank
      FROM pcnt)
SELECT a, b, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {int(k)}"""


def repetition_stats_sql() -> str:
    """Oracle for filters.repetition_stats (Gopher-style n-gram
    repetition): top-bigram concentration + duplicate-trigram fraction
    per document."""
    return f"""WITH {_word_toks_cte()},
bpos AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i FROM wtoks),
bi AS (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g FROM bpos),
bic AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY doc_id, g),
bagg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, CAST(MAX(c) AS BIGINT) AS bmax FROM bic GROUP BY doc_id),
tpos AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM wtoks),
tri AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g FROM tpos),
tagg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt, CAST(COUNT(DISTINCT g) AS BIGINT) AS tdis FROM tri GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(t.w) AS BIGINT) AS n_tokens,
       floor((COALESCE(b.bmax / CAST(b.nb AS DOUBLE), 0)) * 1000000 + 0.5) / 1000000 AS top_bigram_frac,
       floor((COALESCE((a.nt - a.tdis) / CAST(a.nt AS DOUBLE), 0)) * 1000000 + 0.5) / 1000000 AS dup_trigram_frac
FROM wtoks t LEFT JOIN bagg b USING (doc_id) LEFT JOIN tagg a USING (doc_id)"""


def pii_redact_sql() -> str:
    """Oracle for filters.pii_redact — DuckDB's regexp functions are
    RE2 like Arrow's, so counts and replacement spans agree exactly."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{ipv4}')) AS BIGINT) AS n_ipv4,
       md5(regexp_replace(regexp_replace(text, '{email}', '<EMAIL>', 'g'),
                          '{ipv4}', '<IP>', 'g')) AS redacted_md5
FROM documents"""


def decontaminate_sql(w: int = 3, bench_mod: int = 97) -> str:
    """Oracle for filters.decontaminate: exact gram-string overlap
    between the benchmark subset and the rest of the corpus."""
    return f"""WITH {_word_toks_cte()},
pos AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - {w - 1}, 0))) AS i FROM wtoks),
grams AS (SELECT doc_id, array_to_string(w[i:i+{w - 1}], ' ') AS g FROM pos),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0),
cont AS (SELECT DISTINCT doc_id FROM grams
         WHERE doc_id % {bench_mod} <> 0 AND g IN (SELECT g FROM bench))
SELECT d.doc_id,
       (d.doc_id IN (SELECT doc_id FROM cont)) AS contaminated
FROM documents d WHERE d.doc_id % {bench_mod} <> 0"""


def decontaminate_bloom_sql(w: int = 3, bench_mod: int = 97,
                            m_bits: int = 1 << 17, k: int = 4) -> str:
    """Oracle for filters.decontaminate_bloom: the IDENTICAL Bloom
    filter built in SQL — positions = portable 52-bit md5 prefix of
    ``g || '|' || i`` mod m_bits; a corpus gram hits iff all k of its
    positions appear among the benchmark's distinct positions
    (COUNT(DISTINCT ki) = k per (doc, gram))."""
    posx = (f"CAST(('0x' || substr(md5(g || '|' || CAST(ki AS VARCHAR)),"
            f" 1, 13)) AS BIGINT) % {int(m_bits)}")
    return f"""WITH {_word_toks_cte()},
pos AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - {w - 1}, 0))) AS i FROM wtoks),
grams AS (SELECT doc_id, array_to_string(w[i:i+{w - 1}], ' ') AS g FROM pos),
ks AS (SELECT unnest(generate_series(0, {int(k) - 1})) AS ki),
bpos AS (SELECT DISTINCT {posx} AS p
         FROM (SELECT DISTINCT g FROM grams
               WHERE doc_id % {bench_mod} = 0), ks),
cg AS (SELECT DISTINCT doc_id, g FROM grams
       WHERE doc_id % {bench_mod} <> 0),
cpos AS (SELECT doc_id, g, ki, {posx} AS p FROM cg, ks),
hit AS (SELECT doc_id FROM cpos JOIN bpos USING (p)
        GROUP BY doc_id, g HAVING COUNT(DISTINCT ki) = {int(k)})
SELECT d.doc_id,
       (d.doc_id IN (SELECT doc_id FROM hit)) AS contaminated_bloom
FROM documents d WHERE d.doc_id % {bench_mod} <> 0"""


def shard_export_sql(n_shards: int = 8) -> str:
    """Oracle for export.shard_export — the md5-bucket rule is the
    verbatim expression duck.md5_bucket evaluates; ids_md5 checksums the
    full shard assignment."""
    return f"""
WITH s AS (
    SELECT doc_id, length(text) AS lc,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % {int(n_shards)} AS shard_id
    FROM documents)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(lc) AS BIGINT) AS total_chars,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_md5
FROM s GROUP BY shard_id"""


def embedding_quantize_sql() -> str:
    """Oracle for similarity.embedding_quantize: per-dim global min/max,
    then floor((x-mn)*255/(mx-mn)+0.5) codes in long format. floor(v+.5)
    on both engines — no round-half parity hazard."""
    return """
WITH e AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
           CAST(unnest(embedding) AS DOUBLE) AS x
    FROM embeddings),
mm AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim)
SELECT e.vec_id, e.dim,
       CAST(CASE WHEN mm.mx > mm.mn
                 THEN floor((e.x - mm.mn) * 255 / (mm.mx - mm.mn) + 0.5)
                 ELSE 0 END AS BIGINT) AS code
FROM e JOIN mm USING (dim)"""


def chunk_documents_sql(size: int = 32, stride: int = 24) -> str:
    """Oracle for export.chunk_documents — same tokenization CTE, chunk
    grid via generate_series, md5 of the 1-based inclusive array slice."""
    return f"""WITH {_word_toks_cte()},
pos AS (
    SELECT doc_id, w,
           unnest(generate_series(0, (len(w) - 1) // {int(stride)})) AS ci
    FROM wtoks WHERE len(w) > 0)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       CAST(least({int(size)}, len(w) - ci * {int(stride)}) AS BIGINT) AS n_tokens,
       md5(array_to_string(
           w[ci * {int(stride)} + 1 : least(ci * {int(stride)} + {int(size)}, len(w))],
           ' ')) AS chunk_md5
FROM pos"""


def cdc_chunk_dedup_sql(divisor: int = 8) -> str:
    """Oracle for export.cdc_chunk_dedup: positions via
    generate_subscripts, boundary tokens by the verbatim md5-bucket
    expression, chunk id = exclusive running sum of boundary flags,
    keep-first via a window over chunk_md5."""
    return f"""WITH {_word_toks_cte()},
ft AS (SELECT doc_id, CAST(generate_subscripts(w, 1) AS BIGINT) AS pos,
              unnest(w) AS term
       FROM wtoks),
bnd AS (SELECT doc_id, pos, term,
               CASE WHEN CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT)
                         % {int(divisor)} = 0 THEN 1 ELSE 0 END AS b
        FROM ft),
cid AS (SELECT doc_id, pos, term,
               CAST(COALESCE(SUM(b) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS ci
        FROM bnd),
chunks AS (SELECT doc_id, ci AS chunk_idx,
                  CAST(COUNT(*) AS BIGINT) AS n_tokens,
                  md5(string_agg(term, ' ' ORDER BY pos)) AS chunk_md5
           FROM cid GROUP BY doc_id, ci)
SELECT doc_id, chunk_idx, n_tokens, chunk_md5,
       CAST((row_number() OVER (PARTITION BY chunk_md5
                                ORDER BY doc_id, chunk_idx) = 1)
            AS BIGINT) AS keep
FROM chunks"""


def training_export_sql(size: int = 32, stride: int = 24,
                        n_shards: int = 8, bench_mod: int = 97) -> str:
    """Oracle for export.training_export — the FULL composition (quality
    floors + exact dedup -> benchmark exclusion + trigram
    decontamination -> chunking -> md5-bucket sharding) reproduced in
    one SQL statement, value-checked down to the per-shard ordered
    (doc_id, chunk_idx) checksum."""
    ctes = _clean_ctes()
    return f"""WITH {tok_cte()},
{ctes},
{_word_toks_cte()},
gpos AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM wtoks),
grams AS (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g FROM gpos),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0),
cont AS (SELECT DISTINCT doc_id FROM grams
         WHERE doc_id % {bench_mod} <> 0 AND g IN (SELECT g FROM bench)),
surv AS (SELECT doc_id FROM kept
         WHERE doc_id % {bench_mod} <> 0
           AND doc_id NOT IN (SELECT doc_id FROM cont)),
swt AS (SELECT w.doc_id, w.w FROM wtoks w JOIN surv USING (doc_id)),
cpos AS (SELECT doc_id, w,
                unnest(generate_series(0, (len(w) - 1) // {int(stride)})) AS ci
         FROM swt WHERE len(w) > 0),
chunks AS (
    SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
           CAST(least({int(size)}, len(w) - ci * {int(stride)}) AS BIGINT) AS n_tokens,
           CAST(doc_id AS VARCHAR) || ':' || CAST(ci AS VARCHAR) AS key
    FROM cpos),
sh AS (SELECT *, CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT)
                     % {int(n_shards)} AS shard_id
       FROM chunks)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       md5(string_agg(key, ',' ORDER BY doc_id, chunk_idx)) AS ids_md5
FROM sh GROUP BY shard_id"""


def order_rollup_sql() -> str:
    """Oracle for relational.order_rollup — GROUP BY ROLLUP in exact
    integer cents."""
    return """
WITH o AS (
    SELECT o_orderpriority, o_orderstatus,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders)
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM o GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"""


def knn_graph_sql(k: int = 5) -> str:
    """Oracle for similarity.knn_graph — exact all-vs-all cosine top-k,
    self excluded, (cos DESC, neighbor ASC) tie-break."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
sims AS (
    SELECT a.vec_id, b.vec_id AS neighbor_id,
           list_cosine_similarity(a.ve, b.ve) AS cos
    FROM e a CROSS JOIN e b WHERE a.vec_id <> b.vec_id),
ranked AS (
    SELECT vec_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rank
    FROM sims)
SELECT vec_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       floor(cos * 1e6 + 0.5) / 1e6 AS cosine
FROM ranked WHERE rank <= {int(k)}"""


def order_shipping_priority_sql(segment: str = "BUILDING",
                                cutoff: str = "1998-07-01",
                                k: int = 10) -> str:
    """Oracle for relational.order_shipping_priority (TPC-H Q3 shape):
    3-table chain, exact-integer 1e-4 revenue, rank ties on o_orderkey
    ASC. The order date is compared/emitted as epoch microseconds so the
    text canon is precision-exact."""
    return f"""WITH rev AS (
    SELECT l_orderkey,
           SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS rev_e4
    FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'
    GROUP BY l_orderkey),
j AS (
    SELECT o.o_orderkey, rev.rev_e4, o.o_orderdate, o.o_orderpriority
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN rev ON rev.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{segment}'
      AND o.o_orderdate < TIMESTAMP '{cutoff}'),
r AS (
    SELECT *, row_number() OVER (ORDER BY rev_e4 DESC, o_orderkey ASC) AS rank
    FROM j)
SELECT o_orderkey, CAST(rank AS BIGINT) AS rank, rev_e4 / 10000.0 AS revenue,
       CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us,
       o_orderpriority
FROM r WHERE rank <= {int(k)}"""


def returned_item_report_sql(date_lo: str = "1996-01-01",
                             date_hi: str = "1996-04-01",
                             k: int = 20) -> str:
    """Oracle for relational.returned_item_report (TPC-H Q10 shape):
    4-table chain, exact-integer 1e-4 revenue, rank ties on c_custkey
    ASC."""
    return f"""WITH rev AS (
    SELECT l_orderkey,
           SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS rev_e4
    FROM lineitem WHERE l_returnflag = 'R'
    GROUP BY l_orderkey),
cr AS (
    SELECT o.o_custkey AS c_custkey, SUM(rev.rev_e4) AS rev_e4
    FROM orders o JOIN rev ON rev.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '{date_lo}'
      AND o.o_orderdate < TIMESTAMP '{date_hi}'
    GROUP BY o.o_custkey),
j AS (
    SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal, cr.rev_e4
    FROM cr
    JOIN customer c USING (c_custkey)
    JOIN nation n ON n.n_nationkey = c.c_nationkey),
r AS (
    SELECT *, row_number() OVER (ORDER BY rev_e4 DESC, c_custkey ASC) AS rank
    FROM j)
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(rank AS BIGINT) AS rank, rev_e4 / 10000.0 AS revenue
FROM r WHERE rank <= {int(k)}"""


def large_volume_orders_sql(qty_threshold: int = 200, k: int = 100) -> str:
    """Oracle for relational.large_volume_orders (TPC-H Q18): the
    HAVING cut on the identical integer quantity-cents grid, join-back
    to orders and customer, deterministic top-k."""
    thr_c = int(qty_threshold) * 100
    return f"""WITH q AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS q_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > {thr_c}),
j AS (
  SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
         o.o_totalprice, q.q_c
  FROM q
  JOIN orders o ON o.o_orderkey = q.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey),
r AS (
  SELECT *, row_number() OVER (ORDER BY o_totalprice DESC,
                               o_orderdate ASC, o_orderkey ASC) AS rank
  FROM j)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
       o_totalprice, q_c / 100.0 AS total_qty, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {int(k)}"""


def small_order_revenue_sql(brand: str = "Brand#12") -> str:
    """Oracle for relational.small_order_revenue (TPC-H Q17 shape): the
    correlated per-part average as an exact integer cross-multiplication
    (5·q·cnt < sum on the cents grid)."""
    return f"""WITH lc AS (
    SELECT l_partkey,
           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q_c,
           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p_c
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_brand = '{brand}')),
agg AS (SELECT l_partkey, SUM(q_c) AS s, CAST(COUNT(*) AS BIGINT) AS n
        FROM lc GROUP BY l_partkey),
sel AS (SELECT lc.p_c FROM lc JOIN agg USING (l_partkey)
        WHERE 5 * lc.q_c * agg.n < agg.s)
SELECT CAST(COALESCE(SUM(p_c), 0) AS BIGINT) AS total_cents,
       floor(COALESCE(SUM(p_c), 0) / 100.0 / 7.0 * 1e6 + 0.5) / 1e6
           AS avg_yearly
FROM sel"""


def table_profile_sql() -> str:
    """Oracle for relational.table_profile: per-column exact profile over
    lineitem in one wide row. Decimal distinct/mean run on the exact
    cents grid (the identical floor rule); timestamps on epoch µs."""
    from .relational import (_PROFILE_DEC, _PROFILE_INT, _PROFILE_STR,
                             _PROFILE_TS)

    parts = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for c in _PROFILE_INT:
        parts += [
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_ndv",
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS {c}_nulls",
            f"CAST(MIN({c}) AS BIGINT) AS {c}_min",
            f"CAST(MAX({c}) AS BIGINT) AS {c}_max",
        ]
    for c in _PROFILE_DEC:
        cents = f"CAST(floor({c} * 100 + 0.5) AS BIGINT)"
        parts += [
            f"CAST(COUNT(DISTINCT {cents}) AS BIGINT) AS {c}_ndv",
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS {c}_nulls",
            f"MIN({cents}) / 100.0 AS {c}_min",
            f"MAX({cents}) / 100.0 AS {c}_max",
            f"floor(SUM({cents}) / (100.0 * COUNT({c})) * 1e6 + 0.5) / 1e6 AS {c}_mean",
        ]
    for c in _PROFILE_STR:
        parts += [
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_ndv",
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS {c}_nulls",
            f"MIN({c}) AS {c}_min",
            f"MAX({c}) AS {c}_max",
        ]
    for c in _PROFILE_TS:
        parts += [
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS {c}_ndv",
            f"CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS {c}_nulls",
            f"CAST(epoch_us(MIN({c})) AS BIGINT) AS {c}_min",
            f"CAST(epoch_us(MAX({c})) AS BIGINT) AS {c}_max",
        ]
    sel = ",\n       ".join(parts)
    return f"SELECT {sel}\nFROM lineitem"


def global_value_rank_sql() -> str:
    """Oracle for events.global_value_rank: SQL RANK() over the same
    2-decimal cents grid (DESC, ties share)."""
    return """
SELECT event_id, value,
       CAST(RANK() OVER (
           ORDER BY CAST(round(value * 100, 0) AS BIGINT) DESC) AS BIGINT)
           AS rnk
FROM events"""


def phrase_search_sql(phrases: tuple[str, ...] | None = None) -> str:
    """Oracle for filters.phrase_search: per phrase, overlapping
    consecutive-token occurrence counts via the gram-position CTE
    (same list-slice gram assembly as dup_span_stats_sql)."""
    from .filters import PHRASE_QUERIES

    phrases = phrases or PHRASE_QUERIES
    subs = []
    for p in phrases:
        w = len(p.split())
        esc = p.replace("'", "''")
        subs.append(f"""
SELECT '{esc}' AS query, doc_id, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT doc_id, array_to_string(w[i:i+{w - 1}], ' ') AS g
      FROM (SELECT doc_id, w,
                   unnest(generate_series(1, greatest(len(w) - {w - 1}, 0))) AS i
            FROM wtoks))
WHERE g = '{esc}'
GROUP BY doc_id""")
    return f"WITH {_word_toks_cte()}" + "\nUNION ALL".join(subs)


def regex_search_sql(patterns: tuple[str, ...] | None = None) -> str:
    """Oracle for filters.regex_search: RE2 non-overlapping match counts
    (DuckDB regexp_extract_all ≡ Arrow count_substring_regex — both
    RE2, both leftmost, so counts agree byte-for-byte)."""
    from .filters import GREP_PATTERNS

    patterns = patterns or GREP_PATTERNS
    subs = []
    for p in patterns:
        esc = p.replace("'", "''")
        subs.append(f"""
SELECT '{esc}' AS pattern, doc_id,
       CAST(len(regexp_extract_all(text, '{esc}')) AS BIGINT) AS n
FROM documents
WHERE len(regexp_extract_all(text, '{esc}')) > 0""")
    return "\nUNION ALL".join(subs)


def fuzzy_term_match_sql(queries: tuple[str, ...] | None = None,
                         max_dist: int = 1) -> str:
    """Oracle for text_stats.fuzzy_term_match: naive O(V×Q) exact edit
    distance over the full vocabulary (DuckDB ``levenshtein`` is the
    same unit-cost metric as the pipeline's DP verifier)."""
    from .text_stats import FUZZY_QUERIES

    queries = queries or FUZZY_QUERIES
    vals = ", ".join("('" + q.replace("'", "''") + "')" for q in queries)
    return f"""WITH {tok_cte()},
vocab AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
          FROM toks GROUP BY term),
q(query) AS (VALUES {vals})
SELECT q.query, v.term, v.df,
       CAST(levenshtein(q.query, v.term) AS BIGINT) AS dist
FROM vocab v CROSS JOIN q
WHERE levenshtein(q.query, v.term) <= {int(max_dist)}"""


def search_snippets_sql(k: int = 10, n_ctx: int = 3) -> str:
    """Oracle for search_docs.search_snippets: the full BM25 scoring
    stack of search_topk_sql plus first-match position + array-slice
    snippet (1-based list positions; w[max(p-n,1):p+n] is the inclusive
    twin of the pipeline's tokens[max(0,p0-n):p0+n+1])."""
    cfg = BuildConfig()
    rows, _ = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    cls = _regex_class().replace("'", "''")
    return f"""WITH {tok_cte()},
tarr AS (SELECT doc_id,
                list_filter(string_split_regex(
                    trim(regexp_replace(lower(text), '{cls}', ' ', 'g')),
                    ' +'), x -> x <> '') AS w
         FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
),
tpos AS (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i FROM tarr),
tterm AS (SELECT doc_id, i, w[i] AS term FROM tpos),
fp AS (SELECT q.query_id, t.doc_id, MIN(t.i) AS first_pos
       FROM q JOIN tterm t ON t.term = q.term
       GROUP BY q.query_id, t.doc_id)
SELECT CAST(r.query_id AS BIGINT) AS query_id, CAST(r.rank AS BIGINT) AS rank,
       r.doc_id, ROUND(r.s, 6) AS score,
       CAST(fp.first_pos AS BIGINT) AS first_pos,
       array_to_string(ta.w[greatest(fp.first_pos - {int(n_ctx)}, 1):fp.first_pos + {int(n_ctx)}], ' ') AS snippet
FROM ranked r
JOIN fp ON fp.query_id = r.query_id AND fp.doc_id = r.doc_id
JOIN tarr ta ON ta.doc_id = r.doc_id
WHERE r.rank <= {int(k)}"""


def event_outliers_sql(z_thresh: float = 3.0) -> str:
    """Oracle for events.event_outliers: identical integer-cent moment
    sums and the identical mean/σ/z operand order."""
    return f"""WITH c AS (
    SELECT event_id, event_type, value,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
st AS (SELECT event_type, COUNT(*) AS n,
              CAST(SUM(cents) AS BIGINT) AS s,
              CAST(SUM(cents * cents) AS BIGINT) AS ss
       FROM c GROUP BY event_type),
z AS (SELECT c.event_id, c.event_type, c.value,
             (c.cents - s * 1.0 / n)
               / sqrt(ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n)) AS z
      FROM c JOIN st USING (event_type))
SELECT event_id, event_type, value, floor(z * 1e6 + 0.5) / 1e6 AS z
FROM z WHERE abs(z) >= {float(z_thresh)}"""


def event_weekday_pivot_sql() -> str:
    """Oracle for events.event_weekday_pivot (ISO weekday columns)."""
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN isodow(ts) = {d} THEN 1 ELSE 0 END) AS BIGINT) AS dow{d}"
        for d in range(1, 8))
    return f"""SELECT event_type,
       {cols}
FROM events GROUP BY event_type"""


def part_triangles_sql() -> str:
    """Oracle for graph.part_triangles: naive 3-way self-join triangle
    count over the distinct a<b co-purchase edge set."""
    return """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM d x JOIN d y ON x.l_orderkey = y.l_orderkey
                       AND x.l_partkey < y.l_partkey)
SELECT (SELECT CAST(COUNT(DISTINCT n) AS BIGINT)
        FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles"""


def local_supplier_volume_sql(region: str = "ASIA",
                              date_from: str = "1996-01-01",
                              date_to: str = "1997-01-01") -> str:
    """Oracle for relational.local_supplier_volume (TPC-H Q5 shape):
    6-table chain with the c_nationkey = s_nationkey locality predicate;
    revenue in the shared exact-integer 1e-4 rule."""
    return f"""SELECT n_name,
       SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
           / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = '{region}'
  AND o_orderdate >= TIMESTAMP '{date_from}'
  AND o_orderdate <  TIMESTAMP '{date_to}'
GROUP BY n_name"""


def price_quantiles_sql(qs: tuple = (0.01, 0.25, 0.5, 0.75, 0.99)) -> str:
    """Oracle for relational.price_quantiles: explicit rank selection
    (k = max(1, ceil(q*N)), 1-indexed k-th smallest) over exact integer
    cents — no quantile-function interpolation-semantics guessing."""
    arms = "\nUNION ALL\n".join(
        f"""SELECT CAST({q} AS DOUBLE) AS q,
       GREATEST(1, CAST(ceil({q} * n) AS BIGINT)) AS rank,
       cents, cents / 100.0 AS price
FROM r WHERE rk = GREATEST(1, CAST(ceil({q} * n) AS BIGINT))"""
        for q in qs
    )
    return f"""WITH c AS (
    SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders),
r AS (
    SELECT cents,
           row_number() OVER (ORDER BY cents) AS rk,
           COUNT(*) OVER () AS n
    FROM c)
{arms}"""


def term_complete_sql(prefix: str = "s", k: int = 10) -> str:
    """Oracle for text_stats.term_complete: prefix-filtered df top-k with
    (df DESC, term ASC) ranking. The prefix matches LITERALLY via
    substr equality (the engine uses ``pc.starts_with``) — LIKE would
    treat '%'/'_' in the prefix as wildcards."""
    esc = prefix.replace("'", "''")
    return f"""WITH {tok_cte()},
d AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks
      WHERE substr(term, 1, {len(prefix)}) = '{esc}'
      GROUP BY term)
SELECT CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS BIGINT) AS rank,
       term, df
FROM d
ORDER BY df DESC, term ASC
LIMIT {int(k)}"""


def search_boolean_sql(k: int = 10) -> str:
    """Oracle for search_docs.search_boolean: conjunctive BM25 over the
    MUST terms with a NOT-EXISTS anti-join on the MUST-NOT terms."""
    from ..config import BuildConfig
    from ..pipelines.search_docs import BOOL_QUERIES

    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    prow, nrow = [], []
    counts = []
    for qi, (pos, neg) in enumerate(BOOL_QUERIES):
        pos_u, neg_u = sorted(set(pos)), sorted(set(neg))
        counts.append(f"WHEN q.query_id = {qi} THEN {len(pos_u)}")
        prow += [f"({qi}, '{t}')" for t in pos_u]
        nrow += [f"({qi}, '{t}')" for t in neg_u]
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {", ".join(prow)}),
nq(query_id, term) AS (VALUES {", ".join(nrow)}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    WHERE NOT EXISTS (
        SELECT 1 FROM toks x
        JOIN nq ON nq.term = x.term AND nq.query_id = q.query_id
        WHERE x.doc_id = tf.doc_id)
    GROUP BY q.query_id, tf.doc_id
    HAVING COUNT(DISTINCT q.term) = MAX(CASE {" ".join(counts)} END)
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {k}"""


def importance_weights_sql(target_lang: str = "en",
                           n_buckets: int = 64) -> str:
    """Oracle for filters.importance_weights: DSIR hashed-unigram
    importance weights. The bucket expression is the verbatim
    ``duck.md5_bucket`` rule (both engines run DuckDB md5); the
    per-bucket log-ratio uses the single-log2 operand order the Ray
    kernel evaluates — ``log2(((t+1)*(s_tot+B)) / ((s+1)*(t_tot+B)))``
    on identical doubles — so only the per-doc Σ tf·w summation order
    differs, absorbed by the shared floor(x*1e6+0.5)/1e6 rounding."""
    B = int(n_buckets)
    lang = target_lang.replace("'", "''")
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY doc_id, term),
tb AS (SELECT term,
              CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % {B} AS bucket
       FROM (SELECT DISTINCT term FROM tf)),
bc AS (SELECT b.bucket,
              CAST(SUM(CASE WHEN d.lang = '{lang}' THEN t.tf ELSE 0 END)
                   AS DOUBLE) AS t_cnt,
              CAST(SUM(t.tf) AS DOUBLE) AS s_cnt
       FROM tf t JOIN tb b USING (term) JOIN documents d USING (doc_id)
       GROUP BY b.bucket),
tot AS (SELECT CAST(SUM(t_cnt) AS DOUBLE) AS t_tot,
               CAST(SUM(s_cnt) AS DOUBLE) AS s_tot FROM bc),
w AS (SELECT bucket,
             log2(((t_cnt + 1.0) * ((SELECT s_tot FROM tot) + {B}))
                  / ((s_cnt + 1.0) * ((SELECT t_tot FROM tot) + {B}))) AS w
      FROM bc),
per_doc AS (
    SELECT t.doc_id, SUM(t.tf) AS n_tokens, SUM(t.tf * w.w) AS logw
    FROM tf t JOIN tb b USING (term) JOIN w USING (bucket)
    GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       floor(COALESCE(p.logw, 0.0) * 1e6 + 0.5) / 1e6 AS logw
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


def span_dedup_sql(width: int = 10) -> str:
    """Oracle for dedup.span_dedup: exact span dedup on the aligned
    ``width``-word grid, keep-first in global (doc_id, pos) order.
    Matches exact span STRINGS (the Ray side matches 64-bit xxhashes,
    so a green gate also pins the no-collision stance); the reassembly
    is ``string_agg(line, ' ' ORDER BY pos)`` — the verbatim twin of
    the Ray kernel's offset-filtered ``binary_join``."""
    W = int(width)
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(ws[(i-1)*{W}+1 : i*{W}], ' ') AS line
  FROM w, LATERAL (SELECT unnest(generate_series(
       1, CAST(ceil(len(ws)/{W}.0) AS BIGINT))) AS i)),
k AS (
  SELECT doc_id, pos, line,
         (line = '' OR row_number() OVER
            (PARTITION BY line ORDER BY doc_id, pos) = 1) AS keep
  FROM g)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN keep THEN line END,
                               ' ' ORDER BY pos), '')) AS clean_md5
FROM k GROUP BY doc_id"""


def boilerplate_spans_sql(width: int = 10, min_count: int = 2) -> str:
    """Oracle for dedup.boilerplate_spans: spans whose exact text occurs
    >= min_count times corpus-wide are removed from EVERY doc (all
    instances — the MassiveText repeated-line filter), on the identical
    aligned width-word grid as span_dedup_sql."""
    W = int(width)
    N = int(min_count)
    return f"""WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (
  SELECT doc_id, i AS pos,
         array_to_string(ws[(i-1)*{W}+1 : i*{W}], ' ') AS line
  FROM w, LATERAL (SELECT unnest(generate_series(
       1, CAST(ceil(len(ws)/{W}.0) AS BIGINT))) AS i)),
k AS (
  SELECT doc_id, pos, line,
         (line = '' OR COUNT(*) OVER (PARTITION BY line) < {N}) AS keep
  FROM g)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       md5(COALESCE(string_agg(CASE WHEN keep THEN line END,
                               ' ' ORDER BY pos), '')) AS clean_md5
FROM k GROUP BY doc_id"""


def sequence_pack_sql(seq_len: int = 512) -> str:
    """Oracle for export.sequence_pack: the global ordered prefix sum
    as a window cumulative SUM over doc_id order, sequence ids by
    integer division."""
    L = int(seq_len)
    return f"""WITH {tok_cte()},
tc AS (
  SELECT d.doc_id, CAST(COALESCE(t.n, 0) AS BIGINT) AS n
  FROM documents d LEFT JOIN (
    SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id
  ) t USING (doc_id)),
s AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_tok
  FROM tc)
SELECT doc_id, n AS n_tokens, start_tok,
       CAST(CASE WHEN n > 0 THEN start_tok // {L} ELSE -1 END
            AS BIGINT) AS first_seq,
       CAST(CASE WHEN n > 0 THEN (start_tok + n - 1) // {L} ELSE -1 END
            AS BIGINT) AS last_seq
FROM s"""


def quality_select_sql(q_num: int = 1, q_den: int = 2) -> str:
    """Oracle for sample.quality_select: per-lang top-q% by the round6
    distinct-ratio GRID (both engines rank on the identical integer
    grid value), ties → lowest doc_id, k in integer math."""
    return f"""WITH {tok_cte()},
sc AS (
  SELECT d.doc_id, d.lang,
         CAST(floor(COALESCE(t.nd, 0) * 1.0
                    / GREATEST(COALESCE(t.n, 0), 1) * 1000000 + 0.5)
              AS BIGINT) AS s
  FROM documents d LEFT JOIN (
    SELECT doc_id, COUNT(DISTINCT term) AS nd, COUNT(*) AS n
    FROM toks GROUP BY doc_id
  ) t USING (doc_id)),
r AS (
  SELECT doc_id, lang, s,
         row_number() OVER (PARTITION BY lang ORDER BY s DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM sc)
SELECT doc_id, lang, s / 1000000.0 AS distinct_ratio
FROM r WHERE rn <= (cnt * {int(q_num)} + {int(q_den)} - 1) // {int(q_den)}"""


def bigram_logprob_sql() -> str:
    """Oracle for text_stats.bigram_logprob: exact bigram/context
    STRING counts (pins the Ray side's 64-bit-hash stance), identical
    add-one expression log2(c_ab + 1) − log2(c_ctx + V), shared floor
    half-up rounding."""
    cls = _regex_class().replace("'", "''")
    return f"""WITH tl AS (
  SELECT doc_id,
         list_filter(string_split_regex(
             trim(regexp_replace(lower(text), '{cls}', ' ', 'g')), ' +'),
             x -> x <> '') AS toks
  FROM documents),
v AS (SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
      FROM (SELECT unnest(toks) AS t FROM tl)),
bi AS (
  SELECT doc_id, toks[i] AS a, array_to_string(toks[i:i+1], ' ') AS ab
  FROM tl, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1)) AS i)
  WHERE len(toks) >= 2),
cb AS (SELECT ab, CAST(COUNT(*) AS DOUBLE) AS c FROM bi GROUP BY ab),
cc AS (SELECT a, CAST(COUNT(*) AS DOUBLE) AS c FROM bi GROUP BY a),
per AS (
  SELECT bi.doc_id,
         SUM(log2(cb.c + 1.0) - log2(cc.c + (SELECT v FROM v))) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM bi JOIN cb USING (ab) JOIN cc USING (a)
  GROUP BY bi.doc_id)
SELECT doc_id, n AS n_bigrams,
       floor(s / n * 1e6 + 0.5) / 1e6 AS avg_logprob
FROM per"""


def pq_encode_sql(m: int = 4, k: int = 4, iters: int = 2) -> str:
    """Oracle for similarity.pq_encode: m independent Lloyd recurrences
    over the block sub-slices, unrolled as chained CTEs with the same
    deterministic contract as kmeans_embeddings_sql (block carried
    through every CTE)."""
    sub = f"(SELECT dims FROM dd)"

    def assign_cte(i: int, csrc: str) -> str:
        return f"""a{i} AS (SELECT vec_id, block, cluster FROM (
    SELECT e.vec_id, e.block, c.cluster,
           row_number() OVER (PARTITION BY e.vec_id, e.block
                              ORDER BY list_distance(e.v, c.v) ASC,
                                       c.cluster ASC) AS rn
    FROM e JOIN {csrc} c USING (block)) WHERE rn = 1)"""

    def update_cte(i: int) -> str:
        return f"""x{i} AS (SELECT a.block, a.cluster,
           CAST(generate_subscripts(e.v, 1) AS BIGINT) AS dim,
           unnest(e.v) AS x
    FROM a{i} a JOIN e USING (vec_id, block)),
g{i} AS (SELECT block, cluster,
                list(floor(mx * 1e9 + 0.5) / 1e9 ORDER BY dim) AS v
    FROM (SELECT block, cluster, dim, AVG(x) AS mx
          FROM x{i} GROUP BY block, cluster, dim)
    GROUP BY block, cluster),
c{i} AS (SELECT p.block, p.cluster, COALESCE(g.v, p.v) AS v
    FROM c{i - 1} p LEFT JOIN g{i} g USING (block, cluster))"""

    parts = [
        f"""dd AS (SELECT len(embedding) // {int(m)} AS dims
    FROM embeddings LIMIT 1)""",
        f"""e AS (SELECT vec_id, b.block,
           (CAST(embedding AS DOUBLE[]))
               [b.block * {sub} + 1 : (b.block + 1) * {sub}] AS v
    FROM embeddings,
         LATERAL (SELECT unnest(generate_series(0, {int(m) - 1}))
                  AS block) b)""",
        f"""c0 AS (SELECT block,
           CAST(row_number() OVER (PARTITION BY block ORDER BY vec_id) - 1
                AS BIGINT) AS cluster, v
    FROM e QUALIFY row_number() OVER (PARTITION BY block ORDER BY vec_id)
         <= {int(k)})""",
    ]
    for i in range(1, iters + 1):
        parts.append(assign_cte(i, f"c{i - 1}"))
        parts.append(update_cte(i))
    parts.append(assign_cte(iters + 1, f"c{iters}"))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT vec_id, block, cluster AS code FROM a{iters + 1}")


def search_hybrid_rrf_sql(n_queries: int = 5, k_in: int = 10,
                          k_out: int = 5, kappa: int = 60,
                          dims: int = 64) -> str:
    """Oracle for search_docs.search_hybrid_rrf: ONE statement
    composing the full SQL BM25 stack (query = each query doc's own
    normalized tokens, deduped — the engine's normalize_query contract)
    with the text_knn embedding stack, fused by reciprocal ranks. Both
    components rank on their ROUNDED 6 dp scores with doc_id-ASC ties
    (the op's cross-engine contract); the fused score is the sum of two
    identical doubles."""
    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    emb = doc_embedding_sql(dims)
    nq, K = int(n_queries), int(kappa)
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM toks GROUP BY term),
q AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
      WHERE doc_id < {nq}),
bscores AS (
    SELECT q.query_id, tf.doc_id,
           floor(SUM({expr}) * 1e6 + 0.5) / 1e6 AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id),
bm AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY s DESC, doc_id ASC) AS ra
       FROM bscores QUALIFY ra <= {int(k_in)}),
emb AS ({emb}),
nrm AS (SELECT doc_id, sqrt(SUM(weight * weight)) AS nn
        FROM emb GROUP BY doc_id),
eq AS (SELECT * FROM emb WHERE doc_id < {nq}),
dots AS (SELECT eq.doc_id AS query_id, e.doc_id, SUM(eq.weight * e.weight) AS dot
         FROM eq JOIN emb e USING (dim) GROUP BY query_id, e.doc_id),
cosv AS (SELECT d.query_id, d.doc_id,
                floor(d.dot / (nq2.nn * ne.nn) * 1e6 + 0.5) / 1e6 AS cosine
         FROM dots d
         JOIN nrm nq2 ON nq2.doc_id = d.query_id
         JOIN nrm ne ON ne.doc_id = d.doc_id),
kn AS (SELECT query_id, doc_id,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, doc_id ASC) AS rb
       FROM cosv QUALIFY rb <= {int(k_in)}),
u AS (SELECT COALESCE(bm.query_id, kn.query_id) AS query_id,
             COALESCE(bm.doc_id, kn.doc_id) AS doc_id,
             (CASE WHEN bm.ra IS NOT NULL
                   THEN 1.0 / ({K} + bm.ra) ELSE 0.0 END)
           + (CASE WHEN kn.rb IS NOT NULL
                   THEN 1.0 / ({K} + kn.rb) ELSE 0.0 END) AS f
      FROM bm FULL OUTER JOIN kn USING (query_id, doc_id)),
fused AS (SELECT query_id, doc_id, f,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY f DESC, doc_id ASC) AS rank
          FROM u)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       floor(f * 1e6 + 0.5) / 1e6 AS rrf
FROM fused WHERE rank <= {int(k_out)}"""


def importance_resample_sql(n_out: int = 100, target_lang: str = "en",
                            n_buckets: int = 64,
                            salt: str = "dsir") -> str:
    """Oracle for filters.importance_resample: the importance_weights
    statement as a CTE, then the identical deterministic Gumbel key —
    rounded logw + (-ln(-ln((prefix + 0.5) / 2^52))) — and a window
    top-n_out on the unrounded key, ties → doc_id."""
    iw = importance_weights_sql(target_lang, n_buckets)
    s = salt.replace("'", "''")
    return f"""WITH iw AS ({iw}),
u AS (SELECT doc_id, logw,
             (CAST(('0x' || substr(md5('{s}:' || CAST(doc_id AS VARCHAR)),
                                   1, 13)) AS BIGINT) + 0.5)
               / 4503599627370496.0 AS uu
      FROM iw),
k AS (SELECT doc_id, logw, logw + (-ln(-ln(uu))) AS key FROM u),
r AS (SELECT doc_id, logw, key,
             row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rank
      FROM k)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, logw,
       floor(key * 1e6 + 0.5) / 1e6 AS key
FROM r WHERE rank <= {int(n_out)}"""


def funnel_analysis_sql(
        steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    """Oracle for events.funnel_analysis: the earliest-completion chain
    as s chained per-user MIN CTEs with strict ts inequality."""
    steps = tuple(steps)
    esc = [s.replace("'", "''") for s in steps]
    parts = [f"""s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = '{esc[0]}' GROUP BY user_id)"""]
    for i in range(1, len(steps)):
        parts.append(f"""s{i + 1} AS (
    SELECT e.user_id, MIN(e.ts) AS t{i + 1}
    FROM events e JOIN s{i} USING (user_id)
    WHERE e.event_type = '{esc[i]}' AND e.ts > s{i}.t{i}
    GROUP BY e.user_id)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step, '{esc[i]}' AS event_type,"
        f" CAST(COUNT(*) AS BIGINT) AS n_users FROM s{i + 1}"
        for i in range(len(steps)))
    return "WITH " + ",\n".join(parts) + "\n" + unions


def revenue_forecast_sql(year: int = 1995, disc_lo: int = 5,
                         disc_hi: int = 7, max_qty: int = 24) -> str:
    """Oracle for relational.revenue_forecast: TPC-H Q6 on the exact
    cents grid (identical floor half-up cents conversion, integer
    product sum)."""
    return f"""SELECT
  CAST(COALESCE(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)), 0)
       AS BIGINT) AS revenue_e4,
  CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
  AND l_shipdate < TIMESTAMP '{year + 1}-01-01'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
      BETWEEN {int(disc_lo)} AND {int(disc_hi)}
  AND l_quantity < {int(max_qty)}"""


def part_clustering_sql() -> str:
    """Oracle for graph.part_clustering: per-node triangle membership
    from the 3-way self-join (each triangle counted once via
    e1.a < e1.b < e2.b, attributed to all three corners), degree from
    the edge union, cc on the shared round6 grid."""
    return """WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM d x JOIN d y ON x.l_orderkey = y.l_orderkey
                       AND x.l_partkey < y.l_partkey),
deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
tn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
       FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
             UNION ALL SELECT z FROM tri)
       GROUP BY node)
SELECT d.node, d.degree,
       CAST(COALESCE(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree >= 2
            THEN floor(2.0 * COALESCE(tn.n_triangles, 0)
                       / (d.degree * (d.degree - 1)) * 1e6 + 0.5) / 1e6
            ELSE 0.0 END AS cc
FROM deg d LEFT JOIN tn USING (node)"""


def term_heavy_hitters_sql(k: int = 2000) -> str:
    """Oracle for text_stats.term_heavy_hitters: exact grouped counts
    with the identical integer threshold (freq · k > T)."""
    return f"""WITH {tok_cte()},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM toks)
SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
FROM toks GROUP BY term
HAVING CAST(COUNT(*) AS BIGINT) * {int(k)} > (SELECT t FROM tot)"""


def cohort_retention_sql(bucket_s: int = 7 * 86400) -> str:
    """Oracle for events.cohort_retention: distinct (user, period) grid
    joined to each user's minimum period."""
    b = int(bucket_s)
    return f"""WITH uw AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 1000000 // {b} AS wk
  FROM events),
c AS (SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY user_id)
SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
       CAST(uw.wk - c.cohort AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY cohort_week, week_offset"""


def retrieval_triplets_sql(n_queries: int = 5, n_hard: int = 3,
                           n_rand: int = 3, pool: int = 10,
                           salt: str = "neg") -> str:
    """Oracle for search_docs.retrieval_triplets: the rounded-grid BM25
    stack (query = each query doc's own tokens), self-dropped and
    re-ranked for pos/hard_neg; rand_neg = the n_rand smallest salted
    md5 keys among docs outside self ∪ the BM25 pool."""
    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    nq, s = int(n_queries), salt.replace("'", "''")
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
       FROM toks GROUP BY term),
q AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
      WHERE doc_id < {nq}),
bscores AS (
    SELECT q.query_id, tf.doc_id,
           floor(SUM({expr}) * 1e6 + 0.5) / 1e6 AS sc
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id),
ball AS (SELECT query_id, doc_id, sc,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY sc DESC, doc_id ASC) AS rn
         FROM bscores QUALIFY rn <= {int(pool) + 1}),
b AS (SELECT query_id, doc_id, sc,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sc DESC, doc_id ASC) AS r
      FROM ball WHERE doc_id <> query_id),
posneg AS (
    SELECT query_id,
           CASE WHEN r = 1 THEN 'pos' ELSE 'hard_neg' END AS kind,
           CAST(CASE WHEN r = 1 THEN 1 ELSE r - 1 END AS BIGINT) AS rank,
           doc_id
    FROM b WHERE r <= 1 + {int(n_hard)}),
rn AS (
    SELECT qq.query_id, d.doc_id,
           md5('{s}:' || CAST(qq.query_id AS VARCHAR) || ':'
               || CAST(d.doc_id AS VARCHAR)) AS h
    -- query universe = ALL first-n docs: a token-less query doc still
    -- draws its n_rand random negatives (the pipeline emits them)
    FROM (SELECT doc_id AS query_id FROM documents
          WHERE doc_id < {nq}) qq CROSS JOIN documents d
    WHERE d.doc_id <> qq.query_id
      AND NOT EXISTS (SELECT 1 FROM b
                      WHERE b.query_id = qq.query_id
                        AND b.doc_id = d.doc_id)),
rneg AS (
    SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY h ASC, doc_id ASC) AS rank
    FROM rn QUALIFY rank <= {int(n_rand)})
SELECT query_id, kind, rank, doc_id FROM posneg
UNION ALL
SELECT query_id, 'rand_neg' AS kind, CAST(rank AS BIGINT) AS rank, doc_id
FROM rneg"""


def frame_sample_sql(stride: int = 2) -> str:
    """Oracle for multimodal.frame_sample: the stub codec's np.resize
    tiling re-expressed as repeat+substr over the payload (the media
    table's payload is the UTF-8 text bytes; the corpus is pure ASCII,
    where VARCHAR positions == byte positions — media_byte_stats pins
    the byte identity)."""
    st = int(stride)
    return f"""WITH v AS (
  SELECT doc_id AS media_id, text,
         CAST(length(text) AS BIGINT) AS nb,
         CAST(CASE WHEN length(text) >= 64 THEN 8 ELSE 4 END AS BIGINT)
             AS w
  FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0),
g AS (
  SELECT media_id, text, nb, w,
         greatest(nb // w, 1) AS h,
         nb % 7 + 2 AS nf
  FROM v),
fr AS (
  SELECT media_id, text, nb, w, h, i AS frame_idx
  FROM g, LATERAL (SELECT unnest(generate_series(
       0, CAST(nf - 1 AS BIGINT), {st})) AS i))
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(w * h AS BIGINT) AS n_bytes,
       md5(substr(repeat(text,
                         CAST(ceil((frame_idx + 1) * w * h * 1.0 / nb)
                              AS BIGINT)),
                  CAST(frame_idx * w * h + 1 AS BIGINT),
                  CAST(w * h AS BIGINT))) AS frame_md5
FROM fr"""


def vocab_stats_sql() -> str:
    """Oracle for text_stats.vocab_stats: identical decompositions —
    H = log2(T) − Σ c·log2(c)/T, α = 1 + n/Σ ln(c/0.5) — over exact
    grouped counts, shared floor rounding."""
    return f"""WITH {tok_cte()},
c AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY term),
agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS t,
               SUM(c * log2(c)) AS s_clog,
               SUM(ln(c / 0.5)) AS s_ln
        FROM c)
SELECT n AS n_types, t AS n_tokens,
       floor(n * 1.0 / greatest(t, 1) * 1e6 + 0.5) / 1e6
           AS type_token_ratio,
       floor((log2(greatest(t, 1)) - s_clog / greatest(t, 1)) * 1e6 + 0.5)
           / 1e6 AS entropy_bits,
       floor((1.0 + n / s_ln) * 1e6 + 0.5) / 1e6 AS zipf_alpha
FROM agg"""


def dedup_incremental_sql(mod: int = 2) -> str:
    """Oracle for dedup.dedup_incremental: NOT EXISTS anti-join on the
    content md5 between the incoming and baseline slices."""
    m = int(mod)
    return f"""WITH h AS (SELECT doc_id, md5(text) AS text_md5,
                  doc_id % {m} <> 0 AS is_new FROM documents)
SELECT n.doc_id, n.text_md5
FROM h n
WHERE n.is_new AND NOT EXISTS (
  SELECT 1 FROM h b WHERE NOT b.is_new AND b.text_md5 = n.text_md5)"""


def order_count_distribution_sql(excl_priority: str = "1-URGENT") -> str:
    """Oracle for relational.order_count_distribution (TPC-H Q13): left
    outer count per customer (priority exclusion in place of the
    comment filter the testdata lacks), then the count-of-counts."""
    return f"""WITH o AS (
  SELECT o_custkey, COUNT(*) AS cnt FROM orders
  WHERE o_orderpriority <> '{excl_priority}' GROUP BY o_custkey),
per_cust AS (
  SELECT c.c_custkey, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""


def suppliers_kept_waiting_sql(region: str = "EUROPE",
                               late_days: int = 1400,
                               k: int = 100) -> str:
    """Oracle for relational.suppliers_kept_waiting (TPC-H Q21): the
    exists/not-exists pair expressed on the (orderkey, suppkey,
    max shipdate) reduction — identical integer-microsecond lateness
    rule, identical (numwait DESC, s_name ASC) order."""
    return f"""WITH f AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS mx
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
j AS (
  SELECT f.l_orderkey, f.l_suppkey,
         (f.mx > o.o_orderdate + INTERVAL {int(late_days)} DAY) AS late
  FROM f JOIN orders o ON o.o_orderkey = f.l_orderkey
  WHERE o.o_orderstatus = 'F'),
per AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late
  FROM j GROUP BY l_orderkey),
q AS (
  SELECT j.l_suppkey FROM j JOIN per USING (l_orderkey)
  WHERE j.late AND per.n_supp >= 2 AND per.n_late = 1)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM q
JOIN supplier s ON s.s_suppkey = q.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region}'
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC
LIMIT {int(k)}"""


def idle_customer_balance_sql(
        nation_keys: tuple = (0, 1, 2, 3, 4, 5, 6),
        since: str = "2000-01-01") -> str:
    """Oracle for relational.idle_customer_balance (TPC-H Q22): the
    identical integer cross-multiplied above-average rule + NOT EXISTS
    anti-join against orders placed since the cutoff, totals in exact
    cents."""
    keys = ", ".join(str(int(x)) for x in sorted(nation_keys))
    return f"""WITH pool AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer
  WHERE c_nationkey IN ({keys}) AND c_acctbal > 0.0),
stats AS (SELECT SUM(bal_c) AS total_c, COUNT(*) AS n FROM pool),
idle AS (
  SELECT p.c_nationkey, p.bal_c FROM pool p, stats
  WHERE p.bal_c * stats.n > stats.total_c
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = p.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{since}'))
SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(i.bal_c) AS BIGINT) AS totacctbal_c
FROM idle i JOIN nation n ON n.n_nationkey = i.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name"""


def split_leakage_sql(w: int = 8, val_frac: float = 0.1,
                      test_frac: float = 0.1, salt: str = "split") -> str:
    """Oracle for filters.split_leakage: the identical salted md5-prefix
    split rule, exact gram STRINGS (the Ray side matches 64-bit gram
    hashes — this gate pins the no-collision stance), distinct leaked
    docs per eval split."""
    from .sample import _threshold_hex

    t_test = _threshold_hex(test_frac)
    t_val = _threshold_hex(test_frac + val_frac)
    return f"""WITH tagged AS (
  SELECT doc_id, text,
         CASE WHEN substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{t_test}' THEN 'test'
              WHEN substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 4)
                   < '{t_val}' THEN 'val'
              ELSE 'train' END AS split
  FROM documents),
wtoks AS (
  SELECT doc_id, split,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS w
  FROM tagged),
gpos AS (SELECT doc_id, split, w,
                unnest(generate_series(1, greatest(len(w) - {w - 1}, 0)))
                    AS i
         FROM wtoks),
gr AS (SELECT DISTINCT doc_id, split,
              array_to_string(w[i:i+{w - 1}], ' ') AS g
       FROM gpos),
tr AS (SELECT DISTINCT g FROM gr WHERE split = 'train'),
leaked AS (SELECT DISTINCT doc_id, split FROM gr
           WHERE split <> 'train' AND g IN (SELECT g FROM tr)),
counts AS (
  SELECT s.split, COUNT(t.doc_id) AS n
  FROM (VALUES ('test'), ('val')) s(split)
  LEFT JOIN tagged t ON t.split = s.split
  GROUP BY s.split)
SELECT c.split, CAST(c.n AS BIGINT) AS n_docs,
       CAST(COALESCE(l.n, 0) AS BIGINT) AS n_leaked
FROM counts c
LEFT JOIN (SELECT split, COUNT(*) AS n FROM leaked GROUP BY split) l
       USING (split)
ORDER BY split"""


def epoch_shuffle_sql(epoch: int = 1, shard_size: int = 100,
                      salt: str = "epoch") -> str:
    """Oracle for sample.epoch_shuffle: the identical salted md5 epoch
    key as one window rank (the engine computes the same rank with a
    bucket histogram + one bounded-bucket exchange instead of a global
    sort)."""
    return f"""SELECT doc_id,
       CAST(row_number() OVER (
            ORDER BY md5('{salt}{int(epoch)}:' || CAST(doc_id AS VARCHAR)),
                     doc_id) - 1 AS BIGINT) AS pos,
       CAST((row_number() OVER (
            ORDER BY md5('{salt}{int(epoch)}:' || CAST(doc_id AS VARCHAR)),
                     doc_id) - 1) // {int(shard_size)} AS BIGINT) AS shard
FROM documents"""


def _bm25_ranked_sql(k: int, candidate_where: str = "",
                     grouped_by_lang: bool = False,
                     alive_where: str = "") -> str:
    """Shared BM25 rank stack for the serving-side oracle family
    (filtered / tombstoned / grouped / compacted): the
    :func:`search_topk_sql` scoring CTEs with an optional candidate
    restriction applied BEFORE ranking (collection stats stay
    corpus-global — what serving a full index through a candidate mask
    computes), optional per-lang rank partitioning, and an optional
    ``alive_where`` that restricts the CORPUS ITSELF (a shadowing
    ``documents`` CTE, so df/idf/avgdl/n_docs are recomputed over the
    survivors — what physical compaction computes). One definition — a
    scoring fix applies everywhere."""
    cfg = BuildConfig()
    rows, _ = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    where = f"WHERE {candidate_where}" if candidate_where else ""
    src = "alive_docs" if alive_where else "documents"
    alive = (f"alive_docs AS (SELECT * FROM documents WHERE {alive_where}),\n"
             if alive_where else "")
    if grouped_by_lang:
        ranked = """ranked AS (
    SELECT s.query_id, d.lang, s.doc_id, s.s,
           row_number() OVER (PARTITION BY s.query_id, d.lang
                              ORDER BY s.s DESC, s.doc_id ASC) AS rank
    FROM scores s JOIN documents d USING (doc_id)
)"""
        select = ("SELECT CAST(query_id AS BIGINT) AS query_id, lang,\n"
                  "       CAST(rank AS BIGINT) AS rank, doc_id, "
                  "ROUND(s, 6) AS score")
        tail = f"FROM ranked WHERE rank <= {k}\nORDER BY query_id, lang, rank"
    else:
        ranked = """ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)"""
        select = ("SELECT CAST(query_id AS BIGINT) AS query_id, "
                  "CAST(rank AS BIGINT) AS rank,\n"
                  "       doc_id, ROUND(s, 6) AS score")
        tail = f"FROM ranked WHERE rank <= {k}"
    return f"""WITH {alive}{tok_cte(src)},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM {src}) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM {src}) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    {where}
    GROUP BY q.query_id, tf.doc_id
),
{ranked}
{select}
{tail}"""


def search_topk_filtered_sql(lang: str | None = None,
                             k: int = 10) -> str:
    """Oracle for search_docs.search_topk_filtered: the shared BM25
    stack with candidates restricted to docs of ``lang`` (default:
    the pipeline's own FILTER_LANG) before ranking."""
    from .search_docs import FILTER_LANG

    lang = FILTER_LANG if lang is None else lang
    return _bm25_ranked_sql(
        k, candidate_where=("tf.doc_id IN (SELECT doc_id FROM documents "
                            f"WHERE lang = '{lang}')"))


def search_topk_tombstoned_sql(mod: int | None = None,
                               k: int = 10) -> str:
    """Oracle for search_docs.search_topk_tombstoned: the shared BM25
    stack with candidates restricted to NON-deleted docs (default
    delete set: the pipeline's own TOMB_MOD rule) while collection
    statistics keep the deleted docs — the tombstone contract."""
    from .search_docs import TOMB_MOD

    mod = TOMB_MOD if mod is None else int(mod)
    return _bm25_ranked_sql(k, candidate_where=f"tf.doc_id % {mod} <> 0")


def search_topk_compacted_sql(mod: int | None = None,
                              k: int = 10) -> str:
    """Oracle for search_docs.search_topk_compacted: the shared BM25
    stack over the CORPUS RESTRICTED to alive docs — df/idf/avgdl/
    n_docs recomputed over the survivors, what physical reclaim
    (compact_index) converges the statistics to. Contrast with the
    tombstoned oracle, which keeps stats corpus-global."""
    from .search_docs import TOMB_MOD

    mod = TOMB_MOD if mod is None else int(mod)
    return _bm25_ranked_sql(k, alive_where=f"doc_id % {mod} <> 0")


def search_topk_grouped_sql(k: int = 3) -> str:
    """Oracle for search_docs.search_topk_grouped: the shared BM25
    stack ranked per (query, lang)."""
    return _bm25_ranked_sql(k, grouped_by_lang=True)


def logreg_train_sql(dims: int = 64, iters: int = 5, lr: float = 0.5,
                     pos_lang: str = "en") -> str:
    """Oracle for classifier.logreg_train: the full-batch GD recurrence
    unrolled as chained CTEs — identical md5 feature-hash rule,
    identical floor(x·1e9+0.5)/1e9 rounding of each gradient and weight
    update, so both engines iterate on identical doubles."""
    D = int(dims)
    its = []
    for i in range(1, int(iters) + 1):
        its.append(f"""z{i} AS (
    SELECT f.doc_id, SUM(w.v * f.x) AS z
    FROM feat f JOIN w{i - 1} w USING (j) GROUP BY f.doc_id
),
g{i} AS (
    SELECT f.j,
           floor(SUM((1.0 / (1.0 + exp(-z.z)) - lab.y) * f.x)
                 / (SELECT v FROM nn) * 1e9 + 0.5) / 1e9 AS g
    FROM feat f JOIN z{i} z USING (doc_id) JOIN lab USING (doc_id)
    GROUP BY f.j
),
w{i} AS (
    SELECT w.j,
           floor((w.v - {float(lr)} * COALESCE(g.g, 0.0)) * 1e9 + 0.5)
               / 1e9 AS v
    FROM w{i - 1} w LEFT JOIN g{i} g USING (j)
)""")
    chain = ",\n".join(its)
    return f"""WITH {_word_toks_cte()},
ft AS (SELECT doc_id, unnest(w) AS term FROM wtoks),
ntk AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS n FROM wtoks),
bct AS (SELECT doc_id,
               CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % {D} AS j,
               CAST(COUNT(*) AS DOUBLE) AS c
        FROM ft GROUP BY doc_id, j),
feat AS (
    SELECT b.doc_id, b.j, b.c / ntk.n AS x
    FROM bct b JOIN ntk USING (doc_id) WHERE ntk.n > 0
    UNION ALL
    SELECT doc_id, {D} AS j, 1.0 AS x FROM documents),
lab AS (SELECT doc_id,
               CASE WHEN lang = '{pos_lang}' THEN 1.0 ELSE 0.0 END AS y
        FROM documents),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM documents),
w0 AS (SELECT unnest(range({D + 1})) AS j, 0.0 AS v),
{chain}
SELECT CAST(j AS BIGINT) AS dim, v AS weight
FROM w{int(iters)} ORDER BY dim"""


def nation_trade_volume_sql(nation_a: int = 1, nation_b: int = 2,
                            date_lo: str = "1995-01-01",
                            date_hi: str = "1997-01-01") -> str:
    """Oracle for relational.nation_trade_volume (TPC-H Q7): identical
    integer cents grid, both shipping directions, cross-nation only."""
    na, nb = int(nation_a), int(nation_b)
    return f"""SELECT s.s_nationkey AS supp_nation,
       c.c_nationkey AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
            AS BIGINT) AS revenue_c
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE s.s_nationkey IN ({na}, {nb})
  AND c.c_nationkey IN ({na}, {nb})
  AND s.s_nationkey <> c.c_nationkey
  AND l.l_shipdate >= TIMESTAMP '{date_lo}'
  AND l.l_shipdate < TIMESTAMP '{date_hi}'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def discounted_revenue_sql(clauses: tuple | None = None) -> str:
    """Oracle for relational.discounted_revenue (TPC-H Q19): the
    disjunction written directly, identical integer cents grid."""
    from .relational import DISCOUNT_CLAUSES

    cs = clauses or DISCOUNT_CLAUSES
    ors = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
        f"AND l.l_quantity BETWEEN {qlo} AND {qhi})"
        for (b, slo, shi, qlo, qhi) in cs)
    return f"""SELECT CAST(COALESCE(SUM(
    CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
    * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))), 0)
    AS BIGINT) AS revenue_c
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {ors}"""


def part_supplier_counts_sql(excl_brand: str = "Brand#1",
                             excl_type: str = "PROMO",
                             k: int = 20) -> str:
    """Oracle for relational.part_supplier_counts (TPC-H Q16 shape):
    the part↔supplier relation derived from lineitem, identical
    exclusions, deterministic top-k."""
    return f"""WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ok AS (
  SELECT ps.l_partkey, ps.l_suppkey FROM ps
  WHERE NOT EXISTS (SELECT 1 FROM supplier s
                    WHERE s.s_suppkey = ps.l_suppkey
                      AND s.s_acctbal < 0.0)),
cls AS (
  SELECT p.p_brand, p.p_type, p.p_size, ok.l_suppkey
  FROM ok JOIN part p ON p.p_partkey = ok.l_partkey
  WHERE p.p_brand <> '{excl_brand}' AND p.p_type <> '{excl_type}')
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM cls GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT {int(k)}"""


def order_priority_late_sql(late_days: int = 10,
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1996-07-01") -> str:
    """Oracle for relational.order_priority_late (TPC-H Q4): the EXISTS
    correlated on the outer row's own orderdate, identical lateness
    contract (strictly more than ``late_days`` past the order date)."""
    return f"""SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{date_lo}'
  AND o.o_orderdate < TIMESTAMP '{date_hi}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                    + INTERVAL {int(late_days)} DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


def promo_revenue_share_sql(promo_type: str = "PROMO",
                            date_lo: str = "1996-01-01",
                            date_hi: str = "1996-03-01") -> str:
    """Oracle for relational.promo_revenue_share (TPC-H Q14): identical
    integer 1e-4 revenue grid; the share divides the same two BIGINTs
    on the shared floor(x*1e6+0.5)/1e6 grid."""
    return f"""WITH rev AS (
  SELECT CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS r4,
         p.p_type = '{promo_type}' AS promo
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '{date_lo}'
    AND l.l_shipdate < TIMESTAMP '{date_hi}')
SELECT CAST(COALESCE(SUM(CASE WHEN promo THEN r4 END), 0) AS BIGINT)
         AS promo_revenue_c4,
       CAST(COALESCE(SUM(r4), 0) AS BIGINT) AS total_revenue_c4,
       floor(100.0 * COALESCE(SUM(CASE WHEN promo THEN r4 END), 0)
             / SUM(r4) * 1000000 + 0.5) / 1000000 AS promo_share
FROM rev"""


def top_supplier_revenue_sql(date_lo: str = "1996-01-01",
                             date_hi: str = "1996-04-01") -> str:
    """Oracle for relational.top_supplier_revenue (TPC-H Q15): the
    revenue view + global-max equality, ties kept, identical grid."""
    return f"""WITH revenue AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
              AS BIGINT) AS total_c4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{date_lo}'
    AND l_shipdate < TIMESTAMP '{date_hi}'
  GROUP BY l_suppkey)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       r.total_c4 AS total_revenue_c4
FROM supplier s JOIN revenue r ON r.l_suppkey = s.s_suppkey
WHERE r.total_c4 = (SELECT MAX(total_c4) FROM revenue)
ORDER BY s_suppkey"""


def nation_market_share_sql(nation: int = 1, region: str = "EUROPE",
                            p_type: str = "ECONOMY",
                            date_lo: str = "1995-01-01",
                            date_hi: str = "1997-01-01") -> str:
    """Oracle for relational.nation_market_share (TPC-H Q8): identical
    star join, integer 1e-4 revenue grid and floor-rounded share."""
    return f"""WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)) AS r4,
         s.s_nationkey = {int(nation)} AS is_nat
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_type = '{p_type}' AND r.r_name = '{region}'
    AND o.o_orderdate >= TIMESTAMP '{date_lo}'
    AND o.o_orderdate < TIMESTAMP '{date_hi}')
SELECT o_year,
       CAST(COALESCE(SUM(CASE WHEN is_nat THEN r4 END), 0) AS BIGINT)
         AS nation_revenue_c4,
       CAST(SUM(r4) AS BIGINT) AS total_revenue_c4,
       floor(COALESCE(SUM(CASE WHEN is_nat THEN r4 END), 0) * 1.0
             / SUM(r4) * 1000000 + 0.5) / 1000000 AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year"""


def product_profit_sql(name_prefix: str = "red") -> str:
    """Oracle for relational.product_profit (TPC-H Q9, retail-cost
    adaptation): profit = rev4 − retail_c·qty_c, every factor snapped
    to its own cents grid before the all-integer subtraction."""
    return f"""SELECT CAST(s.s_nationkey AS BIGINT) AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
         - CAST(floor(p.p_retailprice * 100 + 0.5) AS BIGINT)
           * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT))
       AS BIGINT) AS profit_c4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '{name_prefix}%'
GROUP BY 1, 2
ORDER BY 1, 2"""


def search_near_sql(queries: tuple | None = None) -> str:
    """Oracle for search_docs.search_near: per (a, b, window) query the
    min |pos_a − pos_b| per doc over the word-token positions (the
    filters family's tokenization, positions via the same
    generate_series indexing as the phrase oracle)."""
    from .search_docs import NEAR_QUERIES

    queries = queries or NEAR_QUERIES
    subs = []
    for a, b, w in queries:
        ea, eb = a.replace("'", "''"), b.replace("'", "''")
        label = f"{ea} ~{int(w)} {eb}"
        subs.append(f"""
SELECT '{label}' AS query, p1.doc_id,
       CAST(MIN(ABS(p1.pos - p2.pos)) AS BIGINT) AS dist
FROM tp p1 JOIN tp p2 USING (doc_id)
WHERE p1.term = '{ea}' AND p2.term = '{eb}'
GROUP BY p1.doc_id
HAVING MIN(ABS(p1.pos - p2.pos)) <= {int(w)}""")
    return f"""WITH {_word_toks_cte()},
tp AS (
    SELECT doc_id, i - 1 AS pos, w[i] AS term
    FROM wtoks, unnest(generate_series(1, len(w))) AS t(i)
)""" + "\nUNION ALL".join(subs)


def search_wildcard_sql(prefixes: tuple | None = None, k: int = 10) -> str:
    """Oracle for search_docs.search_wildcard: the full BM25 stack with
    each query's term set EXPANDED in SQL (df terms LIKE 'p%') — the
    same vocabulary the engine expands from its global lexicon."""
    from .search_docs import WILDCARD_QUERIES

    prefixes = prefixes or WILDCARD_QUERIES
    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    pre_rows = ", ".join(
        f"({qi}, '{p.replace(chr(39), chr(39) * 2)}')"
        for qi, p in enumerate(prefixes))
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q AS (SELECT p.query_id, df.term
      FROM (VALUES {pre_rows}) p(query_id, pre)
      JOIN df ON df.term LIKE p.pre || '%'),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {k}"""


def search_bm25_prox_sql(n_cand: int = 30, k: int = 10,
                         bonus: float = 0.5) -> str:
    """Oracle for search_docs.search_bm25_prox: the full BM25 stack,
    candidates = top-``n_cand`` per query, min pair distance over the
    index-tokenization positions, final = s + bonus/(1+mind) on the
    shared floor(x*1e6+0.5)/1e6 grid."""
    cfg = BuildConfig()
    rows, _ = _query_values()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    cls = _regex_class().replace("'", "''")
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q(query_id, term) AS (VALUES {rows}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
cand AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
),
itoks AS (
    SELECT doc_id,
           string_split_regex(trim(regexp_replace(lower(text),
                                                  '{cls}', ' ', 'g')),
                              ' +') AS w
    FROM documents
),
tp AS (
    SELECT doc_id, i - 1 AS pos, w[i] AS term
    FROM itoks, unnest(generate_series(1, len(w))) AS t(i)
    WHERE w[i] <> ''
),
prox AS (
    SELECT c.query_id, c.doc_id, MIN(ABS(p1.pos - p2.pos)) AS mind
    FROM cand c
    JOIN q qa ON qa.query_id = c.query_id
    JOIN q qb ON qb.query_id = c.query_id AND qa.term < qb.term
    JOIN tp p1 ON p1.doc_id = c.doc_id AND p1.term = qa.term
    JOIN tp p2 ON p2.doc_id = c.doc_id AND p2.term = qb.term
    WHERE c.rank <= {int(n_cand)}
    GROUP BY 1, 2
),
final AS (
    SELECT c.query_id, c.doc_id,
           c.s + COALESCE({bonus} / (1 + p.mind), 0.0) AS f
    FROM cand c LEFT JOIN prox p USING (query_id, doc_id)
    WHERE c.rank <= {int(n_cand)}
),
ranked AS (
    SELECT query_id, doc_id, f,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY f DESC, doc_id ASC) AS rank
    FROM final
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, floor(f * 1000000 + 0.5) / 1000000 AS score
FROM ranked WHERE rank <= {int(k)}"""


def search_fuzzy_sql(queries: tuple | None = None, k: int = 10,
                     max_dist: int = 1) -> str:
    """Oracle for search_docs.search_fuzzy: the full BM25 stack with
    each query's term set EXPANDED in SQL — every vocabulary term
    within ``levenshtein <= max_dist`` of any query word (DISTINCT:
    two words expanding to the same term score it once, like the
    engine's deduped token list)."""
    from .search_docs import FUZZY_SEARCH_QUERIES

    queries = queries or FUZZY_SEARCH_QUERIES
    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    w_rows = ", ".join(
        f"({qi}, '{w.replace(chr(39), chr(39) * 2)}')"
        for qi, q in enumerate(queries) for w in sorted(set(q.split())))
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
q AS (SELECT DISTINCT w.query_id, df.term
      FROM (VALUES {w_rows}) w(query_id, word)
      JOIN df ON levenshtein(w.word, df.term) <= {int(max_dist)}),
scores AS (
    SELECT q.query_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    GROUP BY q.query_id, tf.doc_id
),
ranked AS (
    SELECT query_id, doc_id, s,
           row_number() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {int(k)}"""


def knn_mmr_sql(n_queries: int = 4, n_cand: int = 16, k: int = 5) -> str:
    """Oracle for similarity.knn_mmr: the greedy MMR loop UNROLLED to
    ``k`` CTE stages. All comparisons happen on the shared integer
    micro-grid (rel/sim = floor(cos·1e6 + 0.5); λ = 0.7 as the exact
    integer rule score10 = 7·rel − 3·max_sim), so every pick and tie
    matches the engine bit-for-bit."""
    steps = []
    for i in range(2, int(k) + 1):
        steps.append(f"""sel{i} AS (
    SELECT c.query_id, c.vec_id, c.rel,
           7*c.rel - 3*MAX(p.sim) AS score10
    FROM cand c
    JOIN pair p ON p.query_id = c.query_id AND p.va = c.vec_id
    JOIN picked{i-1} s ON s.query_id = p.query_id AND s.vec_id = p.vb
    LEFT JOIN picked{i-1} x
           ON x.query_id = c.query_id AND x.vec_id = c.vec_id
    WHERE x.vec_id IS NULL
    GROUP BY c.query_id, c.vec_id, c.rel
    QUALIFY row_number() OVER (PARTITION BY c.query_id
                               ORDER BY (7*c.rel - 3*MAX(p.sim)) DESC,
                                        c.vec_id ASC) = 1
),
picked{i} AS (
    SELECT * FROM picked{i-1}
    UNION ALL
    SELECT query_id, vec_id, rel, score10, {i} AS rank FROM sel{i}
)""")
    chain = ",\n".join(steps)
    return f"""WITH q AS (
    SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id < {int(n_queries)}
),
sims AS (
    SELECT q.query_id, e.vec_id,
           CAST(floor(list_cosine_similarity(q.qe,
                CAST(e.embedding AS DOUBLE[])) * 1e6 + 0.5) AS BIGINT) AS rel
    FROM q CROSS JOIN embeddings e
),
cand AS (
    SELECT query_id, vec_id, rel FROM sims
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, vec_id ASC) <= {int(n_cand)}
),
ce AS (
    SELECT c.query_id, c.vec_id, CAST(e.embedding AS DOUBLE[]) AS emb
    FROM cand c JOIN embeddings e USING (vec_id)
),
pair AS (
    SELECT a.query_id, a.vec_id AS va, b.vec_id AS vb,
           CAST(floor(list_cosine_similarity(a.emb, b.emb) * 1e6 + 0.5)
                AS BIGINT) AS sim
    FROM ce a JOIN ce b ON a.query_id = b.query_id
),
picked1 AS (
    SELECT query_id, vec_id, rel, 7*rel AS score10, 1 AS rank FROM cand
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY rel DESC, vec_id ASC) = 1
),
{chain}
SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id, score10
FROM picked{int(k)}"""


def integrity_check_sql() -> str:
    """Oracle for relational.integrity_check: per-constraint FK anti-join
    counts and duplicate-key counts, one UNION ALL branch per declared
    constraint (same declarations, same order-insensitive rows)."""
    from .relational import INTEGRITY_FKS, INTEGRITY_UNIQUES

    branches = []
    for child, ckey, parent, pkey in INTEGRITY_FKS:
        branches.append(f"""SELECT '{child}.{ckey}->{parent}.{pkey}' AS check_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} c
        LEFT JOIN (SELECT DISTINCT {pkey} FROM {parent}) p
               ON c.{ckey} = p.{pkey}
        WHERE p.{pkey} IS NULL) AS violations""")
    for table, key in INTEGRITY_UNIQUES:
        branches.append(f"""SELECT '{table}.{key} unique' AS check_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {table}) AS n,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM
          (SELECT {key} FROM {table} GROUP BY {key}
           HAVING COUNT(*) > 1)) AS violations""")
    return "\nUNION ALL\n".join(branches)


def search_more_like_this_sql(seed_ids: tuple | None = None,
                              m_terms: int = 5, k: int = 10) -> str:
    """Oracle for search_docs.search_more_like_this: per seed doc, the
    top-m TF-IDF terms on the shared 6 dp grid (ties → term ASC) run as
    a disjunctive BM25 query with the seed anti-joined out of its own
    results — ONE statement for selection + retrieval."""
    from .search_docs import MLT_SEED_IDS

    seed_ids = seed_ids or MLT_SEED_IDS
    cfg = BuildConfig()
    expr = _bm25_score_expr(cfg.bm25_k1, cfg.bm25_b)
    seeds = ", ".join(f"({int(s)})" for s in sorted(set(seed_ids)))
    return f"""WITH {tok_cte()},
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT COUNT(*) FROM toks) * 1.0
                   / (SELECT COUNT(*) FROM documents) AS avgdl),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY term),
seeds(seed_id) AS (VALUES {seeds}),
cand AS (
    SELECT s.seed_id, tf.term,
           floor(tf.tf * log2((SELECT n_docs FROM stats) / df.df)
                 * 1e6 + 0.5) / 1e6 AS w
    FROM seeds s
    JOIN tf ON tf.doc_id = s.seed_id
    JOIN df ON df.term = tf.term),
q AS (
    SELECT seed_id, term FROM (
        SELECT seed_id, term,
               row_number() OVER (PARTITION BY seed_id
                                  ORDER BY w DESC, term ASC) AS rn
        FROM cand) WHERE rn <= {int(m_terms)}),
scores AS (
    SELECT q.seed_id, tf.doc_id, SUM({expr}) AS s
    FROM q
    JOIN tf ON tf.term = q.term
    JOIN df ON df.term = q.term
    JOIN dl ON dl.doc_id = tf.doc_id, stats
    WHERE tf.doc_id <> q.seed_id
    GROUP BY q.seed_id, tf.doc_id),
ranked AS (
    SELECT seed_id, doc_id, s,
           row_number() OVER (PARTITION BY seed_id
                              ORDER BY s DESC, doc_id ASC) AS rank
    FROM scores)
SELECT CAST(seed_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= {int(k)}"""


def curriculum_order_sql() -> str:
    """Oracle for sample.curriculum_order: global row_number over
    (distinct-token-ratio quality DESC, doc_id ASC) on the shared 6 dp
    grid — the same quality expression as quality_score_sql."""
    return f"""WITH {tok_cte()},
per AS (
    SELECT doc_id, COUNT(*) AS n_tok, COUNT(DISTINCT term) AS n_dis
    FROM toks GROUP BY doc_id
),
q AS (
    SELECT d.doc_id,
           floor(COALESCE(p.n_dis * 1.0 / p.n_tok, 0.0) * 1000000 + 0.5)
             / 1000000 AS quality
    FROM documents d LEFT JOIN per p USING (doc_id)
)
SELECT CAST(row_number() OVER (ORDER BY quality DESC, doc_id ASC)
            AS BIGINT) AS rank,
       doc_id, quality
FROM q"""


def shipment_priority_sql(late_days: int = 60,
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1998-01-01") -> str:
    """Oracle for relational.shipment_priority (TPC-H Q12): identical
    lateness contract (strictly more than ``late_days`` past the order
    date) and high-priority set."""
    return f"""SELECT l_linestatus,
       CAST(COALESCE(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS high_line_count,
       CAST(COALESCE(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END), 0) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{date_lo}'
  AND l.l_shipdate < TIMESTAMP '{date_hi}'
  AND l.l_shipdate > o.o_orderdate + INTERVAL {int(late_days)} DAY
GROUP BY l_linestatus
ORDER BY l_linestatus"""


def doc_similarity_pairs_sql(threshold: float = 0.6,
                             max_df_frac: float = 0.05) -> str:
    """Oracle for embed.doc_similarity_pairs: identical df cap (both
    engines floor the same double product), identical tf·log2(N/df)
    weights, norms over the capped vocabulary, dots via the term
    self-join, cosine compared on the shared 6 dp floor grid."""
    return f"""WITH {tok_cte()},
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY doc_id, term
),
dfs AS (
    SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks GROUP BY term
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
              GREATEST(16, CAST(floor(COUNT(*) * {max_df_frac}) AS BIGINT))
                  AS max_df
       FROM documents),
w AS (
    SELECT t.doc_id, t.term, t.tf * log2((SELECT n FROM nn) / d.df) AS w
    FROM tf t JOIN dfs d USING (term)
    WHERE d.df <= (SELECT max_df FROM nn)
),
norms AS (
    SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
),
dots AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, SUM(x.w * y.w) AS dot
    FROM w x JOIN w y USING (term)
    WHERE x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b,
       floor(dot / (na.nrm * nb.nrm) * 1000000 + 0.5) / 1000000 AS cosine
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE floor(dot / (na.nrm * nb.nrm) * 1000000 + 0.5) / 1000000
      >= {threshold}"""


def session_duration_quantiles_sql(gap_s: int = 1800,
                                   qs: tuple = (0.25, 0.5, 0.75,
                                                0.9, 0.99)) -> str:
    """Oracle for events.session_duration_quantiles: the sessionize CTE
    chain + per-session MAX(t)−MIN(t) + quantile_cont (the identical
    linear-interpolation rule the histogram pass evaluates)."""
    cols = ",\n       ".join(
        # CAST, not *1.0: DECIMAL would truncate the interpolation scale
        f"floor(quantile_cont(CAST(dur AS DOUBLE), {q}) * 1e6 + 0.5) / 1e6 "
        f"AS p{int(q * 100)}"
        for q in qs)
    return f"""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t FROM events),
o AS (SELECT user_id, t, lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
s AS (SELECT user_id, t,
             CASE WHEN pt IS NULL OR t - pt > {gap_s} THEN 1 ELSE 0 END AS ns
      FROM o),
g AS (SELECT user_id, t,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM s),
d AS (SELECT user_id, sid, MAX(t) - MIN(t) AS dur FROM g GROUP BY user_id, sid)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       {cols}
FROM d"""


def containment_pairs_sql(shingle: int = 3, thr_num: int = 4,
                          thr_den: int = 5,
                          max_df_frac: float = 0.05) -> str:
    """Oracle for dedup.containment_pairs: exact string-shingle
    containment with the identical df cap (common counted over capped
    shingles; set sizes uncapped) and integer threshold — pins the Ray
    side's 64-bit-hash no-collision stance like ngram_jaccard."""
    k = shingle
    pad_empty = "'" + " " * (k - 1) + "'"
    return f"""
WITH tl AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '[ \t\n\r\x0b\x0c]+'),
                       x -> x <> '') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id,
        CASE
            WHEN len(toks) = 0 THEN [{pad_empty}]
            WHEN len(toks) < {k} THEN
                [array_to_string(toks, ' ') || repeat(' ', {k} - len(toks))]
            ELSE list_distinct(list_transform(range(1, len(toks) - {k} + 2),
                     i -> array_to_string(toks[i : i + {k - 1}], ' ')))
        END AS s
    FROM tl
),
nn AS (SELECT GREATEST(16, CAST(floor(COUNT(*) * {max_df_frac}) AS BIGINT))
           AS max_df FROM documents),
ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
dfs AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g),
keep AS (SELECT ex.doc_id, ex.g FROM ex JOIN dfs USING (g)
         WHERE df >= 2 AND df <= (SELECT max_df FROM nn)),
pairs AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM keep x JOIN keep y ON x.g = y.g AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b, n_common,
       CAST(len(sa.s) AS BIGINT) AS n_a, CAST(len(sb.s) AS BIGINT) AS n_b
FROM pairs
JOIN sh sa ON sa.doc_id = doc_a
JOIN sh sb ON sb.doc_id = doc_b
WHERE n_common * {thr_den} >= {thr_num} * LEAST(len(sa.s), len(sb.s))"""


def part_recommendations_sql(k: int = 5, min_co: int = 2) -> str:
    """Oracle for graph.part_recommendations: item-item cosine over
    binary order-incidence vectors, identical support cut, rank on the
    shared 6 dp floor grid (the inputs are the same exact integers, so
    the doubles agree even unrounded)."""
    return f"""WITH po AS (
    SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS np FROM po GROUP BY p),
co AS (
    SELECT x.p AS a, y.p AS b, CAST(COUNT(*) AS BIGINT) AS co
    FROM po x JOIN po y ON x.o = y.o AND x.p < y.p
    GROUP BY x.p, y.p
    HAVING COUNT(*) >= {int(min_co)}),
dir AS (SELECT a AS src, b AS dst, co FROM co
        UNION ALL SELECT b, a, co FROM co),
sc AS (
    SELECT src, dst,
           floor(co / sqrt(CAST(ns.np * nd.np AS DOUBLE)) * 1000000 + 0.5)
               / 1000000 AS score
    FROM dir JOIN n ns ON ns.p = src JOIN n nd ON nd.p = dst),
r AS (
    SELECT src, dst, score,
           row_number() OVER (PARTITION BY src
                              ORDER BY score DESC, dst ASC) AS rank
    FROM sc)
SELECT CAST(src AS BIGINT) AS part_key, CAST(dst AS BIGINT) AS rec_part,
       CAST(rank AS BIGINT) AS rank, score
FROM r WHERE rank <= {int(k)}"""


def search_hit_counts_sql() -> str:
    """Oracle for search_docs.search_hit_counts: exact OR / AND match
    counts per query — COUNT over docs matching ≥1 / all query terms
    (identical Python-normalizer query tokenization via _query_values);
    queries with no hits keep a zero row via the id scaffold."""
    rows, per_q = _query_values()
    ids = ", ".join(f"({qi})" for qi in per_q)
    return f"""WITH {tok_cte()},
dt AS (SELECT DISTINCT doc_id, term FROM toks),
q(query_id, term) AS (VALUES {rows}),
qt AS (SELECT query_id, CAST(COUNT(DISTINCT term) AS BIGINT) AS nt
       FROM q GROUP BY query_id),
m AS (
    SELECT q.query_id, dt.doc_id,
           CAST(COUNT(DISTINCT q.term) AS BIGINT) AS nmatch
    FROM q JOIN dt ON dt.term = q.term
    GROUP BY q.query_id, dt.doc_id),
agg AS (
    SELECT m.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_or,
           CAST(COALESCE(SUM(CASE WHEN m.nmatch = qt.nt
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_and
    FROM m JOIN qt USING (query_id)
    GROUP BY m.query_id),
ids(query_id) AS (VALUES {ids})
SELECT CAST(ids.query_id AS BIGINT) AS query_id,
       COALESCE(agg.n_or, 0) AS n_or,
       COALESCE(agg.n_and, 0) AS n_and
FROM ids LEFT JOIN agg ON agg.query_id = ids.query_id
ORDER BY ids.query_id"""


def term_df_drift_sql(k: int = 20, add_mod: int = 13, add_res: int = 3,
                      rm_res: int = 7, chg_mod: int = 11,
                      chg_res: int = 4) -> str:
    """Oracle for text_stats.term_df_drift: the corpus_diff version
    carve + per-side COUNT(DISTINCT doc_id) + the identical add-one
    log2 ratio on the shared 6 dp grid, ties → term ASC."""
    cls = _regex_class().replace("'", "''")
    drift = ("floor(abs(log2((COALESCE(n.df, 0) + 1.0) "
             "/ (COALESCE(o.df, 0) + 1.0))) * 1000000 + 0.5) / 1000000")
    return f"""WITH old_docs AS (
    SELECT doc_id, text FROM documents WHERE doc_id % {add_mod} <> {add_res}),
new_docs AS (
    SELECT doc_id,
           CASE WHEN doc_id % {chg_mod} = {chg_res}
                THEN text || ' [rev2]' ELSE text END AS text
    FROM documents WHERE doc_id % {add_mod} <> {rm_res}),
toks_old AS (
    SELECT doc_id, t.term
    FROM old_docs,
         unnest(string_split_regex(
             trim(regexp_replace(lower(text), '{cls}', ' ', 'g')),
             ' +')) AS t(term)
    WHERE t.term <> ''),
toks_new AS (
    SELECT doc_id, t.term
    FROM new_docs,
         unnest(string_split_regex(
             trim(regexp_replace(lower(text), '{cls}', ' ', 'g')),
             ' +')) AS t(term)
    WHERE t.term <> ''),
df_old AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks_old GROUP BY term),
df_new AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks_new GROUP BY term)
SELECT COALESCE(o.term, n.term) AS term,
       COALESCE(o.df, 0) AS df_old,
       COALESCE(n.df, 0) AS df_new,
       CASE WHEN COALESCE(n.df, 0) >= COALESCE(o.df, 0)
            THEN {drift} ELSE -({drift}) END AS drift
FROM df_old o FULL OUTER JOIN df_new n ON o.term = n.term
ORDER BY {drift} DESC, COALESCE(o.term, n.term) ASC
LIMIT {int(k)}"""


def revenue_trend_sql() -> str:
    """Oracle for relational.revenue_trend: exact-cents monthly sums,
    month index by dense calendar rank, identical closed-form OLS
    moments and 6 dp floor grid."""
    return """WITH m AS (
    SELECT CAST(date_part('year', o_orderdate) * 12
                + date_part('month', o_orderdate) AS BIGINT) AS ym,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS cents
    FROM orders GROUP BY 1),
r AS (SELECT cents,
             CAST(row_number() OVER (ORDER BY ym) - 1 AS BIGINT) AS t
      FROM m),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(cents) AS BIGINT) AS sy,
             CAST(SUM(t * cents) AS BIGINT) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM r),
f AS (SELECT n,
             CAST(n * sty - st * sy AS DOUBLE)
                 / CAST(n * stt - st * st AS DOUBLE) AS slope_c
      FROM s),
g AS (SELECT n, slope_c,
             (sy - slope_c * st) / CAST(n AS DOUBLE) AS intercept_c
      FROM f JOIN s USING (n))
SELECT n AS n_months,
       floor(slope_c / 100.0 * 1000000 + 0.5) / 1000000 AS slope,
       floor(intercept_c / 100.0 * 1000000 + 0.5) / 1000000 AS intercept,
       floor((intercept_c + slope_c * n) / 100.0 * 1000000 + 0.5)
           / 1000000 AS next_forecast
FROM g"""


def part_pagerank_seeded_sql(damping: float = 0.85, iters: int = 5,
                             seed_mod: int = 10) -> str:
    """Oracle for graph.part_pagerank_seeded: the personalized
    recurrence unrolled — teleport mass only to seed nodes
    (node % seed_mod == 0), identical init and per-iteration base."""
    seed_base = (f"CASE WHEN p.dst % {seed_mod} = 0 THEN "
                 f"(1 - {damping}) / (SELECT ns FROM nseed) ELSE 0 END")
    its = []
    for i in range(1, iters + 1):
        its.append(f"""r{i} AS (
    SELECT p.dst AS node,
           {seed_base}
           + {damping} * SUM(r.pr / d.deg) AS pr
    FROM pairs p
    JOIN r{i - 1} r ON r.node = p.src
    JOIN deg d ON d.src = p.src
    GROUP BY p.dst
)""")
    chain = ",\n".join(its)
    return f"""
WITH pairs AS (
    SELECT DISTINCT l1.l_partkey AS src, l2.l_partkey AS dst
    FROM lineitem l1
    JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                    AND l1.l_partkey <> l2.l_partkey
),
deg AS (
    SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM pairs GROUP BY src
),
nseed AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM deg
          WHERE src % {seed_mod} = 0),
r0 AS (SELECT src AS node,
              CASE WHEN src % {seed_mod} = 0
                   THEN 1.0 / (SELECT ns FROM nseed) ELSE 0 END AS pr
       FROM deg),
{chain}
SELECT node AS part_key, ROUND(pr, 10) AS pagerank FROM r{iters}
"""
