"""DuckDB oracle SQL for every queries() entry (the driver's t2 gate).

Each builder returns ANSI-ish SQL runnable by DuckDB 1.0 against the
pre-registered views (region nation customer supplier part orders lineitem
events documents embeddings). The SQL mirrors the Spark expressions in
functions/text.py and operators/* exactly — same semantics, same column
aliases, same float rounding — and is generated from the SAME catalog data
(catalogs.py), so markers/probes/benchmark literals cannot drift.

Dialect notes (vs Spark SQL):
- DuckDB regexp_replace needs the 'g' flag for global replacement.
- Boolean aggregates need CASE ... CAST(1 AS DOUBLE) (Spark casts bools).
- Numeric literals like 0.20 are DECIMAL in DuckDB — every score constant is
  ::DOUBLE to force double arithmetic like pyspark's F.lit(float).
- Lists are 1-indexed in both (element_at / l[i]).
"""

from __future__ import annotations

import math

from model_audit_spark.catalogs import (
    BENCHMARK_SAMPLES,
    BOOL_FEATURES,
    DLI_CERTAINTY_WORDS,
    DLI_HEDGING_WORDS,
    DLI_REFUSAL_PHRASES,
    FEATURE_RANGES,
    FINGERPRINT_DIMS,
    MARKER_CATEGORIES,
    NUMERIC_FEATURES,
    PROBES,
    REFUSAL_HINTS,
    REFUSAL_OPENERS,
    STYLE_MARKERS,
    STYLE_SIGNATURES,
    sql_quote,
    sql_str_array,
)

WORD_CHARS_SQL = r"[\p{L}\p{N}_]+"


def _strip(t: str) -> str:
    return (
        rf"regexp_replace(regexp_replace({t}, '^\s+', ''), '\s+$', '')"
    )


def _words(t: str) -> str:
    s = _strip(t)
    return (
        rf"CASE WHEN length({s}) = 0 THEN []::VARCHAR[] "
        rf"ELSE string_split_regex({s}, '\s+') END"
    )


def _sentence_count(t: str) -> str:
    inner = rf"string_split_regex({t}, '[.!?]+')"
    stripped = (
        rf"list_transform({inner}, x -> "
        rf"regexp_replace(regexp_replace(x, '^\s+', ''), '\s+$', ''))"
    )
    return rf"len(list_filter({stripped}, x -> x != ''))"


def _count_substr(col: str, needle: str) -> str:
    n = sql_quote(needle)
    return (
        f"(length({col}) - length(replace({col}, {n}, ''))) / {len(needle)}"
    )


def _contains_any(col: str, needles: list[str]) -> str:
    return "(" + " OR ".join(
        f"contains({col}, {sql_quote(n)})" for n in needles
    ) + ")"


def _tokens(t: str) -> str:
    return f"regexp_extract_all(lower({t}), '{WORD_CHARS_SQL}')"


def _bigrams(w: str) -> str:
    return (
        f"CASE WHEN len({w}) < 2 THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len({w})), "
        f"i -> {w}[i] || ' ' || {w}[i+1]) END"
    )


def _cjk(t: str) -> str:
    return (
        f"(length({t}) - length(regexp_replace({t}, '[一-鿿]', '', 'g')))"
    )


def _lang(t: str) -> str:
    return (
        f"CASE WHEN {_cjk(t)} >= 10 THEN 'zh' "
        f"WHEN {_cjk(t)} / greatest(length({t}), 1) > 0.15::DOUBLE THEN 'zh' "
        f"ELSE 'en' END"
    )


# ---------------------------------------------------------------------------
# llmmap per-response features — mirrors functions/text.py llmmap_feature_columns
# ---------------------------------------------------------------------------

def _llmmap_feats_cte(base: str, id_cols: str, text: str = "text") -> str:
    """CTE chain producing `feats` with id_cols + the 18 feature columns."""
    marker_exprs = []
    for cat, markers in STYLE_MARKERS.items():
        total = " + ".join(_count_substr("lo", m) for m in markers)
        marker_exprs.append(
            f"({total}) / greatest(len(w), 1) AS style_{cat}"
        )
    swr = " OR ".join(
        f"starts_with(lo, {sql_quote(p)})" for p in REFUSAL_OPENERS
    )
    return f"""
pre AS (
  SELECT {id_cols}, {text} AS t, lower({text}) AS lo,
         {_words(text)} AS w
  FROM {base}
),
feats AS (
  SELECT {id_cols},
    CAST(length(t) AS DOUBLE) AS length_chars,
    CAST(len(w) AS DOUBLE) AS length_words,
    CAST({_sentence_count('t')} AS DOUBLE) AS length_sentences,
    length(array_to_string(w, '')) / greatest(len(w), 1) AS avg_word_length,
    len(w) / greatest({_sentence_count('t')}, 1) AS avg_sentence_length,
    len(list_distinct(list_transform(w, x -> lower(x)))) / greatest(len(w), 1)
      AS unique_word_ratio,
    (length(t) - length(translate(t, '.,;:!?', ''))) / greatest(length(t), 1)
      AS punctuation_ratio,
    (length(t) - length(replace(t, chr(10), ''))) / greatest(length(t), 1)
      AS newline_ratio,
    regexp_matches(t, '(?m)^[\\s]*[-*•]\\s') AS has_bullet_points,
    regexp_matches(t, '(?m)^[\\s]*\\d+[.)]\\s') AS has_numbered_list,
    regexp_matches(t, '(?m)^#+\\s') AS has_markdown_headers,
    contains(t, '```') AS has_code_blocks,
    ({swr}) AS starts_with_refusal,
    {", ".join(marker_exprs)}
  FROM pre
)"""


def _fingerprint_cte(base: str, group: str) -> str:
    """`fp`: one row per group with the 18 averaged dims (A1)."""
    aggs = (
        [f"avg({k}) AS avg_{k}" for k in NUMERIC_FEATURES]
        + [
            f"avg(CASE WHEN {k} THEN CAST(1 AS DOUBLE) ELSE 0 END) AS ratio_{k}"
            for k in BOOL_FEATURES
        ]
        + [f"avg(style_{c}) AS style_{c}" for c in MARKER_CATEGORIES]
    )
    return f"""{_llmmap_feats_cte(base, group)},
fp AS (
  SELECT {group}, {", ".join(aggs)} FROM feats GROUP BY {group}
)"""


def _norm_dim(d: str, col: str) -> str:
    if d in FEATURE_RANGES:
        lo, hi = FEATURE_RANGES[d]
        return (
            f"greatest(0::DOUBLE, least(1::DOUBLE, "
            f"({col} - {lo}) / {hi - lo}))"
        )
    return col


# ---------------------------------------------------------------------------
# Style scoring — mirrors operators/detect.py style_scores
# ---------------------------------------------------------------------------

def _signatures_cte() -> str:
    rows = []
    for rank, (fam, markers, refusals, md, num, code, verb, lang) in enumerate(
        STYLE_SIGNATURES
    ):
        rows.append(
            f"({sql_quote(fam)}, {rank}, {sql_str_array(markers)}, "
            f"{sql_str_array(refusals)}, {str(md).lower()}, "
            f"{str(num).lower()}, {str(code).lower()}, {str(verb).lower()}, "
            f"{sql_quote(lang)})"
        )
    # 'verbose' is a reserved word in DuckDB -> verbose_flag
    return (
        "style_signatures(family, family_rank, markers, refusal_patterns, "
        "tends_markdown, tends_numbered_lists, tends_code_blocks, "
        "verbose_flag, lang) AS (VALUES " + ", ".join(rows) + ")"
    )


def _style_scores_ctes(base: str, id_col: str, text: str = "text") -> str:
    """CTE chain ending in `scores(id_col, family, family_rank, score)`."""
    hint = _contains_any("text_lower", REFUSAL_HINTS)
    return f"""{_signatures_cte()},
flags AS (
  SELECT {id_col},
    lower({text}) AS text_lower,
    {_lang(text)} AS text_lang,
    regexp_matches({text}, '(?m)^#+\\s') AS has_md,
    regexp_matches({text}, '(?m)^\\s*\\d+[.)]\\s') AS has_numbered,
    contains({text}, '```') AS has_code_blocks,
    len({_words(text)}) > 150 AS is_verbose,
    {hint} AS has_refusal_hint
  FROM {base}
),
scores AS (
  SELECT f.{id_col}, s.family, s.family_rank,
    round(
      (CASE WHEN f.text_lang = s.lang THEN 0.20::DOUBLE
            WHEN s.lang = 'both' THEN 0.10::DOUBLE ELSE 0::DOUBLE END)
      + least(len(list_filter(s.markers, m -> contains(f.text_lower, m)))
              / 3.0::DOUBLE, 1.0::DOUBLE) * 0.50::DOUBLE
      + (CASE WHEN f.has_md AND s.tends_markdown THEN 0.05::DOUBLE
              WHEN f.has_md AND NOT s.tends_markdown THEN -0.02::DOUBLE
              ELSE 0::DOUBLE END)
      + (CASE WHEN f.has_numbered AND s.tends_numbered_lists THEN 0.05::DOUBLE
              WHEN f.has_numbered AND NOT s.tends_numbered_lists
                THEN -0.02::DOUBLE ELSE 0::DOUBLE END)
      + (CASE WHEN f.has_code_blocks AND s.tends_code_blocks THEN 0.05::DOUBLE
              WHEN f.has_code_blocks AND NOT s.tends_code_blocks
                THEN -0.02::DOUBLE ELSE 0::DOUBLE END)
      + (CASE WHEN f.is_verbose AND s.verbose_flag THEN 0.05::DOUBLE
              WHEN f.is_verbose AND NOT s.verbose_flag THEN -0.02::DOUBLE
              ELSE 0::DOUBLE END)
      + (CASE WHEN f.has_refusal_hint THEN
           len(list_filter(s.refusal_patterns,
                           p -> contains(f.text_lower, p)))
           / greatest(len(s.refusal_patterns), 1) * 0.10::DOUBLE
         ELSE 0::DOUBLE END),
    4) AS score
  FROM flags f CROSS JOIN style_signatures s
)"""


def _detect_ctes(base: str, id_col: str, text: str = "text") -> str:
    """CTE chain ending in `detected(id, predicted_model, confidence)`."""
    return f"""{_style_scores_ctes(base, id_col, text)},
ranked AS (
  SELECT {id_col}, family, score,
         row_number() OVER (PARTITION BY {id_col}
                            ORDER BY score DESC, family_rank ASC) AS rn
  FROM scores
),
detected AS (
  SELECT {id_col}, family AS predicted_model, score AS confidence
  FROM ranked WHERE rn = 1
)"""


# ---------------------------------------------------------------------------
# Individual oracle queries
# ---------------------------------------------------------------------------

def q1_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_unshipped() -> str:
    return """
SELECT l.l_orderkey AS o_orderkey,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
  strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
  o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_regional_revenue() -> str:
    return """
SELECT n.n_name AS nation,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


def q_topk_customers() -> str:
    return """
SELECT c.c_custkey, c.c_name,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


def q_customers_no_orders() -> str:
    return """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


def q_urgent_customers() -> str:
    return """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q_rollup_revenue() -> str:
    return """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year, o_orderpriority,
  round(sum(o_totalprice), 2) AS revenue,
  count(*) AS n_orders
FROM orders
GROUP BY ROLLUP(order_year, o_orderpriority)
"""


def q_window_orders() -> str:
    return """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk,
  round(running_spend, 2) AS running_spend
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER w AS rk,
    sum(o_totalprice) OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC
                            ROWS UNBOUNDED PRECEDING) AS running_spend
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC)
)
WHERE rk <= 3
"""


def q_events_hourly() -> str:
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
  event_type,
  count(*) AS n_events,
  round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


def q_events_sessionize(gap_seconds: int = 1800) -> str:
    return f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR date_diff('second', prev_ts, ts) > {gap_seconds}
             THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  -- CAST: DuckDB window sum(int) yields HUGEINT, which the driver's pandas
  -- conversion turns into float64 ("3.0" vs Spark's "3") -> hash mismatch.
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  count(*) AS n_events,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  round(sum(value), 6) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


def detect_documents() -> str:
    return f"WITH {_detect_ctes('documents', 'doc_id')} SELECT * FROM detected"


def style_scores_long() -> str:
    return (
        f"WITH {_style_scores_ctes('documents', 'doc_id')} "
        "SELECT doc_id, family, score FROM scores"
    )


def style_fingerprint() -> str:
    """A4: mean per-family style score, rounded 4dp (style.py:342-354)."""
    return f"""
WITH {_style_scores_ctes('documents', 'doc_id')}
SELECT family, round(avg(score), 4) AS style_score
FROM scores GROUP BY family
"""


def detect_distribution() -> str:
    return f"""
WITH {_detect_ctes('documents', 'doc_id')}
SELECT predicted_model, count(*) AS n_texts,
  round(count(*) / (sum(count(*)) OVER ()) * 100.0::DOUBLE, 2) AS pct
FROM detected
GROUP BY predicted_model
"""


def streaming_source_verdict() -> str:
    """Batch twin of streaming.running_source_verdict's FINAL state: after
    the last micro-batch the per-source running verdict equals this
    majority/consistency aggregate over all rows (same catalog-order ties,
    same rounding order)."""
    return f"""
WITH {_detect_ctes('documents', 'doc_id')},
det_src AS (
  SELECT d.source, t.predicted_model, t.confidence
  FROM detected t JOIN documents d USING (doc_id)
),
fam_counts AS (
  SELECT ds.source, ds.predicted_model, count(*) AS cnt,
         min(s.family_rank) AS frank
  FROM det_src ds
  JOIN style_signatures s ON ds.predicted_model = s.family
  GROUP BY ds.source, ds.predicted_model
),
top_fam AS (
  SELECT source, predicted_model, cnt,
         row_number() OVER (PARTITION BY source
                            ORDER BY cnt DESC, frank ASC) AS rn
  FROM fam_counts
),
totals AS (
  SELECT source, count(*) AS n_texts,
         round(sum(confidence) / count(*), 4) AS mean_confidence
  FROM det_src GROUP BY source
)
SELECT t.source, t.n_texts, f.predicted_model,
       round(f.cnt / t.n_texts * 100.0::DOUBLE, 2) AS consistency_rate,
       t.mean_confidence
FROM totals t JOIN top_fam f ON t.source = f.source AND f.rn = 1
"""


def llmmap_features_documents() -> str:
    cols = (
        ["length_chars", "length_words", "length_sentences"]
        + [
            "round(avg_word_length, 6) AS avg_word_length",
            "round(avg_sentence_length, 6) AS avg_sentence_length",
            "round(unique_word_ratio, 6) AS unique_word_ratio",
            "round(punctuation_ratio, 6) AS punctuation_ratio",
            "round(newline_ratio, 6) AS newline_ratio",
        ]
        + BOOL_FEATURES
        + [f"round(style_{c}, 6) AS style_{c}" for c in MARKER_CATEGORIES]
    )
    return f"""
WITH {_llmmap_feats_cte('documents', 'doc_id')}
SELECT doc_id, {", ".join(cols)} FROM feats
"""


def llmmap_fingerprints_by_source() -> str:
    dims = [f"round({d}, 6) AS {d}" for d in FINGERPRINT_DIMS]
    return f"""
WITH {_fingerprint_cte('documents', 'source')}
SELECT source, {", ".join(dims)} FROM fp
"""


def llmmap_compare_sources() -> str:
    dot = " + ".join(
        f"{_norm_dim(d, f'a.{d}')} * {_norm_dim(d, f'b.{d}')}"
        for d in FINGERPRINT_DIMS
    )
    na = " + ".join(
        f"{_norm_dim(d, f'a.{d}')} * {_norm_dim(d, f'a.{d}')}"
        for d in FINGERPRINT_DIMS
    )
    nb = " + ".join(
        f"{_norm_dim(d, f'b.{d}')} * {_norm_dim(d, f'b.{d}')}"
        for d in FINGERPRINT_DIMS
    )
    return f"""
WITH {_fingerprint_cte('documents', 'source')},
pairs AS (
  SELECT a.source AS model_a, b.source AS model_b,
    CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 0::DOUBLE
         ELSE ({dot}) / (sqrt({na}) * sqrt({nb})) END AS sim
  FROM fp a JOIN fp b ON a.source < b.source
)
SELECT model_a, model_b, round(sim, 6) AS similarity,
  sim >= 0.85::DOUBLE AS is_derived,
  0.85::DOUBLE AS threshold,
  round(least(abs(sim - 0.85::DOUBLE) / 0.15::DOUBLE, 1.0::DOUBLE), 6)
    AS confidence
FROM pairs
"""


def _dli_dist_ctes(base: str = "documents", group: str = "source") -> str:
    return f"""
toks AS (
  SELECT {group}, {_tokens('text')} AS w FROM {base}
),
bg AS (
  SELECT {group}, unnest({_bigrams('w')}) AS ngram FROM toks
),
cnts AS (
  SELECT {group}, ngram, count(*) AS cnt FROM bg GROUP BY 1, 2
),
topn AS (
  SELECT * FROM (
    SELECT {group}, ngram, cnt,
      row_number() OVER (PARTITION BY {group}
                         ORDER BY cnt DESC, ngram ASC) AS rn
    FROM cnts
  ) WHERE rn <= 100
),
dist AS (
  SELECT {group}, ngram, cnt,
    cnt / (sum(cnt) OVER (PARTITION BY {group})) AS weight
  FROM topn
)"""


def dli_bigrams_by_source() -> str:
    """T2 first-seen tie-break: packed min(ord·2^20 + pos) like dli.py.

    DuckDB list_transform's two-arg lambda index is 1-based vs Spark
    posexplode's 0-based — order-isomorphic, so min-argmin agrees."""
    pos_cap = 1 << 20
    return f"""
WITH toks AS (
  SELECT source, doc_id, {_tokens('text')} AS w FROM documents
),
bgp AS (
  SELECT source, doc_id,
    unnest(list_transform({_bigrams('w')},
      (x, i) -> struct_pack(ngram := x, pos := i))) AS u
  FROM toks
),
cnts AS (
  SELECT source, u.ngram AS ngram, count(*) AS cnt,
    min(doc_id * {pos_cap} + least(u.pos, {pos_cap - 1})) AS first_seen
  FROM bgp GROUP BY 1, 2
),
topn AS (
  SELECT * FROM (
    SELECT source, ngram, cnt,
      row_number() OVER (PARTITION BY source
                         ORDER BY cnt DESC, first_seen ASC, ngram ASC) AS rn
    FROM cnts
  ) WHERE rn <= 100
),
dist AS (
  SELECT source, ngram, cnt,
    cnt / (sum(cnt) OVER (PARTITION BY source)) AS weight
  FROM topn
)
SELECT source, ngram, cnt, round(weight, 6) AS weight FROM dist
"""


def _dli_features_ctes(base: str = "documents", group: str = "source") -> str:
    refusal = _contains_any("lo", DLI_REFUSAL_PHRASES)
    hedge = " + ".join(_count_substr("lo", w) for w in DLI_HEDGING_WORDS)
    cert = " + ".join(_count_substr("lo", w) for w in DLI_CERTAINTY_WORDS)
    return f"""
resp AS (
  SELECT {group},
    CASE WHEN {refusal} THEN CAST(1 AS DOUBLE) ELSE 0 END AS is_refusal,
    CAST(len({_words('text')}) AS DOUBLE) AS n_ws_words,
    CASE WHEN regexp_matches(text, '(?m)^#+\\s')
         THEN CAST(1 AS DOUBLE) ELSE 0 END AS is_md,
    CASE WHEN regexp_matches(text, '(?m)^[\\s]*[-*•]\\s')
         THEN CAST(1 AS DOUBLE) ELSE 0 END AS is_list,
    CASE WHEN contains(text, '```')
         THEN CAST(1 AS DOUBLE) ELSE 0 END AS is_code,
    CAST({hedge} AS DOUBLE) AS hedge_cnt,
    CAST({cert} AS DOUBLE) AS cert_cnt,
    {_tokens('text')} AS tokens
  FROM (SELECT {group}, text, lower(text) AS lo FROM {base})
),
per_resp AS (
  SELECT {group},
    avg(is_refusal) AS refusal_rate,
    avg(n_ws_words) AS avg_length,
    avg(is_md) AS markdown_rate,
    avg(is_list) AS list_rate,
    avg(is_code) AS code_block_rate,
    sum(hedge_cnt) AS hedge_total,
    sum(cert_cnt) AS cert_total,
    sum(len(tokens)) AS total_tokens
  FROM resp GROUP BY {group}
),
vocab AS (
  SELECT {group}, count(DISTINCT tok) AS distinct_tokens
  FROM (SELECT {group}, unnest(tokens) AS tok FROM resp)
  GROUP BY {group}
),
dlifeat AS (
  SELECT p.{group},
    p.refusal_rate,
    p.avg_length,
    v.distinct_tokens / greatest(p.total_tokens, 1) AS vocab_diversity,
    p.markdown_rate,
    p.list_rate,
    p.code_block_rate,
    p.hedge_total / greatest(p.total_tokens, 1) AS hedging_rate,
    p.cert_total / greatest(p.total_tokens, 1) AS certainty_rate
  FROM per_resp p JOIN vocab v USING ({group})
)"""


def dli_features_by_source() -> str:
    cols = [
        "round(refusal_rate, 6) AS refusal_rate",
        "round(avg_length, 6) AS avg_length",
        "round(vocab_diversity, 6) AS vocab_diversity",
        "round(markdown_rate, 6) AS markdown_rate",
        "round(list_rate, 6) AS list_rate",
        "round(code_block_rate, 6) AS code_block_rate",
        "round(hedging_rate, 6) AS hedging_rate",
        "round(certainty_rate, 6) AS certainty_rate",
    ]
    return f"""
WITH {_dli_features_ctes()}
SELECT source, {", ".join(cols)} FROM dlifeat
"""


DLI_FEATURES = [
    "refusal_rate", "avg_length", "vocab_diversity", "markdown_rate",
    "list_rate", "code_block_rate", "hedging_rate", "certainty_rate",
]


def _dli_compare_ctes(base: str = "documents", group: str = "source") -> str:
    dot = " + ".join(f"fa.{f} * fb.{f}" for f in DLI_FEATURES)
    na = " + ".join(f"fa.{f} * fa.{f}" for f in DLI_FEATURES)
    nb = " + ".join(f"fb.{f} * fb.{f}" for f in DLI_FEATURES)
    ln2 = math.log(2)
    return f"""{_dli_dist_ctes(base, group)},
{_dli_features_ctes(base, group).lstrip()},
gpairs AS (
  SELECT fa.{group} AS model_a, fb.{group} AS model_b
  FROM dlifeat fa JOIN dlifeat fb ON fa.{group} < fb.{group}
),
sides AS (
  SELECT p.model_a, p.model_b, d.ngram, d.weight AS wa, 0::DOUBLE AS wb
  FROM gpairs p JOIN dist d ON d.{group} = p.model_a
  UNION ALL
  SELECT p.model_a, p.model_b, d.ngram, 0::DOUBLE AS wa, d.weight AS wb
  FROM gpairs p JOIN dist d ON d.{group} = p.model_b
),
merged AS (
  SELECT model_a, model_b, ngram, sum(wa) AS wa, sum(wb) AS wb
  FROM sides GROUP BY 1, 2, 3
),
normed AS (
  SELECT model_a, model_b,
    wa / greatest(sum(wa) OVER (PARTITION BY model_a, model_b), 1e-300) AS p,
    wb / greatest(sum(wb) OVER (PARTITION BY model_a, model_b), 1e-300) AS q
  FROM merged
),
js AS (
  SELECT model_a, model_b,
    (sum(CASE WHEN p > 0 AND (p + q) / 2 > 0
              THEN p * ln(p / ((p + q) / 2)) ELSE 0 END)
     + sum(CASE WHEN q > 0 AND (p + q) / 2 > 0
                THEN q * ln(q / ((p + q) / 2)) ELSE 0 END)) / 2
      AS js_divergence
  FROM normed GROUP BY 1, 2
),
dli_cmp AS (
  SELECT g.model_a, g.model_b,
    coalesce(j.js_divergence, 0::DOUBLE) AS js_divergence,
    (1::DOUBLE - least(coalesce(j.js_divergence, 0::DOUBLE) / {ln2!r},
                       1::DOUBLE)) AS bigram_sim,
    CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 0::DOUBLE
         ELSE ({dot}) / (sqrt({na}) * sqrt({nb})) END AS feature_sim
  FROM gpairs g
  JOIN dlifeat fa ON fa.{group} = g.model_a
  JOIN dlifeat fb ON fb.{group} = g.model_b
  LEFT JOIN js j ON j.model_a = g.model_a AND j.model_b = g.model_b
)"""


def dli_compare_sources() -> str:
    return f"""
WITH {_dli_compare_ctes()}
SELECT model_a, model_b,
  round(js_divergence, 6) AS js_divergence,
  round(bigram_sim, 6) AS bigram_sim,
  round(feature_sim, 6) AS feature_sim,
  round(bigram_sim * 0.4::DOUBLE + feature_sim * 0.6::DOUBLE, 6)
    AS similarity,
  (bigram_sim * 0.4::DOUBLE + feature_sim * 0.6::DOUBLE) >= 0.80::DOUBLE
    AS is_derived
FROM dli_cmp
"""


# ---------------------------------------------------------------------------
# Catalog-backed queries (VALUES oracles)
# ---------------------------------------------------------------------------

def probes_filtered() -> str:
    rows = ", ".join(
        f"({i}, {sql_quote(pid)}, {sql_quote(cat)})"
        for i, (pid, cat, _) in enumerate(PROBES)
    )
    return f"""
WITH probes(probe_seq, probe_id, category) AS (VALUES {rows}),
filtered AS (
  SELECT *, row_number() OVER (ORDER BY probe_seq) AS rn
  FROM probes WHERE category IN ('reasoning', 'safety_boundary')
)
SELECT probe_seq, probe_id, category FROM filtered WHERE rn <= 4
"""


def _benchmark_values() -> str:
    rows = ", ".join(
        f"({i}, {sql_quote(t)}, {sql_quote(lb)}, {sql_quote(cat)})"
        for i, (t, lb, cat) in enumerate(BENCHMARK_SAMPLES)
    )
    return f"benchmark(text_id, text, label, category) AS (VALUES {rows})"


def benchmark_detect() -> str:
    return f"""
WITH {_benchmark_values()},
{_detect_ctes('benchmark', 'text_id').lstrip()}
SELECT CAST(d.text_id AS BIGINT) AS text_id, d.predicted_model, b.label,
  d.predicted_model = b.label AS correct
FROM detected d JOIN benchmark b USING (text_id)
"""


def benchmark_accuracy() -> str:
    return f"""
WITH {_benchmark_values()},
{_detect_ctes('benchmark', 'text_id').lstrip()}
SELECT count(*) AS total,
  CAST(sum(CASE WHEN d.predicted_model = b.label THEN 1 ELSE 0 END)
       AS BIGINT) AS correct,
  round(sum(CASE WHEN d.predicted_model = b.label
            THEN CAST(1 AS DOUBLE) ELSE 0 END) / count(*), 6) AS accuracy
FROM detected d JOIN benchmark b USING (text_id)
"""


# ---------------------------------------------------------------------------
# Text analysis / watermark / dedup / similarity / CKA
# ---------------------------------------------------------------------------

STOPWORDS_SQL = None  # filled below to avoid circular import


def text_stats() -> str:
    from model_audit_spark.operators.text_analysis import (
        BPE_PATTERN,
        STOPWORDS,
    )

    stop_arr = sql_str_array(STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text,
    {_words('text')} AS w,
    {_tokens('text')} AS toks
  FROM documents
),
stats AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(w) AS n_words,
    len(toks) AS n_tokens,
    len(regexp_extract_all(text, {sql_quote(BPE_PATTERN)})) AS n_bpe_tokens,
    length(array_to_string(toks, '')) / greatest(len(toks), 1) AS mean_word_len,
    (length(text) - length(translate(text, '.,;:!?', '')))
      / greatest(length(text), 1) AS punct_ratio,
    len(list_filter(toks, t -> list_contains({stop_arr}, t)))
      / greatest(len(toks), 1) AS stop_ratio,
    {_lang('text')} AS lang_pred
  FROM base
)
SELECT doc_id,
  n_chars, n_words, n_tokens, n_bpe_tokens,
  round(mean_word_len, 6) AS mean_word_len,
  round(punct_ratio, 6) AS punct_ratio,
  round(stop_ratio, 6) AS stopword_ratio,
  round(
    0.25::DOUBLE * least(greatest((n_words - 20) / 80.0::DOUBLE, 0::DOUBLE),
                         1::DOUBLE)
    + 0.25::DOUBLE * least(stop_ratio / 0.3::DOUBLE, 1::DOUBLE)
    + 0.25::DOUBLE * (CASE WHEN mean_word_len >= 3.0::DOUBLE
                            AND mean_word_len <= 8.0::DOUBLE
                      THEN 1::DOUBLE ELSE 0::DOUBLE END)
    + 0.25::DOUBLE * (CASE WHEN punct_ratio <= 0.1::DOUBLE
                      THEN 1::DOUBLE ELSE 0::DOUBLE END),
  6) AS quality_score,
  lang_pred
FROM stats
"""


def corpus_stats() -> str:
    return f"""
WITH staged AS (
  SELECT source, text, len({_tokens('text')}) AS n_toks FROM documents
)
SELECT count(*) AS n_docs,
  count(DISTINCT source) AS n_sources,
  count(DISTINCT text) AS n_distinct_texts,
  CAST(sum(n_toks) AS BIGINT) AS total_tokens,
  round(avg(n_toks), 6) AS avg_tokens,
  round(avg(length(text)), 6) AS avg_chars
FROM staged
"""


def lang_distribution() -> str:
    return f"""
SELECT {_lang('text')} AS lang_pred, count(*) AS n_docs
FROM documents GROUP BY 1
"""


def watermark_documents() -> str:
    w = _words("text")
    return f"""
WITH base AS (
  SELECT doc_id, text, {w} AS w FROM documents
),
lens AS (
  SELECT doc_id, text, w,
    list_transform(w, x -> CAST(length(x) AS DOUBLE)) AS wl,
    {_bigrams('w')} AS bg
  FROM base
),
sig AS (
  SELECT doc_id,
    list_sum(list_transform(wl, x -> x * x)) / greatest(len(wl), 1)
      - (list_sum(wl) / greatest(len(wl), 1))
        * (list_sum(wl) / greatest(len(wl), 1)) AS variance,
    CASE WHEN len(bg) > 0
         THEN len(list_distinct(bg)) / CAST(len(bg) AS DOUBLE)
         ELSE 1.0::DOUBLE END AS unique_ratio,
    length(text) - length(translate(text, '​‌‍﻿', ''))
      AS zwc,
    (length(text) - length(replace(text, '  ', ''))) / 2 AS dbl_space,
    len(w) AS n_words
  FROM lens
)
SELECT doc_id,
  round(coalesce(variance, 0::DOUBLE), 6) AS wm_word_len_variance,
  round(unique_ratio, 6) AS wm_bigram_unique_ratio,
  CAST(zwc AS BIGINT) AS wm_zero_width_count,
  CAST(dbl_space AS BIGINT) AS wm_double_space_count,
  round(
    (CASE WHEN n_words > 20 AND variance < 2.0::DOUBLE
      THEN 0.3::DOUBLE ELSE 0::DOUBLE END)
    + (CASE WHEN n_words > 20 AND unique_ratio < 0.5::DOUBLE
       THEN 0.2::DOUBLE ELSE 0::DOUBLE END)
    + (CASE WHEN zwc > 0 THEN 0.5::DOUBLE ELSE 0::DOUBLE END)
    + (CASE WHEN dbl_space > 3 THEN 0.2::DOUBLE ELSE 0::DOUBLE END),
  2) AS wm_score
FROM sig
"""


def doc_fingerprints() -> str:
    shingles = (
        f"list_distinct(CASE WHEN len(toks) < 3 THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len(toks) - 1), "
        f"i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text, {_tokens('text')} AS toks FROM documents
),
fp AS (
  SELECT doc_id,
    md5(regexp_replace(lower({_strip('text')}), '\\s+', ' ', 'g'))
      AS content_fp,
    array_to_string(
      list_slice(list_sort(list_transform({shingles}, s -> md5(s))), 1, 4),
      '|') AS sketch
  FROM base
)
SELECT doc_id, content_fp, sketch FROM fp
"""


def media_profile() -> str:
    """Twin of __spark_entry__._media_profile: metadata/bytes profile of
    the synthesized media relation. md5(VARCHAR) hashes the utf-8 bytes —
    the same digest Spark computes over encode(text,'UTF-8'); hex() is
    uppercase in both engines."""
    return """
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio'
       ELSE 'video' END AS media_type,
  CAST(octet_length(encode(text)) AS INT) AS byte_length,
  md5(text) AS content_md5,
  substr(hex(encode(text)), 1, 8) AS magic_hex,
  CAST(length(text) % 64 + 1 AS INT) AS width,
  CAST(length(text) % 32 + 1 AS INT) AS height,
  CAST(length(text) * 10 AS INT) AS duration_ms
FROM documents
"""


def verify_sources() -> str:
    return f"""
WITH combined AS (
  SELECT source, string_agg(text, chr(10) ORDER BY doc_id) AS text
  FROM documents GROUP BY source
),
{_detect_ctes('combined', 'source').lstrip()},
claimed AS (
  SELECT c.source,
    coalesce(arg_min(s.family, s.family_rank), 'unknown') AS claimed_family
  FROM combined c
  LEFT JOIN style_signatures s ON contains(lower(c.source), s.family)
  GROUP BY c.source
)
SELECT d.source AS model, cl.claimed_family,
  d.predicted_model AS best_match,
  d.confidence AS best_score,
  cl.claimed_family = d.predicted_model AS verified
FROM detected d JOIN claimed cl ON cl.source = d.source
"""


def _responses_consistency_ctes(
    teacher: str = "src0", student: str = "src1", n_probes: int = 20
) -> str:
    """Fixture responses(model_id, probe_seq, response) from documents plus
    the per-probe style-consistency chain (J2 + J5 + T1 + A9 inputs)."""
    return f"""
resp AS (
  SELECT source AS model_id,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS probe_seq,
         text AS response
  FROM documents WHERE source IN ({sql_quote(teacher)}, {sql_quote(student)})
  QUALIFY probe_seq <= {n_probes}
),
respne AS (
  SELECT model_id, probe_seq, response AS text FROM resp
  WHERE length(coalesce(response, '')) > 0
),
{_detect_ctes('respne', 'model_id, probe_seq', 'text').lstrip()},
teacher_side AS (
  SELECT r.probe_seq,
         'p' || CAST(r.probe_seq AS VARCHAR) AS probe_id,
         'synthetic' AS category,
         coalesce(d.predicted_model, 'unknown') AS teacher_style
  FROM resp r LEFT JOIN detected d
    ON d.model_id = r.model_id AND d.probe_seq = r.probe_seq
  WHERE r.model_id = {sql_quote(teacher)}
),
student_side AS (
  SELECT r.probe_seq,
         coalesce(d.predicted_model, 'unknown') AS student_style
  FROM resp r LEFT JOIN detected d
    ON d.model_id = r.model_id AND d.probe_seq = r.probe_seq
  WHERE r.model_id = {sql_quote(student)}
),
consistency AS (
  SELECT coalesce(t.probe_seq, s.probe_seq) AS probe_seq,
         t.probe_id, t.category,
         coalesce(t.teacher_style, 'unknown') AS teacher_style,
         coalesce(s.student_style, 'unknown') AS student_style,
         coalesce(t.teacher_style, 'unknown')
           = coalesce(s.student_style, 'unknown') AS is_consistent
  FROM teacher_side t FULL JOIN student_side s ON t.probe_seq = s.probe_seq
)"""


def probe_style_consistency() -> str:
    return f"""
WITH {_responses_consistency_ctes()}
SELECT probe_seq, probe_id, category, teacher_style, student_style,
       is_consistent
FROM consistency
"""


def audit_consistency_rate() -> str:
    return f"""
WITH {_responses_consistency_ctes()}
SELECT CAST(sum(CASE WHEN is_consistent THEN 1 ELSE 0 END) AS BIGINT)
         AS consistent,
       count(*) AS total,
       round(sum(CASE WHEN is_consistent THEN CAST(1 AS DOUBLE) ELSE 0 END)
             / count(*) * 100.0::DOUBLE, 0) AS pct
FROM consistency
"""


def style_count_distribution() -> str:
    return f"""
WITH {_responses_consistency_ctes()}
SELECT student_style, count(*) AS n,
       round(count(*) / (sum(count(*)) OVER ()) * 100.0::DOUBLE, 2) AS pct
FROM consistency
GROUP BY student_style
"""


def probe_category_counts() -> str:
    rows = ", ".join(
        f"({i}, {sql_quote(pid)}, {sql_quote(cat)})"
        for i, (pid, cat, _) in enumerate(PROBES)
    )
    return f"""
WITH probes(probe_seq, probe_id, category) AS (VALUES {rows})
SELECT category, count(*) AS n_probes FROM probes GROUP BY category
"""


def benchmark_accuracy_by_class() -> str:
    return f"""
WITH {_benchmark_values()},
{_detect_ctes('benchmark', 'text_id').lstrip()}
SELECT b.label,
  count(*) AS total,
  CAST(sum(CASE WHEN d.predicted_model = b.label THEN 1 ELSE 0 END)
       AS BIGINT) AS correct,
  round(sum(CASE WHEN d.predicted_model = b.label
            THEN CAST(1 AS DOUBLE) ELSE 0 END) / count(*), 6) AS accuracy
FROM detected d JOIN benchmark b USING (text_id)
GROUP BY b.label
"""


def claimed_families() -> str:
    from model_audit_spark.catalogs import AUDIT_MODEL_NAMES

    models = ", ".join(f"({sql_quote(m)})" for m in AUDIT_MODEL_NAMES)
    return f"""
WITH {_signatures_cte()},
models(model_id) AS (VALUES {models})
SELECT m.model_id, arg_min(s.family, s.family_rank) AS claimed_family
FROM models m
LEFT JOIN style_signatures s ON contains(lower(m.model_id), s.family)
GROUP BY m.model_id
"""


def fingerprint_diff_buckets(
    model_a: str = "src0", model_b: str = "src1"
) -> str:
    """V8 judgment buckets (report.py:735-780) per fingerprint dimension."""

    def bucket(diff: str, t1: float, t2: float, t3: float) -> str:
        return (
            f"CASE WHEN {diff} < {t1}::DOUBLE THEN '**完全一致**' "
            f"WHEN {diff} < {t2}::DOUBLE THEN '**高度一致**' "
            f"WHEN {diff} < {t3}::DOUBLE THEN '接近' "
            f"ELSE '显著不同' END"
        )

    selects = []
    for seq, d in enumerate(FINGERPRINT_DIMS):
        diff = f"abs(a.{d} - b.{d})"
        if d in FEATURE_RANGES:
            lo, hi = FEATURE_RANGES[d]
            norm = f"({diff} / {hi - lo}::DOUBLE)" if hi > lo else "0::DOUBLE"
            judgment = bucket(norm, 0.02, 0.1, 0.2)
        elif d.startswith("ratio_"):
            judgment = bucket(diff, 0.01, 0.05, 0.1)
        elif d.startswith("style_"):
            judgment = bucket(diff, 0.001, 0.003, 0.005)
        else:
            judgment = bucket(diff, 0.01, 0.05, 0.1)
        selects.append(
            f"SELECT {seq} AS feature_seq, {sql_quote(d)} AS feature, "
            f"round(a.{d}, 6) AS value_a, round(b.{d}, 6) AS value_b, "
            f"round({diff}, 6) AS diff, {judgment} AS judgment "
            f"FROM fpa a CROSS JOIN fpb b"
        )
    union = " UNION ALL ".join(selects)
    return f"""
WITH {_fingerprint_cte('documents', 'source')},
fpa AS (SELECT * FROM fp WHERE source = {sql_quote(model_a)}),
fpb AS (SELECT * FROM fp WHERE source = {sql_quote(model_b)})
{union}
"""


def cache_keys(method: str = "llmmap", provider: str = "openai") -> str:
    """F23 cache key: {method}_{sanitized_model[:40]}_{sha256(...)[ :16]}."""
    return f"""
WITH models AS (
  SELECT DISTINCT source AS model_id FROM documents
)
SELECT model_id,
  '{method}' || '_' ||
  substring(translate(model_id, '/: ', '___'), 1, 40) || '_' ||
  substring(sha256('{method}' || ':' || model_id || ':' || '{provider}'), 1, 16)
    AS cache_key
FROM models
"""


def _memo_pairs_ctes() -> str:
    return """
memo_pairs AS (
  SELECT doc_id AS pair_id, text AS sample,
         coalesce(lead(text) OVER (PARTITION BY source ORDER BY doc_id),
                  text) AS response
  FROM documents WHERE source = 'src0'
),
memo_split AS (
  SELECT pair_id, sample, response,
         -- // floors like Spark's int cast; CAST(x/2 AS INTEGER) would ROUND
         substring(sample, length(sample) // 2 + 1) AS suffix,
         substring(response, length(response) // 2 + 1) AS completion
  FROM memo_pairs
)"""


def memorization_verbatim() -> str:
    w = _words("sample")
    return f"""
WITH {_memo_pairs_ctes()},
st AS (
  SELECT pair_id, response, {w} AS w FROM memo_split
),
st2 AS (
  SELECT pair_id, response, w,
         CASE WHEN least(8, len(w) // 4) = 0 THEN 3
              ELSE least(8, len(w) // 4) END AS pl
  FROM st
),
st3 AS (
  SELECT pair_id, response,
    list_transform(
      CASE WHEN len(w) - pl >= 0
           THEN range(0, len(w) - pl + 1, pl) ELSE [] END,
      j -> array_to_string(list_slice(w, j + 1, j + pl), ' ')
    ) AS phrases
  FROM st2
)
SELECT pair_id,
  len(phrases) AS total_phrases,
  len(list_filter(phrases, p -> contains(response, p))) AS matched_phrases,
  round(CASE WHEN len(phrases) > 0
        THEN len(list_filter(phrases, p -> contains(response, p)))
             / CAST(len(phrases) AS DOUBLE)
        ELSE 0::DOUBLE END, 4) AS score
FROM st3
"""


def memorization_average() -> str:
    """A10: mean memorization score across samples (mcp_server.py:405-407)."""
    base = memorization_verbatim().strip()
    return f"""
WITH scored AS ({base})
SELECT count(*) AS n_samples, round(avg(score), 6) AS avg_score FROM scored
"""


def _seqmatch_best_subquery(P: str, AL: str, AH: str, BL: str, BH: str) -> str:
    """Scalar subquery: difflib find_longest_match for the region
    [AL,AH]x[BL,BH] (1-based inclusive), already junk/popular-extended.

    Candidates are the global maximal non-popular diagonal match-runs
    (`cand`) clipped to the region — exactly the j2len DP's maxima —
    with difflib's tie-break (core k desc, then core start i asc, j asc
    = first cell reaching the max in the i-asc/j-asc scan). The emitted
    (bi, bj, bk) is the clip of the CONTAINING full match-run (`cand`
    carries it): difflib's end-extension walks through popular chars
    because autojunk populates bpopular, never bjunk. The ck=0 corner
    row is the fallback: with an empty DP (every match cell popular),
    besti/bestj sit at (alo, blo) and the right-extension loop still
    grows a match when a[alo] == b[blo]."""
    return f"""
  (SELECT {{'bi': ebi, 'bj': ebj, 'bk': ebk}}
   FROM (
     SELECT greatest(c.fi0, {AL}, {BL} + c.d) AS ebi,
            greatest(c.fi0, {AL}, {BL} + c.d) - c.d AS ebj,
            least(c.fiend, {AH}, {BH} + c.d)
              - greatest(c.fi0, {AL}, {BL} + c.d) + 1 AS ebk,
            least(c.ci0 + c.cl - 1, {AH}, {BH} + c.d)
              - greatest(c.ci0, {AL}, {BL} + c.d) + 1 AS ck,
            greatest(c.ci0, {AL}, {BL} + c.d) AS ci,
            greatest(c.ci0, {AL}, {BL} + c.d) - c.d AS cj
     FROM cand c
     WHERE c.pair_id = {P}
       AND least(c.ci0 + c.cl - 1, {AH}, {BH} + c.d)
           >= greatest(c.ci0, {AL}, {BL} + c.d)
     UNION ALL
     SELECT {AL} AS ebi, {BL} AS ebj,
            least(f.fiend, {AH}, {BH} + ({AL} - {BL})) - {AL} + 1 AS ebk,
            0 AS ck, {AL} AS ci, {BL} AS cj
     FROM runs_full f
     WHERE f.pair_id = {P} AND f.d = {AL} - {BL}
       AND {AL} BETWEEN f.fi0 AND f.fiend
       AND {AL} <= {AH} AND {BL} <= {BH}
   )
   ORDER BY ck DESC, ci ASC, cj ASC
   LIMIT 1)"""


def seqmatch_scores_sql(pairs_cte: str) -> str:
    """difflib.SequenceMatcher (isjunk=None, autojunk=True) as pure SQL
    over a `memo_split(pair_id, suffix, completion)` relation supplied by
    `pairs_cte` — the twin of operators/memorization.sequence_match_scores
    (reference kernel mcp_server.py:376-384).

    Shape: per pair, explode both stripped strings to (pos, char) cells,
    join on char into match cells, mark chars popular per autojunk
    (len(b) >= 200 and count > len(b)//100 + 1 — these leave b2j but not
    bjunk), reduce cells to maximal diagonal runs (core = non-popular,
    full = all), then run get_matching_blocks' region queue as a
    recursive CTE: each region row carries its best extended match and
    spawns the two difflib subregions. M = Σ bk; emitted score is
    ratio() = 2M/T quantized half-up at 4dp in exact integer arithmetic
    ((40000·M + T) // (2·T) / 1e4), identical to the Spark emit.
    Validated cell-for-cell against difflib on 82 adversarial cases
    (empties, all-popular autojunk strings, whitespace trims, random
    150-400 char pairs) plus the live memo pairs."""
    # the FULL Python str.strip() whitespace set (every codepoint with
    # str.isspace() below U+3001) — the Spark kernel strips unicode
    # whitespace (NBSP, NEL, ideographic space, ...), so trimming only
    # ASCII here would hash-diverge on such edges
    ws = "chr(9) || chr(10) || chr(11) || chr(12) || chr(13) || chr(28) || chr(29) || chr(30) || chr(31) || chr(32) || chr(133) || chr(160) || chr(5760) || chr(8192) || chr(8193) || chr(8194) || chr(8195) || chr(8196) || chr(8197) || chr(8198) || chr(8199) || chr(8200) || chr(8201) || chr(8202) || chr(8232) || chr(8233) || chr(8239) || chr(8287) || chr(12288)"
    return f"""
WITH RECURSIVE {pairs_cte},
ab AS (
  SELECT pair_id, trim(suffix, {ws}) AS a, trim(completion, {ws}) AS b
  FROM memo_split
),
lens AS (
  SELECT pair_id, a, b, length(a) AS la, length(b) AS lb FROM ab
),
acell AS (
  SELECT pair_id, i, substring(a, i, 1) AS ch
  FROM (SELECT pair_id, a, unnest(range(1, la + 1)) AS i FROM lens)
),
bcell AS (
  SELECT pair_id, j, substring(b, j, 1) AS ch
  FROM (SELECT pair_id, b, unnest(range(1, lb + 1)) AS j FROM lens)
),
popular AS (
  SELECT bc.pair_id, bc.ch
  FROM bcell bc JOIN lens l USING (pair_id)
  WHERE l.lb >= 200
  GROUP BY bc.pair_id, bc.ch, l.lb
  HAVING count(*) > l.lb // 100 + 1
),
m AS (
  SELECT ac.pair_id, ac.i, bc.j, (p.ch IS NOT NULL) AS pop
  FROM acell ac
  JOIN bcell bc ON bc.pair_id = ac.pair_id AND bc.ch = ac.ch
  LEFT JOIN popular p ON p.pair_id = ac.pair_id AND p.ch = ac.ch
),
runs_full AS (
  SELECT pair_id, d, min(i) AS fi0, min(i) + count(*) - 1 AS fiend
  FROM (SELECT pair_id, i, i - j AS d,
               i - row_number() OVER (PARTITION BY pair_id, i - j ORDER BY i)
                 AS grp
        FROM m)
  GROUP BY pair_id, d, grp
),
runs_core AS (
  SELECT pair_id, d, min(i) AS ci0, count(*) AS cl
  FROM (SELECT pair_id, i, i - j AS d,
               i - row_number() OVER (PARTITION BY pair_id, i - j ORDER BY i)
                 AS grp
        FROM m WHERE NOT pop)
  GROUP BY pair_id, d, grp
),
cand AS (
  SELECT c.pair_id, c.d, c.ci0, c.cl, f.fi0, f.fiend
  FROM runs_core c
  JOIN runs_full f ON f.pair_id = c.pair_id AND f.d = c.d
   AND c.ci0 BETWEEN f.fi0 AND f.fiend
),
reg AS (
  SELECT l.pair_id, 1 AS al, l.la AS ah, 1 AS bl, l.lb AS bh,
         {_seqmatch_best_subquery('l.pair_id', '1', 'l.la', '1', 'l.lb')}
           AS best
  FROM lens l
  UNION ALL
  SELECT r.pair_id, ch.cal AS al, ch.cah AS ah, ch.cbl AS bl, ch.cbh AS bh,
         {_seqmatch_best_subquery(
             'r.pair_id', 'ch.cal', 'ch.cah', 'ch.cbl', 'ch.cbh')}
           AS best
  FROM reg r, LATERAL (
    SELECT r.al AS cal, r.best['bi'] - 1 AS cah,
           r.bl AS cbl, r.best['bj'] - 1 AS cbh
    WHERE r.al < r.best['bi'] AND r.bl < r.best['bj']
    UNION ALL
    SELECT r.best['bi'] + r.best['bk'], r.ah,
           r.best['bj'] + r.best['bk'], r.bh
    WHERE r.best['bi'] + r.best['bk'] <= r.ah
      AND r.best['bj'] + r.best['bk'] <= r.bh
  ) ch
  WHERE r.best IS NOT NULL
),
msum AS (
  SELECT pair_id, sum(best['bk']) AS mm
  FROM reg WHERE best IS NOT NULL GROUP BY pair_id
)
SELECT l.pair_id,
  CAST(coalesce(m.mm, 0) AS BIGINT) AS n_matched,
  CAST(l.la + l.lb AS BIGINT) AS total_len,
  CASE WHEN l.la + l.lb > 0
       THEN ((40000 * coalesce(m.mm, 0) + (l.la + l.lb))
             // (2 * (l.la + l.lb))) / 10000.0
       ELSE 1.0 END AS score
FROM lens l LEFT JOIN msum m ON m.pair_id = l.pair_id
"""


def memorization_seqmatch() -> str:
    """Twin of __spark_entry__._memorization_seqmatch — the difflib
    SequenceMatcher kernel over the memo pairs, previously the one
    rows-only query."""
    return seqmatch_scores_sql(_memo_pairs_ctes())


def memorization_levenshtein() -> str:
    return f"""
WITH {_memo_pairs_ctes()}
SELECT pair_id,
  round(1::DOUBLE - levenshtein(trim(suffix), trim(completion))
        / CAST(greatest(length(trim(suffix)), length(trim(completion)), 1)
               AS DOUBLE), 6) AS lev_similarity
FROM memo_split
"""


def llmmap_fingerprint_hashes() -> str:
    canon = " || '|' || ".join(
        f"'{d}:' || printf('%.6f', {d})" for d in sorted(FINGERPRINT_DIMS)
    )
    return f"""
WITH {_fingerprint_cte('documents', 'source')}
SELECT source, substring(md5({canon}), 1, 16) AS fp_hash FROM fp
"""


def dedup_exact() -> str:
    return """
WITH hashed AS (
  SELECT doc_id, md5(text) AS text_hash FROM documents
)
SELECT doc_id, text_hash,
  count(*) OVER (PARTITION BY text_hash) AS dup_group_size,
  row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) = 1 AS is_first
FROM hashed
"""


def _hex32(hexstr: str) -> str:
    """SQL: first-8-hex-chars of a lowercase hex string -> BIGINT (0..2^32)."""
    digit = f"(strpos('0123456789abcdef', substring({hexstr}, {{i}}, 1)) - 1)"
    return (
        "("
        + " + ".join(
            f"{digit.format(i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
        )
        + ")"
    )


def _hex60(hexstr: str) -> str:
    """SQL: first-15-hex-chars of a lowercase hex string -> BIGINT
    (0..16^15, fits signed 64-bit) — the twin of Spark's
    conv(substring(md5(x), 1, 15), 16, 10) shuffle-key narrowing."""
    digit = f"(strpos('0123456789abcdef', substring({hexstr}, {{i}}, 1)) - 1)"
    return (
        "("
        + " + ".join(
            f"{digit.format(i=i + 1)} * {16 ** (14 - i)}" for i in range(15)
        )
        + ")"
    )


def _shingle_ctes(base: str = "documents") -> str:
    """toksrc + shing CTEs: distinct word 3-shingles per unit, the SQL
    twin of dedup.shingles_df. `base` is any relation/CTE providing
    (doc_id, text) — documents by default, the paragraph relation for
    the passage-granular chain (r5)."""
    shingles = (
        "list_distinct(CASE WHEN len(toks) < 3 THEN []::VARCHAR[] "
        "ELSE list_transform(range(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END)"
    )
    return f"""
toksrc AS (
  SELECT doc_id, {_tokens('text')} AS toks FROM {base}
),
shing AS (
  SELECT doc_id, {shingles} AS sh FROM toksrc
)"""


def _shingle_expr_n(toks: str, n: int) -> str:
    """SQL for distinct word n-shingles from a tokens column (generic-n twin
    of _shingle_ctes' n=3 form and of text.ngrams)."""
    concat = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_distinct(CASE WHEN len({toks}) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> {concat}) END)"
    )


def contamination_check(shingle_n: int = 5, eval_mod: int = 5) -> str:
    """Training-vs-eval n-gram overlap (twin of decontam.contamination with
    the doc_id % eval_mod == 0 split used by the driver query)."""
    sh = _shingle_expr_n("toks", shingle_n)
    return f"""
WITH toksrc AS (
  SELECT doc_id, {_tokens('text')} AS toks FROM documents
),
shing AS (
  SELECT doc_id, {sh} AS sh FROM toksrc
),
ev AS (
  SELECT DISTINCT unnest(sh) AS s FROM shing WHERE doc_id % {eval_mod} = 0
),
trl AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh, unnest(sh) AS s
  FROM shing WHERE doc_id % {eval_mod} <> 0
)
SELECT t.doc_id, t.n_sh, count(*) AS n_overlap,
       round(count(*) / greatest(t.n_sh, 1), 6) AS overlap_frac
FROM trl t JOIN ev ON ev.s = t.s
GROUP BY t.doc_id, t.n_sh
"""


def corpus_sample(
    rates: dict[str, float] | None = None,
    stratum: str = "lang",
    salt: str = "s1",
    default_rate: float = 0.1,
) -> str:
    """Deterministic stratified hash sample (twin of
    sampling.stratified_sample + sample_bucket)."""
    rates = rates if rates is not None else {"en": 0.5, "fr": 0.3, "zh": 0.2}
    whens = " ".join(
        f"WHEN '{k}' THEN {int(round(r * 10000))}"
        for k, r in sorted(rates.items())
    )
    h = _hex32(f"md5(CAST(doc_id AS VARCHAR) || ':{salt}')")
    return f"""
WITH b AS (
  SELECT doc_id, lang, source,
         CAST({h} AS BIGINT) % 10000 AS bucket
  FROM documents
)
SELECT doc_id, lang, source, bucket FROM b
WHERE bucket < CASE {stratum} {whens}
               ELSE {int(round(default_rate * 10000))} END
"""


def length_percentiles(probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)) -> str:
    """Exact per-source length/token quantiles (twin of
    stats.column_percentiles exact form; quantile_cont == Spark percentile,
    both ANSI percentile_cont linear interpolation)."""

    def lbl(p: float) -> str:
        return str(p * 100).rstrip("0").rstrip(".").replace(".", "_")

    cols = ", ".join(
        [f"round(quantile_cont(c, {p}), 6) AS chars_p{lbl(p)}" for p in probs]
        + [f"round(quantile_cont(t, {p}), 6) AS tokens_p{lbl(p)}" for p in probs]
    )
    return f"""
WITH base AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS c,
         CAST(len({_words('text')}) AS DOUBLE) AS t
  FROM documents
)
SELECT source, {cols} FROM base GROUP BY source
"""


def _minhash_ctes(
    num_hashes: int = 16, base: str = "documents"
) -> str:
    from model_audit_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_coeffs,
    )

    min_cols = ", ".join(
        f"min(({a} * h + {b}) % {MINHASH_PRIME}) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    )
    sig_cols = ", ".join(
        f"CAST(coalesce(m.mh_{i}, {MINHASH_PRIME}) AS BIGINT) AS mh_{i}"
        for i in range(num_hashes)
    )
    return f"""{_shingle_ctes(base)},
mh_expl AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
),
mh_h AS (
  SELECT doc_id, CAST({_hex32('md5(s)')} AS BIGINT) AS h FROM mh_expl
),
mh_min AS (
  SELECT doc_id, {min_cols} FROM mh_h GROUP BY doc_id
),
sigs AS (
  SELECT d.doc_id, {sig_cols}
  FROM {base} d LEFT JOIN mh_min m ON m.doc_id = d.doc_id
)"""


def dedup_minhash_signatures() -> str:
    sig_concat = " || '|' || ".join(
        f"CAST(mh_{i} AS VARCHAR)" for i in range(16)
    )
    return f"""
WITH {_minhash_ctes()}
SELECT doc_id, md5({sig_concat}) AS signature FROM sigs
"""


def dedup_minhash_pairs(
    min_jaccard: float = 0.5,
    base: str = "documents",
    extra_ctes: str = "",
) -> str:
    """Band-candidate + exact-Jaccard-verify chain over `base`
    (doc_id, text); `extra_ctes` prepends CTE definitions (must end
    with a comma) so a derived unit relation — e.g. paragraphs — can
    feed the same certified chain."""
    bands = []
    for b in range(4):
        parts = " || '|' || ".join(
            f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4)
        )
        bands.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS bh FROM sigs")
    bands_sql = " UNION ALL ".join(bands)
    return f"""
WITH {extra_ctes}{_minhash_ctes(base=base)},
bandhash AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandhash a JOIN bandhash b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
expl AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
),
sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM shing
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS n_inter
  FROM cand c
  JOIN expl ea ON ea.doc_id = c.id_a
  JOIN expl eb ON eb.doc_id = c.id_b AND eb.s = ea.s
  GROUP BY c.id_a, c.id_b
)
SELECT c.id_a, c.id_b,
  round(coalesce(i.n_inter, 0)
        / greatest(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0), 1), 6)
    AS jaccard
FROM cand c
LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE round(coalesce(i.n_inter, 0)
      / greatest(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0), 1), 6)
      >= {min_jaccard!r}
"""


def conversation_transcripts(max_turns: int = 200) -> str:
    """Twin of threads.assemble_threads over events with the
    printf-rendered turn text. DuckDB's ordered string_agg replaces the
    array_sort(collect_list) construction; the head slice keeps the
    first `max_turns` turns."""
    return f"""
WITH turns AS (
  SELECT user_id, ts, event_id,
         printf('%s:%.2f', coalesce(event_type, ''),
                coalesce(value, 0.0)) AS txt,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS rn
  FROM events
),
agg AS (
  SELECT user_id,
         count(*) AS n_turns,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
         string_agg(CASE WHEN rn <= {max_turns} THEN txt END,
                    chr(10) ORDER BY ts, event_id) AS transcript
  FROM turns GROUP BY user_id
)
SELECT user_id, n_turns, first_ts, last_ts, transcript,
       md5(transcript) AS transcript_md5
FROM agg
"""


def q17_small_quantity(brand: str = "Brand#2") -> str:
    """Twin of the decorrelated TPC-H Q17 shape (per-part breakdown)."""
    return f"""
WITH p AS (
  SELECT p_partkey FROM part WHERE p_brand = {sql_quote(brand)}
),
bli AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN p ON l_partkey = p_partkey
),
th AS (
  SELECT l_partkey, 0.2 * avg(l_quantity) AS q_thresh
  FROM bli GROUP BY l_partkey
)
SELECT b.l_partkey AS p_partkey,
       count(*) AS n_small,
       round(sum(b.l_extendedprice), 2) AS small_revenue
FROM bli b JOIN th USING (l_partkey)
WHERE b.l_quantity < th.q_thresh
GROUP BY 1
"""


def zorder_events(bits: int = 16) -> str:
    """Twin of layout.zvalue over events (user_id, epoch-minute): the
    Morton interleave is pure integer shift/and/or — identical BIGINT
    results in any engine."""
    def interleave(exprs: list[str]) -> str:
        n = len(exprs)
        terms = []
        for j, e in enumerate(exprs):
            for i in range(bits):
                terms.append(f"((({e} >> {i}) & 1) << {i * n + j})")
        return " | ".join(terms)

    z = interleave(["u", "m"])
    return f"""
WITH base AS (
  SELECT event_id,
         CAST(user_id AS BIGINT) AS u,
         -- floor, not CAST: epoch() keeps fractional seconds and CAST
         -- rounds-to-nearest, while Spark's unix_timestamp floors
         CAST(floor(epoch(ts)) AS BIGINT) // 60 AS m
  FROM events
)
SELECT event_id, CAST({z} AS BIGINT) AS zval FROM base
"""


def corpus_drift(target_source: str = "src0") -> str:
    """Twin of drift.psi_drift over (length, quality) fixed buckets with
    the source split. Same integer-operand smoothed ratio, 9dp-quantized
    ln per bucket, 15dp DECIMAL contributions, exact decimal sum; psi is
    cast DOUBLE at the final projection exactly like the Spark side."""
    return f"""
WITH ts AS ({text_stats()}),
feat AS (
  SELECT (d.source = {sql_quote(target_source)}) AS a,
         least(len(coalesce(d.text, '')) // 200, 19) AS len_bucket,
         CAST(floor(ts.quality_score * 10) AS BIGINT) AS q_bucket
  FROM documents d JOIN ts ON ts.doc_id = d.doc_id
),
base AS (
  SELECT a, 'len' AS feature, CAST(len_bucket AS BIGINT) AS bucket FROM feat
  UNION ALL
  SELECT a, 'quality', q_bucket FROM feat
),
counts AS (
  SELECT feature, bucket,
         sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
  FROM base GROUP BY feature, bucket
),
totals AS (
  SELECT feature, sum(ca) AS ta, sum(cb) AS tb, count(*) AS nb
  FROM counts GROUP BY feature
),
contrib AS (
  SELECT c.feature, t.nb,
    CAST(round(
      ((c.ca + 1) / (t.ta + t.nb) - (c.cb + 1) / (t.tb + t.nb))
      * round(ln(((c.ca + 1) * (t.tb + t.nb))
                 / ((c.cb + 1) * (t.ta + t.nb))), 9),
      15) AS DECIMAL(38,15)) AS v
  FROM counts c JOIN totals t ON t.feature = c.feature
)
SELECT feature, CAST(nb AS BIGINT) AS n_buckets,
       CAST(sum(v) AS DOUBLE) AS psi
FROM contrib GROUP BY feature, nb
"""


def q4_order_priority(cutoff: str = "1998-06-01 00:00:00") -> str:
    """Twin of the Q4 semi-join shape."""
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '{cutoff}'
)
GROUP BY o_orderpriority
"""


def q_events_cube() -> str:
    """Twin of the CUBE aggregate; GROUPING() discriminates total rows
    from genuine NULL keys exactly like the Spark side."""
    return """
SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL'
            ELSE coalesce(event_type, 'NULL') END AS event_type,
       CASE WHEN GROUPING(strftime(CAST(date_trunc('week', ts) AS DATE),
                          '%Y-%m-%d')) = 1 THEN 'ALL'
            ELSE coalesce(strftime(CAST(date_trunc('week', ts) AS DATE),
                          '%Y-%m-%d'), 'NULL') END AS week,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY CUBE (event_type,
               strftime(CAST(date_trunc('week', ts) AS DATE), '%Y-%m-%d'))
"""


def q_events_retention() -> str:
    """Twin of the weekly cohort-retention query. Both engines truncate
    weeks to Monday; offsets are exact integer day arithmetic."""
    return """
WITH cohort AS (
  SELECT user_id,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', c.cohort_week, a.week) // 7 AS INTEGER)
         AS week_offset,
       count(*) AS n_active
FROM activity a JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


def top_boilerplate_spans(span_tokens: int = 5, k: int = 20) -> str:
    """Twin of dedup.top_boilerplate_spans — stride-1 n-gram counts over
    token positions, top-k by (count desc, span asc)."""
    n = span_tokens
    join_expr = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    grams = (
        f"CASE WHEN len(toks) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len(toks) - {n} + 2), "
        f"i -> {join_expr}) END"
    )
    return f"""
WITH toksrc AS (
  SELECT doc_id, {_tokens('text')} AS toks FROM documents
),
g AS (
  SELECT doc_id, unnest({grams}) AS g FROM toksrc
),
agg AS (
  SELECT g AS span, count(*) AS n_occurrences,
         count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
  FROM g GROUP BY g
)
SELECT span, n_occurrences, n_docs, first_doc
FROM agg WHERE n_occurrences > 1
ORDER BY n_occurrences DESC, span ASC LIMIT {k}
"""


def dedup_incremental(min_jaccard: float = 0.5, batch_mod: int = 5) -> str:
    """Twin of dedup.incremental_dedup_pairs with the driver split
    (doc_id % batch_mod == 0 is the new batch, the rest the index).
    Signatures are per-doc, so signing the full table and splitting by
    the mod predicate is identical to signing each side separately."""
    bands = []
    for b in range(4):
        parts = " || '|' || ".join(
            f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4)
        )
        bands.append(f"SELECT doc_id, {b} AS band, md5({parts}) AS bh FROM sigs")
    bands_sql = " UNION ALL ".join(bands)
    return f"""
WITH {_minhash_ctes()},
bandhash AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_idx
  FROM bandhash a JOIN bandhash b
    ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id % {batch_mod} = 0 AND b.doc_id % {batch_mod} <> 0
),
expl AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
),
sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM shing
),
inter AS (
  SELECT c.id_new, c.id_idx, count(*) AS n_inter
  FROM cand c
  JOIN expl ea ON ea.doc_id = c.id_new
  JOIN expl eb ON eb.doc_id = c.id_idx AND eb.s = ea.s
  GROUP BY c.id_new, c.id_idx
)
SELECT c.id_new, c.id_idx,
  round(coalesce(i.n_inter, 0)
        / greatest(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0), 1), 6)
    AS jaccard
FROM cand c
LEFT JOIN inter i ON i.id_new = c.id_new AND i.id_idx = c.id_idx
JOIN sizes sa ON sa.doc_id = c.id_new
JOIN sizes sb ON sb.doc_id = c.id_idx
WHERE round(coalesce(i.n_inter, 0)
      / greatest(sa.n_sh + sb.n_sh - coalesce(i.n_inter, 0), 1), 6)
      >= {min_jaccard!r}
"""


def dedup_ngram_jaccard(min_jaccard: float = 0.5) -> str:
    """Exact all-pairs n-gram Jaccard via a shingle inverted index (twin of
    dedup.ngram_jaccard_pairs with max_df=None)."""
    jac = "i.n_inter / greatest(sa.n_sh + sb.n_sh - i.n_inter, 1)"
    return f"""
WITH {_shingle_ctes()},
expl AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
),
sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM shing
),
inter AS (
  SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS n_inter
  FROM expl ea JOIN expl eb ON eb.s = ea.s AND ea.doc_id < eb.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, round({jac}, 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE round({jac}, 6) >= {min_jaccard!r}
"""


def dedup_clusters(min_jaccard: float = 0.5) -> str:
    """Transitive closure of the verified minhash near-dup pairs → min-id
    component per document (twin of cluster.cluster_documents over
    dedup_minhash_pairs). The recursive CTE is the single-node oracle for
    the distributed min-label propagation."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b FROM ({dedup_minhash_pairs(min_jaccard)})
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.node, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (
  SELECT node, min(m) AS mn FROM reach GROUP BY node
),
assigned AS (
  SELECT d.doc_id,
         CAST(coalesce(least(c.mn, d.doc_id), d.doc_id) AS BIGINT)
           AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS keep
FROM assigned
"""


def effective_corpus_size(min_jaccard: float = 0.5) -> str:
    """Twin of cluster.effective_corpus_size over the minhash near-dup
    clusters: per-source doc/dup counts, raw token sum, and the
    1/cluster_size-weighted token mass in exact ppm BIGINTs
    (token_count*1e6 // cluster_size). Register in
    _MATERIALIZED_TWINS."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b FROM ({dedup_minhash_pairs(min_jaccard)})
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.node, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (
  SELECT node, min(m) AS mn FROM reach GROUP BY node
),
assigned AS (
  SELECT d.doc_id,
         CAST(coalesce(least(c.mn, d.doc_id), d.doc_id) AS BIGINT)
           AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
),
sized AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY cluster_id) AS cluster_size
  FROM assigned
),
toks AS (
  SELECT doc_id, source,
         len({_tokens("coalesce(text, '')")}) AS tok
  FROM documents
)
SELECT t.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN s.cluster_size > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS dup_docs,
       CAST(sum(t.tok) AS BIGINT) AS raw_tokens,
       CAST(sum(CAST(t.tok AS BIGINT) * 1000000 // s.cluster_size)
            AS BIGINT) AS effective_tokens_ppm
FROM toks t JOIN sized s ON t.doc_id = s.doc_id
GROUP BY t.source
"""


def cluster_retention(min_jaccard: float = 0.5) -> str:
    """Twin of cluster.cluster_retention_by_quality over the minhash
    near-dup clusters: keep = row_number over (quality desc, id asc)
    within the cluster — the SQL mirror of max(struct(quality, -id))."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b FROM ({dedup_minhash_pairs(min_jaccard)})
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.node, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (
  SELECT node, min(m) AS mn FROM reach GROUP BY node
),
ts AS ({text_stats()}),
assigned AS (
  SELECT d.doc_id,
         CAST(coalesce(least(c.mn, d.doc_id), d.doc_id) AS BIGINT)
           AS cluster_id,
         ts.quality_score AS quality
  FROM documents d
  JOIN ts ON ts.doc_id = d.doc_id
  LEFT JOIN comp c ON c.node = d.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id, quality,
    count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
    row_number() OVER (
      PARTITION BY cluster_id ORDER BY quality DESC, doc_id ASC
    ) AS rn
  FROM assigned
)
SELECT doc_id, cluster_id, cluster_size, quality, rn = 1 AS keep
FROM ranked
"""


def dedup_decisions(min_jaccard: float = 0.5) -> str:
    """Twin of cluster.dedup_decisions: the cluster_retention CTE
    chain, split into kept/removed, left-joined back to the verified
    pair relation in both orientations. Register in
    _MATERIALIZED_TWINS — `pairs` is referenced three times."""
    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b, jaccard FROM ({dedup_minhash_pairs(min_jaccard)})
),
edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.node, e.d FROM reach r JOIN edges e ON e.s = r.m
),
comp AS (
  SELECT node, min(m) AS mn FROM reach GROUP BY node
),
ts AS ({text_stats()}),
assigned AS (
  SELECT d.doc_id,
         CAST(coalesce(least(c.mn, d.doc_id), d.doc_id) AS BIGINT)
           AS cluster_id,
         ts.quality_score AS quality
  FROM documents d
  JOIN ts ON ts.doc_id = d.doc_id
  LEFT JOIN comp c ON c.node = d.doc_id
),
ranked AS (
  SELECT doc_id, cluster_id, quality,
    count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
    row_number() OVER (
      PARTITION BY cluster_id ORDER BY quality DESC, doc_id ASC
    ) AS rn
  FROM assigned
),
kept AS (
  SELECT cluster_id, doc_id AS kept_id, quality AS kept_quality
  FROM ranked WHERE rn = 1
),
removed AS (
  SELECT cluster_id, doc_id AS removed_id, quality AS removed_quality,
         cluster_size
  FROM ranked WHERE rn > 1
),
sym AS (
  SELECT id_a AS r, id_b AS kp, jaccard FROM pairs
  UNION ALL
  SELECT id_b, id_a, jaccard FROM pairs
)
SELECT removed_id, kept_id, CAST(cluster_size AS BIGINT) AS cluster_size,
  removed_quality, kept_quality,
  s.jaccard AS direct_jaccard, s.jaccard IS NOT NULL AS direct
FROM removed
JOIN kept USING (cluster_id)
LEFT JOIN sym s ON s.r = removed_id AND s.kp = kept_id
"""


def quality_repetition() -> str:
    """Twin of quality.repetition_stats: Gopher-style repetition signals +
    composite verdict. Line/paragraph/symbol signals are list expressions;
    the top-2-gram is unnest → group → per-doc (cnt DESC, ng DESC) pick,
    mirroring Spark's max(struct(cnt, ng)) tie-break."""
    lines = (
        "list_filter(list_transform(string_split(t, chr(10)), "
        "x -> trim(x)), x -> x != '')"
    )
    paras = (
        "list_filter(list_transform(string_split_regex(t, '\\n{2,}'), "
        "x -> trim(x)), x -> x != '')"
    )
    symbol_hits = " + ".join(
        _count_substr("t", n) for n in ("#", "...", "…")
    )
    thr = ", ".join(
        f"{v!r} AS _t_{k}"
        for k, v in (
            ("dup_line", 0.30),
            ("dup_para", 0.30),
            ("top2", 0.20),
            ("symbol", 0.10),
            ("bullet", 0.90),
            ("ellipsis", 0.30),
        )
    )
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
arrs AS (
  SELECT doc_id, t,
         {lines} AS lines,
         {paras} AS paras,
         {_words('t')} AS w,
         {_tokens('t')} AS tok,
         length(t) AS n_chars
  FROM base
),
feats AS (
  SELECT doc_id, n_chars,
    len(lines) AS n_lines,
    round((len(lines) - len(list_distinct(lines)))
          / greatest(len(lines), 1), 6) AS dup_line_frac,
    round((len(paras) - len(list_distinct(paras)))
          / greatest(len(paras), 1), 6) AS dup_para_frac,
    round(({symbol_hits}) / greatest(len(w), 1), 6) AS symbol_word_ratio,
    round(len(list_filter(lines, x -> starts_with(x, '-')
          OR starts_with(x, '*') OR starts_with(x, '•')))
          / greatest(len(lines), 1), 6) AS bullet_line_frac,
    round(len(list_filter(lines, x -> ends_with(x, '...')
          OR ends_with(x, '…')))
          / greatest(len(lines), 1), 6) AS ellipsis_line_frac
  FROM arrs
),
ngr AS (
  SELECT doc_id, unnest({_bigrams('tok')}) AS ng FROM arrs
),
cnts AS (
  SELECT doc_id, ng, count(*) AS cnt FROM ngr GROUP BY 1, 2
),
top AS (
  SELECT doc_id, ng, cnt,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, ng DESC) AS rn
  FROM cnts
),
joined AS (
  SELECT f.*, coalesce(tp.ng, '') AS top_2gram,
         round(least(coalesce(tp.cnt * length(tp.ng), 0)
               / greatest(f.n_chars, 1), 1.0), 6) AS top_2gram_char_frac,
         {thr}
  FROM feats f LEFT JOIN top tp ON tp.doc_id = f.doc_id AND tp.rn = 1
)
SELECT doc_id, n_lines, dup_line_frac, dup_para_frac, symbol_word_ratio,
       bullet_line_frac, ellipsis_line_frac, top_2gram,
       top_2gram_char_frac,
       (dup_line_frac <= _t_dup_line AND dup_para_frac <= _t_dup_para
        AND top_2gram_char_frac <= _t_top2
        AND symbol_word_ratio <= _t_symbol
        AND bullet_line_frac <= _t_bullet
        AND ellipsis_line_frac <= _t_ellipsis) AS repetition_pass
FROM joined
"""


def pii_scan() -> str:
    """Twin of pii.pii_scan — same regexes under RE2; counts on the
    original text, redaction applied email → ipv4 → phone."""
    from model_audit_spark.operators.pii import PII_PATTERNS

    def q(p: str) -> str:
        return "'" + p.replace("'", "''") + "'"

    email, ipv4, phone = (
        q(PII_PATTERNS["email"]), q(PII_PATTERNS["ipv4"]),
        q(PII_PATTERNS["phone"]),
    )
    red = (
        f"regexp_replace(regexp_replace(regexp_replace(t, {email}, "
        f"'[EMAIL]', 'g'), {ipv4}, '[IP]', 'g'), {phone}, '[PHONE]', 'g')"
    )
    return f"""
WITH base AS (SELECT doc_id, coalesce(text, '') AS t FROM documents)
SELECT doc_id,
  len(regexp_extract_all(t, {email})) AS n_emails,
  len(regexp_extract_all(t, {phone})) AS n_phones,
  len(regexp_extract_all(t, {ipv4})) AS n_ipv4,
  (len(regexp_extract_all(t, {email})) + len(regexp_extract_all(t, {phone}))
   + len(regexp_extract_all(t, {ipv4}))) > 0 AS has_pii,
  {red} AS redacted
FROM base
"""


def pack_chunks(
    context_len: int = 2048, n_shards: int = 8, salt: str = "pack"
) -> str:
    """Twin of packing.pack_chunks: md5 shard bucket, per-shard running
    BPE-token offsets, integer-division chunk ids."""
    from model_audit_spark.operators.text_analysis import BPE_PATTERN

    h = _hex32(f"md5(CAST(doc_id AS VARCHAR) || ':{salt}')")
    return f"""
WITH t AS (
  SELECT doc_id,
    CAST({h} AS BIGINT) % 10000 % {n_shards} AS shard,
    CAST(len(regexp_extract_all(coalesce(text, ''),
         {sql_quote(BPE_PATTERN)})) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_off
  FROM t
)
SELECT doc_id, shard, n_tokens, start_off,
  start_off // {context_len} AS chunk_first,
  CASE WHEN n_tokens > 0
       THEN (start_off + n_tokens - 1) // {context_len}
       ELSE start_off // {context_len} END AS chunk_last,
  (CASE WHEN n_tokens > 0
        THEN (start_off + n_tokens - 1) // {context_len}
        ELSE start_off // {context_len} END)
    > (start_off // {context_len}) AS spans_boundary
FROM c
"""


def length_bucketed_batches(
    batch_size: int = 32, n_shards: int = 8, salt: str = "batch"
) -> str:
    """Twin of packing.length_bucketed_batches: md5 shard, per-shard
    (n_tokens, id) row_number → batch ids, batch-max padding."""
    from model_audit_spark.operators.text_analysis import BPE_PATTERN

    h = _hex32(f"md5(CAST(doc_id AS VARCHAR) || ':{salt}')")
    return f"""
WITH t AS (
  SELECT doc_id,
    CAST({h} AS BIGINT) % 10000 % {n_shards} AS shard,
    CAST(len(regexp_extract_all(coalesce(text, ''),
         {sql_quote(BPE_PATTERN)})) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, shard, n_tokens,
    CAST((row_number() OVER (PARTITION BY shard
          ORDER BY n_tokens, doc_id) - 1) // {batch_size} AS BIGINT)
      AS batch_id
  FROM t
)
SELECT doc_id, shard, n_tokens, batch_id,
  CAST(max(n_tokens) OVER (PARTITION BY shard, batch_id) - n_tokens
       AS BIGINT) AS pad_tokens
FROM b
"""


def dedup_simhash(bits: int = 32) -> str:
    hexval = (
        "(strpos('0123456789abcdef', substring(h, {i}, 1)) - 1)"
    )
    poly = " + ".join(
        f"{hexval.format(i=i + 1)} * {16 ** (7 - i)}" for i in range(8)
    )
    votes = ", ".join(
        f"sum(CASE WHEN tok IS NULL THEN 0 "
        f"WHEN (h32 // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    recompose = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_tokens('text')}) AS tok FROM documents
  UNION ALL
  SELECT doc_id, NULL AS tok FROM documents
    WHERE len({_tokens('text')}) = 0
),
md AS (
  SELECT doc_id, tok, md5(tok) AS h FROM toks
),
hashed AS (
  SELECT doc_id, tok, CASE WHEN tok IS NULL THEN NULL ELSE {poly} END AS h32
  FROM md
),
votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
)
SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash FROM votes
"""


def dedup_simhash_pairs(
    bits: int = 32, bands: int = 4, max_distance: int = 3
) -> str:
    """Banded-hamming twin of dedup.simhash_near_dup_pairs."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    band_values = ", ".join(f"({i})" for i in range(bands))
    return f"""
WITH sims AS ({dedup_simhash(bits)}),
bands AS (
  SELECT doc_id, simhash,
         t.band, (simhash >> (t.band * {band_bits})) & {mask} AS bv
  FROM sims CROSS JOIN (VALUES {band_values}) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bv = b.bv
             AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {max_distance}
"""


def ann_lsh_topk(
    query_vec_id: int = 0, k: int = 10, n_planes: int = 6, dim: int = 64
) -> str:
    """Twin of similarity.lsh_topk — the seeded hyperplanes are
    deterministic driver-side literals, so the bucketing itself is
    reproducible in SQL (plane rows embedded with full-precision repr)."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes)
    rows = ", ".join(
        f"({i}, [" + ", ".join(repr(x) for x in p) + "])"
        for i, p in enumerate(planes)
    )
    return f"""
WITH planes(pi, pv) AS (VALUES {rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, any_value(v) AS v,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id
),
q AS (SELECT v AS qv, bucket AS qb FROM sigs WHERE vec_id = {query_vec_id}),
cands AS (
  SELECT s.vec_id,
    round(list_sum(list_transform(range(1, {dim} + 1),
                                  j -> s.v[j] * q.qv[j]))
      / (sqrt(list_sum(list_transform(s.v, x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6)
      AS cosine_sim
  FROM sigs s JOIN q ON s.bucket = q.qb
)
SELECT vec_id, cosine_sim FROM cands
ORDER BY cosine_sim DESC, vec_id ASC LIMIT {k}
"""


def pq_topk(
    query_vec_id: int = 0, k: int = 10, m: int = 8, kc: int = 16,
    dim: int = 64,
) -> str:
    """Twin of similarity.pq_topk with pq_codebooks_seeded: codebooks =
    subspace slices of the kc lowest-id vectors (derived IN SQL — no
    data literals), per-sub squared-L2 argmin (9dp, ties to lowest
    centroid index), ADC distance = Σ table lookups, 6dp."""
    d = dim // m
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cb AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
  FROM v ORDER BY vec_id LIMIT {kc}
),
subs AS (SELECT unnest(range(0, {m})) AS s),
dists AS (
  SELECT a.vec_id, s.s, c.cidx,
    round(list_sum(list_transform(range(1, {d} + 1),
      j -> (a.v[s.s * {d} + j] - c.cv[s.s * {d} + j])
         * (a.v[s.s * {d} + j] - c.cv[s.s * {d} + j]))), 9) AS dist
  FROM v a CROSS JOIN subs s CROSS JOIN cb c
),
enc AS (
  SELECT vec_id, s, cidx AS code FROM (
    SELECT vec_id, s, cidx,
           row_number() OVER (PARTITION BY vec_id, s
                              ORDER BY dist, cidx) AS rn
    FROM dists
  ) WHERE rn = 1
),
qtab AS (
  SELECT s, cidx, dist FROM dists WHERE vec_id = {query_vec_id}
),
adc AS (
  SELECT e.vec_id, round(sum(q.dist), 6) AS adc_dist
  FROM enc e JOIN qtab q ON q.s = e.s AND q.cidx = e.code
  GROUP BY e.vec_id
)
SELECT vec_id, adc_dist FROM adc
ORDER BY adc_dist ASC, vec_id ASC LIMIT {k}
"""


def pq_rerank_topk(
    query_vec_id: int = 0, k: int = 10, shortlist: int = 50,
    m: int = 8, kc: int = 16, dim: int = 64,
) -> str:
    """Twin of similarity.pq_rerank_topk: the PQ shortlist SQL feeds an
    exact-cosine re-rank identical to the cosine_topk arithmetic."""
    inner = pq_topk(query_vec_id, shortlist, m, kc, dim)
    return f"""
WITH short AS (SELECT vec_id FROM ({inner})),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM v WHERE vec_id = {query_vec_id})
SELECT c.vec_id,
  round(list_sum(list_transform(range(1, {dim} + 1),
                                j -> c.v[j] * q.qv[j]))
    / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
       * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6)
    AS cosine_sim
FROM v c JOIN short s ON s.vec_id = c.vec_id CROSS JOIN q
ORDER BY cosine_sim DESC, c.vec_id ASC LIMIT {k}
"""


def ann_lsh_multiprobe_topk(
    query_vec_id: int = 0, k: int = 10, n_planes: int = 6,
    probe_radius: int = 1, dim: int = 64,
) -> str:
    """Twin of similarity.lsh_multiprobe_topk — identical to
    ann_lsh_topk except the candidate predicate probes every bucket
    within `probe_radius` bit flips of the query bucket."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes)
    rows = ", ".join(
        f"({i}, [" + ", ".join(repr(x) for x in p) + "])"
        for i, p in enumerate(planes)
    )
    return f"""
WITH planes(pi, pv) AS (VALUES {rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, any_value(v) AS v,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id
),
q AS (SELECT v AS qv, bucket AS qb FROM sigs WHERE vec_id = {query_vec_id}),
cands AS (
  SELECT s.vec_id,
    round(list_sum(list_transform(range(1, {dim} + 1),
                                  j -> s.v[j] * q.qv[j]))
      / (sqrt(list_sum(list_transform(s.v, x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6)
      AS cosine_sim
  FROM sigs s JOIN q ON bit_count(xor(s.bucket, q.qb)) <= {probe_radius}
)
SELECT vec_id, cosine_sim FROM cands
ORDER BY cosine_sim DESC, vec_id ASC LIMIT {k}
"""


def embedding_near_dups(
    threshold: float = 0.4, n_planes: int = 8, dim: int = 64
) -> str:
    """Twin of similarity.embedding_cosine_pairs — the LSH-bucketed
    near-dup pairs. Same trick as ann_lsh_topk: the seeded hyperplanes are
    deterministic driver-side literals, so the bucket assignment is
    reproducible in SQL and the approximate result is hash-checkable."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes)
    rows = ", ".join(
        f"({i}, [" + ", ".join(repr(x) for x in p) + "])"
        for i, p in enumerate(planes)
    )
    return f"""
WITH planes(pi, pv) AS (VALUES {rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, any_value(v) AS v,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round(
      list_sum(list_transform(range(1, {dim} + 1), i -> a.v[i] * b.v[i]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))),
    6) AS cosine_sim
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs
WHERE cosine_sim >= {threshold}
"""


def ann_ivf_topk(
    query_vec_id: int = 0,
    k: int = 10,
    n_clusters: int = 8,
    nprobe: int = 3,
    dim: int = 64,
) -> str:
    """Twin of similarity.ivf_assign + ivf_probe with the seeded-sample
    quantizer (ivf_centroids_seeded): centroids are the n_clusters
    lowest-id vectors, so the whole index build is reproducible in SQL.
    Assignment argmax drops the shared norm(v) factor exactly like the
    Spark side (dot / |centroid| only), ties break on lowest cid."""
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS cn
  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {n_clusters})
),
scored AS (
  SELECT vec_id, v, cid,
    list_sum(list_transform(range(1, {dim} + 1), j -> v[j] * cv[j])) / cn
      AS s
  FROM v CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cid ASC) AS rn
    FROM scored) WHERE rn = 1
),
q AS (SELECT v AS qv FROM v WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid FROM (
    SELECT c.cid,
      list_sum(list_transform(range(1, {dim} + 1), j -> q.qv[j] * c.cv[j]))
        / c.cn AS s
    FROM cents c CROSS JOIN q
    ORDER BY s DESC, c.cid ASC LIMIT {nprobe})
),
cands AS (
  SELECT a.vec_id,
    round(
      list_sum(list_transform(range(1, {dim} + 1), j -> a.v[j] * q.qv[j]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
    6) AS cosine_sim
  FROM assigned a JOIN probe USING (cid) CROSS JOIN q
)
SELECT vec_id, cosine_sim FROM cands
ORDER BY cosine_sim DESC, vec_id ASC LIMIT {k}
"""


def semantic_dedup(
    threshold: float = 0.4, n_clusters: int | None = None, dim: int = 64
) -> str:
    """Twin of similarity.semantic_dedup: seeded-sample quantizer
    assignment (same CTEs as ann_ivf_topk), within-cluster pairwise
    cosine, drop vectors matching a lower-id cluster-mate. When
    n_clusters is None, k = ceil(sqrt(N)) is derived in-query — the same
    rule as similarity.derived_n_clusters (IEEE sqrt is exact on perfect
    squares below 2^52, so ceil(sqrt()) == the integer-exact isqrt ceil
    for any realistic N)."""
    limit = (
        str(n_clusters)
        if n_clusters is not None
        else "(SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) FROM v)"
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS cn
  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {limit})
),
scored AS (
  SELECT vec_id, v, cid,
    list_sum(list_transform(range(1, {dim} + 1), j -> v[j] * cv[j])) / cn
      AS s
  FROM v CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cid ASC) AS rn
    FROM scored) WHERE rn = 1
),
pairs AS (
  SELECT b.vec_id AS id_b,
    round(
      list_sum(list_transform(range(1, {dim} + 1), j -> a.v[j] * b.v[j]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))),
    6) AS s
  FROM assigned a JOIN assigned b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
),
prior AS (
  SELECT id_b AS vec_id, max(s) AS mx FROM pairs GROUP BY 1
)
SELECT a.vec_id, CAST(a.cid AS INT) AS cluster,
       round(coalesce(p.mx, 0.0), 6) AS max_prior_sim,
       coalesce(p.mx, 0.0) < {threshold!r} AS keep
FROM assigned a LEFT JOIN prior p ON p.vec_id = a.vec_id
"""


def embedding_pairs_exact(threshold: float = 0.9) -> str:
    """Exact twin of similarity.embedding_cosine_pairs_exact."""
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round(
      list_sum(list_transform(range(1, len(a.v) + 1),
                              i -> a.v[i] * b.v[i]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))),
    6) AS cosine_sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine_sim FROM pairs
WHERE cosine_sim >= {threshold}
"""


def similarity_topk(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}
),
pairs AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding) + 1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
      AS dot,
    sqrt(list_sum(list_transform(e.embedding,
      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
    sqrt(list_sum(list_transform(q.qv,
      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round(dot / (na * nb), 6) AS cosine_sim
FROM pairs
ORDER BY cosine_sim DESC, vec_id ASC
LIMIT {k}
"""


def cka_labels(label_a: int = 0, label_b: int = 1, n: int = 40) -> str:
    def side(label: int, name: str) -> str:
        return f"""
{name}_rows AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS sample, embedding
  FROM embeddings WHERE label = {label}
  QUALIFY sample < {n}
),
{name}_long AS (
  SELECT sample, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM {name}_rows, unnest(range(1, len(embedding) + 1)) AS t(i)
),
{name}_c AS (
  SELECT sample, dim, v - avg(v) OVER (PARTITION BY dim) AS v
  FROM {name}_long
)"""

    return f"""
WITH {side(label_a, 'x').lstrip()},
{side(label_b, 'y').lstrip()},
gxy AS (
  SELECT x.dim AS dx, y.dim AS dy, sum(x.v * y.v) AS c
  FROM x_c x JOIN y_c y ON x.sample = y.sample GROUP BY 1, 2
),
gxx AS (
  SELECT a.dim AS dx, b.dim AS dy, sum(a.v * b.v) AS c
  FROM x_c a JOIN x_c b ON a.sample = b.sample GROUP BY 1, 2
),
gyy AS (
  SELECT a.dim AS dx, b.dim AS dy, sum(a.v * b.v) AS c
  FROM y_c a JOIN y_c b ON a.sample = b.sample GROUP BY 1, 2
),
h AS (
  SELECT (SELECT sum(c * c) FROM gxy) AS hxy,
         (SELECT sum(c * c) FROM gxx) AS hxx,
         (SELECT sum(c * c) FROM gyy) AS hyy
)
SELECT round(CASE WHEN sqrt(hxx * hyy) < 1e-10 THEN 0::DOUBLE
             ELSE hxy / sqrt(hxx * hyy) END, 6) AS cka
FROM h
"""


def audit_verdict_sources(src_a: str = "src0", src_b: str = "src1") -> str:
    """Two-method audit verdict for one source pair (llmmap + dli vote)."""
    filt = (
        f"(SELECT source, text FROM documents "
        f"WHERE source IN ({sql_quote(src_a)}, {sql_quote(src_b)}))"
    )
    dot = " + ".join(
        f"{_norm_dim(d, f'a.{d}')} * {_norm_dim(d, f'b.{d}')}"
        for d in FINGERPRINT_DIMS
    )
    na = " + ".join(
        f"{_norm_dim(d, f'a.{d}')} * {_norm_dim(d, f'a.{d}')}"
        for d in FINGERPRINT_DIMS
    )
    nb = " + ".join(
        f"{_norm_dim(d, f'b.{d}')} * {_norm_dim(d, f'b.{d}')}"
        for d in FINGERPRINT_DIMS
    )
    return f"""
WITH {_fingerprint_cte(filt + " llm_base", "source")},
llmmap_cmp AS (
  SELECT CASE WHEN sqrt({na}) = 0 OR sqrt({nb}) = 0 THEN 0::DOUBLE
         ELSE ({dot}) / (sqrt({na}) * sqrt({nb})) END AS similarity
  FROM fp a JOIN fp b ON a.source < b.source
),
{_dli_compare_ctes(filt + " dli_base", "source").lstrip()},
comparisons AS (
  SELECT 'llmmap' AS method, similarity,
    similarity >= 0.85::DOUBLE AS is_derived
  FROM llmmap_cmp
  UNION ALL
  SELECT 'dli' AS method,
    round(bigram_sim * 0.4::DOUBLE + feature_sim * 0.6::DOUBLE, 6)
      AS similarity,
    (bigram_sim * 0.4::DOUBLE + feature_sim * 0.6::DOUBLE) >= 0.80::DOUBLE
      AS is_derived
  FROM dli_cmp
)
SELECT
  round(avg(similarity), 6) AS avg_similarity,
  CAST(sum(CASE WHEN is_derived THEN 1 ELSE 0 END) AS BIGINT)
    AS derived_votes,
  count(*) AS total_votes,
  CASE WHEN sum(CASE WHEN is_derived THEN 1 ELSE 0 END) > count(*) / 2.0
       THEN 'likely_derived'
       WHEN avg(similarity) < 0.5::DOUBLE THEN 'independent'
       ELSE 'inconclusive' END AS verdict,
  round(least(abs(avg(similarity) - 0.85::DOUBLE) / 0.15::DOUBLE,
              1.0::DOUBLE), 4) AS confidence
FROM comparisons
"""


def media_decode() -> str:
    """DuckDB twin of decode_image_features over the synthetic media
    relation (__spark_entry__._media_relation: content = utf8(text),
    image rows are doc_id % 3 == 0). The fake decoder chains sha256 over
    HEXDIGEST STRINGS (multimodal._fake_pixels), so DuckDB's
    sha256(VARCHAR) reproduces every block; luma values are the hex-pair
    ints. Sum of <=4096 small ints is exact in double -> the division is
    bit-identical to the Arrow kernel."""
    return """
WITH RECURSIVE imgs AS (
  SELECT doc_id AS media_id, coalesce(text, '') AS t,
         coalesce(length(text) % 64 + 1, 0) AS w,
         coalesce(length(text) % 32 + 1, 0) AS h
  FROM documents WHERE doc_id % 3 = 0
),
params AS (
  SELECT media_id, w, h, greatest(w * h, 1) AS n_pixels,
         CAST(least(greatest(w * h, 1), 4096) AS INT) AS sn,
         sha256(t) AS h0
  FROM imgs
),
chain AS (
  SELECT media_id, 0 AS i, h0 AS hx, sn FROM params
  UNION ALL
  SELECT media_id, i + 1, sha256(hx), sn FROM chain WHERE (i + 1) * 32 < sn
),
vals AS (
  SELECT c.media_id,
         strpos('0123456789abcdef', substr(c.hx, 2 * j + 1, 1)) * 16
         + strpos('0123456789abcdef', substr(c.hx, 2 * j + 2, 1)) - 17 AS v
  FROM chain c, unnest(range(0, 32)) AS t(j)
  WHERE c.i * 32 + j < c.sn
)
SELECT p.media_id,
       CAST(p.w AS INT) AS width, CAST(p.h AS INT) AS height,
       CAST(p.n_pixels AS BIGINT) AS n_pixels,
       round(sum(v)::DOUBLE / p.sn, 6) AS mean_luma,
       substr(p.h0, 1, 16) AS content_digest
FROM vals JOIN params p USING (media_id)
GROUP BY p.media_id, p.w, p.h, p.n_pixels, p.sn, p.h0
ORDER BY p.media_id
"""


def reef_layer_cka(n_layers: int = 4, n_samples: int = 8) -> str:
    """Per-layer linear CKA twin of operators/reef.layer_cka as driven by
    __spark_entry__._reef_layer_cka: models m0/m1 from embeddings labels
    0/1, layer = vec_id % n_layers, sample = per-(label, layer) rank by
    vec_id, first n_samples. Same centered-Gram HSIC formula as
    cka_labels, grouped by layer."""
    return f"""
WITH ranked AS (
  SELECT label, CAST(vec_id % {n_layers} AS INT) AS layer,
         row_number() OVER (
           PARTITION BY label, vec_id % {n_layers} ORDER BY vec_id
         ) - 1 AS sample,
         embedding
  FROM embeddings WHERE label IN (0, 1)
  QUALIFY sample < {n_samples}
),
long AS (
  SELECT label, layer, sample, i - 1 AS dim,
         CAST(embedding[i] AS DOUBLE) AS v
  FROM ranked, unnest(range(1, len(embedding) + 1)) AS t(i)
),
centered AS (
  SELECT label, layer, sample, dim,
         v - avg(v) OVER (PARTITION BY label, layer, dim) AS v
  FROM long
),
gxy AS (
  SELECT x.layer, x.dim AS dx, y.dim AS dy, sum(x.v * y.v) AS c
  FROM centered x JOIN centered y
    ON x.layer = y.layer AND x.sample = y.sample
  WHERE x.label = 0 AND y.label = 1
  GROUP BY 1, 2, 3
),
gxx AS (
  SELECT a.layer, a.dim AS dx, b.dim AS dy, sum(a.v * b.v) AS c
  FROM centered a JOIN centered b
    ON a.layer = b.layer AND a.sample = b.sample
  WHERE a.label = 0 AND b.label = 0
  GROUP BY 1, 2, 3
),
gyy AS (
  SELECT a.layer, a.dim AS dx, b.dim AS dy, sum(a.v * b.v) AS c
  FROM centered a JOIN centered b
    ON a.layer = b.layer AND a.sample = b.sample
  WHERE a.label = 1 AND b.label = 1
  GROUP BY 1, 2, 3
),
h AS (
  SELECT x.layer,
         (SELECT sum(c * c) FROM gxy g WHERE g.layer = x.layer) AS hxy,
         (SELECT sum(c * c) FROM gxx g WHERE g.layer = x.layer) AS hxx,
         (SELECT sum(c * c) FROM gyy g WHERE g.layer = x.layer) AS hyy
  FROM (SELECT DISTINCT layer FROM ranked) x
)
SELECT layer,
       round(CASE WHEN sqrt(hxx * hyy) < 1e-10 THEN 0::DOUBLE
             ELSE hxy / sqrt(hxx * hyy) END, 6) AS cka
FROM h
ORDER BY layer
"""


def curate_corpus(
    min_quality: float = 0.6,
    langs: tuple = ("en",),
    min_jaccard: float = 0.5,
) -> str:
    """Composed twin of operators/curate.curate_corpus: the three stage
    oracles (text_stats quality/lang, dedup_exact keep-first,
    dedup_minhash_pairs near-dup set) as derived tables + the same
    first-failing-stage CASE precedence."""
    lang_list = ", ".join(sql_quote(lang) for lang in langs)
    return f"""
WITH stats AS (
  SELECT doc_id, quality_score, lang_pred FROM ({text_stats()})
),
exact AS (
  SELECT doc_id, is_first FROM ({dedup_exact()})
),
near AS (
  SELECT DISTINCT id_b AS doc_id FROM ({dedup_minhash_pairs(min_jaccard)})
),
j AS (
  SELECT s.doc_id, s.lang_pred, s.quality_score, e.is_first,
         n.doc_id IS NOT NULL AS is_near
  FROM stats s JOIN exact e USING (doc_id)
  LEFT JOIN near n USING (doc_id)
)
SELECT doc_id, lang_pred, quality_score,
  CASE WHEN lang_pred NOT IN ({lang_list}) THEN 'lang'
       WHEN quality_score < {min_quality!r} THEN 'quality'
       WHEN NOT is_first THEN 'exact_dup'
       WHEN is_near THEN 'near_dup' END AS drop_reason,
  (lang_pred IN ({lang_list}) AND quality_score >= {min_quality!r}
   AND is_first AND NOT is_near) AS kept
FROM j
"""


def q_events_asof() -> str:
    """DuckDB native ASOF LEFT JOIN twin of operators/asof.asof_join."""
    return """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       c.event_id AS click_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_events_range_join(lookback_minutes: int = 10) -> str:
    """Bounded-interval join twin: clicks in the lookback window before
    each purchase; DECIMAL sum -> round -> double, matching the Spark
    side's order-independent aggregation."""
    return f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       count(*) AS n_clicks,
       round(CAST(sum(c.value) AS DOUBLE), 2) AS click_value
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL {lookback_minutes} MINUTE
 AND c.ts < p.ts
GROUP BY p.event_id, p.user_id
"""


def c4_clean() -> str:
    """Twin of c4.c4_clean_stats: line-tier terminal-punctuation /
    min-words / boilerplate rules, doc-tier sentence-count and lorem/brace
    gates. All integer/string/bool outputs — no float-order hazard."""
    line_kept = (
        "(ends_with(x, '.') OR ends_with(x, '!') OR ends_with(x, '?')"
        " OR ends_with(x, '\"') OR ends_with(x, '”'))"
        r" AND len(string_split_regex(x, '\s+')) >= 3"
        " AND NOT (contains(lower(x), 'javascript')"
        " OR contains(lower(x), 'cookie')"
        " OR contains(lower(x), 'privacy policy')"
        " OR contains(lower(x), 'terms of use'))"
    )
    n_sent = _sentence_count("kept_text")
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
arrs AS (
  SELECT doc_id, t,
    list_filter(list_transform(string_split(t, chr(10)), x -> trim(x)),
                x -> x != '') AS lines
  FROM base
),
kept AS (
  SELECT doc_id, t, lines,
    list_filter(lines, x -> {line_kept}) AS k
  FROM arrs
),
agg AS (
  SELECT doc_id, t, lines, k,
         coalesce(array_to_string(k, chr(10)), '') AS kept_text
  FROM kept
)
SELECT doc_id,
  len(lines) AS n_lines,
  len(k) AS n_kept_lines,
  round(len(k) / greatest(len(lines), 1), 6) AS kept_frac,
  {n_sent} AS n_sentences,
  contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
  contains(t, '{{') AS has_brace,
  length(kept_text) AS kept_len,
  md5(kept_text) AS kept_md5,
  ({n_sent} >= 5
   AND NOT contains(lower(t), 'lorem ipsum')
   AND NOT contains(t, '{{')) AS c4_pass
FROM agg
"""


def paragraph_dedup() -> str:
    """Twin of dedup.paragraph_dedup_stats: global-first-occurrence
    paragraph dedup. Spark's min(struct(doc_id, pos)) winner = the rn=1
    row of a (doc_id, pos) window — same total order, no ties (positions
    are unique within a doc)."""
    return r"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
plist AS (
  SELECT doc_id,
    list_filter(list_transform(string_split_regex(t, '\n{2,}'),
                x -> trim(x)), x -> x != '') AS ps
  FROM base
),
occ AS (
  SELECT doc_id, u['pos'] AS pos, md5(u['para']) AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(ps, (x, i) -> {'para': x, 'pos': i})) AS u
    FROM plist
  )
),
ranked AS (
  SELECT doc_id, pos, h,
         count(*) OVER (PARTITION BY h) AS n_total,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM occ
)
SELECT doc_id,
  count(*) AS n_paras,
  CAST(sum(CASE WHEN n_total > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_paras,
  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  round((count(*) - sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END))
        / greatest(count(*), 1), 6) AS keep_frac
FROM ranked
GROUP BY doc_id
"""


def char_lm_scores() -> str:
    """Twin of lm.char_lm_scores: corpus char-bigram cross-entropy in
    integer nanonats (see lm.py docstring) — the only doubles are ln over
    exact integers (quantized at 1e9, far below engine ulp divergence)
    and one final exact-int/1e9 division, bit-identical across engines.
    Deliberately NO engine-side round() on a double anywhere."""
    return r"""
WITH base AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN length(t) >= 2
         THEN list_transform(range(1, length(t)), i -> substr(t, i, 2))
         ELSE []::VARCHAR[] END) AS bigram
  FROM base
),
lm AS (SELECT bigram, count(*) AS cnt FROM bg GROUP BY 1),
tot AS (
  SELECT CAST(round(ln(sum(cnt)) * 1000000000.0) AS BIGINT) AS lnt9
  FROM lm
),
dc AS (SELECT doc_id, bigram, count(*) AS m FROM bg GROUP BY 1, 2),
scored AS (
  SELECT doc_id,
         CAST(sum(m) AS BIGINT) AS n_bigrams,
         CAST(sum(m * CAST(round(ln(cnt) * 1000000000.0) AS BIGINT))
              AS BIGINT) AS s9
  FROM dc JOIN lm USING (bigram)
  GROUP BY doc_id
)
SELECT b.doc_id,
  coalesce(sc.n_bigrams, 0) AS n_bigrams,
  CASE WHEN coalesce(sc.n_bigrams, 0) > 0 THEN
    CAST(t.lnt9 - ((sc.s9 + sc.n_bigrams // 2) // sc.n_bigrams)
         AS DOUBLE) / 1000000000.0
  END AS lm_score
FROM (SELECT DISTINCT doc_id FROM base) b
LEFT JOIN scored sc ON sc.doc_id = b.doc_id
CROSS JOIN tot t
"""


def budget_select(budget_tokens: int = 15000) -> str:
    """Twin of sampling.budget_select: greedy best-first selection under a
    global token budget. The single-node formulation IS the global
    running-sum window; the Spark side reproduces it with sharded prefix
    offsets (unique ranking key -> identical prefix sums)."""
    return f"""
WITH ts AS ({text_stats()})
SELECT doc_id,
  CAST(n_bpe_tokens AS BIGINT) AS n_tokens,
  CAST(sum(CAST(n_bpe_tokens AS BIGINT)) OVER (
    ORDER BY quality_score DESC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS cum_tokens,
  (CAST(sum(CAST(n_bpe_tokens AS BIGINT)) OVER (
    ORDER BY quality_score DESC, doc_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
   - CAST(n_bpe_tokens AS BIGINT)) < {budget_tokens} AS selected
FROM ts
"""


def q_events_rolling() -> str:
    """Rolling 1-hour per-user event features via a RANGE interval frame.
    DECIMAL sum (exact, order-independent) -> double at the end; the frame
    is anchored on epoch micros so both engines bound it identically."""
    return """
SELECT event_id, user_id,
  count(*) OVER w AS n_1h,
  round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
    AS value_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def knn_graph(
    k: int = 5, n_bands: int = 4, planes_per_band: int = 6, dim: int = 64
) -> str:
    """Twin of similarity.knn_graph: multi-band LSH candidate generation
    (seeded hyperplanes per band embedded as literals — the ann_lsh_topk
    trick ×n_bands), exact-cosine verify, per-source top-k by
    (cosine desc, dst asc)."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    rows = []
    for b in range(n_bands):
        planes = random_hyperplanes(dim, planes_per_band, seed=42 + b)
        for i, p in enumerate(planes):
            rows.append(
                f"({b}, {i}, [" + ", ".join(repr(x) for x in p) + "])"
            )
    plane_rows = ", ".join(rows)
    return f"""
WITH planes(band, pi, pv) AS (VALUES {plane_rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, band,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id, band
),
cand AS (
  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
  FROM sigs a
  JOIN sigs b ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id != b.vec_id
),
scored AS (
  SELECT c.src, c.dst,
    round(
      list_sum(list_transform(range(1, {dim} + 1), i -> sv.v[i] * dv.v[i]))
      / (sqrt(list_sum(list_transform(sv.v, x -> x * x)))
         * sqrt(list_sum(list_transform(dv.v, x -> x * x)))),
    6) AS cosine_sim
  FROM cand c
  JOIN v sv ON sv.vec_id = c.src
  JOIN v dv ON dv.vec_id = c.dst
),
ranked AS (
  SELECT src, dst, cosine_sim,
         row_number() OVER (PARTITION BY src
                            ORDER BY cosine_sim DESC, dst ASC) AS rank
  FROM scored
)
SELECT src, dst, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM ranked WHERE rank <= {k}
"""


def knn_graph_windowed(
    k: int = 5,
    n_bands: int = 4,
    planes_per_band: int = 4,
    dim: int = 64,
    bucket_window: int = 4,
) -> str:
    """Twin of similarity.knn_graph with bucket_window (r11 SortingLSH
    bounded mode): within each (band, bucket), points are ordered by
    the dot against ONE extra seeded hyperplane (seed 42 + 9973, the
    Spark side's order plane) with vec_id tiebreak; an unordered pair
    is a candidate iff 1 <= pos_b - pos_a <= W; both graph directions
    are emitted (cosine is symmetric) before the distinct + top-k.
    Ordering doubles (r12, ADVICE): the sort key is the QUANTIZED
    projection floor(proj*1e9 + 0.5) — the portable half-up — on both
    engines, so a last-ulp cross-engine difference cannot reorder a
    bucket; near-ties collapse to equal keys and break on vec_id."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    rows = []
    for b in range(n_bands):
        planes = random_hyperplanes(dim, planes_per_band, seed=42 + b)
        for i, p in enumerate(planes):
            rows.append(
                f"({b}, {i}, [" + ", ".join(repr(x) for x in p) + "])"
            )
    plane_rows = ", ".join(rows)
    op = random_hyperplanes(dim, 1, seed=42 + 9973)[0]
    order_plane = "[" + ", ".join(repr(x) for x in op) + "]"
    return f"""
WITH planes(band, pi, pv) AS (VALUES {plane_rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, band,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id, band
),
pos AS (
  SELECT s.vec_id, s.band, s.bucket,
         row_number() OVER (
           PARTITION BY s.band, s.bucket
           ORDER BY floor(list_sum(list_transform(range(1, {dim} + 1),
                    j -> v.v[j] * ({order_plane}::DOUBLE[])[j]))
                    * 1e9 + 0.5) ASC,
                    s.vec_id ASC
         ) AS p
  FROM sigs s JOIN v ON v.vec_id = s.vec_id
),
half AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM pos a
  JOIN pos b ON a.band = b.band AND a.bucket = b.bucket
            AND b.p - a.p BETWEEN 1 AND {bucket_window}
),
cand AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM half
    UNION ALL
    SELECT dst AS src, src AS dst FROM half
  )
),
scored AS (
  SELECT c.src, c.dst,
    round(
      list_sum(list_transform(range(1, {dim} + 1), i -> sv.v[i] * dv.v[i]))
      / (sqrt(list_sum(list_transform(sv.v, x -> x * x)))
         * sqrt(list_sum(list_transform(dv.v, x -> x * x)))),
    6) AS cosine_sim
  FROM cand c
  JOIN v sv ON sv.vec_id = c.src
  JOIN v dv ON dv.vec_id = c.dst
),
ranked AS (
  SELECT src, dst, cosine_sim,
         row_number() OVER (PARTITION BY src
                            ORDER BY cosine_sim DESC, dst ASC) AS rank
  FROM scored
)
SELECT src, dst, CAST(rank AS INTEGER) AS rank, cosine_sim
FROM ranked WHERE rank <= {k}
"""


def lang_id_ext() -> str:
    """Twin of functions.text.detect_lang_profile — stopword-profile
    lang-ID with the CJK tier first. The profile word lists are imported
    from the Spark side (single source of truth) and embedded as VALUES;
    the argmax mirrors Spark's max(struct(hits, -rank, lang)) via a
    (hits DESC, rank ASC) window pick."""
    from model_audit_spark.functions.text import LANG_PROFILES

    rows = ", ".join(
        f"({sql_quote(lang)}, {rank}, ["
        + ", ".join(sql_quote(w) for w in ws)
        + "])"
        for rank, (lang, ws) in enumerate(LANG_PROFILES.items())
    )
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
tok AS (
  SELECT doc_id, t, {_tokens('t')} AS toks FROM base
),
profiles(lang, rank, pw) AS (VALUES {rows}),
hits AS (
  SELECT doc_id, t, lang, rank,
         len(list_filter(toks, x -> list_contains(pw, x))) AS h
  FROM tok CROSS JOIN profiles
),
ranked AS (
  SELECT doc_id, t, lang, h,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, rank ASC) AS rn
  FROM hits
)
SELECT doc_id,
  CASE WHEN {_cjk('t')} >= 10
         OR {_cjk('t')} / greatest(length(t), 1) > 0.15 THEN 'zh'
       WHEN h = 0 THEN 'und'
       ELSE lang END AS lang_ext
FROM ranked WHERE rn = 1
"""


def events_rollup_cascade() -> str:
    """Twin of rollup.rollup_cascade — but aggregated at every grain
    DIRECTLY from raw events. The Spark side derives hour from the minute
    pre-aggregate and day from hour; counts and DECIMAL sums re-aggregate
    exactly, so a hash match here proves the cascade equivalence."""
    level = """
SELECT {lit!r} AS level, date_trunc({lit!r}, ts) AS bucket, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 2, 3"""
    return " UNION ALL ".join(
        level.format(lit=lvl) for lvl in ("minute", "hour", "day")
    )


def doc_chunks(chunk_chars: int = 500, overlap: int = 50) -> str:
    """Twin of text_analysis.chunk_text — sliding-window char chunking."""
    stride = chunk_chars - overlap
    return f"""
WITH base AS (
  SELECT doc_id, coalesce(text, '') AS t FROM documents
),
c AS (
  SELECT doc_id, t,
         CASE WHEN length(t) = 0 THEN 0
              WHEN length(t) <= {chunk_chars} THEN 1
              ELSE ((length(t) - {chunk_chars} - 1) // {stride}) + 2
              END AS nc
  FROM base
)
SELECT doc_id,
  CAST(u['i'] AS INTEGER) AS chunk_idx,
  u['s'] AS chunk_text,
  CAST(length(u['s']) AS INTEGER) AS chunk_len
FROM (
  SELECT doc_id, unnest(
    CASE WHEN nc = 0 THEN []
         ELSE list_transform(range(0, nc),
              i -> {{'i': i, 's': substr(t, CAST(i * {stride} + 1 AS INTEGER),
                                         {chunk_chars})}})
    END) AS u
  FROM c
)
"""


def contrastive_triplets(
    n_neg: int = 2,
    n_buckets: int = 16,
    salt: str = "neg",
    k: int = 5,
    n_bands: int = 4,
    planes_per_band: int = 6,
    dim: int = 64,
) -> str:
    """Twin of sampling.contrastive_triplets over knn_graph positives:
    best positive per anchor, negatives drawn from the next md5 bucket,
    known neighbors anti-joined, smallest-draw-first ranking."""
    ab = _hex32(f"md5(CAST(anchor AS VARCHAR) || ':{salt}')")
    nb = _hex32(f"md5(CAST(vec_id AS VARCHAR) || ':{salt}')")
    draw = (
        f"md5(CAST(anchor AS VARCHAR) || ':' || "
        f"CAST(negative AS VARCHAR) || ':{salt}')"
    )
    return f"""
WITH knn AS ({knn_graph(k, n_bands, planes_per_band, dim)}),
ids AS (
  SELECT vec_id AS negative,
         CAST({nb} AS BIGINT) % {n_buckets} AS nb
  FROM embeddings
),
best AS (
  SELECT src AS anchor, dst AS positive
  FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY rank) AS rn
    FROM knn
  ) WHERE rn = 1
),
anch AS (
  SELECT anchor, positive,
         (CAST({ab} AS BIGINT) % {n_buckets} + 1) % {n_buckets} AS ab
  FROM best
),
cand AS (
  SELECT anchor, positive, negative
  FROM anch JOIN ids ON ab = nb
),
known AS (
  SELECT src AS anchor, dst AS negative FROM knn
  UNION ALL
  SELECT dst AS anchor, src AS negative FROM knn
),
filt AS (
  SELECT c.anchor, c.positive, c.negative
  FROM cand c ANTI JOIN known USING (anchor, negative)
),
ranked AS (
  SELECT anchor, positive, negative,
         row_number() OVER (PARTITION BY anchor
                            ORDER BY {draw}, negative) AS neg_rank
  FROM filt
)
SELECT anchor, positive, negative, CAST(neg_rank AS INTEGER) AS neg_rank
FROM ranked WHERE neg_rank <= {n_neg}
"""


def bm25_search(query: str = "spark join filter", k: int = 20) -> str:
    """Twin of search.bm25_search. Same two-stage 9dp rounding (idf per
    term, then each contribution) and exact DECIMAL summation; order and
    top-k cut on the exact DECIMAL, emitted score cast DOUBLE exactly
    like the Spark side (DETERMINISM.md rule 4)."""
    import re as _re

    terms = sorted({t for t in _re.findall(r"[\w]+", query.lower()) if t})
    term_list = ", ".join(sql_quote(t) for t in terms)
    k1, b = 1.2, 0.75
    return f"""
WITH base AS (
  SELECT doc_id, {_tokens("coalesce(text, '')")} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avgdl FROM base
),
hits AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM hits WHERE term IN ({term_list})
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY term
),
terms_idf AS (
  SELECT term,
         round(ln((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1.0), 9)
           AS idf9,
         avgdl
  FROM dfreq CROSS JOIN stats
),
scored AS (
  SELECT tf.doc_id,
         CAST(count(*) AS INTEGER) AS n_hits,
         sum(CAST(round(
           idf9 * (tf * ({k1} + 1))
           / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)), 9)
           AS DECIMAL(28,9))) AS score
  FROM tf JOIN terms_idf USING (term)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_hits, CAST(score AS DOUBLE) AS score
FROM (SELECT * FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k})
"""


def hybrid_search(
    query: str = "spark join filter",
    query_vec_id: int = 0,
    n_cand: int = 50,
    k: int = 20,
    rrf_k: int = 60,
) -> str:
    """Twin of search.hybrid_rrf_search: the certified bm25_search and
    similarity_topk CTEs re-ranked by reciprocal-rank fusion. Each
    1/(rrf_k+rank) contribution is one DOUBLE division (1.0 cast DOUBLE
    explicitly — DuckDB's bare 1.0 literal is DECIMAL and would divide
    under different semantics) rounded 9dp and cast DECIMAL(28,9); sum,
    order, and top-k cut on the exact decimal; emitted score cast
    DOUBLE (DETERMINISM.md rule 4). Ranks cast INTEGER to match
    Spark's row_number type."""
    bm = bm25_search(query=query, k=n_cand)
    cos = similarity_topk(query_vec_id=query_vec_id, k=n_cand)
    c = (
        "coalesce(CAST(round(CAST(1.0 AS DOUBLE) / ({rrf_k} + {rank}), 9)"
        " AS DECIMAL(28,9)), CAST(0 AS DECIMAL(28,9)))"
    )
    return f"""
WITH bm AS ({bm}),
cosr AS ({cos}),
bmr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
              AS INTEGER) AS bm25_rank
  FROM bm
),
cr AS (
  SELECT vec_id AS doc_id,
         CAST(row_number() OVER (ORDER BY cosine_sim DESC, vec_id ASC)
              AS INTEGER) AS cos_rank
  FROM cosr
),
fused AS (
  SELECT coalesce(bmr.doc_id, cr.doc_id) AS doc_id,
         bm25_rank, cos_rank,
         CAST({c.format(rrf_k=rrf_k, rank='bm25_rank')}
              + {c.format(rrf_k=rrf_k, rank='cos_rank')}
              AS DECIMAL(28,9)) AS rrf
  FROM bmr FULL OUTER JOIN cr ON bmr.doc_id = cr.doc_id
)
SELECT doc_id, bm25_rank, cos_rank, CAST(rrf AS DOUBLE) AS rrf_score
FROM (SELECT * FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT {k})
"""


def events_pivot() -> str:
    """Twin of the explicit-values pivot: conditional aggregation."""
    cols = ", ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in ("view", "click", "purchase", "error")
    )
    return f"""
SELECT user_id, {cols}
FROM events GROUP BY user_id
"""


def knn_triangles(
    k: int = 5, n_bands: int = 4, planes_per_band: int = 6, dim: int = 64
) -> str:
    """Twin of cluster.triangle_counts over the kNN graph: normalize to
    distinct undirected a<b edges, wedge join on the middle node, close
    with the third edge, explode the corners.

    Deliberately the naive id-oriented enumeration: per-node triangle
    participation is orientation-invariant, so hash equality certifies
    the Spark side's degree-ordered compact-forward join (the O(m^1.5)
    skew-safe plan) finds exactly the same triangles."""
    inner = knn_graph(k=k, n_bands=n_bands, planes_per_band=planes_per_band,
                      dim=dim)
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({inner}) WHERE src <> dst
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, count(*) AS n_triangles FROM corners GROUP BY node
"""


def phrase_search(phrase: str = "table hash") -> str:
    """Twin of search.phrase_search — |phrase|-gram equality count."""
    import re as _re

    terms = [t for t in _re.findall(r"[\w]+", phrase.lower()) if t]
    n = len(terms)
    target = " ".join(terms)
    join_expr = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    gram_list = (
        f"CASE WHEN len(toks) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len(toks) - {n} + 2), "
        f"i -> {join_expr}) END"
    )
    return f"""
WITH toksrc AS (
  SELECT doc_id, {_tokens("coalesce(text, '')")} AS toks FROM documents
),
counted AS (
  SELECT doc_id,
         CAST(len(list_filter({gram_list}, x -> x = {sql_quote(target)}))
              AS INTEGER) AS n_occurrences
  FROM toksrc
)
SELECT doc_id, n_occurrences FROM counted WHERE n_occurrences > 0
"""


def tfidf_keywords(
    k: int = 3, min_df: int = 2, max_df_frac: float = 0.3
) -> str:
    """Twin of search.tfidf_keywords — smooth idf rounded 9dp per term,
    score = round(idf9·tf/dl, 9) DECIMAL(28,9), ties on term asc; the
    window ranks on the exact DECIMAL, emitted score cast DOUBLE."""
    return f"""
WITH base AS (
  SELECT doc_id, {_tokens("coalesce(text, '')")} AS toks FROM documents
),
stats AS (
  SELECT count(*) AS n_docs FROM base
),
tf AS (
  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
  FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base)
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS dfreq FROM tf GROUP BY term
),
terms_idf AS (
  SELECT term, round(ln((1.0 + n_docs) / (1.0 + dfreq)) + 1.0, 9) AS idf9
  FROM dfreq CROSS JOIN stats
  WHERE dfreq >= {min_df} AND dfreq <= {max_df_frac} * n_docs
),
scored AS (
  SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
         CAST(round(idf9 * tf / dl, 9) AS DECIMAL(28,9)) AS score
  FROM tf JOIN terms_idf USING (term)
),
ranked AS (
  SELECT doc_id, term, tf, score,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC
         ) AS kw_rank
  FROM scored
)
SELECT doc_id, term, tf, CAST(score AS DOUBLE) AS score, kw_rank
FROM ranked WHERE kw_rank <= {k}
"""


def embedding_contamination(
    threshold: float = 0.4, n_planes: int = 8, dim: int = 64,
    eval_mod: int = 5,
) -> str:
    """Twin of decontam.embedding_contamination with the driver split
    (vec_id % eval_mod == 0 is the eval set) — plane literals embedded,
    worst eval match per contaminated training vector."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes)
    rows = ", ".join(
        f"({i}, [" + ", ".join(repr(x) for x in p) + "])"
        for i, p in enumerate(planes)
    )
    return f"""
WITH planes(pi, pv) AS (VALUES {rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, any_value(v) AS v,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id
),
cand AS (
  SELECT t.vec_id AS train_id, e.vec_id AS eval_id,
    round(
      list_sum(list_transform(range(1, {dim} + 1), i -> t.v[i] * e.v[i]))
      / (sqrt(list_sum(list_transform(t.v, x -> x * x)))
         * sqrt(list_sum(list_transform(e.v, x -> x * x)))),
    6) AS cosine_sim
  FROM sigs t JOIN sigs e ON t.bucket = e.bucket
  WHERE t.vec_id % {eval_mod} != 0 AND e.vec_id % {eval_mod} = 0
),
ranked AS (
  SELECT train_id, eval_id, cosine_sim,
         row_number() OVER (PARTITION BY train_id
                            ORDER BY cosine_sim DESC, eval_id ASC) AS rn
  FROM cand WHERE cosine_sim >= {threshold}
)
SELECT train_id, eval_id, cosine_sim FROM ranked WHERE rn = 1
"""


def embedding_contamination_windowed(
    threshold: float = 0.4,
    n_planes: int = 8,
    dim: int = 64,
    eval_mod: int = 5,
    bucket_window: int = 8,
) -> str:
    """Twin of decontam.embedding_contamination with bucket_window (r13
    bounded-candidate SortingLSH mode): train AND eval rows of each LSH
    bucket are ordered TOGETHER by the quantized projection against the
    extra seeded hyperplane (seed 42 + 9973, floor(proj*1e9 + 0.5) —
    the portable half-up, so a last-ulp cross-engine difference cannot
    reorder a bucket) with (is_eval, vec_id) tiebreak; a (train, eval)
    pair is a candidate iff |pos_t - pos_e| <= W in that interleaved
    order — exactly the Spark side's collect_list-over-±W-rows frame
    (the frame gathers eval neighbors only, so frame membership IS the
    position-distance test). Downstream identical to the unbounded
    twin: threshold filter, worst-match row per contaminated train
    vector."""
    from model_audit_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(dim, n_planes)
    rows = ", ".join(
        f"({i}, [" + ", ".join(repr(x) for x in p) + "])"
        for i, p in enumerate(planes)
    )
    op = random_hyperplanes(dim, 1, seed=42 + 9973)[0]
    order_plane = "[" + ", ".join(repr(x) for x in op) + "]"
    return f"""
WITH planes(pi, pv) AS (VALUES {rows}),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
sigs AS (
  SELECT vec_id, any_value(v) AS v,
         CAST(sum(CASE WHEN list_sum(list_transform(range(1, {dim} + 1),
                        j -> v[j] * pv[j])) > 0
                   THEN (1::BIGINT << pi) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN planes GROUP BY vec_id
),
pos AS (
  SELECT vec_id, v, bucket,
         CASE WHEN vec_id % {eval_mod} = 0 THEN 1 ELSE 0 END AS is_eval,
         row_number() OVER (
           PARTITION BY bucket
           ORDER BY floor(list_sum(list_transform(range(1, {dim} + 1),
                    j -> v[j] * ({order_plane}::DOUBLE[])[j]))
                    * 1e9 + 0.5) ASC,
                    CASE WHEN vec_id % {eval_mod} = 0 THEN 1 ELSE 0 END ASC,
                    vec_id ASC
         ) AS p
  FROM sigs
),
cand AS (
  SELECT t.vec_id AS train_id, e.vec_id AS eval_id,
    round(
      list_sum(list_transform(range(1, {dim} + 1), i -> t.v[i] * e.v[i]))
      / (sqrt(list_sum(list_transform(t.v, x -> x * x)))
         * sqrt(list_sum(list_transform(e.v, x -> x * x)))),
    6) AS cosine_sim
  FROM pos t JOIN pos e ON t.bucket = e.bucket
            AND abs(t.p - e.p) <= {bucket_window}
  WHERE t.is_eval = 0 AND e.is_eval = 1
),
ranked AS (
  SELECT train_id, eval_id, cosine_sim,
         row_number() OVER (PARTITION BY train_id
                            ORDER BY cosine_sim DESC, eval_id ASC) AS rn
  FROM cand WHERE cosine_sim >= {threshold}
)
SELECT train_id, eval_id, cosine_sim FROM ranked WHERE rn = 1
"""


def quality_calibrated(keep_frac: float = 0.5) -> str:
    """Twin of text_analysis.quality_calibrated — per-source percentile
    rank of the quality score with the (quality desc, doc_id) tiebreak."""
    return f"""
WITH ts AS ({text_stats()}),
base AS (
  SELECT d.doc_id, d.source, ts.quality_score
  FROM documents d JOIN ts ON ts.doc_id = d.doc_id
)
SELECT doc_id, source, quality_score,
  round(percent_rank() OVER (
    PARTITION BY source
    ORDER BY quality_score DESC, doc_id ASC), 6) AS q_rank,
  percent_rank() OVER (
    PARTITION BY source
    ORDER BY quality_score DESC, doc_id ASC) < {keep_frac} AS keep
FROM base
"""


def span_dedup(span_tokens: int = 20) -> str:
    """Twin of dedup.span_dedup_stats — stride-1 verbatim-span duplication
    counts (position n-grams, corpus-wide digest counts). Docs shorter
    than span_tokens are emitted with n_spans = 0 via the final left
    join, matching the Spark side's explode_outer."""
    n = span_tokens
    grams = (
        f"CASE WHEN len(w) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len(w) - {n} + 2), "
        f"i -> array_to_string(w[i:i+{n - 1}], ' ')) END"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, {_tokens('text')} AS w FROM documents
),
grams AS (
  SELECT doc_id, md5(unnest({grams})) AS h FROM toks
),
counts AS (
  SELECT h, count(*) AS cnt FROM grams GROUP BY h
),
per_doc AS (
  SELECT g.doc_id,
    count(*) AS n_spans,
    sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS n_dup
  FROM grams g JOIN counts c USING (h)
  GROUP BY g.doc_id
)
SELECT t.doc_id,
  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
  round(coalesce(p.n_dup, 0) / greatest(coalesce(p.n_spans, 0), 1), 6)
    AS dup_span_frac
FROM toks t LEFT JOIN per_doc p USING (doc_id)
"""


def dsir_select(
    target_source: str = "src0",
    keep_frac: float = 0.25,
    n_buckets: int = 10_000,
) -> str:
    """Twin of dsir.dsir_select over dsir_weights: per-source
    percent_rank of raw docs by (logweight desc, id), keep = unrounded
    rank < keep_frac."""
    return f"""
WITH w AS ({dsir_weights(target_source, n_buckets)}),
raw AS (
  SELECT w.doc_id, d.source, w.dsir_logweight,
         percent_rank() OVER (
           PARTITION BY d.source
           ORDER BY w.dsir_logweight DESC, w.doc_id ASC
         ) AS pr
  FROM w JOIN documents d ON d.doc_id = w.doc_id
  WHERE NOT w.is_target
)
SELECT doc_id, source, dsir_logweight,
       round(pr, 6) AS w_rank, pr < {keep_frac!r} AS keep
FROM raw
"""


def dsir_weights(
    target_source: str = "src0", n_buckets: int = 10_000
) -> str:
    """Twin of dsir.dsir_weights with is_target = (source = target):
    hashed-bigram bucket counts, add-1 smoothed target/raw log-ratio
    quantized to nanonats per bucket, exact BIGINT per-doc sums; the
    double emitted is nanonats/1e9 (exact-integer division)."""
    b = _hex32("md5(unnest_g)")
    return f"""
WITH base AS (
  SELECT doc_id, source = {sql_quote(target_source)} AS t,
         {_tokens("coalesce(text, '')")} AS w
  FROM documents
),
grams AS (
  SELECT doc_id, t, {_bigrams('w')} AS gs FROM base
),
gx AS (
  SELECT doc_id, t, unnest(gs) AS unnest_g FROM grams
),
bx AS (
  SELECT doc_id, t, {b} % {n_buckets} AS b FROM gx
),
per_doc AS (
  SELECT doc_id, t, b, count(*) AS n FROM bx GROUP BY 1, 2, 3
),
bstats AS (
  SELECT b,
    sum(CASE WHEN t THEN n ELSE 0 END) AS ct,
    sum(CASE WHEN NOT t THEN n ELSE 0 END) AS cr
  FROM per_doc GROUP BY b
),
tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM bstats),
ratio AS (
  SELECT b, CAST(round(ln(
      (CAST(ct + 1 AS DOUBLE) * CAST(tr + {n_buckets} AS DOUBLE))
      / (CAST(cr + 1 AS DOUBLE) * CAST(tt + {n_buckets} AS DOUBLE))
    ) * 1000000000) AS BIGINT) AS r9
  FROM bstats CROSS JOIN tot
),
w AS (
  SELECT p.doc_id,
         CAST(sum(p.n) AS BIGINT) AS n_feats,
         CAST(sum(p.n * r.r9) AS BIGINT) AS nano
  FROM per_doc p JOIN ratio r USING (b)
  GROUP BY p.doc_id
)
SELECT d.doc_id,
  d.source = {sql_quote(target_source)} AS is_target,
  CAST(coalesce(w.n_feats, 0) AS BIGINT) AS n_feats,
  CAST(coalesce(w.nano, 0) AS BIGINT) AS dsir_nanonats,
  CAST(coalesce(w.nano, 0) AS DOUBLE) / 1000000000.0 AS dsir_logweight
FROM documents d LEFT JOIN w USING (doc_id)
"""


def source_overlap(min_jaccard: float = 0.5) -> str:
    """Twin of cluster.source_overlap over the minhash near-dup pairs."""
    return f"""
WITH pairs AS ({dedup_minhash_pairs(min_jaccard=min_jaccard)})
SELECT least(a.source, b.source) AS source_a,
       greatest(a.source, b.source) AS source_b,
       count(*) AS n_pairs
FROM pairs p
JOIN documents a ON a.doc_id = p.id_a
JOIN documents b ON b.doc_id = p.id_b
GROUP BY 1, 2
ORDER BY 1, 2
"""


def funnel_counts(steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    """Twin of asof.funnel_counts — stepwise conditional-min CTE chain."""
    ctes = []
    for i, step in enumerate(steps):
        if i == 0:
            ctes.append(
                f"s0 AS (SELECT user_id AS u, min(ts) AS step_ts "
                f"FROM events WHERE event_type = {sql_quote(step)} "
                f"GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"s{i} AS (SELECT b.user_id AS u, min(b.ts) AS step_ts "
                f"FROM events b JOIN s{i-1} p ON p.u = b.user_id "
                f"WHERE b.event_type = {sql_quote(step)} "
                f"AND b.ts > p.step_ts GROUP BY b.user_id)"
            )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS step_idx, {sql_quote(s)} AS step, "
        f"count(*) AS n_users FROM s{i}"
        for i, s in enumerate(steps)
    )
    return "WITH " + ", ".join(ctes) + " " + selects


def pagerank_dupgraph(
    iterations: int = 3, damping_pct: int = 85, min_jaccard: float = 0.5
) -> str:
    """Twin of cluster.pagerank over the symmetric minhash near-dup graph.
    The integer pico-mass rounds unroll as CTEs; every division is BIGINT
    floor division in the exact same order as the Spark side."""
    scale = 10**12
    d = damping_pct
    ctes = [
        f"pairs AS ({dedup_minhash_pairs(min_jaccard=min_jaccard)})",
        "edges AS (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION ALL SELECT id_b AS u, id_a AS v FROM pairs)",
        "nodes AS (SELECT doc_id AS n FROM documents)",
        "nn AS (SELECT count(*) AS nn FROM nodes)",
        "outdeg AS (SELECT u, count(*) AS outdeg FROM edges GROUP BY u)",
        f"r0 AS (SELECT n, CAST({scale} // nn AS BIGINT) AS pr "
        "FROM nodes CROSS JOIN nn)",
    ]
    for k in range(1, iterations + 1):
        prev = f"r{k - 1}"
        ctes.append(
            f"d{k} AS (SELECT CAST(coalesce(sum(pr), 0) AS BIGINT) AS d "
            f"FROM {prev} LEFT JOIN outdeg ON {prev}.n = outdeg.u "
            f"WHERE outdeg.u IS NULL)"
        )
        ctes.append(
            f"c{k} AS (SELECT e.v AS n, "
            f"CAST(sum(p.pr // o.outdeg) AS BIGINT) AS c "
            f"FROM edges e JOIN {prev} p ON p.n = e.u "
            f"JOIN outdeg o ON o.u = e.u GROUP BY e.v)"
        )
        ctes.append(
            f"r{k} AS (SELECT nodes.n, CAST("
            f"(({scale} * {100 - d}) // 100) // nn "
            f"+ ({d} * (coalesce(c{k}.c, 0) + d{k}.d // nn)) // 100 "
            f"AS BIGINT) AS pr "
            f"FROM nodes LEFT JOIN c{k} ON c{k}.n = nodes.n "
            f"CROSS JOIN d{k} CROSS JOIN nn)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT n AS node, pr FROM r{iterations}"
    )


def dedup_communities(rounds: int = 4, min_jaccard: float = 0.5) -> str:
    """Twin of cluster.label_propagation over the symmetric minhash
    near-dup graph: synchronous rounds unroll as CTEs, argmax =
    row_number over (count DESC, label ASC) — the same least-label tie
    rule the Spark min(struct(-count, label)) aggregate applies."""
    ctes = [
        f"pairs AS ({dedup_minhash_pairs(min_jaccard=min_jaccard)})",
        "edges AS (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION ALL SELECT id_b AS u, id_a AS v FROM pairs)",
        "nodes AS (SELECT doc_id AS n FROM documents)",
        "l0 AS (SELECT n, n AS lbl FROM nodes)",
    ]
    for k in range(1, rounds + 1):
        prev = f"l{k - 1}"
        ctes.append(
            f"m{k} AS (SELECT e.u AS n, p.lbl, count(*) AS cnt "
            f"FROM edges e JOIN {prev} p ON p.n = e.v GROUP BY 1, 2)"
        )
        ctes.append(
            f"w{k} AS (SELECT n, lbl FROM ("
            f"SELECT n, lbl, row_number() OVER ("
            f"PARTITION BY n ORDER BY cnt DESC, lbl ASC) AS rn "
            f"FROM m{k}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{k} AS (SELECT nodes.n, coalesce(w{k}.lbl, nodes.n) AS lbl "
            f"FROM nodes LEFT JOIN w{k} ON w{k}.n = nodes.n)"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT n AS doc_id, lbl AS community FROM l{rounds}"
    )


def dedup_kcore(
    k: int = 2, rounds: int = 8, min_jaccard: float = 0.5
) -> str:
    """Twin of cluster.k_core over the symmetric minhash near-dup
    graph: the synchronous peel unrolls as CTEs — each round keeps the
    nodes whose degree within the previous round's induced subgraph is
    >= k; core_deg is the degree inside the final surviving subgraph
    (0 for peeled nodes). Integer counts only, so the unroll is exact
    round for round regardless of whether the peel has converged."""
    ctes = [
        f"pairs AS ({dedup_minhash_pairs(min_jaccard=min_jaccard)})",
        "edges AS (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION ALL SELECT id_b AS u, id_a AS v FROM pairs)",
        "nodes AS (SELECT doc_id AS n FROM documents)",
        "s0 AS (SELECT n FROM nodes)",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        ctes.append(
            f"d{r} AS (SELECT e.u AS n, count(*) AS deg FROM edges e "
            f"JOIN {prev} a ON a.n = e.u JOIN {prev} b ON b.n = e.v "
            f"GROUP BY 1)"
        )
        ctes.append(f"s{r} AS (SELECT n FROM d{r} WHERE deg >= {k})")
    ctes.append(
        f"dfin AS (SELECT e.u AS n, count(*) AS deg FROM edges e "
        f"JOIN s{rounds} a ON a.n = e.u JOIN s{rounds} b ON b.n = e.v "
        f"GROUP BY 1)"
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f" SELECT nodes.n AS doc_id, s{rounds}.n IS NOT NULL AS in_core,"
        f" CAST(coalesce(dfin.deg, 0) AS BIGINT) AS core_deg"
        f" FROM nodes LEFT JOIN s{rounds} ON s{rounds}.n = nodes.n"
        f" LEFT JOIN dfin ON dfin.n = nodes.n"
    )


def embedding_dim_stats() -> str:
    """Mirror of embstats.embedding_dim_stats: per-dimension moments via
    the explicit (Σv, Σv², n) formulation — NOT engine-native stddev,
    whose Welford-vs-naive difference would diverge below 6dp."""
    return """
WITH long AS (
  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)
SELECT dim, count(*) AS n,
  round(sum(v) / count(*), 6) AS mean,
  round(sum(v * v) / count(*)
        - (sum(v) / count(*)) * (sum(v) / count(*)), 6) AS variance,
  round(min(v), 6) AS min_v,
  round(max(v), 6) AS max_v
FROM long
GROUP BY dim
ORDER BY dim
"""


def label_separation() -> str:
    """Mirror of embstats.centroid_separation: per-label centroids then
    pairwise centroid cosine, label_a < label_b."""
    return """
WITH long AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
cent AS (
  SELECT label, dim, avg(v) AS c FROM long GROUP BY label, dim
),
pairs AS (
  SELECT a.label AS label_a, b.label AS label_b,
    sum(a.c * b.c) AS dot,
    sum(a.c * a.c) AS na2,
    sum(b.c * b.c) AS nb2
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
)
SELECT label_a, label_b,
  round(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cosine
FROM pairs
ORDER BY label_a, label_b
"""


def mixture_weights(alpha: float = 0.7) -> str:
    """Mirror of sampling.temperature_mix_weights over documents
    (stratum=source, size=Σ n_chars)."""
    return f"""
WITH s AS (
  SELECT source AS stratum, count(*) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS size
  FROM documents GROUP BY source
)
SELECT stratum, n_docs, size,
  round(CAST(size AS DOUBLE) / sum(CAST(size AS DOUBLE)) OVER (), 6)
    AS share,
  round(power(CAST(size AS DOUBLE), {alpha}::DOUBLE)
        / sum(power(CAST(size AS DOUBLE), {alpha}::DOUBLE)) OVER (), 6)
    AS weight
FROM s
ORDER BY stratum
"""


def q7_volume_shipping(na: str = "NATION_1", nb: str = "NATION_2") -> str:
    """TPC-H Q7 shape on this schema: bilateral shipping volume between
    two nations by ship year."""
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{na}' AND n2.n_name = '{nb}')
   OR (n1.n_name = '{nb}' AND n2.n_name = '{na}')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def q_salted_revenue() -> str:
    """Oracle twin of the salted_join query is the PLAIN join — the
    hash match certifies the hot/cold split + replication is lossless."""
    return """
SELECT o_orderpriority,
  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY 1
"""


def snapshot_diff() -> str:
    """Mirror of the snapshot_diff entry query: old = doc_id%11<>0,
    new = doc_id%13<>0 with ' [v2]' appended to doc_id%17==0 texts."""
    return """
WITH old AS (
  SELECT doc_id, md5(coalesce(text, '')) AS old_md5
  FROM documents WHERE doc_id % 11 <> 0
),
new AS (
  SELECT doc_id,
    md5(CASE WHEN doc_id % 17 = 0
         THEN coalesce(text, '') || ' [v2]'
         ELSE coalesce(text, '') END) AS new_md5
  FROM documents WHERE doc_id % 13 <> 0
),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_md5, new_md5
  FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
  CASE WHEN old_md5 IS NULL THEN 'added'
       WHEN new_md5 IS NULL THEN 'removed'
       WHEN old_md5 <> new_md5 THEN 'changed' END AS status,
  coalesce(old_md5, '') AS old_md5,
  coalesce(new_md5, '') AS new_md5
FROM j
WHERE old_md5 IS NULL OR new_md5 IS NULL OR old_md5 <> new_md5
"""


def q8_market_share(
    nation: str = "NATION_3",
    region: str = "ASIA",
    p_type: str = "ECONOMY",
) -> str:
    """TPC-H Q8 shape on this schema: one nation's share of one part
    type's revenue sold into one region, by order year."""
    return f"""
WITH vol AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
    l_extendedprice * (1.0 - l_discount) AS vol,
    n1.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = '{p_type}'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey AND r_name = '{region}'
)
SELECT o_year,
  round(sum(CASE WHEN supp_nation = '{nation}' THEN vol
                 ELSE 0.0 END) / sum(vol), 6) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


def source_data_card() -> str:
    """Mirror of text_analysis.source_data_card over documents: per-row
    quality from the text_stats subquery (same 6dp-rounded doubles on
    both engines), group-level aggregates on top."""
    return f"""
WITH ts AS ({text_stats()}),
base AS (
  SELECT d.source, d.n_chars, d.lang,
    md5(coalesce(d.text, '')) AS digest,
    ts.quality_score
  FROM documents d JOIN ts ON d.doc_id = ts.doc_id
)
SELECT source,
  count(*) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS total_chars,
  round(1.0 - CAST(count(DISTINCT digest) AS DOUBLE) / count(*), 6)
    AS exact_dup_frac,
  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6) AS en_frac,
  round(avg(quality_score), 6) AS mean_quality
FROM base
GROUP BY source
ORDER BY source
"""


def leakage_safe_splits(
    min_jaccard: float = 0.5, salt: str = "split"
) -> str:
    """Twin of the cluster-keyed assign_splits entry query: near-dup
    clusters from the recursive-CTE closure, split by the md5 bucket of
    the CLUSTER id (train 9000 / val 9500 / test rest, basis points)."""
    h = _hex32(f"md5(CAST(cluster_id AS VARCHAR) || ':{salt}')")
    return f"""
WITH c AS ({dedup_clusters(min_jaccard)}),
b AS (
  SELECT doc_id, cluster_id, CAST({h} AS BIGINT) % 10000 AS bucket
  FROM c
)
SELECT doc_id, cluster_id,
  CASE WHEN bucket < 9000 THEN 'train'
       WHEN bucket < 9500 THEN 'val'
       ELSE 'test' END AS split
FROM b
"""


def dedup_threshold_sweep() -> str:
    """Twin of the one-pass threshold sweep: verified pairs at the
    loosest threshold, counted per candidate cutoff."""
    return f"""
WITH v AS (
  SELECT jaccard FROM ({dedup_minhash_pairs(min_jaccard=0.3)})
),
t AS (
  SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                 0.9]::DOUBLE[]) AS threshold
)
SELECT threshold, CAST(count(v.jaccard) AS BIGINT) AS n_pairs
FROM t LEFT JOIN v ON v.jaccard >= t.threshold
GROUP BY threshold
ORDER BY threshold
"""


def q19_disjunctive() -> str:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides."""
    return """
SELECT
  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
  count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10
       AND l_quantity >= 5 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size <= 25
       AND l_quantity >= 10 AND l_quantity <= 30)
"""


def q22_global_threshold() -> str:
    """TPC-H Q22 shape: above-global-average balance, no URGENT orders."""
    return """
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
  count(*) AS n_cust,
  round(sum(c_acctbal), 2) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal.a
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def dup_graph_stats(min_jaccard: float = 0.5) -> str:
    """Twin of cluster.graph_stats over the verified minhash pairs.

    The triangle CTE deliberately keeps the naive id-oriented (a<b<c)
    enumeration: triangle counts are orientation-invariant, so hash
    equality certifies the Spark side's degree-ordered compact-forward
    join (the O(m^1.5) skew-safe plan) produces exactly the same
    triangles as the straightforward enumeration — the same
    stronger-oracle pattern as dedup_jaccard_prefix."""
    return f"""
WITH p AS (
  SELECT id_a, id_b FROM ({dedup_minhash_pairs(min_jaccard)})
),
und AS (
  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
  FROM p WHERE id_a <> id_b
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
d AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(max(deg) AS BIGINT) AS max_degree,
         CAST(sum(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges,
         CAST(sum(deg) AS BIGINT) AS degsum
  FROM deg
),
e AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n_nodes, n_edges, max_degree,
  round(CAST(degsum AS DOUBLE) / greatest(n_nodes, 1), 6)
    AS mean_degree,
  n_wedges, n_triangles,
  round(3.0 * n_triangles / greatest(n_wedges, 1), 6)
    AS clustering_coeff
FROM d, e, t
"""


def embedding_principal(iterations: int = 3) -> str:
    """Twin of embstats.principal_direction: quantized mean-covariance,
    exact-integer power iteration unrolled as CTEs with the same
    data-adaptive rescale."""
    u = 10**6
    ctes = [
        """long AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)""",
        """co AS (
  SELECT a.dim AS i, b.dim AS j,
    sum(a.v * b.v) AS s, count(*) AS n,
    sum(a.v) AS si, sum(b.v) AS sj
  FROM long a JOIN long b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
)""",
        f"""cq AS (
  SELECT i, j,
    CAST(floor(round(((s - si * sj / n) / n) * {u})) AS BIGINT) AS cq
  FROM co
)""",
        f"""v0 AS (
  SELECT DISTINCT i AS dim, CAST({u} AS BIGINT) AS vq FROM cq
)""",
    ]
    for k in range(1, iterations + 1):
        p = f"v{k - 1}"
        ctes.append(
            f"""a{k} AS (
  SELECT cq.i, CAST(sum(cq.cq * {p}.vq) AS BIGINT) AS acc
  FROM cq JOIN {p} ON cq.j = {p}.dim GROUP BY 1
)"""
        )
        ctes.append(
            f"""s{k} AS (
  SELECT CAST(floor(max(abs(acc)) / {u}.0) + 1 AS BIGINT) AS s
  FROM a{k}
)"""
        )
        ctes.append(
            f"""v{k} AS (
  SELECT i AS dim, CAST(floor(acc / s) AS BIGINT) AS vq
  FROM a{k}, s{k}
)"""
        )
    last = f"v{iterations}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
nrm AS (
  SELECT sqrt(sum(CAST(vq AS DOUBLE) * vq)) AS nn FROM {last}
)
SELECT dim, round(vq / greatest(nn, 1.0), 6) AS loading
FROM {last}, nrm
ORDER BY dim
"""
    )


def q6_forecast_revenue() -> str:
    """Twin of the Q6 pure scan-aggregate shape."""
    return """
SELECT ((CAST(sum(CAST(l_extendedprice * l_discount
                      AS DECIMAL(18,4))) * 10000 AS BIGINT) + 50) // 100)
         / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_items() -> str:
    """Twin of the Q10 returned-item join shape."""
    return """
SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
       ((CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                       AS DECIMAL(18,4))) * 10000 AS BIGINT) + 50) // 100)
         / 100.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


def q12_ship_delay() -> str:
    """Twin of the Q12 conditional-aggregation shape over the derived
    30-day ship-delay bucket."""
    return """
SELECT CAST(least(greatest(
         date_diff('day', o.o_orderdate, l.l_shipdate) // 30, 0), 5)
       AS INTEGER) AS delay_bucket,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
ORDER BY delay_bucket
"""


def q13_order_distribution() -> str:
    """Twin of the Q13 double-aggregate-over-outer-join shape."""
    return """
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(count(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q14_promo_revenue() -> str:
    """Twin of the Q14 conditional-fraction shape."""
    return """
SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE), 6)
         AS promo_revenue_pct,
       count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


def q15_top_supplier() -> str:
    """Twin of the Q15 view + global-max shape (equality over identical
    2dp-rounded revenues)."""
    return """
WITH rev AS (
  SELECT l_suppkey,
         ((CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) * 10000 AS BIGINT) + 50) // 100)
           / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


def q18_large_volume() -> str:
    """Twin of the Q18 HAVING-aggregate shape."""
    return """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""


def q21_waiting_supplier() -> str:
    """Twin of the Q21 EXISTS / NOT-EXISTS double correlation (adapted:
    late = shipped strictly after every other supplier on the order)."""
    return """
WITH l1 AS (
  SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM l1 l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM l1 l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT 20
"""


def dedup_containment(min_containment: float = 0.8) -> str:
    """Exact all-pairs shingle containment |A∩B|/min(|A|,|B|) — the
    twin of dedup.containment_prefix_pairs. Deliberately the FULL
    inverted-index SQL with no prefix pruning: hash equality certifies
    the one-sided rare-first prefix filter drops no qualifying pair."""
    cont = "i.n_inter / greatest(least(sa.n_sh, sb.n_sh), 1)"
    return f"""
WITH {_shingle_ctes()},
expl AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
),
sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM shing
),
inter AS (
  SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS n_inter
  FROM expl ea JOIN expl eb ON eb.s = ea.s AND ea.doc_id < eb.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, round({cont}, 6) AS containment
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE round({cont}, 6) >= {min_containment!r}
"""


def quota_sample() -> str:
    """Twin of sampling.quota_sample over documents by source: seeded
    md5 shuffle order, row_number per stratum, CASE quota cut."""
    return """
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('s2' || '|' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS smp_rank
  FROM documents
)
SELECT doc_id, source, CAST(smp_rank AS BIGINT) AS smp_rank
FROM ranked
WHERE smp_rank <= CASE source
  WHEN 'src0' THEN 12 WHEN 'src1' THEN 7 WHEN 'src2' THEN 20
  ELSE 3 END
"""


def vocab_coverage(vocab_size: int = 500) -> str:
    """Twin of text_analysis.vocab_coverage: global top-V vocabulary
    (count desc, token asc tie-break), occurrence- and type-weighted
    per-source OOV rates."""
    return f"""
WITH occ AS (
  SELECT source, unnest({_tokens("coalesce(text, '')")}) AS tok
  FROM documents
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS cnt FROM occ GROUP BY tok
    ORDER BY cnt DESC, tok ASC LIMIT {vocab_size}
  )
),
tagged AS (
  SELECT o.source, o.tok, (v.tok IS NOT NULL) AS in_vocab
  FROM occ o LEFT JOIN vocab v ON v.tok = o.tok
),
g AS (
  SELECT source,
    CAST(count(*) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN in_vocab THEN 0 ELSE 1 END) AS BIGINT)
      AS oov_tokens,
    CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
    CAST(count(DISTINCT CASE WHEN NOT in_vocab THEN tok END) AS BIGINT)
      AS oov_types
  FROM tagged GROUP BY source
)
SELECT s.source,
  coalesce(g.n_tokens, 0) AS n_tokens,
  coalesce(g.oov_tokens, 0) AS oov_tokens,
  round(coalesce(g.oov_tokens, 0)
        / CAST(greatest(coalesce(g.n_tokens, 0), 1) AS DOUBLE), 6)
    AS oov_rate,
  coalesce(g.n_types, 0) AS n_types,
  coalesce(g.oov_types, 0) AS oov_types,
  round(coalesce(g.oov_types, 0)
        / CAST(greatest(coalesce(g.n_types, 0), 1) AS DOUBLE), 6)
    AS oov_type_rate
FROM (SELECT DISTINCT source FROM documents) s
LEFT JOIN g ON g.source = s.source
"""


def weighted_sample_es(k: int = 50, salt: str = "es1") -> str:
    """Twin of sampling.weighted_sample_es over documents weighted by
    n_chars: seeded md5 uniform, ln(1/u) quantized to integer nanonats,
    key = nanonats / weight (exact-integer division → identical
    doubles), k smallest with id tie-break."""
    h = _hex32(f"md5('{salt}' || '|' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
    CAST(round(ln(4294967296.0 / ({h} + 1)) * 1000000000) AS BIGINT)
      / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, source, n_chars, es_key
FROM keyed ORDER BY es_key ASC, doc_id ASC LIMIT {k}
"""


def _bpe_ctes(n_merges: int, min_pair_count: int) -> str:
    """Shared CTE chain for the BPE twins: the Sennrich merge loop
    unrolled — per step, a freq-weighted adjacent-pair count, the
    (cnt desc, l, r) argmax, and the greedy LEFT-TO-RIGHT
    NON-OVERLAPPING rewrite expressed relationally as a
    gaps-and-islands parity selection: within each maximal run of
    consecutive candidate positions only the odd-ranked ones merge
    (exactly what the sequential greedy scan does: 'l l l' merges at
    position 1 but not 2), rows following a selected position drop, and
    the word rebuilds with an ordered list aggregate.

    Every CTE is AS MATERIALIZED: each vocab_r is referenced ~3x by the
    next step, and DuckDB's default CTE inlining makes the evaluation
    tree EXPONENTIAL in n_merges (8 steps ran; 16+ never finished —
    r5 measurement). Materialization pins one evaluation per step, so
    the chain is linear and 64-merge certification is feasible
    (16 steps: >600 s inlined -> 1.6 s materialized at sf0.01)."""
    parts = [
        f"""vocab_0 AS MATERIALIZED (
  SELECT word, count(*) AS freq, string_split(word, '') AS seq
  FROM (SELECT unnest({_tokens("coalesce(text, '')")}) AS word
        FROM documents)
  GROUP BY word
)"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"vocab_{r - 1}"
        parts.append(f"""pairs_{r} AS MATERIALIZED (
  SELECT l, rr, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, seq[i] AS l, seq[i + 1] AS rr
    FROM (SELECT word, freq, seq,
                 unnest(range(1, len(seq))) AS i
          FROM {prev})
  ) GROUP BY l, rr HAVING sum(freq) >= {min_pair_count}
)""")
        parts.append(f"""best_{r} AS MATERIALIZED (
  SELECT l AS pl, rr AS pr, cnt FROM pairs_{r}
  ORDER BY cnt DESC, l ASC, rr ASC LIMIT 1
)""")
        parts.append(f"""pos_{r} AS MATERIALIZED (
  SELECT word, freq, seq, bl, br,
         unnest(range(1, len(seq) + 1)) AS p
  FROM (SELECT v.word, v.freq, v.seq, b.pl AS bl, b.pr AS br
        FROM {prev} v LEFT JOIN best_{r} b ON TRUE)
)""")
        parts.append(f"""cand_{r} AS MATERIALIZED (
  SELECT word, freq, p, seq[p] AS sym, bl, br,
         (bl IS NOT NULL AND p < len(seq)
          AND seq[p] = bl AND seq[p + 1] = br) AS cand
  FROM pos_{r}
)""")
        parts.append(f"""sel_{r} AS MATERIALIZED (
  SELECT word, freq, p, sym, bl, br, cand,
         cand AND (row_number() OVER (
             PARTITION BY word, grp ORDER BY p) % 2 = 1) AS selected
  FROM (
    SELECT *, CASE WHEN cand THEN p - row_number() OVER (
        PARTITION BY word, cand ORDER BY p) END AS grp
    FROM cand_{r}
  )
)""")
        parts.append(f"""vocab_{r} AS MATERIALIZED (
  SELECT word, any_value(freq) AS freq,
    list(CASE WHEN selected THEN bl || br ELSE sym END ORDER BY p)
      FILTER (WHERE NOT skip) AS seq
  FROM (
    SELECT *, coalesce(lag(selected) OVER (
        PARTITION BY word ORDER BY p), FALSE) AS skip
    FROM sel_{r}
  )
  GROUP BY word
)""")
    return "WITH " + ",\n".join(parts)


def bpe_merges(n_merges: int = 6, min_pair_count: int = 2) -> str:
    """Twin of bpe.learn_bpe_merges over documents (see _bpe_ctes)."""
    union = "\nUNION ALL\n".join(
        f'SELECT {r} AS step, pl AS "left", pr AS "right", '
        f"cnt AS pair_count FROM best_{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        _bpe_ctes(n_merges, min_pair_count)
        + "\nSELECT CAST(step AS INTEGER) AS step, \"left\", \"right\","
          " pair_count FROM (\n"
        + union
        + "\n)"
    )


def bpe_vocab_segments(
    n_merges: int = 6, min_pair_count: int = 2, top_k: int = 200
) -> str:
    """Twin of bpe.bpe_vocab_segments: the final vocabulary state of the
    same unrolled chain — per-word subword segmentation and fertility."""
    return (
        _bpe_ctes(n_merges, min_pair_count)
        + f"""
SELECT word, freq, array_to_string(seq, ' ') AS segments,
       CAST(len(seq) AS INTEGER) AS n_subwords
FROM (SELECT * FROM vocab_{n_merges}
      ORDER BY freq DESC, word ASC LIMIT {top_k})
"""
    )


def decayed_counts(
    ref_time: str = "2024-01-31 00:00:00", half_life_minutes: int = 1440
) -> str:
    """Twin of rollup.decayed_counts: floor-epoch minute ages, one
    nanonat-quantized 2^(-age/hl) per distinct (key, age), exact BIGINT
    weighted sum, /1e9 double emit."""
    return f"""
WITH per_minute AS (
  SELECT event_type,
         (CAST(floor(epoch(TIMESTAMP '{ref_time}')) AS BIGINT)
          - CAST(floor(epoch(ts)) AS BIGINT)) // 60 AS age,
         count(*) AS n
  FROM events
  WHERE ts <= TIMESTAMP '{ref_time}'
  GROUP BY 1, 2
),
weighted AS (
  SELECT event_type, n,
         CAST(round(exp(-0.6931471805599453
                        * (CAST(age AS DOUBLE) / {half_life_minutes}.0))
                    * 1000000000) AS BIGINT) AS w9
  FROM per_minute
)
SELECT event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       sum(n * w9) / 1000000000.0 AS decayed_count
FROM weighted GROUP BY event_type
ORDER BY event_type
"""


def sq8_topk(query_vec_id: int = 0, k: int = 10) -> str:
    """Twin of similarity.sq8_topk: per-dim min/max params, floor(x+0.5)
    codes (portable half-up), and the same left-fold summation order
    (list_reduce seeded with 0.0 mirrors F.aggregate's init) so the
    float dot products agree bit for bit."""
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {arr}), "
        "(a, b) -> a + b)"
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
long AS (
  SELECT vec_id, i, v[i] AS x
  FROM (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM v)
),
pd AS (SELECT i, min(x) AS mn, max(x) AS mx FROM long GROUP BY i),
params AS (
  SELECT list(mn ORDER BY i) AS mns,
         list(mx ORDER BY i) AS mxs,
         list(mx - mn ORDER BY i) AS rgs
  FROM pd
),
codes AS (
  SELECT vec_id,
    list_transform(range(1, len(v.v) + 1),
      i -> CASE WHEN p.rgs[i] > 0
           THEN CAST(floor((v.v[i] - p.mns[i]) * 255.0 / p.rgs[i] + 0.5)
                     AS INTEGER)
           ELSE 0 END) AS codes
  FROM v, params p
),
q AS (
  SELECT
    {fold.format(arr="list_transform(range(1, len(v.v) + 1), i -> v.v[i] * p.mns[i])")} AS qconst,
    list_transform(range(1, len(v.v) + 1),
                   i -> v.v[i] * p.rgs[i] / 255.0) AS qscale
  FROM v, params p WHERE v.vec_id = {query_vec_id}
)
SELECT c.vec_id,
  round(q.qconst
        + {fold.format(arr="list_transform(range(1, len(c.codes) + 1), i -> q.qscale[i] * CAST(c.codes[i] AS DOUBLE))")},
        6) AS approx_dot
FROM codes c, q
ORDER BY approx_dot DESC, c.vec_id ASC LIMIT {k}
"""


def sq8_rerank_topk(
    query_vec_id: int = 0, k: int = 10, shortlist: int = 50,
    dim: int = 64,
) -> str:
    """Twin of similarity.sq8_rerank_topk: the SQ8 shortlist SQL feeds
    an exact-cosine re-rank identical to the cosine_topk arithmetic.
    Ranges derive from len(v) — the `dim` parameter is retained for
    signature compatibility but never baked into the SQL, so a fixture
    dimension change cannot silently truncate the dot product."""
    inner = sq8_topk(query_vec_id, shortlist)
    return f"""
WITH short AS (SELECT vec_id FROM ({inner})),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT v AS qv FROM v WHERE vec_id = {query_vec_id})
SELECT c.vec_id,
  round(list_sum(list_transform(range(1, len(c.v) + 1),
                                j -> c.v[j] * q.qv[j]))
    / (sqrt(list_sum(list_transform(c.v, x -> x * x)))
       * sqrt(list_sum(list_transform(q.qv, x -> x * x)))), 6)
    AS cosine_sim
FROM v c JOIN short s ON s.vec_id = c.vec_id CROSS JOIN q
ORDER BY cosine_sim DESC, c.vec_id ASC LIMIT {k}
"""


def ivf_append_report(n_clusters: int = 8) -> str:
    """Twin of similarity.ivf_append_report with the driver split
    (base = even vec_id, new = odd): centroids are the n_clusters
    lowest-EVEN-id vectors; both batches assigned by the same
    norm-dropped cosine argmax as ann_ivf_topk (ties to lowest cid);
    per-cell counts full-outer-merged, share in exact ppm."""
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
base AS (SELECT * FROM v WHERE vec_id % 2 = 0),
newb AS (SELECT * FROM v WHERE vec_id % 2 = 1),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS cn
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT {n_clusters})
),
a_old AS (
  SELECT cid AS cluster, count(*) AS old_size FROM (
    SELECT vec_id, cid FROM (
      SELECT b.vec_id, c.cid,
        row_number() OVER (PARTITION BY b.vec_id ORDER BY
          list_sum(list_transform(range(1, len(b.v) + 1),
                   j -> b.v[j] * c.cv[j])) / c.cn DESC, c.cid ASC) AS rn
      FROM base b CROSS JOIN cents c) WHERE rn = 1)
  GROUP BY cid
),
a_new AS (
  SELECT cid AS cluster, count(*) AS added FROM (
    SELECT vec_id, cid FROM (
      SELECT b.vec_id, c.cid,
        row_number() OVER (PARTITION BY b.vec_id ORDER BY
          list_sum(list_transform(range(1, len(b.v) + 1),
                   j -> b.v[j] * c.cv[j])) / c.cn DESC, c.cid ASC) AS rn
      FROM newb b CROSS JOIN cents c) WHERE rn = 1)
  GROUP BY cid
),
merged AS (
  SELECT CAST(coalesce(a_old.cluster, a_new.cluster) AS INTEGER)
           AS cluster,
         CAST(coalesce(old_size, 0) AS BIGINT) AS old_size,
         CAST(coalesce(added, 0) AS BIGINT) AS added
  FROM a_old FULL OUTER JOIN a_new ON a_old.cluster = a_new.cluster
)
SELECT cluster, old_size, added,
       CAST(old_size + added AS BIGINT) AS new_size,
       CAST((old_size + added) * 1000000
            // (SELECT sum(old_size + added) FROM merged)
            AS BIGINT) AS share_ppm
FROM merged
"""


def ivf_sq8_topk(
    query_vec_id: int = 0, k: int = 10, n_clusters: int = 8,
    nprobe: int = 3, dim: int = 64,
) -> str:
    """Twin of similarity.ivf_sq8_topk: the seeded IVF cell CTEs
    (ann_ivf_topk) bound the candidates; SQ8 scoring (sq8_topk's
    params/codes/fold arithmetic) ranks them. Ranges derive from
    len(v)/len(qv) — `dim` is kept for signature compatibility only,
    never baked into the SQL (a fixture dim change cannot silently
    truncate the dot products)."""
    fold = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {arr}), "
        "(a, b) -> a + b)"
    )
    return f"""
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv,
         sqrt(list_sum(list_transform(v, x -> x * x))) AS cn
  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT {n_clusters})
),
cscored AS (
  SELECT vec_id, v, cid,
    list_sum(list_transform(range(1, len(v) + 1), j -> v[j] * cv[j])) / cn
      AS s
  FROM v CROSS JOIN cents
),
assigned AS (
  SELECT vec_id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY s DESC, cid ASC) AS rn
    FROM cscored) WHERE rn = 1
),
qv AS (SELECT v AS qv FROM v WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid FROM (
    SELECT c.cid,
      list_sum(list_transform(range(1, len(q.qv) + 1),
                              j -> q.qv[j] * c.cv[j]))
        / c.cn AS s
    FROM cents c CROSS JOIN qv q
    ORDER BY s DESC, c.cid ASC LIMIT {nprobe})
),
long AS (
  SELECT vec_id, i, v[i] AS x
  FROM (SELECT vec_id, v, unnest(range(1, len(v) + 1)) AS i FROM v)
),
pd AS (SELECT i, min(x) AS mn, max(x) AS mx FROM long GROUP BY i),
params AS (
  SELECT list(mn ORDER BY i) AS mns,
         list(mx - mn ORDER BY i) AS rgs
  FROM pd
),
codes AS (
  SELECT vec_id,
    list_transform(range(1, len(v.v) + 1),
      i -> CASE WHEN p.rgs[i] > 0
           THEN CAST(floor((v.v[i] - p.mns[i]) * 255.0 / p.rgs[i] + 0.5)
                     AS INTEGER)
           ELSE 0 END) AS codes
  FROM v, params p
),
qs AS (
  SELECT
    {fold.format(arr="list_transform(range(1, len(q.qv) + 1), i -> q.qv[i] * p.mns[i])")} AS qconst,
    list_transform(range(1, len(q.qv) + 1),
                   i -> q.qv[i] * p.rgs[i] / 255.0) AS qscale
  FROM qv q, params p
)
SELECT c.vec_id,
  round(qs.qconst
        + {fold.format(arr="list_transform(range(1, len(c.codes) + 1), i -> qs.qscale[i] * CAST(c.codes[i] AS DOUBLE))")},
        6) AS approx_dot
FROM codes c
JOIN assigned a ON a.vec_id = c.vec_id
JOIN probe pr ON pr.cid = a.cid
CROSS JOIN qs
ORDER BY approx_dot DESC, c.vec_id ASC LIMIT {k}
"""


def ann_recall_report(query_vec_id: int = 0, k: int = 10) -> str:
    """Twin of similarity.ann_recall_report: each approximate method's
    ALREADY-CERTIFIED SQL twin runs as a subquery (same parameters as
    the standing gate queries), unioned, and hit-joined against the
    exact cosine top-k — so a hash match pins BOTH engines to identical
    per-method hit counts, turning retrieval quality into an
    oracle-checked number."""
    exact = similarity_topk(query_vec_id, k)
    subs = {
        "ivf": ann_ivf_topk(query_vec_id, k, 8, 3),
        "ivf_sq8": ivf_sq8_topk(query_vec_id, k, 8, 3),
        "lsh": ann_lsh_topk(query_vec_id, k, 6),
        "lsh_multiprobe": ann_lsh_multiprobe_topk(
            query_vec_id, k, 6, 1
        ),
        "pq": pq_topk(query_vec_id, k, 8, 16),
        "pq_rerank": pq_rerank_topk(query_vec_id, k, 50, 8, 16),
        "sq8": sq8_topk(query_vec_id, k),
        "sq8_rerank": sq8_rerank_topk(query_vec_id, k, 50),
    }
    union = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS method, vec_id FROM ({sql})"
        for name, sql in sorted(subs.items())
    )
    return f"""
WITH exact_ids AS (SELECT vec_id FROM ({exact})),
u AS ({union})
SELECT u.method,
  count(*) AS k_returned,
  CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hits,
  round(CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / {float(k)}, 6) AS recall_at_k
FROM u LEFT JOIN exact_ids e ON e.vec_id = u.vec_id
GROUP BY u.method
ORDER BY u.method
"""


def bpe_fertility(n_merges: int = 64, min_pair_count: int = 2) -> str:
    """Twin of bpe.bpe_fertility: the FINAL-STATE certificate of a long
    merge chain — exact-integer vocabulary totals and the freq-weighted
    mean fertility after all n_merges rewrites, plus how many steps
    found a winner. Certifies the end state without emitting the
    vocabulary (the MATERIALIZED per-step CTEs keep the 64-step chain
    linear — see _bpe_ctes)."""
    union = "\nUNION ALL\n".join(
        f"SELECT pl FROM best_{r}" for r in range(1, n_merges + 1)
    )
    return (
        _bpe_ctes(n_merges, min_pair_count)
        + f""",
merged AS (SELECT pl FROM ({union}))
SELECT
  CAST((SELECT count(*) FROM merged) AS INTEGER) AS n_merges_done,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(freq) AS BIGINT) AS total_freq,
  CAST(sum(len(seq) * freq) AS BIGINT) AS total_subwords,
  round(CAST(sum(len(seq) * freq) AS DOUBLE)
        / CAST(greatest(sum(freq), 1) AS DOUBLE), 6) AS mean_fertility
FROM vocab_{n_merges}
"""
    )


def ann_param_sweep(query_vec_id: int = 0, k: int = 10) -> str:
    """Twin of similarity.ann_param_sweep: the certified per-method CTEs
    at each swept parameter value, unioned and hit-joined against the
    exact top-k — identical variant labels, so the recall-vs-cost table
    hash-matches row for row."""
    exact = similarity_topk(query_vec_id, k)
    variants = []
    for r in (0, 1, 2):
        variants.append(
            ("lsh_multiprobe", f"radius={r}",
             ann_lsh_multiprobe_topk(query_vec_id, k, 6, r))
        )
    for np_ in (1, 2, 8):
        variants.append(
            ("ivf", f"nprobe={np_}",
             ann_ivf_topk(query_vec_id, k, 8, np_))
        )
    for sl in (10, 50):
        variants.append(
            ("sq8_rerank", f"shortlist={sl}",
             sq8_rerank_topk(query_vec_id, k, sl))
        )
    for sl in (10, 50):
        variants.append(
            ("pq_rerank", f"shortlist={sl}",
             pq_rerank_topk(query_vec_id, k, sl, 8, 16))
        )
    union = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS method, '{p}' AS param, vec_id FROM ({sql})"
        for m, p, sql in variants
    )
    return f"""
WITH exact_ids AS (SELECT vec_id FROM ({exact})),
u AS ({union})
SELECT u.method, u.param,
  count(*) AS k_returned,
  CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hits,
  round(CAST(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             AS DOUBLE) / {float(k)}, 6) AS recall_at_k
FROM u LEFT JOIN exact_ids e ON e.vec_id = u.vec_id
GROUP BY u.method, u.param
ORDER BY u.method, u.param
"""


def paragraph_near_dups(min_jaccard: float = 0.5) -> str:
    r"""Twin of dedup.paragraph_near_dup_pairs: the certified minhash
    band+verify chain over the PARAGRAPH relation — pid = doc_id ':'
    0-based position (DuckDB's list_transform index is 1-based, hence
    the -1), same \n{2,} split / trim / drop-empty as paragraph_dedup."""
    extra = r"""pbase AS (
  SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(u['pos'] - 1 AS VARCHAR)
           AS doc_id,
         u['para'] AS text
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             list_filter(list_transform(
               string_split_regex(coalesce(text, ''), '\n{2,}'),
               x -> trim(x)), x -> x != ''),
             (x, i) -> {'para': x, 'pos': i})) AS u
    FROM documents
  )
),
"""
    return dedup_minhash_pairs(
        min_jaccard=min_jaccard, base="pbase", extra_ctes=extra
    )


def quality_threshold_sweep(
    thresholds: tuple[float, ...] = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8),
) -> str:
    """Twin of text_analysis.quality_threshold_sweep: per-doc quality
    from the certified text_stats CTE, micro-unit BIGINT comparisons,
    raw-double ratio emits (exact-integer divisions — no engine
    round)."""
    tlist = ", ".join(repr(float(x)) for x in thresholds)
    return f"""
WITH ts AS (SELECT quality_score FROM ({text_stats()})),
q AS (
  SELECT CAST(round(quality_score * 1000000) AS BIGINT) AS q_micro
  FROM ts
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM q),
t AS (
  SELECT threshold,
         CAST(round(threshold * 1000000) AS BIGINT) AS t_micro
  FROM (SELECT unnest([{tlist}]::DOUBLE[]) AS threshold)
),
per AS (
  SELECT t.threshold,
         CAST(count(q.q_micro) AS BIGINT) AS n_kept,
         CAST(coalesce(sum(q.q_micro), 0) AS BIGINT) AS sum_micro
  FROM t LEFT JOIN q ON q.q_micro >= t.t_micro
  GROUP BY t.threshold
)
SELECT p.threshold,
       p.n_kept,
       CAST(p.n_kept AS DOUBLE) / greatest(tot.n_total, 1)
         AS frac_kept,
       CASE WHEN p.n_kept > 0
            THEN CAST(p.sum_micro AS DOUBLE) / (p.n_kept * 1000000.0)
       END AS mean_quality_kept
FROM per p CROSS JOIN tot
ORDER BY p.threshold
"""


def ks_purchase_vs_view(quant: int = 10000) -> str:
    """Twin of drift.ks_two_sample over events: purchase vs view value
    distributions. Portable half-up quantization (floor(v·q + 0.5)),
    exact-integer cumulative ECDFs, raw-double gap; argmax tie-breaks
    to the lowest quantized value."""
    return f"""
WITH tagged AS (
  SELECT CAST(floor(CAST(value AS DOUBLE) * {quant} + 0.5) AS BIGINT)
           AS q,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
  FROM events
  WHERE event_type IN ('purchase', 'view')
),
counts AS (
  SELECT q, CAST(sum(a) AS BIGINT) AS ca, CAST(sum(b) AS BIGINT) AS cb
  FROM tagged GROUP BY q
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b
  FROM counts
),
cums AS (
  SELECT q,
    CAST(sum(ca) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cuma,
    CAST(sum(cb) OVER (ORDER BY q ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cumb
  FROM counts
),
gaps AS (
  SELECT t.n_a, t.n_b, c.q,
    abs(CAST(c.cuma AS DOUBLE) / greatest(t.n_a, 1)
        - CAST(c.cumb AS DOUBLE) / greatest(t.n_b, 1)) AS gap
  FROM cums c CROSS JOIN tot t
)
SELECT g.n_a, g.n_b,
       max(g.gap) AS ks_stat,
       (SELECT min(q) FROM gaps g2
        WHERE g2.gap = (SELECT max(gap) FROM gaps)) / {float(quant)!r}
         AS ks_at_value
FROM gaps g GROUP BY g.n_a, g.n_b
"""


def events_hourly_anomalies(
    trailing: int = 24, min_history: int = 12, z_threshold: float = 2.0
) -> str:
    """Twin of drift.hourly_anomaly_zscore over events: exact-integer
    trailing sums/sums-of-squares, identical-double mean/variance/z
    expressions (same operation shapes as the Spark plan), raw emits."""
    mean = "CAST(s AS DOUBLE) / c"
    var = f"CAST(ss AS DOUBLE) / c - ({mean}) * ({mean})"
    z = f"(n_events - ({mean})) / sqrt({var})"
    return f"""
WITH hourly AS (
  SELECT event_type AS key, date_trunc('hour', ts) AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT key, hour, n_events,
    CAST(sum(n_events) OVER w AS BIGINT) AS s,
    CAST(sum(n_events * n_events) OVER w AS BIGINT) AS ss,
    CAST(count(n_events) OVER w AS BIGINT) AS c
  FROM hourly
  WINDOW w AS (PARTITION BY key ORDER BY hour
               ROWS BETWEEN {trailing} PRECEDING AND 1 PRECEDING)
)
SELECT key, hour, n_events,
       {mean} AS mean_trailing,
       {z} AS z
FROM stats
WHERE c >= {min_history} AND ({var}) > 0
  AND abs({z}) >= {z_threshold!r}
ORDER BY key, hour
"""


def events_scd2() -> str:
    """Twin of cdc.scd2_history over events (user_id / event_type).

    Same lag-change-flag -> running-sum run id -> run aggregation ->
    lead(valid_from) chain; window sums CAST to BIGINT (DuckDB widens
    to HUGEINT, which the comparator's pandas path floats)."""
    return """
WITH ordered AS (
  SELECT user_id, ts, event_id,
    coalesce(event_type, '') AS attr,
    lag(coalesce(event_type, ''))
      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_attr IS NULL OR prev_attr <> attr
             THEN 1 ELSE 0 END AS chg
  FROM ordered
),
runs AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS version
  FROM flagged
),
compact AS (
  SELECT user_id, version, min(attr) AS event_type, min(ts) AS vfrom,
         count(*) AS n_events
  FROM runs GROUP BY user_id, version
)
SELECT user_id, version, event_type,
  strftime(vfrom, '%Y-%m-%d %H:%M:%S') AS valid_from,
  strftime(lead(vfrom) OVER (PARTITION BY user_id ORDER BY version),
           '%Y-%m-%d %H:%M:%S') AS valid_to,
  n_events,
  (lead(vfrom) OVER (PARTITION BY user_id ORDER BY version)) IS NULL
    AS is_current
FROM compact
"""


def epoch_shuffle(
    n_epochs: int = 3, n_shards: int = 8, salt: str = "epoch"
) -> str:
    """Twin of sampling.epoch_shuffle + the gate audit aggregate: same
    md5(id:epoch:salt) draw (_hex32), shard mod, per-(epoch,shard)
    row_number, then count / first-doc / mod-checksum."""
    h = _hex32(
        "md5(CAST(doc_id AS VARCHAR) || ':' || "
        f"CAST(epoch AS VARCHAR) || ':{salt}')"
    )
    return f"""
WITH ep AS (SELECT unnest(range(0, {n_epochs})) AS epoch),
assigned AS (
  SELECT d.doc_id, ep.epoch, CAST({h} AS BIGINT) AS draw
  FROM documents d CROSS JOIN ep
),
sharded AS (
  SELECT *, CAST(draw % {n_shards} AS INTEGER) AS shard FROM assigned
),
positioned AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY epoch, shard
                                    ORDER BY draw, doc_id) AS BIGINT)
            AS position
  FROM sharded
)
SELECT CAST(epoch AS INTEGER) AS epoch, shard,
  count(*) AS n_docs,
  max(CASE WHEN position = 1 THEN doc_id END) AS first_doc,
  CAST(sum((position * doc_id) % 1000000007) AS BIGINT) AS checksum
FROM positioned GROUP BY epoch, shard
"""


def length_outliers(k_num: int = 3, k_den: int = 1) -> str:
    """Twin of stats.robust_outlier_profile(documents, n_chars, source):
    histogram -> window-cumsum exact medians (med2/mad4 integer
    doubling trick) -> outlier tally. Window/aggregate sums CAST to
    BIGINT (DuckDB HUGEINT widening). NULL values excluded before the
    histogram, mirroring the Spark-side filter (r6)."""
    return f"""
WITH hist AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
),
ranked AS (
  SELECT source, v, cnt,
    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM hist
),
med AS (
  SELECT source,
    min(CASE WHEN cum >= ((n - 1) // 2) + 1 THEN v END)
      + min(CASE WHEN cum >= (n // 2) + 1 THEN v END) AS med2,
    max(n) AS n_rows
  FROM ranked GROUP BY source
),
devhist AS (
  SELECT h.source, abs(2 * h.v - m.med2) AS v,
         CAST(sum(h.cnt) AS BIGINT) AS cnt
  FROM hist h JOIN med m ON h.source = m.source
  GROUP BY 1, 2
),
dranked AS (
  SELECT source, v, cnt,
    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM devhist
),
mad AS (
  SELECT source,
    min(CASE WHEN cum >= ((n - 1) // 2) + 1 THEN v END)
      + min(CASE WHEN cum >= (n // 2) + 1 THEN v END) AS mad4
  FROM dranked GROUP BY source
),
flagged AS (
  SELECT h.source, h.cnt,
    (2 * h.v < m.med2) AS is_low,
    (2 * abs(2 * h.v - m.med2) * {k_den} > {k_num} * d.mad4) AS is_out
  FROM hist h
  JOIN med m ON h.source = m.source
  JOIN mad d ON h.source = d.source
),
tallies AS (
  SELECT source,
    CAST(sum(CASE WHEN is_out AND is_low THEN cnt ELSE 0 END)
         AS BIGINT) AS n_low_outliers,
    CAST(sum(CASE WHEN is_out AND NOT is_low THEN cnt ELSE 0 END)
         AS BIGINT) AS n_high_outliers
  FROM flagged GROUP BY source
)
SELECT m.source, m.n_rows, m.med2 / 2.0 AS median, d.mad4 / 4.0 AS mad,
  t.n_low_outliers, t.n_high_outliers
FROM med m
JOIN mad d ON m.source = d.source
JOIN tallies t ON m.source = t.source
"""


def domain_classify() -> str:
    """Twin of text_analysis.classify_domains + the gate aggregate:
    same single source of truth for the vocabularies (DOMAIN_TAXONOMY
    import), same lexicographic-priority CASE cascade."""
    from model_audit_spark.operators.text_analysis import DOMAIN_TAXONOMY

    names = sorted(DOMAIN_TAXONOMY)
    hit_exprs = []
    for d in names:
        vocab = ", ".join(sql_quote(t) for t in DOMAIN_TAXONOMY[d])
        hit_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{vocab}], t)))"
            f" AS hits_{d}"
        )
    cascade = [f"WHEN {' + '.join('hits_' + d for d in names)} = 0 "
               "THEN 'none'"]
    for i, d in enumerate(names[:-1]):
        cond = " AND ".join(
            f"hits_{d} >= hits_{later}" for later in names[i + 1:]
        )
        cascade.append(f"WHEN {cond} THEN '{d}'")
    case = ("CASE " + " ".join(cascade)
            + f" ELSE '{names[-1]}' END")
    greatest = "greatest(" + ", ".join(f"hits_{d}" for d in names) + ")"
    return f"""
WITH tok AS (
  SELECT doc_id, source, {_tokens("coalesce(text, '')")} AS toks
  FROM documents
),
hits AS (
  SELECT doc_id, source, {', '.join(hit_exprs)} FROM tok
),
routed AS (
  SELECT source, {case} AS domain,
         CAST({greatest} AS BIGINT) AS best_hits
  FROM hits
)
SELECT source, domain, count(*) AS n_docs,
  CAST(sum(best_hits) AS BIGINT) AS total_hits,
  CAST(sum(best_hits) AS BIGINT) / CAST(count(*) AS BIGINT) AS avg_hits
FROM routed GROUP BY source, domain
"""


def streaming_sessionize(
    gap_minutes: int = 30,
) -> str:
    """Batch twin of streaming.streaming_sessionize (native
    F.session_window): windows [ts, ts+gap) merge on OVERLAP, so a new
    session starts iff the microsecond gap to the previous event is
    >= gap — strictly-less merges, evaluated at full precision via
    epoch_us (Spark: unix_micros). session_end = max(ts) + gap.
    Value sums in DECIMAL(18,6), DOUBLE at emit."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, value,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) >= {gap_us}
             THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sessions AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS sid
  FROM flagged
)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(max(ts) + INTERVAL {gap_minutes} MINUTE,
           '%Y-%m-%d %H:%M:%S') AS session_end,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, sid
"""


def streaming_attribution(max_delay_minutes: int = 10) -> str:
    """Batch twin of the stream-stream attribution rollup: the same
    interval join (r_ts strictly after l_ts, within max_delay) as
    plain SQL, aggregated per user with exact integer lag sums."""
    return f"""
WITH l AS (
  SELECT user_id, ts AS l_ts FROM events WHERE event_type = 'view'
),
r AS (
  SELECT user_id, ts AS r_ts FROM events WHERE event_type = 'click'
),
pairs AS (
  SELECT l.user_id, l_ts, r_ts
  FROM l JOIN r ON l.user_id = r.user_id
   AND r_ts > l_ts
   AND r_ts <= l_ts + INTERVAL {max_delay_minutes} MINUTE
)
SELECT user_id, count(*) AS n_pairs,
  CAST(count(DISTINCT l_ts) AS BIGINT) AS n_views_matched,
  CAST(sum(epoch_us(r_ts) - epoch_us(l_ts)) AS BIGINT) AS sum_lag_us
FROM pairs GROUP BY user_id
"""


def ngram_novelty() -> str:
    """Twin of text_analysis.ngram_novelty + the per-source rollup:
    same shingle relation (_shingle_ctes), first occurrence = min
    doc_id per shingle HASH (the 60-bit md5-prefix shuffle-key
    narrowing — identical truncation on both engines, so the mirror
    is exact by construction), novel counts keyed back to the owning
    doc."""
    return f"""
WITH {_shingle_ctes()},
expl AS (
  SELECT doc_id, {_hex60("md5(g0)")} AS g
  FROM (SELECT doc_id, unnest(sh) AS g0 FROM shing)
),
firsts AS (
  SELECT g, min(doc_id) AS first_id FROM expl GROUP BY g
),
novel AS (
  SELECT first_id AS doc_id, count(*) AS n_novel
  FROM firsts GROUP BY first_id
),
docnov AS (
  SELECT s.doc_id, len(s.sh) AS n_shingles,
         coalesce(n.n_novel, 0) AS n_novel
  FROM shing s LEFT JOIN novel n ON s.doc_id = n.doc_id
)
SELECT d.source, count(*) AS n_docs,
  CAST(sum(dn.n_shingles) AS BIGINT) AS total_shingles,
  CAST(sum(dn.n_novel) AS BIGINT) AS novel_shingles,
  CAST(sum(dn.n_novel) AS BIGINT) / CAST(sum(dn.n_shingles) AS BIGINT)
    AS novelty_rate
FROM docnov dn JOIN documents d ON dn.doc_id = d.doc_id
GROUP BY d.source
"""


def k_anonymity(k: int = 5) -> str:
    """Twin of pii.k_anonymity_profile over (source, lang)."""
    return f"""
WITH groups AS (
  SELECT source, lang, count(*) AS group_size
  FROM documents GROUP BY source, lang
)
SELECT group_size, count(*) AS n_groups,
  CAST(group_size * count(*) AS BIGINT) AS n_rows,
  group_size < {k} AS below_k
FROM groups GROUP BY group_size
"""


def channel_attribution(lookback_minutes: int = 7 * 24 * 60) -> str:
    """Twin of attribution.utouch_attribution +
    channel_attribution_report: same interval join, same window ranks,
    same integer ppm credit split (remainder to the last touch)."""
    return f"""
WITH t AS (
  SELECT user_id, ts AS t_ts, event_id AS touch_id,
    'ch' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 5
                 AS VARCHAR) AS channel
  FROM events WHERE event_type = 'view'
),
c AS (
  SELECT user_id, ts AS c_ts, event_id AS conv_id
  FROM events WHERE event_type = 'purchase'
),
joined AS (
  SELECT t.user_id, conv_id, c_ts, touch_id, t_ts, channel
  FROM t JOIN c ON t.user_id = c.user_id
   AND t_ts < c_ts
   AND t_ts >= c_ts - INTERVAL {lookback_minutes} MINUTE
),
ranked AS (
  SELECT *,
    CAST(row_number() OVER (PARTITION BY conv_id
                            ORDER BY t_ts, touch_id) AS BIGINT) AS pos,
    CAST(row_number() OVER (PARTITION BY conv_id
                            ORDER BY t_ts DESC, touch_id DESC) AS BIGINT)
      AS rpos,
    CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n_touches
  FROM joined
),
credited AS (
  SELECT channel, conv_id,
    CASE WHEN n_touches = 1 THEN 1000000
         WHEN pos = 1 THEN 400000
         WHEN rpos = 1 THEN
           CASE WHEN n_touches = 2 THEN 600000
                ELSE 400000 + (200000 % (n_touches - 2)) END
         ELSE 200000 // (n_touches - 2) END AS credit_ppm
  FROM ranked
)
SELECT channel, CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
  count(*) AS n_touches, CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm
FROM credited GROUP BY channel
"""


def heavy_hitters(k: int = 20) -> str:
    """Twin of skew.heavy_hitters_exact over events.user_id."""
    return f"""
WITH counts AS (
  -- order on the NATIVE key type: Spark's tie-break sorts bigints,
  -- a VARCHAR cast here would sort "100" before "99"
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
top AS (
  SELECT user_id, cnt, total FROM counts CROSS JOIN total
  ORDER BY cnt DESC, user_id ASC LIMIT {k}
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS BIGINT)
         AS rank,
  CAST(user_id AS VARCHAR) AS key, cnt,
  CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm
FROM top
"""


def session_paths(
    gap_seconds: int = 1800, max_steps: int = 5, top_k: int = 20
) -> str:
    """Twin of threads.session_paths: same gap sessionization as the
    q_events_sessionize twin, ordered list agg on the unique (ts,
    event_id) key, first max_steps types joined with '>'."""
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, coalesce(event_type, '') AS etype,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR date_diff('second', prev_ts, ts) > {gap_seconds}
             THEN 1 ELSE 0 END AS newf
  FROM ordered
),
sess AS (
  SELECT *, CAST(sum(newf) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS sid
  FROM flagged
),
paths AS (
  SELECT user_id, sid,
    array_to_string(
      list_slice(list(etype ORDER BY ts, event_id), 1, {max_steps}),
      '>') AS path
  FROM sess GROUP BY user_id, sid
),
counts AS (
  SELECT path, count(*) AS n_sessions FROM paths GROUP BY path
),
top AS (
  SELECT path, n_sessions FROM counts
  ORDER BY n_sessions DESC, path ASC LIMIT {top_k}
)
SELECT CAST(row_number() OVER (ORDER BY n_sessions DESC, path ASC)
            AS BIGINT) AS rank,
  path, n_sessions
FROM top
"""


def collocations(min_count: int = 5, top_k: int = 20) -> str:
    """Twin of text_analysis.collocations: same tokenize/bigram
    relations, integer lift c_xy*N*1e6 // (c_x*c_y), top-k on
    (lift DESC, bigram ASC)."""
    return f"""
WITH toksrc AS (
  SELECT doc_id, {_tokens("coalesce(text, '')")} AS toks FROM documents
),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(toks) AS w FROM toksrc) GROUP BY w
),
ntot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
bi AS (
  SELECT bigram, count(*) AS c_xy
  FROM (SELECT unnest({_bigrams('toks')}) AS bigram FROM toksrc)
  GROUP BY bigram HAVING count(*) >= {min_count}
),
parts AS (
  SELECT bigram, c_xy,
    string_split(bigram, ' ')[1] AS w1,
    string_split(bigram, ' ')[2] AS w2
  FROM bi
),
joined AS (
  SELECT bigram, c_xy, ux.c AS c_x, uy.c AS c_y, n_tokens
  FROM parts
  JOIN uni ux ON w1 = ux.w
  JOIN uni uy ON w2 = uy.w
  CROSS JOIN ntot
),
scored AS (
  SELECT bigram, c_xy, c_x, c_y,
    CAST(CAST(c_xy AS HUGEINT) * n_tokens * 1000000
         // (CAST(c_x AS HUGEINT) * c_y) AS BIGINT) AS lift_ppm
  FROM joined
),
top AS (
  SELECT * FROM scored ORDER BY lift_ppm DESC, bigram ASC LIMIT {top_k}
)
SELECT CAST(row_number() OVER (ORDER BY lift_ppm DESC, bigram ASC)
            AS BIGINT) AS rank,
  bigram, c_xy, c_x, c_y, lift_ppm
FROM top
"""


def _kmeans_ctes(
    k: int = 8, iterations: int = 4, salt: str = "km"
) -> list:
    """The integer Lloyd rounds as a CTE list (shared by
    kmeans_clusters and cluster_topics; every consumer must go through
    materialized() — each round references the previous one several
    times, failure mode 9). Quantization, seeded init, argmin tie rule
    and DIV means mirror the Spark kernel exactly; len(x6) replaces
    any hardcoded dim. Final assignment relation: a{iterations}."""
    h = _hex32(f"md5(CAST(vec_id AS VARCHAR) || ':{salt}')")
    parts = [
        f"""q AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
           + 1000000) AS x6
  FROM embeddings
),
init AS (
  SELECT vec_id, x6, CAST({h} AS BIGINT) AS draw
  FROM q ORDER BY draw, vec_id LIMIT {k}
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY draw, vec_id) AS BIGINT) - 1
           AS cluster,
         x6 AS c6
  FROM init
)"""
    ]
    prev = "c0"
    for t in range(1, iterations + 1):
        parts.append(f"""sc{t} AS (
  SELECT q.vec_id, c.cluster,
    list_sum(list_transform(range(1, len(q.x6) + 1),
      j -> (q.x6[j] - c.c6[j]) * (q.x6[j] - c.c6[j]))) AS dist
  FROM q CROSS JOIN {prev} c
),
a{t} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
      row_number() OVER (PARTITION BY vec_id
                         ORDER BY dist, cluster) AS rn
    FROM sc{t}) WHERE rn = 1
),
s{t} AS (
  SELECT cluster, j, CAST(sum(v) AS BIGINT) AS s, count(*) AS n
  FROM (
    SELECT a.cluster,
      unnest(range(1, len(q.x6) + 1)) AS j,
      unnest(q.x6) AS v
    FROM a{t} a JOIN q ON a.vec_id = q.vec_id)
  GROUP BY cluster, j
),
c{t} AS (
  SELECT cluster, list(s // n ORDER BY j) AS c6
  FROM s{t} GROUP BY cluster
)""")
        prev = f"c{t}"
    return parts


def kmeans_clusters(
    k: int = 8, iterations: int = 4, salt: str = "km"
) -> str:
    """Twin of similarity.kmeans_cluster_profile over the shared Lloyd
    CTE chain (register in _MATERIALIZED_TWINS)."""
    parts = _kmeans_ctes(k, iterations, salt)
    final = f"""members AS (
  SELECT cluster, count(*) AS n_vectors,
         CAST(sum(vec_id) AS BIGINT) AS id_sum
  FROM a{iterations} GROUP BY cluster
),
cents AS (
  SELECT cluster, CAST(sum(s // n) AS BIGINT) AS centroid_checksum
  FROM s{iterations} GROUP BY cluster
)
SELECT m.cluster, m.n_vectors, m.id_sum, c.centroid_checksum
FROM members m JOIN cents c ON m.cluster = c.cluster"""
    return "WITH " + ",\n".join(parts) + ",\n" + final


def cluster_quality(
    k: int = 8, iterations: int = 4, salt: str = "km"
) -> str:
    """Twin of similarity.kmeans_cluster_quality over the shared Lloyd
    CTE chain: per-cluster integer scatter (Σ dist² // n to the c{it}
    centroid) and the Davies-Bouldin component
    max_j (s_i + s_j)*1000 // ‖c_i − c_j‖² in ppk; zero-distance
    centroid pairs excluded, peerless clusters NULL. Register in
    _MATERIALIZED_TWINS (the chain re-references every round)."""
    it = iterations
    parts = _kmeans_ctes(k, iterations, salt)
    final = f"""d2 AS (
  SELECT a.cluster, a.vec_id,
    list_sum(list_transform(range(1, len(q.x6) + 1),
      j -> (q.x6[j] - c.c6[j]) * (q.x6[j] - c.c6[j]))) AS dist
  FROM a{it} a JOIN q ON a.vec_id = q.vec_id
  JOIN c{it} c ON a.cluster = c.cluster
),
scat AS (
  SELECT cluster, count(*) AS n_vectors,
         CAST(sum(dist) // count(*) AS BIGINT) AS scatter
  FROM d2 GROUP BY cluster
),
m2 AS (
  SELECT a.cluster AS ci, b.cluster AS cj,
    list_sum(list_transform(range(1, len(a.c6) + 1),
      j -> (a.c6[j] - b.c6[j]) * (a.c6[j] - b.c6[j]))) AS m2
  FROM c{it} a JOIN c{it} b ON a.cluster <> b.cluster
),
db AS (
  SELECT ci AS cluster,
         CAST(max((si.scatter + sj.scatter) * 1000 // m2.m2)
              AS BIGINT) AS db_ppk
  FROM m2
  JOIN scat si ON m2.ci = si.cluster
  JOIN scat sj ON m2.cj = sj.cluster
  WHERE m2.m2 > 0
  GROUP BY ci
)
SELECT s.cluster, s.n_vectors, s.scatter, db.db_ppk
FROM scat s LEFT JOIN db ON s.cluster = db.cluster"""
    return "WITH " + ",\n".join(parts) + ",\n" + final


def cluster_topics(
    k: int = 8,
    iterations: int = 4,
    salt: str = "km",
    top_k: int = 5,
    min_tf: int = 5,
) -> str:
    """Twin of similarity.cluster_topics over lloyd_kmeans assignments:
    (cluster, term) counts pruned at min_tf; term/class/grand totals
    over that SAME pruned relation; lift = tf_tc*N*1e6 // (tf_t*T_c);
    per-cluster top-k on (lift DESC, term ASC). Register in
    _MATERIALIZED_TWINS."""
    parts = _kmeans_ctes(k, iterations, salt)
    final = f"""toks AS (
  SELECT a.cluster, unnest({_tokens("coalesce(d.text, '')")}) AS term
  FROM a{iterations} a JOIN documents d ON a.vec_id = d.doc_id
),
tc AS (
  SELECT cluster, term, count(*) AS tf_class
  FROM toks GROUP BY cluster, term HAVING count(*) >= {min_tf}
),
term_tot AS (
  SELECT term, CAST(sum(tf_class) AS BIGINT) AS tf_global
  FROM tc GROUP BY term
),
class_tot AS (
  SELECT cluster, CAST(sum(tf_class) AS BIGINT) AS t_class
  FROM tc GROUP BY cluster
),
ntot AS (SELECT CAST(sum(tf_global) AS BIGINT) AS n_total FROM term_tot),
scored AS (
  SELECT tc.cluster, tc.term, tc.tf_class, tt.tf_global,
    CAST(tc.tf_class * n_total * 1000000 // (tt.tf_global * ct.t_class)
         AS BIGINT) AS lift_ppm
  FROM tc
  JOIN term_tot tt ON tc.term = tt.term
  JOIN class_tot ct ON tc.cluster = ct.cluster
  CROSS JOIN ntot
)
SELECT cluster, rank, term, tf_class, tf_global, lift_ppm FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY cluster
                                    ORDER BY lift_ppm DESC, term ASC)
                 AS BIGINT) AS rank
  FROM scored) WHERE rank <= {top_k}"""
    return "WITH " + ",\n".join(parts) + ",\n" + final


def vocab_drift(top_k: int = 20, min_docs: int = 3) -> str:
    """Twin of text_analysis.vocab_drift with the driver split
    (doc_id % 2): distinct-term df per side, ppm shares via //,
    top-k on (|delta| DESC, term ASC)."""
    return f"""
WITH olds AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
news AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
oc AS (
  SELECT term, count(*) AS df_old FROM (
    SELECT doc_id, unnest(list_distinct({_tokens("coalesce(text, '')")}))
             AS term
    FROM olds) GROUP BY term
),
nc AS (
  SELECT term, count(*) AS df_new FROM (
    SELECT doc_id, unnest(list_distinct({_tokens("coalesce(text, '')")}))
             AS term
    FROM news) GROUP BY term
),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_old,
         (SELECT CAST(count(*) AS BIGINT) FROM news) AS n_new
  FROM olds
),
joined AS (
  SELECT coalesce(oc.term, nc.term) AS term,
    coalesce(df_old, 0) AS df_old, coalesce(df_new, 0) AS df_new
  FROM oc FULL OUTER JOIN nc ON oc.term = nc.term
),
scored AS (
  SELECT term, df_old, df_new,
    CAST(df_old * 1000000 // n_old AS BIGINT) AS share_old_ppm,
    CAST(df_new * 1000000 // n_new AS BIGINT) AS share_new_ppm
  FROM joined CROSS JOIN counts
  WHERE df_old + df_new >= {min_docs}
),
top AS (
  SELECT *, share_new_ppm - share_old_ppm AS delta_ppm FROM scored
  ORDER BY abs(share_new_ppm - share_old_ppm) DESC, term ASC
  LIMIT {top_k}
)
SELECT CAST(row_number() OVER (ORDER BY abs(delta_ppm) DESC, term ASC)
            AS BIGINT) AS rank,
  term, df_old, df_new, share_old_ppm, share_new_ppm, delta_ppm
FROM top
"""


def events_gapfill(grain_sec: int = 3600) -> str:
    """Twin of rollup.gapfill_locf: integer epoch buckets
    (floor(epoch/grain) == unix_seconds DIV grain — the fractional
    second cannot cross an integer-second boundary), per-key dense
    range() grid, LOCF via last_value IGNORE NULLS over bucket
    order."""
    return f"""
WITH obs AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {grain_sec}) AS BIGINT) AS bucket,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
  FROM obs GROUP BY event_type
),
grid AS (
  SELECT event_type, unnest(range(b0, b1 + 1)) AS bucket FROM spans
),
j AS (
  SELECT g.event_type, g.bucket, o.n_obs
  FROM grid g LEFT JOIN obs o
    ON g.event_type = o.event_type AND g.bucket = o.bucket
)
SELECT event_type, bucket, n_obs,
  CAST(last_value(n_obs IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS BIGINT) AS filled,
  n_obs IS NULL AS is_gap
FROM j
"""


def lateness_profile() -> str:
    """Twin of rollup.lateness_profile: running event-time max in
    arrival order per key, floored epoch seconds (unix_timestamp
    mirror), exact interpolated percentiles (quantile_cont ==
    Spark percentile on integer inputs)."""
    return """
WITH lat AS (
  SELECT event_type,
    CAST(max(CAST(floor(epoch(ts)) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS UNBOUNDED PRECEDING)
         - CAST(floor(epoch(ts)) AS BIGINT) AS BIGINT) AS late_s
  FROM events
)
SELECT event_type, count(*) AS n_events,
  CAST(sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  CAST(max(late_s) AS BIGINT) AS max_late_s,
  quantile_cont(late_s, 0.5) AS p50_late_s,
  quantile_cont(late_s, 0.95) AS p95_late_s
FROM lat GROUP BY event_type
"""


def embedding_coverage() -> str:
    """Twin of embstats.embedding_coverage over (documents,
    embeddings, source)."""
    return """
WITH vid AS (SELECT DISTINCT vec_id AS doc_id FROM embeddings),
marked AS (
  SELECT d.source, d.doc_id,
    CASE WHEN v.doc_id IS NULL THEN 0 ELSE 1 END AS has_v
  FROM documents d LEFT JOIN vid v ON d.doc_id = v.doc_id
),
per_group AS (
  SELECT source, count(*) AS n_docs,
    CAST(sum(has_v) AS BIGINT) AS n_with_embedding
  FROM marked GROUP BY source
),
orphans AS (
  SELECT CAST(count(*) AS BIGINT) AS n_orphan_vectors
  FROM vid v LEFT JOIN (SELECT DISTINCT doc_id FROM documents) d
    ON v.doc_id = d.doc_id
  WHERE d.doc_id IS NULL
)
SELECT source, n_docs, n_with_embedding,
  n_docs - n_with_embedding AS n_missing,
  CAST(n_with_embedding * 1000000 // n_docs AS BIGINT) AS coverage_ppm,
  n_orphan_vectors
FROM per_group CROSS JOIN orphans
"""


def dedup_recall_report(
    min_jaccard: float = 0.5,
    bits: int = 32,
    bands: int = 4,
    max_distance: int = 3,
) -> str:
    """Twin of dedup.dedup_recall_report: candidate recall of each
    near-dup generator vs the exact all-pairs Jaccard >= t truth. The
    minhash/simhash/winnow candidate CTEs are the SAME certified shapes
    as dedup_minhash_pairs / dedup_simhash_pairs / winnow_pairs (gate
    parameters: k=3 grams, window 4, min_shared 2, max_df 50); the
    prefix generator's certified twin is the all-pairs truth itself
    (losslessness), so its row is the truth relation verbatim — a hash
    match re-proves the PPJoin claim from inside the report."""
    band_sqls = []
    for b in range(4):
        parts = " || '|' || ".join(
            f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4)
        )
        band_sqls.append(
            f"SELECT doc_id, {b} AS band, md5({parts}) AS bh FROM sigs"
        )
    bands_sql = " UNION ALL ".join(band_sqls)
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    band_values = ", ".join(f"({i})" for i in range(bands))
    jac = "i.n_inter / greatest(sa.n_sh + sb.n_sh - i.n_inter, 1)"
    return f"""
WITH {_minhash_ctes()},
bandhash AS ({bands_sql}),
mh_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandhash a JOIN bandhash b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
expl AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
),
sizes AS (
  SELECT doc_id, len(sh) AS n_sh FROM shing
),
inter AS (
  SELECT ea.doc_id AS id_a, eb.doc_id AS id_b, count(*) AS n_inter
  FROM expl ea JOIN expl eb ON eb.s = ea.s AND ea.doc_id < eb.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.id_a, i.id_b FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE round({jac}, 6) >= {min_jaccard!r}
),
sims AS ({dedup_simhash(bits)}),
simbands AS (
  SELECT doc_id, simhash,
         t.band, (simhash >> (t.band * {band_bits})) & {mask} AS bv
  FROM sims CROSS JOIN (VALUES {band_values}) AS t(band)
),
sh_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM simbands a
  JOIN simbands b ON a.band = b.band AND a.bv = b.bv
             AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_distance}
),
{_winnow_ctes(3, 4, with_toksrc=False)},
wn_posts AS (
  SELECT DISTINCT doc_id, h FROM fps
),
wn_df AS (
  SELECT h FROM wn_posts GROUP BY h HAVING count(*) <= 50
),
wn_cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM wn_posts a
  JOIN wn_df c ON c.h = a.h
  JOIN wn_posts b ON b.h = a.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
),
cands AS (
  SELECT 'minhash_lsh' AS method, id_a, id_b FROM mh_cand
  UNION ALL SELECT 'prefix' AS method, id_a, id_b FROM truth
  UNION ALL SELECT 'simhash' AS method, id_a, id_b FROM sh_cand
  UNION ALL SELECT 'winnow' AS method, id_a, id_b FROM wn_cand
),
tc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth
),
per AS (
  SELECT c.method, CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM cands c
  LEFT JOIN truth t ON t.id_a = c.id_a AND t.id_b = c.id_b
  GROUP BY c.method
),
m(method) AS (VALUES ('minhash_lsh'), ('prefix'), ('simhash'),
              ('winnow'))
SELECT m.method, tc.n_truth,
       coalesce(per.n_candidates, 0) AS n_candidates,
       coalesce(per.n_hits, 0) AS n_hits,
       round(coalesce(per.n_hits, 0) / greatest(tc.n_truth, 1), 6)
         AS recall_at_t
FROM m CROSS JOIN tc LEFT JOIN per ON per.method = m.method
ORDER BY m.method
"""


def _winnow_ctes(
    gram_k: int = 3, window: int = 4, with_toksrc: bool = True
) -> str:
    """toksrc..fps CTE chain: winnowing fingerprint selection (twin of
    text_analysis.winnow_selected). POSITIONAL grams (no list_distinct —
    stride 1), md5 per gram, per-window min with rightmost tie: the
    frame min(h) finds the minimum, the join-back + max(pos) resolves
    ties to the rightmost occurrence — the same (h, -pos) order the
    Spark struct array_min applies."""
    k, w = gram_k, window
    concat = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    grams = (
        f"CASE WHEN len(toks) < {k} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, len(toks) - {k - 2}), "
        f"i -> md5({concat})) END"
    )
    toksrc = f"""
toksrc AS (
  SELECT doc_id, {_tokens('text')} AS toks FROM documents
),"""
    # with_toksrc=False lets a composing twin that ALREADY defines the
    # identical toksrc CTE (the shingle chain's) reuse it instead of
    # tripping DuckDB's duplicate-CTE check (dedup_recall_report, r6)
    return (toksrc if with_toksrc else "") + f"""
g AS (
  SELECT doc_id, {grams} AS hs FROM toksrc
),
posu AS (
  SELECT doc_id, unnest(range(1, len(hs) + 1)) AS p, hs
  FROM g WHERE len(hs) >= {w}
),
ph AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p, hs[p] AS h,
         CAST(len(hs) AS BIGINT) AS n
  FROM posu
),
wmin AS (
  SELECT doc_id, p, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS mh
  FROM ph
),
starts AS (
  SELECT doc_id, p AS s, mh FROM wmin WHERE p <= n - {w} + 1
),
sel AS (
  SELECT st.doc_id, st.s, st.mh AS h, max(g2.p) AS pos
  FROM starts st
  JOIN ph g2 ON g2.doc_id = st.doc_id
            AND g2.p >= st.s AND g2.p < st.s + {w}
            AND g2.h = st.mh
  GROUP BY 1, 2, 3
),
fps AS (
  SELECT DISTINCT doc_id, pos, h FROM sel
)"""


def winnow_fingerprints(gram_k: int = 3, window: int = 4) -> str:
    """Twin of text_analysis.winnow_fingerprints: per-doc fingerprint
    count + selected density over the winnowing chain."""
    return f"""
WITH {_winnow_ctes(gram_k, window)},
base AS (
  SELECT doc_id,
         CAST(greatest(len(toks) - {gram_k - 1}, 0) AS BIGINT) AS n_grams
  FROM toksrc
),
per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp FROM fps GROUP BY doc_id
)
SELECT b.doc_id, b.n_grams,
       CAST(coalesce(p.n_fp, 0) AS BIGINT) AS n_fp,
       round(coalesce(p.n_fp, 0) / greatest(b.n_grams, 1), 6) AS density
FROM base b LEFT JOIN per p ON p.doc_id = b.doc_id
"""


def winnow_pairs(
    gram_k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> str:
    """Twin of text_analysis.winnow_pairs: pairs sharing >= min_shared
    distinct fingerprint hashes, max_df cap applied before expansion.
    Posting key = 60-bit md5 prefix (_hex60), matching the Spark side's
    shuffle-key narrowing exactly."""
    return f"""
WITH {_winnow_ctes(gram_k, window)},
posts AS (
  SELECT DISTINCT doc_id, {_hex60("h")} AS h FROM fps
),
df_cap AS (
  SELECT h FROM posts GROUP BY h HAVING count(*) <= {max_df}
),
pr AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM posts a
  JOIN df_cap c ON c.h = a.h
  JOIN posts b ON b.h = a.h AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM pr GROUP BY 1, 2 HAVING count(*) >= {min_shared}
"""


def winnow_span_report(
    gram_k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> str:
    """Twin of text_analysis.winnow_span_report: winnow_pairs plus the
    per-document extent of the shared fingerprints (n_shared counts
    DISTINCT hashes; extents range over every matched position pair).
    Posting key = 60-bit md5 prefix (_hex60), matching the Spark side's
    shuffle-key narrowing exactly."""
    return f"""
WITH {_winnow_ctes(gram_k, window)},
fps60 AS (
  SELECT doc_id, pos, {_hex60("h")} AS h FROM fps
),
posts AS (
  SELECT DISTINCT doc_id, h FROM fps60
),
df_cap AS (
  SELECT h FROM posts GROUP BY h HAVING count(*) <= {max_df}
),
pr AS (
  SELECT a.h, a.doc_id AS id_a, b.doc_id AS id_b,
         a.pos AS a_pos, b.pos AS b_pos
  FROM fps60 a
  JOIN df_cap c ON c.h = a.h
  JOIN fps60 b ON b.h = a.h AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
  CAST(count(DISTINCT h) AS BIGINT) AS n_shared,
  CAST(min(a_pos) AS BIGINT) AS a_pos_min,
  CAST(max(a_pos) AS BIGINT) AS a_pos_max,
  CAST(min(b_pos) AS BIGINT) AS b_pos_min,
  CAST(max(b_pos) AS BIGINT) AS b_pos_max
FROM pr GROUP BY 1, 2 HAVING count(DISTINCT h) >= {min_shared}
"""


def q2_min_acctbal_supplier() -> str:
    """Twin of the Q2 correlated-min shape (slim schema: lineitem
    distinct pairs as the part↔supplier relation, s_acctbal as the
    minimized cost). Stored doubles compare exactly."""
    return """
WITH cand AS (
  SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
                  n.n_name, s.s_acctbal
  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
  JOIN part p ON p.p_partkey = lp.l_partkey
  JOIN supplier s ON s.s_suppkey = lp.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE p.p_size % 10 = 5 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM cand c
WHERE c.s_acctbal = (
  SELECT min(c2.s_acctbal) FROM cand c2
  WHERE c2.p_partkey = c.p_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q9_product_profit() -> str:
    """Twin of the Q9 profit shape (cost proxy = 0.5 * retailprice *
    quantity; exact decimal sums emitted as doubles — safe for
    negative profits where the DIV/+50 HALF_UP emit would diverge)."""
    return """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
         - CAST(l.l_quantity * p.p_retailprice * 0.5 AS DECIMAL(18,4))
       ) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q11_important_parts() -> str:
    """Twin of the Q11 value-vs-global-total shape; the threshold
    compare stays in the exact decimal domain (value * 1000 > total)."""
    return """
WITH val AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS v
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, CAST(v AS DOUBLE) AS part_value
FROM val
WHERE v * 1000 > (SELECT sum(v) FROM val)
ORDER BY part_value DESC, p_partkey
"""


def q16_supplier_count() -> str:
    """Twin of the Q16 supplier-count shape (deterministic suppkey %
    10 == 7 exclusion band standing in for the complaints NOT IN)."""
    return """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT lp.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) lp
JOIN part p ON p.p_partkey = lp.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND lp.l_suppkey % 10 <> 7
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_dominant_supplier() -> str:
    """Twin of the Q20 correlated-aggregate-threshold shape: a
    supplier qualifies when its 1996 quantity of a 'small%' part
    exceeds half the part's total (exact decimal compare)."""
    return """
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
), tot AS (
  SELECT l_partkey, sum(qty) AS total_qty FROM ps GROUP BY 1
)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM ps
JOIN tot t ON t.l_partkey = ps.l_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE ps.qty * 2 > t.total_qty AND r.r_name = 'AMERICA'
ORDER BY s.s_suppkey
"""


def doc_entropy() -> str:
    """Twin of lm.char_entropy_scores — per-doc character Shannon
    entropy in integer nanonats (bit-stability per char_lm_scores)."""
    return r"""
WITH base AS (
  SELECT doc_id, lower(coalesce(text, '')) AS t FROM documents
),
ch AS (
  SELECT doc_id, unnest(
    CASE WHEN length(t) >= 1
         THEN list_transform(range(1, length(t) + 1), i -> substr(t, i, 1))
         ELSE []::VARCHAR[] END) AS ch
  FROM base
),
pc AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2),
sc AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_chars,
         CAST(sum(cnt * CAST(round(ln(cnt) * 1000000000.0) AS BIGINT))
              AS BIGINT) AS s9
  FROM pc GROUP BY 1
)
SELECT b.doc_id,
  coalesce(sc.n_chars, 0) AS n_chars,
  CASE WHEN coalesce(sc.n_chars, 0) > 0 THEN
    CAST(CAST(round(ln(sc.n_chars) * 1000000000.0) AS BIGINT)
         - ((sc.s9 + sc.n_chars // 2) // sc.n_chars)
         AS DOUBLE) / 1000000000.0
  END AS char_entropy
FROM (SELECT DISTINCT doc_id FROM base) b
LEFT JOIN sc ON sc.doc_id = b.doc_id
"""


def heaps_vocab_growth(n_checkpoints: int = 10) -> str:
    """Twin of text_analysis.heaps_vocab_growth — pure integer
    vocabulary-growth relation at doc-id checkpoints."""
    return f"""
WITH toks AS (
  SELECT doc_id AS _id, {_tokens("coalesce(text, '')")} AS tokens
  FROM documents
),
first_seen AS (
  SELECT tok, min(_id) AS first_id
  FROM (SELECT _id, unnest(tokens) AS tok FROM toks)
  GROUP BY 1
),
doc_tokens AS (
  SELECT _id, CAST(len(tokens) AS BIGINT) AS n_toks FROM toks
),
cps AS (
  SELECT CAST(k AS INTEGER) AS checkpoint,
         CAST(mx * k // {int(n_checkpoints)} AS BIGINT) AS id_cutoff
  FROM range(1, {int(n_checkpoints)} + 1) t(k),
       (SELECT max(doc_id) AS mx FROM documents)
),
docs_at AS (
  SELECT c.checkpoint, c.id_cutoff,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(d.n_toks) AS BIGINT) AS n_tokens
  FROM doc_tokens d JOIN cps c ON d._id <= c.id_cutoff
  GROUP BY 1, 2
),
vocab_at AS (
  SELECT c.checkpoint, CAST(count(*) AS BIGINT) AS vocab_size
  FROM first_seen f JOIN cps c ON f.first_id <= c.id_cutoff
  GROUP BY 1
)
SELECT d.checkpoint, d.id_cutoff, d.n_docs, d.n_tokens,
       coalesce(v.vocab_size, 0) AS vocab_size
FROM docs_at d LEFT JOIN vocab_at v ON v.checkpoint = d.checkpoint
ORDER BY d.checkpoint
"""


def zipf_slope(max_rank: int = 100) -> str:
    """Twin of text_analysis.zipf_slope — nanonat-quantized log-log OLS
    over the top-max_rank tokens; all four sums in exact HUGEINT (the
    Spark side uses DECIMAL(38,0) — both exact integer domains)."""
    return f"""
WITH counts AS (
  SELECT tok, count(*) AS freq
  FROM (SELECT unnest({_tokens("coalesce(text, '')")}) AS tok
        FROM documents)
  GROUP BY 1
  ORDER BY freq DESC, tok ASC
  LIMIT {int(max_rank)}
),
ranked AS (
  SELECT row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank, freq
  FROM counts
),
q AS (
  SELECT
    CAST(round(ln(rank) * 1000000000.0) AS HUGEINT) AS x9,
    CAST(round(ln(freq) * 1000000000.0) AS HUGEINT) AS y9
  FROM ranked
),
sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x9) AS sx, sum(y9) AS sy,
         sum(x9 * y9) AS sxy, sum(x9 * x9) AS sxx
  FROM q
)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
FROM sums
"""


def column_profile_lineitem() -> str:
    """Twin of stats.column_profile over lineitem: one UNION ALL branch
    per column, typed extremes (timestamps formatted identically to
    Spark's date_format; doubles never stringified)."""
    cols = [
        ("l_orderkey", "num"), ("l_partkey", "num"), ("l_suppkey", "num"),
        ("l_linenumber", "num"), ("l_quantity", "num"),
        ("l_extendedprice", "num"), ("l_discount", "num"), ("l_tax", "num"),
        ("l_returnflag", "str"), ("l_linestatus", "str"),
        ("l_shipdate", "ts"),
    ]
    parts = []
    for name, kind in cols:
        if kind == "ts":
            mn = f"strftime(min({name}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(max({name}), '%Y-%m-%d %H:%M:%S')"
            min_s, max_s = mn, mx
            min_n, max_n = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        elif kind == "str":
            min_s, max_s = f"min({name})", f"max({name})"
            min_n, max_n = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
        else:
            min_s = "CAST(NULL AS VARCHAR)"
            max_s = "CAST(NULL AS VARCHAR)"
            min_n = f"CAST(min({name}) AS DOUBLE)"
            max_n = f"CAST(max({name}) AS DOUBLE)"
        parts.append(f"""
SELECT '{name}' AS column_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nulls,
  CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,
  {min_s} AS min_str, {max_s} AS max_str,
  {min_n} AS min_num, {max_n} AS max_num
FROM lineitem""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY column_name\n"


def link_prediction_aa(
    max_degree: int = 1000,
    top_k: int = 100,
    k: int = 5,
    n_bands: int = 4,
    planes_per_band: int = 6,
    dim: int = 64,
) -> str:
    """Twin of cluster.adamic_adar_scores over the kNN similarity
    graph: exact-integer AA score (w9 = 10^18 // nanonat-ln(deg),
    BIGINT sums), unique (aa9 DESC, a, b) ordering at the top-k cut."""
    inner = knn_graph(
        k=k, n_bands=n_bands, planes_per_band=planes_per_band, dim=dim
    )
    return f"""
WITH und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({inner}) WHERE src <> dst
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS n FROM und UNION ALL SELECT b AS n FROM und)
  GROUP BY 1
),
ctr AS (
  SELECT n,
         CAST(1000000000000000000 AS BIGINT)
           // CAST(round(ln(d) * 1000000000.0) AS BIGINT) AS w9
  FROM deg WHERE d >= 2 AND d <= {int(max_degree)}
),
adj AS (
  SELECT a AS z, b AS x FROM und
  UNION ALL SELECT b AS z, a AS x FROM und
),
adjc AS (SELECT adj.z, adj.x, ctr.w9 FROM adj JOIN ctr ON ctr.n = adj.z),
wed AS (
  SELECT l.x AS a, r.x AS b, l.w9
  FROM adjc l JOIN adjc r ON l.z = r.z AND l.x < r.x
),
ne AS (
  SELECT w.a, w.b, w.w9
  FROM wed w LEFT JOIN und e ON e.a = w.a AND e.b = w.b
  WHERE e.a IS NULL
),
sc AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(w9) AS BIGINT) AS aa9
  FROM ne GROUP BY 1, 2
)
SELECT a AS id_a, b AS id_b, n_common,
       CAST(aa9 AS DOUBLE) / 1000000000.0 AS aa_score
FROM sc
ORDER BY aa9 DESC, a, b
LIMIT {int(top_k)}
"""


def l_diversity(l: int = 3) -> str:
    """Twin of pii.l_diversity_profile over events keyed by
    (event_type, day) with user_id sensitive."""
    return f"""
WITH groups AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS _rows,
         CAST(count(DISTINCT user_id) AS BIGINT) AS diversity
  FROM events GROUP BY 1, 2
)
SELECT diversity,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(_rows) AS BIGINT) AS n_rows,
       diversity < {int(l)} AS below_l
FROM groups GROUP BY diversity
ORDER BY diversity
"""


def dedup_canonical() -> str:
    """Twin of dedup.canonical_dedup_groups over documents + the
    deterministic byte-variant view (doc_id%7==0 re-cased/re-padded
    under id+10_000_000)."""
    return r"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         '  ' || upper(coalesce(text, '')) || ' ' || chr(10) || chr(9)
           AS text
  FROM documents WHERE doc_id % 7 = 0
),
h AS (
  SELECT doc_id,
    md5(trim(regexp_replace(lower(coalesce(text, '')),
                            '[^\p{L}\p{N}]+', ' ', 'g'))) AS canon_hash,
    md5(coalesce(text, '')) AS _raw
  FROM base
)
SELECT canon_hash,
       CAST(min(doc_id) AS BIGINT) AS keeper_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT _raw) AS BIGINT) AS n_byte_variants
FROM h
GROUP BY canon_hash
HAVING count(*) >= 2
ORDER BY keeper_id
"""


def mixing_plan(budget_tokens: int = 10_000_000, alpha: float = 0.7) -> str:
    """Twin of sampling.mixing_plan over documents (stratum=source,
    exact whitespace-token mass; zero-token strata emit NULL
    weight/planned/epochs, mirroring the Spark-side guard)."""
    return f"""
WITH s AS (
  SELECT source AS stratum, count(*) AS n_docs,
    CAST(sum(len({_words("coalesce(text, '')")})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT stratum, n_docs, n_tokens,
  CASE WHEN n_tokens > 0 THEN
  round(power(CAST(n_tokens AS DOUBLE), {alpha}::DOUBLE)
        / sum(power(CAST(n_tokens AS DOUBLE), {alpha}::DOUBLE)) OVER (),
        6) END AS weight,
  CASE WHEN n_tokens > 0 THEN
  round(power(CAST(n_tokens AS DOUBLE), {alpha}::DOUBLE)
        / sum(power(CAST(n_tokens AS DOUBLE), {alpha}::DOUBLE)) OVER ()
        * {float(int(budget_tokens))}, 6) END AS planned_tokens,
  CASE WHEN n_tokens > 0 THEN
  round(power(CAST(n_tokens AS DOUBLE), {alpha}::DOUBLE)
        / sum(power(CAST(n_tokens AS DOUBLE), {alpha}::DOUBLE)) OVER ()
        * {float(int(budget_tokens))} / CAST(n_tokens AS DOUBLE), 6)
    END AS epochs
FROM s
ORDER BY stratum
"""


def embedding_norm_outliers(k_sigma: int = 3) -> str:
    """Twin of embstats.norm_outliers: in-row left-fold squared norm
    quantized to micro units, all-integer three-sigma comparison in
    HUGEINT (the Spark side uses DECIMAL(38,0))."""
    k2 = int(k_sigma) * int(k_sigma)
    return f"""
WITH rows_q AS (
  SELECT vec_id,
    CAST(round(list_sum(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000.0)
      AS BIGINT) AS q
  FROM embeddings
),
tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(q AS HUGEINT)) AS HUGEINT) AS s,
         CAST(sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS HUGEINT)
           AS ss
  FROM rows_q
)
SELECT vec_id,
  CAST(q AS DOUBLE) / 1000000.0 AS norm2,
  (n * q - s) * (n * q - s) > {k2} * (n * ss - s * s) AS is_outlier
FROM rows_q, tot
ORDER BY vec_id
"""


def event_transitions(gap_seconds: int = 1800) -> str:
    """Twin of threads.event_transitions: same gap sessionization as
    the session_paths twin, successor via lead over the unique
    (ts, event_id) key, session-bounded, integer-ppm conditionals."""
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, coalesce(event_type, '') AS etype,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                  OR date_diff('second', prev_ts, ts) > {gap_seconds}
             THEN 1 ELSE 0 END AS newf
  FROM ordered
),
sess AS (
  SELECT *, CAST(sum(newf) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS sid
  FROM flagged
),
paired AS (
  SELECT etype AS cur_type,
    lead(etype) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS next_type,
    lead(sid) OVER (PARTITION BY user_id ORDER BY ts, event_id) = sid
      AS same_session
  FROM sess
),
counts AS (
  SELECT cur_type, next_type,
         CAST(count(*) AS BIGINT) AS n_transitions
  FROM paired
  WHERE next_type IS NOT NULL AND same_session
  GROUP BY 1, 2
)
SELECT cur_type, next_type, n_transitions,
  CAST(n_transitions * 1000000
       // sum(n_transitions) OVER (PARTITION BY cur_type) AS BIGINT)
    AS p_ppm
FROM counts
ORDER BY cur_type, next_type
"""


def boilerplate_templates(
    top_k: int = 3, min_count: int = 2
) -> str:
    """Twin of text_analysis.boilerplate_templates over events.props
    grouped by event_type: digit runs masked to '#', whitespace
    collapsed, per-group top-k by (count DESC, skeleton ASC)."""
    return rf"""
WITH lines AS (
  SELECT event_type AS "group",
         unnest(string_split(coalesce(props, ''), chr(10))) AS line
  FROM events
),
skel AS (
  SELECT "group",
    trim(regexp_replace(regexp_replace(lower(line), '\p{{N}}+', '#', 'g'),
                        '\s+', ' ', 'g')) AS skeleton
  FROM lines
),
counts AS (
  SELECT "group", skeleton, CAST(count(*) AS BIGINT) AS n_lines
  FROM skel WHERE length(skeleton) > 0
  GROUP BY 1, 2
  HAVING count(*) >= {int(min_count)}
),
ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY "group" ORDER BY n_lines DESC, skeleton ASC
  ) AS INTEGER) AS rank
  FROM counts
)
SELECT "group", skeleton, n_lines, rank
FROM ranked WHERE rank <= {int(top_k)}
ORDER BY "group", rank
"""


def feature_correlations() -> str:
    """Twin of text_analysis.feature_correlations: five exact HUGEINT
    moment sums, r assembled from correctly-rounded sqrt of exact
    integers (the Spark side uses DECIMAL(38,0))."""
    names = ["n_chars", "n_tokens", "n_types"]
    moments = ["CAST(count(*) AS HUGEINT) AS n"]
    for a in names:
        moments.append(f"sum(CAST({a} AS HUGEINT)) AS s_{a}")
        moments.append(
            f"sum(CAST({a} AS HUGEINT) * CAST({a} AS HUGEINT)) AS ss_{a}"
        )
    pairs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            moments.append(
                f"sum(CAST({a} AS HUGEINT) * CAST({b} AS HUGEINT))"
                f" AS sp_{a}_{b}"
            )
            pairs.append(
                f"SELECT '{a}' AS feat_a, '{b}' AS feat_b,"
                f" CAST(n AS BIGINT) AS n,"
                f" CASE WHEN n * ss_{a} - s_{a} * s_{a} > 0"
                f" AND n * ss_{b} - s_{b} * s_{b} > 0 THEN"
                f" round(CAST(n * sp_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
                f" / (sqrt(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))"
                f" * sqrt(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))), 6)"
                f" END AS pearson_r FROM mom"
            )
    toks = _tokens("coalesce(text, '')")
    feats = (
        "SELECT length(coalesce(text, '')) AS n_chars, "
        f"len({toks}) AS n_tokens, "
        f"len(list_distinct({toks})) AS n_types "
        "FROM documents"
    )
    return (
        f"WITH feats AS ({feats}), mom AS (SELECT "
        + ", ".join(moments)
        + " FROM feats) "
        + " UNION ALL ".join(pairs)
        + " ORDER BY feat_a, feat_b"
    )


def interarrival_profile(k_num: int = 3, k_den: int = 1) -> str:
    """Twin of the inter-arrival robust profile: lag deltas over the
    (user, ts, event_id) order, then the length_outliers med2/mad4
    histogram chain keyed by event_type."""
    return f"""
WITH deltas AS (
  SELECT event_type,
    date_diff('second',
      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      ts) AS delta
  FROM events
),
hist AS (
  SELECT event_type, CAST(delta AS BIGINT) AS v, count(*) AS cnt
  FROM deltas WHERE delta IS NOT NULL GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, v, cnt,
    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hist
),
med AS (
  SELECT event_type,
    min(CASE WHEN cum >= ((n - 1) // 2) + 1 THEN v END)
      + min(CASE WHEN cum >= (n // 2) + 1 THEN v END) AS med2,
    max(n) AS n_rows
  FROM ranked GROUP BY event_type
),
devhist AS (
  SELECT h.event_type, abs(2 * h.v - m.med2) AS v,
         CAST(sum(h.cnt) AS BIGINT) AS cnt
  FROM hist h JOIN med m ON h.event_type = m.event_type
  GROUP BY 1, 2
),
dranked AS (
  SELECT event_type, v, cnt,
    CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM devhist
),
mad AS (
  SELECT event_type,
    min(CASE WHEN cum >= ((n - 1) // 2) + 1 THEN v END)
      + min(CASE WHEN cum >= (n // 2) + 1 THEN v END) AS mad4
  FROM dranked GROUP BY event_type
),
flagged AS (
  SELECT h.event_type, h.cnt,
    (2 * h.v < m.med2) AS is_low,
    (2 * abs(2 * h.v - m.med2) * {k_den} > {k_num} * d.mad4) AS is_out
  FROM hist h
  JOIN med m ON h.event_type = m.event_type
  JOIN mad d ON h.event_type = d.event_type
),
tallies AS (
  SELECT event_type,
    CAST(sum(CASE WHEN is_out AND is_low THEN cnt ELSE 0 END)
         AS BIGINT) AS n_low_outliers,
    CAST(sum(CASE WHEN is_out AND NOT is_low THEN cnt ELSE 0 END)
         AS BIGINT) AS n_high_outliers
  FROM flagged GROUP BY event_type
)
SELECT m.event_type, m.n_rows, m.med2 / 2.0 AS median,
  d.mad4 / 4.0 AS mad, t.n_low_outliers, t.n_high_outliers
FROM med m
JOIN mad d ON m.event_type = d.event_type
JOIN tallies t ON m.event_type = t.event_type
ORDER BY m.event_type
"""


def community_modularity(
    rounds: int = 4, min_jaccard: float = 0.5
) -> str:
    """Twin of cluster.community_modularity over the label-propagation
    partition of the near-dup graph: exact HUGEINT numerator
    Σ_c(4m·e_c − d_c²), one double division (Spark uses
    DECIMAL(38,0))."""
    return f"""
WITH comm AS ({dedup_communities(rounds=rounds, min_jaccard=min_jaccard)}),
pairs2 AS ({dedup_minhash_pairs(min_jaccard=min_jaccard)}),
und2 AS (
  SELECT DISTINCT least(id_a, id_b) AS a, greatest(id_a, id_b) AS b
  FROM pairs2 WHERE id_a <> id_b
),
both2 AS (
  SELECT u.a, u.b, ca.community AS ca, cb.community AS cb
  FROM und2 u
  JOIN comm ca ON ca.doc_id = u.a
  JOIN comm cb ON cb.doc_id = u.b
),
ec AS (
  SELECT ca AS c, CAST(count(*) AS HUGEINT) AS e_c
  FROM both2 WHERE ca = cb GROUP BY 1
),
dc AS (
  SELECT c, CAST(count(*) AS HUGEINT) AS d_c
  FROM (SELECT ca AS c FROM both2 UNION ALL SELECT cb AS c FROM both2)
  GROUP BY 1
),
mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM und2),
per AS (
  SELECT dc.c, coalesce(ec.e_c, 0::HUGEINT) AS e_c, dc.d_c
  FROM dc LEFT JOIN ec ON ec.c = dc.c
)
SELECT CAST(count(*) AS BIGINT) AS n_communities,
  CAST(max(mm.m) AS BIGINT) AS m_edges,
  round(CAST(sum(4 * mm.m * per.e_c - per.d_c * per.d_c) AS DOUBLE)
        / (4.0 * CAST(max(mm.m) AS DOUBLE) * CAST(max(mm.m) AS DOUBLE)),
        6) AS modularity
FROM per, mm
"""


def community_source_nmi(
    rounds: int = 4, min_jaccard: float = 0.5
) -> str:
    """Twin of cluster.partition_label_nmi over the label-propagation
    partition × source: per-cell pointwise MI from SUMS of quantized
    lns (identical formula both engines), exact BIGINT reductions,
    symmetric half-up division for the possibly-negative I9."""
    ln9 = "CAST(round(ln({x}) * 1000000000.0) AS BIGINT)"
    return f"""
WITH comm AS ({dedup_communities(rounds=rounds, min_jaccard=min_jaccard)}),
cells AS (
  SELECT c.community AS x, d.source AS y,
         CAST(count(*) AS BIGINT) AS c_xy
  FROM comm c JOIN documents d ON d.doc_id = c.doc_id
  GROUP BY 1, 2
),
cx AS (SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cells GROUP BY 1),
cy AS (SELECT y, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells),
hx AS (
  SELECT CAST(count(*) AS BIGINT) AS n_labels,
    {ln9.format(x='max(t.n)')}
      - (CAST(sum(c_x * {ln9.format(x='c_x')}) AS BIGINT)
         + max(t.n) // 2) // max(t.n) AS h9x
  FROM cx, tot t
),
hy AS (
  SELECT CAST(count(*) AS BIGINT) AS n_categories,
    {ln9.format(x='max(t.n)')}
      - (CAST(sum(c_y * {ln9.format(x='c_y')}) AS BIGINT)
         + max(t.n) // 2) // max(t.n) AS h9y
  FROM cy, tot t
),
i9t AS (
  SELECT max(t.n) AS n_docs,
    CAST(sum(c_xy * ({ln9.format(x='t.n')} + {ln9.format(x='c_xy')}
                     - {ln9.format(x='c_x')} - {ln9.format(x='c_y')}))
         AS BIGINT) AS s,
    max(t.n) AS n
  FROM cells
  JOIN cx USING (x) JOIN cy USING (y), tot t
),
i9 AS (
  SELECT n_docs,
    CASE WHEN s >= 0 THEN (s + n // 2) // n
         ELSE -((-s + n // 2) // n) END AS i9
  FROM i9t
)
SELECT hx.n_labels, hy.n_categories, i9.n_docs,
  CASE WHEN hx.h9x + hy.h9y > 0 THEN
    round(2.0 * CAST(i9.i9 AS DOUBLE)
          / CAST(hx.h9x + hy.h9y AS DOUBLE), 6)
  END AS nmi
FROM hx, hy, i9
"""


def length_quantiles_exact(
    permilles: tuple = (100, 250, 500, 750, 900),
) -> str:
    """Twin of stats.histogram_quantiles over documents (n_chars by
    source): type-1 lower quantile at rank ⌈p·n⌉ via histogram
    cumsums — pure integers. NULL values excluded before the
    histogram, mirroring the Spark-side filter (n_rows = non-NULL
    count)."""
    qcols = ", ".join(
        f"min(CASE WHEN cum >= ({int(p)} * n + 999) // 1000 THEN v END)"
        f" AS q_p{int(p)}"
        for p in permilles
    )
    return f"""
WITH hist AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
),
ranked AS (
  SELECT source, v,
    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n
  FROM hist
)
SELECT source, CAST(max(n) AS BIGINT) AS n_rows, {qcols}
FROM ranked GROUP BY source ORDER BY source
"""


def burstiness_profile() -> str:
    """Twin of threads.burstiness_profile: exact HUGEINT moments,
    B = (sqrt(nΣd²−S²) − S)/(sqrt(nΣd²−S²) + S)."""
    return """
WITH deltas AS (
  SELECT coalesce(event_type, '') AS event_type,
    date_diff('second',
      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
      ts) AS d
  FROM events
),
mom AS (
  SELECT event_type,
    CAST(count(*) AS HUGEINT) AS n,
    CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS s,
    CAST(sum(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS HUGEINT) AS ss
  FROM deltas WHERE d IS NOT NULL GROUP BY 1
)
SELECT event_type,
  CAST(n AS BIGINT) AS n_intervals,
  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
  CASE WHEN sqrt(CAST(n * ss - s * s AS DOUBLE)) + CAST(s AS DOUBLE) > 0
  THEN round(
    (sqrt(CAST(n * ss - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
    / (sqrt(CAST(n * ss - s * s AS DOUBLE)) + CAST(s AS DOUBLE)), 6)
  END AS burstiness
FROM mom
ORDER BY event_type
"""


def materialized(sql: str) -> str:
    """Pin every CTE in `sql` to ONE evaluation (`AS MATERIALIZED`) —
    the fix for DETERMINISM.md failure mode 9: DuckDB's default CTE
    inlining re-evaluates a CTE at every reference, which turns
    unrolled iterative twins (pagerank rounds, the dup-chain reused by
    cluster/graph queries) EXPONENTIAL in round count — measured
    pagerank_dupgraph 21.3 s -> 0.17 s at sf0.01 with identical rows.
    Skips recursive CTEs and WINDOW clauses (both also match the
    `name AS (` shape but must not be materialized)."""
    import re

    return re.sub(
        r"(?<!RECURSIVE )(?<!WINDOW )(\b[A-Za-z_]\w*) AS \(",
        r"\1 AS MATERIALIZED (",
        sql,
    )
