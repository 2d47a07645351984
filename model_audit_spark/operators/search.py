"""BM25 full-text scoring over the corpus (Robertson/Spärck Jones; the
standard retrieval scorer — quality-aware text search is how curation
pipelines pull topic slices out of a 100 TB corpus).

score(d, q) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   [the Lucene non-negative form]

Plan shape at scale:
- document stats (per-doc length, corpus N/avgdl) and per-(doc, term)
  tf for QUERY TERMS ONLY — the token explode is filtered to the query's
  literal term set before the aggregate, so the shuffle carries ~|q|
  rows per matching doc, not the whole postings relation.
- df per query term is a tiny aggregate (|q| rows) joined broadcast.
- top-k by (score desc, doc_id) via TakeOrdered — never a global sort.

Bit-stability: idf is rounded to 9dp once per TERM (a handful of ln
calls — the only op where engines can drift a ulp), each contribution is
rounded to 9dp and cast DECIMAL(28,9), and the per-doc sum is exact
decimal arithmetic; the emitted score is that exact decimal cast to
DOUBLE at the final projection (identical decimals → identical doubles,
and comparators that canonicalize Decimal and float differently — the
round-3 driver hash failures — see the same bits from both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column
from model_audit_spark.functions.text import word_tokens

__all__ = [
    "bm25_search",
    "tfidf_keywords",
    "phrase_search",
    "hybrid_rrf_search",
]

K1 = 1.2
B = 0.75


def bm25_search(
    df: DataFrame,
    query: str,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """(id, n_hits, score) for the top-k BM25 documents of `query`.

    Query terms are tokenized with the same word tokenizer as documents;
    duplicate query terms count once (standard bag-of-terms query).
    NULL text behaves as empty (dl = 0, counted in n_docs/avgdl) — the
    repo-wide NULL convention, coalesced identically in the oracle.

    One scan, one tokenize: the (id, tokens, dl) projection is built
    once (named-attribute projection so CollapseProject cannot inline
    the tokenizer into the explode AND the size) and persisted; corpus
    stats aggregate the cached projection instead of re-scanning the
    table. At 100 TB, pass `corpus_stats=(n_docs, avgdl)` from the
    corpus-stats table maintained at ingest and the stats pass
    disappears entirely.
    """
    terms = sorted(
        {t for t in __import__("re").findall(r"[\w]+", query.lower()) if t}
    )
    if not terms:
        raise ValueError("query has no terms")

    base = (
        df.select(
            F.col(id_col),
            word_tokens(
                F.coalesce(F.col(text_col), F.lit(""))
            ).alias("_w"),
        )
        .select(F.col(id_col), F.col("_w"), F.size("_w").alias("dl"))
        .persist()
    )
    hits = base.select(
        F.col(id_col), F.col("dl"), F.explode("_w").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )

    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
        stats = df.sparkSession.range(1).select(
            F.lit(int(n_docs)).alias("n_docs"),
            F.lit(float(avgdl)).alias("avgdl"),
        )
    else:
        stats = base.select(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct(id_col).alias("dfreq")
    )
    idf9 = F.round(
        F.ln(
            (F.col("n_docs") - F.col("dfreq") + 0.5)
            / (F.col("dfreq") + 0.5)
            + 1.0
        ),
        9,
    )
    terms_idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term", idf9.alias("idf9"), "avgdl"
    )
    contrib = F.round(
        F.col("idf9")
        * (F.col("tf") * (K1 + 1))
        / (
            F.col("tf")
            + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))
        ),
        9,
    ).cast("decimal(28,9)")
    scored = (
        tf.join(F.broadcast(terms_idf), "term")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_hits"),
            F.sum(contrib).alias("score"),
        )
    )
    # order/limit on the exact DECIMAL, emit DOUBLE (DETERMINISM.md rule 4)
    return (
        scored.orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .withColumn("score", F.col("score").cast("double"))
    )


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    query: str,
    query_vec_id: int = 0,
    n_cand: int = 50,
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval by reciprocal-rank fusion:
    (doc_id, bm25_rank, cos_rank, rrf_score) for the top-k documents of
    RRF(d) = Σ_lists 1/(rrf_k + rank_list(d))   [Cormack et al., rrf_k=60]

    over two candidate lists: BM25 top-`n_cand` for the text `query`
    and exact-cosine top-`n_cand` for the embedding of `query_vec_id`
    (emb's `vec_id` is the corpus doc_id). Missing from a list means no
    contribution from it (the standard convention) — the rank columns
    are NULL for the absent side.

    Plan shape at scale: each leg is already a TakeOrdered top-n_cand
    (never a global sort); fusion then operates on ≤ 2·n_cand rows —
    the rank windows and the full-outer join are bounded by the
    candidate budget, not the corpus. Swap the exact-cosine leg for any
    of the ANN legs (ivf/pq/sq8) at 100 TB; the fusion contract is
    unchanged.

    Bit-stability (DETERMINISM.md rules 3-4): ranks are exact integers
    from deterministic orderings (both legs tiebreak on id); each
    contribution 1/(rrf_k+rank) is one IEEE division rounded 9dp and
    cast DECIMAL(28,9); the sum, ordering, and top-k cut are exact
    decimal; the emitted rrf_score is that decimal cast DOUBLE.
    """
    from pyspark.sql import Window

    from model_audit_spark.operators.similarity import cosine_topk

    bm = bm25_search(docs, query, k=n_cand, text_col=text_col,
                     id_col=id_col)
    cos = cosine_topk(emb, query_vec_id, k=n_cand, id_col=vec_id_col,
                      vec_col=vec_col)

    # rank windows over the ≤ n_cand candidate rows (bounded state —
    # the unpartitioned window is a single task over the budget, not
    # the corpus)
    bw = Window.orderBy(F.desc("score"), F.asc(id_col))
    bmr = bm.withColumn("bm25_rank", F.row_number().over(bw)).select(
        id_col, "bm25_rank"
    )
    cr = (
        cos.select(F.col(vec_id_col).alias(id_col), F.col("cosine_sim"))
        .withColumn(
            "cos_rank",
            F.row_number().over(
                Window.orderBy(F.desc("cosine_sim"), F.asc(id_col))
            ),
        )
        .select(id_col, "cos_rank")
    )

    contrib = lambda rank: F.coalesce(  # noqa: E731
        F.round(1.0 / (F.lit(rrf_k) + F.col(rank)), 9)
        .cast("decimal(28,9)"),
        F.lit(0).cast("decimal(28,9)"),
    )
    fused = (
        bmr.join(cr, id_col, "full")
        .select(
            F.col(id_col),
            F.col("bm25_rank"),
            F.col("cos_rank"),
            (contrib("bm25_rank") + contrib("cos_rank"))
            .cast("decimal(28,9)")
            .alias("_rrf"),
        )
    )
    return (
        fused.orderBy(F.desc("_rrf"), F.asc(id_col))
        .limit(k)
        .select(
            id_col,
            "bm25_rank",
            "cos_rank",
            F.col("_rrf").cast("double").alias("rrf_score"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_occurrences) for documents containing the EXACT token
    sequence `phrase` (the positional match BM25's bag-of-terms scoring
    cannot express).

    Tokenizes the phrase with the document tokenizer, then counts
    occurrences by comparing the next |phrase| tokens at every position
    (higher-order filter over a position sequence — O(n·k) per row with
    no per-position string allocation): a pure projection + filter, no
    join, no shuffle except the final ordering. The same scan/projection shape as detection — linear in
    corpus size, trivially streamable.

    NULL text behaves as empty (no match). Single-term phrases reduce to
    a token-equality count.

    A conjunctive substring pre-filter runs before tokenization: every
    phrase token comes from \\w+ over lower(text), so a matching doc
    must contain each term as a contiguous substring of its lowered
    text — a cheap vectorized contains() per term that skips the n-gram
    array build for non-candidate rows. Sound superset (never drops a
    match); measured at 100× docs it cut the scan-heavy leg from
    37.5 s (exp 0.81 — per-row gram construction dominating) to the
    selective-filter regime."""
    import re as _re

    terms = [t for t in _re.findall(r"[\w]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("phrase has no tokens")
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    pre = df
    for t in terms:
        pre = pre.filter(low.contains(t))
    toks = pre.select(
        F.col(id_col),
        word_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
    )
    # occurrence count by per-position token comparison over the same
    # arrays_zip-of-shifted-slices shape as functions.text.ngrams (the
    # tokens array is referenced a CONSTANT number of times — per-
    # element element_at lambdas get the tokenizer inlined per element
    # by CollapseProject, going quadratic; measured as a 10-minute
    # timeout at 100× docs). Unlike ngrams, no concat'd gram string is
    # ever allocated: the zipped struct's fields compare directly
    # against the term literals — identical semantics (overlaps
    # included) at a fraction of the per-row allocation cost.
    k = len(terms)
    w = F.col("_w")
    m = F.greatest(F.size(w) - (k - 1), F.lit(0))
    parts = [F.slice(w, j + 1, m).alias(f"_g{j}") for j in range(k)]
    zipped = F.arrays_zip(*parts)

    def _match(t: Column) -> Column:
        c = t["_g0"] == F.lit(terms[0])
        for j in range(1, k):
            c = c & (t[f"_g{j}"] == F.lit(terms[j]))
        return c

    counted = toks.select(
        F.col(id_col),
        F.size(F.filter(zipped, _match)).alias("n_occurrences"),
    )
    return counted.filter(F.col("n_occurrences") > 0).orderBy(
        F.desc("n_occurrences"), F.asc(id_col)
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df_frac: float = 0.5,
) -> DataFrame:
    """Top-k TF-IDF keywords per document:
    (id, term, tf, score, kw_rank), kw_rank 1..k by (score desc, term asc).

    score(d, t) = idf(t) · tf(d, t) / |d|,  idf = ln((1+N)/(1+df)) + 1
    (the sklearn smooth-idf form — never negative, never divides by 0).

    Plan shape at scale (one scan, one tokenize, bounded skew):
    - the (id, tokens, dl) projection is built once (named-attribute
      projection — CollapseProject discipline) and persisted; N comes
      from that relation, not a second table scan.
    - explode → per-(doc, term) tf hash-aggregate is the one
      corpus-sized shuffle; df per term re-aggregates the (much
      smaller) postings relation.
    - terms outside [min_df, max_df_frac·N] are dropped BEFORE the
      per-doc window — the stopword band (df ≈ N) is exactly the
      posting-list skew that frequency_capped_explode (skew.py) guards
      elsewhere, so the window never sees a term with ~N postings.
    - per-doc top-k is a row_number window keyed by doc — shuffle
      carries the pruned postings only.

    Determinism (DETERMINISM.md rule 3): idf is the only transcendental
    — quantized once per DISTINCT surviving term (round 9dp); each
    score is round(idf9 · tf / dl, 9) cast DECIMAL(28,9) (exact-integer
    tf, dl → identical IEEE products cross-engine); ties in the window
    break on term asc. The window ranks on the exact DECIMAL; the
    emitted score is cast DOUBLE at the final projection (rule 4).

    NULL text behaves as empty (repo-wide convention): such docs emit
    no keywords but still count in N.
    """
    from pyspark.sql import Window

    base = (
        df.select(
            F.col(id_col),
            word_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_w"),
        )
        .select(F.col(id_col), F.col("_w"), F.size("_w").alias("dl"))
        .persist()
    )
    tf = (
        base.select(F.col(id_col), F.col("dl"), F.explode("_w").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    stats = base.agg(F.count("*").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("dfreq"))
    idf9 = F.round(
        F.ln((1.0 + F.col("n_docs")) / (1.0 + F.col("dfreq"))) + 1.0, 9
    )
    terms_idf = (
        dfreq.crossJoin(F.broadcast(stats))
        .filter(
            (F.col("dfreq") >= min_df)
            & (F.col("dfreq") <= max_df_frac * F.col("n_docs"))
        )
        .select("term", idf9.alias("idf9"))
    )
    # NOT a forced broadcast: the surviving vocabulary is corpus-sized at
    # 100 TB (df >= 2 keeps the long tail); AQE broadcasts when small.
    scored = tf.join(terms_idf, "term").select(
        F.col(id_col),
        F.col("term"),
        F.col("tf").cast("long").alias("tf"),
        F.round(F.col("idf9") * F.col("tf") / F.col("dl"), 9)
        .cast("decimal(28,9)")
        .alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            F.col("score").cast("double").alias("score"),
            "kw_rank",
        )
    )
