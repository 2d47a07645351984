"""BM25 search: scoring semantics and determinism."""

from model_audit_spark.operators.search import bm25_search


def test_bm25_ranking_and_hits(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join join join filter"),
            (2, "spark filter"),
            (3, "nothing relevant here"),
            (4, "join"),
        ],
        "doc_id int, text string",
    )
    rows = bm25_search(docs, "spark join filter", k=10).collect()
    ids = [r.doc_id for r in rows]
    # doc 3 has no query terms -> absent; doc 1 matches most terms with
    # highest tf -> first
    assert 3 not in ids and ids[0] == 1
    hit_counts = {r.doc_id: r.n_hits for r in rows}
    assert hit_counts == {1: 3, 2: 2, 4: 1}
    scores = [float(r.score) for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_term_frequency_saturation(spark):
    """k1 saturation: 100 repeats of a term must not score 100x."""
    docs = spark.createDataFrame(
        [(1, "spark " * 100), (2, "spark"), (3, "pad text " * 10)],
        "doc_id int, text string",
    )
    rows = {r.doc_id: float(r.score) for r in bm25_search(docs, "spark").collect()}
    assert rows[1] > rows[2]
    assert rows[1] < rows[2] * 5  # saturated, nowhere near 100x


def test_bm25_rejects_empty_query(spark):
    import pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_search(docs, "—…")


def test_bm25_null_text_behaves_as_empty(spark):
    """NULL text = empty doc (repo-wide convention): counted in n_docs
    and avgdl with dl=0, never a match. Scores must shift vs dropping
    the row (avgdl halves), and no NaN/NULL leaks out."""
    docs = spark.createDataFrame(
        [(1, "spark join"), (2, None)], "doc_id int, text string"
    )
    rows = bm25_search(docs, "spark").collect()
    assert [r.doc_id for r in rows] == [1]
    assert rows[0].score is not None and float(rows[0].score) > 0


def test_bm25_precomputed_corpus_stats(spark):
    """corpus_stats short-circuits the stats aggregate and reproduces
    the self-computed scores exactly."""
    docs = spark.createDataFrame(
        [(1, "spark join filter"), (2, "join the club"), (3, "pad")],
        "doc_id int, text string",
    )
    auto = {r.doc_id: r.score for r in bm25_search(docs, "spark join").collect()}
    given = {
        r.doc_id: r.score
        for r in bm25_search(
            docs, "spark join", corpus_stats=(3, 7 / 3)
        ).collect()
    }
    assert auto == given


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    from model_audit_spark.operators.search import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common common quantum quantum physics"),
            (2, "common common banana banana smoothie"),
            (3, "common common quantum banana"),
            (4, "common text"),
        ],
        "doc_id int, text string",
    )
    # 'common' is in all 4 docs -> dropped by max_df_frac=0.5;
    # doc-distinctive repeated terms rank first.
    rows = tfidf_keywords(docs, k=2, min_df=1, max_df_frac=0.5).collect()
    top = {r.doc_id: r.term for r in rows if r.kw_rank == 1}
    assert top[1] == "quantum" and top[2] == "banana"
    assert all(r.term != "common" for r in rows)
    # kw_rank is dense 1..k per doc, score non-increasing within a doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rs in by_doc.values():
        rs.sort(key=lambda r: r.kw_rank)
        assert [r.kw_rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [float(r.score) for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_tfidf_keywords_min_df_and_ties(spark):
    from model_audit_spark.operators.search import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "unique words")],
        "doc_id int, text string",
    )
    rows = tfidf_keywords(docs, k=5, min_df=2, max_df_frac=1.0).collect()
    # df=1 terms (unique, words) are dropped by min_df=2
    assert {r.term for r in rows} == {"alpha", "beta"}
    # equal score -> tie broken by term asc
    r1 = sorted([r for r in rows if r.doc_id == 1], key=lambda r: r.kw_rank)
    assert [r.term for r in r1] == ["alpha", "beta"]


def test_tfidf_keywords_null_text_counts_in_n(spark):
    from model_audit_spark.operators.search import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha"), (3, None)],
        "doc_id int, text string",
    )
    rows = tfidf_keywords(docs, k=5, min_df=1, max_df_frac=1.0).collect()
    # NULL doc emits nothing but counts in N (idf uses N=3)
    assert {r.doc_id for r in rows} == {1, 2}
    import math

    alpha = next(r for r in rows if r.doc_id == 2 and r.term == "alpha")
    want = round(round(math.log(4 / 3) + 1.0, 9) * 1 / 1, 9)
    assert abs(float(alpha.score) - want) < 1e-9


def test_phrase_search_exact_sequence_only(spark):
    from model_audit_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "spark join filter spark join filter"),  # 2 occurrences
            (2, "spark filter join"),                    # words, wrong order
            (3, "spark JOIN filter"),                    # case-insensitive hit
            (4, None),
            (5, "join filter"),                          # missing first term
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.n_occurrences for r in
            phrase_search(docs, "Spark, join FILTER").collect()}
    assert rows == {1: 2, 3: 1}


def test_phrase_search_single_term_and_empty(spark):
    import pytest

    from model_audit_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta")], "doc_id int, text string"
    )
    rows = {r.doc_id: r.n_occurrences for r in
            phrase_search(docs, "alpha").collect()}
    assert rows == {1: 2}
    with pytest.raises(ValueError):
        phrase_search(docs, "—…")


def test_hybrid_rrf_fuses_both_lists(spark):
    """Hand-checkable RRF: doc present in BOTH lists beats a doc that
    tops only one. doc 1 = best lexical match; doc 2 = decent lexical
    AND exact embedding match (vec 2 == query vec 0's direction);
    doc 3 = embedding-only. RRF(d2) = 1/61 + 1/(60+r) must exceed both
    single-list scores when ranks are small."""
    from model_audit_spark.operators.search import hybrid_rrf_search

    docs = spark.createDataFrame(
        [
            (1, "spark join join join filter"),
            (2, "spark filter"),
            (3, "nothing relevant here"),
            (4, "join"),
        ],
        "doc_id int, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),  # query vector
            (1, [0.0, 1.0], 0),  # orthogonal -> last by cosine
            (2, [2.0, 0.0], 0),  # same direction -> cos 1.0
            (3, [1.0, 0.2], 0),
            (4, [-1.0, 0.0], 0),
        ],
        "vec_id int, embedding array<double>, label int",
    )
    out = hybrid_rrf_search(
        docs, emb, "spark join filter", query_vec_id=0, n_cand=10, k=10,
        vec_id_col="vec_id",
    )
    rows = {r.doc_id: r for r in out.collect()}
    # doc 3: lexical miss -> NULL bm25_rank, has cos_rank
    assert rows[3].bm25_rank is None and rows[3].cos_rank is not None
    # doc 0 appears via the embedding leg only (no doc 0 text match)
    assert rows[0].bm25_rank is None
    # RRF order: both-list docs 1 and 2 beat embedding-only doc 4
    order = [r.doc_id for r in out.collect()]
    assert order.index(2) < order.index(4)
    assert order.index(1) < order.index(4)
    # exact contribution check for doc 2: bm25 rank 2, cosine:
    # ties at cos 1.0 between vec 0 and vec 2 break on id -> rank 2
    r2 = rows[2]
    assert (r2.bm25_rank, r2.cos_rank) == (2, 2)
    expected = round(1.0 / 62, 9) * 2
    assert abs(r2.rrf_score - expected) < 1e-12
    # deterministic ordering: rrf desc, doc_id asc
    scores = [(-(r.rrf_score), r.doc_id) for r in out.collect()]
    assert scores == sorted(scores)
