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
