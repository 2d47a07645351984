"""Repetition/boilerplate quality filters (operators/quality.py)."""

from model_audit_spark.operators.quality import repetition_stats


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return repetition_stats(df).collect()[0]


def test_clean_prose_passes(spark):
    r = _stats(
        spark,
        "The quick brown fox jumps over a lazy dog.\n"
        "It then trots away into the quiet green forest.",
    )
    assert r["repetition_pass"]
    assert r["dup_line_frac"] == 0.0
    assert r["n_lines"] == 2


def test_duplicate_lines_fail(spark):
    r = _stats(spark, "buy now\nbuy now\nbuy now\nbuy now\nunique line")
    assert r["dup_line_frac"] == 0.6  # 5 lines, 2 distinct -> 3/5
    assert not r["repetition_pass"]


def test_top_2gram_dominance(spark):
    r = _stats(spark, "win cash " * 30 + "now")
    assert r["top_2gram"] in ("cash win", "win cash")
    assert r["top_2gram_char_frac"] > 0.2
    assert not r["repetition_pass"]


def test_bullet_and_ellipsis_fractions(spark):
    r = _stats(spark, "- item one\n- item two\nread more...\nplain line")
    assert r["bullet_line_frac"] == 0.5
    assert r["ellipsis_line_frac"] == 0.25
    # bullets alone only fail above 0.9
    assert r["repetition_pass"]


def test_blank_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    for r in rows.values():
        assert r["n_lines"] == 0
        assert r["top_2gram"] == ""
        assert r["repetition_pass"]


def test_duplicate_paragraphs(spark):
    para = "same paragraph here"
    r = _stats(spark, f"{para}\n\n{para}\n\n{para}")
    assert r["dup_para_frac"] == round(2 / 3, 6)
    # three identical single-line paragraphs are also duplicate lines
    assert not r["repetition_pass"]
