"""C4 heuristic cleaning, paragraph-level dedup, char-bigram LM scoring."""

import math

import pytest
from pyspark.sql import functions as F

from model_audit_spark.operators.c4 import c4_clean_stats
from model_audit_spark.operators.dedup import paragraph_dedup_stats
from model_audit_spark.operators.lm import char_lm_scores, char_lm_table


@pytest.fixture(scope="module")
def c4_docs(spark):
    return spark.createDataFrame(
        [
            # 5+ proper sentences, one short line, one javascript line
            (1, "Good line with punctuation.\nshort\n"
                "Another proper sentence here!\n"
                "This line uses javascript heavily.\n"
                "Five words ending properly now.\n"
                "And one more sentence here.\n"
                "Plus a final sentence too."),
            # too few sentences survive
            (2, "Repeated para.\n\nRepeated para.\n\nUnique paragraph two."),
            # lorem ipsum + brace page-level kills
            (3, "Repeated para.\n\nlorem ipsum dolor { x }"),
            (4, None),
        ],
        "doc_id int, text string",
    )


def test_c4_line_rules_and_doc_verdict(c4_docs):
    rows = {r.doc_id: r for r in c4_clean_stats(c4_docs).collect()}
    d1 = rows[1]
    # 7 non-blank lines; "short" (1 word), the javascript line dropped
    assert d1.n_lines == 7 and d1.n_kept_lines == 5
    assert d1.n_sentences == 5 and d1.c4_pass
    d2 = rows[2]
    assert not d2.c4_pass and d2.n_sentences < 5
    d3 = rows[3]
    assert d3.has_lorem_ipsum and d3.has_brace and not d3.c4_pass
    assert d3.n_kept_lines == 0 and d3.kept_len == 0
    # NULL text behaves as empty
    d4 = rows[4]
    assert d4.n_lines == 0 and not d4.c4_pass


def test_c4_kept_text_materialization(c4_docs):
    got = (
        c4_clean_stats(c4_docs, keep_text=True)
        .filter(F.col("doc_id") == 1)
        .select("kept_text")
        .first()[0]
    )
    assert "javascript" not in got and "short" not in got
    assert got.startswith("Good line with punctuation.")


def test_paragraph_dedup_global_first_occurrence(c4_docs):
    rows = {
        r.doc_id: r for r in paragraph_dedup_stats(c4_docs).collect()
    }
    # doc 2 owns the global first "Repeated para."; its own second copy
    # and doc 3's copy are removals
    assert rows[2].n_paras == 3 and rows[2].n_removed == 1
    assert rows[2].n_dup_paras == 2  # both occurrences of dup'd content
    assert rows[3].n_paras == 2 and rows[3].n_removed == 1
    assert rows[1].n_removed == 0 and rows[1].keep_frac == 1.0
    # empty docs produce no paragraph rows (mirrors the SQL twin)
    assert 4 not in rows


def test_char_lm_score_matches_hand_rollup(spark):
    docs = spark.createDataFrame(
        [(1, "abab"), (2, "zq"), (3, "x")], "doc_id int, text string"
    )
    # corpus bigrams: doc1: ab, ba, ab; doc2: zq  => cnt(ab)=2, ba=1, zq=1
    lm = {
        r.bigram: r.cnt for r in char_lm_table(docs).collect()
    }
    assert lm == {"ab": 2, "ba": 1, "zq": 1}
    rows = {r.doc_id: r for r in char_lm_scores(docs).collect()}
    total = 4
    ln9 = lambda x: round(math.log(x) * 1e9)
    s9 = 2 * ln9(2) + 1 * ln9(1)
    exp1 = (ln9(total) - (s9 + 3 // 2) // 3) / 1e9
    assert rows[1].n_bigrams == 3
    assert rows[1].lm_score == pytest.approx(exp1, abs=1e-12)
    # zq is rarer than doc 1's mix -> strictly higher cross-entropy
    assert rows[2].lm_score > rows[1].lm_score
    # single char: no bigrams, NULL score
    assert rows[3].n_bigrams == 0 and rows[3].lm_score is None


def test_char_lm_external_model(spark):
    train = spark.createDataFrame([(1, "abab")], "doc_id int, text string")
    score = spark.createDataFrame([(9, "abxy")], "doc_id int, text string")
    lm = char_lm_table(train)
    rows = char_lm_scores(score, lm=lm).collect()
    # bigrams ab/bx/xy; only "ab" is in the model -> n_bigrams counts
    # model hits only
    assert rows[0].n_bigrams == 1


def test_staging_guards_reject_reserved_columns(spark):
    """c4_clean_stats / repetition_stats stage _c4_*/_rs_* helper
    columns via withColumn; an input frame already carrying such a name
    would be silently shadowed — both must refuse up front, matching
    the with_doc_stats / with_watermark_signals guards (r10 advice)."""
    from model_audit_spark.operators.quality import repetition_stats

    df_c4 = spark.createDataFrame(
        [(1, "t", "x")], "doc_id int, text string, _c4_lines string"
    )
    with pytest.raises(ValueError, match="reserved"):
        c4_clean_stats(df_c4)
    df_rs = spark.createDataFrame(
        [(1, "t", "x")], "doc_id int, text string, _rs_paras string"
    )
    with pytest.raises(ValueError, match="reserved"):
        repetition_stats(df_rs)


def test_paragraph_dedup_skew_safe_form_agrees(spark):
    """Both physical formulations (window vs hash-agg + join) must agree
    on real data — the skew_safe form exists for hot-digest corpora."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        tuple(r) for r in paragraph_dedup_stats(docs).collect()
    }
    b = {
        tuple(r)
        for r in paragraph_dedup_stats(docs, skew_safe=True).collect()
    }
    assert a == b and len(a) > 0
