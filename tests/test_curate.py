"""curate_corpus stage coverage the synthetic corpus can't exercise
(it is all-English with no exact dups): lang drops, exact-dup keep-first,
near-dup higher-id drop, and the first-failing-stage precedence."""
from __future__ import annotations

from model_audit_spark.operators.curate import curate_corpus

GOOD = (
    "The quick brown fox jumps over the lazy dog and then walks through "
    "the quiet forest while the evening light settles over the hills and "
    "the river keeps moving toward the distant sea with a steady calm "
    "that carries every small sound along the water for miles and hours "
    "until the night finally arrives with all of its familiar stars."
)
NEAR = GOOD.replace("lazy dog", "sleepy dog")  # high shingle overlap


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = curate_corpus(df, **kw)
    return {r.doc_id: (r.drop_reason, r.kept) for r in out.collect()}


def test_every_stage_fires_and_keeps_good_docs(spark):
    rows = [
        (0, GOOD),
        (1, GOOD),              # exact dup of 0 -> higher id dropped
        (2, "好的，以下是详细的说明，" * 20),   # CJK -> lang
        (3, "!!!! ???? ;;;; ::::"),  # degenerate (quality 0.0) -> quality
        (4, NEAR),              # near-dup of 0 -> higher id dropped
    ]
    v = _run(spark, rows, min_quality=0.3)
    assert v[0] == (None, True)
    assert v[1] == ("exact_dup", False)
    assert v[2] == ("lang", False)
    assert v[3] == ("quality", False)
    assert v[4] == ("near_dup", False)


def test_precedence_lang_beats_quality_and_dups(spark):
    cjk = "好的" * 5
    rows = [(0, cjk), (1, cjk)]
    v = _run(spark, rows, min_quality=0.99)
    # doc 0: fails lang AND quality -> 'lang' (first stage) wins
    assert v[0] == ("lang", False)
    # doc 1: also an exact dup -> still 'lang'
    assert v[1] == ("lang", False)


def test_lang_allowlist_widens(spark):
    cjk = "好的，以下是详细的说明，" * 20
    rows = [(0, cjk)]
    v = _run(spark, rows, min_quality=0.0, langs=("en", "zh"))
    assert v[0][0] != "lang"
