"""Unit-literal tests for the scalar feature layer.

Inputs/expected values ported from the reference test-suite
(tests/test_llmmap.py:17-87, tests/test_dli.py:15-31, tests/test_style.py:78-91)
— asserted against DataFrame expressions instead of Python functions.
"""

import math

import pytest
from pyspark.sql import functions as F

from model_audit_spark.functions.text import (
    bigrams,
    detect_lang,
    text_preview,
    watermark_columns,
    with_llmmap_features,
    word_tokens,
)


def _features(spark, text):
    df = spark.createDataFrame([(text,)], "text STRING")
    return with_llmmap_features(df).collect()[0].asDict()


def test_basic_counts(spark):
    f = _features(spark, "Hello, this is a simple test response.")
    assert f["length_words"] == 7
    assert f["length_chars"] == 38
    assert f["length_sentences"] == 1
    assert not f["has_code_blocks"]
    assert not f["starts_with_refusal"]


def test_empty_string(spark):
    f = _features(spark, "")
    assert f["length_words"] == 0
    assert f["length_chars"] == 0
    assert f["length_sentences"] == 0
    assert f["avg_word_length"] == 0.0
    assert f["unique_word_ratio"] == 0.0


def test_structural_flags(spark):
    md = "# Header\nSome text\n- bullet one\n- bullet two\n1. numbered\n"
    f = _features(spark, md)
    assert f["has_markdown_headers"]
    assert f["has_bullet_points"]
    assert f["has_numbered_list"]
    code = "Here is code:\n```python\nprint('hi')\n```"
    f2 = _features(spark, code)
    assert f2["has_code_blocks"]


def test_refusal_start(spark):
    assert _features(spark, "I cannot help with that request.")[
        "starts_with_refusal"
    ]
    assert _features(spark, "Sorry, but no.")["starts_with_refusal"]
    assert not _features(spark, "Happy to help!")["starts_with_refusal"]


def test_numeric_features_exact(spark):
    # words = [The, cat, sat.] -> avg_word_length = (3+3+4)/3
    f = _features(spark, "The cat sat.")
    assert f["length_words"] == 3
    assert f["length_sentences"] == 1
    assert f["avg_word_length"] == pytest.approx(10 / 3)
    assert f["avg_sentence_length"] == pytest.approx(3.0)
    assert f["punctuation_ratio"] == pytest.approx(1 / 12)
    # unique lowercased words: the, cat, sat. (with dot) -> 3/3
    assert f["unique_word_ratio"] == pytest.approx(1.0)


def test_marker_scores(spark):
    # "sorry" + "cannot" -> apologetic count 2 over 6 words
    f = _features(spark, "Sorry but I cannot do that today")
    assert f["style_apologetic"] == pytest.approx(2 / 7)


def test_marker_substring_semantics(spark):
    # 'sure' occurs inside 'measure' -> counted (str.count substring semantics)
    f = _features(spark, "we measure things")
    assert f["style_helpful"] == pytest.approx(1 / 3)


def test_dli_tokenizer_and_bigrams(spark):
    df = spark.createDataFrame([("a b a b a b",)], "text STRING")
    out = df.select(
        word_tokens("text").alias("w")
    ).select(F.col("w"), bigrams(F.col("w")).alias("bg")).collect()[0]
    assert out["w"] == ["a", "b", "a", "b", "a", "b"]
    counts = {}
    for g in out["bg"]:
        counts[g] = counts.get(g, 0) + 1
    assert counts == {"a b": 3, "b a": 2}
    # single word -> no bigrams
    single = df.select(bigrams(F.array(F.lit("only"))).alias("bg")).collect()[0]
    assert single["bg"] == []


def test_dli_tokenizer_unicode(spark):
    df = spark.createDataFrame([("Hello 世界 foo_bar 123!",)], "text STRING")
    out = df.select(word_tokens("text").alias("w")).collect()[0]
    assert out["w"] == ["hello", "世界", "foo_bar", "123"]


def test_detect_lang(spark):
    rows = [
        ("This is an English sentence about machine learning.", "en"),
        ("这是一段关于机器学习的中文句子，用来测试语言检测功能。", "zh"),
        ("def f(x):\n    return x  # 这是一个中文注释，解释函数的功能和用法", "zh"),
        ("", "en"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text STRING")
    got = [r[0] for r in df.select(detect_lang("text")).collect()]
    assert got == [lang for _, lang in rows]


def test_text_preview(spark):
    long = "x" * 100 + "\ny"
    df = spark.createDataFrame([(long,), ("short\ntext",)], "text STRING")
    got = [r[0] for r in df.select(text_preview("text")).collect()]
    assert got[0] == "x" * 80 + "..."
    assert got[1] == "short text"


def test_watermark_signals(spark):
    zw = "normal text" + "​‌"
    dbl = "a  b  c  d  e" + "  tail"
    df = spark.createDataFrame([(zw,), (dbl,)], "text STRING")
    cols = watermark_columns("text")
    out = df.select(
        *[c.alias(n) for n, c in cols.items()]
    ).collect()
    assert out[0]["wm_zero_width_count"] == 2
    assert out[0]["wm_score"] >= 0.5
    assert out[1]["wm_double_space_count"] == 5
    # word-length variance parity with the python formula
    words = ["aa", "bbb", "c"]
    lens = [len(w) for w in words]
    mean = sum(lens) / len(lens)
    var = sum((x - mean) ** 2 for x in lens) / len(lens)
    df2 = spark.createDataFrame([("aa bbb c",)], "text STRING")
    got = df2.select(cols["wm_word_len_variance"].alias("v")).collect()[0]["v"]
    assert math.isclose(got, var, rel_tol=1e-12)


def test_watermark_fused_matches_dict(spark):
    """with_watermark_signals (single-tokenization, staged projections)
    must equal the watermark_columns() dict column-for-column, including
    the repetitive/zero-width/edge rows that flip each score branch."""
    from model_audit_spark.functions.text import with_watermark_signals

    rows = [
        (1, "normal text" + "​‌"),
        (2, "a  b  c  d  e" + "  tail"),
        (3, " ".join(["ab"] * 40)),  # low variance + low bigram uniqueness
        (4, ""),
        (5, "   "),
        (6, None),
        (7, "one two three"),
        (8, " ".join(f"w{i}" for i in range(30))),  # stat-applicable, varied
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    cols = watermark_columns("text")
    old = df.select("id", *[c.alias(n) for n, c in cols.items()]).collect()
    new = with_watermark_signals(df, "text").drop("text").collect()
    assert sorted(map(tuple, old)) == sorted(map(tuple, new))


def test_watermark_fused_rejects_reserved_columns(spark):
    """An input frame already carrying wm_*/_wm_* columns would be
    silently replaced by withColumn and then duplicated in the final
    select — the operator must refuse up front (round-10 advice)."""
    import pytest as _pytest

    from model_audit_spark.functions.text import with_watermark_signals

    for bad in ("wm_score", "_wm_w"):
        df = spark.createDataFrame(
            [("t", 0.0)], f"text STRING, {bad} DOUBLE"
        )
        with _pytest.raises(ValueError, match="reserved"):
            with_watermark_signals(df, "text")


def test_detect_lang_profile_multilingual(spark):
    from model_audit_spark.functions.text import detect_lang_profile

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the house of cards"),
            (2, "der Hund und die Katze sind nicht mit dem Mann"),
            (3, "le chat est dans les jardins et une maison pour tous"),
            (4, "el perro y los gatos es una historia como en madrid"),
            (5, "这是一个很长的中文文本，用来测试语言识别功能是否正常工作"),
            (6, "xyzzy plugh qwerty"),
            (7, None),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r.lang
        for r in docs.select(
            "doc_id", detect_lang_profile("text").alias("lang")
        ).collect()
    }
    assert got == {
        1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "und", 7: "und",
    }


def test_chunk_text_overlap_and_coverage(spark):
    from model_audit_spark.operators.text_analysis import chunk_text

    docs = spark.createDataFrame(
        [(1, "a" * 120), (2, "b" * 50), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    rows = chunk_text(
        docs, chunk_chars=50, overlap=10
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # stride 40: doc1 (120 chars) -> ceil(119/40)+... = 3 chunks at 0/40/80
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_len for r in c1] == [50, 50, 40]
    # overlap: chunk i's last 10 chars == chunk i+1's first 10
    assert c1[0].chunk_text[-10:] == c1[1].chunk_text[:10]
    # doc exactly one chunk long -> single chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_len == 50
    # empty / NULL docs produce no chunks
    assert 3 not in by_doc and 4 not in by_doc
    # reconstruction: stripping the overlap from chunks 1+ rebuilds the doc
    rebuilt = c1[0].chunk_text + "".join(c.chunk_text[10:] for c in c1[1:])
    assert rebuilt == "a" * 120


def test_quality_calibrated_per_group_keep(spark):
    from model_audit_spark.operators.text_analysis import (
        quality_calibrated,
    )

    good = ("word " * 120 + "a proper sentence ends here. ") * 2
    rows = []
    # source A: 4 docs of descending quality; source B: 2 uniformly bad
    rows += [(i, "A", good[: 200 + 400 * i]) for i in range(4)]
    rows += [(10, "B", "zz."), (11, "B", "qq!")]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = {r.doc_id: r for r in quality_calibrated(docs, keep_frac=0.5).collect()}
    # per-group calibration keeps the top half of EACH source — source B
    # keeps a doc even though globally its quality is worst
    kept_b = [d for d in (10, 11) if out[d].keep]
    assert len(kept_b) == 1
    kept_a = [d for d in range(4) if out[d].keep]
    assert len(kept_a) == 2
    # q_rank is a percent rank: 0 for the best row of each group
    assert min(out[d].q_rank for d in range(4)) == 0.0
    assert min(out[d].q_rank for d in (10, 11)) == 0.0


def test_assemble_threads_orders_and_slices(spark):
    from model_audit_spark.operators.threads import assemble_threads

    rows = [
        # out-of-order arrival; (ts, id) is the sort key
        (7, "2026-01-01 00:02:00", "c"),
        (7, "2026-01-01 00:00:00", "a"),
        (7, "2026-01-01 00:01:00", "b"),
        (8, "2026-01-01 00:00:30", "solo"),
        # tie on ts -> event_id breaks it
        (9, "2026-01-01 00:00:00", "second"),
        (9, "2026-01-01 00:00:00", "first"),
    ]
    df = spark.createDataFrame(
        [(u, ts, t, i) for i, (u, ts, t) in enumerate(rows)],
        "user_id long, ts string, txt string, event_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    # make the tie deterministic: 'first' has the lower event_id? No —
    # enumerate gave 'second' id 4 and 'first' id 5, so 'second' leads.
    out = {
        r.user_id: r
        for r in assemble_threads(
            df, F.col("txt"), sep="|"
        ).collect()
    }
    assert out[7].transcript == "a|b|c" and out[7].n_turns == 3
    assert out[8].transcript == "solo"
    assert out[9].transcript == "second|first"
    assert out[7].first_ts == "2026-01-01 00:00:00"
    assert out[7].last_ts == "2026-01-01 00:02:00"

    sliced = {
        r.user_id: r
        for r in assemble_threads(
            df, F.col("txt"), sep="|", max_turns=2
        ).collect()
    }
    # head slice keeps the FIRST turns; n_turns still counts all
    assert sliced[7].transcript == "a|b" and sliced[7].n_turns == 3


def test_assemble_threads_partitioning_independent(spark):
    """Same result from 1 partition and from a scattered layout — the
    unique (ts, id) sort key makes the aggregate order-insensitive."""
    from model_audit_spark.operators.threads import assemble_threads

    base = spark.range(200).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(1700000000 + (F.col("id") * 37) % 1000).alias("ts"),
        F.col("id").alias("event_id"),
        F.concat(F.lit("t"), F.col("id")).alias("txt"),
    )
    a = assemble_threads(base.coalesce(1), F.col("txt")).collect()
    b = assemble_threads(base.repartition(16), F.col("txt")).collect()
    key = lambda r: r.user_id
    assert sorted(a, key=key) == sorted(b, key=key)


def test_assemble_threads_full_totals_with_null_ts_head(spark):
    """Regression: with max_turns, a thread whose FIRST kept rows have
    NULL ts (NULLS FIRST ordering keeps them) must still report the
    full-thread first_ts/last_ts, not NULL."""
    import datetime

    from pyspark.sql import Row
    from model_audit_spark.operators.threads import assemble_threads

    rows = [
        Row(user_id=1, event_id=1, ts=None, txt="a"),
        Row(user_id=1, event_id=2, ts=None, txt="b"),
        Row(user_id=1, event_id=3,
            ts=datetime.datetime(2024, 1, 1, 0, 0, 5), txt="c"),
        Row(user_id=1, event_id=4,
            ts=datetime.datetime(2024, 1, 1, 0, 0, 7), txt="d"),
    ]
    df = spark.createDataFrame(rows)
    out = assemble_threads(
        df, F.col("txt"), max_turns=2
    ).collect()[0]
    assert out["n_turns"] == 4
    assert out["first_ts"] == "2024-01-01 00:00:05"
    assert out["last_ts"] == "2024-01-01 00:00:07"


def test_vocab_coverage_invariants(spark):
    """OOV of a source fully inside the vocab is 0; a source of unique
    junk tokens is 1.0 when the vocab is saturated by the common source;
    rates bounded; every group keeps a row (NULL text as empty)."""
    from model_audit_spark.operators.text_analysis import vocab_coverage

    common = " ".join(f"w{i}" for i in range(5))
    rows = (
        [(i, common, "core") for i in range(20)]
        + [(100 + i, f"rare{i} rare{i + 50}", "tail") for i in range(4)]
        + [(200, None, "empty")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in
           vocab_coverage(df, vocab_size=5).collect()}
    assert got["core"]["oov_rate"] == 0.0
    assert got["tail"]["oov_rate"] == 1.0 and got["tail"]["oov_type_rate"] == 1.0
    assert got["empty"]["n_tokens"] == 0 and got["empty"]["oov_rate"] == 0.0
    for g in got.values():
        assert 0.0 <= g["oov_rate"] <= 1.0 and 0.0 <= g["oov_type_rate"] <= 1.0


def test_quality_threshold_sweep_monotone_and_exact(spark):
    """Retention curve invariants: n_kept non-increasing in threshold;
    mean quality of the kept set non-decreasing; counts exact against
    a brute-force filter."""
    import pyspark.sql.functions as F

    from model_audit_spark.operators.text_analysis import (
        doc_stats,
        quality_threshold_sweep,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    rows = quality_threshold_sweep(docs).collect()
    assert [r["threshold"] for r in rows] == [
        0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8
    ]
    kept = [r["n_kept"] for r in rows]
    assert kept == sorted(kept, reverse=True)
    means = [r["mean_quality_kept"] for r in rows if r["n_kept"] > 0]
    assert means == sorted(means)
    # exact count cross-check at one cutoff
    q = doc_stats(docs).filter(F.col("quality_score") >= 0.5).count()
    at_05 = {r["threshold"]: r["n_kept"] for r in rows}[0.5]
    assert at_05 == q
    assert all(0 <= r["frac_kept"] <= 1 for r in rows)


def test_classify_domains_argmax_and_ties(spark):
    """Hand-routed docs: clear winner, lexicographic tie-break, no-hit
    -> 'none', and hit counting includes repeated tokens."""
    from model_audit_spark.operators.text_analysis import classify_domains

    rows = [
        (1, "query filter join scan", "s"),        # query 4
        (2, "table row stream batch", "s"),        # storage 2 = streaming 2 -> storage (lex)
        (3, "hello world nothing here", "s"),      # none
        (4, "vector vector vector table", "s"),    # ml 3 > storage 1
        (5, None, "s"),                            # NULL text -> none
        (6, "stream stream merge", "s"),           # streaming 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.doc_id: (r.domain, r.best_hits) for r in classify_domains(df).collect()}
    assert got[1] == ("query", 4)
    assert got[2] == ("storage", 2)
    assert got[3] == ("none", 0)
    assert got[4] == ("ml", 3)
    assert got[5] == ("none", 0)
    assert got[6] == ("streaming", 3)


def test_ngram_novelty_first_occurrence_attribution(spark):
    """Hand-computed: doc 1 owns all its shingles; doc 2 repeats doc 1
    verbatim (0 novel); doc 3 shares a prefix but adds new material."""
    from model_audit_spark.operators.text_analysis import ngram_novelty

    rows = [
        (1, "alpha beta gamma delta"),          # shingles: ab g, b g d -> 2
        (2, "alpha beta gamma delta"),          # same 2, first owner is 1
        (3, "alpha beta gamma epsilon zeta"),   # a b g (seen), b g e, g e z
        (4, "too short"),                       # < 3 tokens -> 0 shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_shingles, r.n_novel)
           for r in ngram_novelty(df).collect()}
    assert got[1] == (2, 2)
    assert got[2] == (2, 0)
    assert got[3] == (3, 2)
    assert got[4] == (0, 0)


def test_collocations_integer_lift_hand_computed(spark):
    """'big data' always adjacent vs independent fillers: N=12 tokens,
    c_big=3, c_data=3, c_'big data'=3 -> lift = 3*12/(3*3) = 4.0
    (4_000_000 ppm exactly)."""
    from model_audit_spark.operators.text_analysis import collocations

    rows = [
        (1, "big data big data big data"),
        (2, "x y z q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = collocations(df, min_count=3, top_k=5).collect()
    by = {r.bigram: r for r in got}
    r = by["big data"]
    assert (r.c_xy, r.c_x, r.c_y, r.lift_ppm) == (3, 3, 3, 4_000_000)
    # 'data big' occurs twice -> pruned by min_count=3
    assert "data big" not in by


def test_vocab_drift_shares_and_pruning(spark):
    """old: 'alpha' in 2/2 docs; new: 'alpha' in 1/4, 'nova' in 3/4.
    Shares and deltas by hand; rare terms pruned by min_docs."""
    from model_audit_spark.operators.text_analysis import vocab_drift

    old = spark.createDataFrame(
        [(0, "alpha beta"), (2, "alpha gamma")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha nova"), (3, "nova x"), (5, "nova y"), (7, "z")],
        "doc_id long, text string",
    )
    got = {r.term: r for r in vocab_drift(old, new, min_docs=3).collect()}
    a = got["alpha"]
    assert (a.df_old, a.df_new) == (2, 1)
    assert (a.share_old_ppm, a.share_new_ppm) == (1_000_000, 250_000)
    assert a.delta_ppm == -750_000
    n = got["nova"]
    assert (n.df_old, n.df_new, n.delta_ppm) == (0, 3, 750_000)
    assert "beta" not in got  # df total 1 < min_docs


def test_winnow_selected_matches_reference(spark):
    # hand-checkable corpus incl. a repeated block (tie-rule coverage:
    # identical gram hashes inside one window must pick the RIGHTMOST)
    import hashlib

    from model_audit_spark.operators.text_analysis import winnow_selected

    text = "a b c d e a b c d e x y z"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = sorted((r.pos, r.h) for r in winnow_selected(df).collect())
    toks = text.split()
    grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    w = 4
    exp = set()
    for s in range(len(hs) - w + 1):
        win = hs[s : s + w]
        m = min(win)
        j = max(i for i, h in enumerate(win) if h == m)
        exp.add((s + j + 1, m))
    assert got == sorted(exp)


def test_winnow_guarantee_and_short_docs(spark):
    # winnowing theorem: two docs sharing a verbatim run of
    # window + gram_k - 1 = 6 tokens share at least one fingerprint
    # HASH; docs shorter than a full window emit no fingerprints.
    from model_audit_spark.operators.text_analysis import (
        winnow_fingerprints,
        winnow_pairs,
        winnow_selected,
    )

    shared = "the quick brown fox jumps high"
    df = spark.createDataFrame(
        [
            (1, f"alpha0 beta0 {shared} gamma0 delta0"),
            (2, f"zeta9 eta9 theta9 {shared} iota9"),
            (3, "one two three four five six seven"),
            (4, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    sel = winnow_selected(df).collect()
    h1 = {r.h for r in sel if r.doc_id == 1}
    h2 = {r.h for r in sel if r.doc_id == 2}
    assert h1 & h2, "shared 6-token run must yield a shared fingerprint"
    assert not any(r.doc_id == 4 for r in sel)
    fps = {r.doc_id: r for r in winnow_fingerprints(df).collect()}
    assert set(fps) == {1, 2, 3, 4}  # every doc keeps a summary row
    assert fps[4].n_fp == 0 and fps[4].density == 0.0
    assert fps[1].n_grams == len(f"alpha0 beta0 {shared} gamma0 delta0".split()) - 2
    # density never exceeds 1 and is > 0 for docs with a full window
    for d in (1, 2, 3):
        assert 0.0 < fps[d].density <= 1.0
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(df, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_winnow_pairs_max_df_drops_boilerplate(spark, zipf_docs):
    # the max_df cap must bound candidate growth on the Zipf corpus:
    # uncapped boilerplate buckets expand ~(0.8*400 choose 2) pairs
    from model_audit_spark.operators.text_analysis import winnow_pairs

    capped = winnow_pairs(zipf_docs, min_shared=1, max_df=50).count()
    uncapped = winnow_pairs(zipf_docs, min_shared=1, max_df=None).count()
    assert uncapped > 10_000  # boilerplate really does explode
    # the cap strips the boilerplate buckets (~80% of docs share them);
    # remaining pairs come from genuinely shared Pareto-tail content
    assert capped < uncapped / 4


def test_winnow_span_report_localizes_and_matches_pairs(spark):
    from model_audit_spark.operators.text_analysis import (
        winnow_pairs,
        winnow_span_report,
    )

    shared = "the quick brown fox jumps over the lazy dog today"
    df = spark.createDataFrame(
        [
            (1, f"{shared} alpha0 beta0 gamma0 delta0 epsilon0"),
            (2, f"zeta9 eta9 theta9 iota9 kappa9 lambda9 {shared}"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        (r.id_a, r.id_b): r
        for r in winnow_span_report(df, min_shared=1).collect()
    }
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnow_pairs(df, min_shared=1).collect()
    }
    # n_shared agrees exactly with winnow_pairs for every pair
    assert set(spans) == set(pairs)
    for p, r in spans.items():
        assert r.n_shared == pairs[p]
    r = spans[(1, 2)]
    # the shared run sits at the HEAD of doc 1 and the TAIL of doc 2
    assert r.a_pos_min < 8 and r.b_pos_min > 5
    assert r.a_pos_min <= r.a_pos_max and r.b_pos_min <= r.b_pos_max


def test_winnow_pairs_fractional_df_cap_equals_absolute(spark):
    """max_df_frac=f is exactly max_df=ceil(f*n_docs) (the override is
    corpus-relative so 'common' keeps meaning the same SHARE of docs as
    the corpus grows — SCALE.md's 100x sweep measured the absolute cap
    collapsing recall on a growing corpus); frac=1.0 equals no cap."""
    import math

    from model_audit_spark.operators.text_analysis import winnow_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, f"{base} doc{i} filler{i} more{i}") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def collect(**kw):
        return sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_pairs(df, min_shared=1, **kw).collect()
        )

    n = len(rows)
    for frac in (0.25, 0.5, 1.0):
        assert collect(max_df_frac=frac) == collect(
            max_df=math.ceil(frac * n)
        ), frac
    assert collect(max_df_frac=1.0) == collect(max_df=None)
    # the shared-boilerplate prefix hits every doc, so a sub-1/n cap
    # kills all pairs while frac=1.0 keeps them
    assert collect(max_df_frac=0.01) == []
    assert len(collect(max_df_frac=1.0)) > 0
