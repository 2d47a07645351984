"""Character entropy, Heaps vocabulary growth, Zipf slope, column
profile — the round-5 corpus-statistics tier."""

import math

import pytest
from pyspark.sql import functions as F

from model_audit_spark.operators.lm import char_entropy_scores
from model_audit_spark.operators.stats import column_profile
from model_audit_spark.operators.text_analysis import (
    heaps_vocab_growth,
    zipf_slope,
)


@pytest.fixture(scope="module")
def law_docs(spark):
    return spark.createDataFrame(
        [
            (1, "aaaa"),                      # zero entropy
            (2, "abab"),                      # exactly ln 2
            (3, "the cat sat on the mat"),
            (4, None),                        # NULL text = empty
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_char_entropy_values(law_docs):
    rows = {r.doc_id: r for r in char_entropy_scores(law_docs).collect()}
    assert rows[1].n_chars == 4 and rows[1].char_entropy == 0.0
    # two symbols, equal counts -> H = ln 2
    assert rows[2].char_entropy == pytest.approx(math.log(2), abs=1e-6)
    # exact reference: H = ln n - (sum c ln c)/n over char counts
    txt = "the cat sat on the mat"
    counts = {}
    for ch in txt:
        counts[ch] = counts.get(ch, 0) + 1
    n = len(txt)
    h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
    assert rows[3].char_entropy == pytest.approx(h, abs=1e-6)
    # NULL and empty behave alike: no chars, NULL entropy
    for d in (4, 5):
        assert rows[d].n_chars == 0 and rows[d].char_entropy is None


def test_entropy_flags_junk_below_text(spark):
    docs = spark.createDataFrame(
        [(1, "zzzzzzzzzzzzzzzzzzzz"), (2, "a normal english sentence")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in char_entropy_scores(docs).collect()}
    assert rows[1].char_entropy < 0.1 < rows[2].char_entropy


def test_heaps_growth_monotone_and_exact(law_docs):
    out = heaps_vocab_growth(law_docs, n_checkpoints=5).collect()
    assert [r.checkpoint for r in out] == [1, 2, 3, 4, 5]
    # cutoffs are max_id*k/5 with max_id=5 -> 1..5
    assert [r.id_cutoff for r in out] == [1, 2, 3, 4, 5]
    # both curves are non-decreasing
    for a, b in zip(out, out[1:]):
        assert b.n_tokens >= a.n_tokens and b.vocab_size >= a.vocab_size
        assert b.n_docs == a.n_docs + 1
    # final checkpoint covers the whole corpus
    last = out[-1]
    assert last.n_docs == 5
    # tokens: aaaa | abab | the cat sat on the mat (6) = 8 total
    assert last.n_tokens == 8
    # distinct: aaaa, abab, the, cat, sat, on, mat = 7
    assert last.vocab_size == 7
    # checkpoint 1 sees only doc 1
    assert out[0].n_tokens == 1 and out[0].vocab_size == 1


def test_zipf_slope_exact_powerlaw(spark):
    # freq(rank) = 2^(10-rank) for rank 1..10 -> perfect log-linear
    # curve with slope exactly -ln2 per ln-rank unit... not linear in
    # ln(rank), so instead build freq = C / rank (true Zipf, s=1):
    # use freq = 720720 // rank which is exact for rank 1..10.
    rows = []
    tok_id = 0
    for rank in range(1, 11):
        freq = 720720 // rank  # divisible by 1..10 -> exact 1/rank law
        for _ in range(1):
            rows.append((tok_id, (f"w{rank:02d} ") * freq))
        tok_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = zipf_slope(docs, max_rank=10).collect()[0]
    assert out.n_terms == 10
    assert out.zipf_slope == pytest.approx(-1.0, abs=1e-4)


def test_zipf_slope_flat_for_uniform(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i:02d} " * 50) for i in range(20)],
        "doc_id long, text string",
    )
    out = zipf_slope(docs, max_rank=20).collect()[0]
    assert out.zipf_slope == pytest.approx(0.0, abs=1e-9)


def test_column_profile_types_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "x", 2.5, None),
            (2, "y", -1.0, None),
            (None, "x", 4.0, None),
        ],
        "k long, s string, v double, t timestamp",
    )
    rows = {r.column_name: r for r in column_profile(df).collect()}
    assert set(rows) == {"k", "s", "v", "t"}
    k = rows["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 1, 2)
    assert k.min_num == 1.0 and k.max_num == 2.0 and k.min_str is None
    s = rows["s"]
    assert (s.n_nulls, s.n_distinct, s.min_str, s.max_str) == (0, 2, "x", "y")
    assert s.min_num is None
    v = rows["v"]
    assert v.min_num == -1.0 and v.max_num == 4.0
    t = rows["t"]
    assert t.n_nulls == 3 and t.n_distinct == 0 and t.min_str is None


def test_canonical_dedup_groups(spark):
    from model_audit_spark.operators.dedup import canonical_dedup_groups

    docs = spark.createDataFrame(
        [
            (1, "Hello,  World!"),
            (2, "hello world"),           # same canonical key as 1
            (3, "hello world"),           # byte-identical to 2
            (4, "something else"),
            (5, None),
            (6, ""),                      # NULL and empty share a key
        ],
        "doc_id long, text string",
    )
    rows = {r.keeper_id: r for r in canonical_dedup_groups(docs).collect()}
    assert set(rows) == {1, 5}
    assert rows[1].n_docs == 3
    # docs 2 and 3 are one byte variant, doc 1 another
    assert rows[1].n_byte_variants == 2
    assert rows[5].n_docs == 2 and rows[5].n_byte_variants == 1


def test_mixing_plan_budget_conservation(spark):
    from model_audit_spark.operators.sampling import mixing_plan

    docs = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "a b", "s1"), (3, "x y z", "s2")],
        "doc_id long, text string, source string",
    )
    rows = mixing_plan(docs, budget_tokens=1000, alpha=0.5).collect()
    by = {r.stratum: r for r in rows}
    assert by["s1"].n_tokens == 6 and by["s2"].n_tokens == 3
    assert sum(r.weight for r in rows) == pytest.approx(1.0, abs=2e-6)
    assert sum(r.planned_tokens for r in rows) == pytest.approx(
        1000.0, abs=1e-3
    )
    # alpha=0.5 flattens: s2's weight above its natural 1/3 share
    assert by["s2"].weight > 1 / 3
    for r in rows:
        assert r.epochs == pytest.approx(r.planned_tokens / r.n_tokens,
                                         abs=1e-5)


def test_mixing_plan_whitespace_tokens_and_empty_strata(spark):
    """Pins the tokenizer choice (whitespace split, NOT \\w+ — they
    differ on punctuated text: "don't stop-go now." is 3 whitespace
    tokens but 5 \\w+ matches) and the zero-token guard (empty
    stratum -> NULL weight/planned/epochs, never NaN or ±inf)."""
    import math

    from model_audit_spark.operators.sampling import mixing_plan

    docs = spark.createDataFrame(
        [
            (1, "don't stop-go now.", "punct"),
            (2, "", "empty"),
            (3, None, "empty"),
            (4, "a b", "plain"),
        ],
        "doc_id long, text string, source string",
    )
    by = {
        r.stratum: r
        for r in mixing_plan(docs, budget_tokens=100, alpha=0.7).collect()
    }
    assert by["punct"].n_tokens == 3  # \w+ would say 5
    assert by["plain"].n_tokens == 2
    assert by["empty"].n_tokens == 0 and by["empty"].n_docs == 2
    assert by["empty"].weight is None
    assert by["empty"].planned_tokens is None
    assert by["empty"].epochs is None
    for s in ("punct", "plain"):
        assert by[s].epochs is not None
        assert not math.isnan(by[s].epochs)


def test_norm_outliers_flags_planted_vector(spark):
    from model_audit_spark.operators.embstats import norm_outliers

    rows = [(i, [1.0, 0.0, 0.0]) for i in range(20)]
    rows.append((99, [30.0, 0.0, 0.0]))  # norm2 = 900 vs 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in norm_outliers(df, k_sigma=3).collect()}
    assert out[99].is_outlier and out[99].norm2 == 900.0
    assert not any(out[i].is_outlier for i in range(20))


def test_event_transitions_session_bounded(spark):
    from model_audit_spark.operators.threads import event_transitions

    ev = spark.createDataFrame(
        [
            # user 1, one session: A -> B -> A
            (1, 1, "A", "2024-01-01 10:00:00"),
            (2, 1, "B", "2024-01-01 10:01:00"),
            (3, 1, "A", "2024-01-01 10:02:00"),
            # gap > 30 min: new session, B alone -> no transition out
            (4, 1, "B", "2024-01-01 12:00:00"),
            # user 2: A -> A
            (5, 2, "A", "2024-01-01 10:00:00"),
            (6, 2, "A", "2024-01-01 10:05:00"),
        ],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        (r.cur_type, r.next_type): r
        for r in event_transitions(ev, gap_seconds=1800).collect()
    }
    assert set(rows) == {("A", "B"), ("B", "A"), ("A", "A")}
    # A is followed by B once and by A once -> 500000 ppm each
    assert rows[("A", "B")].n_transitions == 1
    assert rows[("A", "B")].p_ppm == 500000
    assert rows[("A", "A")].p_ppm == 500000
    # B -> A is B's only in-session successor
    assert rows[("B", "A")].p_ppm == 1000000


def test_boilerplate_templates_masks_digits(spark):
    from model_audit_spark.operators.text_analysis import (
        boilerplate_templates,
    )

    docs = spark.createDataFrame(
        [
            (1, "s", "Visit  page 12\ncopyright 1999 acme\nunique one"),
            (2, "s", "visit page 99\nCopyright 2024 ACME\nunique two"),
            (3, "t", "no repeats here"),
        ],
        "doc_id long, source string, text string",
    )
    rows = boilerplate_templates(
        docs, top_k=3, group_col="source", min_count=2
    ).collect()
    got = [(r.group, r.skeleton, r.n_lines, r.rank) for r in rows]
    # both digit/case/whitespace variants collapse; ties break on text
    assert got == [
        ("s", "copyright # acme", 2, 1),
        ("s", "visit page #", 2, 2),
    ]


def test_feature_correlations_exact_and_guarded(spark):
    from model_audit_spark.operators.text_analysis import (
        feature_correlations,
    )

    # texts "a", "a a", ..., n_chars = 2k-1 is affine in n_tokens = k
    # -> r exactly 1; n_types is constant 1 -> undefined (NULL)
    docs = spark.createDataFrame(
        [(k, " ".join(["a"] * k)) for k in range(1, 6)],
        "doc_id long, text string",
    )
    rows = {
        (r.feat_a, r.feat_b): r for r in feature_correlations(docs).collect()
    }
    assert rows[("n_chars", "n_tokens")].pearson_r == 1.0
    assert rows[("n_chars", "n_types")].pearson_r is None
    assert rows[("n_tokens", "n_types")].pearson_r is None
    assert all(r.n == 5 for r in rows.values())
