"""PII scan/redaction (operators/pii.py)."""

from model_audit_spark.operators.pii import pii_scan


def _scan(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_scan(df).collect()[0]


def test_email_detection_and_redaction(spark):
    r = _scan(spark, "contact alice.smith+spam@example.co.uk for info")
    assert r["n_emails"] == 1 and r["has_pii"]
    assert r["redacted"] == "contact [EMAIL] for info"


def test_phone_and_ipv4(spark):
    r = _scan(spark, "call (555) 867-5309 or ssh to 192.168.1.100 now")
    assert r["n_phones"] == 1
    assert r["n_ipv4"] == 1
    assert "[PHONE]" in r["redacted"] and "[IP]" in r["redacted"]
    assert "5309" not in r["redacted"] and "192" not in r["redacted"]


def test_multiple_hits_counted(spark):
    r = _scan(spark, "a@b.io and c@d.org wrote from 10.0.0.1 and 10.0.0.2")
    assert r["n_emails"] == 2 and r["n_ipv4"] == 2


def test_clean_text_untouched(spark):
    text = "no personal data here, just 42 plain words."
    r = _scan(spark, text)
    assert not r["has_pii"]
    assert r["redacted"] == text


def test_null_text(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = pii_scan(df).collect()[0]
    assert not r["has_pii"] and r["redacted"] == ""


def test_k_anonymity_profile_hand_computed(spark):
    """Groups: (a,x)×3, (a,y)×1, (b,x)×1 -> sizes {3:1 group, 1:2
    groups}; with k=2 the size-1 bucket is the exposure."""
    from model_audit_spark.operators.pii import k_anonymity_profile

    rows = [("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"), ("b", "x")]
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {
        r.group_size: (r.n_groups, r.n_rows, r.below_k)
        for r in k_anonymity_profile(df, ["source", "lang"], k=2).collect()
    }
    assert got == {3: (1, 3, False), 1: (2, 2, True)}


def test_l_diversity_profile(spark):
    from model_audit_spark.operators.pii import l_diversity_profile

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "z")],
        "quasi string, sens string",
    )
    rows = {
        r.diversity: r
        for r in l_diversity_profile(df, ["quasi"], "sens", l=2).collect()
    }
    assert rows[1].n_groups == 1 and rows[1].n_rows == 1 and rows[1].below_l
    assert (
        rows[2].n_groups == 1
        and rows[2].n_rows == 3
        and not rows[2].below_l
    )
