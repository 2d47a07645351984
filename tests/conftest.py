import pytest

from model_audit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="model-audit-spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def zipf_docs(spark):
    """Zipf-heavy stress corpus (r5): ~80% of docs share a long
    boilerplate block (the pathological posting-list case — its shingles
    appear in hundreds of docs), content words drawn from a Pareto tail.
    Deterministic; 400 docs. The fixture for candidate-bound pins:
    naive inverted-index candidates approach all-pairs on this corpus,
    the skew hedges (rare-first prefix, max_df) must stay bounded."""
    import random

    rng = random.Random(7)
    boiler = (
        "terms of service privacy policy all rights reserved "
        "contact us subscribe to our newsletter follow us on social"
    )
    vocab = [f"w{i:04d}" for i in range(1200)]
    rows = []
    for i in range(400):
        content = " ".join(
            vocab[min(int(rng.paretovariate(1.3) * 4), len(vocab) - 1)]
            for _ in range(30)
        )
        text = f"{boiler} {content}" if rng.random() < 0.8 else content
        rows.append((i, text, "zipf"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
