"""Training-data memorization checks (SURVEY.md §2.3 F24-F25; reference
mcp_server.py:376-397).

The reference probes a live model: it sends the first half of a sample and
scores the model's continuation against the true suffix (F24), and asks for a
paraphrase and counts ~8-word phrases reproduced verbatim (F25). Here the
(sample, response) pairing is an input relation — the live probe source or a
test fixture supplies it — and the scoring operators are:

- sequence_match_scores: difflib.SequenceMatcher.ratio() for exact reference
  parity (F24). Arrow-batched pandas UDF: pure-Python kernel. The SQL twin
  (oracle.memorization_seqmatch) re-implements the difflib algorithm as a
  recursive CTE — matching-blocks queue → BFS over clipped diagonal
  match-runs, autojunk popular chars excluded from the DP but allowed in
  the end-extension — so the kernel is hash-checkable, not rows-only.
- levenshtein_similarity: 1 − lev(a,b)/max(|a|,|b|,1) — the Spark-native
  proxy (built-in, whole-stage codegen, SQL-oracle-checkable). Not
  bit-identical to SequenceMatcher; both are exposed.

100 TB POLICY (SCALE.md "Memorization at scale"): levenshtein_similarity
is the DEFAULT for cluster-scale sweeps — pure JVM expression, exp 0.36
at the realistic 100x tier. sequence_match_scores is the PARITY/AUDIT
mode: a per-pair Python difflib kernel (exp 0.73, ~5x the wall at 100x)
whose value is bit-exact reference parity, priced accordingly — run it
on the flagged subset a levenshtein sweep surfaces, not the full corpus.
- verbatim_phrase_fraction: F25 exactly — phrase_len = min(8, n_words//4)
  or 3; non-overlapping windows at stride phrase_len; fraction of phrases
  contained verbatim in the response.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from model_audit_spark.functions.text import words


@pandas_udf("m long, t long")
def _seq_match_blocks(a, b):
    """Per pair: M = total matched chars over difflib matching blocks,
    T = len(a.strip()) + len(b.strip()). ratio() == 2M/T, but M and T are
    exact integers the score can be derived from without any engine-side
    float rounding (DETERMINISM.md failure mode 2)."""
    from difflib import SequenceMatcher

    import pandas as pd

    ms, ts = [], []
    for x, y in zip(a, b):
        sa, sb = (x or "").strip(), (y or "").strip()
        sm = SequenceMatcher(None, sa, sb)
        ms.append(sum(bl.size for bl in sm.get_matching_blocks()))
        ts.append(len(sa) + len(sb))
    return pd.DataFrame({"m": ms, "t": ts})


def sequence_match_scores(
    pairs: DataFrame,
    suffix_col: str = "suffix",
    completion_col: str = "completion",
    id_col: str = "pair_id",
) -> DataFrame:
    """F24: SequenceMatcher ratio of true suffix vs model completion
    (reference mcp_server.py:376-384), emitted as
    (id, n_matched, total_len, score).

    score = ratio() = 2M/T quantized half-up at 4dp via exact integer
    arithmetic: (40000·M + T) div (2·T) / 1e4 — identical in every
    engine because the operands are integers (an engine round() on the
    double ratio is not, DETERMINISM.md mode 2). Empty-vs-empty scores
    1.0, matching difflib's T == 0 convention."""
    mt = pairs.select(
        F.col(id_col),
        _seq_match_blocks(
            F.col(suffix_col), F.col(completion_col)
        ).alias("_mt"),
    )
    t = F.col("_mt.t")
    return mt.select(
        id_col,
        F.col("_mt.m").alias("n_matched"),
        t.alias("total_len"),
        F.when(
            t > 0,
            (F.expr("(40000 * _mt.m + _mt.t) div (2 * _mt.t)"))
            / F.lit(10000.0),
        )
        .otherwise(F.lit(1.0))
        .alias("score"),
    )


def levenshtein_similarity(a: Column | str, b: Column | str) -> Column:
    """Spark-native memorization proxy: 1 − lev/max(len) on stripped text."""
    ca = F.trim(F.col(a) if isinstance(a, str) else a)
    cb = F.trim(F.col(b) if isinstance(b, str) else b)
    return 1.0 - F.levenshtein(ca, cb) / F.greatest(
        F.length(ca), F.length(cb), F.lit(1)
    )


def verbatim_phrase_fraction(
    pairs: DataFrame,
    sample_col: str = "sample",
    response_col: str = "response",
    id_col: str = "pair_id",
) -> DataFrame:
    """F25: fraction of non-overlapping ~8-word sample phrases found verbatim
    in the response (mcp_server.py:385-397)."""
    staged = pairs.select(
        F.col(id_col),
        F.col(response_col).alias("_resp"),
        words(F.col(sample_col)).alias("_w"),
    )
    n = F.size("_w")
    pl_raw = F.least(F.lit(8), F.floor(n / 4).cast("int"))
    pl = F.when(pl_raw == 0, F.lit(3)).otherwise(pl_raw)
    # j = 0, pl, 2pl, ... while j <= n - pl  (range(0, n-pl+1, pl))
    idx = F.when(n - pl >= 0, F.sequence(F.lit(0), n - pl, pl)).otherwise(
        F.array().cast("array<int>")
    )
    staged2 = staged.select(
        id_col, "_resp", "_w", pl.alias("_pl"), idx.alias("_idx")
    )
    phrases = F.transform(
        F.col("_idx"),
        lambda j: F.array_join(
            F.slice(F.col("_w"), j + 1, F.col("_pl")), " "
        ),
    )
    staged3 = staged2.select(
        id_col, "_resp", phrases.alias("_phrases")
    )
    total = F.size("_phrases")
    matches = F.size(
        F.filter(F.col("_phrases"), lambda p: F.col("_resp").contains(p))
    )
    return staged3.select(
        id_col,
        total.alias("total_phrases"),
        matches.alias("matched_phrases"),
        F.round(
            F.when(total > 0, matches / total).otherwise(F.lit(0.0)), 4
        ).alias("score"),
    )
