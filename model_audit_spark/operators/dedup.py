"""Corpus deduplication operators (scale extension, BASELINE.json north star).

- exact_dedup: full-text md5 grouping with deterministic keep-first markers.
- minhash: word-shingle MinHash + LSH banding. Hash function is
  md5(seed || '|' || shingle) compared lexicographically — deterministic,
  portable across Spark and any SQL oracle (no engine-specific hash()).
  Candidate pairs come from band-hash equality (a shuffle join on band value,
  Σ bucket² work instead of O(N²)); candidates are then verified with exact
  Jaccard over distinct shingle sets.
- simhash: 32-bit SimHash over word tokens (per-bit sign of summed ±1 votes,
  token hash = first 8 md5 hex digits). Near-dup candidates = equal simhash
  (or banded bytes for hamming<k at scale).

At 100 TB: every stage is explode → hash-aggregate or equi-join on a hash
key; no driver-side state, no window over the full corpus. Skewed shingles
(stopword shingles) are bounded because signatures are fixed-width per doc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from model_audit_spark.functions.text import word_tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text_hash, dup_group_size, is_first): keep-first exact dedup."""
    hashed = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    w = Window.partitionBy("text_hash").orderBy(id_col)
    return hashed.select(
        id_col,
        "text_hash",
        F.count("*").over(Window.partitionBy("text_hash")).alias(
            "dup_group_size"
        ),
        (F.row_number().over(w) == 1).alias("is_first"),
    )


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles from the DLI tokenizer."""
    w = word_tokens(text_col)
    size = F.size(w)
    sh = F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), size - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        )
    )
    return F.array_distinct(sh)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): per-doc MinHash signature (md5-hex minima).

    Docs with no shingles get the sentinel 'z'*32 (sorts after any hex)."""
    sh = word_shingles(text_col, shingle_n)
    sentinel = F.lit("z" * 32)

    def _hasher(seed: int):
        # NB: a default-arg lambda (lambda s, seed=seed: ...) would have
        # arity 2 and pyspark would bind the array INDEX to the second
        # parameter — close over the prefix instead.
        prefix = f"{seed}|"
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    cols = []
    for seed in range(num_hashes):
        hashed = F.transform(sh, _hasher(seed))
        cols.append(
            F.coalesce(F.array_min(hashed), sentinel).alias(f"mh_{seed}")
        )
    return df.select(F.col(id_col), *cols)


def minhash_band_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate pairs sharing at least one LSH band (id_a < id_b)."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [
            F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)
        ]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts)).alias("bh"),
            )
        )
    exploded = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = exploded.select(
        "band", "bh", F.col(id_col).alias("id_a")
    )
    b = exploded.select(
        "band", "bh", F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """(id_a, id_b, jaccard) for candidate pairs, exact over shingle sets."""
    shing = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(text_col, shingle_n).alias("sh"),
    )
    sizes = shing.select("_id", F.size("sh").alias("n_sh"))
    expl = shing.select("_id", F.explode("sh").alias("s"))
    # equi-join on (id, shingle) both sides -> |A ∩ B| per pair
    inter = (
        pairs.join(expl.withColumnRenamed("_id", "id_a"), "id_a")
        .join(expl.withColumnRenamed("_id", "id_b"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0))
                / F.greatest(
                    F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_inter"), F.lit(0)),
                    F.lit(1),
                ),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """(id, simhash BIGINT): 32-bit SimHash over word tokens.

    Token hash = conv(first 8 md5 hex chars) — portable to SQL oracles.
    One explode + one hash aggregate; the 32 per-bit votes are aggregate
    expressions, not row blowup."""
    toks = df.select(
        F.col(id_col), F.explode_outer(word_tokens(text_col)).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    hashed = toks.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.col("tok").isNull(), 0)
            .when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sim = sum(
        (
            F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(0).cast("long")
            for i in range(bits)
        ),
        F.lit(0).cast("long"),
    )
    return agg.select(F.col(id_col), sim.alias("simhash"))
