"""Skew-handling utilities (SCALE.md rule 8).

AQE's skew-join splitting covers joins; these helpers cover the two shapes
AQE does not fix:

- salted_count: hot-key aggregation. A groupBy on a key where one value
  holds most rows bottlenecks the final reducer; salting splits each key
  into `salt_buckets` partial groups (map-side parallel), then a second
  tiny aggregate merges partials. Two shuffles, both balanced — the
  classic two-level aggregation.
- frequency_capped_explode: explode amplification. Dropping tokens/
  shingles above a document-frequency cap before a join/bucket stage
  bounds the Σ bucket² term (boilerplate shingles are the minhash skew
  hazard named in dedup.py).
- salted_join: KNOWN-a-priori join skew. AQE splits skewed shuffle
  partitions at runtime, but only when it can observe them (post-shuffle
  map stats); a join fed by an upstream aggregate or a non-shuffle child
  can still funnel one hot key to one task. When the hot keys are known
  ahead of time (from heavy_hitters_cms or domain knowledge),
  pre-planned salting replicates ONLY the hot keys' build rows n_salts
  ways and splits their probe rows across the replicas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rebalance_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Restore parallelism lost to small or unsplittable inputs.

    A parquet file with a single row group scans as ONE task no matter how
    many cores the session has, serializing any CPU-heavy per-row
    expression work that follows (style scoring, tokenization, minhash).
    When the scan yields fewer partitions than the session's default
    parallelism, round-robin repartition up to it; the shuffled bytes are
    by construction small (the input was too small to split). At cluster
    scale a 100 TB table scans as thousands of splits, the condition is
    false, and this is a no-op — no shuffle is added on the big path."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_count(
    df: DataFrame, key_col: str, salt_buckets: int = 32
) -> DataFrame:
    """Two-level count per key: (key, n) with balanced reducers.

    Equivalent to groupBy(key).count() for any data; worth the second
    (tiny) shuffle only when some key dominates."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("_partial")
    )
    return partial.groupBy(key_col).agg(
        F.sum("_partial").cast("bigint").alias("n")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_keys: DataFrame | None = None,
    uid_col: str | None = None,
) -> DataFrame:
    """Inner equi-join on `key`, with KNOWN hot keys salted n_salts ways.

    Result is bit-identical to `left.join(right, key)` for any input —
    the oracle twin is the PLAIN join, so a hash match certifies the
    salting loses and duplicates nothing.

    Shape: `hot_keys` (small: the output of heavy_hitters_cms or a
    domain list) broadcasts into semi/anti splits of both sides. Cold
    keys take the ordinary join. Hot probe rows get a deterministic salt
    from xxhash64(uid_col) — or, when no uid_col is passed, xxhash64
    over all ATOMIC probe columns (maps are unhashable, large nested
    payloads not worth hashing), which is row-unique up to
    fully-identical rows (interchangeable anyway). Salting by the join
    key itself would
    send every probe row of a hot key to ONE salt bucket: full
    replication cost, zero skew relief. Hot build rows are replicated
    across all n_salts buckets, so the join key becomes (key, salt) and
    each hot key occupies n_salts tasks instead of one. The salt choice
    only steers partitioning — the joined row SET is salt-invariant,
    which is what the plain-join oracle certifies.

    Cost model (document before reaching for this): each side is read by
    both its hot and cold branch — two scans per input unless the source
    is already materialized. Prefer AQE skew splitting when the skew is
    visible to it; use this when the skewed relation is the output of an
    aggregate/window the optimizer cannot re-split, and persist the
    inputs if they are raw scans. Replication is confined to hot build
    rows: cost n_salts × |hot build rows|, not n_salts × |right|.
    """
    if hot_keys is None:
        return left.join(right, key)
    hot = F.broadcast(hot_keys.select(key).distinct())
    if uid_col:
        uid_cols = [F.col(uid_col)]
    else:
        # hash every ATOMIC probe column: row-unique up to fully
        # identical rows (interchangeable anyway). Map columns are
        # excluded — xxhash64 rejects MapType outright — and so are
        # nested array/struct payloads, which hash fine but would pay
        # per-row hashing of large payloads for no extra spread.
        atomic = [
            f.name
            for f in left.schema.fields
            if f.dataType.typeName()
            not in ("map", "array", "struct")
        ]
        uid_cols = [F.col(c) for c in (atomic or [key])]
    salt = F.pmod(F.xxhash64(*uid_cols), F.lit(n_salts)).cast("int")
    l_hot = left.join(hot, key, "left_semi").withColumn("_salt", salt)
    r_hot = right.join(hot, key, "left_semi").withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    hot_joined = l_hot.join(r_hot, [key, "_salt"]).drop("_salt")
    cold = left.join(hot, key, "left_anti").join(
        right.join(hot, key, "left_anti"), key
    )
    return hot_joined.unionByName(cold)


def frequency_capped_explode(
    df: DataFrame,
    array_col: str,
    id_col: str,
    max_doc_frequency: float = 0.5,
) -> DataFrame:
    """Explode an array column, dropping elements that appear in more than
    `max_doc_frequency` of the documents (computed exactly in one extra
    aggregate; swap count for approx_count_distinct at 100 TB)."""
    n_docs = df.count()
    cap = int(n_docs * max_doc_frequency)
    exploded = df.select(F.col(id_col), F.explode(array_col).alias("el"))
    freq = exploded.groupBy("el").agg(
        F.countDistinct(id_col).alias("_df")
    )
    hot = freq.filter(F.col("_df") > cap).select("el")
    return exploded.join(F.broadcast(hot), "el", "left_anti")


def heavy_hitters_cms(
    df: DataFrame,
    col: str,
    min_share: float = 0.01,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """(value, est_count) for values estimated to exceed `min_share` of
    all rows — the one-pass heavy-hitter scan that feeds skew hedges
    (hot LSH buckets, boilerplate shingles, hot join keys) WITHOUT an
    exact value-keyed aggregate.

    Pass 1 builds ONE count-min sketch (the `count_min_sketch` SQL
    aggregate: fixed d×w counter state, d = ⌈ln(1/(1-confidence))⌉ rows,
    w = ⌈e/eps⌉ columns, merged map-side — never a per-value shuffle);
    the merged binary comes back to the driver (a few hundred KB at
    eps=0.001) and is probed via the JVM CountMinSketch.readFrom.
    Pass 2 probes it for each DISTINCT candidate from a bounded uniform
    sample of rows (~50/min_share): a value with share ≥ s appears in an
    n-row sample except with prob (1-s)^n ≈ e^-50, so true heavy
    hitters are never missed by sampling; both driver-side structures
    are bounded by parameters, not data size.

    CMS guarantees est ≥ true and est ≤ true + eps·N (w.p. confidence):
    the threshold filter has NO false negatives and only eps-bounded
    false positives. For exact counts of survivors, run the tiny
    follow-up groupBy restricted to the returned values."""
    spark = df.sparkSession
    strs = df.select(F.col(col).cast("string").alias("value")).persist()
    # ONE aggregate computes the row count AND the sketch (a second
    # full scan just for count() would double the pass this function
    # exists to avoid); the sample below reads the persisted projection.
    row = strs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_min_sketch(
            "value", F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("sk"),
    ).first()
    n_rows = row.n
    if n_rows == 0:
        strs.unpersist()
        return spark.createDataFrame([], "value string, est_count long")
    jvm = spark._jvm
    jstream = jvm.java.io.ByteArrayInputStream(bytes(row.sk))
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(jstream)
    # seeded Bernoulli sample, NOT limit(): limit takes the first
    # partitions' rows, so input sorted/clustered by value would hide a
    # late heavy hitter entirely — sample() draws uniformly across all
    # partitions. The collect is bounded by the expected sample size
    # (~50/min_share) plus a hard cap.
    sample_n = max(1000, int(50 / min_share))
    frac = min(1.0, sample_n / n_rows)
    cands = {
        r.value
        for r in strs.sample(fraction=frac, seed=seed)
        .distinct()
        .limit(10 * sample_n)
        .collect()
    }
    strs.unpersist()
    thresh = int(min_share * n_rows)
    hits = []
    for v in cands:
        if v is None:
            continue
        est = int(sketch.estimateCount(v))  # one py4j call per candidate
        if est >= thresh:
            hits.append((v, est))
    out = spark.createDataFrame(
        hits or [], "value string, est_count long"
    )
    return out.orderBy(F.desc("est_count"), F.asc("value"))


def frequency_capped_explode_cms(
    df: DataFrame,
    array_col: str,
    id_col: str,
    max_share: float = 0.01,
    eps: float = 0.0005,
) -> DataFrame:
    """CMS-backed twin of frequency_capped_explode for the regime where
    even the per-element df aggregate is too hot: the drop-list comes
    from ONE count-min pass over the exploded elements
    (heavy_hitters_cms) instead of an exact per-element count_distinct.

    Semantics difference, documented: the cap is on OCCURRENCE share
    (est_count/total rows of the exploded relation) rather than
    document frequency, and CMS overcounting (≤ eps·N w.p. confidence)
    can drop borderline-cold elements — a recall-safe error for the
    skew-hedge use (it never UNDER-drops a truly hot element). The
    drop-list is bounded by 1/max_share values, so the anti-join side
    broadcasts by construction."""
    exploded = df.select(F.col(id_col), F.explode(array_col).alias("el"))
    hot = heavy_hitters_cms(
        exploded, "el", min_share=max_share, eps=eps
    ).select(F.col("value").alias("el"))
    return exploded.join(F.broadcast(hot), "el", "left_anti")


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int = 20
) -> DataFrame:
    """Exact top-k heavy hitters with integer-exact corpus share — the
    skew diagnosis read before choosing salt lists for salted_join /
    salted_count (and the exactness oracle for heavy_hitters_cms,
    whose sketch estimates are error-banded in test_plan_invariants).

    One map-side-combining count aggregate; the top-k is TakeOrdered
    (never a global sort of all keys), the total rides in as a
    broadcast single-row relation so nothing leaves the DAG. share_ppm
    = cnt·1e6 DIV total (BIGINT floor — engine-portable). The final
    rank window runs over k rows.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("total"))
    top = (
        counts.crossJoin(F.broadcast(total))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.col("key").cast("string").alias("key"),
        "cnt",
        F.expr("cnt * 1000000 DIV total").alias("share_ppm"),
    )
