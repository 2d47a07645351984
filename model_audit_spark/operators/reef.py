"""REEF whitebox comparison — linear CKA over per-layer representations.

Reference semantics (methods/reef.py:37-69, 184-225):
  CKA(X, Y) = ||YᵀX||²_F / sqrt(||XᵀX||²_F · ||YᵀY||²_F)
  with X, Y column-centered; 0 if n < 2 or the denominator < 1e-10.
  Per-layer CKA on min(L_a, L_b) layers, mean across layers (A8);
  is_derived = mean >= 0.85, confidence k = 0.15.

Two execution paths:
- `cka_pandas` / `layer_cka`: numpy kernel via cogrouped applyInPandas —
  exact float parity with the reference for small (8×hidden_dim) matrices.
- `cka_long`: pure-DataFrame CKA over long-format (sample, dim, value)
  relations. Gram entries via an equi-join on `sample` + one hash aggregate on
  (dim_x, dim_y) — this is the 100 TB path (never materializes a dense matrix
  on the driver, scales as n·d² shuffle rows) and is SQL-expressible, so the
  DuckDB oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REEF_THRESHOLD = 0.85
REEF_CONFIDENCE_K = 0.15


def cka_numpy(X, Y) -> float:
    """Reference-parity linear CKA on two (n, p)/(n, q) arrays."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    n = X.shape[0]
    if n < 2:
        return 0.0
    X = X - X.mean(axis=0)
    Y = Y - Y.mean(axis=0)
    hsic_xy = float(np.linalg.norm(Y.T @ X, "fro") ** 2)
    hsic_xx = float(np.linalg.norm(X.T @ X, "fro") ** 2)
    hsic_yy = float(np.linalg.norm(Y.T @ Y, "fro") ** 2)
    denom = (hsic_xx * hsic_yy) ** 0.5
    if denom < 1e-10:
        return 0.0
    return hsic_xy / denom


def layer_cka(
    hidden: DataFrame,
    model_a: str,
    model_b: str,
    model_col: str = "model_id",
) -> DataFrame:
    """Per-layer CKA between two models from a long hidden-states table
    `(model_id, layer INT, sample INT, vec ARRAY<FLOAT/DOUBLE>)` via a
    cogrouped pandas kernel. Layers beyond min(L_a, L_b) are dropped
    (reference reef.py:202)."""
    a = hidden.filter(F.col(model_col) == model_a)
    b = hidden.filter(F.col(model_col) == model_b)
    max_a = a.agg(F.max("layer")).collect()[0][0]
    max_b = b.agg(F.max("layer")).collect()[0][0]
    if max_a is None or max_b is None:
        return hidden.sparkSession.createDataFrame(
            [], "layer INT, cka DOUBLE"
        )
    shared = min(max_a, max_b)
    a = a.filter(F.col("layer") <= shared).select("layer", "sample", "vec")
    # Rename right-side columns: when both cogroup sides share plan lineage,
    # Spark's attribute dedup prunes the right side down to the grouping key.
    b = b.filter(F.col("layer") <= shared).select(
        "layer",
        F.col("sample").alias("sample_b"),
        F.col("vec").alias("vec_b"),
    )

    def _cka(key, pdf_a, pdf_b):
        import pandas as pd

        if len(pdf_a) == 0 or len(pdf_b) == 0:
            return pd.DataFrame({"layer": [key[0]], "cka": [0.0]})
        X = [list(v) for v in pdf_a.sort_values("sample")["vec"]]
        Y = [list(v) for v in pdf_b.sort_values("sample_b")["vec_b"]]
        # samples align positionally (probe order); truncate to the shared
        # prefix if one side has fewer rows, like layers are truncated to
        # min(L_a, L_b)
        m = min(len(X), len(Y))
        return pd.DataFrame(
            {"layer": [key[0]], "cka": [cka_numpy(X[:m], Y[:m])]}
        )

    return (
        a.groupBy("layer")
        .cogroup(b.groupBy("layer"))
        .applyInPandas(_cka, "layer INT, cka DOUBLE")
    )


def reef_compare(
    hidden: DataFrame,
    model_a: str,
    model_b: str,
    model_col: str = "model_id",
) -> DataFrame:
    """Mean-CKA verdict row (reference reef.py:184-225)."""
    per_layer = layer_cka(hidden, model_a, model_b, model_col)
    sim = F.coalesce(F.avg("cka"), F.lit(0.0))
    return per_layer.agg(
        F.lit(model_a).alias("model_a"),
        F.lit(model_b).alias("model_b"),
        F.lit("reef").alias("method"),
        F.round(sim, 6).alias("similarity"),
        (sim >= REEF_THRESHOLD).alias("is_derived"),
        F.lit(REEF_THRESHOLD).alias("threshold"),
        F.least(
            F.abs(sim - REEF_THRESHOLD) / REEF_CONFIDENCE_K, F.lit(1.0)
        ).alias("confidence"),
    )


# ---------------------------------------------------------------------------
# DataFrame-only CKA (scale path + SQL oracle)
# ---------------------------------------------------------------------------

def embeddings_long(
    emb: DataFrame, label: int, n_samples: int, label_col: str = "label"
) -> DataFrame:
    """(sample, dim, v) long relation for one label group, samples aligned by
    vec_id order, truncated to n_samples.

    The window partitions by the (single, filtered) label so the row
    numbering never degenerates to a global single-partition sort."""
    w = Window.partitionBy(label_col).orderBy("vec_id")
    return (
        emb.filter(F.col(label_col) == label)
        .withColumn("sample", F.row_number().over(w) - 1)
        .filter(F.col("sample") < n_samples)
        .select(
            "sample", F.posexplode("embedding").alias("dim", "v")
        )
        .withColumn("v", F.col("v").cast("double"))
    )


def _centered(df: DataFrame) -> DataFrame:
    w = Window.partitionBy("dim")
    return df.withColumn("v", F.col("v") - F.avg("v").over(w))


def _hsic(x: DataFrame, y: DataFrame) -> DataFrame:
    """||YᵀX||²_F via join on sample + aggregate on (dim_x, dim_y)."""
    xx = x.select(F.col("sample"), F.col("dim").alias("dx"), F.col("v").alias("xv"))
    yy = y.select(F.col("sample"), F.col("dim").alias("dy"), F.col("v").alias("yv"))
    gram = (
        xx.join(yy, "sample")
        .groupBy("dx", "dy")
        .agg(F.sum(F.col("xv") * F.col("yv")).alias("c"))
    )
    return gram.agg(F.sum(F.col("c") * F.col("c")).alias("hsic"))


def cka_long(x: DataFrame, y: DataFrame) -> DataFrame:
    """Single-row (cka DOUBLE) from two long (sample, dim, v) relations."""
    xc = _centered(x)
    yc = _centered(y)
    n = x.select("sample").distinct().count()
    if n < 2:
        return x.sparkSession.createDataFrame([(0.0,)], "cka DOUBLE")
    hxy = _hsic(xc, yc).withColumnRenamed("hsic", "hxy")
    hxx = _hsic(xc, xc).withColumnRenamed("hsic", "hxx")
    hyy = _hsic(yc, yc).withColumnRenamed("hsic", "hyy")
    joined = hxy.crossJoin(hxx).crossJoin(hyy)
    denom = F.sqrt(F.col("hxx") * F.col("hyy"))
    return joined.select(
        F.when(denom < 1e-10, F.lit(0.0))
        .otherwise(F.col("hxy") / denom)
        .alias("cka")
    )
