"""Change-data-capture shapes over an append-only event log.

`scd2_history` compacts a per-key event stream into type-2
slowly-changing-dimension rows: consecutive runs of an attribute value
become validity intervals [valid_from, valid_to), the open run is the
current version. This is the batch form of the "latest state + history"
merge every warehouse ingest pipeline runs over a CDC feed; the
reference engine has no CDC surface, so this sits in the scale-extension
tier next to snapshot_diff (operators/snapshot.py).

Scale shape: ONE hash shuffle on the entity key. The change flag, the
run id and the run aggregation all run inside the same (key, ts, order)
sort, so Spark plans a single Exchange + Sort and reuses it for both
window functions and the partial aggregation; the valid_to lookup
windows over the already-compacted run relation (|runs| << |events|).
At 100 TB the state per task is one key-group's sort spill — no
driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Type-2 history of `attr_col` per `key_col`.

    A new version starts at every row whose attribute differs from the
    previous row's (ordered by (ts, order_col) — the tiebreaker makes
    run boundaries deterministic under equal timestamps). Output, one
    row per version:

      key, version (1-based per key), attr value, valid_from,
      valid_to (next version's start; NULL for the open version),
      n_events (rows in the run), is_current.

    Timestamps are emitted second-truncated via date_format — the
    interval semantics stay microsecond-exact internally; only the
    rendering floors.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev = F.lag("__attr").over(w)
    flagged = events.select(
        key_col,
        ts_col,
        order_col,
        F.coalesce(F.col(attr_col), F.lit("")).alias("__attr"),
    ).withColumn(
        "__chg",
        F.when(prev.isNull() | (prev != F.col("__attr")), 1).otherwise(0),
    )
    runs = flagged.withColumn(
        "version",
        F.sum("__chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    compact = runs.groupBy(key_col, "version").agg(
        F.min("__attr").alias(attr_col),
        F.min(ts_col).alias("__from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    nxt = F.lead("__from").over(wv)
    return compact.select(
        key_col,
        "version",
        attr_col,
        F.date_format("__from", TS_FMT).alias("valid_from"),
        F.date_format(nxt, TS_FMT).alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """Latest-state projection of an scd2_history relation."""
    return history.filter(F.col("is_current")).drop("is_current")
