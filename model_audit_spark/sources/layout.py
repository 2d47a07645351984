"""Z-order (Morton) data layout for multi-dimensional data skipping.

At 100 TB, scan cost is dominated by how much parquet a filter can SKIP.
Sorting by one column gives perfect row-group min/max pruning on that
column and none on any other; interleaving the bits of several columns
(the Z-order curve — the layout Delta Lake's OPTIMIZE ZORDER and
ClickHouse's mortonEncode use) bounds the per-file min/max range of
EVERY interleaved column, so predicates on any of them prune files.

The z-value is pure integer bit arithmetic (shift/and/or) — one
whole-stage-codegen projection, bit-identical in any engine, and the
write is `repartitionByRange(_z)` + `sortWithinPartitions(_z)`: one
range shuffle, no global sort on the driver, each output task writes one
locality-tight file. Parquet's per-column min/max statistics then do the
pruning at read time with no engine cooperation needed.

Callers supply integer dimensions (ids, epoch minutes, bucketed
numerics). For continuous columns, `quantile_buckets` maps values onto
the integer grid via approxQuantile boundaries (one-pass sketch) — the
EXACT rank normalization is deliberately not offered, because it is a
global single-partition window at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zvalue",
    "write_zordered",
    "compact_parquet",
    "z_ranges_for_box",
    "zbox_filter",
]


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton code: interleave the low `bits` bits of each column.

    Output bit (i·n + j) = bit i of column j (column 0 owns the least
    significant position of each group), so co-located values in ALL
    dimensions map to nearby z-values. n_cols · bits must be ≤ 63.
    Negative inputs are masked to their low bits (callers should bucket
    signed data first); NULL propagates to NULL.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    if n == 0:
        raise ValueError("zvalue needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds 63 bits")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        v = c.cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return out


def write_zordered(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write `df` as parquet laid out along the Z-order curve of `cols`.

    One range shuffle on the z-value (boundaries from Spark's range
    sampler), in-partition sort, one file per task — every file covers a
    tight z-range, hence a tight min/max box in every interleaved
    dimension (pinned by test_layout's per-file footer check).
    """
    z = zvalue([F.col(c) for c in cols], bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 << 20,
    order_cols: list[str] | None = None,
) -> int:
    """Rewrite a small-file parquet directory into ~target-sized files;
    returns the output file count.

    Streaming sinks and per-batch ingest writes leave thousands of tiny
    files per partition; at 100 TB that is open/footer overhead and task
    explosion on every downstream scan (maxPartitionBytes packing helps
    reading but not listing). File count = ceil(bytes / target), sized
    from the Hadoop FileSystem summary so it works on any supported
    filesystem, not just local paths.

    Plain compaction round-robins (`repartition(n)` — even output sizes);
    pass `order_cols` to re-cluster while compacting
    (repartitionByRange + in-partition sort — e.g. the z-value layout's
    sort key, so compaction preserves data-skipping locality)."""
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    total = hpath.getFileSystem(hconf).getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    if order_cols:
        df = df.repartitionByRange(n, *order_cols).sortWithinPartitions(
            *order_cols
        )
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dst)
    # actual count, not the planned n: range partitioning on a skewed
    # key can leave partitions empty, and empty partitions write no file
    dpath = jvm.org.apache.hadoop.fs.Path(dst)
    fs = dpath.getFileSystem(hconf)
    return sum(
        1
        for st in fs.listStatus(dpath)
        if st.getPath().getName().endswith(".parquet")
    )


def z_ranges_for_box(
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int = 16,
    max_ranges: int = 64,
) -> list[tuple[int, int]]:
    """Covering z-value ranges for the box x∈[xlo,xhi], y∈[ylo,yhi]
    (inclusive) under the 2-D Morton order of zvalue([x, y], bits).

    Quadtree descent: an aligned Morton block either lies fully inside
    the box (emit its contiguous z-range), fully outside (prune), or
    straddles (recurse into its 4 children). Adjacent emitted ranges are
    merged; when more than `max_ranges` would be produced, recursion
    stops early and emits the (coarser, still-correct) covering block —
    the classic precision/range-count trade: every row in the box is in
    SOME range; rows outside may be included and must be re-filtered.

    Driver-side and O(ranges · bits); use with zbox_filter to turn a
    2-D box predicate into a z-range scan over a write_zordered layout
    (parquet row-group min/max on the z column prunes everything else).
    """
    xlo, xhi = x_range
    ylo, yhi = y_range
    out: list[tuple[int, int]] = []

    def z_of(x: int, y: int) -> int:
        v = 0
        for i in range(bits):
            v |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return v

    budget_exceeded = [False]

    def descend(px: int, py: int, level: int) -> None:
        # block = [px << level, (px+1) << level) in x, same in y
        size = 1 << level
        bx_lo, bx_hi = px * size, px * size + size - 1
        by_lo, by_hi = py * size, py * size + size - 1
        if bx_hi < xlo or bx_lo > xhi or by_hi < ylo or by_lo > yhi:
            return
        fully_in = (
            bx_lo >= xlo and bx_hi <= xhi and by_lo >= ylo and by_hi <= yhi
        )
        if fully_in or level == 0 or budget_exceeded[0]:
            lo = z_of(bx_lo, by_lo)
            out.append((lo, lo + size * size - 1))
            return
        if len(out) >= max_ranges:
            budget_exceeded[0] = True
            lo = z_of(bx_lo, by_lo)
            out.append((lo, lo + size * size - 1))
            return
        for dy in (0, 1):
            for dx in (0, 1):
                descend(px * 2 + dx, py * 2 + dy, level - 1)

    descend(0, 0, bits)
    out.sort()
    merged: list[tuple[int, int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def zbox_filter(
    z_col: Column | str,
    x_col: Column | str,
    y_col: Column | str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    bits: int = 16,
    max_ranges: int = 64,
) -> Column:
    """Predicate for a 2-D box over a z-ordered layout: OR of z-BETWEEN
    ranges (these reach the parquet scan and prune row groups via the z
    column's min/max stats) AND the exact per-column bounds (re-filters
    the overshoot coarse ranges may include). Semantically identical to
    the plain box predicate — pinned exhaustively in tests."""
    z = F.col(z_col) if isinstance(z_col, str) else z_col
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    ranges = z_ranges_for_box(x_range, y_range, bits, max_ranges)
    zpred = None
    for lo, hi in ranges:
        r = z.between(lo, hi)
        zpred = r if zpred is None else zpred | r
    exact = (
        x.between(*x_range) & y.between(*y_range)
    )
    return exact if zpred is None else zpred & exact


def quantile_buckets(
    df: DataFrame,
    col: str,
    bits: int = 8,
    relative_error: float = 0.01,
) -> tuple[Column, list[float]]:
    """(bucket_column, boundaries): map a continuous column onto the
    integer grid zvalue needs, via approxQuantile boundaries — the
    scale-legal rank normalization (the exact version is a global
    single-partition window; approxQuantile is a Greenwald-Khanna
    sketch, one pass, driver gets 2^bits floats).

    bucket(x) = #{boundaries b : x >= b} computed as a pure O(2^bits)
    fold over the boundary array literal — no join, no UDF; NULL maps
    to NULL (z-order callers should filter or coalesce first). The
    returned boundaries make the bucketing reproducible (store them
    next to the layout; re-use for queries so predicates bucket
    identically)."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(col, probs, relative_error)
    # dedupe plateaus (constant columns would otherwise emit 255 equal
    # boundaries and a degenerate all-in-one-bucket map is correct)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    arr = F.array(*[F.lit(float(b)) for b in uniq])
    bucket = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc
        + F.when(F.col(col) >= b, F.lit(1)).otherwise(F.lit(0)),
    ).cast("long")
    bucket = F.when(F.col(col).isNull(), F.lit(None)).otherwise(bucket)
    return bucket, uniq
