"""Z-order layout: Morton encoding semantics + per-file locality."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from model_audit_spark.sources.layout import write_zordered, zvalue


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (65535, 65535)], "x long, y long"
    )
    rows = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect()
    }
    # x owns even bit positions, y odd
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1
    assert rows[(0, 1)] == 2
    assert rows[(3, 3)] == 0b1111
    assert rows[(65535, 65535)] == (1 << 32) - 1


def test_zvalue_validates_width(spark):
    with pytest.raises(ValueError):
        zvalue(["a", "b"], bits=32)
    with pytest.raises(ValueError):
        zvalue([])


def _per_file_ranges(path, cols):
    """Per-file (max-min) span of each column, from parquet footers only."""
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                col = meta.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        spans.append({c: hi[c] - lo[c] for c in cols})
    return spans


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    """The point of the layout: after write_zordered on (x, y), EVERY
    file's min/max box is tight in BOTH dimensions, so a filter on either
    column skips most files via footer stats. A single-column sort gives
    this for one dimension only."""
    n, side = 4096, 64  # one point per cell of the 64x64 grid, x ⟂ y
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, ["x", "y"], zpath, bits=6, n_files=16)
    spath = str(tmp_path / "xsorted")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(spath)
    )

    zspans = _per_file_ranges(zpath, ["x", "y"])
    sspans = _per_file_ranges(spath, ["x", "y"])
    zx = sum(s["x"] for s in zspans) / len(zspans)
    zy = sum(s["y"] for s in zspans) / len(zspans)
    sy = sum(s["y"] for s in sspans) / len(sspans)
    # z-order: both dims well under the full span; x-sort leaves y wide open
    assert zx < side / 2 and zy < side / 2
    assert sy > side * 0.9
    # and nothing was lost
    total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{zpath}/*.parquet")
    )
    assert total == n


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 7, (i * 13) % 11) for i in range(100)],
        "id long, x long, y long",
    )
    path = str(tmp_path / "z")
    write_zordered(df, ["x", "y"], path, bits=4, n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == df.columns  # _z dropped
    assert back.count() == 100
    assert {r.id for r in back.select("id").collect()} == set(range(100))


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from model_audit_spark.sources.layout import compact_parquet

    src = str(tmp_path / "small_files")
    # 32 tiny files
    spark.range(2000).withColumn("x", F.col("id") % 10).repartition(
        32
    ).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 32

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    files = glob.glob(f"{dst}/*.parquet")
    assert n == 1 and len(files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == 2000
    assert {r.id for r in back.select("id").collect()} == set(range(2000))


def test_compact_parquet_preserves_order_clustering(spark, tmp_path):
    """order_cols re-clusters during compaction: each output file holds a
    contiguous x-range instead of round-robin shards."""
    from model_audit_spark.sources.layout import compact_parquet

    src = str(tmp_path / "scattered")
    spark.range(4096).withColumn("x", F.col("id") % 64).repartition(
        16
    ).write.parquet(src)
    dst = str(tmp_path / "clustered")
    # force several output files by tiny target size
    n = compact_parquet(
        spark, src, dst, target_file_bytes=8 << 10, order_cols=["x"]
    )
    assert n >= 4
    spans = _per_file_ranges(dst, ["x"])
    avg_span = sum(s["x"] for s in spans) / len(spans)
    assert avg_span < 64 / 2  # round-robin would give ~63 per file


def test_zvalue_matches_python_reference(spark):
    """Seeded randomized cross-check: Spark's zvalue == a pure-Python
    Morton encode for 1000 (x, y) pairs across the full 16-bit range."""
    import random

    rnd = random.Random(42)
    rows = [(rnd.randrange(1 << 16), rnd.randrange(1 << 16)) for _ in range(1000)]

    def morton(x, y, bits=16):
        v = 0
        for i in range(bits):
            v |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return v

    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect()
    for r in got:
        assert r.z == morton(r.x, r.y), (r.x, r.y)


def test_zbox_filter_equals_plain_box_predicate(spark, tmp_path):
    """zbox_filter (z-range OR-chain AND exact bounds) must select
    exactly the rows of the plain box predicate, and the z ranges must
    reach the parquet scan as pushed filters."""
    from model_audit_spark.sources.layout import zbox_filter, zvalue

    side, bits = 64, 6
    df = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    ).withColumn("z", zvalue(["x", "y"], bits))
    path = str(tmp_path / "zq")
    (
        df.repartitionByRange(8, "z").sortWithinPartitions("z")
        .write.parquet(path)
    )
    back = spark.read.parquet(path)
    for box in [((3, 17), (40, 55)), ((0, 63), (10, 10)), ((20, 20), (20, 20))]:
        (xr, yr) = box
        got = back.filter(
            zbox_filter("z", "x", "y", xr, yr, bits=bits)
        )
        want = back.filter(
            F.col("x").between(*xr) & F.col("y").between(*yr)
        )
        assert sorted((r.x, r.y) for r in got.collect()) == sorted(
            (r.x, r.y) for r in want.collect()
        )
    plan = back.filter(
        zbox_filter("z", "x", "y", (3, 17), (40, 55), bits=bits)
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "z" in plan.split("PushedFilters")[1][:200]


def test_z_ranges_budget_stays_correct(spark):
    """Range-budget truncation coarsens but never loses coverage."""
    from model_audit_spark.sources.layout import z_ranges_for_box

    def z_of(x, y, bits=6):
        v = 0
        for i in range(bits):
            v |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return v

    box = ((3, 60), (5, 59))  # maximally unaligned
    tight = z_ranges_for_box(*box, bits=6, max_ranges=1000)
    coarse = z_ranges_for_box(*box, bits=6, max_ranges=4)
    assert len(coarse) <= len(tight)
    inbox = {
        z_of(x, y)
        for x in range(box[0][0], box[0][1] + 1)
        for y in range(box[1][0], box[1][1] + 1)
    }
    for rs in (tight, coarse):
        cov = set()
        for lo, hi in rs:
            cov.update(range(lo, hi + 1))
        assert inbox <= cov


def test_quantile_buckets_balanced_and_monotone(spark):
    from model_audit_spark.sources.layout import quantile_buckets

    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).cast("double").alias("v")
    )
    bucket, bounds = quantile_buckets(df, "v", bits=4)
    rows = df.select("v", bucket.alias("b")).collect()
    counts = {}
    for r in rows:
        counts[r.b] = counts.get(r.b, 0) + 1
    assert set(counts) == set(range(16))
    # roughly balanced (approx sketch at 1% error on uniform data)
    assert max(counts.values()) < 2 * min(counts.values())
    # monotone: bigger value -> same or later bucket
    by_v = sorted(rows, key=lambda r: r.v)
    assert all(a.b <= b.b for a, b in zip(by_v, by_v[1:]))
    assert len(bounds) == 15


def test_quantile_buckets_constant_and_null(spark):
    from model_audit_spark.sources.layout import quantile_buckets

    df = spark.createDataFrame(
        [(1.0,), (1.0,), (None,)], "v double"
    )
    bucket, bounds = quantile_buckets(df, "v", bits=4)
    rows = {r.v: r.b for r in df.select("v", bucket.alias("b")).collect()}
    assert rows[1.0] in (0, 1) and rows[None] is None
    assert len(bounds) <= 1  # plateau deduped
