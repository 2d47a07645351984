#!/usr/bin/env python
"""Local mirror of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its oracle_sql()
mirror on DuckDB against the same parquet tables, then compares:
row count, sorted column names, dtype classes, and an order-insensitive
value hash (floats rounded to 6dp, rows sorted by their full string repr).

Usage:
  python scripts/check_oracle.py [query ...] [--sf=DIR] [--cpus=N]

Defaults to the DRIVER's parallelism (SPARK_GRAFT_CPUS, else 32) so local
green predicts driver green — round 1 shipped 3 float-sum-order hash
mismatches because this mirror hard-coded local[8].
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v, side="spark"):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r):
            return str(int(r))
        return f"{r:.6f}".rstrip("0")
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        # Mirror the DRIVER's asymmetry (round-3 finding): the driver's
        # pandas path converts DUCKDB decimals to float64 while Spark
        # rows keep exact Decimal objects ("1.500000000" vs "1.5"), so a
        # DECIMAL-emitting query hash-fails at the driver even when the
        # values are bit-identical. Reproduce that here — exact string on
        # the Spark side, float path on the oracle side — so any query
        # that emits DECIMAL trips the mirror BEFORE it trips the driver.
        # (Emit DOUBLE instead: DETERMINISM.md rule 4.)
        if side == "spark":
            return str(v)
        return canon_cell(float(v), side)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return str(v)


def spark_type_class(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("string", "varchar"):
        return "str"
    if dt == "boolean":
        return "bool"
    if dt in ("date", "timestamp", "timestamp_ntz"):
        return "ts"
    if dt.startswith("array"):
        return "list"
    if dt == "binary":
        return "bytes"
    return dt


def duck_type_class(dt) -> str:
    s = str(dt).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    # HUGEINT deliberately NOT mapped to "int": the driver's pandas
    # conversion turns it into float64 ("14.0" vs "14") and fails the value
    # hash even though fetchall() would agree. Force a CAST in the oracle.
    if s == "HUGEINT":
        return "hugeint"
    if s in ("FLOAT", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s == "VARCHAR":
        return "str"
    if s == "BOOLEAN":
        return "bool"
    if s in ("DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE"):
        return "ts"
    if s.endswith("[]") or s.startswith("LIST"):
        return "list"
    if s == "BLOB":
        return "bytes"
    return s.lower()


def frame_digest(cols, rows, side="spark"):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(r[i], side) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    import os

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or "32")
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        if a.startswith("--cpus="):
            cpus = int(a.split("=", 1)[1])

    import duckdb

    import __spark_entry__ as entrymod
    from model_audit_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)
    failures = []
    for name in names:
        # drop catalog caches AND localCheckpoint blocks from the previous
        # query (the iterative operators checkpoint per round; those blocks
        # only free after the Python references die — same fix as bench.py)
        import gc

        gc.collect()
        from model_audit_spark import persistence

        persistence.release_all()
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(
                f"~ {name}: rows-only ({len(srows)} rows, "
                f"{time.time()-t0:.1f}s)"
            )
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} vs {sorted(ocols)}")
        else:
            stypes = dict(sdf.dtypes)
            otypes = dict(zip(rel.columns, rel.types))
            for c in scols:
                sc = spark_type_class(stypes[c])
                oc = duck_type_class(otypes[c])
                if sc != oc:
                    problems.append(f"dtype[{c}] spark:{sc} vs duckdb:{oc}")
        if not problems:
            sh = frame_digest(scols, [list(r) for r in srows], "spark")
            oh = frame_digest(ocols, orows, "oracle")
            if sh != oh:
                problems.append(f"value-hash {sh} vs {oh}")
        if problems:
            print(f"✗ {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            failures.append(name)
            # show a small diff sample
            if sorted(scols) == sorted(ocols):
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = {
                    "|".join(canon_cell(list(r)[i], "spark") for i in order)
                    for r in srows
                }
                oset = {
                    "|".join(canon_cell(r[i], "oracle") for i in order)
                    for r in orows
                }
                only_s = sorted(sset - oset)[:3]
                only_o = sorted(oset - sset)[:3]
                print(f"    cols: {[scols[i] for i in order]}")
                for x in only_s:
                    print(f"    spark-only:  {x[:200]}")
                for x in only_o:
                    print(f"    oracle-only: {x[:200]}")
        else:
            print(
                f"✓ {name}: {len(srows)} rows match  ({time.time()-t0:.1f}s)"
            )
    print()
    if failures:
        print(f"FAILED: {len(failures)}/{len(names)}: {failures}")
        sys.exit(1)
    print(f"ALL MATCH ({len(names)} queries)")


if __name__ == "__main__":
    main()
