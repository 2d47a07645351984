"""Negative controls for the correctness harness itself.

The 202-query surface is only as trustworthy as the comparator:
these tests pin that scripts/check_oracle.py's value digest DETECTS
the mismatch classes it claims to (values beyond 6dp, extra/missing
rows, flipped booleans, NULL vs value, the DECIMAL sentinel
asymmetry) and IGNORES exactly the legitimate differences (row
order, column order, sub-6dp float noise, int-valued floats vs
ints). A comparator that silently canonicalized too much would turn
the whole gate green-by-construction; these are its falsifiers.
Pure functions — no Spark session.
"""
from __future__ import annotations

import decimal
import importlib.util
import math

spec = importlib.util.spec_from_file_location(
    "check_oracle", "/root/repo/scripts/check_oracle.py"
)
co = importlib.util.module_from_spec(spec)
spec.loader.exec_module(co)


def d(cols, rows, side="spark"):
    return co.frame_digest(cols, rows, side)


def test_digest_order_insensitive_but_value_sensitive():
    cols = ["a", "b"]
    rows = [(1, "x"), (2, "y")]
    assert d(cols, rows) == d(cols, list(reversed(rows)))
    # column permutation with matching header permutation: equal
    assert d(cols, rows) == d(["b", "a"], [("x", 1), ("y", 2)])
    # any value change: different
    assert d(cols, rows) != d(cols, [(1, "x"), (2, "z")])
    assert d(cols, rows) != d(cols, [(1, "x"), (3, "y")])
    # extra / missing row: different
    assert d(cols, rows) != d(cols, rows + [(3, "z")])
    assert d(cols, rows) != d(cols, rows[:1])
    # NULL vs value, bool flip: different
    assert d(["a"], [(None,)]) != d(["a"], [(0,)])
    assert d(["a"], [(True,)]) != d(["a"], [(False,)])


def test_digest_float_canonicalization_boundary():
    cols = ["v"]
    # sub-6dp noise canonicalizes equal (the documented rounding)
    assert d(cols, [(0.1234567,)]) == d(cols, [(0.12345670000001,)])
    # differences AT 6dp are detected
    assert d(cols, [(0.123456,)]) != d(cols, [(0.123457,)])
    # int-valued float == int (cross-engine widening tolerance)
    assert d(cols, [(14.0,)]) == d(cols, [(14,)])
    # NaN is stable and distinct from numbers
    assert d(cols, [(float("nan"),)]) == d(cols, [(float("nan"),)])
    assert d(cols, [(float("nan"),)]) != d(cols, [(0.0,)])
    assert not math.isnan(0.0)  # guard the line above means something


def test_digest_decimal_sentinel_asymmetry():
    # The deliberate round-3 mirror behavior: a DECIMAL-emitting query
    # must hash-MISmatch (spark side keeps the exact string, oracle
    # side goes through float), so it trips locally before the driver.
    cols = ["v"]
    dec = [(decimal.Decimal("1.500000000"),)]
    assert d(cols, dec, side="spark") != d(cols, dec, side="oracle")
    # while the oracle-side float path equals a plain float 1.5
    assert d(cols, dec, side="oracle") == d(cols, [(1.5,)], side="oracle")


def test_type_class_maps_agree_on_the_shared_classes():
    pairs = [
        ("bigint", "BIGINT", "int"),
        ("double", "DOUBLE", "float"),
        ("string", "VARCHAR", "str"),
        ("boolean", "BOOLEAN", "bool"),
        ("timestamp", "TIMESTAMP", "ts"),
        ("array<string>", "VARCHAR[]", "list"),
        ("binary", "BLOB", "bytes"),
    ]
    for sdt, ddt, cls in pairs:
        assert co.spark_type_class(sdt) == cls
        assert co.duck_type_class(ddt) == cls
    # HUGEINT deliberately does NOT class as int (driver float64 path)
    assert co.duck_type_class("HUGEINT") == "hugeint"
    assert co.spark_type_class("decimal(38,0)") == "decimal"
