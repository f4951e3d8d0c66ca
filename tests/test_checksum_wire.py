"""CHECKSUM byte-level parity (ChecksumAggregationFunction.java).

The reference's checksum(x) is an order-independent wrapping 64-bit
sum of per-row ``type.hash(row) * PRIME64`` terms (null rows add bare
PRIME64 = 0x9E3779B185EBCA87), emitted as the state's 8 LITTLE-endian
bytes as VARBINARY (ChecksumAggregationFunction.java:107-132,
``wrappedLongArray``). Type hashes: the 2-op "xxhash64 mix" for every
fixed-width payload (AbstractLongType.java:137-141), XXH64(seed 0)
over raw bytes for VARCHAR/VARBINARY
(AbstractVariableWidthBlock.java:102-106), 1231/1237 for BOOLEAN
(BooleanType.java:101-105).

Layers of validation, from independent to compositional:

1. XXH64 against the PUBLIC spec vectors (github.com/Cyan4973/xxHash
   xxhash_spec.md) — no reference/airlift code involved.
2. XXH64 against SPARK's own independent xxhash64 (seed 42), both the
   byte path (short + >32-byte lane path) and the 8-byte long path.
3. The fixed-width mix spelled out LITERALLY in this file (from
   AbstractLongType.java:137-141) against functions/xxhash.py.
4. End-to-end SQL checksum: hand-composed little-endian byte pins,
   null/empty contracts, order- and split-independence (the
   reference's combine() is addition, so checksum over a UNION ALL
   must equal checksum over the whole).
"""

from __future__ import annotations

import struct

import pytest

from presto_0_235_spark.functions.xxhash import (
    CHECKSUM_PRIME64,
    checksum_term,
    fixed_width_hash,
    xxh64,
)
from presto_0_235_spark.sql.frontend import run_sql

M64 = (1 << 64) - 1


# ---------------------------------------------------------------------------
# 1. Public spec vectors (xxhash_spec.md / xxHash repo test suite)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "data,seed,want",
    [
        (b"", 0, 0xEF46DB3751D8E999),
        (b"a", 0, 0xD24EC4F1A98C6E5B),
        (b"abc", 0, 0x44BC2CF5AD770999),
    ],
    ids=["empty", "one_byte", "abc"],
)
def test_xxh64_public_vectors(data, seed, want):
    assert xxh64(data, seed) == want


# ---------------------------------------------------------------------------
# 2. Cross-check against Spark's independent xxhash64 (seed 42)
# ---------------------------------------------------------------------------

def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_xxh64_matches_spark_bytes(spark):
    texts = [
        "", "a", "abc", "0123456789abcdef0123456789abcdef-tail",
        "x" * 100,
    ]
    rows = spark.sql(
        "SELECT " + ", ".join(
            f"xxhash64('{t}') AS c{i}" for i, t in enumerate(texts)
        )
    ).collect()[0]
    for i, t in enumerate(texts):
        assert rows[f"c{i}"] == _signed(xxh64(t.encode(), 42)), t


def test_xxh64_matches_spark_long_path(spark):
    values = [0, 1, -1, 1234567890123, -(1 << 63), (1 << 63) - 1]
    rows = spark.sql(
        "SELECT " + ", ".join(
            f"xxhash64(CAST({v} AS BIGINT)) AS c{i}"
            for i, v in enumerate(values)
        )
    ).collect()[0]
    for i, v in enumerate(values):
        assert rows[f"c{i}"] == _signed(xxh64(struct.pack("<q", v), 42)), v


# ---------------------------------------------------------------------------
# 3. The fixed-width mix, spelled literally (AbstractLongType.java:137-141)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("v", [0, 1, -1, 42, 1 << 40, -(1 << 63), (1 << 63) - 1])
def test_fixed_width_mix_literal(v):
    prod = (v * 0xC2B2AE3D27D4EB4F) & M64
    rot31 = ((prod << 31) | (prod >> 33)) & M64
    want = (rot31 * 0x9E3779B185EBCA87) & M64
    assert fixed_width_hash(v) == want


def test_checksum_prime_is_java_constant():
    assert CHECKSUM_PRIME64 == 0x9E3779B185EBCA87


# ---------------------------------------------------------------------------
# 4. End-to-end SQL checksum
# ---------------------------------------------------------------------------

def _le(total: int) -> str:
    return struct.pack("<Q", total & M64).hex()


def _got(spark, sql: str) -> str | None:
    v = run_sql(spark, sql).collect()[0][0]
    return None if v is None else bytes(v).hex()


def test_checksum_null_row_is_bare_prime(spark):
    """One null row: state = PRIME64, LE bytes 87caeb85b179379e."""
    got = _got(
        spark, "SELECT checksum(x) v FROM (VALUES (CAST(NULL AS BIGINT))) t(x)"
    )
    assert got == "87caeb85b179379e"
    assert got == _le(CHECKSUM_PRIME64)


def test_checksum_zero_hashes_to_zero(spark):
    """mix(0) = 0, so checksum(0) is eight zero bytes."""
    got = _got(
        spark, "SELECT checksum(x) v FROM (VALUES (CAST(0 AS BIGINT))) t(x)"
    )
    assert got == "0000000000000000"


def test_checksum_empty_is_null(spark):
    assert _got(
        spark, "SELECT checksum(x) v FROM (VALUES (1)) t(x) WHERE x < 0"
    ) is None


@pytest.mark.parametrize(
    "sql,terms",
    [
        ("SELECT checksum(x) v FROM (VALUES (1), (2)) t(x)",
         [("1", "int"), ("2", "int")]),
        ("SELECT checksum(x) v FROM (VALUES ('abc'), "
         "(CAST(NULL AS VARCHAR))) t(x)",
         [("abc", "string"), (None, "string")]),
        ("SELECT checksum(x) v FROM (VALUES (1.5E0), (-0.0E0)) t(x)",
         [("1.5", "double"), ("-0.0", "double")]),
        ("SELECT checksum(x) v FROM (VALUES (9223372036854775807), "
         "(-9223372036854775808)) t(x)",
         [("9223372036854775807", "bigint"),
          ("-9223372036854775808", "bigint")]),
        ("SELECT checksum(x) v FROM (VALUES (DATE '2020-06-01')) t(x)",
         [("2020-06-01", "date")]),
        ("SELECT checksum(x) v FROM (VALUES (DECIMAL '12.34')) t(x)",
         [("12.34", "decimal(4,2)")]),
        ("SELECT checksum(x) v FROM (VALUES (CAST('ab' AS VARBINARY))) t(x)",
         [("6162", "binary")]),
        ("SELECT checksum(x) v FROM (VALUES (true), (false)) t(x)",
         [("true", "boolean"), ("false", "boolean")]),
        ("SELECT checksum(x) v FROM (VALUES "
         "(TIMESTAMP '2020-06-01 12:30:45.123')) t(x)",
         [("2020-06-01 12:30:45.123", "timestamp")]),
    ],
    ids=["ints", "string_null", "double_negzero", "bigint_extremes",
         "date", "short_decimal", "varbinary", "boolean", "timestamp"],
)
def test_checksum_typed_pins(spark, sql, terms):
    want = _le(sum(checksum_term(v, t) for v, t in terms))
    assert _got(spark, sql) == want


def test_checksum_order_independent(spark, sf_dir):
    a = _got(
        spark,
        "SELECT checksum(o_orderkey) v FROM "
        f"parquet.`{sf_dir}/orders.parquet`",
    )
    b = _got(
        spark,
        "SELECT checksum(o_orderkey) v FROM (SELECT o_orderkey FROM "
        f"parquet.`{sf_dir}/orders.parquet` ORDER BY o_orderkey DESC)",
    )
    assert a == b and a is not None


def test_checksum_split_independent(spark):
    """combine() is addition: checksum(A union B) == the checksum of
    all rows regardless of grouping into partial states."""
    whole = _got(
        spark, "SELECT checksum(x) v FROM (VALUES (1), (2), (3), (4)) t(x)"
    )
    unioned = _got(
        spark,
        "SELECT checksum(x) v FROM (SELECT x FROM (VALUES (1), (2)) t(x) "
        "UNION ALL SELECT x FROM (VALUES (3), (4)) u(x))",
    )
    assert whole == unioned


def test_checksum_grouped(spark):
    rows = run_sql(
        spark,
        "SELECT g, checksum(x) v FROM (VALUES (1, 10), (1, CAST(NULL AS "
        "INT)), (2, 20)) t(g, x) GROUP BY g ORDER BY g",
    ).collect()
    want1 = _le(checksum_term("10", "int") + CHECKSUM_PRIME64)
    want2 = _le(checksum_term("20", "int"))
    assert bytes(rows[0].v).hex() == want1
    assert bytes(rows[1].v).hex() == want2
