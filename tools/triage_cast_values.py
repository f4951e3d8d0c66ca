"""One-shot triage of the extracted cast value pins against the
engine (run from repo root). Prints every mismatch/raise with the
reference citation so divergences can be fixed or documented."""

from __future__ import annotations

import math
import struct
import sys

sys.path.insert(0, "/root/repo")

from presto_0_235_spark.session import build_session  # noqa: E402
from presto_0_235_spark.sql.frontend import run_sql  # noqa: E402
from tests.cast_value_corpus_data import (  # noqa: E402
    CAST_VALUE_PINS, OP_VALUE_PINS)

PINS = CAST_VALUE_PINS + OP_VALUE_PINS
if "--op-only" in sys.argv:
    PINS = OP_VALUE_PINS

_DTYPE = {
    "bigint": {"bigint"}, "int": {"int"}, "smallint": {"smallint"},
    "tinyint": {"tinyint"}, "boolean": {"boolean"},
    "double": {"double"}, "real": {"float"},
    "varchar": {"string"}, "json": {"string"},
    "varbinary": {"binary"}, "decimal(38,0)": {"decimal(38,0)"},
}


def expected_dtypes(rtype: str) -> set[str]:
    if rtype in _DTYPE:
        return _DTYPE[rtype]
    if rtype.startswith("char("):
        return {"string", rtype, rtype.replace(",", ", ")}
    if rtype.startswith("decimal("):
        p, s = rtype[8:-1].split(",")
        return {f"decimal({p},{s})"}
    raise AssertionError(rtype)


def value_matches(rtype: str, expected, got) -> bool:
    if expected is None or got is None:
        return expected is None and got is None
    if rtype in ("double", "real"):
        if math.isnan(expected):
            return isinstance(got, float) and math.isnan(got)
        pack = "<f" if rtype == "real" else "<d"
        try:
            return struct.pack(pack, expected) == struct.pack(pack, got)
        except (OverflowError, struct.error):
            return False
    if rtype.startswith("decimal("):
        from decimal import Decimal

        s = int(rtype[8:-1].split(",")[1])
        if not isinstance(got, Decimal) or got != Decimal(expected):
            return False
        return s == 0 or -got.as_tuple().exponent == s
    if rtype in ("bigint", "int", "smallint", "tinyint"):
        return isinstance(got, int) and got == expected
    if rtype == "varbinary":
        return isinstance(got, (bytes, bytearray)) and \
            bytes(got) == expected
    return got == expected


def main() -> None:
    spark = build_session()
    bad = []
    for fname, ln, method, expr, rtype, expected in PINS:
        try:
            df = run_sql(spark, f"SELECT {expr} AS v")
            dtype = df.dtypes[0][1]
            got = df.first()[0]
        except Exception as e:  # noqa: BLE001
            bad.append((fname, ln, expr, rtype, expected,
                        "RAISE", str(e).split(chr(10))[0][:160]))
            continue
        ok_t = dtype in expected_dtypes(rtype)
        ok_v = value_matches(rtype, expected, got)
        if not (ok_t and ok_v):
            bad.append((fname, ln, expr, rtype, expected,
                        f"type={dtype} ok_t={ok_t}", repr(got)))
    print(f"\n==== {len(bad)} / {len(PINS)} divergent ====")
    for row in bad:
        print(" | ".join(str(x) for x in row))


if __name__ == "__main__":
    main()
