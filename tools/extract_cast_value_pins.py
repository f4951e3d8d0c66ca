"""Mechanically extract the reference's cast VALUE pins.

The r11 extraction took only the assertInvalidFunction rows of the
type/ test suites (tests/test_error_pin_corpus.py); the assertFunction
VALUE rows directly above them — e.g. cast(-17.5E0 as bigint) = -18,
TestDoubleOperators.java:195 — were never captured, which is exactly
what let a literal-fold rounding bug ship validated only by
same-author pins. This tool walks the cast sections (methods whose
name contains 'Cast') of the type/Test*Operators.java and
Test*Casts.java files and emits tests/cast_value_corpus_data.py:
one row per single-line-parseable assertFunction /
assertDecimalFunction call, as

    (file, line, method, expr, rtype, expected)

where rtype is a canonical type tag ('bigint', 'double', 'real',
'varchar', 'char(5)', 'decimal(4,1)', ...) and expected is the Python
value the Java expected-literal denotes (float32 widened for REAL,
Decimal string for decimals, None for null). Rows whose expression is
built by Java string concatenation or whose expected value is not a
literal are skipped and counted — they are few and the error corpus
already carries the assertInvalid* rows.

Run:  python tools/extract_cast_value_pins.py
"""

from __future__ import annotations

import re
import struct
from pathlib import Path

REF = Path("/root/reference/presto-main/src/test/java/"
           "com/facebook/presto/type")
REF_SCALAR = Path("/root/reference/presto-main/src/test/java/"
                  "com/facebook/presto/operator/scalar")
OUT = Path(__file__).resolve().parent.parent / "tests" / \
    "cast_value_corpus_data.py"

FILES = [
    "TestDoubleOperators.java",
    "TestRealOperators.java",
    "TestIntegerOperators.java",
    "TestBigintOperators.java",
    "TestSmallintOperators.java",
    "TestTinyintOperators.java",
    "TestBooleanOperators.java",
    "TestVarcharOperators.java",
    "TestDecimalCasts.java",
    "TestDecimalToDecimalCasts.java",
    "TestCharacterStringCasts.java",
    "TestDecimalOperators.java",
    "TestCharOperators.java",
    "TestMathFunctions.java",  # in operator/scalar — the
    # abs/ceil/floor/round/truncate VALUE sections feed the r13
    # literal math folds (loop-generated mod/sign rows are skipped
    # by construction: their expressions are built in Java loops)
    "TestStringFunctions.java",
    "TestBitwiseFunctions.java",
    "TestUrlFunctions.java",
    "TestConditions.java",
    "AbstractTestRegexpFunctions.java",
    "TestVarbinaryFunctions.java",
    "TestDataSizeFunctions.java",
    "TestJsonFunctions.java",  # r17 breadth extension: the JSON
    # scalar family (is_json_scalar / json_array_length /
    # json_array_contains / json_array_get / json_size /
    # json_format / json_parse) — scalar-typed VALUE rows
    # r17 second breadth extension: the container-type operator
    # suites. Container-typed expecteds are skipped by construction
    # (only the scalar rtype whitelist extracts), which leaves the
    # comparison / cardinality / membership / element-access /
    # cast-to-JSON rows — the scalar surface of the array/map/row
    # type system.
    "TestArrayOperators.java",
    "TestMapOperators.java",
    "TestRowOperators.java",
    "TestIpAddressOperators.java",
    "TestIpPrefixFunctions.java",
]

# files where EVERY test method's literal value rows are in scope
# (r16 breadth extension — string/bitwise/url/conditions families;
# rows land in OP_VALUE_PINS)
_ALL_METHOD_FILES = frozenset({
    "TestStringFunctions.java",
    "TestBitwiseFunctions.java",
    "TestUrlFunctions.java",
    "TestConditions.java",
    "AbstractTestRegexpFunctions.java",
    "TestVarbinaryFunctions.java",
    "TestDataSizeFunctions.java",
    "TestJsonFunctions.java",
    "TestArrayOperators.java",
    "TestMapOperators.java",
    "TestRowOperators.java",
    "TestIpAddressOperators.java",
    "TestIpPrefixFunctions.java",
})

# beyond the cast sections (r15 verdict #2), the comparison and
# arithmetic sections carry the VALUE vectors for the literal
# comparison/arithmetic folds (r15 verdict #3 — those folds shipped
# with same-author pins only)
_OP_METHODS = frozenset({
    "testLiteral", "testTypeConstructor", "testAdd", "testSubtract",
    "testMultiply", "testDivide", "testModulus", "testNegation",
    "testEqual", "testNotEqual", "testLessThan",
    "testLessThanOrEqual", "testGreaterThan",
    "testGreaterThanOrEqual", "testBetween", "testIsDistinctFrom",
    "testAbs", "testCeil", "testFloor", "testRound", "testTruncate",
})

_METHOD = re.compile(r"public void (test\w+)\s*\(")

# methods whose rows are NOT value pins: testFromLiteralParameter
# exercises a test-only fixture function (`vl`), and
# testSplitPartInvalid is an @Test(expectedExceptions) method — its
# assertFunction row is the RAISING input (the error corpus's
# domain)
_EXCLUDE_METHODS = frozenset({
    "testFromLiteralParameter", "testSplitPartInvalid",
})

# individual rows that are NOT value pins: TestArrayOperators:702
# sits inside a try { assertFunction(..) ; fail(..) } — the
# reference EXPECTS the double-subscript access to raise
# TYPE_MISMATCH, so the asserted value row never executes
_EXCLUDE_ROWS = frozenset({
    ("TestArrayOperators.java", 702),
})
_CALL = re.compile(r"^\s*(assertFunction|assertDecimalFunction)\s*\(")

_J_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    "'": "'", '"': '"', "\\": "\\", "0": "\0",
}


def _unescape(s: str) -> str | None:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        i += 1
        e = s[i]
        if e == "u":
            cp = int(s[i + 1:i + 5], 16)
            i += 5
            if 0xD800 <= cp <= 0xDBFF and s[i:i + 2] == "\\u":
                # Java splits supplementary characters into UTF-16
                # surrogate-pair escapes; recombine them (a lone
                # surrogate is not a valid Python string)
                lo = int(s[i + 2:i + 6], 16)
                if 0xDC00 <= lo <= 0xDFFF:
                    cp = 0x10000 + ((cp - 0xD800) << 10) + \
                        (lo - 0xDC00)
                    i += 6
            if 0xD800 <= cp <= 0xDFFF:
                return None  # unpaired surrogate: skip the row
            out.append(chr(cp))
        elif e in _J_ESCAPES:
            out.append(_J_ESCAPES[e])
            i += 1
        else:
            return None
    return "".join(out)


def _split_args(body: str) -> list[str] | None:
    """Split top-level comma-separated args; None when a string
    literal is unterminated or parens unbalance."""
    args, depth, i, start, instr = [], 0, 0, 0, False
    while i < len(body):
        c = body[i]
        if instr:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                instr = False
        elif c == '"':
            instr = True
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(body[start:i].strip())
            start = i + 1
        i += 1
    if instr or depth != 0:
        return None
    args.append(body[start:].strip())
    return args


_STR_LIT = re.compile(r'^"((?:[^"\\]|\\.)*)"$')
_INT_LIT = re.compile(
    r"^(?:\((?:short|byte|int|long)\)\s*)?([+-]?\d+)L?$")
_FLOAT_LIT = re.compile(
    r"^(?:\(double\)\s*)?([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
    r"(f)?[dD]?$")

_TYPE_MAP = {
    "BIGINT": "bigint", "INTEGER": "int", "SMALLINT": "smallint",
    "TINYINT": "tinyint", "BOOLEAN": "boolean", "DOUBLE": "double",
    "REAL": "real", "VARCHAR": "varchar", "JSON": "json",
    "VARBINARY": "varbinary",
    # bare DECIMAL in an expected-type position is the max-precision
    # default (parse_presto_data_size rows)
    "DECIMAL": "decimal(38,0)",
}


def _parse_type(t: str) -> str | None:
    t = t.strip()
    if t in _TYPE_MAP:
        return _TYPE_MAP[t]
    m = re.match(r"^createVarcharType\(\s*(\d+)\s*\)$", t)
    if m:
        return "varchar"
    if t == "createUnboundedVarcharType()":
        return "varchar"
    m = re.match(r"^createCharType\(\s*(\d+)\s*\)$", t)
    if m:
        return f"char({m.group(1)})"
    m = re.match(r"^createDecimalType\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$",
                 t)
    if m:
        return f"decimal({m.group(1)},{m.group(2) or 0})"
    return None


def _f32(x: float) -> float:
    return struct.unpack("<f", struct.pack("<f", x))[0]


# Java integral MIN/MAX constants (rendered decimal when spliced
# into expression text)
_JCONST = {
    "Integer.MAX_VALUE": 2 ** 31 - 1, "Integer.MIN_VALUE": -2 ** 31,
    "Short.MAX_VALUE": 2 ** 15 - 1, "Short.MIN_VALUE": -2 ** 15,
    "Byte.MAX_VALUE": 2 ** 7 - 1, "Byte.MIN_VALUE": -2 ** 7,
    "Long.MAX_VALUE": 2 ** 63 - 1, "Long.MIN_VALUE": -2 ** 63,
}

_NUM_TOK = re.compile(
    r"^([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)([fLdD]?)$")


def _jnum(tok: str):
    """(kind, value) for one Java numeric literal/constant token;
    kind in {'int', 'double', 'float'}."""
    tok = tok.strip()
    if tok in _JCONST:
        return ("int", _JCONST[tok])
    m = _NUM_TOK.match(tok)
    if m is None:
        return None
    body, suf = m.group(1), m.group(2)
    if suf == "f":
        return ("float", _f32(float(body)))
    if suf in ("d", "D") or "." in body or "e" in body or "E" in body:
        return ("double", float(body))
    return ("int", int(body))


def _jint_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _jint_mod(a: int, b: int) -> int:
    return a - _jint_div(a, b) * b


def _wrap(v: int, bits: int) -> int:
    m = 1 << bits
    v &= m - 1
    return v - m if v >= (m >> 1) else v


def _ieee_op(a: float, b: float, op: str) -> float:
    """One Java floating-point op — IEEE 754, so Python float
    arithmetic matches except the raises Python adds on /0 and
    fmod(x, 0), which Java defines as inf/nan."""
    import math

    if op == "%":
        return math.fmod(a, b) if b != 0.0 else float("nan")
    if op == "/" and b == 0.0:
        if a == 0.0 or math.isnan(a):
            return float("nan")
        return math.copysign(1.0, a) * math.copysign(1.0, b) * \
            float("inf")
    return {"+": a + b, "-": a - b, "*": a * b,
            "/": a / b if b != 0.0 else 0.0}[op]


def _eval_const_expr(rtype: str, e: str):
    """Evaluate the constant Java expressions the test sections use
    as expected values — `37.7 + 17.1`, `12.34f / 56.78f`,
    `100000000017L % 37L`, `(byte) (9 * 11)`, `-(-0.0f)`,
    `"foo" + "bar"`, `Integer.MIN_VALUE + 1` — with Java semantics
    (IEEE double / float32 per-op rounding, truncating integral
    division, sign-of-dividend %, two's-complement narrowing casts).
    Returns (ok, value)."""
    e = e.strip()
    wm = re.match(r"^\((byte|short|int|long)\)\s*\((.+)\)$", e)
    wrap_bits = None
    if wm:
        wrap_bits = {"byte": 8, "short": 16, "int": 32,
                     "long": 64}[wm.group(1)]
        e = wm.group(2).strip()
    # string concatenation
    if e.startswith('"'):
        parts = _split_concat(e) or [e]
        out = []
        for p in parts:
            sm = _STR_LIT.match(p)
            if sm is None:
                return False, None
            u = _unescape(sm.group(1))
            if u is None:
                return False, None
            out.append(u)
        return True, "".join(out)
    # unary negation of a parenthesized literal: -(-0.0f)
    um = re.match(r"^-\s*\(\s*(.+?)\s*\)$", e)
    if um and _jnum(um.group(1)) is not None:
        kind, v = _jnum(um.group(1))
        return True, (-v if kind != "float" else _f32(-v))
    # one binary op over two numeric tokens
    bm = re.match(
        r"^(\S+)\s*([+*/%-])\s*(\S+)$", e)
    if bm is None:
        return False, None
    la, lb = _jnum(bm.group(1)), _jnum(bm.group(3))
    if la is None or lb is None:
        return False, None
    op = bm.group(2)
    (ka, va), (kb, vb) = la, lb
    if "float" in (ka, kb) or "double" in (ka, kb):
        v = _ieee_op(float(va), float(vb), op)
        if "double" in (ka, kb):
            return True, v
        return True, _f32(v)
    f = {"+": lambda a, b: a + b, "-": lambda a, b: a - b,
         "*": lambda a, b: a * b, "/": _jint_div, "%": _jint_mod}[op]
    try:
        v = f(va, vb)
    except ZeroDivisionError:
        return False, None
    if wrap_bits:
        v = _wrap(v, wrap_bits)
    return True, v


def _parse_expected(rtype: str, e: str):
    """Returns (ok, value)."""
    e = e.strip()
    if e == "null":
        return True, None
    if rtype in ("bigint", "int", "smallint", "tinyint"):
        m = _INT_LIT.match(e)
        if m:
            return True, int(m.group(1))
        if e in _JCONST:
            return True, _JCONST[e]
        ok, v = _eval_const_expr(rtype, e)
        return (True, v) if ok and isinstance(v, int) else (False,
                                                            None)
    if rtype == "boolean":
        if e in ("true", "false"):
            return True, e == "true"
        return False, None
    if rtype in ("double", "real"):
        if e.endswith(("NaN",)) and e in ("Double.NaN", "Float.NaN"):
            return True, float("nan")
        if e in ("Double.POSITIVE_INFINITY", "Float.POSITIVE_INFINITY"):
            return True, float("inf")
        if e in ("Double.NEGATIVE_INFINITY", "Float.NEGATIVE_INFINITY"):
            return True, float("-inf")
        if e in ("Double.MAX_VALUE", "-Double.MAX_VALUE"):
            v = 1.7976931348623157e308
            return True, -v if e.startswith("-") else v
        m = _FLOAT_LIT.match(e)
        if not m:
            ok, v = _eval_const_expr(rtype, e)
            if ok and isinstance(v, (int, float)):
                v = float(v)
                return True, _f32(v) if rtype == "real" else v
            return False, None
        v = float(m.group(1))
        if m.group(2):  # 'f' suffix: the float32 value (maybe widened)
            v = _f32(v)
        elif rtype == "real":
            v = _f32(v)
        return True, v
    if rtype.startswith("decimal("):
        # assertFunction rows spell decimals as
        # SqlDecimal.of("unscaled", p, s); the row's declared type
        # (arg 2) governs, the value is unscaled * 10^-s
        m1 = re.match(r'^SqlDecimal\.of\(\s*"(-?[\d.]+)"\s*\)$', e)
        if m1:
            return True, m1.group(1)
        m = re.match(
            r'^SqlDecimal\.of\(\s*"(-?\d+)"\s*,\s*\d+\s*,\s*(\d+)'
            r"\s*\)$", e)
        if m is None:
            # assertFunction rows can also spell the expected with
            # the assertDecimalFunction helpers
            parsed = _parse_decimal_expected(e)
            if parsed is not None:
                return True, parsed[1]
            return False, None
        unscaled, sc = m.group(1), int(m.group(2))
        sign = "-" if unscaled.startswith("-") else ""
        digits = unscaled.lstrip("-")
        if sc == 0:
            return True, sign + digits
        digits = digits.rjust(sc + 1, "0")
        return True, sign + digits[:-sc] + "." + digits[-sc:]
    if rtype == "varbinary":
        m = re.match(r"^sqlVarbinary(Hex)?\((.+)\)$", e)
        if m is None:
            return False, None
        parts = _split_concat(m.group(2)) or [m.group(2)]
        out = []
        for pc in parts:
            sm = _STR_LIT.match(pc.strip())
            if sm is None:
                return False, None
            u = _unescape(sm.group(1))
            if u is None:
                return False, None
            out.append(u)
        joined = "".join(out)
        try:
            return True, (bytes.fromhex(joined) if m.group(1)
                          else joined.encode("utf-8"))
        except ValueError:
            return False, None
    if rtype == "varchar" or rtype == "json" or rtype.startswith("char("):
        m = _STR_LIT.match(e)
        if not m:
            ok, v = _eval_const_expr(rtype, e)
            return (True, v) if ok and isinstance(v, str) else (
                False, None)
        u = _unescape(m.group(1))
        return (True, u) if u is not None else (False, None)
    return False, None


def _parse_decimal_expected(e: str):
    """decimal("01.0") / maxPrecisionDecimal(2) -> (type, value-str)."""
    m = re.match(r'^decimal\(\s*"(-?)([\d.]*)"\s*\)$', e.strip())
    if m:
        sign, digits = m.group(1), m.group(2)
        p = sum(c.isdigit() for c in digits)
        s = len(digits.split(".")[1]) if "." in digits else 0
        return f"decimal({p},{s})", sign + digits
    m = re.match(r"^maxPrecisionDecimal\(\s*(-?\d+)\s*\)$", e.strip())
    if m:
        return "decimal(38,0)", m.group(1)
    return None


# the constant double expressions spliced into cast texts
# (TestDoubleOperators.java:196-203); values computed here, rendered
# the way Java's Double.toString does for the E-notation range
import math

_CONSTS = {
    "0x1.0p63": 2.0 ** 63,
    "Math.nextDown(0x1.0p63)": math.nextafter(2.0 ** 63, 0.0),
    "Math.nextUp(0x1.0p63)": math.nextafter(2.0 ** 63, math.inf),
    "-0x1.0p63": -(2.0 ** 63),
    "Math.nextDown(-0x1.0p63)": math.nextafter(-(2.0 ** 63),
                                               -math.inf),
    "Math.nextUp(-0x1.0p63)": math.nextafter(-(2.0 ** 63), 0.0),
    # TestMathFunctions.java:44
    "GREATEST_DOUBLE_LESS_THAN_HALF": float.fromhex("0x1.fffffffffffffp-2"),
    "0x1p-1": 0.5,
    # TestMathFunctions.java:240-241 (locals spliced as text)
    "maxDouble": 1.7976931348623157e308,
    "minDouble": -1.7976931348623157e308,
}


def _java_double_str(v: float) -> str:
    # Java Double.toString for |v| >= 1e7: shortest decimal in
    # d.dddE+n form — Python repr gives the same digits, only the
    # exponent marker differs
    return repr(v).replace("e+", "E").replace("e-", "E-")


def _resolve_concat(arg: str) -> str | None:
    parts = _split_concat(arg)
    if parts is None:
        return None
    out = []
    for p in parts:
        m = _STR_LIT.match(p)
        if m:
            out.append(m.group(1))
        elif p in _CONSTS:
            out.append(_java_double_str(_CONSTS[p]))
        elif p in _JCONST:
            out.append(str(_JCONST[p]))
        else:
            return None
    return "".join(out)


def _split_concat(arg: str) -> list[str] | None:
    parts, depth, instr, start = [], 0, False, 0
    i = 0
    while i < len(arg):
        c = arg[i]
        if instr:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                instr = False
        elif c == '"':
            instr = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "+" and depth == 0:
            parts.append(arg[start:i].strip())
            start = i + 1
        i += 1
    parts.append(arg[start:].strip())
    # a leading '-0x1.0p63' splits as ['', '-0x...']? no: '-' is not
    # '+'; but '" + -0x1.0p63 + "' splits to ['"..."', '-0x1.0p63',
    # '"..."'] correctly since only '+' at depth 0 splits
    return [p for p in parts if p] if len(parts) > 1 else None


def _resolve_const(e: str) -> str | None:
    """(long) <const expr> -> decimal integer string."""
    m = re.match(r"^\(long\)\s*(.+)$", e.strip())
    if m and m.group(1).strip() in _CONSTS:
        return str(int(_CONSTS[m.group(1).strip()]))
    return None


def _pyrepr(v) -> str:
    """repr that survives re-import (repr(float('nan')) is the bare
    name nan)."""
    if isinstance(v, float):
        import math

        if math.isnan(v):
            return "float('nan')"
        if math.isinf(v):
            return f"float('{'-' if v < 0 else ''}inf')"
    return repr(v)


def main() -> None:
    rows = []
    op_rows = []
    skipped = []
    for fname in FILES:
        path = REF / fname
        if not path.exists():
            path = REF_SCALAR / fname
        lines = path.read_text().splitlines()
        method = None
        i = 0
        while i < len(lines):
            line = lines[i]
            mm = _METHOD.search(line)
            if mm:
                method = mm.group(1)
                i += 1
                continue
            cm = _CALL.match(line)
            in_scope = method and method not in _EXCLUDE_METHODS \
                and (fname in _ALL_METHOD_FILES
                     or "Cast" in method
                     or method in _OP_METHODS)
            if not (cm and in_scope) \
                    or (fname, i + 1) in _EXCLUDE_ROWS:
                i += 1
                continue
            start = i + 1  # 1-based
            stmt = line.strip()
            while not stmt.rstrip().endswith(";") and i + 1 < len(lines):
                i += 1
                stmt += " " + lines[i].strip()
            i += 1
            kind = cm.group(1)
            body = stmt[stmt.index("(") + 1:stmt.rstrip().rstrip(";")
                        .rindex(")")]
            args = _split_args(body)
            if args is None:
                skipped.append((fname, start, "unsplittable"))
                continue
            em = _STR_LIT.match(args[0])
            if em is None:
                # Java string concatenation: the only non-literal
                # expressions in the cast sections splice a constant
                # double (0x1.0p63 boundary probes,
                # TestDoubleOperators.java:196-203) into the text via
                # Double.toString — resolve those; skip anything else
                resolved = _resolve_concat(args[0])
                if resolved is None:
                    skipped.append((fname, start, "expr not a literal"))
                    continue
                args[0] = f'"{resolved}"'
                em = _STR_LIT.match(args[0])
                if len(args) == 3:
                    ev = _resolve_const(args[2])
                    if ev is not None:
                        args[2] = ev
            expr = _unescape(em.group(1))
            if expr is None:
                skipped.append((fname, start, "expr escape"))
                continue
            if kind == "assertDecimalFunction":
                if len(args) != 2:
                    skipped.append((fname, start, "arity"))
                    continue
                parsed = _parse_decimal_expected(args[1])
                if parsed is None:
                    skipped.append((fname, start, "decimal expected"))
                    continue
                rtype, val = parsed
            else:
                if len(args) != 3:
                    skipped.append((fname, start, "arity"))
                    continue
                rtype = _parse_type(args[1])
                if rtype is None:
                    skipped.append((fname, start, f"type {args[1]}"))
                    continue
                ok, val = _parse_expected(rtype, args[2])
                if not ok:
                    skipped.append((fname, start,
                                    f"expected {args[2][:40]}"))
                    continue
            target = rows if ("Cast" in method
                              and fname not in _ALL_METHOD_FILES) \
                else op_rows
            target.append((fname, start, method, expr, rtype, val))

    with OUT.open("w") as f:
        f.write('"""GENERATED by tools/extract_cast_value_pins.py — '
                "do not edit.\n\nReference cast VALUE pins: every "
                "assertFunction/assertDecimalFunction\nrow in the "
                "cast sections of presto-main/src/test/java/com/"
                "facebook/\npresto/type/ (file:line cited per row). "
                f"{len(rows)} rows extracted,\n{len(skipped)} "
                'skipped (non-literal exprs / unparseable expecteds).\n'
                '"""\n\n')
        f.write("CAST_VALUE_PINS = [\n")
        for fname, ln, method, expr, rtype, val in rows:
            f.write(f"    ({fname!r}, {ln}, {method!r},\n"
                    f"     {expr!r},\n"
                    f"     {rtype!r}, {_pyrepr(val)}),\n")
        f.write("]\n\n# comparison / arithmetic / literal sections "
                "(r15 verdict #3)\nOP_VALUE_PINS = [\n")
        for fname, ln, method, expr, rtype, val in op_rows:
            f.write(f"    ({fname!r}, {ln}, {method!r},\n"
                    f"     {expr!r},\n"
                    f"     {rtype!r}, {_pyrepr(val)}),\n")
        f.write("]\n\nSKIPPED = [\n")
        for fname, ln, why in skipped:
            f.write(f"    ({fname!r}, {ln}, {why!r}),\n")
        f.write("]\n")
    print(f"wrote {len(rows)} cast + {len(op_rows)} op rows, "
          f"{len(skipped)} skipped -> {OUT}")
    from collections import Counter
    print(Counter(f for f, _, _, _, _, _ in rows + op_rows))
    print(Counter(w.split()[0] for _, _, w in skipped))


if __name__ == "__main__":
    main()
