"""Color functions (reference MAIN/operator/scalar/ColorFunctions.java).

Presto's CLI-visualization family: ``rgb(r,g,b)`` packs a 24-bit
color, ``color('#rgb' | 'red')`` parses CSS-short-hex or the 8 system
colors (system colors encode as -(index+1), ColorFunctions.java:96),
``render(value, color)`` wraps a value in the 256-color ANSI escape
``ESC[38;5;<idx>m`` + reset (ansiColorEscape, :258-262), and
``bar(percent, width [, low, high])`` draws a width-column bar of
U+2588 cells colored by HSV interpolation from low to high
(interpolate(), :236-249; default red->green, :196).

Implementation is the repo's one-spec-two-dialects pattern (see
operators/similarity.sql_lsh_bucket): each function is a SQL-text
generator emitted for BOTH Spark SQL (wrapped in F.expr) and DuckDB,
parameterized only by the dialect's list/str function names. The HSV
endpoints of the gradient are computed ONCE at query-build time in
Python doubles and embedded as literals (gradient endpoints are
constants in every real call); the per-cell lerp + HSV->RGB +
ANSI-index math is plain arithmetic/CASE text valid in both dialects,
so the differential oracle checks the exact output strings.

Divergence from the reference (documented): interpolation runs in
IEEE doubles, not Java floats — an ANSI index can differ from the
Java engine by 1 at a 1/6-sector boundary; the two engines under THIS
gate always agree with each other.
"""

from __future__ import annotations

ESC = "\x1b"  # ANSI escape (embedded literally in generated SQL text)
ANSI_RESET = ESC + "[0m"
BLOCK = "█"

SYSTEM_COLORS = (
    "black", "red", "green", "yellow", "blue", "magenta", "cyan", "white",
)


def rgb_int(red: int, green: int, blue: int) -> int:
    """Build-time twin of rgb() (ColorFunctions.java:108-116)."""
    assert all(0 <= c <= 255 for c in (red, green, blue))
    return (red << 16) | (green << 8) | blue


def _rgb_to_hsv(color: int) -> tuple[float, float, float]:
    """java.awt.Color.RGBtoHSB in doubles (build-time only)."""
    r, g, b = (color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF
    cmax, cmin = max(r, g, b), min(r, g, b)
    v = cmax / 255.0
    s = 0.0 if cmax == 0 else (cmax - cmin) / cmax
    if s == 0.0:
        h = 0.0
    else:
        redc = (cmax - r) / (cmax - cmin)
        greenc = (cmax - g) / (cmax - cmin)
        bluec = (cmax - b) / (cmax - cmin)
        if r == cmax:
            h = bluec - greenc
        elif g == cmax:
            h = 2.0 + redc - bluec
        else:
            h = 4.0 + greenc - redc
        h = h / 6.0
        if h < 0:
            h = h + 1.0
    return h, s, v


# ---------------------------------------------------------------------------
# dialect knobs


class Dialect:
    def __init__(self, transform: str, join: str, slice_: str, str_t: str):
        self.transform = transform
        self.join = join
        self.slice = slice_
        self.str_t = str_t


SPARK = Dialect("transform", "array_join", "slice", "STRING")
DUCK = Dialect("list_transform", "array_to_string", "list_slice", "VARCHAR")


# ---------------------------------------------------------------------------
# SQL-text generators (valid in both dialects unless knobbed)


def sql_rgb(r: str, g: str, b: str) -> str:
    """rgb(r, g, b) -> 24-bit int (bounds are the caller's contract,
    as in the reference's checkCondition)."""
    return f"(({r}) * 65536 + ({g}) * 256 + ({b}))"


def sql_color_named(name: str) -> str:
    """color('<system name>') -> -(index+1) (ColorFunctions.java:96-104).
    Unknown names -> NULL (the reference raises; NULL keeps the
    expression total — callers filter)."""
    whens = " ".join(
        f"WHEN '{n.upper()}' THEN {-(i + 1)}"
        for i, n in enumerate(SYSTEM_COLORS)
    )
    return f"(CASE upper({name}) {whens} ELSE NULL END)"


def sql_color_hex(hex3: str, d: Dialect) -> str:
    """color('#rgb') -> nibble-replicated 24-bit int
    (parseRgb, ColorFunctions.java:278-297: #rgb => #rrggbb)."""
    def nib(i: int) -> str:
        # hex digit -> int, dialect-portable (md5-trick family).
        s = f"substr({hex3}, {i + 2}, 1)"
        if d is SPARK:
            v = f"conv({s}, 16, 10)"
        else:
            v = f"('0x' || {s})::BIGINT"
        return f"(CAST({v} AS BIGINT) * 17)"  # (x<<4)|x == x*17

    return sql_rgb(nib(0), nib(1), nib(2))


def _sql_hsv_to_ansi(h: str, s: str, v: str) -> str:
    """HSBtoRGB (java.awt.Color) + toAnsi (ColorFunctions.java:230-236)
    as one arithmetic/CASE expression: 16 + 36*(r*6/256) + 6*(g*6/256)
    + (b*6/256). s==0 needs no special case: p=q=t=v there."""
    h6 = f"((({h}) - floor({h})) * 6.0)"
    sector = f"CAST(floor({h6}) AS BIGINT)"
    f_ = f"({h6} - floor({h6}))"
    p = f"(({v}) * (1.0 - ({s})))"
    q = f"(({v}) * (1.0 - ({s}) * {f_}))"
    t = f"(({v}) * (1.0 - ({s}) * (1.0 - {f_})))"

    def chan(c0: str, c1: str, c2: str, c3: str, c4: str, c5: str) -> str:
        return (
            f"(CASE {sector} WHEN 0 THEN {c0} WHEN 1 THEN {c1}"
            f" WHEN 2 THEN {c2} WHEN 3 THEN {c3} WHEN 4 THEN {c4}"
            f" ELSE {c5} END)"
        )

    r = chan(v, q, p, p, t, v)
    g = chan(t, v, v, q, p, p)
    b = chan(p, p, t, v, v, q)

    def scale(c: str) -> str:
        # (int)(x*255 + 0.5), then rescale 0-255 -> 0-5 (toAnsi)
        return f"CAST(floor(floor(({c}) * 255.0 + 0.5) * 6.0 / 256.0) AS BIGINT)"

    return f"(16 + 36 * {scale(r)} + 6 * {scale(g)} + {scale(b)})"


def sql_ansi_escape_const(color: int) -> str:
    """Escape prefix for a CONSTANT color (build-time toAnsi)."""
    if color >= 0:
        r, g, b = (color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF
        idx = 16 + (r * 6 // 256) * 36 + (g * 6 // 256) * 6 + (b * 6 // 256)
    else:
        idx = -color - 1
    return f"'{ESC}[38;5;{idx}m'"


def sql_render(value: str, color: int, d: Dialect) -> str:
    """render(value, constant color) (ColorFunctions.java:160-171)."""
    return (
        f"concat({sql_ansi_escape_const(color)}, "
        f"CAST({value} AS {d.str_t}), '{ANSI_RESET}')"
    )


def sql_bar(
    percent: str,
    width: int,
    d: Dialect,
    low: int | None = None,
    high: int | None = None,
) -> str:
    """bar(percent, width, low, high) (ColorFunctions.java:194-228):
    count = clamp(trunc(percent*width)); cell i colored by HSV-lerp
    at i/(width-1); reset; pad with spaces to exactly `width`.

    Gradient endpoints default to red->green and are Python constants
    — their HSV coordinates embed as double literals; the per-cell
    lerp + HSV->RGB + ANSI index is dialect-neutral text."""
    # width=1 would make frac 'i / 0.0' -> NaN HSV math and an
    # undefined ANSI index (the reference divides by (width - 1) the
    # same way, ColorFunctions.java:213 — width 1 is degenerate there
    # too); refuse rather than emit NaN-colored output.
    if width < 2:
        raise ValueError("bar() width must be >= 2")
    low = rgb_int(255, 0, 0) if low is None else low
    high = rgb_int(0, 255, 0) if high is None else high
    h1, s1, v1 = _rgb_to_hsv(low)
    h2, s2, v2 = _rgb_to_hsv(high)

    frac = f"(i / {float(width - 1)!r})"
    h = f"({frac} * ({h2!r} - {h1!r}) + {h1!r})"
    s = f"({frac} * ({s2!r} - {s1!r}) + {s1!r})"
    v = f"({frac} * ({v2!r} - {v1!r}) + {v1!r})"
    cell = (
        f"concat('{ESC}[38;5;', "
        f"CAST({_sql_hsv_to_ansi(h, s, v)} AS {d.str_t}), 'm', '{BLOCK}')"
    )
    # floor, not CAST: DuckDB's double->BIGINT cast ROUNDS while
    # Spark's truncates. floor == the reference's (int) truncation for
    # positive percent; for negative it's more negative, but the
    # clamp-to-0 makes that unobservable.
    count = (
        f"CAST(greatest(0, least({width}, "
        f"CAST(floor(({percent}) * {width}) AS BIGINT))) AS INT)"
    )
    # Full-width cell array sliced to count: slice-of-empty is safe in
    # both dialects (Spark sequence(0,-1) would DESCEND — never built).
    cells = (
        f"{d.join}({d.slice}({d.transform}(sequence(0, {width - 1}), "
        f"i -> {cell}), 1, {count}), '')"
    )
    if d is DUCK:
        cells = cells.replace("sequence(", "generate_series(", 1)
    return (
        f"concat({cells}, '{ANSI_RESET}', "
        f"repeat(' ', {width} - {count}))"
    )
