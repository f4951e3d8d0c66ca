"""SpookyHash V2 — Bob Jenkins' public-domain 128-bit noncryptographic
hash (http://burtleburtle.net/bob/hash/spooky.html), the algorithm
behind the reference's `spooky_hash_v2_32` / `spooky_hash_v2_64`
scalars (VarbinaryFunctions.java:303-321: hash32/hash64 with seed 0,
result emitted big-endian as VARBINARY).

This is an original pure-Python implementation of the published
algorithm (the reference consumes airlift's Java port; neither that
source nor any jar is on this machine). Verification scope:

- SHORT path (input < 192 bytes): pinned byte-for-byte against the
  reference's own test vectors (TestVarbinaryFunctions.java:338-341:
  '' -> 6BF50919 / 232706FC6BF50919, 'hello' -> D382E6CA /
  3768826AD382E6CA) in tests/test_function_edges.py.
- LONG path (>= 192 bytes): spec-derived from the public-domain V2
  reference code (Mix/End rotation schedule); no independent oracle
  exists in this container, so it is covered by determinism +
  32/64 consistency properties only. Documented, not hidden.

Inputs here are small per-row VARBINARY cells; a per-value Python
loop inside an Arrow-batched pandas UDF is the intended use (the
registration lives in sql/frontend._ensure_sql_udfs and
functions/udfs.py).
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFFFFFFFFFF
# sc_const: the golden-ratio-ish arbitrary odd constant from the spec
_SC_CONST = 0xDEADBEEFDEADBEEF
_BLOCK = 96  # sc_blockSize = sc_numVars(12) * 8
_BUF = 192  # sc_bufSize = 2 * sc_blockSize; inputs below it use short()


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (64 - k))) & _MASK


def _short_mix(a: int, b: int, c: int, d: int) -> tuple[int, int, int, int]:
    c = _rot(c, 50)
    c = (c + d) & _MASK
    a ^= c
    d = _rot(d, 52)
    d = (d + a) & _MASK
    b ^= d
    a = _rot(a, 30)
    a = (a + b) & _MASK
    c ^= a
    b = _rot(b, 41)
    b = (b + c) & _MASK
    d ^= b
    c = _rot(c, 54)
    c = (c + d) & _MASK
    a ^= c
    d = _rot(d, 48)
    d = (d + a) & _MASK
    b ^= d
    a = _rot(a, 38)
    a = (a + b) & _MASK
    c ^= a
    b = _rot(b, 37)
    b = (b + c) & _MASK
    d ^= b
    c = _rot(c, 62)
    c = (c + d) & _MASK
    a ^= c
    d = _rot(d, 34)
    d = (d + a) & _MASK
    b ^= d
    a = _rot(a, 5)
    a = (a + b) & _MASK
    c ^= a
    b = _rot(b, 36)
    b = (b + c) & _MASK
    d ^= b
    return a, b, c, d


def _short_end(a: int, b: int, c: int, d: int) -> tuple[int, int, int, int]:
    for k1, k2 in (
        ("d^c", 15),
        ("a^d", 52),
        ("b^a", 26),
        ("c^b", 51),
        ("d^c", 28),
        ("a^d", 9),
        ("b^a", 47),
        ("c^b", 54),
        ("d^c", 32),
        ("a^d", 25),
        ("b^a", 63),
    ):
        if k1 == "d^c":
            d ^= c
            c = _rot(c, k2)
            d = (d + c) & _MASK
        elif k1 == "a^d":
            a ^= d
            d = _rot(d, k2)
            a = (a + d) & _MASK
        elif k1 == "b^a":
            b ^= a
            a = _rot(a, k2)
            b = (b + a) & _MASK
        else:
            c ^= b
            b = _rot(b, k2)
            c = (c + b) & _MASK
    return a, b, c, d


def _short(message: bytes, seed1: int, seed2: int) -> tuple[int, int]:
    """The spec's Short() path for inputs under sc_bufSize bytes."""
    length = len(message)
    remainder = length % 32
    a, b = seed1 & _MASK, seed2 & _MASK
    c = d = _SC_CONST
    pos = 0
    if length > 15:
        for _ in range(length // 32):
            u = struct.unpack_from("<4Q", message, pos)
            c = (c + u[0]) & _MASK
            d = (d + u[1]) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            a = (a + u[2]) & _MASK
            b = (b + u[3]) & _MASK
            pos += 32
        if remainder >= 16:
            u = struct.unpack_from("<2Q", message, pos)
            c = (c + u[0]) & _MASK
            d = (d + u[1]) & _MASK
            a, b, c, d = _short_mix(a, b, c, d)
            pos += 16
            remainder -= 16
    # last 0..15 bytes plus the total length (spec's switch ladder,
    # expressed as little-endian zero-padded loads of the two lanes)
    d = (d + ((length & 0xFF) << 56)) & _MASK
    tail = message[pos:]
    if remainder == 0:
        c = (c + _SC_CONST) & _MASK
        d = (d + _SC_CONST) & _MASK
    else:
        lo = tail[:8]
        hi = tail[8:]
        c = (c + int.from_bytes(lo.ljust(8, b"\0"), "little")) & _MASK
        if hi:
            d = (d + int.from_bytes(hi.ljust(8, b"\0"), "little")) & _MASK
    a, b, c, d = _short_end(a, b, c, d)
    return a, b


def _mix(u: tuple[int, ...], h: list[int]) -> None:
    rot = (11, 32, 43, 31, 17, 28, 39, 57, 55, 54, 22, 46)
    for i in range(12):
        h[i] = (h[i] + u[i]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 10) % 12]
        h[(i + 11) % 12] ^= h[i]
        h[i] = _rot(h[i], rot[i])
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK


def _end_partial(h: list[int]) -> None:
    rot = (44, 15, 34, 21, 38, 33, 10, 13, 38, 53, 42, 54)
    for i in range(12):
        h[(i + 11) % 12] = (h[(i + 11) % 12] + h[(i + 1) % 12]) & _MASK
        h[(i + 2) % 12] ^= h[(i + 11) % 12]
        h[(i + 1) % 12] = _rot(h[(i + 1) % 12], rot[i])


def _end(u: tuple[int, ...], h: list[int]) -> None:
    for i in range(12):
        h[i] = (h[i] + u[i]) & _MASK
    _end_partial(h)
    _end_partial(h)
    _end_partial(h)


def hash128(message: bytes, seed1: int = 0, seed2: int = 0) -> tuple[int, int]:
    """SpookyHash V2 128-bit hash of `message` -> (hash1, hash2)."""
    if len(message) < _BUF:
        return _short(message, seed1, seed2)
    h = [
        seed1 & _MASK,
        seed2 & _MASK,
        _SC_CONST,
        seed1 & _MASK,
        seed2 & _MASK,
        _SC_CONST,
        seed1 & _MASK,
        seed2 & _MASK,
        _SC_CONST,
        seed1 & _MASK,
        seed2 & _MASK,
        _SC_CONST,
    ]
    nblocks = len(message) // _BLOCK
    pos = 0
    for _ in range(nblocks):
        _mix(struct.unpack_from("<12Q", message, pos), h)
        pos += _BLOCK
    remainder = len(message) - pos
    buf = message[pos:].ljust(_BLOCK, b"\0")
    buf = buf[: _BLOCK - 1] + bytes([remainder])
    _end(struct.unpack("<12Q", buf), h)
    return h[0], h[1]


def hash64(message: bytes, seed: int = 0) -> int:
    return hash128(message, seed, seed)[0]


def hash32(message: bytes, seed: int = 0) -> int:
    return hash128(message, seed, seed)[0] & 0xFFFFFFFF


def spooky_hash_v2_32_bytes(message: bytes) -> bytes:
    """Reference scalar spooky_hash_v2_32: 4-byte big-endian VARBINARY
    (VarbinaryFunctions.java:306-310 — setInt(reverseBytes(hash32)),
    i.e. the uint32 emitted BE)."""
    return hash32(message, 0).to_bytes(4, "big")


def spooky_hash_v2_64_bytes(message: bytes) -> bytes:
    """Reference scalar spooky_hash_v2_64: 8-byte big-endian VARBINARY
    (VarbinaryFunctions.java:316-320)."""
    return hash64(message, 0).to_bytes(8, "big")
