"""Pure-Python XXH64 — a Spark-free twin of ``F.xxhash64``.

Implements the public xxHash XXH64 algorithm (Yann Collet,
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) so oracle
code that runs with no JVM can reproduce Spark's ``xxhash64`` exactly:
Spark hashes a string column as XXH64 over its UTF-8 bytes with seed 42
(optionally a caller seed), returning the result as a SIGNED int64.

This gives the production-mode (xxhash64-shingled) dedup entries a real
cross-implementation oracle: the engine evaluates the JVM intrinsic, the
oracle evaluates this module, and the two agree only if both implement the
spec — the same independence argument as the poly-hash oracle, minus the
portability compromise.  Verified against Spark in
tests/test_functions.py::test_pure_python_xxh64_matches_spark.

Performance note: this is ORACLE-side code (pure Python, per-string loop).
The engine hot path stays on the JVM intrinsic.
"""

from __future__ import annotations

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of raw bytes → SIGNED int64, matching Spark's column result.
    Spark's default seed is 42 (org.apache.spark.sql.catalyst.expressions
    .XxHash64 — public source)."""
    seed &= _M64
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        acc = _merge_round(acc, v1)
        acc = _merge_round(acc, v2)
        acc = _merge_round(acc, v3)
        acc = _merge_round(acc, v4)
    else:
        acc = (seed + _P5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        acc ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _M64
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        acc ^= (data[pos] * _P5) & _M64
        acc = (_rotl(acc, 11) * _P1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P3) & _M64
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def xxh64_str(s: str, seed: int = 42) -> int:
    """Spark ``F.xxhash64(string_col)`` twin: XXH64 over UTF-8 bytes."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark ``F.xxhash64(long_col)`` twin: XXH64 over the 8-byte
    little-endian two's-complement representation."""
    return xxh64((v & _M64).to_bytes(8, "little"), seed)
