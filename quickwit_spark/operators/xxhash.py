"""Pure-Python xxHash64 — mirrors Spark's ``xxhash64`` expression.

Split assignment is ``pmod(xxhash64(key), num_splits)`` JVM-side; the
golden oracle needs the identical assignment in Python, so this
implements the public xxHash64 algorithm (Yann Collet, BSD-2) with
Spark's default seed 42. Verified against Spark in tests.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & M
    acc = _rotl(acc, 31)
    return (acc * P1) & M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & M


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """xxHash64 of raw bytes (str → UTF-8), Spark-compatible seed 42.

    Returns the UNSIGNED 64-bit value; Spark's column is the signed
    reinterpretation — use :func:`xxhash64_signed` to match it.
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * P1) + P4) & M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxhash64_signed(data: bytes | str, seed: int = 42) -> int:
    """Signed 64-bit view (== Spark's ``xxhash64`` column value)."""
    h = xxhash64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_split(key: str, num_splits: int) -> int:
    """``pmod(xxhash64(key), num_splits)`` — Spark-identical split
    assignment."""
    return xxhash64_signed(key) % num_splits
