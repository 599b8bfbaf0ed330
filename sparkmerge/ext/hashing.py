"""Portable full-avalanche integer hashing (murmur3 32-bit finalizer).

Why not Spark's ``hash()``/``xxhash64``: no DuckDB twin, so oracle-checked
ops couldn't replay it.  Why not the Knuth multiplicative hash: on
sequential keys it is a low-discrepancy sequence — too UNIFORM for
sketches (HLL occupancy, bloom bit dispersion) whose math assumes binomial
collisions.  The finalizer below has full avalanche and is expressed in
both engines with identical integer arithmetic: 32x32 multiplies split
16/16 so every intermediate stays under 2^49 (DuckDB raises on signed-64
overflow; Spark would silently wrap), shifts as exact power-of-two
divisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_C1 = 0x85EBCA6B
_C2 = 0xC2B2AE35
_M32 = 4294967296


def mix32(col: Column) -> Column:
    """murmur3 fmix32 of a non-negative integer column, result in [0, 2^32)."""

    def mulmod32(h: Column, c: int) -> Column:
        hi = F.floor(h / F.lit(65536.0)).cast("long")
        return (((hi * c) % 65536) * 65536 + (h % 65536) * c) % _M32

    def shr_xor(h: Column, div: int) -> Column:
        return h.bitwiseXOR(F.floor(h / F.lit(float(div))).cast("long"))

    h = col.cast("long") % _M32
    h = shr_xor(h, 65536)  # h ^= h >> 16
    h = mulmod32(h, _C1)
    h = shr_xor(h, 8192)  # h ^= h >> 13
    h = mulmod32(h, _C2)
    return shr_xor(h, 65536)


def _mulmod32_sql(h: str, c: int) -> str:
    return (
        f"((((({h} // 65536) * {c}) % 65536) * 65536"
        f" + (({h} % 65536) * {c})) % {_M32})"
    )


def mix32_sql_chain(out: str, src: str, keep: str, expr: str, h_col: str = "h") -> str:
    """DuckDB CTE chain replaying ``mix32`` bit-exactly, ending in a CTE
    named ``out`` with columns ``keep`` + ``h_col``.

    A single nested expression would duplicate the input expression 2x per
    step (32x overall, and squares again when hashes are chained), so each
    step is its own CTE referencing the previous step's COLUMN instead.
    """
    steps = [
        f"xor({h_col}, {h_col} // 65536)",
        _mulmod32_sql(h_col, _C1),
        f"xor({h_col}, {h_col} // 8192)",
        _mulmod32_sql(h_col, _C2),
        f"xor({h_col}, {h_col} // 65536)",
    ]
    parts = [
        f"{out}_0 AS (SELECT {keep}, CAST({expr} AS BIGINT) % {_M32} AS {h_col} FROM {src})"
    ]
    for i, s in enumerate(steps):
        name = out if i == len(steps) - 1 else f"{out}_{i + 1}"
        prev = f"{out}_{i}"
        parts.append(f"{name} AS (SELECT {keep}, {s} AS {h_col} FROM {prev})")
    return ",\n".join(parts)
