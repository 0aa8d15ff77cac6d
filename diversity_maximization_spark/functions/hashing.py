"""Portable cross-engine hash family (SURVEY.md §5.2).

Spark's xxhash64 has no DuckDB twin, so every operator whose oracle
must replay a hash decision uses the first 32 bits of md5 instead:
``conv(substr(md5(x), 1, 8), 16, 10)`` in Spark equals the nibble-sum
expression below in DuckDB — an exact BIGINT in [0, 2^32). Map it
through [0, 1) (divide by 2^32) before bucketing with floor(u * p);
md5 bits are uniform, so ``% p`` on the integer is also fine (unlike
the low bits of a multiplicative mix).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

U32 = 2**32


def md5_u32_spark(col: Column) -> Column:
    """First 32 bits of md5 of the (string) column as BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_u32_duck(arg: str) -> str:
    """DuckDB BIGINT expression identical to md5_u32_spark."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({arg}), {k}, 1)) - 1)"
            f" * {16 ** (8 - k)}"
            for k in range(1, 9)
        )
        + ")"
    )


def md5_nibble_spark(col: Column, pos: int) -> Column:
    """Hex nibble ``pos`` (1-based) of md5 as an INT in [0, 16)."""
    return F.conv(F.substring(F.md5(col), pos, 1), 16, 10).cast("int")


def md5_nibble_duck(arg: str, pos: int) -> str:
    return f"(strpos('0123456789abcdef', substr(md5({arg}), {pos}, 1)) - 1)"
