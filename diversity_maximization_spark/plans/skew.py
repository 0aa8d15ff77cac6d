"""Skew-handling rewrites (SURVEY.md §4.2 / 100 TB mandate).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. The explicit salted join
here is the belt-and-braces rewrite for the case AQE cannot fix: a
single join key so hot that one task would still process it alone —
the big side scatters each hot key across `n_salt` subkeys, the small
side replicates each row to all subkeys, and the join runs on
(key, salt) with `n_salt`-way parallelism for every key. Semantics are
identical to the plain equi-join (tested in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` with `small` on `key`, salted `n_salt` ways.

    `big` rows get a deterministic pseudo-random salt (hash of the
    full row's key + a per-row uniform via xxhash64 of all columns is
    overkill — a hash of monotonically varying columns suffices; we
    use pmod(xxhash64(all big columns), n_salt) so the scatter is
    even and reproducible). `small` is exploded n_salt x — acceptable
    because the salted side of a skew join is the small one.
    """
    if how not in ("inner", "left", "left_outer", "leftsemi", "left_semi"):
        # right/full would emit unmatched small rows once per salt
        raise ValueError(f"salted_join supports inner/left joins, not {how}")
    salt_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)).cast("int")
    )
    salt_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = salt_big.join(salt_small, [key, "_salt"], how)
    return joined.drop("_salt")
