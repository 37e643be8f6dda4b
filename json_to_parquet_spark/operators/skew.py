"""Skew mitigation: deterministic salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime; manual salting remains the tool
when one join key dominates so heavily that even split partitions bottleneck
(the classic null-key / celebrity-key shape at 100 TB).

Mechanics: the small side is replicated SALTS times (salt 0..S-1); the big
side gets a DETERMINISTIC salt — hash of a distinguishing column mod S, so
reruns and retries place rows identically (no rand(): nondeterministic
salting breaks task retry semantics and any differential check). The join
key becomes (key, salt): the hot key's rows spread across S partitions
instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 8,
    spread_by: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on column ``on`` with an S-way salted key.

    ``spread_by``: column whose hash spreads the big side across salts
    (defaults to the whole-row spread via all columns — pass the table's
    unique id for cheaper hashing). Result is identical to the plain join.
    """
    if spread_by is None:
        spread = F.xxhash64(*[F.col(c) for c in big.columns])
    else:
        spread = F.xxhash64(F.col(spread_by) if isinstance(spread_by, str) else spread_by)
    big_s = big.withColumn("__salt", F.pmod(spread, F.lit(salts)).cast("int"))
    # Replicate the small side via explode (a Generate — row-local, no
    # join, no broadcast) rather than a crossJoin against a salt table.
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(salts)]))
    )
    return big_s.join(small_s, on=[on, "__salt"], how=how).drop("__salt")
