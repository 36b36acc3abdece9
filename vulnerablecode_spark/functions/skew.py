"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join splitting handles most cases at runtime
(session.py enables it); these explicit primitives cover the two shapes
AQE can't fix:

- a single hot GROUP BY key (e.g. one package with millions of advisory
  relations): two-phase salted aggregation;
- a broadcast-too-big dimension with a few hot keys: replicated salt
  join.

Both are deterministic (salt = pmod(hash(payload), n)) so results are
reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key_cols: list[str], salt_on: str,
                 n_salts: int = 16) -> DataFrame:
    """COUNT(*) per key via two-phase aggregation: partial counts per
    (key, salt) then a tiny final combine — the hot key spreads over
    ``n_salts`` reducers instead of one."""
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).alias("_salt")
    partial = (
        df.select(*key_cols, salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").cast("bigint").alias("count")
    )


def salted_join(skewed: DataFrame, dim: DataFrame, key: str,
                n_salts: int = 16) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``key``: each skewed
    row gets a deterministic salt, the (small) dim side is replicated
    across all salts, and the join key becomes (key, salt) — hot keys now
    hash to ``n_salts`` partitions."""
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
                        F.lit(n_salts)))
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return salted.join(replicated, [key, "_salt"]).drop("_salt")
