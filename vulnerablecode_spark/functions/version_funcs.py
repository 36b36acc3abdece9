"""Version-semantics UDFs + the rank-encoding job.

The ONE place ecosystem version ordering touches Python. Strategy
(SURVEY.md §2.11.1): rank-encode versions ONCE per (type, namespace, name)
group with ``version_rank`` — after that every join/window in the engine
compares integers, never strings. Mirrors
compute_package_version_rank.py:33-94 and the ``version_rank`` column's
stated purpose (models.py:893-898).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from vulnerablecode_spark.kernel import vers as _vers
from vulnerablecode_spark.kernel import versions as _versions


@pandas_udf("boolean")
def version_in_range(versions: pd.Series, ranges: pd.Series) -> pd.Series:
    """vers containment test (unfurl join predicate,
    unfurl_version_range.py:129-162). Parsed ranges are memoized per batch —
    ranges repeat across the exploded (version × range) pairs."""
    cache: dict[str, object] = {}

    def check(version, rng):
        if not version or not rng:
            return None
        parsed = cache.get(rng)
        if parsed is None:
            try:
                parsed = cache[rng] = _vers.parse_vers(rng)
            except _vers.VersError:
                cache[rng] = False
                return None
        if parsed is False:
            return None
        try:
            return _vers.contains(parsed, version)
        except Exception:
            return None

    return pd.Series([check(v, r) for v, r in zip(versions, ranges)])


def rank_versions(df: DataFrame, group_cols: tuple[str, ...] = ("type", "namespace", "name"),
                  version_col: str = "version", scheme_col: str = "type",
                  out_col: str = "version_rank") -> DataFrame:
    """Dense-rank versions 1..N within each package group under the
    ecosystem's ordering (compute_package_version_rank.py:33-94).

    Implemented as ``applyInPandas`` per group: groups are small (versions
    of one package), so the sort is in-memory per group while groups
    distribute across the cluster — the same shape at 100 TB.
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(df.sparkSession)
    schema = StructType(list(df.schema.fields) + [StructField(out_col, IntegerType())])
    gcols = list(group_cols)

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        scheme = str(pdf[scheme_col].iloc[0]) if scheme_col in pdf else "generic"
        keys = pdf[version_col].map(lambda v: _versions.sort_key(v or "", scheme))
        order = sorted(range(len(pdf)), key=lambda i: keys.iloc[i])
        ranks = [0] * len(pdf)
        rank = 0
        prev_key = None
        for i in order:
            if prev_key is None or keys.iloc[i] != prev_key:
                rank += 1  # DENSE rank: ties share, no gaps (the
                # documented 1..N contract rank+1 adjacency joins rely on)
                prev_key = keys.iloc[i]
            ranks[i] = rank
        out = pdf.copy()
        out[out_col] = pd.array(ranks, dtype="int32")
        return out

    return df.groupBy(*gcols).applyInPandas(rank_group, schema)


@pandas_udf("integer")
def version_compare(left: pd.Series, right: pd.Series, scheme: pd.Series) -> pd.Series:
    """Three-way ecosystem-aware compare (models.py:1021-1028)."""
    return pd.Series([
        None if a is None or b is None else _versions.compare(a, b, s or "generic")
        for a, b, s in zip(left, right, scheme)
    ], dtype="Int32")


def resolve_version_range(versions_df: DataFrame, ranges_df: DataFrame,
                          on: str = "base_purl") -> DataFrame:
    """Unfurl: concrete versions × vers ranges → in-range rows
    (utils.py:353-391 + unfurl_version_range.py:129-162).

    The join is an equi-join on the package key (bounded fan-out per
    group: versions-of-one-package × ranges-for-that-package), THEN the
    containment UDF filters — never a cross join.
    """
    from vulnerablecode_spark import ensure_shipped

    ensure_shipped(versions_df.sparkSession)
    joined = versions_df.join(ranges_df, on)
    return joined.withColumn(
        "in_range",
        version_in_range(F.col("version"), F.col("affecting_vers")),
    ).filter(F.col("in_range")).drop("in_range")
