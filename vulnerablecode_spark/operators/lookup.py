"""Bulk purl lookup — the flagship serving query (POST /api/v3/packages,
api_v3.py:253-341; traced in SURVEY.md §3.1).

Spark shape: the request's purl list is a SMALL DataFrame → broadcast
against the packages table → semi-join the affecting bridge (restricted to
latest + fully-unfurled advisories) → group-materialize advisory structs
per package with a per-group top-k cap (max_advisories, api_v3.py:326-330).
One broadcast join + one shuffle on package_pk; the 100 TB path is
identical because the probe side stays tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vulnerablecode_spark.kernel.purl import (PurlError, plain_raw_purl,
                                              raw_purl)


def normalize_request_purls(spark, purls: list[str],
                            ignore_qualifiers_subpath: bool = False) -> DataFrame:
    """Validate/normalize the request purls driver-side (they are request
    payload, not data) — bad purls are rejected like the serializer does
    (api_v3.py:45-70, 276-288). The lookup key is the RAW (unencoded)
    canonical form, the convention stored package_url rows follow
    (sources + materialize_packages concatenate raw segments) — so
    'pkg:npm/@babel/traverse@7' and its percent-encoded spelling both
    normalize to the same key and the equality join matches storage."""
    rows = []
    for p in purls:
        try:
            rows.append((p, plain_raw_purl(p) if ignore_qualifiers_subpath
                         else raw_purl(p)))
        except PurlError:
            continue
    return spark.createDataFrame(rows or [("", "")], "requested string, lookup_purl string") \
        .filter(F.col("requested") != "")


def vulnerable_purls(request: DataFrame, packages: DataFrame,
                     impact_affecting: DataFrame, impacts: DataFrame,
                     advisories: DataFrame) -> DataFrame:
    """Fast path (api_v3.py:290-316): which of the requested purls have ≥1
    affecting impact from a latest + fully-unfurled advisory."""
    eligible = advisories.filter(F.col("is_latest")).select("advisory_pk")
    eligible_impacts = impacts.join(eligible, "advisory_pk", "left_semi").select("impact_pk")
    affected_pkgs = (
        impact_affecting.join(eligible_impacts, "impact_pk", "left_semi")
        .select("package_pk").distinct()
    )
    matched = packages.join(
        F.broadcast(request),
        packages.package_url == request.lookup_purl, "inner",
    )
    return (
        matched.join(affected_pkgs, "package_pk", "left_semi")
        .select(F.col("requested").alias("purl"),
                F.col("package_url")).distinct()
    )


def advisories_for_purls(request: DataFrame, packages: DataFrame,
                         impact_affecting: DataFrame, impact_fixed_by: DataFrame,
                         impacts: DataFrame, advisories: DataFrame,
                         max_advisories: int = 10) -> DataFrame:
    """Details path (get_affected_advisories_bulk, api_v3.py:566-890):
    per requested purl, the affecting advisories with their fixed-by
    purls, capped at max_advisories by (risk desc, advisory_id)."""
    matched = packages.join(
        F.broadcast(request), packages.package_url == request.lookup_purl
    ).select("requested", "package_pk", "package_url")

    risk = (F.col("risk_score").cast("double")
            if "risk_score" in advisories.columns
            else F.lit(None).cast("double"))
    latest = advisories.filter(F.col("is_latest")).select(
        "advisory_pk", "advisory_id", "avid", "summary", "aliases",
        risk.alias("risk_score"),
    )
    # fixed-by purls per impact: ArrayAgg(distinct) (api_v3.py:583-599)
    fixes = (
        impact_fixed_by.join(
            packages.select(F.col("package_pk").alias("fix_pk"),
                            F.col("package_url").alias("fixed_purl")),
            impact_fixed_by.package_pk == F.col("fix_pk"),
        )
        .groupBy("impact_pk")
        .agg(F.array_sort(F.collect_set("fixed_purl")).alias("fixed_by_purls"))
    )
    hits = (
        matched.join(impact_affecting, "package_pk")
        .join(impacts.select("impact_pk", "advisory_pk", "affecting_vers"), "impact_pk")
        .join(latest, "advisory_pk")
        .join(fixes, "impact_pk", "left")
    )
    # one row per (purl, ADVISORY), like the reference endpoint: an
    # advisory reaching the package through several impacts merges its
    # ranges and fixed-by sets instead of consuming several cap slots
    # and duplicating the advisory struct in the payload
    per_adv = hits.groupBy("requested", "advisory_pk").agg(
        F.first("advisory_id").alias("advisory_id"),
        F.first("avid").alias("avid"),
        F.first("summary").alias("summary"),
        F.first("aliases").alias("aliases"),
        F.first("risk_score").alias("risk_score"),
        # nullif(…, ''): an advisory whose every impact has a NULL
        # affecting_vers must merge to NULL, not '' — collect_set drops
        # nulls and concat_ws renders the empty set as '' (ADVICE r5)
        F.nullif(
            F.concat_ws(",", F.array_sort(F.collect_set("affecting_vers"))),
            F.lit("")).alias("affecting_vers"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(
            F.coalesce("fixed_by_purls",
                       F.array().cast("array<string>"))))))
        .alias("fixed_by_purls"),
    )
    w = Window.partitionBy("requested").orderBy(
        F.col("risk_score").desc_nulls_last(), F.col("advisory_id").asc()
    )
    capped = per_adv.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= max_advisories
    )
    return capped.groupBy(F.col("requested").alias("purl")).agg(
        F.count(F.lit(1)).cast("int").alias("advisory_count"),
        F.collect_list(
            F.struct(
                "advisory_id", "avid", "summary", "aliases", "risk_score",
                "affecting_vers",
                F.coalesce("fixed_by_purls", F.array().cast("array<string>"))
                .alias("fixed_by_purls"),
            )
        ).alias("advisories"),
    )


def with_is_vulnerable(packages: DataFrame, impact_affecting: DataFrame,
                       impacts: DataFrame, advisories: DataFrame) -> DataFrame:
    """Annotate every package with is_vulnerable — the correlated-Exists
    annotation (models.py:802-812, 3679-3691) as a left-semi-derived flag."""
    eligible = advisories.filter(F.col("is_latest")).select("advisory_pk")
    vulnerable_pks = (
        impact_affecting
        .join(impacts.select("impact_pk", "advisory_pk"), "impact_pk")
        .join(eligible, "advisory_pk", "left_semi")
        .select("package_pk").distinct()
        .withColumn("is_vulnerable", F.lit(True))
    )
    return packages.join(vulnerable_pks, "package_pk", "left").withColumn(
        "is_vulnerable", F.coalesce("is_vulnerable", F.lit(False))
    )
