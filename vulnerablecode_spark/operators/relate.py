"""Severity relation: attach scoring advisories (EPSS/SUSE sweeps) to real
advisories by advisory_id OR alias.

Reference: relate_severities.py:62-100 — a two-key union join
(SURVEY.md §2.3): match on advisory_id, match on shared alias, union,
dedupe. Each leg is an equi-join; the scoring side is usually the smaller
and broadcasts under AQE."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relate_severities(advisories: DataFrame,
                      severity_advisories: DataFrame) -> DataFrame:
    """Returns (advisory_pk, severity) rows: severities of the related
    scoring advisories attached to real advisories."""
    sev = severity_advisories.select(
        F.col("advisory_id").alias("sev_advisory_id"),
        F.col("aliases").alias("sev_aliases"),
        F.explode("severities").alias("severity"),
    )
    # leg 1: advisory_id equality
    by_id = advisories.select("advisory_pk", "advisory_id").join(
        sev, F.col("advisory_id") == F.col("sev_advisory_id")
    ).select("advisory_pk", "severity")
    # leg 2: shared alias
    adv_alias = advisories.select("advisory_pk", F.explode("aliases").alias("alias"))
    sev_alias = sev.select(
        F.explode("sev_aliases").alias("alias"), "severity"
    )
    by_alias = adv_alias.join(sev_alias, "alias").select("advisory_pk", "severity")
    return by_id.unionByName(by_alias).distinct()


def attach_related_severities(advisories: DataFrame,
                              related: DataFrame) -> DataFrame:
    """Fold related severities back into the nested severities column
    (array union per advisory)."""
    extra = related.groupBy("advisory_pk").agg(
        F.collect_set("severity").alias("_extra")
    )
    return (
        advisories.join(extra, "advisory_pk", "left")
        .withColumn(
            "severities",
            F.array_distinct(
                F.concat(
                    F.coalesce(F.col("severities"),
                               F.array().cast("array<struct<system:string,value:string,scoring_elements:string,published_at:timestamp,url:string>>")),
                    F.coalesce(F.col("_extra"),
                               F.array().cast("array<struct<system:string,value:string,scoring_elements:string,published_at:timestamp,url:string>>")),
                )
            ),
        )
        .drop("_extra")
    )
