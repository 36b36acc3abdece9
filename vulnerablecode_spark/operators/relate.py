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


def add_cvss31_to_cves(severities: DataFrame, aliases: DataFrame,
                       advisories: DataFrame) -> DataFrame:
    """CVSS3.1 backfill for CVEs — the last unmapped reference pipeline
    (pipelines/add_cvss31_to_CVEs.py:33-102, CVEAdvisoryMappingPipeline):
    for each stored CVSSv3 severity whose url is an NVD CVE detail page,
    find the NVD-imported advisories sharing that CVE alias, pull the
    ``cvssv3.1`` entries from their references, and emit the new
    VulnerabilitySeverity rows to upsert (update_or_create semantics →
    distinct on the four-tuple).

    Inputs:
    - ``severities``: (vulnerability_id, scoring_system, url) stored rows;
    - ``aliases``: (advisory_pk, alias) bridge (AdvisoryAlias);
    - ``advisories``: canonical rows with ``created_by`` and nested
      ``references`` carrying per-reference ``severities`` arrays.

    Output: (vulnerability_id, cve_id, scoring_system='cvssv3.1', url,
    value, scoring_elements) — one row per (vulnerability, distinct
    cvss3.1 severity), ready for the severity-table MERGE.

    Spark shape: the reference walks severities in 1000-row pages with a
    per-row Alias.objects.get; here both sides join on the extracted
    cve_id in ONE pass — the severity side is usually the smaller and
    broadcasts under AQE. At 10^9 severities this is a single hash
    shuffle on cve_id.
    """
    nvd_sev = (
        severities.filter(
            F.col("url").startswith("https://nvd.nist.gov/vuln/detail/CVE-")
            & (F.col("scoring_system") == "cvssv3"))
        .select(
            "vulnerability_id",
            F.regexp_extract("url", r"(CVE-\d{4}-\d{4,7})", 1)
            .alias("cve_id"))
        .filter(F.col("cve_id") != "")
        .distinct()
    )
    nvd_advisories = advisories.filter(
        F.col("created_by") == "nvd_importer")
    cve_advisories = (
        aliases.filter(F.col("alias").startswith("CVE-"))
        .join(nvd_advisories.select("advisory_pk", "references"),
              "advisory_pk")
        .select(F.col("alias").alias("cve_id"), "references")
    )
    cvss31 = (
        cve_advisories
        .select("cve_id", F.explode("references").alias("ref"))
        .select("cve_id", F.explode("ref.severities").alias("s"))
        .filter(F.col("s.system") == "cvssv3.1")
        .select("cve_id", F.col("s.value").alias("value"),
                F.col("s.scoring_elements").alias("scoring_elements"))
        .distinct()
    )
    return (
        nvd_sev.join(cvss31, "cve_id")
        .select(
            "vulnerability_id", "cve_id",
            F.lit("cvssv3.1").alias("scoring_system"),
            F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"),
                     F.col("cve_id")).alias("url"),
            "value", "scoring_elements",
        )
        .distinct()  # update_or_create: one row per unique severity tuple
    )


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
