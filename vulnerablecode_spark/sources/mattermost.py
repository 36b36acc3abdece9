"""Mattermost security-updates importer.

Reference: pipelines/v2_importers/mattermost_importer.py — a JSON array of
updates: ``{issue_id, cve_id, details, platform, fix_versions, severity}``.
Valid MMSA-/CVE- ids from issue_id plus a valid cve_id form the alias
list; the first becomes the advisory id. The platform maps to a
``pkg:github/mattermost/<repo>`` purl whose fix versions (v-stripped,
"and "-cleaned) are the fixed range; severity rides the cvssv3.1_qr
quality-rating system.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_FEED = ("array<struct<issue_id:string, cve_id:string, details:string,"
         " platform:string, severity:string, fix_versions:array<string>>>")

MM_URL = "https://securityupdates.mattermost.com/security_updates.json"

# mattermost_importer.py MM_REPO platform → repo name
MM_REPO = {"Mobile": "mattermost-mobile", "Desktop": "desktop",
           "Server": "mattermost", "Mattermost Server": "mattermost",
           "Plugin": "mattermost-plugin", "Playbooks": "mattermost-plugin-playbooks"}

_CVE_RE = r"^CVE-\d{4}-\d{4,19}$"


def read_mattermost(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_mattermost(raw)


def parse_mattermost(files: DataFrame) -> DataFrame:
    m = files.select(
        F.explode(F.from_json(F.col("value"), _FEED)).alias("m")
    ).select("m.*")

    issue_ids = F.filter(
        F.transform(F.split(F.coalesce(F.col("issue_id"), F.lit("")), ","),
                    lambda x: F.trim(x)),
        lambda x: x.startswith("MMSA-") | x.startswith("CVE-"),
    )
    cve = F.trim(F.coalesce(F.col("cve_id"), F.lit("")))
    ids = F.when(cve.rlike(_CVE_RE), F.concat(issue_ids, F.array(cve))) \
        .otherwise(issue_ids)
    m = m.withColumn("ids", ids).filter(F.size("ids") > 0)
    advisory_id = F.element_at(F.col("ids"), 1)
    aliases = F.slice(F.col("ids"), 2,
                      F.greatest(F.size("ids") - 1, F.lit(0)))

    repo = F.coalesce(
        *[F.when(F.col("platform") == k, F.lit(v)) for k, v in MM_REPO.items()]
    )
    fixed = F.filter(
        F.transform(
            F.coalesce(F.col("fix_versions"), F.array().cast("array<string>")),
            lambda v: F.trim(F.regexp_replace(
                F.regexp_replace(F.trim(v), "^v", ""), "and ", "")),
        ),
        lambda v: v != "",
    )
    affected = F.when(
        repo.isNotNull() & (F.size(fixed) > 0),
        F.transform(fixed, lambda v: F.struct(
            F.concat(F.lit("pkg:github/mattermost/"), repo).alias("package"),
            F.lit(None).cast("string").alias("affected_version_range"),
            v.alias("fixed_version"),
        )),
    ).otherwise(F.array().cast(f"array<{AFFECTED_PACKAGE.simpleString()}>"))

    severities = F.array(F.struct(
        F.lit("cvssv3.1_qr").alias("system"),
        F.coalesce(F.col("severity"), F.lit("")).alias("value"),
        F.lit("").alias("scoring_elements"),
        F.lit(None).cast("timestamp").alias("published_at"),
        F.lit("https://mattermost.com/security-updates/").alias("url"),
    )).cast(f"array<{SEVERITY.simpleString()}>")

    refs = F.array(F.struct(
        F.lit(None).cast("string").alias("reference_id"),
        F.lit("").alias("reference_type"),
        F.lit("https://mattermost.com/security-updates/").alias("url"),
    )).cast(f"array<{REFERENCE.simpleString()}>")

    return m.select(
        advisory_id.alias("advisory_id"),
        aliases.alias("aliases"),
        F.coalesce(F.col("details"), F.lit("")).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.lit(MM_URL).alias("url"),
    )
