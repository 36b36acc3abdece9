"""Debian security-tracker importer: nested pkg→CVE→release map → advisories.

Reference: importers/debian.py + v2_importers/debian_importer.py — the
tracker JSON is ``{package: {cve: {description, releases: {release:
{status, urgency, fixed_version, repositories}}}}}``. Dynamic keys mean no
fixed schema, so: read wholetext → ``from_json`` into nested MapTypes →
triple ``explode`` — still fully Catalyst, no Python parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RELEASE = ("struct<status:string,urgency:string,fixed_version:string,"
            "repositories:map<string,string>,nodsa:string>")
_TRACKER = (f"map<string,map<string,struct<scope:string,debianbug:bigint,"
            f"description:string,releases:map<string,{_RELEASE}>>>>")


def read_debian_tracker(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    parsed = raw.select(F.from_json(F.col("value"), _TRACKER).alias("t"))
    pkg = parsed.select(F.explode("t").alias("pkg_name", "cves"))
    cve = pkg.select("pkg_name", F.explode("cves").alias("cve_id", "data"))
    rel = cve.select(
        "pkg_name", "cve_id",
        F.col("data.description").alias("description"),
        F.explode("data.releases").alias("release", "r"),
    )
    # resolved releases carry the fixing version; open ones an open range
    affected = F.struct(
        F.concat(F.lit("pkg:deb/debian/"), F.lower("pkg_name"),
                 F.lit("?distro="), F.col("release")).alias("package"),
        F.when(
            F.col("r.status") == "resolved",
            F.when(F.col("r.fixed_version") != "0",
                   F.concat(F.lit("vers:deb/<"), F.col("r.fixed_version")))
            .otherwise(F.lit("vers:deb/*")),
        ).otherwise(F.lit("vers:deb/*")).alias("affected_version_range"),
        F.when((F.col("r.status") == "resolved") & (F.col("r.fixed_version") != "0"),
               F.col("r.fixed_version")).alias("fixed_version"),
    )
    sev = F.when(
        F.col("r.urgency").isNotNull() & ~F.col("r.urgency").isin("not yet assigned", "unimportant", "end-of-life"),
        F.array(F.struct(
            F.lit("generic_textual").alias("system"),
            F.col("r.urgency").alias("value"),
            F.col("r.urgency").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            F.concat(F.lit("https://security-tracker.debian.org/tracker/"),
                     F.col("cve_id")).alias("url"),
        )),
    ).otherwise(F.array().cast(
        "array<struct<system:string,value:string,scoring_elements:string,"
        "published_at:timestamp,url:string>>"
    ))
    per_release = rel.select(
        F.col("cve_id"), F.col("description"), affected.alias("ap"), sev.alias("sev")
    )
    # one advisory per CVE: collect affected packages across releases
    return per_release.groupBy("cve_id").agg(
        F.first("description", ignorenulls=True).alias("summary_raw"),
        F.array_sort(F.collect_set("ap")).alias("affected_packages"),
        F.array_distinct(F.flatten(F.collect_list("sev"))).alias("severities"),
    ).select(
        F.col("cve_id").alias("advisory_id"),
        F.array(F.col("cve_id")).alias("aliases"),
        F.coalesce(F.col("summary_raw"), F.lit("")).alias("summary"),
        "affected_packages",
        F.array().cast(
            "array<struct<reference_id:string,reference_type:string,url:string>>"
        ).alias("references"),
        "severities",
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.concat(F.lit("https://security-tracker.debian.org/tracker/"),
                 F.col("cve_id")).alias("url"),
    )
