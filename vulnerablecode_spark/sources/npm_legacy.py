"""nodejs security-wg (legacy npm) advisory importer.

Reference: pipelines/v2_importers/npm_importer.py:40-176 — one JSON per
advisory under vuln/npm/: ``{id, title, overview, module_name, cves,
cvss_vector, cvss_score, vulnerable_versions, patched_versions,
references, created_at}``. ``<=99.999.99999`` means every version and
``<0.0.0`` means no patched version; the node-semver range becomes the
vers constraint set (`` || `` alternatives → vers unions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.functions.text_funcs import build_description
from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_DOC = ("struct<id:bigint, title:string, overview:string, module_name:string,"
        " cves:array<string>, cvss_vector:string, cvss_score:string,"
        " vulnerable_versions:string, patched_versions:string,"
        " references:array<string>, created_at:string>")

NPM_URL = "https://github.com/nodejs/security-wg/blob/main/vuln/npm/"


def _to_vers(range_str) -> "F.Column":
    """node-semver range → vers constraints: `` || `` separates
    alternatives and spaces separate ANDed comparators; vers joins all
    with ``|`` (the vers kernel resolves the union)."""
    cleaned = F.trim(F.regexp_replace(range_str, r"\s*\|\|\s*", "|"))
    return F.regexp_replace(cleaned, r"\s+", "|")


def read_npm_legacy(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_npm_legacy(raw)


def parse_npm_legacy(files: DataFrame) -> DataFrame:
    d = files.filter(~F.col("path").endswith("index.json")).select(
        F.from_json(F.col("value"), _DOC).alias("a")
    ).select("a.*").filter(F.col("id").isNotNull())

    url = F.concat(F.lit(NPM_URL), F.col("id").cast("string"), F.lit(".json"))

    vulnerable = F.when(F.col("vulnerable_versions") == "<=99.999.99999",
                        F.lit("*")).otherwise(F.col("vulnerable_versions"))
    patched = F.when(F.col("patched_versions") == "<0.0.0",
                     F.lit(None)).otherwise(F.col("patched_versions"))
    affected = F.when(
        F.col("module_name").isNotNull(),
        F.array(F.struct(
            F.concat(F.lit("pkg:npm/"), F.col("module_name")).alias("package"),
            F.when(vulnerable.isNotNull() & (F.trim(vulnerable) != ""),
                   F.concat(F.lit("vers:npm/"), _to_vers(vulnerable)))
            .alias("affected_version_range"),
            # first patched alternative's version as the fixed version
            F.when(patched.isNotNull(),
                   F.regexp_extract(patched, r"(\d[\w.+-]*)", 1))
            .alias("fixed_version"),
        )),
    ).otherwise(F.array().cast(f"array<{AFFECTED_PACKAGE.simpleString()}>"))

    sev_system = (
        F.when(F.col("cvss_vector").startswith("CVSS:3.0/"), F.lit("cvssv3"))
        .when(F.col("cvss_vector").startswith("CVSS:2.0/"), F.lit("cvssv2"))
    )
    severities = F.when(
        sev_system.isNotNull(),
        F.array(F.struct(
            sev_system.alias("system"),
            F.coalesce(F.col("cvss_score"), F.lit("")).alias("value"),
            F.col("cvss_vector").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            url.alias("url"),
        )),
    ).otherwise(F.array().cast(f"array<{SEVERITY.simpleString()}>"))

    refs = F.concat(
        F.transform(
            F.coalesce(F.col("references"), F.array().cast("array<string>")),
            lambda r: F.struct(
                F.lit(None).cast("string").alias("reference_id"),
                F.lit("").alias("reference_type"), r.alias("url")),
        ),
        F.array(F.struct(
            F.col("id").cast("string").alias("reference_id"),
            F.lit("").alias("reference_type"), url.alias("url"))),
    ).cast(f"array<{REFERENCE.simpleString()}>")

    return d.select(
        F.concat(F.lit("npm-"), F.col("id").cast("string")).alias("advisory_id"),
        F.coalesce(F.col("cves"), F.array().cast("array<string>")).alias("aliases"),
        build_description(F.col("title"), F.col("overview")).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.to_timestamp(F.col("created_at")).alias("date_published"),
        url.alias("url"),
    )
