"""AOSP (quarkslab aosp_dataset) fix-commit importer.

Reference: pipelines/v2_importers/aosp_importer.py:55-126 — one JSON per
CVE file: ``{cveId, vulnerabilityType, dateReported, severity, fixes:
[{patchUrl, commitId}]}``; comma-separated cveId fans out to one advisory
per id; each fix commit classifies into a commit reference (AOSP
googlesource hosts are not purl-mappable VCS types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_DOC = ("struct<cveId:string, vulnerabilityType:string, dateReported:string,"
        " severity:string, fixes:array<struct<patchUrl:string, commitId:string>>>")

BASE_URL = ("https://raw.githubusercontent.com/quarkslab/aosp_dataset/"
            "refs/heads/master/cves/")


def read_aosp(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true").load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_aosp(raw)


def parse_aosp(files: DataFrame) -> DataFrame:
    d = files.select(F.from_json(F.col("value"), _DOC).alias("a"), "path")
    d = d.select(
        "a.*",
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
    ).filter(F.col("cveId").isNotNull())
    d = d.select(
        "*",
        F.explode(F.filter(
            F.transform(F.split(F.col("cveId"), ","), F.trim),
            lambda x: x != "")).alias("vuln_id"),
    )

    refs = F.filter(
        F.transform(
            F.coalesce(F.col("fixes"), F.expr("array()").cast(
                "array<struct<patchUrl:string,commitId:string>>")),
            lambda fx: F.struct(
                fx["commitId"].alias("reference_id"),
                F.lit("commit").alias("reference_type"),
                fx["patchUrl"].alias("url"),
            ),
        ),
        lambda r: r["url"].isNotNull() | r["reference_id"].isNotNull(),
    ).cast(f"array<{REFERENCE.simpleString()}>")

    severities = F.when(
        F.col("severity").isNotNull(),
        F.array(F.struct(
            F.lit("generic_textual").alias("system"),
            F.col("severity").alias("value"),
            F.lit("").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            F.lit(None).cast("string").alias("url"),
        )),
    ).otherwise(F.array().cast(f"array<{SEVERITY.simpleString()}>"))

    return d.select(
        F.col("vuln_id").alias("advisory_id"),
        F.array().cast("array<string>").alias("aliases"),
        F.coalesce(F.col("vulnerabilityType"), F.lit("")).alias("summary"),
        F.array().cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")
        .alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.to_timestamp(F.col("dateReported")).alias("date_published"),
        F.concat(F.lit(BASE_URL), F.col("fname")).alias("url"),
    )
