"""curl.se advisory importer (vuln.json, OSV-flavored).

Reference: pipelines/v2_importers/curl_importer.py:29-157 — one JSON array;
entries without a leading CVE alias are skipped; the affected package is
always ``pkg:generic/curl.se/curl``; the affected range enumerates
``affected[0].versions`` and the fixed version is the second range event;
severity is the ``database_specific.severity`` label on the cvssv3.1
system; the CWE comes from ``database_specific.CWE.id``.

Spark shape: one ``from_json`` + pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.functions.text_funcs import cwe_number
from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_ENTRY = """array<struct<
  id: string,
  aliases: array<string>,
  summary: string,
  published: string,
  database_specific: struct<
    package: string, URL: string, www: string, issue: string,
    severity: string, CWE: struct<id:string, desc:string>
  >,
  affected: array<struct<
    ranges: array<struct<type:string, events:array<struct<introduced:string, fixed:string>>>>,
    versions: array<string>
  >>
>>"""


def read_curl(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_curl(raw)


def parse_curl(files: DataFrame) -> DataFrame:
    e = files.select(
        F.explode(F.from_json(F.col("value"), _ENTRY)).alias("e")
    ).select("e.*")

    # entries whose first alias is not a CVE are skipped (curl_importer.py:55-61)
    e = e.filter(
        (F.size(F.coalesce(F.col("aliases"), F.array().cast("array<string>"))) > 0)
        & F.try_element_at(F.col("aliases"), F.lit(1)).startswith("CVE")
    )

    first_affected = F.try_element_at(F.col("affected"), F.lit(1))
    first_range = F.try_element_at(first_affected["ranges"], F.lit(1))
    fixed = F.try_element_at(first_range["events"], F.lit(2))["fixed"]
    versions = F.coalesce(first_affected["versions"],
                          F.array().cast("array<string>"))
    affected = F.array(F.struct(
        F.lit("pkg:generic/curl.se/curl").alias("package"),
        F.when(F.size(versions) > 0,
               F.concat(F.lit("vers:generic/"), F.array_join(versions, "|")))
        .alias("affected_version_range"),
        F.when(first_range["type"] == "SEMVER", fixed).alias("fixed_version"),
    )).cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")

    www = F.col("database_specific.www")
    refs = F.filter(
        F.array(
            F.struct(F.lit(None).cast("string").alias("reference_id"),
                     F.lit("").alias("reference_type"), www.alias("url")),
            F.struct(F.lit(None).cast("string").alias("reference_id"),
                     F.lit("").alias("reference_type"),
                     F.col("database_specific.issue").alias("url")),
        ),
        lambda r: r["url"].isNotNull(),
    ).cast(f"array<{REFERENCE.simpleString()}>")

    severities = F.array(F.struct(
        F.lit("cvssv3.1").alias("system"),
        F.coalesce(F.col("database_specific.severity"), F.lit("")).alias("value"),
        F.lit("").alias("scoring_elements"),
        F.lit(None).cast("timestamp").alias("published_at"),
        www.alias("url"),
    )).cast(f"array<{SEVERITY.simpleString()}>")

    weaknesses = F.when(
        cwe_number(F.col("database_specific.CWE.id")).isNotNull(),
        F.array(cwe_number(F.col("database_specific.CWE.id"))),
    ).otherwise(F.array().cast("array<int>"))

    return e.select(
        F.col("id").alias("advisory_id"),
        F.array_remove(F.col("aliases"), "")  # advisory_id is removed below
        .alias("aliases_raw"),
        F.coalesce(F.col("summary"), F.lit("")).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        weaknesses.alias("weaknesses"),
        F.to_timestamp(F.col("published")).alias("date_published"),
        F.col("database_specific.URL").alias("url"),
    ).withColumn(
        "aliases", F.array_remove(F.col("aliases_raw"), F.col("advisory_id"))
    ).drop("aliases_raw").select(
        "advisory_id", "aliases", "summary", "affected_packages", "references",
        "severities", "weaknesses", "date_published", "url",
    )
