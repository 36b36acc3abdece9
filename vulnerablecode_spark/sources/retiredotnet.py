"""RetireNet (.NET) advisory importer.

Reference: pipelines/v2_importers/retiredotnet_importer.py:55-142 — one
JSON per advisory: ``{description, link, packages: [{id, affected,
fix}]}``; the advisory id is ``retiredotnet-<file stem>``, the alias the
first CVE found in the description, and packages group per nuget id with
affected/fixed version sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_DOC = ("struct<description:string, link:string,"
        " packages:array<struct<id:string, affected:string, fix:string>>>")

BASE_URL = "https://github.com/RetireNet/Packages/blob/master/"


def read_retiredotnet(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true").load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_retiredotnet(raw)


def parse_retiredotnet(files: DataFrame) -> DataFrame:
    d = files.select(
        F.from_json(F.col("value"), _DOC).alias("a"), F.col("path")
    )
    stem = F.regexp_replace(
        F.element_at(F.split(F.col("path"), "/"), -1), r"\.json$", "")
    cve = F.regexp_extract(F.coalesce(F.col("a.description"), F.lit("")),
                           r"CVE-\d+-\d+", 0)

    # group per package id: distinct affected + fixed versions
    pkg_ids = F.array_distinct(F.transform(
        F.coalesce(F.col("a.packages"),
                   F.expr("array()").cast(
                       "array<struct<id:string,affected:string,fix:string>>")),
        lambda p: p["id"]))
    packages = F.filter(
        F.transform(
            pkg_ids,
            lambda pid: F.struct(
                F.concat(F.lit("pkg:nuget/"), pid).alias("package"),
                F.when(
                    F.size(F.filter(F.col("a.packages"),
                                    lambda p: (p["id"] == pid)
                                    & p["affected"].isNotNull())) > 0,
                    F.concat(F.lit("vers:nuget/"), F.array_join(
                        F.array_distinct(F.transform(
                            F.filter(F.col("a.packages"),
                                     lambda p: (p["id"] == pid)
                                     & p["affected"].isNotNull()),
                            lambda p: p["affected"])), "|")),
                ).alias("affected_version_range"),
                F.try_element_at(
                    F.array_distinct(F.transform(
                        F.filter(F.col("a.packages"),
                                 lambda p: (p["id"] == pid)
                                 & p["fix"].isNotNull()),
                        lambda p: p["fix"])), F.lit(1)).alias("fixed_version"),
            ),
        ),
        lambda s: s["affected_version_range"].isNotNull()
        | s["fixed_version"].isNotNull(),
    ).cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")

    refs = F.when(
        F.col("a.link").isNotNull(),
        F.array(F.struct(
            F.lit(None).cast("string").alias("reference_id"),
            F.lit("").alias("reference_type"),
            F.col("a.link").alias("url"))),
    ).otherwise(F.array().cast(f"array<{REFERENCE.simpleString()}>"))

    return d.select(
        F.concat(F.lit("retiredotnet-"), stem).alias("advisory_id"),
        F.when(cve != "", F.array(cve))
        .otherwise(F.array().cast("array<string>")).alias("aliases"),
        F.coalesce(F.col("a.description"), F.lit("")).alias("summary"),
        packages.alias("affected_packages"),
        refs.alias("references"),
        F.array().cast(f"array<{SEVERITY.simpleString()}>").alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.concat(F.lit(BASE_URL),
                 F.element_at(F.split(F.col("path"), "/"), -1)).alias("url"),
    )
