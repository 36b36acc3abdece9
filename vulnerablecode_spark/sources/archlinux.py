"""Arch Linux AVG importer.

Reference: pipelines/v2_importers/archlinux_importer.py:27-123 — one JSON
array from security.archlinux.org/json; each record is an AVG group with
``packages`` (one alpm purl each), shared affected/fixed versions,
``issues``+``advisories`` as aliases, and an "archlinux" severity system.

Spark shape: one ``from_json`` over the whole feed + explode-free
``transform`` (the per-record package fan-out stays inside the row's
array column, exactly the reference's nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_RECORD = ("array<struct<name:string, packages:array<string>, status:string,"
           " severity:string, type:string, affected:string, fixed:string,"
           " issues:array<string>, advisories:array<string>>>")

# severity_systems.ARCHLINUX.choices (severity_systems.py:146-150)
_SEVERITIES = ("Critical", "High", "Medium", "Low")


def read_archlinux(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_archlinux(raw)


def parse_archlinux(files: DataFrame) -> DataFrame:
    rec = files.select(
        F.explode(F.from_json(F.col("value"), _RECORD)).alias("r")
    ).select("r.*")

    url = F.concat(F.lit("https://security.archlinux.org/"), F.col("name"),
                   F.lit(".json"))

    affected = F.transform(
        F.coalesce(F.col("packages"), F.array().cast("array<string>")),
        lambda name: F.struct(
            F.concat(F.lit("pkg:alpm/archlinux/"), name).alias("package"),
            F.when(F.col("affected").isNotNull(),
                   F.concat(F.lit("vers:alpm/"), F.col("affected")))
            .alias("affected_version_range"),
            F.col("fixed").alias("fixed_version"),
        ),
    ).cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")

    # the AVG's own page plus one reference per linked ASA advisory
    refs = F.concat(
        F.array(F.struct(
            F.col("name").alias("reference_id"),
            F.lit("").alias("reference_type"),
            F.concat(F.lit("https://security.archlinux.org/"),
                     F.col("name")).alias("url"),
        )),
        F.transform(
            F.coalesce(F.col("advisories"), F.array().cast("array<string>")),
            lambda a: F.struct(
                a.alias("reference_id"),
                F.lit("").alias("reference_type"),
                F.concat(F.lit("https://security.archlinux.org/"), a).alias("url"),
            ),
        ),
    ).cast(f"array<{REFERENCE.simpleString()}>")

    severities = F.when(
        F.col("severity").isin(*_SEVERITIES),
        F.array(F.struct(
            F.lit("archlinux").alias("system"),
            F.col("severity").alias("value"),
            F.lit("").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            url.alias("url"),
        )),
    ).otherwise(F.array().cast(f"array<{SEVERITY.simpleString()}>"))

    return rec.select(
        F.col("name").alias("advisory_id"),
        F.concat(F.coalesce(F.col("issues"), F.array().cast("array<string>")),
                 F.coalesce(F.col("advisories"), F.array().cast("array<string>")))
        .alias("aliases"),
        F.when(F.col("type") == "unknown", F.lit(""))
        .otherwise(F.coalesce(F.col("type"), F.lit(""))).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        url.alias("url"),
    )
