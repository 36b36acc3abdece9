"""EPSS importer: scoring CSV → severity advisories.

Reference: pipelines/v2_importers/epss_importer_v2.py:17-90 — a full
scoring sweep of (cve, epss, percentile) rows; each CVE becomes one
advisory carrying a single 'epss' severity, later related to real
advisories by alias (relate_severities.py).

Pure built-in CSV read: the file carries one ``#model_version:…,
score_date:…`` comment line before the header.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_epss(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.option("header", True).option("comment", "#")
        .schema("cve string, epss double, percentile double")
        .csv(path)
    )
    sev = F.array(
        F.struct(
            F.lit("epss").alias("system"),
            F.col("epss").cast("string").alias("value"),
            F.col("percentile").cast("string").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            F.concat(F.lit("https://api.first.org/data/v1/epss?cve="),
                     F.col("cve")).alias("url"),
        )
    )
    return raw.filter(F.col("cve").rlike(r"(?i)^CVE-\d{4}-\d{4,19}$")).select(
        F.col("cve").alias("advisory_id"),
        F.array(F.col("cve")).alias("aliases"),
        F.lit("").alias("summary"),
        F.array().cast(
            "array<struct<package:string,affected_version_range:string,fixed_version:string>>"
        ).alias("affected_packages"),
        F.array().cast(
            "array<struct<reference_id:string,reference_type:string,url:string>>"
        ).alias("references"),
        sev.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.concat(F.lit("https://api.first.org/data/v1/epss?cve="),
                 F.col("cve")).alias("url"),
    )
