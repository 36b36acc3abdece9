"""Xen XSA importer (xsa.json).

Reference: pipelines/v2_importers/xen_importer.py:30-105 — the feed is a
one-element array whose ``xsas`` list holds one record per advisory:
``{xsa, title, public_time, cve: [...]}`` → advisory ``XSA-<n>`` with the
CVE list as aliases and the xenbits advisory page as reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_FEED = ("array<struct<xsas:array<struct<xsa:string, title:string,"
         " public_time:string, cve:array<string>>>>>")

XEN_URL = "https://xenbits.xen.org/xsa/"


def read_xen_xsa(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_xen_xsa(raw)


def parse_xen_xsa(files: DataFrame) -> DataFrame:
    x = files.select(
        F.explode(F.try_element_at(F.from_json(F.col("value"), _FEED),
                                   F.lit(1))["xsas"]).alias("x")
    ).select("x.*").filter(F.col("xsa").isNotNull())
    refs = F.array(F.struct(
        F.lit(None).cast("string").alias("reference_id"),
        F.lit("").alias("reference_type"),
        F.concat(F.lit("https://xenbits.xen.org/xsa/advisory-"),
                 F.col("xsa"), F.lit(".html")).alias("url"),
    )).cast(f"array<{REFERENCE.simpleString()}>")
    return x.select(
        F.concat(F.lit("XSA-"), F.col("xsa")).alias("advisory_id"),
        F.coalesce(F.col("cve"), F.array().cast("array<string>")).alias("aliases"),
        F.coalesce(F.col("title"), F.lit("")).alias("summary"),
        F.array().cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")
        .alias("affected_packages"),
        refs.alias("references"),
        F.array().cast(f"array<{SEVERITY.simpleString()}>").alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.to_timestamp(F.col("public_time")).alias("date_published"),
        F.lit(XEN_URL).alias("url"),
    )
