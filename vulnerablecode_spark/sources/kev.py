"""CISA KEV catalog importer → exploit records.

Reference: pipelines/enhance_with_kev.py:30-99 — fetch the Known
Exploited Vulnerabilities JSON, then join each entry to advisories via the
CVE alias and upsert Exploit rows. The catalog is tiny → a broadcast
dimension at join time (operators/exploits.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

KEV_SCHEMA = StructType([
    StructField("count", LongType()),
    StructField("vulnerabilities", ArrayType(StructType([
        StructField("cveID", StringType()),
        StructField("shortDescription", StringType()),
        StructField("dateAdded", StringType()),
        StructField("requiredAction", StringType()),
        StructField("dueDate", StringType()),
        StructField("notes", StringType()),
        StructField("knownRansomwareCampaignUse", StringType()),
    ]))),
])


def read_kev(spark: SparkSession, path: str) -> DataFrame:
    """KEV JSON → one exploit row per catalog entry, keyed by CVE alias."""
    raw = spark.read.schema(KEV_SCHEMA).option("multiLine", "true").json(path)
    v = raw.select(F.explode("vulnerabilities").alias("v")).select("v.*")
    return v.select(
        F.col("cveID").alias("alias"),
        F.lit("KEV").alias("data_source"),
        F.col("shortDescription").alias("description"),
        F.to_timestamp("dateAdded").alias("date_added"),
        F.col("requiredAction").alias("required_action"),
        F.to_timestamp("dueDate").alias("due_date"),
        # absent/odd feed values read as false, not null — consumers
        # filter on this flag directly
        F.coalesce(F.col("knownRansomwareCampaignUse") == "Known",
                   F.lit(False)).alias("known_ransomware_campaign_use"),
        F.concat(
            F.lit("https://www.cisa.gov/known-exploited-vulnerabilities-catalog#"),
            F.col("cveID"),
        ).alias("source_url"),
    )
