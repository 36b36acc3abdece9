"""OpenSSL secjson importer.

Reference: pipelines/v2_importers/openssl_importer.py + pipes/openssl.py —
one CVE-5.x-shaped JSON per advisory under secjson/: summary combines
title + first description; severity is the first ``metrics[0].other
.content.text`` label on the "openssl" system; affected entries with
status=affected carry ``{version, lessThan|lessThanOrEqual}`` → affected
range ``>=version|<lessThan`` (or ``=version`` alone), fixed version =
``lessThan``; references keep their URLs, patch-tagged ones become
commit references; CWE from problemTypes[0].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.functions.text_funcs import build_description
from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_DOC = """struct<
  cveMetadata: struct<cveId:string>,
  containers: struct<cna:struct<
    title: string,
    datePublic: string,
    descriptions: array<struct<lang:string, value:string>>,
    metrics: array<struct<other:struct<content:struct<text:string>>>>,
    references: array<struct<name:string, url:string, tags:array<string>>>,
    affected: array<struct<versions:array<struct<version:string, status:string,
        lessThan:string, lessThanOrEqual:string>>>>,
    problemTypes: array<struct<descriptions:array<struct<cweId:string>>>>
  >>
>"""

BASE_URL = "https://github.com/openssl/release-metadata/blob/main/secjson/"


def read_openssl(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true").load(path)
    )
    return parse_openssl(raw)


def parse_openssl(files: DataFrame) -> DataFrame:
    d = files.select(F.from_json(F.col("value"), _DOC).alias("a"))
    cna = F.col("a.containers.cna")
    cve = F.col("a.cveMetadata.cveId")
    d = d.select(
        cve.alias("cve"), cna.alias("cna")
    ).filter(F.col("cve").isNotNull())

    url = F.concat(F.lit(BASE_URL), F.col("cve"), F.lit(".json"))
    description = F.try_element_at(F.col("cna.descriptions"), F.lit(1))["value"]

    # pipes/openssl.py:22-52 parse_affected_fixed semantics
    versions = F.flatten(F.transform(
        F.coalesce(F.col("cna.affected"), F.expr("array()").cast(
            "array<struct<versions:array<struct<version:string,status:string,"
            "lessThan:string,lessThanOrEqual:string>>>>")),
        lambda a: F.coalesce(a["versions"], F.expr("array()").cast(
            "array<struct<version:string,status:string,lessThan:string,"
            "lessThanOrEqual:string>>")),
    ))
    affected = F.filter(
        F.transform(
            F.filter(versions, lambda v: (v["status"] == "affected")
                     & v["version"].isNotNull()),
            lambda v: F.struct(
                F.lit("pkg:openssl/openssl").alias("package"),
                F.when(v["lessThan"].isNotNull(),
                       F.concat(F.lit("vers:openssl/>="), v["version"],
                                F.lit("|<"), v["lessThan"]))
                .when(v["lessThanOrEqual"].isNotNull(),
                      F.concat(F.lit("vers:openssl/>="), v["version"],
                               F.lit("|<="), v["lessThanOrEqual"]))
                .otherwise(F.concat(F.lit("vers:openssl/"), v["version"]))
                .alias("affected_version_range"),
                v["lessThan"].alias("fixed_version"),
            ),
        ),
        lambda s: s.isNotNull(),
    ).cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")

    refs = F.transform(
        F.coalesce(F.col("cna.references"), F.expr("array()").cast(
            "array<struct<name:string,url:string,tags:array<string>>>")),
        lambda r: F.struct(
            r["name"].alias("reference_id"),
            # 'patch' may appear at ANY tag position (secjson tags
            # arrays are multi-entry, e.g. ['vendor-advisory','patch'])
            F.when(F.exists(
                F.coalesce(r["tags"], F.array().cast("array<string>")),
                lambda t: F.lower(t) == "patch"), F.lit("commit"))
            .otherwise(F.lit("")).alias("reference_type"),
            r["url"].alias("url"),
        ),
    ).cast(f"array<{REFERENCE.simpleString()}>")

    label = F.try_element_at(F.col("cna.metrics"),
                             F.lit(1))["other"]["content"]["text"]
    severities = F.when(
        label.isNotNull(),
        F.array(F.struct(
            F.lit("openssl").alias("system"),
            label.alias("value"),
            F.lit("").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            F.concat(F.lit("https://openssl-library.org/news/secjson/"),
                     F.lower(F.col("cve")), F.lit(".json")).alias("url"),
        )),
    ).otherwise(F.array().cast(f"array<{SEVERITY.simpleString()}>"))

    cwe = F.regexp_extract(
        F.try_element_at(
            F.try_element_at(F.col("cna.problemTypes"),
                             F.lit(1))["descriptions"], F.lit(1))["cweId"],
        r"CWE-(\d+)", 1)
    weaknesses = F.when(cwe != "", F.array(cwe.cast("int"))) \
        .otherwise(F.array().cast("array<int>"))

    return d.select(
        F.col("cve").alias("advisory_id"),
        F.array().cast("array<string>").alias("aliases"),
        build_description(F.col("cna.title"), description).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        weaknesses.alias("weaknesses"),
        F.to_timestamp(F.col("cna.datePublic")).alias("date_published"),
        url.alias("url"),
    )
