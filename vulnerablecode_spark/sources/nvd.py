"""NVD importer: yearly CVE JSON feeds → canonical parsed advisories.

Reference: pipelines/v2_importers/nvd_importer.py (332 LoC of dict
walking). Spark shape: declared schema over the NVD 1.1 feed format,
explode ``CVE_Items``, pure Catalyst field extraction — descriptions,
references, CVSS v2/v3 vectors, CWE ids, and CPE version ranges from
``configurations`` become affected entries on a ``generic`` purl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, StringType,
                               StructField, StructType)

_CPE_MATCH = StructType([
    StructField("vulnerable", BooleanType()),
    StructField("cpe23Uri", StringType()),
    StructField("versionStartIncluding", StringType()),
    StructField("versionStartExcluding", StringType()),
    StructField("versionEndIncluding", StringType()),
    StructField("versionEndExcluding", StringType()),
])

NVD_SCHEMA = StructType([
    StructField("CVE_Items", ArrayType(StructType([
        StructField("cve", StructType([
            StructField("CVE_data_meta", StructType([
                StructField("ID", StringType()),
            ])),
            StructField("description", StructType([
                StructField("description_data", ArrayType(StructType([
                    StructField("lang", StringType()),
                    StructField("value", StringType()),
                ]))),
            ])),
            StructField("references", StructType([
                StructField("reference_data", ArrayType(StructType([
                    StructField("url", StringType()),
                    StructField("tags", ArrayType(StringType())),
                ]))),
            ])),
            StructField("problemtype", StructType([
                StructField("problemtype_data", ArrayType(StructType([
                    StructField("description", ArrayType(StructType([
                        StructField("value", StringType()),
                    ]))),
                ]))),
            ])),
        ])),
        StructField("configurations", StructType([
            StructField("nodes", ArrayType(StructType([
                StructField("cpe_match", ArrayType(_CPE_MATCH)),
                StructField("children", ArrayType(StructType([
                    StructField("cpe_match", ArrayType(_CPE_MATCH)),
                ]))),
            ]))),
        ])),
        StructField("impact", StructType([
            StructField("baseMetricV3", StructType([
                StructField("cvssV3", StructType([
                    StructField("vectorString", StringType()),
                    StructField("baseScore", StringType()),
                    StructField("version", StringType()),
                ])),
            ])),
            StructField("baseMetricV2", StructType([
                StructField("cvssV2", StructType([
                    StructField("vectorString", StringType()),
                    StructField("baseScore", StringType()),
                ])),
            ])),
        ])),
        StructField("publishedDate", StringType()),
    ]))),
])


def _cpe_product_purl(cpe23: F.Column) -> F.Column:
    """cpe:2.3:a:vendor:product:… → pkg:generic/vendor/product."""
    parts = F.split(cpe23, ":")
    return F.concat(F.lit("pkg:generic/"), F.lower(parts[3]),
                    F.lit("/"), F.lower(parts[4]))


def _range_from_match(m: F.Column) -> F.Column:
    constraints = F.filter(
        F.array(
            F.when(m["versionStartIncluding"].isNotNull(),
                   F.concat(F.lit(">="), m["versionStartIncluding"])),
            F.when(m["versionStartExcluding"].isNotNull(),
                   F.concat(F.lit(">"), m["versionStartExcluding"])),
            F.when(m["versionEndIncluding"].isNotNull(),
                   F.concat(F.lit("<="), m["versionEndIncluding"])),
            F.when(m["versionEndExcluding"].isNotNull(),
                   F.concat(F.lit("<"), m["versionEndExcluding"])),
        ),
        lambda c: c.isNotNull(),
    )
    exact = F.element_at(F.split(m["cpe23Uri"], ":"), 6)
    return (
        F.when(F.size(constraints) > 0,
               F.concat(F.lit("vers:generic/"), F.array_join(constraints, "|")))
        .when((exact != "*") & (exact != "-"),
              F.concat(F.lit("vers:generic/="), exact))
        .otherwise(F.lit("vers:generic/*"))
    )


def parse_nvd(raw: DataFrame) -> DataFrame:
    item = raw.select(F.explode("CVE_Items").alias("it")).select("it.*")
    cve_id = F.col("cve.CVE_data_meta.ID")
    summary = F.element_at(
        F.filter(F.col("cve.description.description_data"),
                 lambda d: d["lang"] == "en"), 1)["value"]
    matches = F.flatten(F.filter(
        F.transform(
            F.coalesce(F.col("configurations.nodes"),
                       F.array().cast("array<struct<cpe_match:array<struct<"
                                      "vulnerable:boolean,cpe23Uri:string,"
                                      "versionStartIncluding:string,"
                                      "versionStartExcluding:string,"
                                      "versionEndIncluding:string,"
                                      "versionEndExcluding:string>>,"
                                      "children:array<struct<cpe_match:array<struct<"
                                      "vulnerable:boolean,cpe23Uri:string,"
                                      "versionStartIncluding:string,"
                                      "versionStartExcluding:string,"
                                      "versionEndIncluding:string,"
                                      "versionEndExcluding:string>>>>>>")),
            lambda n: F.concat(
                F.coalesce(n["cpe_match"], F.array().cast(_CPE_MATCH_ARR)),
                F.flatten(F.coalesce(
                    F.transform(F.coalesce(n["children"], F.array().cast(
                        "array<struct<cpe_match:array<struct<vulnerable:boolean,"
                        "cpe23Uri:string,versionStartIncluding:string,"
                        "versionStartExcluding:string,versionEndIncluding:string,"
                        "versionEndExcluding:string>>>>")),
                               lambda c: F.coalesce(c["cpe_match"],
                                                    F.array().cast(_CPE_MATCH_ARR))),
                    F.array().cast("array<array<struct<vulnerable:boolean,"
                                   "cpe23Uri:string,versionStartIncluding:string,"
                                   "versionStartExcluding:string,"
                                   "versionEndIncluding:string,"
                                   "versionEndExcluding:string>>>"))),
            ),
        ),
        lambda arr: arr.isNotNull(),
    ))
    affected = F.transform(
        F.filter(matches, lambda m: m["vulnerable"]),
        lambda m: F.struct(
            _cpe_product_purl(m["cpe23Uri"]).alias("package"),
            _range_from_match(m).alias("affected_version_range"),
            F.coalesce(m["versionEndExcluding"],
                       F.lit(None).cast("string")).alias("fixed_version"),
        ),
    )
    severities = F.filter(
        F.array(
            F.when(F.col("impact.baseMetricV3.cvssV3.vectorString").isNotNull(),
                   F.struct(
                       F.lit("cvssv3").alias("system"),
                       F.col("impact.baseMetricV3.cvssV3.baseScore").alias("value"),
                       F.col("impact.baseMetricV3.cvssV3.vectorString")
                       .alias("scoring_elements"),
                       F.lit(None).cast("timestamp").alias("published_at"),
                       F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), cve_id)
                       .alias("url"))),
            F.when(F.col("impact.baseMetricV2.cvssV2.vectorString").isNotNull(),
                   F.struct(
                       F.lit("cvssv2").alias("system"),
                       F.col("impact.baseMetricV2.cvssV2.baseScore").alias("value"),
                       F.col("impact.baseMetricV2.cvssV2.vectorString")
                       .alias("scoring_elements"),
                       F.lit(None).cast("timestamp").alias("published_at"),
                       F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), cve_id)
                       .alias("url"))),
        ),
        lambda s: s.isNotNull(),
    )
    refs = F.transform(
        F.coalesce(F.col("cve.references.reference_data"),
                   F.array().cast("array<struct<url:string,tags:array<string>>>")),
        lambda r: F.struct(
            F.lit(None).cast("string").alias("reference_id"),
            F.when(F.array_contains(F.coalesce(r["tags"],
                                               F.array().cast("array<string>")),
                                    "Exploit"), "exploit")
            .otherwise("advisory").alias("reference_type"),
            r["url"].alias("url"),
        ),
    )
    weaknesses = F.filter(
        F.transform(
            F.flatten(F.transform(
                F.coalesce(F.col("cve.problemtype.problemtype_data"),
                           F.array().cast(
                               "array<struct<description:array<struct<value:string>>>>")),
                lambda p: F.coalesce(
                    p["description"],
                    F.array().cast("array<struct<value:string>>")),
            )),
            lambda d: F.regexp_extract(d["value"], r"(?i)CWE-(\d+)", 1).cast("int"),
        ),
        lambda x: x.isNotNull(),
    )
    return item.select(
        cve_id.alias("advisory_id"),
        F.array(cve_id).alias("aliases"),
        F.coalesce(summary, F.lit("")).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        weaknesses.alias("weaknesses"),
        # NVD stamps minute precision ("2024-04-01T10:00Z") which strict
        # ANSI to_timestamp rejects — try the common shapes, null otherwise
        F.coalesce(
            F.try_to_timestamp(F.col("publishedDate")),
            F.try_to_timestamp(F.col("publishedDate"),
                               F.lit("yyyy-MM-dd'T'HH:mmX")),
        ).alias("date_published"),
        F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), cve_id).alias("url"),
    ).filter(F.col("advisory_id").isNotNull())


_CPE_MATCH_ARR = ("array<struct<vulnerable:boolean,cpe23Uri:string,"
                  "versionStartIncluding:string,versionStartExcluding:string,"
                  "versionEndIncluding:string,versionEndExcluding:string>>")


def read_nvd(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(NVD_SCHEMA).option("multiLine", "true").json(path)
    return parse_nvd(raw)
