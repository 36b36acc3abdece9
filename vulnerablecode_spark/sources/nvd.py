"""NVD importer: yearly CVE JSON feeds → canonical parsed advisories.

Reference: pipelines/v2_importers/nvd_importer.py (332 LoC of dict
walking). Spark shape: declared schema over the NVD 1.1 feed format,
explode ``CVE_Items``, pure Catalyst field extraction — descriptions,
references, CVSS v2/v3 vectors, CWE ids, and CPE version ranges.

CPE handling mirrors the reference: hardware CVEs (any CPE with part
``h``, is_related_to_hardware :326-332) are skipped entirely
(:137,:166); every distinct CPE becomes a reference row carrying the CPE
as reference_id + the NVD CPE-search URL (:261-263); the CVE itself is a
reference (:265-271) and the plain detail URL is deduplicated out of the
feed's reference list (:273-278). Deriving ``pkg:generic/vendor/product``
purls from the remaining software CPEs goes BEYOND the reference (which
emits no NVD purls) and is kept as a documented extension — vendor and
product come from CPE fields 4-5, wildcard/any components excluded.
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


def _range_from_match(m: F.Column, uri: str = "cpe23Uri") -> F.Column:
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
    exact = F.try_element_at(F.split(m[uri], ":"), F.lit(6))
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
    summary = F.try_element_at(
        F.filter(F.col("cve.description.description_data"),
                 lambda d: d["lang"] == "en"), F.lit(1))["value"]
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
    cpes = F.array_distinct(F.filter(
        F.transform(matches, lambda m: m["cpe23Uri"]),
        lambda c: c.isNotNull(),
    ))
    # CPE format: cpe:2.3:<part>:<vendor>:<product>:… — part 'h' marks
    # hardware (is_related_to_hardware, nvd_importer.py:326-332)
    is_hardware = F.exists(
        cpes, lambda c: F.try_element_at(F.split(c, ":"), F.lit(3)).eqNullSafe("h"))
    affected = F.transform(
        F.filter(matches,
                 lambda m: m["vulnerable"]
                 & ~F.try_element_at(F.split(m["cpe23Uri"], ":"), F.lit(4)).isin("*", "-")
                 & ~F.try_element_at(F.split(m["cpe23Uri"], ":"), F.lit(5)).isin("*", "-")),
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
    detail_url = F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), cve_id)
    # reference order mirrors CveItem.references (nvd_importer.py:255-281):
    # per-CPE search references, the CVE detail reference, then the feed's
    # reference URLs with the plain detail URL deduplicated out
    cpe_refs = F.transform(
        cpes,
        lambda c: F.struct(
            c.alias("reference_id"),
            F.lit(None).cast("string").alias("reference_type"),
            F.concat(
                F.lit("https://nvd.nist.gov/vuln/search/results"
                      "?adv_search=true&isCpeNameSearch=true&query="),
                c).alias("url"),
        ),
    )
    cve_ref = F.array(F.struct(
        cve_id.alias("reference_id"),
        F.lit(None).cast("string").alias("reference_type"),
        detail_url.alias("url"),
    ))
    feed_refs = F.transform(
        F.filter(
            F.coalesce(F.col("cve.references.reference_data"),
                       F.array().cast("array<struct<url:string,tags:array<string>>>")),
            lambda r: r["url"] != detail_url,
        ),
        lambda r: F.struct(
            F.lit(None).cast("string").alias("reference_id"),
            F.when(F.array_contains(F.coalesce(r["tags"],
                                               F.array().cast("array<string>")),
                                    "Exploit"), "exploit")
            .otherwise("advisory").alias("reference_type"),
            r["url"].alias("url"),
        ),
    )
    refs = F.concat(cpe_refs, cve_ref, feed_refs)
    # hardware CVEs are skipped wholesale (nvd_importer.py:137,166); the
    # filter must run before the projection drops the source columns
    item = item.filter(~is_hardware)
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
            lambda d: F.nullif(F.regexp_extract(d["value"], r"(?i)CWE-(\d+)", 1),
                   F.lit("")).cast("int"),
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


# ---------------------------------------------------------------------------
# NVD CVE API / feed 2.0 format — what the reference's current pipeline
# consumes (nvd_importer.py fetch_cve_data_2_0 :118-128, CveItem :141-332).
# ---------------------------------------------------------------------------

_CVSS_METRIC = ArrayType(StructType([
    StructField("cvssData", StructType([
        StructField("version", StringType()),
        StructField("vectorString", StringType()),
        StructField("baseScore", StringType()),
    ])),
]))

_API2_CPE_MATCH = StructType([
    StructField("vulnerable", BooleanType()),
    StructField("criteria", StringType()),
    StructField("versionStartIncluding", StringType()),
    StructField("versionStartExcluding", StringType()),
    StructField("versionEndIncluding", StringType()),
    StructField("versionEndExcluding", StringType()),
])

NVD_API2_SCHEMA = StructType([
    StructField("vulnerabilities", ArrayType(StructType([
        StructField("cve", StructType([
            StructField("id", StringType()),
            StructField("published", StringType()),
            StructField("descriptions", ArrayType(StructType([
                StructField("lang", StringType()),
                StructField("value", StringType()),
            ]))),
            StructField("metrics", StructType([
                StructField("cvssMetricV40", _CVSS_METRIC),
                StructField("cvssMetricV31", _CVSS_METRIC),
                StructField("cvssMetricV30", _CVSS_METRIC),
                StructField("cvssMetricV2", _CVSS_METRIC),
            ])),
            StructField("weaknesses", ArrayType(StructType([
                StructField("description", ArrayType(StructType([
                    StructField("lang", StringType()),
                    StructField("value", StringType()),
                ]))),
            ]))),
            StructField("configurations", ArrayType(StructType([
                StructField("nodes", ArrayType(StructType([
                    StructField("cpeMatch", ArrayType(_API2_CPE_MATCH)),
                ]))),
            ]))),
            StructField("references", ArrayType(StructType([
                StructField("url", StringType()),
            ]))),
        ])),
    ]))),
])


def _api2_severities(cve_id: F.Column) -> F.Column:
    """CVSS metrics in the reference's fixed precedence order
    (nvd_importer.py:205-234): V40 → V31 → V30 → V2; a cvssMetricV31
    entry whose cvssData.version is not "3.1" downgrades to the cvssv3
    system id."""
    url = F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), cve_id)

    def metric(key, system_expr):
        empty = F.array().cast(
            "array<struct<cvssData:struct<version:string,"
            "vectorString:string,baseScore:string>>>")
        return F.transform(
            F.coalesce(F.col(f"cve.metrics.{key}"), empty),
            lambda m: F.struct(
                system_expr(m).alias("system"),
                F.coalesce(m["cvssData"]["baseScore"], F.lit(""))
                 .alias("value"),
                F.coalesce(m["cvssData"]["vectorString"], F.lit(""))
                 .alias("scoring_elements"),
                F.lit(None).cast("timestamp").alias("published_at"),
                url.alias("url"),
            ),
        )

    return F.concat(
        metric("cvssMetricV40", lambda m: F.lit("cvssv4")),
        metric("cvssMetricV31",
               lambda m: F.when(m["cvssData"]["version"] != "3.1",
                                F.lit("cvssv3")).otherwise(F.lit("cvssv3.1"))),
        metric("cvssMetricV30", lambda m: F.lit("cvssv3")),
        metric("cvssMetricV2", lambda m: F.lit("cvssv2")),
    )


def parse_nvd_api2(raw: DataFrame) -> DataFrame:
    """NVD 2.0 payloads (``vulnerabilities[].cve``) → ADVISORY_PARSED rows.

    Mirrors CveItem (nvd_importer.py:141-332): longest-English summary
    (:176-189, first wins ties), distinct configuration CPEs (:190-202),
    hardware skip, metric-ordered severities, en-CWE weaknesses with the
    NVD-CWE-Other/noinfo sentinels dropped (:290-304), cpe+cve+feed
    references with http/ftp filtering and detail-URL dedup (:238-281).
    Rejected CVEs pass through with their "Rejected reason" summary — the
    reference does not skip them. Purl derivation from software CPEs is
    the same documented extension as the 1.1 path.
    """
    item = raw.select(F.explode("vulnerabilities").alias("it")).select("it.*")
    cve_id = F.col("cve.id")
    en_desc = F.filter(
        F.coalesce(F.col("cve.descriptions"),
                   F.array().cast("array<struct<lang:string,value:string>>")),
        lambda d: (d["lang"] == "en") & d["value"].isNotNull()
        & (d["value"] != ""))
    # max-by-length with FIRST-wins ties (python max semantics, :189)
    summary = F.aggregate(
        en_desc, F.lit(None).cast("string"),
        lambda acc, d: F.when(
            acc.isNull() | (F.length(d["value"]) > F.length(acc)),
            d["value"]).otherwise(acc))
    matches = F.flatten(F.transform(
        F.flatten(F.transform(
            F.coalesce(F.col("cve.configurations"),
                       F.array().cast(
                           "array<struct<nodes:array<struct<cpeMatch:"
                           "array<struct<vulnerable:boolean,criteria:string,"
                           "versionStartIncluding:string,"
                           "versionStartExcluding:string,"
                           "versionEndIncluding:string,"
                           "versionEndExcluding:string>>>>>>")),
            lambda c: F.coalesce(c["nodes"], F.array().cast(
                "array<struct<cpeMatch:array<struct<vulnerable:boolean,"
                "criteria:string,versionStartIncluding:string,"
                "versionStartExcluding:string,versionEndIncluding:string,"
                "versionEndExcluding:string>>>>")),
        )),
        lambda n: F.coalesce(n["cpeMatch"], F.array().cast(
            "array<struct<vulnerable:boolean,criteria:string,"
            "versionStartIncluding:string,versionStartExcluding:string,"
            "versionEndIncluding:string,versionEndExcluding:string>>")),
    ))
    cpes = F.array_distinct(F.filter(
        F.transform(matches, lambda m: m["criteria"]),
        lambda c: c.isNotNull()))
    is_hardware = F.exists(
        cpes, lambda c: F.try_element_at(F.split(c, ":"), F.lit(3)).eqNullSafe("h"))
    affected = F.transform(
        F.filter(matches,
                 lambda m: m["vulnerable"] & m["criteria"].isNotNull()
                 & ~F.try_element_at(F.split(m["criteria"], ":"), F.lit(4)).isin("*", "-")
                 & ~F.try_element_at(F.split(m["criteria"], ":"), F.lit(5)).isin("*", "-")),
        lambda m: F.struct(
            _cpe_product_purl(m["criteria"]).alias("package"),
            _range_from_match(m, uri="criteria")
            .alias("affected_version_range"),
            F.coalesce(m["versionEndExcluding"],
                       F.lit(None).cast("string")).alias("fixed_version"),
        ),
    )
    weaknesses = F.array_distinct(F.filter(
        F.transform(
            F.flatten(F.transform(
                F.coalesce(F.col("cve.weaknesses"), F.array().cast(
                    "array<struct<description:array<struct<lang:string,"
                    "value:string>>>>")),
                lambda w: F.filter(
                    F.coalesce(w["description"], F.array().cast(
                        "array<struct<lang:string,value:string>>")),
                    lambda d: d["lang"] == "en"),
            )),
            lambda d: F.when(
                ~d["value"].isin("NVD-CWE-Other", "NVD-CWE-noinfo"),
                F.nullif(F.regexp_extract(d["value"], r"(?i)CWE-(\d+)", 1),
                         F.lit("")).cast("int")),
        ),
        lambda x: x.isNotNull()))
    detail_url = F.concat(F.lit("https://nvd.nist.gov/vuln/detail/"), cve_id)
    cpe_refs = F.transform(
        cpes,
        lambda c: F.struct(
            c.alias("reference_id"),
            F.lit(None).cast("string").alias("reference_type"),
            F.concat(
                F.lit("https://nvd.nist.gov/vuln/search/results"
                      "?adv_search=true&isCpeNameSearch=true&query="),
                c).alias("url"),
        ),
    )
    cve_ref = F.array(F.struct(
        cve_id.alias("reference_id"),
        F.lit(None).cast("string").alias("reference_type"),
        detail_url.alias("url"),
    ))
    feed_refs = F.transform(
        F.filter(
            F.array_distinct(F.transform(
                F.coalesce(F.col("cve.references"),
                           F.array().cast("array<struct<url:string>>")),
                lambda r: r["url"])),
            lambda u: u.isNotNull() & (u != detail_url)
            & (u.startswith("http") | u.startswith("ftp")),
        ),
        lambda u: F.struct(
            F.lit(None).cast("string").alias("reference_id"),
            F.lit(None).cast("string").alias("reference_type"),
            u.alias("url"),
        ),
    )
    return item.filter(~is_hardware).select(
        cve_id.alias("advisory_id"),
        F.array().cast("array<string>").alias("aliases"),
        F.coalesce(summary, F.lit("")).alias("summary"),
        affected.alias("affected_packages"),
        F.concat(cpe_refs, cve_ref, feed_refs).alias("references"),
        _api2_severities(cve_id).alias("severities"),
        weaknesses.alias("weaknesses"),
        F.try_to_timestamp(F.col("cve.published")).alias("date_published"),
        detail_url.alias("url"),
    ).filter(F.col("advisory_id").isNotNull())


def read_nvd_api2(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(NVD_API2_SCHEMA).option(
        "multiLine", "true").json(path)
    return parse_nvd_api2(raw)
