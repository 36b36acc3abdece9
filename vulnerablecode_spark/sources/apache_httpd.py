"""Apache HTTPD advisory importer.

Reference: pipelines/v2_importers/apache_httpd_importer.py — one JSON per
CVE in either CVE 4.0 (``CVE_data_meta``) or CVE 5.x (``cveMetadata``)
shape; severity is the first ``impact[*].other`` label on the
"apache_httpd" system; the affected range combines ``affects.vendor``
version constraints (<=, >=, !<→>=, =) with inverted fixed versions from
``timeline`` entries ("x.y.z release"); weaknesses come from
``problemtype`` (4.0, CWE-nnn regex over text) or ``problemTypes`` (5.x,
cweId).

Spark shape: one wholetext read + BOTH format schemas in parallel
``from_json`` columns — Catalyst picks per row whichever parsed non-null,
so mixed directories (the live feed is mixed) need no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

BASE_URL = "https://httpd.apache.org/security/json/"

_V4 = """struct<
  CVE_data_meta: struct<ID:string>,
  description: struct<description_data:array<struct<lang:string, value:string>>>,
  impact: array<struct<other:string>>,
  problemtype: struct<problemtype_data:array<struct<description:array<struct<lang:string, value:string>>>>>,
  affects: struct<vendor:struct<vendor_data:array<struct<
    product:struct<product_data:array<struct<
      version:struct<version_data:array<struct<version_value:string, version_affected:string>>>
    >>>
  >>>>,
  timeline: array<struct<value:string, time:string>>
>"""

_V5 = """struct<
  cveMetadata: struct<cveId:string>,
  containers: struct<cna:struct<
    problemTypes: array<struct<descriptions:array<struct<cweId:string, description:string>>>>,
    descriptions: array<struct<lang:string, value:string>>,
    metrics: array<struct<other:struct<type:string, content:struct<text:string>>>>,
    affected: array<struct<versions:array<struct<version:string, status:string, lessThan:string, lessThanOrEqual:string>>>>,
    timeline: array<struct<value:string, time:string>>
  >>
>"""


def read_apache_httpd(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true").load(path)
    )
    return parse_apache_httpd(raw)


def parse_apache_httpd(files: DataFrame) -> DataFrame:
    d = files.select(
        F.from_json(F.col("value"), _V4).alias("v4"),
        F.from_json(F.col("value"), _V5).alias("v5"),
    )
    alias = F.coalesce(F.col("v4.CVE_data_meta.ID"),
                       F.col("v5.cveMetadata.cveId"))
    d = d.select(alias.alias("cve"), "v4", "v5").filter(F.col("cve").isNotNull())

    url = F.concat(F.lit(BASE_URL), F.col("cve"), F.lit(".json"))

    summary = F.coalesce(
        F.try_element_at(
            F.filter(F.coalesce(F.col("v4.description.description_data"),
                                F.array().cast("array<struct<lang:string,value:string>>")),
                     lambda x: x["lang"] == "eng"), F.lit(1))["value"],
        F.try_element_at(
            F.filter(F.coalesce(F.col("v5.containers.cna.descriptions"),
                                F.array().cast("array<struct<lang:string,value:string>>")),
                     lambda x: x["lang"].isin("en", "eng")), F.lit(1))["value"],
        F.lit(""),
    )

    # first impact[*].other label (4.0 shape only, apache_httpd_importer.py:113-124)
    impact_label = F.try_element_at(
        F.filter(F.coalesce(F.col("v4.impact"),
                            F.array().cast("array<struct<other:string>>")),
                 lambda i: i["other"].isNotNull()), F.lit(1))["other"]
    severities = F.when(
        impact_label.isNotNull(),
        F.array(F.struct(
            F.lit("apache_httpd").alias("system"),
            impact_label.alias("value"),
            F.lit("").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            url.alias("url"),
        )),
    ).otherwise(F.array().cast(f"array<{SEVERITY.simpleString()}>"))

    # version constraints: affects tree (4.0) ...
    _ver_t = ("array<struct<version:struct<version_data:array<struct<"
              "version_value:string,version_affected:string>>>>>")
    _vendor_t = f"array<struct<product:struct<product_data:{_ver_t}>>>"
    vdata = F.flatten(F.transform(
        F.flatten(F.transform(
            F.coalesce(F.col("v4.affects.vendor.vendor_data"),
                       F.expr("array()").cast(_vendor_t)),
            lambda v: v["product"]["product_data"],
        )),
        lambda p: p["version"]["version_data"],
    ))
    comp = {"<=": "<=", ">=": ">=", "!<": ">=", "=": "="}
    constraints = F.filter(
        F.transform(
            F.coalesce(vdata, F.expr("array()").cast(
                "array<struct<version_value:string,version_affected:string>>")),
            lambda v: F.when(
                v["version_affected"].isin(*comp) & v["version_value"].isNotNull(),
                F.concat(
                    F.coalesce(*[F.when(v["version_affected"] == k, F.lit(c))
                                 for k, c in comp.items()]),
                    v["version_value"]),
            ),
        ),
        lambda c: c.isNotNull(),
    )
    # ... plus inverted fixed versions from timeline "release" entries
    timeline = F.coalesce(F.col("v4.timeline"), F.col("v5.containers.cna.timeline"),
                          F.array().cast("array<struct<value:string,time:string>>"))
    fixed_versions = F.filter(
        F.transform(
            F.filter(timeline,
                     lambda t: t["value"].contains("release")
                     & ~t["value"].contains("never")),
            lambda t: F.when(
                F.element_at(F.split(t["value"], " "), -1).contains("release"),
                F.element_at(F.split(t["value"], " "), 1),
            ).otherwise(F.element_at(F.split(t["value"], " "), -1)),
        ),
        lambda v: v.isNotNull() & (v != ""),
    )
    inverted = F.transform(fixed_versions, lambda v: F.concat(F.lit("!="), v))
    all_constraints = F.concat(constraints, inverted)
    vers = F.when(
        F.size(all_constraints) > 0,
        F.concat(F.lit("vers:apache/"), F.array_join(all_constraints, "|")),
    )
    affected = F.when(
        vers.isNotNull(),
        F.array(F.struct(
            F.lit("pkg:apache/httpd").alias("package"),
            vers.alias("affected_version_range"),
            F.try_element_at(fixed_versions, F.lit(1)).alias("fixed_version"),
        )),
    ).otherwise(F.array().cast(f"array<{AFFECTED_PACKAGE.simpleString()}>"))

    date_published = F.try_element_at(
        F.filter(timeline, lambda t: t["value"] == "public"), F.lit(1))["time"]

    # weaknesses: CVE 4.0 regex over problemtype text, else 5.x cweId
    v4_cwes = F.flatten(F.transform(
        F.coalesce(F.col("v4.problemtype.problemtype_data"),
                   F.expr("array()").cast(
                       "array<struct<description:array<struct<lang:string,value:string>>>>")),
        lambda p: F.transform(
            F.coalesce(p["description"],
                       F.expr("array()").cast("array<struct<lang:string,value:string>>")),
            lambda x: F.regexp_extract(x["value"], r"CWE-(\d+)", 1)),
    ))
    v5_cwes = F.transform(
        F.coalesce(
            F.try_element_at(F.col("v5.containers.cna.problemTypes"), F.lit(1))["descriptions"],
            F.expr("array()").cast("array<struct<cweId:string,description:string>>")),
        lambda x: F.regexp_extract(x["cweId"], r"CWE-(\d+)", 1),
    )
    weaknesses = F.array_distinct(F.filter(
        F.transform(
            F.when(F.col("v4.CVE_data_meta.ID").isNotNull(), v4_cwes)
            .otherwise(v5_cwes),
            lambda c: F.when(c != "", c.cast("int")),
        ),
        lambda c: c.isNotNull(),
    ))

    refs = F.array(F.struct(
        F.col("cve").alias("reference_id"),
        F.lit("").alias("reference_type"),
        url.alias("url"),
    )).cast(f"array<{REFERENCE.simpleString()}>")

    return d.select(
        F.col("cve").alias("advisory_id"),
        F.array().cast("array<string>").alias("aliases"),
        summary.alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        weaknesses.alias("weaknesses"),
        F.to_timestamp(date_published).alias("date_published"),
        url.alias("url"),
    )
