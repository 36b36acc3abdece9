"""RedHat CSAF advisory importer (RHSA / RHEA / RHBA).

Reference: pipelines/v2_importers/redhat_importer.py:37-198 — one CSAF 2.0
JSON document per advisory; summary is the concatenated non-disclaimer
document notes, aliases the per-vulnerability CVE list, severity the
``aggregate_severity`` on the REDHAT_AGGREGATE ("rhas") system, and the
affected packages come from ``product_tree.branches[0].branches[*]
.branches[*].product.product_identification_helper.purl`` for pkg:rpm
purls that carry a version (fixed = purl version, affected =
``vers:rpm/<fixed``).

Spark shape: wholetext scan of the extracted archive (one file per task
split at scale) → ``from_json`` with a declared partial schema → pure
Catalyst transforms. No Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.functions.text_funcs import reference_id_from_url
from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

_CSAF = """
struct<
  document: struct<
    csaf_version: string,
    notes: array<struct<category:string, text:string>>,
    tracking: struct<id:string, initial_release_date:string>,
    references: array<struct<url:string, summary:string>>,
    aggregate_severity: struct<text:string>
  >,
  vulnerabilities: array<struct<cve:string>>,
  product_tree: struct<
    branches: array<struct<
      branches: array<struct<
        category: string,
        branches: array<struct<
          product: struct<
            product_identification_helper: struct<purl:string>
          >
        >>
      >>
    >>
  >
>
"""

BASE_URL = "https://security.access.redhat.com/data/csaf/v2/advisories/"


def read_redhat_csaf(spark: SparkSession, path: str) -> DataFrame:
    """Directory of CSAF JSON files → ADVISORY_PARSED rows."""
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(F.col("value"), F.col("_metadata.file_path").alias("path"))
    )
    return parse_redhat_csaf(raw)


def parse_redhat_csaf(files: DataFrame) -> DataFrame:
    """(value, path) rows of CSAF documents → ADVISORY_PARSED rows."""
    d = files.select(
        F.from_json(F.col("value"), _CSAF).alias("a"),
        F.col("path"),
    ).filter(
        # unsupported CSAF versions are skipped (redhat_importer.py:97-99)
        F.col("a.document.csaf_version").isNull()
        | (F.col("a.document.csaf_version") == "2.0")
    )

    # advisory URL re-derives the reference's urljoin(base, parent/name)
    url = F.concat(
        F.lit(BASE_URL),
        # try_element_at: a single-segment path must not throw the
        # ANSI out-of-bounds error (the -2 parent access)
        F.try_element_at(F.split(F.col("path"), "/"), F.lit(-2)),
        F.lit("/"),
        F.element_at(F.split(F.col("path"), "/"), -1),
    )

    summary = F.array_join(
        F.transform(
            F.filter(F.coalesce(F.col("a.document.notes"),
                                F.array().cast("array<struct<category:string,text:string>>")),
                     lambda n: n["category"] != "legal_disclaimer"),
            lambda n: n["text"],
        ),
        "\n\n",
    )

    aliases = F.transform(
        F.coalesce(F.col("a.vulnerabilities"),
                   F.array().cast("array<struct<cve:string>>")),
        lambda v: v["cve"],
    )

    refs = F.transform(
        F.coalesce(F.col("a.document.references"),
                   F.array().cast("array<struct<url:string,summary:string>>")),
        lambda r: F.struct(
            F.when(r["url"].startswith("https://bugzilla.redhat.com/"),
                   r["summary"])
            .otherwise(reference_id_from_url(r["url"])).alias("reference_id"),
            F.when(r["url"].startswith("https://bugzilla.redhat.com/"),
                   F.lit("bug")).otherwise(F.lit("")).alias("reference_type"),
            r["url"].alias("url"),
        ),
    ).cast(f"array<{REFERENCE.simpleString()}>")

    severities = F.when(
        F.col("a.document.aggregate_severity.text").isNotNull(),
        F.array(F.struct(
            F.lit("rhas").alias("system"),
            F.col("a.document.aggregate_severity.text").alias("value"),
            F.lit("").alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            url.alias("url"),
        )),
    ).otherwise(F.array().cast(f"array<{SEVERITY.simpleString()}>"))

    # product_tree.branches[0].branches: skip product_family groups, pull
    # each leaf's purl; keep pkg:rpm purls WITH a version
    _leaf_t = ("array<struct<product:struct<product_identification_helper:"
               "struct<purl:string>>>>")
    _branch_t = f"array<struct<category:string,branches:{_leaf_t}>>"
    leaves = F.flatten(F.transform(
        F.filter(
            F.coalesce(F.try_element_at(F.col("a.product_tree.branches"), F.lit(1))["branches"],
                       F.expr("array()").cast(_branch_t)),
            lambda b: b["category"] != "product_family",
        ),
        lambda b: F.coalesce(b["branches"], F.expr("array()").cast(_leaf_t)),
    ))
    purls = F.filter(
        F.transform(leaves, lambda p: p["product"]["product_identification_helper"]["purl"]),
        lambda p: p.startswith("pkg:rpm/") & (F.regexp_extract(p, r"@([^?#]+)", 1) != ""),
    )
    affected = F.array_distinct(F.transform(
        purls,
        lambda p: F.struct(
            F.regexp_replace(p, r"@[^?#]+", "").alias("package"),
            F.concat(F.lit("vers:rpm/<"),
                     F.regexp_extract(p, r"@([^?#]+)", 1)).alias("affected_version_range"),
            F.regexp_extract(p, r"@([^?#]+)", 1).alias("fixed_version"),
        ),
    )).cast(f"array<{AFFECTED_PACKAGE.simpleString()}>")

    return d.select(
        F.col("a.document.tracking.id").alias("advisory_id"),
        aliases.alias("aliases"),
        summary.alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.to_timestamp(F.col("a.document.tracking.initial_release_date"))
        .alias("date_published"),
        url.alias("url"),
    ).filter(F.col("advisory_id").isNotNull())
