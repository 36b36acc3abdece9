"""GitHub Security Advisories importer (GraphQL page payloads → advisories).

Reference: pipelines/github_importer.py (316 LoC) — pages of the
``securityAdvisories`` GraphQL query. The fetch is driver-side (it is a
paged HTTP API); the landed page payloads are JSON documents this parser
reads distributed with a declared schema. Each advisory node carries
identifiers (GHSA/CVE), severity, CVSS, vulnerabilities (package +
vulnerableVersionRange + firstPatchedVersion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

GHSA_SCHEMA = StructType([
    StructField("securityAdvisories", StructType([
        StructField("nodes", ArrayType(StructType([
            StructField("ghsaId", StringType()),
            StructField("summary", StringType()),
            StructField("description", StringType()),
            StructField("severity", StringType()),
            StructField("publishedAt", StringType()),
            StructField("identifiers", ArrayType(StructType([
                StructField("type", StringType()),
                StructField("value", StringType()),
            ]))),
            StructField("references", ArrayType(StructType([
                StructField("url", StringType()),
            ]))),
            StructField("cvss", StructType([
                StructField("score", StringType()),
                StructField("vectorString", StringType()),
            ])),
            StructField("cwes", StructType([
                StructField("nodes", ArrayType(StructType([
                    StructField("cweId", StringType()),
                ]))),
            ])),
            StructField("vulnerabilities", StructType([
                StructField("nodes", ArrayType(StructType([
                    StructField("package", StructType([
                        StructField("ecosystem", StringType()),
                        StructField("name", StringType()),
                    ])),
                    StructField("vulnerableVersionRange", StringType()),
                    StructField("firstPatchedVersion", StructType([
                        StructField("identifier", StringType()),
                    ])),
                ]))),
            ])),
        ]))),
    ])),
])

_ECO_TYPE = {"pip": "pypi", "npm": "npm", "rubygems": "gem", "maven": "maven",
             "nuget": "nuget", "composer": "composer", "go": "golang",
             "rust": "cargo", "erlang": "hex", "pub": "pub", "swift": "swift",
             "actions": "github"}


def _purl_type(eco: F.Column) -> F.Column:
    mapping = F.create_map(*[F.lit(x) for kv in _ECO_TYPE.items() for x in kv])
    e = F.lower(F.trim(eco))
    return F.coalesce(mapping[e], e)


def parse_github(raw: DataFrame) -> DataFrame:
    node = raw.select(
        F.explode("securityAdvisories.nodes").alias("n")
    ).select("n.*")

    def vuln_entry(v):
        scheme = _purl_type(v["package"]["ecosystem"])
        base_purl = F.concat(F.lit("pkg:"), scheme, F.lit("/"),
                             F.lower(v["package"]["name"]))
        # "< 1.2.3", ">= 1.0, < 2.0", "= 1.5" → vers constraints
        constraints = F.array_join(
            F.transform(
                F.split(v["vulnerableVersionRange"], ","),
                lambda c: F.regexp_replace(F.trim(c), r"\s+", ""),
            ), "|")
        vers_range = F.when(
            F.length(constraints) > 0,
            F.concat(F.lit("vers:"), scheme, F.lit("/"), constraints),
        ).otherwise(F.concat(F.lit("vers:"), scheme, F.lit("/*")))
        return F.struct(
            base_purl.alias("package"),
            vers_range.alias("affected_version_range"),
            v["firstPatchedVersion"]["identifier"].alias("fixed_version"),
        )

    affected = F.transform(
        F.coalesce(F.col("vulnerabilities.nodes"), F.array().cast(
            "array<struct<package:struct<ecosystem:string,name:string>,"
            "vulnerableVersionRange:string,"
            "firstPatchedVersion:struct<identifier:string>>>")),
        vuln_entry,
    )
    aliases = F.array_sort(F.array_distinct(F.filter(
        F.transform(
            F.coalesce(F.col("identifiers"), F.array().cast(
                "array<struct<type:string,value:string>>")),
            lambda i: F.when(i["value"] != F.col("ghsaId"), i["value"]),
        ),
        lambda x: x.isNotNull(),
    )))
    severities = F.filter(
        F.array(
            F.when(F.col("cvss.vectorString").isNotNull(), F.struct(
                F.lit("cvssv3.1").alias("system"),
                F.col("cvss.score").alias("value"),
                F.col("cvss.vectorString").alias("scoring_elements"),
                F.lit(None).cast("timestamp").alias("published_at"),
                F.concat(F.lit("https://github.com/advisories/"),
                         F.col("ghsaId")).alias("url"))),
            F.when(F.col("severity").isNotNull(), F.struct(
                F.lit("generic_textual").alias("system"),
                F.lower("severity").alias("value"),
                F.lower("severity").alias("scoring_elements"),
                F.lit(None).cast("timestamp").alias("published_at"),
                F.concat(F.lit("https://github.com/advisories/"),
                         F.col("ghsaId")).alias("url"))),
        ),
        lambda s: s.isNotNull(),
    )
    refs = F.transform(
        F.coalesce(F.col("references"),
                   F.array().cast("array<struct<url:string>>")),
        lambda r: F.struct(
            F.lit(None).cast("string").alias("reference_id"),
            F.lit("advisory").alias("reference_type"),
            r["url"].alias("url"),
        ),
    )
    weaknesses = F.filter(
        F.transform(
            F.coalesce(F.col("cwes.nodes"),
                       F.array().cast("array<struct<cweId:string>>")),
            lambda c: F.nullif(F.regexp_extract(c["cweId"], r"(?i)CWE-(\d+)", 1),
                   F.lit("")).cast("int"),
        ),
        lambda x: x.isNotNull(),
    )
    return node.select(
        F.col("ghsaId").alias("advisory_id"),
        aliases.alias("aliases"),
        F.coalesce("summary", "description", F.lit("")).alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        severities.alias("severities"),
        weaknesses.alias("weaknesses"),
        F.to_timestamp("publishedAt").alias("date_published"),
        F.concat(F.lit("https://github.com/advisories/"),
                 F.col("ghsaId")).alias("url"),
    )


def read_github(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.schema(GHSA_SCHEMA).option("multiLine", "true").json(path)
    return parse_github(raw)
