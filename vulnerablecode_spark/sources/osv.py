"""OSV-format importer: OSV JSON records → canonical parsed advisories.

The highest-leverage source format — PyPA, PySec, GitHub-OSV and
Ubuntu-OSV all share it (reference parser: pipes/osv_v2.py:61-507,
importers/osv.py:51-331). Implemented as declared-schema ``spark.read.json``
plus pure Catalyst transforms: the event-range walk
(osv_v2.py:223-246 — introduced/fixed/last_affected events → version
range) becomes an array ``transform``/``filter`` pipeline, and one OSV
record explodes into one advisory row with nested affected packages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, MapType, StringType, StructField,
                               StructType)

# Declared OSV schema (the spec subset the reference consumes,
# FIXTURES.md §2 osv_record)
OSV_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("summary", StringType()),
    StructField("details", StringType()),
    StructField("aliases", ArrayType(StringType())),
    StructField("published", StringType()),
    StructField("modified", StringType()),
    StructField("severity", ArrayType(StructType([
        StructField("type", StringType()),
        StructField("score", StringType()),
    ]))),
    StructField("affected", ArrayType(StructType([
        StructField("package", StructType([
            StructField("ecosystem", StringType()),
            StructField("name", StringType()),
            StructField("purl", StringType()),
        ])),
        StructField("ranges", ArrayType(StructType([
            StructField("type", StringType()),
            StructField("events", ArrayType(MapType(StringType(), StringType()))),
        ]))),
        StructField("versions", ArrayType(StringType())),
        StructField("database_specific", MapType(StringType(), StringType())),
    ]))),
    StructField("references", ArrayType(StructType([
        StructField("type", StringType()),
        StructField("url", StringType()),
    ]))),
    StructField("database_specific", StructType([
        StructField("cwe_ids", ArrayType(StringType())),
        StructField("severity", StringType()),
    ])),
])

# OSV ecosystem → purl type (importers/osv.py ecosystem handling)
ECOSYSTEM_TO_PURL_TYPE = {
    "pypi": "pypi", "npm": "npm", "go": "golang", "crates.io": "cargo",
    "rubygems": "gem", "packagist": "composer", "maven": "maven",
    "nuget": "nuget", "debian": "deb", "alpine": "apk", "hex": "hex",
    "pub": "pub", "hackage": "hackage", "oss-fuzz": "generic",
    "github actions": "github",
}


def _purl_type(ecosystem: Column) -> Column:
    mapping = F.create_map(
        *[F.lit(x) for kv in ECOSYSTEM_TO_PURL_TYPE.items() for x in kv]
    )
    eco = F.lower(F.trim(ecosystem))
    # "Debian:11" style suffixes carry the release, not the ecosystem
    eco = F.split(eco, ":")[0]
    return F.coalesce(mapping[eco], eco)


def _events_to_vers(events: Column, scheme: Column) -> Column:
    """OSV range events → vers string (osv_v2.py:223-246 semantics):
    introduced→'>=v' ('0' means no lower bound), fixed→'<v',
    last_affected→'<=v', limit→'<v'."""
    constraints = F.filter(
        F.transform(
            events,
            lambda e: F.when(
                e["introduced"].isNotNull() & (e["introduced"] != "0"),
                F.concat(F.lit(">="), e["introduced"]),
            )
            .when(e["fixed"].isNotNull(), F.concat(F.lit("<"), e["fixed"]))
            .when(e["last_affected"].isNotNull(), F.concat(F.lit("<="), e["last_affected"]))
            .when(e["limit"].isNotNull(), F.concat(F.lit("<"), e["limit"]))
            .otherwise(F.lit(None).cast("string")),
        ),
        lambda c: c.isNotNull(),
    )
    return F.when(
        F.size(constraints) > 0,
        F.concat(F.lit("vers:"), scheme, F.lit("/"), F.array_join(constraints, "|")),
    ).otherwise(F.concat(F.lit("vers:"), scheme, F.lit("/*")))


def _fixed_version(ranges: Column) -> Column:
    """First 'fixed' event across ranges (importers/osv.py fixed handling)."""
    fixed = F.flatten(
        F.transform(
            ranges,
            lambda r: F.filter(
                F.transform(r["events"], lambda e: e["fixed"]),
                lambda v: v.isNotNull(),
            ),
        )
    )
    return F.when(F.size(fixed) > 0, fixed[0]).otherwise(F.lit(None).cast("string"))


def _affected_packages(affected: Column) -> Column:
    """OSV affected[] → array<struct{package, affected_version_range,
    fixed_version}> with a version-less purl per package."""

    def one(a: Column) -> Column:
        scheme = _purl_type(a["package"]["ecosystem"])
        base_purl = F.when(
            a["package"]["purl"].isNotNull(),
            # strip any version suffix from the provided purl
            F.regexp_replace(a["package"]["purl"], r"@[^@]*$", ""),
        ).otherwise(
            F.concat(F.lit("pkg:"), scheme, F.lit("/"),
                     F.lower(a["package"]["name"]))
        )
        # coalesce to an empty events array: null ranges must read as
        # "no events" (size 0), not propagate NULL through the explicit-
        # versions gate below
        ecosystem_events = F.coalesce(
            F.flatten(
                F.transform(
                    F.filter(a["ranges"], lambda r: r["type"] != "GIT"),
                    lambda r: r["events"],
                )
            ),
            F.array().cast("array<map<string,string>>"),
        )
        # explicit enumeration applies whenever there are no ECOSYSTEM/
        # SEMVER events — a record with only GIT ranges plus a versions
        # list (the dominant OSS-Fuzz shape) must use the enumerated
        # versions, not fall through to the match-everything 'vers:…/*'
        explicit_versions = F.when(
            (F.size(ecosystem_events) == 0)
            & (F.size(F.coalesce(a["versions"], F.array())) > 0),
            F.concat(F.lit("vers:"), scheme, F.lit("/"),
                     F.array_join(F.transform(a["versions"],
                                              lambda v: F.concat(F.lit("="), v)), "|")),
        )
        vers_range = F.coalesce(
            explicit_versions, _events_to_vers(ecosystem_events, scheme)
        )
        # fixed versions come from non-GIT ranges only: a GIT range's
        # 'fixed' event is a commit sha, not a package version (same
        # filter the range walk above applies; curl.py:64 guards alike)
        non_git = F.filter(F.coalesce(a["ranges"], F.array()),
                           lambda r: r["type"] != "GIT")
        return F.struct(
            base_purl.alias("package"),
            vers_range.alias("affected_version_range"),
            _fixed_version(non_git).alias("fixed_version"),
        )

    return F.transform(affected, one)


def parse_osv(raw: DataFrame, datasource_id: str = "osv") -> DataFrame:
    """OSV records (OSV_SCHEMA rows) → ADVISORY_PARSED rows."""
    sev = F.transform(
        F.coalesce(F.col("severity"), F.array()),
        lambda s: F.struct(
            F.lower(s["type"]).alias("system"),
            s["score"].alias("value"),
            s["score"].alias("scoring_elements"),
            F.lit(None).cast("timestamp").alias("published_at"),
            F.lit(None).cast("string").alias("url"),
        ),
    )
    refs = F.transform(
        F.coalesce(F.col("references"), F.array()),
        lambda r: F.struct(
            F.lit(None).cast("string").alias("reference_id"),
            F.lower(F.coalesce(r["type"], F.lit("other"))).alias("reference_type"),
            r["url"].alias("url"),
        ),
    )
    weaknesses = F.filter(
        F.transform(
            F.coalesce(F.col("database_specific.cwe_ids"), F.array()),
            lambda c: F.nullif(F.regexp_extract(c, r"(?i)CWE-(\d+)", 1),
                   F.lit("")).cast("int"),
        ),
        lambda x: x.isNotNull(),
    )
    return raw.select(
        F.col("id").alias("advisory_id"),
        F.array_sort(F.array_distinct(F.coalesce(F.col("aliases"), F.array()))).alias("aliases"),
        F.trim(F.coalesce(F.col("summary"), F.col("details"), F.lit(""))).alias("summary"),
        _affected_packages(F.coalesce(F.col("affected"), F.array())).alias("affected_packages"),
        refs.alias("references"),
        sev.alias("severities"),
        weaknesses.alias("weaknesses"),
        F.to_timestamp(F.col("published")).alias("date_published"),
        F.concat(F.lit("https://osv.dev/vulnerability/"), F.col("id")).alias("url"),
    )


def read_osv(spark: SparkSession, path: str, datasource_id: str = "osv") -> DataFrame:
    """Read a directory/file of OSV JSON (one record per file or JSONL)."""
    raw = spark.read.schema(OSV_SCHEMA).option("multiLine", "true").json(path)
    return parse_osv(raw, datasource_id)
