"""Declared StructType schemas for the domain tables (FIXTURES.md §1).

The reference's schema system is fixed/declared (Django migrations,
models.py); here every table is a declared StructType — never inferred —
so 100 TB scans don't pay schema inference and JSON columns become typed
nested columns (ArrayType/StructType), not blobs
(models.py:1387-1395 JSONField lists → ArrayType(StructType)).
"""

from __future__ import annotations

from pyspark.sql.types import (ArrayType, BooleanType, DoubleType,
                               IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

REFERENCE = StructType([
    StructField("reference_id", StringType()),
    StructField("reference_type", StringType()),
    StructField("url", StringType()),
])

SEVERITY = StructType([
    StructField("system", StringType()),
    StructField("value", StringType()),
    StructField("scoring_elements", StringType()),
    StructField("published_at", TimestampType()),
    StructField("url", StringType()),
])

# canonical advisory table — AdvisoryV2 (models.py:3123-3318) +
# AdvisoryDataV2 interchange (importer.py:649-714)
ADVISORY = StructType([
    StructField("advisory_pk", LongType()),
    StructField("datasource_id", StringType()),
    StructField("pipeline_id", StringType()),
    StructField("advisory_id", StringType()),
    StructField("avid", StringType()),
    StructField("unique_content_id", StringType()),
    StructField("url", StringType()),
    StructField("summary", StringType()),
    StructField("date_published", TimestampType()),
    StructField("date_collected", TimestampType()),
    StructField("is_latest", BooleanType()),
    StructField("status", IntegerType()),
    StructField("precedence", IntegerType()),
    # numeric in storage (reference DecimalField, models.py:3256;
    # to_canonical_advisories/the risk pipeline compute doubles) — the
    # API layer renders them decimal-as-string at the boundary, see the
    # PACKAGE/API structs below
    StructField("weighted_severity", DoubleType()),
    StructField("exploitability", DoubleType()),
    StructField("risk_score", DoubleType()),
    StructField("aliases", ArrayType(StringType())),
    StructField("weaknesses", ArrayType(IntegerType())),
    StructField("references", ArrayType(REFERENCE)),
    StructField("severities", ArrayType(SEVERITY)),
])

# one impact = base purl + affecting range + fixed range
# (ImpactedPackage, models.py:3370-3470)
IMPACT = StructType([
    StructField("impact_pk", LongType()),
    StructField("advisory_pk", LongType()),
    StructField("base_purl", StringType()),
    StructField("affecting_vers", StringType()),
    StructField("fixed_vers", StringType()),
    StructField("last_range_unfurl_at", TimestampType()),
])

# concrete package rows (PackageV2, models.py:3720-3790)
PACKAGE = StructType([
    StructField("package_pk", LongType()),
    StructField("type", StringType()),
    StructField("namespace", StringType()),
    StructField("name", StringType()),
    StructField("version", StringType()),
    StructField("qualifiers", StringType()),
    StructField("subpath", StringType()),
    StructField("package_url", StringType()),
    StructField("plain_package_url", StringType()),
    StructField("is_ghost", BooleanType()),
    StructField("risk_score", StringType()),
    StructField("version_rank", IntegerType()),
])

# impact↔package bridges (models.py:3899-3943)
IMPACT_PACKAGE = StructType([
    StructField("impact_pk", LongType()),
    StructField("package_pk", LongType()),
    StructField("relation", StringType()),  # 'affecting' | 'fixed_by'
])

ALIAS = StructType([
    StructField("alias", StringType()),
    StructField("advisory_pk", LongType()),
])

# upstream version dimension (fetchcode results;
# unfurl_version_range.py:165-170)
PACKAGE_VERSIONS = StructType([
    StructField("base_purl", StringType()),
    StructField("version", StringType()),
    StructField("release_date", TimestampType()),
])

EXPLOIT = StructType([
    StructField("advisory_pk", LongType()),
    StructField("data_source", StringType()),
    StructField("description", StringType()),
    StructField("date_added", TimestampType()),
    StructField("required_action", StringType()),
    StructField("due_date", TimestampType()),
    StructField("known_ransomware_campaign_use", BooleanType()),
    StructField("source_url", StringType()),
])

# parse-stage golden output shape (FIXTURES.md §3; importer.py:617-626)
AFFECTED_PACKAGE = StructType([
    StructField("package", StringType()),           # version-less purl
    StructField("affected_version_range", StringType()),
    StructField("fixed_version", StringType()),
])

ADVISORY_PARSED = StructType([
    StructField("advisory_id", StringType()),
    StructField("aliases", ArrayType(StringType())),
    StructField("summary", StringType()),
    StructField("affected_packages", ArrayType(AFFECTED_PACKAGE)),
    StructField("references", ArrayType(REFERENCE)),
    StructField("severities", ArrayType(SEVERITY)),
    StructField("weaknesses", ArrayType(IntegerType())),
    StructField("date_published", TimestampType()),
    StructField("url", StringType()),
])
