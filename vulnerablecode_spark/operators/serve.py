"""Serving-layer helpers: JSON responses, cached dimensions, pagination.

Reference: the DRF serializer surface (api.py:302-412, api_v3.py:118-252),
the Redis-cached ``package_types`` dimension (api_v3.py:342-355), and
PageNumber pagination (pagination.py:1-6). Spark shape: ``to_json`` over
nested structs for payloads, ``.cache()`` for hot dimensions, and
offset/limit over a stable total order for pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_SIZE = 100  # settings.py:265-267
MAX_PAGE_SIZE = 100  # pagination.py:1-6


def to_json_response(df: DataFrame, id_col: str) -> DataFrame:
    """(id, json) rows: each row serialized as one JSON document — the
    serializer output the API would stream."""
    payload_cols = [c for c in df.columns if c != id_col]
    return df.select(
        F.col(id_col),
        F.to_json(F.struct(*payload_cols)).alias("json"),
    )


def package_types(packages: DataFrame) -> DataFrame:
    """Distinct package-type dimension, cached (api_v3.py:342-355 —
    the Redis cache becomes a cached DataFrame / serving-layer cache)."""
    return packages.select("type").distinct().orderBy("type").cache()


def paginate(df: DataFrame, order_cols: list[str], page: int = 1,
             page_size: int = PAGE_SIZE) -> DataFrame:
    """Stable page slice: total order over unique keys + offset/limit.

    Serving-layer note: at corpus scale an offset deep into the table
    still sorts; for deep pagination prefer keyset pagination (filter
    ``key > last_seen`` + limit), which this helper applies when
    ``page == 1``-style access isn't required.
    """
    size = min(page_size, MAX_PAGE_SIZE)
    return df.orderBy(*order_cols).offset((page - 1) * size).limit(size)


def keyset_page(df: DataFrame, key_col: str, after, page_size: int = PAGE_SIZE) -> DataFrame:
    """Keyset pagination: O(page) instead of O(offset) — the scale path."""
    size = min(page_size, MAX_PAGE_SIZE)
    filtered = df.filter(F.col(key_col) > after) if after is not None else df
    return filtered.orderBy(key_col).limit(size)


def bulk_affected_response(affected: DataFrame,
                           purl_col: str = "purl") -> DataFrame:
    """API v3 bulk-lookup response assembly (api_v3.py:566-890,
    get_affected_advisories_bulk): per requested purl, ONE serialized JSON
    array of advisory objects — identifier = last path segment of the
    avid, aliases minus the identifier, risk fields, distinct fixed-by
    purls, SSVC trees when provided — members sorted by identifier for a
    deterministic payload.

    ``affected`` is the advisories_for_purls-shaped frame exploded to one
    (purl, advisory...) row per hit: columns purl, avid, summary, aliases,
    weighted_severity, exploitability, risk_score, fixed_by_purls and
    optionally ssvc_trees.
    """
    identifier = F.element_at(F.split(F.col("avid"), "/"), -1)
    member_cols = [
        identifier.alias("advisory_id"),
        F.col("avid").alias("advisory_uid"),
        F.array_remove(F.coalesce("aliases", F.array().cast("array<string>")),
                       identifier).alias("aliases"),
        F.coalesce("summary", F.lit("")).alias("summary"),
    ]
    for risk_col in ("weighted_severity", "exploitability", "risk_score"):
        if risk_col in affected.columns:
            member_cols.append(
                F.round(F.col(risk_col), 1).cast("decimal(12,1)")
                .cast("string").alias(risk_col))
    member_cols.append(
        F.coalesce("fixed_by_purls", F.array().cast("array<string>"))
        .alias("fixed_by_packages"))
    if "ssvc_trees" in affected.columns:
        member_cols.append(F.col("ssvc_trees"))
    member = F.struct(*member_cols)
    return (
        affected.groupBy(F.col(purl_col).alias("purl"))
        .agg(F.to_json(F.array_sort(F.collect_list(member)),
                       # DRF serializes null fields explicitly
                       {"ignoreNullFields": "false"}).alias("response"))
    )
