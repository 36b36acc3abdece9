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
