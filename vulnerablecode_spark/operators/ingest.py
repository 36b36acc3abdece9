"""Ingest: parsed advisories → the canonical SCD2 advisory table.

Mirrors insert_advisory_v2 (pipes/advisory.py:292-420): compute the
canonical content id, dedupe identical content, maintain exactly one
``is_latest`` row per avid (conditional unique constraint
models.py:3303-3307), materialize impacts. Set-oriented: the content id is
one Arrow-batched UDF pass, dedup is a window, is_latest is the SCD2
window re-flag (index advisory_latest_by_avid_idx, models.py:3309-3312).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def content_id_udf(canonical_json: pd.Series) -> pd.Series:
    """sha256 content id over the canonical advisory JSON — self-contained
    closure mirroring kernel.contentid (utils.py:623-726): sorted keys,
    sorted+deduped lists, compact separators."""
    import hashlib
    import json

    def canon(value):
        if isinstance(value, dict):
            return {k: canon(v) for k, v in sorted(value.items())}
        if isinstance(value, list):
            normalized = [canon(v) for v in value]
            keyed = {json.dumps(v, sort_keys=True, separators=(",", ":"),
                                default=str): v for v in normalized}
            return [keyed[k] for k in sorted(keyed)]
        return value

    def cid(js):
        if js is None:
            return None
        data = canon(json.loads(js))
        blob = json.dumps(data, sort_keys=True, separators=(",", ":"), default=str)
        return hashlib.sha256(blob.encode("utf-8")).hexdigest()

    return canonical_json.map(cid)


def _norm_text(col: "F.Column") -> "F.Column":
    """normalize_text semantics (utils.py:612-616 / kernel.contentid
    normalize_whitespace): null → '', trim, collapse whitespace runs —
    so 'a  b', ' a b ' and a null-vs-'' summary hash identically."""
    return F.regexp_replace(F.trim(F.coalesce(col, F.lit(""))), r"\s+", " ")


def with_content_id(parsed: DataFrame) -> DataFrame:
    """Attach unique_content_id (compute_content_id_v2 fields,
    utils.py:694-726): text fields whitespace-normalized, null lists as
    empty lists, and the constant empty ``patches`` key the reference
    always includes (ADVISORY_PARSED carries no patches — no shipped
    source emits them) — so content-equal advisories hash equal
    regardless of null-vs-empty or whitespace variance, matching
    kernel.contentid.content_id on flat records."""
    payload = F.to_json(
        F.struct(
            _norm_text(F.col("advisory_id")).alias("advisory_id"),
            F.coalesce(F.col("aliases"),
                       F.array().cast("array<string>")).alias("aliases"),
            _norm_text(F.col("summary")).alias("summary"),
            F.coalesce(F.col("affected_packages"), F.array().cast(
                parsed.schema["affected_packages"].dataType.simpleString()))
            .alias("affected_packages"),
            F.coalesce(F.col("references"), F.array().cast(
                parsed.schema["references"].dataType.simpleString()))
            .alias("references"),
            F.coalesce(F.col("severities"), F.array().cast(
                parsed.schema["severities"].dataType.simpleString()))
            .alias("severities"),
            F.coalesce(F.col("weaknesses"),
                       F.array().cast("array<int>")).alias("weaknesses"),
            F.array().cast("array<string>").alias("patches"),
            F.coalesce(F.col("url"), F.lit("")).alias("url"),
        )
    )
    return parsed.withColumn("unique_content_id", content_id_udf(payload))


def to_canonical_advisories(parsed: DataFrame, datasource_id: str,
                            pipeline_id: str, date_collected=None) -> DataFrame:
    """ADVISORY_PARSED rows → ADVISORY table rows (models.py:3123-3318):
    avid, content id, deterministic surrogate pk, is_latest flag."""
    df = with_content_id(parsed)
    df = (
        df.withColumn("datasource_id", F.lit(datasource_id))
        .withColumn("pipeline_id", F.lit(pipeline_id))
        .withColumn("avid", F.concat_ws("/", "datasource_id", "advisory_id"))
        .withColumn(
            "date_collected",
            F.lit(date_collected).cast("timestamp")
            if date_collected is not None else F.current_timestamp(),
        )
        .withColumn("advisory_pk", F.xxhash64("avid", "unique_content_id"))
        .withColumn("status", F.lit(1))
        .withColumn("precedence", F.lit(None).cast("int"))
        # risk columns exist from birth (filled by the risk pipeline) so the
        # stored table always matches schemas.ADVISORY
        .withColumn("weighted_severity", F.lit(None).cast("double"))
        .withColumn("exploitability", F.lit(None).cast("double"))
        .withColumn("risk_score", F.lit(None).cast("double"))
    )
    # same (avid, content) collected twice → keep one row (get_or_create
    # dedup, pipes/advisory.py:320-336)
    w_dup = Window.partitionBy("avid", "unique_content_id").orderBy("date_collected")
    df = df.withColumn("_rn", F.row_number().over(w_dup)).filter(F.col("_rn") == 1).drop("_rn")
    return flag_latest(df)


def flag_latest(advisories: DataFrame) -> DataFrame:
    """Recompute is_latest: newest content version per avid
    (pipes/advisory.py:340-346; ordering mirrors models.py:3309-3312)."""
    w = Window.partitionBy("avid").orderBy(
        F.col("date_collected").desc(), F.col("advisory_pk").desc()
    )
    return advisories.withColumn(
        "is_latest", F.row_number().over(w) == 1
    )


def merge_advisories(existing: DataFrame | None, incoming: DataFrame) -> DataFrame:
    """SCD2 batch merge: new content versions append, identical content
    dedupes on (avid, unique_content_id) keeping the EARLIEST collection
    (remove_duplicate_advisories.py keep-oldest rule), is_latest re-flags.
    On Delta this is MERGE INTO + the window re-flag; on parquet it is a
    union-rewrite of the touched avid partitions."""
    merged = incoming if existing is None else existing.unionByName(incoming)
    w_dup = Window.partitionBy("avid", "unique_content_id").orderBy(
        F.col("date_collected").asc(), F.col("advisory_pk").asc()
    )
    deduped = (
        merged.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1).drop("_rn")
    )
    return flag_latest(deduped)


def extract_impacts(advisories: DataFrame) -> DataFrame:
    """Explode nested affected_packages into the impacts table
    (ImpactedPackage creation, pipes/advisory.py:380-419)."""
    exploded = advisories.select(
        "advisory_pk", F.explode("affected_packages").alias("ap")
    )
    return exploded.select(
        F.xxhash64("advisory_pk", F.col("ap.package"),
                   F.col("ap.affected_version_range")).alias("impact_pk"),
        "advisory_pk",
        F.col("ap.package").alias("base_purl"),
        F.col("ap.affected_version_range").alias("affecting_vers"),
        F.when(F.col("ap.fixed_version").isNotNull(),
               F.concat(F.lit("vers:"),
                        F.regexp_extract("ap.affected_version_range",
                                         r"^vers:([^/]+)/", 1),
                        F.lit("/>="), F.col("ap.fixed_version"))
               ).alias("fixed_vers"),
        F.col("ap.fixed_version").alias("fixed_version"),
        F.lit(None).cast("timestamp").alias("last_range_unfurl_at"),
    )


def extract_aliases(advisories: DataFrame) -> DataFrame:
    """Nested aliases → the alias bridge table (AdvisoryAlias,
    models.py:2802)."""
    return advisories.select(
        "advisory_pk", F.explode("aliases").alias("alias")
    ).distinct()
