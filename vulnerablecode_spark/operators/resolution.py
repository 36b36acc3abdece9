"""V1 entity resolution: alias → vulnerability linking + VCID minting, and
confidence-ranked relation dedup.

Reference semantics:
- import_runner.py:283-357: all aliases of an advisory must resolve to at
  most ONE existing vulnerability; aliases spanning several
  vulnerabilities are a logged conflict (no-op); unresolved advisories
  mint a fresh VCID (aboutcode/hashid — ``VCID-xxxx-xxxx-xxxx``).
- models.py:1217-1249: on duplicate (package, vulnerability) relations,
  keep the max-confidence row.

Spark shape: groupBy the advisory's alias set against the existing
alias→vulnerability mapping, count distinct targets, branch on the count;
minting is a deterministic digest of the sorted alias set so re-runs are
idempotent. Relation dedup is a row_number window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The reference's base32_custom alphabet (aboutcode/hashid/__init__.py:48-66,
# doctest char class ``[a-hjkm-z1-9]``): drops the confusable 0/i/l/o, KEEPS 1.
VCID_ALPHABET = "abcdefghjkmnpqrstuvwxyz123456789"


def mint_vcid(seed: F.Column) -> F.Column:
    """Deterministic ``VCID-xxxx-xxxx-xxxx`` from a seed string — the
    engine's analogue of aboutcode/hashid/__init__.py:48 (random there;
    deterministic here so distributed re-runs mint identical ids)."""
    digest = F.sha2(seed, 256)
    # 12 alphabet chars from successive hex pairs
    chars = [
        F.element_at(
            F.split(F.lit(VCID_ALPHABET), ""),
            (F.conv(F.substring(digest, 1 + 2 * i, 2), 16, 10).cast("int")
             % len(VCID_ALPHABET)) + 1,
        )
        for i in range(12)
    ]
    quads = [F.concat(*chars[i:i + 4]) for i in (0, 4, 8)]
    return F.concat_ws("-", F.lit("VCID"), *quads)


def resolve_aliases(advisory_aliases: DataFrame,
                    existing: DataFrame | None = None) -> DataFrame:
    """``advisory_aliases``: (advisory_pk, alias); ``existing``:
    (alias, vulnerability_id) mapping. Returns per-advisory resolution:
    (advisory_pk, vulnerability_id, resolution) where resolution ∈
    {matched, minted, conflict} (import_runner.py:283-357)."""
    if existing is not None:
        joined = advisory_aliases.join(existing, "alias", "left")
    else:
        joined = advisory_aliases.withColumn(
            "vulnerability_id", F.lit(None).cast("string"))
    per_advisory = joined.groupBy("advisory_pk").agg(
        F.countDistinct("vulnerability_id").alias("n_targets"),
        F.min("vulnerability_id").alias("target"),
        F.array_sort(F.collect_set("alias")).alias("alias_set"),
    )
    minted = mint_vcid(F.array_join(F.col("alias_set"), "|"))
    return per_advisory.select(
        "advisory_pk",
        F.when(F.col("n_targets") > 1, F.lit(None).cast("string"))
        .when(F.col("n_targets") == 1, F.col("target"))
        .otherwise(minted)
        .alias("vulnerability_id"),
        F.when(F.col("n_targets") > 1, "conflict")
        .when(F.col("n_targets") == 1, "matched")
        .otherwise("minted")
        .alias("resolution"),
    )


def dedupe_relations(relations: DataFrame) -> DataFrame:
    """Keep the max-confidence row per (package_pk, vulnerability_pk,
    relation) (models.py:1217-1249); ties break on created_by for
    determinism."""
    w = Window.partitionBy("package_pk", "vulnerability_pk", "relation").orderBy(
        F.col("confidence").desc(), F.col("created_by").asc()
    )
    return (
        relations.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
