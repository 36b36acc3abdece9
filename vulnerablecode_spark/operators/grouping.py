"""Advisory grouping: content-hash partition + union-find merge.

Reference: pipes/group_advisories.py:143-285 — per (package, relation),
group advisories by the content hash of their affected/fixed purl sets,
then merge groups sharing an advisory_id or alias via union-find
(:182-245), and pick the max-precedence member as primary.

Spark shape (SURVEY.md §2.10): the identifier-share relation is connected
components. Per-package advisory sets are SMALL (a handful of sources per
package), so instead of a GraphFrames dependency the components run as a
grouped ``applyInPandas`` union-find — each group solves in microseconds
while millions of packages distribute across the cluster.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP_SCHEMA = ("package_pk bigint, relation_type string, group_id bigint, "
                "primary_advisory_pk bigint, member_advisory_pk bigint")


def advisory_identifiers(advisories: DataFrame) -> DataFrame:
    """(advisory_pk, identifier) rows: the advisory_id plus every alias —
    the merge keys of the union-find (group_advisories.py:182-245)."""
    ids = advisories.select(
        "advisory_pk", F.col("advisory_id").alias("identifier")
    )
    aliases = advisories.select(
        "advisory_pk", F.explode("aliases").alias("identifier")
    )
    return ids.unionByName(aliases).filter(
        F.col("identifier").isNotNull() & (F.col("identifier") != "")
    ).distinct()


def group_advisories(membership: DataFrame, advisories: DataFrame) -> DataFrame:
    """``membership``: (package_pk, relation_type, advisory_pk) — which
    advisories affect/fix which package. Returns ADVISORY_GROUPS rows.

    Precedence primary: max (precedence, advisory_pk) member
    (group_advisories.py:247-285)."""
    idents = advisory_identifiers(advisories)
    # LEFT join: an advisory with no non-empty advisory_id and no aliases
    # still groups — as its own singleton (null identifier row) — instead
    # of silently vanishing from the output
    enriched = (
        membership.join(idents, "advisory_pk", "left")
        .join(
            advisories.select("advisory_pk",
                              F.coalesce("precedence", F.lit(0)).alias("precedence")),
            "advisory_pk",
        )
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        # union-find over (advisory ↔ identifier) within one package+relation
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

        for adv, ident in zip(pdf["advisory_pk"], pdf["identifier"]):
            if isinstance(ident, str):
                union(("a", adv), ("i", ident))
            else:  # identifier-less advisory: register as its own node
                find(("a", adv))

        roots: dict = {}
        rows = []
        meta = pdf.drop_duplicates("advisory_pk")
        prec = dict(zip(meta["advisory_pk"], meta["precedence"]))
        members: dict = {}
        for adv in prec:
            root = find(("a", adv))
            members.setdefault(root, []).append(adv)
        pkg = pdf["package_pk"].iloc[0]
        rel = pdf["relation_type"].iloc[0]
        for root, advs in members.items():
            primary = max(advs, key=lambda a: (prec[a], a))
            gid = min(advs)  # deterministic group id
            for a in advs:
                rows.append((pkg, rel, gid, primary, a))
        return pd.DataFrame(
            rows, columns=["package_pk", "relation_type", "group_id",
                           "primary_advisory_pk", "member_advisory_pk"],
        )

    return (
        enriched.groupBy("package_pk", "relation_type")
        .applyInPandas(solve, GROUP_SCHEMA)
    )
