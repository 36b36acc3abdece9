"""Fix-commit collection: mine commit references out of advisory references
and normalize VCS URLs.

Reference: pipelines/v2_importers/collect_fix_commits.py (223) +
pipelines/collect_commits.py:110-188 (the VCS URL normalizer). Spark
shape: explode references, classify commit-ish URLs with regexes, and
canonicalize the repo URL — all Catalyst expressions over the references
column, one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# host-specific commit-URL patterns → (repo_url, commit_hash)
_COMMIT_PATTERNS = [
    # github/gitlab/bitbucket style .../{commit|commits}/<sha>
    (r"^(https?://(?:www\.)?(?:github|gitlab|bitbucket)\.[^/]+/[^/]+/[^/]+)"
     r"/(?:-/)?commits?/([0-9a-f]{7,40})", 1, 2),
    # cgit / gitweb style ...?id=<sha>
    (r"^(https?://[^?]+)\?.*\bid=([0-9a-f]{7,40})", 1, 2),
]


def normalize_vcs_url(url: Column) -> Column:
    """Canonical https form of a VCS repo URL (collect_commits.py:110-188):
    git@host:owner/repo(.git) → https://host/owner/repo; strip .git and
    trailing slashes; git+https → https."""
    u = F.trim(url)
    u = F.regexp_replace(u, r"^git\+", "")
    u = F.regexp_replace(u, r"^git@([^:/]+)[:/]", r"https://$1/")
    u = F.regexp_replace(u, r"^git://", "https://")
    # trailing slashes FIRST, then .git — 'repo.git/' must canonicalize
    # like 'repo.git' and 'repo', not keep its suffix
    u = F.regexp_replace(u, r"/+$", "")
    return F.regexp_replace(u, r"\.git$", "")


def collect_fix_commits(advisories: DataFrame) -> DataFrame:
    """(advisory_pk, repo_url, commit_hash, source_url) rows mined from
    reference URLs that point at commits."""
    refs = advisories.select(
        "advisory_pk", F.explode("references").alias("r")
    ).select("advisory_pk", F.col("r.url").alias("url")).filter(
        F.col("url").isNotNull()
    )
    out = None
    for pattern, repo_group, sha_group in _COMMIT_PATTERNS:
        # strip the cgit/gitweb '/commit[s]' view segment before
        # normalizing: the second pattern captures the whole pre-'?'
        # path, which is a VIEW URL, not the repo root — without this a
        # kernel.org-style reference lands under a different repo_url
        # than the same repo's hosting-style references
        repo_col = F.regexp_replace(
            F.regexp_extract(F.col("url"), pattern, repo_group),
            r"/commits?/?$", "")
        hit = refs.filter(F.col("url").rlike(pattern)).select(
            "advisory_pk",
            normalize_vcs_url(repo_col).alias("repo_url"),
            F.regexp_extract(F.col("url"), pattern, sha_group).alias("commit_hash"),
            F.col("url").alias("source_url"),
        )
        out = hit if out is None else out.unionByName(hit)
    return out.filter(F.col("commit_hash") != "").distinct()
