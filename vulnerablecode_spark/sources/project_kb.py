"""SAP project-KB MSR2019 fix-commit importer.

Reference: pipelines/v2_importers/project_kb_msr2019_importer.py:21-107 +
pipes/advisory.py:206-265 (classify_patch_source) — a 4-column CSV
``vuln_id, vcs_url, commit_hash, poc``; rows missing any of the first
three are dropped. For supported VCS hosts (github/gitlab/bitbucket) the
repo URL becomes a version-less base purl whose fix commit is recorded;
for other hosts the commit becomes a plain commit reference.

Spark shape: ``spark.read.csv`` + pure Catalyst purl derivation — CSV is
the format Spark ingests natively and in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

KB_URL = ("https://github.com/SAP/project-kb/blob/main/MSR2019/dataset/"
          "vulas_db_msr2019_release.csv")

# vcs host → purl type (pipes/advisory.py VCS_URLS_SUPPORTED_TYPES)
_HOST_TYPE = {"github.com": "github", "gitlab.com": "gitlab",
              "bitbucket.org": "bitbucket"}


def read_project_kb_msr2019(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.option("header", "false").csv(path)
        .toDF("vuln_id", "vcs_url", "commit_hash", "poc")
    )
    return parse_project_kb(raw)


def parse_project_kb(rows: DataFrame) -> DataFrame:
    r = rows.filter(
        F.col("vuln_id").isNotNull() & (F.col("vuln_id") != "")
        & F.col("vcs_url").isNotNull() & (F.col("vcs_url") != "")
        & F.col("commit_hash").isNotNull() & (F.col("commit_hash") != "")
        # the reference skips the header by position; header rows fail the
        # CVE-ish shape anyway
        & (F.col("vuln_id") != "vuln_id")
    )

    host = F.parse_url(F.col("vcs_url"), F.lit("HOST"))
    ptype = F.coalesce(
        *[F.when(host == h, F.lit(t)) for h, t in _HOST_TYPE.items()]
    )
    # owner/repo from the first two path segments
    segs = F.split(F.regexp_replace(F.parse_url(F.col("vcs_url"), F.lit("PATH")),
                                    r"^/|\.git$", ""), "/")
    base_purl = F.when(
        ptype.isNotNull() & (F.size(segs) >= 2),
        F.concat(F.lit("pkg:"), ptype, F.lit("/"),
                 F.lower(F.element_at(segs, 1)), F.lit("/"),
                 F.lower(F.element_at(segs, 2))),
    )

    affected = F.when(
        base_purl.isNotNull(),
        F.array(F.struct(
            base_purl.alias("package"),
            F.lit(None).cast("string").alias("affected_version_range"),
            F.lit(None).cast("string").alias("fixed_version"),
        )),
    ).otherwise(F.array().cast(f"array<{AFFECTED_PACKAGE.simpleString()}>"))

    # the fix commit always lands as a commit reference so it is never lost
    # (supported hosts in the reference carry it on the affected package's
    # fixed_by_commit_patches; our canonical parse schema records it here)
    refs = F.array(F.struct(
        F.col("commit_hash").alias("reference_id"),
        F.lit("commit").alias("reference_type"),
        F.col("vcs_url").alias("url"),
    )).cast(f"array<{REFERENCE.simpleString()}>")

    return r.select(
        F.col("vuln_id").alias("advisory_id"),
        F.array().cast("array<string>").alias("aliases"),
        F.lit("").alias("summary"),
        affected.alias("affected_packages"),
        refs.alias("references"),
        F.array().cast(f"array<{SEVERITY.simpleString()}>").alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.lit(KB_URL).alias("url"),
    )


def read_kb_statements(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.yaml")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_kb_statements(raw)


def parse_kb_statements(files: DataFrame) -> DataFrame:
    """SAP project-KB YAML statements importer.

    Reference: pipelines/v2_importers/project_kb_statements_importer.py —
    each statements/<id>/statement.yaml carries ``vulnerability_id``,
    ``notes`` (text + links → summary + references), ``fixes`` (commits →
    commit references, supported VCS hosts also yield a base purl) and
    ``artifacts`` (purls with affected flags).

    YAML → self-contained mapInPandas.
    """
    from vulnerablecode_spark.schemas import ADVISORY_PARSED

    colnames = [f.name for f in ADVISORY_PARSED]
    host_type = dict(_HOST_TYPE)

    def parse(batches):
        import re

        import pandas as pd
        import yaml

        commit_re = re.compile(r"^[0-9a-f]{7,40}$")

        def base_purl_of(vcs_url):
            m = re.match(r"https?://([^/]+)/([^/]+)/([^/]+?)(\.git)?/?$",
                         vcs_url or "")
            if not m or m.group(1) not in host_type:
                return None
            return (f"pkg:{host_type[m.group(1)]}/{m.group(2).lower()}"
                    f"/{m.group(3).lower()}")

        def one(content, path):
            if not path.endswith("statement.yaml"):
                return None
            try:
                d = yaml.safe_load(content) or {}
            except yaml.YAMLError:
                return None
            vuln_id = d.get("vulnerability_id")
            if not vuln_id:
                return None
            notes, refs = [], []
            for note in d.get("notes") or []:
                if note.get("text"):
                    notes.append(note["text"])
                for link in note.get("links") or []:
                    refs.append({"reference_id": None, "reference_type": "",
                                 "url": link})
            affected = []
            for fix in d.get("fixes") or []:
                for commit in fix.get("commits") or []:
                    commit_hash = commit.get("id")
                    if commit_hash and not commit_re.match(commit_hash):
                        commit_hash = None
                    vcs_url = commit.get("repository")
                    refs.append({"reference_id": commit_hash,
                                 "reference_type": "commit", "url": vcs_url})
                    purl = base_purl_of(vcs_url)
                    if purl and not any(a["package"] == purl
                                        for a in affected):
                        affected.append({"package": purl,
                                         "affected_version_range": None,
                                         "fixed_version": None})
            for artifact in d.get("artifacts") or []:
                purl = artifact.get("id") or ""
                if not purl.startswith("pkg:"):
                    continue
                base = purl.split("@", 1)[0]
                if not any(a["package"] == base for a in affected):
                    affected.append({"package": base,
                                     "affected_version_range": None,
                                     "fixed_version": None})
            return {
                "advisory_id": vuln_id, "aliases": [],
                "summary": "\n".join(notes),
                "affected_packages": affected, "references": refs,
                "severities": [], "weaknesses": [], "date_published": None,
                "url": ("https://github.com/SAP/project-kb/tree/"
                        f"vulnerability-data/statements/{vuln_id}"),
            }

        for pdf in batches:
            rows = [r for r in (one(c, p) for c, p in
                                zip(pdf["value"], pdf["path"])) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
