"""glibc security-advisories importer (GLIBC-SA text files).

Reference: pipelines/v2_importers/glibc_importer.py:50-178 — each
advisories/GLIBC-SA-* file is ``summary\\n\\ndescription\\n\\nmetadata``
where metadata lines are ``Name: value``; ``*-Commit`` lines carry
``<sha> (<version>)``. Vulnerable-Commit versions are the affected
versions, Fix-Commit versions the fixed versions; fix commits become
sourceware glibc commit references on a ``pkg:sid/gnu.org/glibc``
package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

GLIBC_GIT = "https://sourceware.org/git/glibc.git"


def read_glibc(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_glibc(raw)


def parse_glibc(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]
    git_url = GLIBC_GIT

    def parse(batches):
        import pandas as pd

        def one(content, path):
            name = path.rsplit("/", 1)[-1]
            # advisory files are extension-less GLIBC-SA-YYYY-NNNN names
            if not name.startswith("GLIBC-SA") or "." in name:
                return None
            summary, _, tail = content.partition("\n\n")
            description, _, metadata = tail.partition("\n\n")
            cve_id = None
            date = None
            affected_versions, fixed = [], []
            for line in metadata.splitlines():
                key, _, value = line.partition(": ")
                if key.endswith(("Commit", "Backport")):
                    commit, _, version = value.partition(" ")
                    version = version.strip(")(")
                    if key == "Fix-Commit":
                        fixed.append((commit, version))
                    elif key == "Vulnerable-Commit":
                        affected_versions.append(version)
                elif key == "CVE-Id":
                    cve_id = value.strip()
                elif key == "Public-Date":
                    try:
                        date = pd.Timestamp(value.strip()).to_pydatetime()
                        if date.tzinfo is not None:
                            date = date.replace(tzinfo=None)
                    except ValueError:
                        pass
            affected = []
            if affected_versions or fixed:
                affected.append({
                    "package": "pkg:sid/gnu.org/glibc",
                    "affected_version_range":
                        ("vers:generic/"
                         + "|".join(sorted(set(affected_versions))))
                        if affected_versions else None,
                    "fixed_version": fixed[0][1] if fixed else None,
                })
            refs = [{"reference_id": c, "reference_type": "commit",
                     "url": git_url} for c, _ in fixed]
            return {
                "advisory_id": name,
                "aliases": [cve_id] if cve_id else [],
                "summary": (summary.strip() + "\n"
                            + description.strip()).strip(),
                "affected_packages": affected, "references": refs,
                "severities": [], "weaknesses": [], "date_published": date,
                "url": ("https://sourceware.org/git/?p=glibc-advisories.git"
                        f";f=advisories/{name}"),
            }

        for pdf in batches:
            rows = [r for r in (one(c, p) for c, p in
                                zip(pdf["value"], pdf["path"])) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
