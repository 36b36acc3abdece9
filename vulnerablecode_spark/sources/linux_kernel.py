"""Linux kernel CVE fix-commit importer (nluedtke/linux_kernel_cves).

Reference: pipelines/v2_importers/linux_kernel_importer.py:45-157 — the
``data/*_security.txt`` files list, under "CVEs fixed in <version>:"
headers, ``CVE-...: <sha1>`` lines. Each CVE aggregates its (fixed
version, commit) pairs: the commit becomes a torvalds/linux commit
reference on a ``pkg:github/torvalds/linux`` package whose fixed version
is the section header's release.

Spark shape: per-file text parse in mapInPandas emitting (cve, version,
commit) rows, then ONE groupBy(cve) aggregation — the per-CVE collection
the reference builds in a driver dict happens as a distributed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import (AFFECTED_PACKAGE, REFERENCE,
                                          SEVERITY)

KERNEL_URL = "https://github.com/nluedtke/linux_kernel_cves"


def read_linux_kernel(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*_security.txt")
        .load(path)
    )
    return parse_linux_kernel(raw)


def parse_linux_kernel(files: DataFrame) -> DataFrame:
    def extract(batches):
        import re

        import pandas as pd

        cve_re = re.compile(r"CVE-\d{4}-\d{4,19}")
        sha_re = re.compile(r"\b[0-9a-f]{7,40}\b")

        def rows(content):
            fixed_version = None
            for line in content.split("\n"):
                line = line.strip()
                if not line:
                    continue
                if line.startswith("CVEs fixed in"):
                    fixed_version = line.replace("CVEs fixed in", "") \
                        .strip().rstrip(":")
                    continue
                parts = line.split(":", 2)
                if len(parts) < 2:
                    continue
                cve_m = cve_re.search(parts[0])
                sha_m = sha_re.search(parts[1])
                if cve_m and sha_m:
                    yield cve_m.group(0), fixed_version, sha_m.group(0)

        for pdf in batches:
            out = [r for c in pdf["value"] for r in rows(c)]
            yield pd.DataFrame(out, columns=["cve", "fixed_version", "commit"])

    triples = files.mapInPandas(
        extract, "cve string, fixed_version string, commit string")

    refs = F.array_sort(F.collect_set(F.struct(
        F.col("commit").alias("reference_id"),
        F.lit("commit").alias("reference_type"),
        F.concat(F.lit("https://github.com/torvalds/linux/commit/"),
                 F.col("commit")).alias("url"),
    )))
    packages = F.array_sort(F.collect_set(F.struct(
        F.lit("pkg:github/torvalds/linux").alias("package"),
        F.lit(None).cast("string").alias("affected_version_range"),
        F.col("fixed_version").alias("fixed_version"),
    )))
    return triples.groupBy("cve").agg(
        refs.alias("references"), packages.alias("affected_packages")
    ).select(
        F.col("cve").alias("advisory_id"),
        F.array().cast("array<string>").alias("aliases"),
        F.lit("").alias("summary"),
        F.col("affected_packages").cast(
            f"array<{AFFECTED_PACKAGE.simpleString()}>"),
        F.col("references").cast(f"array<{REFERENCE.simpleString()}>"),
        F.array().cast(f"array<{SEVERITY.simpleString()}>").alias("severities"),
        F.array().cast("array<int>").alias("weaknesses"),
        F.lit(None).cast("timestamp").alias("date_published"),
        F.lit(KERNEL_URL).alias("url"),
    )
