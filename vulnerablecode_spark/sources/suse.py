"""SUSE CVSS severity-score importer.

Reference: pipelines/v2_importers/suse_score_importer.py:20-77 — one YAML
map ``{CVE-id: {cvss: [{version, score, vector}, ...]}}``; each supported
CVSS version (2.0 / 3 / 3.1 / 4) becomes one severity on the matching
scoring system; entries missing score or vector are dropped. Advisories
carry only severities (no packages) — this source exists to RELATE scores
onto CVEs (operators/relate.py).

Spark shape: YAML is the one format Catalyst can't parse, so the file is
parsed in a self-contained Arrow-batched ``mapInPandas`` closure (pickled
by value — workers don't need this package importable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

SUSE_URL = "https://ftp.suse.com/pub/projects/security/yaml/suse-cvss-scores.yaml"

# suse_score_importer.py:43-48
_SYSTEM_BY_VERSION = {"2.0": "cvssv2", "3": "cvssv3", "3.1": "cvssv3.1",
                      "4": "cvssv4"}


def read_suse_scores(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_suse_scores(raw)


def parse_suse_scores(files: DataFrame) -> DataFrame:
    systems = dict(_SYSTEM_BY_VERSION)
    url = SUSE_URL
    colnames = [f.name for f in ADVISORY_PARSED]  # captured by value

    def parse(batches):
        import pandas as pd
        import yaml

        def one_file(content):
            try:
                data = yaml.safe_load(content) or {}
            except yaml.YAMLError:
                return
            for cve_id in data:
                severities = []
                for s in (data[cve_id] or {}).get("cvss") or []:
                    system = systems.get(str(s.get("version") or ""))
                    score, vector = s.get("score"), s.get("vector")
                    if not system or score is None or not vector:
                        continue
                    severities.append({
                        "system": system, "value": str(score),
                        "scoring_elements": vector,
                        "published_at": None, "url": url,
                    })
                yield {
                    "advisory_id": cve_id, "aliases": [], "summary": "",
                    "affected_packages": [], "references": [],
                    "severities": severities, "weaknesses": [],
                    "date_published": None, "url": url,
                }

        for pdf in batches:
            rows = [r for c in pdf["value"] for r in one_file(c)]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
