"""FireEye / Mandiant Vulnerability-Disclosures importer.

Reference: pipelines/v2_importers/fireeye_importer_v2.py:94-200 — one
markdown per advisory (FEYE-/MNDT- ids): heading-sectioned text where the
title heading carries the summary head, "## Description" the body,
"## CVE Reference"/"## CVE ID" the aliases, "## References" the links and
"## Common Weakness Enumeration" the CWEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED


def read_fireeye(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.md")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_fireeye(raw)


def parse_fireeye(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import re

        import pandas as pd

        cve_re = re.compile(r"CVE-\d{4}-\d{4,19}")
        cwe_re = re.compile(r"CWE-(\d+)")
        url_re = re.compile(r"https?://\S+")

        def md_sections(text):
            """heading line → list of body lines (md_list_to_dict)."""
            text = text.replace("\n\n", "\n")
            lines = text.split("\n")
            sections, key = {}, None
            for line in lines:
                if line.startswith("#"):
                    key = line.strip()
                    sections[key] = []
                elif key is not None:
                    sections[key].append(line)
            return lines, sections

        def build_description(summary, description):
            summary, description = summary.strip(), description.strip()
            if not description:
                return summary
            if summary and summary not in description:
                return "\n".join([summary, description])
            return description

        def one(content, path):
            stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            lines, sections = md_sections(content)
            title_key = lines[0].strip() if lines else ""
            summary = " ".join(sections.get(title_key, []))
            description = " ".join(sections.get("## Description", []))
            aliases, seen = [], set()
            for line in (sections.get("## CVE ID", [])
                         + sections.get("## CVE Reference", [])):
                for cve in cve_re.findall(line):
                    if cve not in seen and cve != stem:
                        seen.add(cve)
                        aliases.append(cve)
            refs = []
            for line in sections.get("## References", []):
                m = url_re.search(line)
                if m:
                    refs.append({"reference_id": None, "reference_type": "",
                                 "url": m.group(0).rstrip(")")})
            weaknesses = sorted({
                int(m) for line in
                sections.get("## Common Weakness Enumeration", [])
                for m in cwe_re.findall(line)})
            impact = " ".join(sections.get("## Impact", [])).strip()
            severities = []
            if impact:
                severities.append({
                    "system": "generic_textual",
                    "value": impact.split(" ")[0],
                    "scoring_elements": "", "published_at": None,
                    "url": None})
            return {
                "advisory_id": stem, "aliases": aliases,
                "summary": build_description(summary, description),
                "affected_packages": [], "references": refs,
                "severities": severities, "weaknesses": weaknesses,
                "date_published": None,
                "url": ("https://github.com/mandiant/Vulnerability-"
                        "Disclosures/blob/master/"
                        + "/".join(path.rsplit("/", 2)[-2:])),
            }

        for pdf in batches:
            rows = [one(c, p) for c, p in zip(pdf["value"], pdf["path"])]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
