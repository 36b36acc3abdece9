"""Apache Kafka CVE-list importer.

Reference: pipelines/v2_importers/apache_kafka_importer.py +
pipes/apache_kafka.py — the cve-list page holds one ``<h2>`` (CVE id +
title) per advisory followed by description paragraphs and a table with
"Versions affected" / "Fixed versions" / "Issue announced" rows. Ranges
parse per pipes/apache_kafka.py:38-86: ``a to b`` → >=a|<=b, bare
version → equality, "and later" stripped; a fixed list of log4j CVEs
skips range parsing entirely.

Spark shape: regex section scan in a self-contained mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

KAFKA_URL = "https://kafka.apache.org/community/cve-list/"

# apache_kafka_importer.py:43-50
CVE_WITHOUT_RANGE = ("CVE-2022-23302", "CVE-2022-23305", "CVE-2022-23307",
                     "CVE-2021-45046", "CVE-2021-44228", "CVE-2021-4104")


def read_apache_kafka(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_apache_kafka(raw)


def parse_apache_kafka(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]
    skip_ranges = set(CVE_WITHOUT_RANGE)
    base_url = KAFKA_URL

    def parse(batches):
        import re

        import pandas as pd

        h2_re = re.compile(r"<h2[^>]*>(.*?)</h2>", re.S)
        tag_re = re.compile(r"<[^>]+>")
        href_re = re.compile(r'href="([^"]+)"')
        cve_re = re.compile(r"CVE-\d{4}-\d{4,19}")
        row_re = re.compile(
            r"<td>\s*([^<]+?)\s*</td>\s*<td>\s*(.*?)\s*</td>", re.S)

        def to_vers(raw_range):
            if ":" in raw_range:
                raw_range = raw_range.partition(":")[-1]
            raw_range = raw_range.replace("to", "-")
            raw_range = raw_range.replace("and", "").replace("later", "")
            constraints = []
            for part in raw_range.split(","):
                part = part.strip()
                if not part:
                    continue
                if "-" not in part:
                    constraints.append(part)  # vers equality = bare version
                    continue
                lo, _, hi = part.partition("-")
                if lo.strip():
                    constraints.append(">=" + lo.strip())
                if hi.strip():
                    constraints.append("<=" + hi.strip())
            return ("vers:apache/" + "|".join(constraints)) if constraints \
                else None

        def one_section(h2_html, body):
            cve_m = cve_re.search(h2_html)
            if not cve_m:
                return None
            cve = cve_m.group(0)
            title = " ".join(tag_re.sub("", h2_html).split())
            href_m = href_re.search(h2_html)
            desc_m = re.search(r"<p>(.*?)</p>", body, re.S)
            description = " ".join(
                tag_re.sub("", desc_m.group(1)).split()) if desc_m else ""
            fields = {tag_re.sub("", k).strip(): " ".join(
                tag_re.sub("", v).split()) for k, v in row_re.findall(body)}
            affected = []
            if cve not in skip_ranges:
                vers = to_vers(fields.get("Versions affected", ""))
                fixed_vers = to_vers(fields.get("Fixed versions", ""))
                fixed = None
                if fixed_vers:
                    m = re.search(r"(\d[\w.+-]*)", fixed_vers)
                    fixed = m.group(1) if m else None
                if vers or fixed:
                    affected.append({
                        "package": "pkg:apache/kafka",
                        "affected_version_range": vers,
                        "fixed_version": fixed,
                    })
            date = None
            if fields.get("Issue announced"):
                try:
                    date = pd.Timestamp(fields["Issue announced"]) \
                        .to_pydatetime().replace(tzinfo=None)
                except ValueError:
                    pass
            summary = title if title in description else (
                f"{title}\n{description}" if description else title)
            if description and title not in description:
                summary = f"{title}\n{description}"
            elif description:
                summary = description
            return {
                "advisory_id": cve, "aliases": [], "summary": summary,
                "affected_packages": affected,
                "references": [{"reference_id": cve, "reference_type": "",
                                "url": href_m.group(1) if href_m else None}],
                "severities": [], "weaknesses": [], "date_published": date,
                "url": f"{base_url}#{cve}",
            }

        def sections(html):
            matches = list(h2_re.finditer(html))
            for i, m in enumerate(matches):
                end = matches[i + 1].start() if i + 1 < len(matches) \
                    else len(html)
                yield m.group(1), html[m.end():end]

        for pdf in batches:
            rows = [r for c in pdf["value"]
                    for r in (one_section(h, b) for h, b in sections(c)) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
