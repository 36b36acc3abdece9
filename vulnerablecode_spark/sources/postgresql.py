"""PostgreSQL security-page importer.

Reference: pipelines/v2_importers/postgresql_importer.py:70-160 — the
security page's first table lists one row per advisory: reference column
(CVE id + links), affected versions, fixed versions, a CVSSv3 score cell
linking the NVD v3 calculator (the ``vector=`` query param carries the
vector), and the summary. Windows-only issues get an os=windows
qualifier.

Spark shape: regex row scan in a self-contained mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

PG_URL = "https://www.postgresql.org/support/security/"


def read_postgresql(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_postgresql(raw)


def parse_postgresql(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]
    page_url = PG_URL

    def parse(batches):
        import re
        from urllib.parse import parse_qs, urljoin, urlparse

        import pandas as pd

        table_re = re.compile(r"<table.*?</table>", re.S)
        tr_re = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S)
        td_re = re.compile(r"<td[^>]*>(.*?)</td>", re.S)
        tag_re = re.compile(r"<[^>]+>")
        cve_re = re.compile(r"CVE-\d{4}-\d{4,19}")
        href_re = re.compile(r'href="([^"]+)"')

        def one_row(row_html):
            cells = td_re.findall(row_html)
            if len(cells) != 5:
                return None
            ref_col, affected_col, fixed_col, score_col, desc_col = cells
            cve_m = cve_re.search(tag_re.sub("", ref_col))
            if not cve_m:
                return None
            summary = " ".join(tag_re.sub("", desc_col).split())
            qualifiers = "?os=windows" if "windows" in summary.lower() else ""
            affected_versions = [v.strip() for v in
                                 tag_re.sub("", affected_col).split(",")
                                 if v.strip()]
            fixed_versions = [v.strip() for v in
                              tag_re.sub("", fixed_col).split(",")
                              if v.strip()]
            affected = []
            if affected_versions or fixed_versions:
                affected.append({
                    "package": "pkg:generic/postgresql" + qualifiers,
                    "affected_version_range":
                        ("vers:generic/" + "|".join(affected_versions))
                        if affected_versions else None,
                    "fixed_version":
                        fixed_versions[0] if fixed_versions else None,
                })
            references = []
            for link in href_re.findall(ref_col):
                if link.startswith("/"):
                    link = urljoin("https://www.postgresql.org/", link)
                references.append({"reference_id": None,
                                   "reference_type": "", "url": link})
            severities = []
            score_link = href_re.search(score_col)
            if score_link and "v3-calculator" in score_link.group(1):
                q = parse_qs(urlparse(score_link.group(1)).query)
                vector = (q.get("vector") or [""])[0]
                if vector:
                    vector = "CVSS:3.0/" + vector.removeprefix("CVSS:3.0/")
                score = " ".join(tag_re.sub("", score_col).split())
                severities.append({
                    "system": "cvssv3", "value": score,
                    "scoring_elements": vector, "published_at": None,
                    "url": None})
            return {
                "advisory_id": cve_m.group(0), "aliases": [],
                "summary": summary, "affected_packages": affected,
                "references": references, "severities": severities,
                "weaknesses": [], "date_published": None, "url": page_url,
            }

        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                tables = table_re.findall(content)
                if not tables:
                    continue
                for row_html in tr_re.findall(tables[0]):
                    r = one_row(row_html)
                    if r:
                        rows.append(r)
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
