"""Apache Tomcat security-page importer.

Reference: pipelines/v2_importers/apache_tomcat_importer.py:267-322
(parse_tomcat_security) — each security page holds
``<h3 id="Fixed_in_Apache_Tomcat_X.Y.Z">`` headers; the following text
container lists per-CVE paragraphs: a ``<strong>`` title with a CVE
link, then an "Affects: ..." paragraph with the affected versions. Each
(CVE, fixed-in version) pair becomes one advisory on the
``pkg:apache/tomcat`` package.

Spark shape: regex section scan in a self-contained mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

TOMCAT_URL = "https://tomcat.apache.org/security"


def read_apache_tomcat(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_apache_tomcat(raw)


def parse_apache_tomcat(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]
    page_url = TOMCAT_URL  # captured by value for the worker closure

    def parse(batches):
        import re

        import pandas as pd

        h3_re = re.compile(
            r'<h3[^>]*id="Fixed_in_Apache_Tomcat[^"]*"[^>]*>(.*?)</h3>', re.S)
        tag_re = re.compile(r"<[^>]+>")
        p_re = re.compile(r"<p>(.*?)</p>", re.S)
        cve_re = re.compile(r"CVE-\d{4}-\d{4,19}")
        strong_re = re.compile(r"<strong>(.*?)</strong>", re.S)
        version_re = re.compile(r"Tomcat\s+([\d.]+)")

        def to_vers(affects_text):
            # "Affects: 9.0.0.M1 to 9.0.43" style lists; also bare versions
            constraints = []
            for part in (affects_text or "").split(","):
                part = part.strip()
                if not part:
                    continue
                if " to " in part:
                    lo, _, hi = part.partition(" to ")
                    constraints.append(">=" + lo.strip())
                    constraints.append("<=" + hi.strip())
                elif re.match(r"^[\d.][\w.-]*$", part):
                    constraints.append(part)
            return ("vers:apache/" + "|".join(constraints)) if constraints \
                else None

        def one_section(header_html, body):
            m = version_re.search(tag_re.sub("", header_html))
            if not m:
                return
            fixed_in = m.group(1)
            current = None
            for p_html in p_re.findall(body):
                strong_m = strong_re.search(p_html)
                cve_m = cve_re.search(p_html)
                text = " ".join(tag_re.sub("", p_html).split())
                if strong_m and cve_m:
                    if current:
                        yield current
                    current = {
                        "cve": cve_m.group(0),
                        "summary": " ".join(
                            tag_re.sub("", strong_m.group(1)).split()),
                        "affects": None, "fixed_in": fixed_in,
                    }
                elif current and text.startswith("Affects:"):
                    current["affects"] = text.replace("Affects:", "").strip()
                    yield current
                    current = None
            if current:
                yield current

        def to_row(item):
            vers = to_vers(item["affects"])
            return {
                "advisory_id": f"{item['cve']}-tomcat-{item['fixed_in']}",
                "aliases": [item["cve"]],
                "summary": item["summary"],
                "affected_packages": [{
                    "package": "pkg:apache/tomcat",
                    "affected_version_range": vers,
                    "fixed_version": item["fixed_in"],
                }],
                "references": [{
                    "reference_id": item["cve"], "reference_type": "",
                    "url": ("https://nvd.nist.gov/vuln/detail/"
                            + item["cve"])}],
                "severities": [], "weaknesses": [], "date_published": None,
                "url": page_url,
            }

        def sections(html):
            matches = list(h3_re.finditer(html))
            for i, m in enumerate(matches):
                end = matches[i + 1].start() if i + 1 < len(matches) \
                    else len(html)
                yield m.group(1), html[m.end():end]

        for pdf in batches:
            rows = [to_row(item) for c in pdf["value"]
                    for h, b in sections(c) for item in one_section(h, b)]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
