"""nginx security-advisories page importer.

Reference: pipelines/v2_importers/nginx_importer.py:39-262 — the
advisories page lists one ``<li><p>`` per vulnerability whose
``<br>``-separated segments are: summary, "Severity: <level>", links
(advisory / CVE / patch), "Not vulnerable: <ranges>", "Vulnerable:
<ranges>". Ranges are comma-separated with ``a-b`` spans, ``x+``
open-ended bounds and "all"; nginx/Windows marks an os=windows
qualifier. The LAST id-like token (CVE-/CORE-/VU#) is the advisory id,
earlier ones are aliases.

Spark shape: regex segment scan in a self-contained mapInPandas (this
environment has no HTML-DOM library; the page structure is a fixed
``<br>`` list the regexes mirror 1:1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

NGINX_URL = "https://nginx.org/en/security_advisories.html"


def read_nginx(spark: SparkSession, path: str) -> DataFrame:
    raw = spark.read.format("text").option("wholetext", "true").load(path)
    return parse_nginx(raw)


def parse_nginx(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import re

        import pandas as pd

        block_re = re.compile(r"<li><p>(.*?)</p>", re.S)
        tag_re = re.compile(r"<[^>]+>")
        href_re = re.compile(r'href="([^"]+)"')

        def to_vers(ranges_text):
            # NginxVersionRange.from_native: "0.6.18-1.20.0, 1.21.0+" →
            # >=0.6.18|<=1.20.0|>=1.21.0 ; "all" → *
            text = ranges_text.strip()
            if not text:
                return None
            if text.lower() == "all":
                return "vers:nginx/*"
            if text.lower() == "none":
                return None
            constraints = []
            for part in text.split(","):
                part = part.strip()
                if not part:
                    continue
                if part.endswith("+"):
                    constraints.append(">=" + part[:-1])
                elif "-" in part:
                    lo, _, hi = part.partition("-")
                    constraints.append(">=" + lo.strip())
                    constraints.append("<=" + hi.strip())
                else:
                    constraints.append(part)
            return "vers:nginx/" + "|".join(constraints) if constraints else None

        def one_block(block):
            segments = re.split(r"<br\s*/?>", block)
            summary = tag_re.sub("", segments[0]).strip()
            aliases, references, severities = [], [], []
            vulnerable = not_vulnerable = ""
            for seg in segments[1:]:
                text = tag_re.sub("", seg).strip()
                link_m = href_re.search(seg)
                if text.startswith(("CVE-", "CORE-", "VU#")):
                    aliases.append(text)
                    if text.startswith("CVE-"):
                        references.append({
                            "reference_id": text, "reference_type": "",
                            "url": f"https://nvd.nist.gov/vuln/detail/{text}"})
                elif "severity" in text.lower():
                    level = text.partition("Severity:")[2].strip()
                    if level:
                        severities.append({
                            "system": "generic_textual", "value": level,
                            "scoring_elements": "", "published_at": None,
                            "url": None})
                elif text.lower().startswith("not vulnerable"):
                    not_vulnerable = text.partition(":")[2]
                elif "vulnerable" in text.lower():
                    vulnerable = text.partition(":")[2]
                elif link_m:
                    link = link_m.group(1)
                    if not link.startswith("http"):
                        link = "https://nginx.org" + link
                    references.append({"reference_id": None,
                                       "reference_type": "", "url": link})
            if not aliases:
                return None
            advisory_id = aliases.pop()
            qualifiers = ""
            affected_text = vulnerable.strip()
            if "nginx/Windows" in affected_text:
                qualifiers = "?os=windows"
                affected_text = affected_text.replace("nginx/Windows", "").strip()
            affected = []
            vers = to_vers(affected_text)
            # 'Not vulnerable: none' means NO fixed version exists —
            # 'none' must not survive as a literal version string
            fixed_list = [v.strip().rstrip("+") for v in
                          not_vulnerable.split(",")
                          if v.strip() and v.strip().lower() != "none"]
            if vers or fixed_list:
                affected.append({
                    "package": "pkg:nginx/nginx" + qualifiers,
                    "affected_version_range": vers,
                    "fixed_version": fixed_list[0] if fixed_list else None,
                })
            return {
                "advisory_id": advisory_id, "aliases": aliases,
                "summary": summary, "affected_packages": affected,
                "references": references, "severities": severities,
                "weaknesses": [], "date_published": None,
                "url": "https://nginx.org/en/security_advisories.html",
            }

        for pdf in batches:
            rows = [r for c in pdf["value"]
                    for r in map(one_block, block_re.findall(c)) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
