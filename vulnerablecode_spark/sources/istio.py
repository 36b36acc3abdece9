"""Istio security-bulletin importer.

Reference: pipelines/v2_importers/istio_importer.py — one markdown per
bulletin with YAML front matter: ``{title: ISTIO-SECURITY-..., cves,
releases, publishdate, description}``. Release phrases become version
constraints ("All releases prior to X" → <X; "All releases X and later"
→ >=X; "A to B" → >=A|<=B; bare release → =X) on BOTH a
``pkg:github/istio/istio`` and a ``pkg:golang/istio.io/istio`` package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED


def read_istio(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.md")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_istio(raw)


def parse_istio(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import re

        import pandas as pd
        import yaml

        cve_re = re.compile(r"^CVE-\d{4}-\d{4,19}$")
        release_re = re.compile(r"^\d[\w.-]*$")

        def fm_split(text):
            lines = text.split("\n")
            if not lines or lines[0].strip() != "---":
                return "", text
            for i in range(1, len(lines)):
                if lines[i].strip() == "---":
                    return "\n".join(lines[1:i]), "\n".join(lines[i + 1:])
            return "", text

        def constraints_of(releases):
            out = []
            for release in releases or []:
                release = str(release).strip()
                if "All releases prior" in release:
                    out.append("<" + release.rpartition(" ")[2])
                elif "All releases" in release and "and later" in release:
                    v = release.replace("All releases", "") \
                        .replace("and later", "").strip()
                    if release_re.match(v):
                        out.append(">=" + v)
                elif "to" in release:
                    lo, _, hi = release.partition("to")
                    out.append(">=" + lo.strip())
                    out.append("<=" + hi.strip())
                elif release_re.match(release):
                    out.append(release)  # vers equality = bare version
            return out

        def one(content, path):
            if path.endswith("_index.md"):
                return None
            front, _ = fm_split(content)
            try:
                d = yaml.safe_load(front) or {}
            except yaml.YAMLError:
                return None
            title = str(d.get("title") or "")
            if not title.startswith("ISTIO-SECURITY-"):
                return None
            constraints = constraints_of(d.get("releases"))
            affected = []
            if constraints:
                vers = "|".join(constraints)
                affected = [
                    {"package": "pkg:github/istio/istio",
                     "affected_version_range": f"vers:github/{vers}",
                     "fixed_version": None},
                    {"package": "pkg:golang/istio.io/istio",
                     "affected_version_range": f"vers:golang/{vers}",
                     "fixed_version": None},
                ]
            date = None
            if d.get("publishdate"):
                try:
                    date = pd.Timestamp(str(d["publishdate"])).to_pydatetime()
                    if date.tzinfo is not None:
                        date = date.replace(tzinfo=None)
                except ValueError:
                    pass
            return {
                "advisory_id": title,
                "aliases": [c for c in (d.get("cves") or [])
                            if cve_re.match(str(c))],
                "summary": d.get("description") or "",
                "affected_packages": affected,
                "references": [{
                    "reference_id": title, "reference_type": "",
                    "url": f"https://istio.io/latest/news/security/{title}/"}],
                "severities": [], "weaknesses": [], "date_published": date,
                "url": ("https://github.com/istio/istio.io/blob/master/"
                        + "/".join(path.rsplit("/", 3)[-3:])),
            }

        for pdf in batches:
            rows = [r for r in (one(c, p) for c, p in
                                zip(pdf["value"], pdf["path"])) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
