"""Elixir (dependabot elixir-security-advisories) importer.

Reference: pipelines/v2_importers/elixir_security_importer.py:80-143 —
one YAML per advisory: ``{description, package, cve, link,
unaffected_versions, patched_versions, disclosure_date}``. The CVE (bare
number → CVE- prefixed) is required; unaffected versions join the
affected range as-is and patched versions (``~>`` stripped) join
INVERTED — a ``>=x`` patched bound becomes ``<x`` affected.

Spark shape: YAML → self-contained mapInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED


def read_elixir(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.yml")
        .load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_elixir(raw)


def parse_elixir(files: DataFrame) -> DataFrame:
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import re

        import pandas as pd
        import yaml

        cve_re = re.compile(r"^CVE-\d{4}-\d{4,19}$")
        # comparator inversion for patched → affected constraints
        invert = {">=": "<", ">": "<=", "<=": ">", "<": ">=", "==": "!=",
                  "=": "!="}

        def one(content, path):
            try:
                d = yaml.safe_load(content) or {}
            except yaml.YAMLError:
                return None
            cve = d.get("cve") or ""
            cve = f"CVE-{cve}" if cve and not str(cve).startswith("CVE-") \
                else str(cve)
            if not cve_re.match(cve):
                return None
            stem = path.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            constraints = []
            for v in d.get("unaffected_versions") or []:
                constraints.append(str(v).strip())
            for v in d.get("patched_versions") or []:
                v = str(v).strip()
                if v.startswith("~>"):
                    v = v[2:].strip()
                m = re.match(r"(>=|<=|==|>|<|=)?\s*(.+)", v)
                op, ver = (m.group(1) or "="), m.group(2)
                constraints.append(f"{invert[op]}{ver}")
            pkg = d.get("package") or ""
            affected = []
            if pkg:
                affected.append({
                    "package": f"pkg:hex/{pkg}",
                    "affected_version_range":
                        "vers:hex/" + "|".join(constraints) if constraints
                        else None,
                    "fixed_version": None,
                })
            refs = []
            if d.get("link"):
                refs.append({"reference_id": None, "reference_type": "",
                             "url": d["link"]})
            date = None
            if d.get("disclosure_date"):
                try:
                    date = pd.Timestamp(str(d["disclosure_date"])).to_pydatetime()
                    if date.tzinfo is not None:
                        date = date.replace(tzinfo=None)
                except ValueError:
                    pass
            return {
                "advisory_id": stem, "aliases": [cve],
                "summary": d.get("description") or "",
                "affected_packages": affected, "references": refs,
                "severities": [], "weaknesses": [], "date_published": date,
                "url": ("https://github.com/dependabot/"
                        f"elixir-security-advisories/blob/master/{stem}.yml"),
            }

        for pdf in batches:
            rows = [r for r in (one(c, p) for c, p in
                                zip(pdf["value"], pdf["path"])) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
