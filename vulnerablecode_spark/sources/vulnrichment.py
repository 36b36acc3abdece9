"""CISA vulnrichment importer (CVE JSON 5.x records).

Reference: pipelines/v2_importers/vulnrichment_importer.py:55-217 — one CVE
record per file; severities come from cna+adp ``metrics`` (cvssV4_0 /
cvssV3_1 / cvssV3_0 / cvssV2_0 on their scoring systems, plus "other/ssvc"
evaluated through the SSVC calculator, kev ignored); references from cna
``references`` (tag→type mapping, default OTHER) plus one synthetic NVD
CPE-search reference per distinct affected CPE; weaknesses from
``problemTypes`` (cweId or a CWE-nnn match inside the description text).

Spark shape: Catalyst ``from_json`` handles the fixed shapes, but the SSVC
decision needs the CISA table walk, so the parse runs in one Arrow-batched
``mapInPandas`` whose closure embeds the same decision table as
kernel/ssvc.py (self-contained, pickled by value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.kernel.ssvc import (DECISION_TABLE,
                                              MISSION_WELLBEING_TABLE,
                                              _DECISION_CODES, _POINT_CODES)
from vulnerablecode_spark.schemas import ADVISORY_PARSED

BASE_URL = "https://github.com/cisagov/vulnrichment/blob/develop/"

_CVSS_SYSTEMS = {"cvssV4_0": "cvssv4", "cvssV3_1": "cvssv3.1",
                 "cvssV3_0": "cvssv3", "cvssV2_0": "cvssv2"}
_REF_TYPES = {"exploit": "exploit", "issue-tracking": "bug",
              "mailing-list": "mailing_list", "third-party-advisory": "advisory",
              "vendor-advisory": "advisory", "vdb-entry": "advisory"}


def read_vulnrichment(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true").load(path)
        .select("value", F.col("_metadata.file_path").alias("path"))
    )
    return parse_vulnrichment(raw)


def parse_vulnrichment(files: DataFrame) -> DataFrame:
    cvss_systems = dict(_CVSS_SYSTEMS)
    ref_types = dict(_REF_TYPES)
    base_url = BASE_URL
    # kernel/ssvc.py tables, captured by value so the worker closure is
    # self-contained
    decision_table = dict(DECISION_TABLE)
    mwb_table = dict(MISSION_WELLBEING_TABLE)
    decision_codes = dict(_DECISION_CODES)
    point_codes = {k: (l, dict(m)) for k, (l, m) in _POINT_CODES.items()}
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import json
        import re
        from datetime import datetime, timezone

        import pandas as pd

        def ssvc_vector_and_decision(content):
            opts = {}
            for option in content.get("options", []):
                for k, v in option.items():
                    opts[k] = str(v).lower()
            opts.setdefault("Mission Prevalence", "minimal")
            opts.setdefault("Public Well-being Impact", "material")
            opts["Mission & Well-being"] = mwb_table[
                (opts["Mission Prevalence"], opts["Public Well-being Impact"])]
            vector = "SSVCv2/"
            for key, value in opts.items():
                point = point_codes.get(key)
                if point is None:
                    continue
                letter, codes = point
                vector += f"{letter}:{codes.get(value)}/"
            decision = decision_table.get(
                (opts.get("Exploitation"), opts.get("Automatable"),
                 opts.get("Technical Impact"), opts.get("Mission & Well-being")),
                "")
            if decision:
                vector += f"D:{decision_codes[decision]}/"
            ts = content.get("timestamp")
            if ts:
                try:
                    dt = datetime.fromisoformat(str(ts).replace("Z", "+00:00"))
                    vector += dt.strftime("%Y-%m-%dT%H:%M:%SZ") + "/"
                except ValueError:
                    pass
            return vector, decision

        def one(content, path):
            try:
                raw = json.loads(content)
            except ValueError:
                return None
            meta = raw.get("cveMetadata") or {}
            cve_id = meta.get("cveId")
            if not cve_id:
                return None
            date_published = None
            if meta.get("datePublished"):
                try:
                    date_published = datetime.fromisoformat(
                        str(meta["datePublished"]).replace("Z", "+00:00")
                    ).astimezone(timezone.utc).replace(tzinfo=None)
                except ValueError:
                    pass

            containers = raw.get("containers") or {}
            cna = containers.get("cna") or {}
            adp = containers.get("adp") or []

            summary = ""
            for desc in cna.get("descriptions") or []:
                if desc.get("lang") in ("en", "en-US"):
                    summary = desc.get("value") or ""

            severities = []
            metrics = list(cna.get("metrics") or []) + [
                m for data in adp for m in (data.get("metrics") or [])]
            for metric in metrics:
                for mtype, mvalue in metric.items():
                    if mtype == "other":
                        if (mvalue or {}).get("type") == "ssvc":
                            vector, decision = ssvc_vector_and_decision(
                                (mvalue or {}).get("content") or {})
                            severities.append({
                                "system": "ssvc", "value": decision,
                                "scoring_elements": vector,
                                "published_at": None, "url": None})
                    elif mtype in cvss_systems:
                        severities.append({
                            "system": cvss_systems[mtype],
                            "value": str(mvalue.get("baseScore")),
                            "scoring_elements": mvalue.get("vectorString"),
                            "published_at": None, "url": None})

            cpes = set()
            for product in cna.get("affected") or []:
                if isinstance(product, dict):
                    cpes.update(product.get("cpes") or [])

            references = []
            for ref in cna.get("references") or []:
                rtype = "other"
                for tag in ref.get("tags") or []:
                    if tag in ref_types:
                        rtype = ref_types[tag]
                url = ref.get("url")
                rid = (url or "").rstrip("/").rsplit("/", 1)[-1]
                references.append({"reference_id": rid, "reference_type": rtype,
                                   "url": url})
            for cpe in sorted(cpes):
                references.append({
                    "reference_id": cpe, "reference_type": "other",
                    "url": ("https://nvd.nist.gov/vuln/search/results?"
                            f"adv_search=true&isCpeNameSearch=true&query={cpe}")})

            weaknesses = set()
            for pt in cna.get("problemTypes") or []:
                for desc in pt.get("descriptions") or []:
                    if desc.get("cweId"):
                        m = re.search(r"(\d+)", desc["cweId"])
                        if m:
                            weaknesses.add(int(m.group(1)))
                    if desc.get("description"):
                        m = re.search(r"CWE-(\d+)", desc["description"])
                        if m:
                            weaknesses.add(int(m.group(1)))

            # advisory URL mirrors get_advisory_url: repo-relative blob link
            rel = "/".join(path.rsplit("/", 3)[-3:])
            return {
                "advisory_id": cve_id, "aliases": [], "summary": summary,
                "affected_packages": [], "references": references,
                "severities": severities, "weaknesses": sorted(weaknesses),
                "date_published": date_published, "url": base_url + rel,
            }

        for pdf in batches:
            rows = [r for r in (one(c, p) for c, p in
                                zip(pdf["value"], pdf["path"])) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
