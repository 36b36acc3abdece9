"""Gentoo GLSA importer.

Reference: pipelines/v2_importers/gentoo_importer.py:40-190 — one GLSA XML
per advisory: ``<glsa id=...>`` with ``<references>`` (CVE aliases),
``<synopsis>`` (summary), ``<impact type=...>`` (generic severity) and
``<affected><package name=cat/pkg><unaffected|vulnerable range=.. slot=..>``
entries. Range codes map gt/lt/ge/le/eq/rle/rge/rgt to comparators;
``unaffected`` entries carry the fixed range, ``vulnerable`` the affected
range, both on ``pkg:ebuild/<cat>/<name>`` (slot as qualifier).

Spark shape: wholetext scan → self-contained ElementTree ``mapInPandas``
(same pattern as sources/oval.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.schemas import ADVISORY_PARSED

# gentoo_importer.py:160-170
_COMPARATORS = {"gt": ">", "lt": "<", "ge": ">=", "le": "<=", "eq": "=",
                "rle": "<=", "rge": ">=", "rgt": ">"}


def read_gentoo(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.xml")
        .load(path)
    )
    return parse_gentoo(raw)


def parse_gentoo(files: DataFrame) -> DataFrame:
    comparators = dict(_COMPARATORS)
    colnames = [f.name for f in ADVISORY_PARSED]

    def parse(batches):
        import re
        import xml.etree.ElementTree as ET

        import pandas as pd

        cve_re = re.compile(r"CVE-\d{4}-\d{4,}")

        def one(content):
            try:
                root = ET.fromstring(content)
            except ET.ParseError:
                return None
            glsa_num = root.attrib.get("id", "")
            glsa = "GLSA-" + glsa_num
            cves, summary, severities, affected = [], "", [], []
            for child in root:
                if child.tag == "references":
                    for ref in child:
                        m = cve_re.match((ref.text or "").strip())
                        if m:
                            cves.append(m.group())
                elif child.tag == "synopsis":
                    summary = (child.text or "").strip()
                elif child.tag == "impact":
                    sev = child.attrib.get("type")
                    if sev:
                        severities.append({
                            "system": "generic_textual", "value": sev,
                            "scoring_elements": "", "published_at": None,
                            "url": None})
                elif child.tag == "affected":
                    for pkg in child:
                        name = pkg.attrib.get("name")
                        if not name:
                            continue
                        ns, _, pkg_name = name.rpartition("/")
                        for info in pkg:
                            comparator = comparators.get(info.attrib.get("range"))
                            version = (info.text or "").strip()
                            if not comparator or not version:
                                continue
                            slot = info.attrib.get("slot")
                            purl = f"pkg:ebuild/{ns}/{pkg_name}" if ns \
                                else f"pkg:ebuild/{pkg_name}"
                            if slot:
                                purl += f"?slot={slot}"
                            # vers serializes equality as the bare version
                            vers_cmp = "" if comparator == "=" else comparator
                            vers = f"vers:ebuild/{vers_cmp}{version}"
                            if info.tag == "unaffected":
                                affected.append({
                                    "package": purl,
                                    "affected_version_range": None,
                                    "fixed_version": version if comparator in
                                    (">=", "=") else None})
                            else:
                                affected.append({
                                    "package": purl,
                                    "affected_version_range": vers,
                                    "fixed_version": None})
            return {
                "advisory_id": glsa, "aliases": cves, "summary": summary,
                "affected_packages": affected,
                "references": [{
                    "reference_id": glsa, "reference_type": "",
                    "url": f"https://security.gentoo.org/glsa/{glsa_num}"}],
                "severities": severities, "weaknesses": [],
                "date_published": None,
                "url": f"https://security.gentoo.org/glsa/{glsa_num}",
            }

        for pdf in batches:
            rows = [r for r in (one(c) for c in pdf["value"]) if r]
            yield pd.DataFrame(rows, columns=colnames)

    return files.mapInPandas(parse, ADVISORY_PARSED)
