"""Sonatype OSS Index federation adapter (reference:
vulntotal/datasources/oss_index.py). One POST of purl coordinates; the
component report's vulnerabilities parse one VendorData row each."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import parse_stage
from vulnerablecode_spark.kernel.purl import parse_purl

DATASOURCE_ID = "oss_index"
API_URL = "https://ossindex.sonatype.org/api/v3/component-report"

SUPPORTED_ECOSYSTEM = {
    "cargo": "cargo", "cocoapods": "cocoapods", "composer": "composer",
    "conan": "conan", "conda": "conda", "cran": "cran",
    "golang": "golang", "maven": "maven", "npm": "npm", "nuget": "nuget",
    "pypi": "pypi", "rpm": "rpm", "gem": "gem", "swift": "swift",
}


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


def request_for(purl: str) -> dict | None:
    if parse_purl(purl).type not in SUPPORTED_ECOSYSTEM:
        return None
    return {"method": "POST", "url": API_URL,
            "body": json.dumps({"coordinates": [purl]})}


def parse_response(text: str, purl: str) -> list[dict]:
    """Component report → VendorData rows (oss_index.py:92-116): per
    vulnerability, alias = id, affected = versionRanges (often absent)."""
    component = json.loads(text)
    if not component:
        return []
    p = parse_purl(purl)
    base = p.versionless.to_string()
    return [{
        "purl": base,
        "aliases": [vuln["id"]],
        "affected_versions": list(vuln.get("versionRanges") or []),
        "fixed_versions": [],
    } for vuln in component[0].get("vulnerabilities") or []]


def parse(responses: DataFrame) -> DataFrame:
    return parse_stage(responses, DATASOURCE_ID, parse_response)
