"""VulnerableCode.io federation adapter (reference:
vulntotal/datasources/vulnerablecode.py). Bulk purl search, then one
vulnerability-detail fetch per hit; the detail document parses into one
VendorData row (affected/fixed versions read off the package purls whose
type matches the queried purl)."""

from __future__ import annotations

import json
from urllib.parse import urljoin

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import parse_stage
from vulnerablecode_spark.kernel.purl import parse_purl

DATASOURCE_ID = "vulnerablecode"
GLOBAL_INSTANCE = "https://public.vulnerablecode.io/"
BULK_SEARCH_PATH = "api/packages/bulk_search/"

SUPPORTED_ECOSYSTEM = {
    "alpine": "alpine", "cargo": "cargo", "composer": "composer",
    "deb": "deb", "golang": "golang", "maven": "maven", "nginx": "nginx",
    "npm": "npm", "nuget": "nuget", "pypi": "pypi", "rpm": "rpm",
    "gem": "gem", "openssl": "openssl",
}


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


def _auth_headers() -> dict:
    """Authorization PLACEHOLDER resolved from $VCIO_TOKEN by
    fetch_stage on the executor (the reference raises VCIOTokenError
    without the env var). The literal token never enters request-plan
    rows; without the env var the header drops and fetch_stage records
    the 4xx as an error row."""
    return {"Authorization": "Token ${VCIO_TOKEN}"}


def request_for(purl: str) -> dict | None:
    p = parse_purl(purl)
    if p.type not in SUPPORTED_ECOSYSTEM or not p.version:
        return None
    req = {"method": "POST",
           "url": urljoin(GLOBAL_INSTANCE, BULK_SEARCH_PATH),
           "body": json.dumps({"purls": [purl]})}
    headers = _auth_headers()
    if headers:
        req["headers"] = headers
    return req


def phase2_requests(text: str, purl: str) -> list[dict]:
    """Phase-1 bulk-search response → vulnerability-detail GET requests
    (each hit's affected_by_vulnerabilities carry their detail URLs)."""
    doc = json.loads(text)
    urls: list[str] = []
    for hit in doc if isinstance(doc, list) else []:
        for vuln in hit.get("affected_by_vulnerabilities") or []:
            if vuln.get("url"):
                urls.append(vuln["url"])
    headers = _auth_headers()
    return [{"method": "GET", "url": u,
             **({"headers": headers} if headers else {})}
            for u in sorted(set(urls))]


def phase2_plan(responses: DataFrame) -> DataFrame:
    """Bridge the two-phase flow: bulk-search responses → the detail
    request plan fetch_stage runs next (base.next_request_stage)."""
    from vulnerablecode_spark.federation.base import next_request_stage

    return next_request_stage(responses, DATASOURCE_ID, phase2_requests)


def parse_advisory(fetched_advisory: dict, purl: str) -> dict:
    """One vulnerability-detail document → VendorData
    (vulnerablecode.py:104-122: affected/fixed package purls filtered to
    the queried purl's type, versions extracted)."""
    p = parse_purl(purl)
    aliases = [a["alias"] for a in fetched_advisory["aliases"]]
    affected, fixed = [], []
    for instance in fetched_advisory["affected_packages"]:
        ap = parse_purl(instance["purl"])
        if ap.type == p.type:
            affected.append(ap.version)
    for instance in fetched_advisory["fixed_packages"]:
        fp = parse_purl(instance["purl"])
        if fp.type == p.type:
            fixed.append(fp.version)
    return {
        "purl": p.versionless.to_string(),
        "aliases": aliases,
        "affected_versions": affected,
        "fixed_versions": fixed,
    }


def parse_response(text: str, purl: str) -> list[dict]:
    """A response holding one or more vulnerability-detail documents."""
    doc = json.loads(text)
    if isinstance(doc, dict):
        doc = [doc]
    return [parse_advisory(adv, purl) for adv in doc]


def parse(responses: DataFrame) -> DataFrame:
    return parse_stage(responses, DATASOURCE_ID, parse_response)
