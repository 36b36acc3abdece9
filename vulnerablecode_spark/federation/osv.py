"""OSV.dev federation adapter (reference: vulntotal/datasources/osv.py).

One POST to the query API per purl; the response's ``vulns`` list parses
into one VendorData row per vulnerability (aliases + id, first affected
entry's version enumeration plus range-event introduced/fixed versions).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import parse_stage
from vulnerablecode_spark.kernel.purl import parse_purl

DATASOURCE_ID = "osv"
QUERY_URL = "https://api.osv.dev/v1/query"

SUPPORTED_ECOSYSTEM = {
    "npm": "npm",
    "maven": "Maven",
    "golang": "Go",
    "nuget": "NuGet",
    "pypi": "PyPI",
    "gem": "RubyGems",
    "cargo": "crates.io",
    "composer": "Packagist",
    "linux": "Linux",
    "oss-fuzz": "OSS-Fuzz",
    "deb": "Debian",
    "hex": "Hex",
    "android": "Android",
}


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


def query_payload(purl: str) -> dict | None:
    """OSV query body for a purl (osv.py:118-171 parity: maven names as
    namespace:name, packagist/golang as namespace/name, linux only for
    the kernel package — nuget's name-search fallback needs the network
    and is left to the fetch tier)."""
    p = parse_purl(purl)
    payload: dict = {"version": p.version}
    package: dict = {}
    payload["package"] = package
    if p.type in SUPPORTED_ECOSYSTEM:
        package["ecosystem"] = SUPPORTED_ECOSYSTEM[p.type]
    if p.type == "maven":
        if not p.namespace:
            return None
        package["name"] = f"{p.namespace}:{p.name}"
    elif p.type in ("composer", "packagist"):
        # 'composer' is the real purl type for Packagist packages; the
        # reference's branch tests the literal 'packagist' (osv.py:146),
        # which no parseable purl carries — a dead branch that silently
        # dropped every vendor namespace from composer queries. Fixed
        # here (deliberate deviation, noted for parity auditing).
        if not p.namespace:
            return None
        package["name"] = f"{p.namespace}/{p.name}"
    elif p.type == "linux":
        if p.name not in ("kernel", "Kernel"):
            return None
        package["name"] = "Kernel"
    elif p.type == "golang" and p.namespace:
        package["name"] = f"{p.namespace}/{p.name}"
    else:
        package["name"] = p.name
    return payload


def request_for(purl: str) -> dict | None:
    payload = query_payload(purl)
    if payload is None:
        return None
    return {"method": "POST", "url": QUERY_URL,
            "body": json.dumps(payload)}


def parse_response(text: str, purl: str) -> list[dict]:
    """OSV query response → VendorData rows (osv.py:76-115): per vuln,
    aliases ∪ {id}; affected[0].versions plus range-event introduced
    versions as affected; range-event fixed versions as fixed."""
    response = json.loads(text)
    p = parse_purl(purl)
    base = p.versionless.to_string()
    out = []
    for vuln in response.get("vulns") or []:
        aliases = list(vuln.get("aliases") or [])
        if vuln.get("id"):
            aliases.append(vuln["id"])
        affected_versions: list[str] = []
        fixed: list[str] = []
        affected = vuln.get("affected") or []
        first = affected[0] if affected else {}
        affected_versions.extend(first.get("versions") or [])
        ranges = first.get("ranges") or []
        events = (ranges[0].get("events") or []) if ranges else []
        affected_versions.extend(
            e["introduced"] for e in events if e.get("introduced"))
        fixed.extend(e["fixed"] for e in events if e.get("fixed"))
        out.append({
            "purl": base,
            "aliases": sorted(set(aliases)),
            "affected_versions": sorted(set(affected_versions)),
            "fixed_versions": sorted(set(fixed)),
        })
    return out


def parse(responses: DataFrame) -> DataFrame:
    return parse_stage(responses, DATASOURCE_ID, parse_response)
