"""deps.dev federation adapter (reference: vulntotal/datasources/deps.py).

Two-phase protocol: a dependencies-metadata request per purl, whose
response lists advisory (source, sourceID) pairs, each fetched as its own
advisory document. Both payload generators and the advisory parser are
fixture-verified against the reference's recorded deps.dev responses.
"""

from __future__ import annotations

import json
from urllib.parse import quote

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import parse_stage
from vulnerablecode_spark.kernel.purl import parse_purl

DATASOURCE_ID = "deps"

SUPPORTED_ECOSYSTEM = {
    "npm": "npm",
    "maven": "maven",
    "golang": "go",
    "pypi": "pypi",
    "cargo": "cargo",
}

_META_URL = "https://deps.dev/_/s/{ecosystem}/p/{package}/v/{version}/dependencies"
_ADVISORY_URL = "https://deps.dev/_/advisory/{source}/{source_id}"


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


def meta_url(purl: str) -> str | None:
    """Dependencies-metadata URL for a purl (deps.py:116-148 parity:
    maven coordinates percent-encoded as namespace:name, go modules as
    namespace/name with a forced v-prefix version)."""
    p = parse_purl(purl)
    if p.type not in SUPPORTED_ECOSYSTEM:
        return None
    version = p.version
    name = p.name
    if p.type == "maven":
        if not p.namespace:
            return None
        name = quote(f"{p.namespace}:{p.name}", safe="")
    elif p.type == "golang":
        if p.namespace:
            name = quote(f"{p.namespace}/{p.name}", safe="")
        if not version.startswith("v"):
            version = f"v{version}"
    return _META_URL.format(ecosystem=SUPPORTED_ECOSYSTEM[p.type],
                            package=name, version=version)


def request_for(purl: str) -> dict | None:
    url = meta_url(purl)
    return {"method": "GET", "url": url} if url else None


def advisory_url(advisory_meta: dict) -> str:
    return _ADVISORY_URL.format(source=advisory_meta["source"],
                                source_id=advisory_meta["sourceID"])


def advisories_from_meta(meta: dict) -> list[dict]:
    """Advisory descriptors from a dependencies-metadata response: every
    dependency's ``advisories`` list, concatenated (deps.py:93-108)."""
    out: list[dict] = []
    for dependency in meta.get("dependencies") or []:
        out.extend(dependency.get("advisories") or [])
    return out


def phase2_requests(text: str, purl: str) -> list[dict]:
    """Phase-1 metadata response → advisory-document GET requests."""
    return [{"method": "GET", "url": advisory_url(a)}
            for a in advisories_from_meta(json.loads(text))]


def phase2_plan(responses: DataFrame) -> DataFrame:
    """Bridge the two-phase flow: metadata responses → the advisory
    request plan fetch_stage runs next (base.next_request_stage)."""
    from vulnerablecode_spark.federation.base import next_request_stage

    return next_request_stage(responses, DATASOURCE_ID, phase2_requests)


def parse_response(text: str, purl: str) -> list[dict]:
    """One advisory document → VendorData rows: affected/unaffected
    version lists from the first package entry, sorted distinct aliases
    (deps.py:70-91)."""
    advisory = json.loads(text)
    if not advisory or not advisory.get("packages"):
        return []
    p = parse_purl(purl)
    package = advisory["packages"][0]
    affected = [e["version"] for e in package["versionsAffected"]]
    fixed = [e["version"] for e in package["versionsUnaffected"]]
    return [{
        "purl": p.versionless.to_string(),
        "aliases": sorted(set(advisory["aliases"])),
        "affected_versions": sorted(set(affected)),
        "fixed_versions": sorted(set(fixed)),
    }]


def parse(responses: DataFrame) -> DataFrame:
    """Advisory-response frame → normalized claims frame."""
    return parse_stage(responses, DATASOURCE_ID, parse_response)
