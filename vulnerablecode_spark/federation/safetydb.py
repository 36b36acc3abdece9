"""SafetyDB (pyup.io) federation adapter (reference:
vulntotal/datasources/safetydb.py). One bulk JSON database keyed by
package name; lookups are purely local once fetched."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import parse_stage
from vulnerablecode_spark.kernel.purl import Purl, parse_purl

DATASOURCE_ID = "safetydb"
DB_URL = ("https://raw.githubusercontent.com/pyupio/safety-db/master/"
          "data/insecure_full.json")


def supported_ecosystem() -> dict[str, str]:
    return {"pypi": "PyPI"}


def request_for(purl: str) -> dict | None:
    if parse_purl(purl).type != "pypi":
        return None
    return {"method": "GET", "url": DB_URL}


def parse_response(text: str, purl: str) -> list[dict]:
    """Entries under the purl's package name → VendorData rows
    (safetydb.py:66-84: aliases [cve, id], affected = sorted specs)."""
    db = json.loads(text)
    p = parse_purl(purl)
    base = p.versionless.to_string()
    return [{
        "purl": base,
        "aliases": [adv.get("cve"), adv.get("id")],
        # `or []`: one advisory entry missing 'specs' must cost that
        # entry its ranges, not crash the parser and lose the package's
        # every advisory to parse_stage's per-row isolation
        "affected_versions": sorted(adv.get("specs") or []),
        "fixed_versions": [],
    } for adv in db.get(p.name, [])]


def parse_response_for_cve(text: str, cve: str) -> list[dict]:
    """Whole-database scan for one CVE (safetydb.py:87-109)."""
    db = json.loads(text)
    out = []
    for package, advisories in db.items():
        if package == "$meta":
            continue
        for adv in advisories:
            if adv.get("cve") == cve:
                out.append({
                    "purl": Purl("pypi", "", package).to_string(),
                    "aliases": [adv.get("cve"), adv.get("id")],
                    "affected_versions": sorted(adv.get("specs")),
                    "fixed_versions": [],
                })
    return out


def parse(responses: DataFrame) -> DataFrame:
    return parse_stage(responses, DATASOURCE_ID, parse_response)
