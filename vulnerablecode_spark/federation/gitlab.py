"""GitLab gemnasium-db federation adapter (reference:
vulntotal/datasources/gitlab.py). Per purl: a repository-tree listing of
the package's advisory directory, then one YAML advisory per file; an
advisory is "interesting" when the queried version satisfies its
``affected_range`` in GitLab's constraint dialect."""

from __future__ import annotations

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import (gitlab_range_satisfied,
                                                  parse_stage)
from vulnerablecode_spark.kernel.purl import parse_purl

DATASOURCE_ID = "gitlab"
TREE_URL = ("https://gitlab.com/api/v4/projects/12006272/repository/tree"
            "?path={slug}")
RAW_URL = ("https://gitlab.com/gitlab-org/security-products/gemnasium-db/"
           "-/raw/master/{path}")

SUPPORTED_ECOSYSTEM = {
    "composer": "packagist", "conan": "conan", "gem": "gem",
    "golang": "go", "maven": "maven", "npm": "npm", "nuget": "nuget",
    "pypi": "pypi",
}


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


def package_slug(purl: str) -> str | None:
    """gemnasium-db directory slug for a purl (gitlab.py:84-104:
    ecosystem dir + name, with namespace/name for maven/composer/go)."""
    p = parse_purl(purl)
    if p.type not in SUPPORTED_ECOSYSTEM:
        return None
    name = p.name
    # only join a REAL namespace: a namespace-less golang purl would
    # otherwise produce 'go//name', an empty path segment the GitLab
    # tree API resolves to nothing (snyk.py/deps.py guard identically)
    if p.type in ("maven", "composer", "golang") and p.namespace:
        name = f"{p.namespace}/{p.name}"
    return f"{SUPPORTED_ECOSYSTEM[p.type]}/{name}"


def request_for(purl: str) -> dict | None:
    slug = package_slug(purl)
    if not slug:
        return None
    return {"method": "GET", "url": TREE_URL.format(slug=slug)}


def yaml_url(file_path: str) -> str:
    return RAW_URL.format(path=file_path)


def phase2_requests(text: str, purl: str) -> list[dict]:
    """Phase-1 tree listing → raw-YAML GET requests for the advisory
    files in the package directory."""
    import json as _json

    listing = _json.loads(text)
    if not isinstance(listing, list):
        return []
    return [{"method": "GET", "url": yaml_url(entry["path"])}
            for entry in listing
            if isinstance(entry, dict)
            and str(entry.get("path", "")).endswith((".yml", ".yaml"))]


def phase2_plan(responses: DataFrame) -> DataFrame:
    """Bridge the two-phase flow: tree listings → the YAML request
    plan fetch_stage runs next (base.next_request_stage)."""
    from vulnerablecode_spark.federation.base import next_request_stage

    return next_request_stage(responses, DATASOURCE_ID, phase2_requests)


def parse_yaml_advisory(yml_text: str, purl: str) -> list[dict]:
    """One gemnasium YAML advisory → VendorData row, IF the purl's
    version satisfies the advisory's ``affected_range``
    (gitlab.py:166-189 semantics)."""
    import yaml  # worker-side import

    p = parse_purl(purl)
    advisory = yaml.safe_load(yml_text) or {}
    affected_range = advisory.get("affected_range")
    if affected_range is None:
        return []
    if not gitlab_range_satisfied(affected_range, p.version):
        return []
    return [{
        "purl": p.versionless.to_string(),
        "aliases": list(advisory.get("identifiers") or []),
        "affected_versions": [affected_range],
        "fixed_versions": list(advisory.get("fixed_versions") or []),
    }]


def parse(responses: DataFrame) -> DataFrame:
    """YAML-advisory response frame → normalized claims frame."""
    return parse_stage(responses, DATASOURCE_ID, parse_yaml_advisory)
