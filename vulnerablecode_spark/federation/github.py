"""GitHub Security Advisories federation adapter (reference:
vulntotal/datasources/github.py). GraphQL securityVulnerabilities query
per purl (wire-format templates kept byte-identical so recorded API
payloads replay); the interesting edges are those whose
``vulnerableVersionRange`` the queried version satisfies, in GitHub's
constraint dialect."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from vulnerablecode_spark.federation.base import (github_range_satisfied,
                                                  parse_stage)
from vulnerablecode_spark.kernel.purl import parse_purl

DATASOURCE_ID = "github"
GRAPHQL_URL = "https://api.github.com/graphql"

SUPPORTED_ECOSYSTEM = {
    "maven": "MAVEN", "nuget": "NUGET", "composer": "COMPOSER",
    "pypi": "PIP", "gem": "RUBYGEMS", "golang": "GO", "cargo": "RUST",
    "npm": "NPM", "hex": "ERLANG", "pub": "PUB",
}

# Wire-format GraphQL templates — kept byte-identical to the reference's
# requests (github.py:124-237) so recorded payload fixtures replay
# exactly.
_PURL_QUERY = """
    query{
        securityVulnerabilities(first: 100, ecosystem: %s, package: "%s", %s){
            edges {
                node {
                    advisory {
                        identifiers {
                            type
                            value
                        }
                        summary
                        references {
                            url
                        }
                        severity
                        publishedAt
                    }
                    firstPatchedVersion{
                        identifier
                    }
                    package {
                        name
                    }
                    vulnerableVersionRange
                }
            }
            pageInfo {
                hasNextPage
                endCursor
            }
        }
    }
    """

_CVE_QUERY = """
    query {
      securityAdvisories(first: 100, identifier: { type: CVE, value: "%s" }) {
        nodes {
          vulnerabilities(first: 100) {
            nodes {
              package {
                ecosystem
                name
              }
              advisory {
                identifiers {
                  type
                  value
                }
              }
              firstPatchedVersion {
                identifier
              }
              vulnerableVersionRange
            }
          }
        }
      }
    }
    """


def supported_ecosystem() -> dict[str, str]:
    return dict(SUPPORTED_ECOSYSTEM)


def graphql_payload(purl: str, end_cursor: str = "") -> dict | None:
    """securityVulnerabilities query body for a purl (github.py:124-196
    parity: maven names as namespace:name, composer/golang as
    namespace/name, optional pagination cursor)."""
    p = parse_purl(purl)
    if p.type not in SUPPORTED_ECOSYSTEM:
        return None
    cursor_expr = f'after: "{end_cursor}"' if end_cursor else ""
    name = p.name
    if p.type == "maven":
        if not p.namespace:
            return None
        name = f"{p.namespace}:{p.name}"
    elif p.type == "composer":
        if not p.namespace:
            return None
        name = f"{p.namespace}/{p.name}"
    elif p.type == "golang" and p.namespace:
        name = f"{p.namespace}/{p.name}"
    return {"query": _PURL_QUERY % (SUPPORTED_ECOSYSTEM[p.type], name,
                                    cursor_expr)}


def graphql_payload_for_cve(cve: str) -> dict:
    """securityAdvisories query body for a CVE (github.py:199-237)."""
    return {"query": _CVE_QUERY % cve}


def request_for(purl: str) -> dict | None:
    payload = graphql_payload(purl)
    if payload is None:
        return None
    req = {"method": "POST", "url": GRAPHQL_URL,
           "body": json.dumps(payload)}
    # api.github.com/graphql rejects unauthenticated requests: emit an
    # Authorization PLACEHOLDER that fetch_stage resolves from $GH_TOKEN
    # on the executor (the reference's github_response reads the same
    # env var). The literal token never enters the request-plan rows —
    # a persisted/checkpointed/logged plan carries only the placeholder;
    # without the env var the header drops and fetch_stage records the
    # 401 as an error row rather than silently contributing zero claims
    req["headers"] = {"Authorization": "bearer ${GH_TOKEN}"}
    return req


def next_page_requests(text: str, purl: str) -> list[dict]:
    """Pagination bridge: a GraphQL response whose
    ``pageInfo.hasNextPage`` is set derives the NEXT page's request
    (the reference's end_cursor loop, vulntotal github.py) — compose
    ``fetch → github.next_page_plan → fetch → …`` until the plan is
    empty, parsing each round's responses as they arrive."""
    doc = json.loads(text)
    info = (((doc.get("data") or {}).get("securityVulnerabilities") or {})
            .get("pageInfo") or {})
    if not info.get("hasNextPage") or not info.get("endCursor"):
        return []
    payload = graphql_payload(purl, end_cursor=info["endCursor"])
    if payload is None:
        return []
    req = {"method": "POST", "url": GRAPHQL_URL,
           "body": json.dumps(payload),
           "headers": {"Authorization": "bearer ${GH_TOKEN}"}}
    return [req]


def next_page_plan(responses: DataFrame) -> DataFrame:
    from vulnerablecode_spark.federation.base import next_request_stage

    return next_request_stage(responses, DATASOURCE_ID, next_page_requests)


def interesting_edges(edges: list, purl: str) -> list:
    """Edges whose vulnerableVersionRange the purl's version satisfies
    (github.py:116-121)."""
    version = parse_purl(purl).version
    # vulnerableVersionRange is nullable in GitHub's GraphQL schema: a
    # single null edge must skip, not crash the whole response row out
    # of parse_stage's per-row isolation (losing every valid edge)
    return [e for e in edges
            if e.get("node", {}).get("vulnerableVersionRange")
            and github_range_satisfied(e["node"]["vulnerableVersionRange"],
                                       version)]


def parse_edges(edges: list, purl: str) -> list[dict]:
    """Interesting edges → VendorData rows (github.py:91-113)."""
    p = parse_purl(purl)
    base = p.versionless.to_string()
    out = []
    for edge in edges:
        node = edge["node"]
        aliases = [ident["value"]
                   for ident in (node.get("advisory") or {})
                   .get("identifiers") or []]
        affected = [node["vulnerableVersionRange"].strip()]
        patched = (node.get("firstPatchedVersion") or {}).get("identifier")
        out.append({
            "purl": base,
            "aliases": sorted(set(aliases)),
            "affected_versions": sorted(set(affected)),
            "fixed_versions": [patched] if patched else [],
        })
    return out


def group_advisories_by_package(response: dict, cve: str) -> list[dict]:
    """CVE-query response → per-package grouped advisory summaries
    (github.py:255-339): vulnerabilities not naming the exact CVE are
    dropped (the API's prefix search also returns e.g. CVE-2022-29221
    for CVE-2022-2922), and rows for the same package accumulate."""
    nodes = response["data"]["securityAdvisories"]["nodes"]
    grouped: list[dict] = []
    for advisory in nodes:
        for vuln in advisory["vulnerabilities"]["nodes"]:
            ids = [i["value"] for i in vuln["advisory"]["identifiers"]]
            if cve not in ids:
                continue
            package = vuln["package"]
            patched = vuln["firstPatchedVersion"]["identifier"]
            vrange = vuln["vulnerableVersionRange"]
            existing = next((g for g in grouped
                             if g["package"] == package), None)
            if existing:
                existing["identifiers"] += ids
                existing["firstPatchedVersion"].append(patched)
                existing["vulnerableVersionRange"].append(vrange)
            else:
                grouped.append({
                    "package": package,
                    "identifiers": ids,
                    "firstPatchedVersion": [patched],
                    "vulnerableVersionRange": [vrange],
                })
    return grouped


def parse_response(text: str, purl: str) -> list[dict]:
    """A securityVulnerabilities response → VendorData rows for the
    edges the purl's version actually satisfies."""
    response = json.loads(text)
    edges = ((response.get("data") or {})
             .get("securityVulnerabilities") or {}).get("edges") or []
    return parse_edges(interesting_edges(edges, purl), purl)


def parse(responses: DataFrame) -> DataFrame:
    return parse_stage(responses, DATASOURCE_ID, parse_response)
