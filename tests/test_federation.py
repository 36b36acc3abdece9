"""Federation adapters (vulntotal parity) — every parser and payload
generator checked against the reference's recorded fixtures, plus the
Spark parse/plan stages and the compare_sources composition."""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

REF = Path("/root/reference/vulntotal/tests/test_data")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference fixtures unavailable")


def _load(path):
    with open(path) as f:
        return json.load(f)


GENERIC_PURL = "pkg:generic/namespace/test"


class TestDeps:
    def test_meta_urls(self):
        from vulnerablecode_spark.federation import deps

        purls = [
            "pkg:pypi/jinja2@2.4.1",
            "pkg:maven/org.apache.tomcat/tomcat@10.1.0-M8",
            "pkg:npm/semver-regex@3.1.3",
            "pkg:golang/github.com/cloudflare/cfrpki@1.4.1",
            "pkg:cargo/rand@0.5.4",
        ]
        assert [deps.meta_url(p) for p in purls] == _load(
            REF / "deps/payloads_meta-expected.json")

    def test_advisories_from_meta(self):
        from vulnerablecode_spark.federation import deps

        meta = _load(REF / "deps/advisories_metadata.txt")
        assert deps.advisories_from_meta(meta) == _load(
            REF / "deps/parsed_advisories_metadata-expected.json")

    def test_advisory_urls(self):
        from vulnerablecode_spark.federation import deps

        advisories = _load(REF / "deps/advisories_metadata.json")
        assert [deps.advisory_url(a) for a in advisories] == _load(
            REF / "deps/payloads_advisories-expected.json")

    def test_parse_advisory(self):
        from vulnerablecode_spark.federation import deps

        text = (REF / "deps/advisory.json").read_text()
        assert deps.parse_response(text, GENERIC_PURL) == _load(
            REF / "deps/parse_advisory-expected.json")


class TestOsv:
    def test_query_payloads(self):
        from vulnerablecode_spark.federation import osv

        cases = {
            "pkg:pypi/jinja2@2.4.1": {
                "version": "2.4.1",
                "package": {"ecosystem": "PyPI", "name": "jinja2"}},
            "pkg:maven/org.apache.tomcat/tomcat@10.1.0-M8": {
                "version": "10.1.0-M8",
                "package": {"ecosystem": "Maven",
                            "name": "org.apache.tomcat:tomcat"}},
            "pkg:linux/Kernel@v5.4.195": {
                "version": "v5.4.195",
                "package": {"ecosystem": "Linux", "name": "Kernel"}},
            "pkg:packagist/dolibarr/dolibarr@12.0.5": {
                "version": "12.0.5",
                "package": {"name": "dolibarr/dolibarr"}},
            "pkg:cargo/sha2@0.9.7": {
                "version": "0.9.7",
                "package": {"ecosystem": "crates.io", "name": "sha2"}},
            "pkg:npm/semver-regex@3.1.3": {
                "version": "3.1.3",
                "package": {"ecosystem": "npm", "name": "semver-regex"}},
            "pkg:golang/github.com/cloudflare/cfrpki@1.1.0": {
                "version": "1.1.0",
                "package": {"ecosystem": "Go",
                            "name": "github.com/cloudflare/cfrpki"}},
        }
        for purl, expected in cases.items():
            assert osv.query_payload(purl) == expected, purl

    def test_parse_advisory(self):
        from vulnerablecode_spark.federation import osv

        text = (REF / "osv/advisory.txt").read_text()
        assert osv.parse_response(text, GENERIC_PURL) == _load(
            REF / "osv/parse_advisory_data-expected.json")


class TestGithub:
    def test_graphql_payloads(self):
        from vulnerablecode_spark.federation import github

        purls = [
            "pkg:pypi/jinja2@2.4.1",
            "pkg:maven/org.apache.tomcat/tomcat@10.1.0-M8",
            "pkg:nuget/moment.js@2.18.0",
            "pkg:npm/semver-regex@3.1.3",
            "pkg:golang/github.com/cloudflare/cfrpki@0.1.0",
            "pkg:composer/symfony/symfony@2.7.1",
            "pkg:cargo/slice-deque@0.1.0",
            "pkg:hex/alchemist.vim@1.3.0",
            "pkg:gem/ftpd@0.0.1",
        ]
        assert [github.graphql_payload(p, "") for p in purls] == _load(
            REF / "github/graphql_payload-expected.json")

    def test_cve_payload(self):
        from vulnerablecode_spark.federation import github

        assert github.graphql_payload_for_cve("CVE-2022-2922") == _load(
            REF / "github/graphql_pyaload_cve-expected.json")

    def test_interesting_edges(self):
        from vulnerablecode_spark.federation import github

        edges = _load(REF / "github/all_edges.json")["edges"]
        assert github.interesting_edges(
            edges, "pkg:pypi/jinja2@2.4.1") == _load(
                REF / "github/extracted_interesting_edge-expected.json")

    def test_parse_edges(self):
        from vulnerablecode_spark.federation import github

        edges = _load(REF / "github/interesting_edge.json")
        assert github.parse_edges(edges, GENERIC_PURL) == _load(
            REF / "github/parse_advisory-expected.json")

    def test_group_advisories_by_package(self):
        from vulnerablecode_spark.federation import github

        response = _load(REF / "github/graphql_cve-2022-2922_response.json")
        assert github.group_advisories_by_package(
            response, "CVE-2022-2922") == _load(
                REF / "github/group_advisory_by_package-expected.json")


class TestGitlab:
    def test_package_slugs(self):
        from vulnerablecode_spark.federation import gitlab

        purls = [
            "pkg:pypi/jinja2@2.4.1",
            "pkg:maven/org.apache.tomcat/tomcat@10.1.0",
            "pkg:npm/semver-regex@3.1.3",
            "pkg:golang/github.com/mattermost/mattermost-server/v6/api4@0.1",
            "pkg:composer/bolt/core@0.1",
            "pkg:nuget/moment.js@2.18.0",
        ]
        assert [gitlab.package_slug(p) for p in purls] == _load(
            REF / "gitlab/package_advisory_url-expected.json")

    def test_parse_yaml_advisories(self):
        from vulnerablecode_spark.federation import gitlab

        folder = (REF / "gitlab/temp_vulntotal_gitlab_datasource/"
                        "gemnasium-db-master-pypi-Jinja2/pypi/Jinja2")
        purl = "pkg:generic/namespace/test@0.1.1"
        results = []
        for path in sorted(folder.iterdir(), key=lambda p: p.name):
            if path.suffix == ".yml":
                results.extend(
                    gitlab.parse_yaml_advisory(path.read_text(), purl))
        assert results == _load(REF / "gitlab/parsed_advisory-expected.json")


class TestSnyk:
    def test_package_advisory_urls(self):
        from vulnerablecode_spark.federation import snyk

        cases = {
            "pkg:pypi/jinja2@2.4.1":
                "https://security.snyk.io/package/pip/jinja2",
            "pkg:maven/org.apache.tomcat/tomcat@10.1.0-M8":
                "https://security.snyk.io/package/maven/"
                "org.apache.tomcat%3Atomcat",
            "pkg:npm/semver-regex@3.1.3":
                "https://security.snyk.io/package/npm/semver-regex",
            "pkg:golang/github.com/mattermost/mattermost-server/v6/api4@0.1":
                "https://security.snyk.io/package/golang/"
                "github.com%2Fmattermost%2Fmattermost-server%2Fv6%2Fapi4",
            "pkg:composer/bolt/core@0.1":
                "https://security.snyk.io/package/composer/bolt%2Fcore",
            "pkg:linux/trafficserver@5.4.1?distro=debain:11":
                "https://security.snyk.io/package/linux/"
                "debain:11/trafficserver",
            "pkg:nuget/moment.js@2.18.0":
                "https://security.snyk.io/package/nuget/moment.js",
            "pkg:cocoapods/ffmpeg@0.2":
                "https://security.snyk.io/package/cocoapods/ffmpeg",
            "pkg:hex/coherence@0.2.1":
                "https://security.snyk.io/package/hex/coherence",
            "pkg:gem/log4j-jars@0.2":
                "https://security.snyk.io/package/rubygems/log4j-jars",
            "pkg:unmanaged/firefox@8.9.1":
                "https://security.snyk.io/api/listing?search=firefox"
                "&type=unmanaged",
        }
        for purl, expected in cases.items():
            assert snyk.package_advisory_url(purl) == expected, purl

    def test_purl_from_advisory_url(self):
        from vulnerablecode_spark.federation import snyk

        cases = {
            "https://security.snyk.io/package/pip/jinja2":
                "pkg:pypi/jinja2",
            "https://security.snyk.io/package/maven/"
            "org.apache.tomcat%3Atomcat": "pkg:maven/org.apache.tomcat/tomcat",
            "https://security.snyk.io/package/npm/@urql%2Fnext":
                "pkg:npm/%40urql/next",
            "https://security.snyk.io/package/npm/meshcentral":
                "pkg:npm/meshcentral",
            "https://security.snyk.io/package/composer/bolt%2Fcore":
                "pkg:composer/bolt/core",
            "https://security.snyk.io/package/linux/debain:11/trafficserver":
                "pkg:linux/trafficserver",
            "https://security.snyk.io/package/golang/"
            "gopkg.in%2Fkubernetes%2Fkubernetes.v0%2Fpkg%2Fregistry%2Fpod":
                "pkg:golang/gopkg.in/kubernetes/kubernetes.v0/pkg/"
                "registry/pod",
            "https://security.snyk.io/package/golang/"
            "golang.org%2Fx%2Fcrypto%2Fssh": "pkg:golang/golang.org/x/"
                                             "crypto/ssh",
            "https://security.snyk.io/package/rubygems/log4j-jars":
                "pkg:gem/log4j-jars",
        }
        for url, expected in cases.items():
            assert snyk.purl_from_advisory_url(url) == expected, url

    @pytest.mark.parametrize("idx", [0, 1, 2, 3])
    def test_parse_html_advisory(self, idx):
        from vulnerablecode_spark.federation import snyk

        page = (REF / f"snyk/html/{idx}.html").read_text()
        result = snyk.parse_html_advisory(
            page, "TEST-SNYKID", ["TEST-AFFECTED"], GENERIC_PURL)
        assert result == _load(REF / f"snyk/html/{idx}.html-expected.json")

    @pytest.mark.parametrize("idx", [4, 5])
    def test_parse_cve_advisory_html(self, idx):
        from vulnerablecode_spark.federation import snyk

        page = (REF / f"snyk/html/{idx}.html").read_text()
        assert snyk.parse_cve_advisory_html(page) == _load(
            REF / f"snyk/html/{idx}.html-expected.json")


class TestOssIndexSafetydbVulnerablecode:
    def test_oss_index_parse(self):
        from vulnerablecode_spark.federation import oss_index

        text = (REF / "oss_index/advisory.json").read_text()
        assert oss_index.parse_response(text, GENERIC_PURL) == _load(
            REF / "oss_index/parse_advisory-expected.json")

    def test_safetydb_parse(self):
        from vulnerablecode_spark.federation import safetydb

        text = (REF / "safetydb/advisory.json").read_text()
        assert safetydb.parse_response(text, "pkg:pypi/flask") == _load(
            REF / "safetydb/parse_advisory-expected.json")

    def test_safetydb_parse_for_cve(self):
        from vulnerablecode_spark.federation import safetydb

        text = (REF / "safetydb/advisory.json").read_text()
        assert safetydb.parse_response_for_cve(
            text, "CVE-2019-1010083") == _load(
                REF / "safetydb/parse_advisory_cve-expected.json")

    def test_vulnerablecode_parse(self):
        from vulnerablecode_spark.federation import vulnerablecode_io

        text = (REF / "vulnerablecode/advisory.json").read_text()
        assert vulnerablecode_io.parse_response(
            text, "pkg:maven/org.apache.tomcat/tomcat@10.1.0-M5") == _load(
                REF / "vulnerablecode/parse_advisory-expected.json")


class TestConstraintDialects:
    def test_github_dialect(self):
        from vulnerablecode_spark.federation.base import \
            github_range_satisfied as sat

        assert sat(">= 7.0.0, <= 7.6.57", "7.1.1")
        assert not sat(">= 10.4.0, <= 10.4.1", "10.6.0")

    def test_snyk_dialect(self):
        from vulnerablecode_spark.federation.base import \
            snyk_range_satisfied as sat

        assert sat(">=4.0.0, <4.0.10.16", "4.0.10.15")
        assert not sat(" >=4.1.0, <4.4.15.7", "4.0.10.15")
        assert sat("[3.0.0,3.1.25)", "3.0.2")

    def test_gitlab_dialect(self):
        from vulnerablecode_spark.federation.base import \
            gitlab_range_satisfied as sat

        assert sat("[7.0.0,7.0.11),[7.2.0,7.2.4)", "7.2.1")
        assert not sat("[7.0.0,7.0.11),[7.2.0,7.2.4)", "8.2.1")
        assert not sat(">=4.0,<4.3||>=5.0,<5.2", "5.4")
        assert sat(">=0.19.0 <0.30.0", "0.24")
        assert not sat(">=1.5,<1.5.2", "2.2")

    def test_spaced_comma_conjunction_keeps_upper_bound(self):
        # regression: ', '-separated tokens must be stripped before the
        # operator-prefix parse, or ' <4.3' loses its upper bound and
        # every version above the lower bound reads as affected
        from vulnerablecode_spark.federation.base import \
            gitlab_range_satisfied as sat

        assert not sat(">=4.0, <4.3", "9.9")
        assert sat(">=4.0, <4.3", "4.2")
        assert not sat(">=4.0, <4.3 || >=5.0, <5.2", "5.4")
        assert sat(">=4.0, <4.3 || >=5.0, <5.2", "5.1")


class TestFedVersionProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _version = st.lists(
        st.one_of(st.integers(0, 99).map(str),
                  st.sampled_from(["a", "rc1", "M8", "beta"])),
        min_size=1, max_size=5).map(".".join)

    @given(_version, _version)
    @settings(max_examples=200, deadline=None)
    def test_comparison_is_antisymmetric_and_total(self, a, b):
        from vulnerablecode_spark.federation.base import FedVersion

        ca = FedVersion(a)._cmp(FedVersion(b))
        cb = FedVersion(b)._cmp(FedVersion(a))
        assert ca == -cb  # antisymmetric
        assert ca in (-1, 0, 1)
        assert FedVersion(a)._cmp(FedVersion(a)) == 0  # reflexive equality

    @given(_version, _version, _version)
    @settings(max_examples=200, deadline=None)
    def test_comparison_prefix_semantics(self, a, b, c):
        # zip-truncated semantics: comparing x with x + "." + anything
        # is always equal (the reference GenericVersion behavior)
        from vulnerablecode_spark.federation.base import FedVersion

        assert FedVersion(a)._cmp(FedVersion(f"{a}.{b}")) == 0
        # and the v/V prefix is insignificant
        assert FedVersion(f"v{a}")._cmp(FedVersion(a)) == 0


class TestSparkStages:
    def test_request_plan_fans_out(self, spark):
        from vulnerablecode_spark.federation import (REQUEST_GENERATORS,
                                                     request_plan)

        purls = spark.createDataFrame(
            [("pkg:pypi/jinja2@2.4.1",), ("pkg:cargo/rand@0.5.4",),
             ("not-a-purl",)], "purl string")
        plan = request_plan(purls, REQUEST_GENERATORS).collect()
        by_purl: dict = {}
        for row in plan:
            by_purl.setdefault(row.purl, set()).add(row.datasource_id)
        # jinja2 is in every registry's supported set
        assert by_purl["pkg:pypi/jinja2@2.4.1"] >= {
            "deps", "github", "gitlab", "osv", "oss_index", "safetydb",
            "snyk", "vulnerablecode"}
        # cargo is not supported by gitlab or safetydb
        assert "gitlab" not in by_purl["pkg:cargo/rand@0.5.4"]
        assert "safetydb" not in by_purl["pkg:cargo/rand@0.5.4"]
        assert "not-a-purl" not in by_purl  # bad purls drop, never fail
        methods = {(r.datasource_id, r.method) for r in plan}
        assert ("osv", "POST") in methods and ("deps", "GET") in methods

    def test_parse_stage_isolates_error_rows(self, spark):
        # fetch_stage emits error/404 rows by design; the parse stage must
        # skip them (and any malformed 200 body) instead of failing the
        # job inside json.loads
        from vulnerablecode_spark.federation import deps

        deps_text = (REF / "deps/advisory.json").read_text()
        frame = spark.createDataFrame(
            [(GENERIC_PURL, deps_text, "200"),
             ("pkg:pypi/down@1.0", "HTTPSConnectionPool: Read timed out",
              "error"),
             ("pkg:pypi/gone@1.0", "Not Found", "404"),
             ("pkg:pypi/bad@1.0", "{truncated json", "200")],
            "purl string, response string, status string")
        rows = deps.parse(frame).collect()
        assert rows, "the healthy row must still parse"
        assert {r.purl for r in rows} == {GENERIC_PURL}

    def test_parse_stage_and_compare(self, spark):
        from vulnerablecode_spark.federation import deps, osv
        from vulnerablecode_spark.operators.compare import compare_sources

        deps_text = (REF / "deps/advisory.json").read_text()
        osv_text = (REF / "osv/advisory.txt").read_text()
        deps_claims = deps.parse(spark.createDataFrame(
            [(GENERIC_PURL, deps_text)], "purl string, response string"))
        osv_claims = osv.parse(spark.createDataFrame(
            [(GENERIC_PURL, osv_text)], "purl string, response string"))
        rows = deps_claims.unionByName(osv_claims).collect()
        assert {r.datasource_id for r in rows} == {"deps", "osv"}
        # normalized claims feed the alignment matrix: CVE from aliases,
        # range agreement across sources
        import pyspark.sql.functions as F

        claims = (deps_claims.unionByName(osv_claims)
                  .select("datasource_id",
                          F.col("purl").alias("base_purl"),
                          F.explode("aliases").alias("cve"),
                          F.concat_ws(",", "affected_versions")
                          .alias("affecting_vers"))
                  .filter(F.col("cve").startswith("CVE-")))
        matrix = {r.cve: r for r in compare_sources(claims).collect()}
        assert matrix, "no aligned CVEs"
        both = [r for r in matrix.values() if r.n_sources == 2]
        assert both, "deps and osv share advisories for the same purl"
        assert all(r.agreement in ("agree", "conflict", "single_source")
                   for r in matrix.values())


class TestFederationHardening:
    def test_snyk_rejects_untagged_page(self):
        # a raw HTML page (no snyk_id tag prefix) must yield NO rows —
        # not garbage aliases built from its first two markup lines
        from vulnerablecode_spark.federation import snyk

        html = (REF / "snyk/html/0.html").read_text()
        assert snyk.parse_response(html, "pkg:pypi/x@1.0") == []

    def test_snyk_filters_ranges_against_version(self):
        from vulnerablecode_spark.federation import snyk

        html = "line\n" * 5  # enough lines to look like a page body
        tagged = "SNYK-TEST-1\n[1.0.0,2.0.0)\n" + html
        # 1.5 inside the chip range → a row; 9.9 outside → filtered out
        assert snyk.parse_response(tagged, "pkg:pypi/x@1.5")
        assert snyk.parse_response(tagged, "pkg:pypi/x@9.9") == []
        # '*' chip keeps every version
        star = "SNYK-TEST-1\n*\n" + html
        assert snyk.parse_response(star, "pkg:pypi/x@9.9")

    def test_github_null_range_edge_is_skipped_not_fatal(self):
        from vulnerablecode_spark.federation import github

        edges = [
            {"node": {"vulnerableVersionRange": None,
                      "advisory": {"identifiers": []}}},
            {"node": {"vulnerableVersionRange": ">= 1.0, < 2.0",
                      "firstPatchedVersion": {"identifier": "2.0"},
                      "advisory": {"identifiers": [
                          {"type": "CVE", "value": "CVE-1"}]}}},
        ]
        kept = github.interesting_edges(edges, "pkg:pypi/x@1.5")
        assert len(kept) == 1  # the null edge skips, the real one stays

    def test_safetydb_missing_specs_confined_to_entry(self):
        from vulnerablecode_spark.federation import safetydb

        db = {"x": [{"cve": "CVE-1", "id": "pyup.io-1"},  # no 'specs'
                    {"cve": "CVE-2", "id": "pyup.io-2",
                     "specs": ["<2.0"]}]}
        rows = safetydb.parse_response(json.dumps(db), "pkg:pypi/x@1.0")
        assert len(rows) == 2
        assert rows[0]["affected_versions"] == []
        assert rows[1]["affected_versions"] == ["<2.0"]

    def test_gitlab_slug_skips_empty_namespace_segment(self):
        from vulnerablecode_spark.federation import gitlab

        assert gitlab.package_slug("pkg:golang/gopls") == "go/gopls"
        assert gitlab.package_slug(
            "pkg:golang/github.com/x/y") == "go/github.com/x/y"

    def test_osv_composer_keeps_vendor_namespace(self):
        from vulnerablecode_spark.federation import osv

        payload = osv.query_payload("pkg:composer/symfony/http-kernel@4.4.0")
        assert payload["package"]["name"] == "symfony/http-kernel"
        assert payload["package"]["ecosystem"] == "Packagist"

    def test_two_phase_bridges_derive_next_plan(self, spark):
        from vulnerablecode_spark.federation import deps, gitlab

        meta = (REF / "deps/advisories_metadata.txt").read_text()
        resp = spark.createDataFrame(
            [("pkg:pypi/jinja2@2.4.1", meta, "200")],
            "purl string, response string, status string")
        plan = deps.phase2_plan(resp).collect()
        assert plan and all(r.method == "GET" for r in plan)
        # one request per advisory descriptor in the metadata
        meta_advisories = deps.advisories_from_meta(json.loads(meta))
        assert len(plan) == len(meta_advisories)
        assert all("advisor" in r.url for r in plan)
        listing = json.dumps([
            {"path": "pypi/jinja2/CVE-2019-10906.yml", "type": "blob"},
            {"path": "pypi/jinja2/README.md", "type": "blob"}])
        resp = spark.createDataFrame(
            [("pkg:pypi/jinja2@2.4.1", listing, "200")],
            "purl string, response string, status string")
        plan = gitlab.phase2_plan(resp).collect()
        assert len(plan) == 1  # only the .yml advisory file
        assert plan[0].url.endswith("pypi/jinja2/CVE-2019-10906.yml")

    def test_github_pagination_bridge(self, spark):
        from vulnerablecode_spark.federation import github

        page1 = json.dumps({"data": {"securityVulnerabilities": {
            "edges": [], "pageInfo": {"hasNextPage": True,
                                      "endCursor": "abc123"}}}})
        done = json.dumps({"data": {"securityVulnerabilities": {
            "edges": [], "pageInfo": {"hasNextPage": False,
                                      "endCursor": None}}}})
        resp = spark.createDataFrame(
            [("pkg:pypi/jinja2@2.4.1", page1, "200"),
             ("pkg:pypi/semver@1.0", done, "200")],
            "purl string, response string, status string")
        plan = github.next_page_plan(resp).collect()
        assert len(plan) == 1  # only the hasNextPage row continues
        assert "abc123" in plan[0].body


class TestCredentialPlaceholders:
    """ADVICE r5: auth tokens must never land in request-plan rows —
    builders emit ${ENV} placeholders; fetch_stage resolves them
    executor-side from the environment."""

    def test_github_plan_rows_carry_no_token(self, monkeypatch):
        import json

        from vulnerablecode_spark.federation import github

        monkeypatch.setenv("GH_TOKEN", "sekrit-live-token")
        req = github.request_for("pkg:pypi/sample@1.0")
        headers = json.dumps(req.get("headers", {}))
        assert "sekrit-live-token" not in headers
        assert "${GH_TOKEN}" in headers

    def test_vcio_plan_rows_carry_no_token(self, monkeypatch):
        import json

        from vulnerablecode_spark.federation import vulnerablecode_io as vcio

        monkeypatch.setenv("VCIO_TOKEN", "sekrit-live-token")
        req = vcio.request_for("pkg:pypi/sample@1.0")
        headers = json.dumps(req.get("headers", {}))
        assert "sekrit-live-token" not in headers
        assert "${VCIO_TOKEN}" in headers

    def test_placeholder_resolution(self, monkeypatch):
        from vulnerablecode_spark.federation.base import \
            resolve_header_placeholders

        monkeypatch.setenv("GH_TOKEN", "abc123")
        monkeypatch.delenv("VCIO_TOKEN", raising=False)
        got = resolve_header_placeholders({
            "Authorization": "bearer ${GH_TOKEN}",
            "X-Other": "Token ${VCIO_TOKEN}",   # unresolved → dropped
            "Accept": "application/json",       # literal → kept
        })
        assert got == {"Authorization": "bearer abc123",
                       "Accept": "application/json"}
        assert resolve_header_placeholders(None) is None
        # every header unresolved → None (request goes unauthenticated)
        assert resolve_header_placeholders(
            {"Authorization": "Token ${VCIO_TOKEN}"}) is None

    def test_unresolved_placeholder_warns_on_stderr(self, monkeypatch,
                                                    capsys):
        """ADVICE r6: on a cluster the executor env may lack the
        driver's token — dropping the header must be VISIBLE, not a
        silent auth downgrade that surfaces only as 4xx rows."""
        from vulnerablecode_spark.federation.base import \
            resolve_header_placeholders

        monkeypatch.delenv("VCIO_TOKEN", raising=False)
        resolve_header_placeholders({"Authorization": "Token ${VCIO_TOKEN}"})
        err = capsys.readouterr().err
        assert "Authorization" in err and "spark.executorEnv" in err


class TestParse2xx:
    """ADVICE r5: any 2xx response is parseable — 203/206 from caching
    proxies must not be silently dropped."""

    def test_parse_stage_accepts_203_and_206(self, spark):
        import json

        from vulnerablecode_spark.federation import base

        def parser(text, purl):
            doc = json.loads(text)
            return [{"purl": purl, "aliases": doc["aliases"],
                     "affected_versions": [], "fixed_versions": []}]

        body = json.dumps({"aliases": ["CVE-2024-1"]})
        frame = spark.createDataFrame(
            [("pkg:pypi/a@1", "s1", "200", body),
             ("pkg:pypi/b@1", "s1", "203", body),
             ("pkg:pypi/c@1", "s1", "206", body),
             ("pkg:pypi/d@1", "s1", "404", body),
             ("pkg:pypi/e@1", "s1", "error", "connection refused")],
            "purl string, datasource_id string, status string, response string")
        got = {r.purl for r in
               base.parse_stage(frame, "s1", parser).collect()}
        assert got == {"pkg:pypi/a@1", "pkg:pypi/b@1", "pkg:pypi/c@1"}

    def test_parse_stage_tolerates_int_status_column(self, spark):
        """ADVICE r6: a caller-built response frame may carry an INT
        status column — the 2xx gate must coerce, not raise
        AttributeError and fail the whole job."""
        import json

        from vulnerablecode_spark.federation import base

        def parser(text, purl):
            doc = json.loads(text)
            return [{"purl": purl, "aliases": doc["aliases"],
                     "affected_versions": [], "fixed_versions": []}]

        body = json.dumps({"aliases": ["CVE-2024-2"]})
        frame = spark.createDataFrame(
            [("pkg:pypi/a@1", "s1", 200, body),
             ("pkg:pypi/b@1", "s1", 404, body)],
            "purl string, datasource_id string, status int, response string")
        got = {r.purl for r in
               base.parse_stage(frame, "s1", parser).collect()}
        assert got == {"pkg:pypi/a@1"}

        def deriver(text, purl):
            return [{"url": f"https://x/{purl}", "method": "GET"}]

        nxt = base.next_request_stage(frame, "s1", deriver)
        assert {r.purl for r in nxt.collect()} == {"pkg:pypi/a@1"}
