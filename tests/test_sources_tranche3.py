"""Importer tranche 3 golden tests: Xen, Mattermost, npm-legacy,
RetireNet, AOSP, OpenSSL, Elixir, Istio, OSS-Fuzz, FireEye/Mandiant,
linux-kernel, glibc, project-KB statements.

Drives each parser over the reference repo's own fixtures (read-only) or
minimal inline samples of the documented feed shape.
"""

from __future__ import annotations

import json
import os

import pytest

REF = "/root/reference/vulnerabilities/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available")


def _rows_by_id(df):
    return {r.advisory_id: r for r in df.collect()}


class TestXen:
    def test_parse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.xen import read_xen_xsa

        feed = [{"xsas": [
            {"xsa": "431", "title": "x86 spec issue",
             "public_time": "2023-03-21T12:00:00Z",
             "cve": ["CVE-2022-42331"]},
            {"xsa": "440", "title": "another", "public_time": None,
             "cve": []},
        ]}]
        p = tmp_path / "xsa.json"
        p.write_text(json.dumps(feed))
        got = _rows_by_id(read_xen_xsa(spark, str(p)))
        adv = got["XSA-431"]
        assert adv.aliases == ["CVE-2022-42331"]
        assert adv.summary == "x86 spec issue"
        assert adv.references[0].url == \
            "https://xenbits.xen.org/xsa/advisory-431.html"
        assert adv.date_published is not None
        assert got["XSA-440"].date_published is None


class TestMattermost:
    def test_parse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.mattermost import read_mattermost

        feed = [
            {"issue_id": "MMSA-2023-00123, CVE-2023-1234",
             "cve_id": "CVE-2023-1234", "details": "XSS in boards",
             "platform": "Server", "severity": "High",
             "fix_versions": ["v7.8.1", "and 7.9.0"]},
            {"issue_id": "", "cve_id": "not-a-cve", "details": "skipped",
             "platform": "Server", "severity": "Low", "fix_versions": []},
        ]
        p = tmp_path / "security_updates.json"
        p.write_text(json.dumps(feed))
        got = _rows_by_id(read_mattermost(spark, str(p)))
        assert list(got) == ["MMSA-2023-00123"]
        adv = got["MMSA-2023-00123"]
        # remaining valid ids (incl. the duplicated cve_id) are aliases
        assert adv.aliases == ["CVE-2023-1234", "CVE-2023-1234"]
        fixed = {ap.fixed_version for ap in adv.affected_packages}
        assert fixed == {"7.8.1", "7.9.0"}  # v-stripped, "and " removed
        assert adv.affected_packages[0].package == \
            "pkg:github/mattermost/mattermost"
        assert adv.severities[0].system == "cvssv3.1_qr"


class TestNpmLegacy:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.npm_legacy import read_npm_legacy

        got = _rows_by_id(read_npm_legacy(spark, f"{REF}/npm/npm_sample.json"))
        assert len(got) == 1
        adv = next(iter(got.values()))
        assert adv.advisory_id.startswith("npm-")
        ap = adv.affected_packages
        assert ap and ap[0].package.startswith("pkg:npm/")


class TestRetireDotNet:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.retiredotnet import \
            read_retiredotnet

        got = _rows_by_id(read_retiredotnet(spark, f"{REF}/retiredotnet_v2/12.json"))
        adv = got["retiredotnet-12"]
        assert adv.aliases == ["CVE-2019-0564"]
        pkgs = {ap.package for ap in adv.affected_packages}
        assert "pkg:nuget/Microsoft.AspNetCore.WebSockets" in pkgs
        ws = [ap for ap in adv.affected_packages
              if ap.package == "pkg:nuget/Microsoft.AspNetCore.WebSockets"][0]
        assert "2.1.0" in ws.affected_version_range
        assert ws.fixed_version == "2.1.7"
        assert adv.references[0].url == \
            "https://github.com/aspnet/Announcements/issues/334"


class TestAosp:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.aosp import read_aosp

        df = read_aosp(spark, f"{REF}/aosp/CVE-aosp_test1.json")
        rows = df.collect()
        assert rows
        for r in rows:
            assert r.advisory_id.startswith("CVE-")
            for ref in r.references:
                assert ref.reference_type == "commit"


class TestOpenssl:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.openssl import read_openssl

        path = f"{REF}/openssl/release_metadata/secjson"
        got = _rows_by_id(read_openssl(spark, path))
        assert got
        adv = next(iter(got.values()))
        assert adv.advisory_id.startswith("CVE-")
        for a in got.values():
            for ap in a.affected_packages:
                assert ap.package == "pkg:openssl/openssl"
                assert ap.affected_version_range.startswith("vers:openssl/")
            for s in a.severities:
                assert s.system == "openssl"


class TestElixir:
    def test_parse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.elixir import read_elixir

        d = tmp_path / "packages" / "coherence"
        d.mkdir(parents=True)
        src = open(f"{REF}/elixir_security/test_file.yml").read()
        (d / "test_file.yml").write_text(src)
        got = _rows_by_id(read_elixir(spark, str(tmp_path)))
        adv = got["test_file"]
        assert adv.aliases and adv.aliases[0].startswith("CVE-")
        ap = adv.affected_packages[0]
        assert ap.package.startswith("pkg:hex/")
        assert ap.affected_version_range.startswith("vers:hex/")


class TestIstio:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.istio import read_istio

        got = _rows_by_id(read_istio(spark, f"{REF}/istio/test_file.md"))
        assert len(got) == 1
        adv = next(iter(got.values()))
        assert adv.advisory_id.startswith("ISTIO-SECURITY-")
        pkgs = {ap.package for ap in adv.affected_packages}
        assert pkgs == {"pkg:github/istio/istio", "pkg:golang/istio.io/istio"}
        assert all(a.startswith("CVE-") for a in adv.aliases)


class TestOssFuzz:
    def test_parse_delegates_to_osv(self, spark):
        from vulnerablecode_spark.sources.oss_fuzz import read_oss_fuzz

        got = _rows_by_id(read_oss_fuzz(spark, f"{REF}/oss_fuzz"))
        adv = got["OSV-2021-933"]
        assert "Heap-buffer-overflow" in adv.summary
        assert adv.affected_packages[0].package == "pkg:generic/dnsmasq"


class TestFireeye:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.fireeye import read_fireeye

        got = _rows_by_id(read_fireeye(spark, f"{REF}/fireeye_v2"))
        assert "FEYE-2019-0002" in got and "MNDT-2025-0009" in got
        adv = got["FEYE-2019-0002"]
        assert adv.summary
        assert all(a.startswith("CVE-") for a in adv.aliases)


class TestLinuxKernel:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.linux_kernel import \
            read_linux_kernel

        got = _rows_by_id(read_linux_kernel(spark, f"{REF}/linux_kernel"))
        assert got
        adv = next(iter(got.values()))
        assert adv.advisory_id.startswith("CVE-")
        assert adv.references and adv.references[0].reference_type == "commit"
        assert adv.references[0].url.startswith(
            "https://github.com/torvalds/linux/commit/")
        assert adv.affected_packages[0].package == "pkg:github/torvalds/linux"


class TestGlibc:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.glibc import read_glibc

        got = _rows_by_id(read_glibc(spark, f"{REF}/glibc/advisories"))
        adv = got["GLIBC-SA-2023-0001"]
        assert adv.aliases and adv.aliases[0].startswith("CVE-")
        assert "printf" in adv.summary
        assert adv.affected_packages[0].package == "pkg:sid/gnu.org/glibc"
        commit_refs = [r for r in adv.references
                       if r.reference_type == "commit"]
        assert commit_refs
        # expected files are not advisories and must not parse as such
        assert not any(k.endswith("-expected.json") for k in got)


class TestKbStatements:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.project_kb import read_kb_statements

        got = _rows_by_id(read_kb_statements(
            spark, f"{REF}/project-kb/statements"))
        assert "CVE-2018-16406" in got
        for adv in got.values():
            assert adv.advisory_id.startswith("CVE-")


class TestNginx:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.nginx import read_nginx

        got = _rows_by_id(read_nginx(
            spark, f"{REF}/nginx_v2/security_advisories.html"))
        adv = got["CVE-2024-32760"]
        assert adv.summary == "Buffer overwrite in HTTP/3"
        assert adv.severities[0].value == "medium"
        ap = adv.affected_packages[0]
        assert ap.package == "pkg:nginx/nginx"
        assert ap.affected_version_range == \
            "vers:nginx/>=1.25.0|<=1.25.5|1.26.0"
        assert ap.fixed_version == "1.27.0"
        # CVE link kept as reference
        assert any(r.reference_id == "CVE-2024-32760"
                   for r in adv.references)
        # the whole page parses
        assert len(got) >= 30


class TestApacheKafka:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.apache_kafka import \
            read_apache_kafka

        got = _rows_by_id(read_apache_kafka(
            spark, f"{REF}/apache_kafka/cve-list.html"))
        adv = got["CVE-2018-17196"]
        assert "bypass" in adv.summary.lower()
        ap = adv.affected_packages[0]
        assert ap.package == "pkg:apache/kafka"
        assert ap.affected_version_range == \
            "vers:apache/>=0.11.0.0|<=2.1.0|0.10.2.2"
        assert ap.fixed_version == "2.1.1"
        assert adv.date_published is not None
        # log4j CVEs skip range parsing (apache_kafka_importer.py:43-50)
        for skip_cve in ("CVE-2021-44228",):
            if skip_cve in got:
                assert got[skip_cve].affected_packages == []


class TestApacheTomcat:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.apache_tomcat import \
            read_apache_tomcat

        df = read_apache_tomcat(
            spark, f"{REF}/apache_tomcat/apache_tomcat-selected-advisories.html")
        rows = df.collect()
        assert rows
        for r in rows:
            assert r.aliases and r.aliases[0].startswith("CVE-")
            ap = r.affected_packages[0]
            assert ap.package == "pkg:apache/tomcat"
            assert ap.fixed_version  # the Fixed_in header version


class TestPostgresql:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.postgresql import read_postgresql

        got = _rows_by_id(read_postgresql(
            spark, f"{REF}/postgresql/advisories.html"))
        assert got
        adv = next(iter(got.values()))
        assert adv.advisory_id.startswith("CVE-")
        assert adv.affected_packages[0].package.startswith(
            "pkg:generic/postgresql")
        with_scores = [a for a in got.values() if a.severities]
        assert with_scores
        s = with_scores[0].severities[0]
        assert s.system == "cvssv3"
        assert s.scoring_elements.startswith("CVSS:3.0/")


class TestRuby:
    """Golden test over the reference's own ruby-advisory-db fixtures
    (tests/test_data/ruby-v2/{gems,rubies})."""

    def test_parse_reference_fixtures(self, spark):
        from vulnerablecode_spark.sources.ruby import read_ruby

        got = _rows_by_id(read_ruby(spark, f"{REF}/ruby-v2"))
        assert set(got) == {"gems/CVE-2020-5257", "gems/CVE-2024-6531",
                            "rubies/CVE-2022-25857", "rubies/CVE-2011-2686"}

        gem = got["gems/CVE-2020-5257"]
        assert gem.aliases == ["CVE-2020-5257", "GHSA-2p5p-m353-833w"]
        # patched ">= 0.13.0" inverts to the affected range below the fix
        # (importers/ruby.py:121-141 GemVersionRange.invert)
        assert [(p.package, p.affected_version_range)
                for p in gem.affected_packages] == \
            [("pkg:gem/administrate", "vers:gem/<0.13.0")]
        assert gem.summary.startswith(
            "Sort order SQL injection via `direction` parameter")
        assert "\n" in gem.summary            # title + description joined
        assert [(s.system, s.value) for s in gem.severities] == \
            [("cvssv3", "7.7")]
        assert gem.url == ("https://github.com/rubysec/ruby-advisory-db/"
                           "blob/master/gems/CVE-2020-5257.yml")
        assert gem.date_published is not None

        eng = got["rubies/CVE-2011-2686"]
        # engine advisories land on pkg:ruby/<engine>
        assert {p.package for p in eng.affected_packages} == {"pkg:ruby/ruby"}
        assert {p.affected_version_range for p in eng.affected_packages} == \
            {"vers:gem/<1.8.7.352", "vers:gem/>=1.8.6.399"}
        assert [(s.system, s.value) for s in eng.severities] == \
            [("cvssv2", "5.0")]

    def test_pessimistic_operator_and_osvdb_skip(self, spark, tmp_path):
        from vulnerablecode_spark.sources.ruby import read_ruby

        gems = tmp_path / "gems"
        gems.mkdir()
        (gems / "CVE-2099-1.yml").write_text(
            "gem: demo\ncve: 2099-1\nosvdb: 999\n"
            "patched_versions:\n  - \"~> 2.2.3\"\n")
        (gems / "OSVDB-12.yml").write_text("gem: demo\nosvdb: 12\n")
        got = _rows_by_id(read_ruby(spark, str(tmp_path)))
        assert set(got) == {"gems/CVE-2099-1"}          # OSVDB-* skipped
        adv = got["gems/CVE-2099-1"]
        assert adv.aliases == ["CVE-2099-1", "OSV-999"]
        # ~> 2.2.3 → [>=2.2.3, <2.3] → inverted <2.2.3|>=2.3
        assert adv.affected_packages[0].affected_version_range == \
            "vers:gem/<2.2.3|>=2.3"
