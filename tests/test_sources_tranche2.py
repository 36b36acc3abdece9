"""Importer tranche 2 golden tests: RedHat CSAF, Arch Linux, curl, Alpine,
project-KB, SUSE scores, vulnrichment, Apache HTTPD, Mozilla, Gentoo.

Each test drives the Spark parser over the REFERENCE repo's own test
fixtures (read-only inputs) and asserts the semantics the reference's
pipeline tests assert (ids, aliases, ranges, severities, weaknesses) —
the golden-fixture strategy of SURVEY.md §5.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF = "/root/reference/vulnerabilities/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available")


def _rows_by_id(df):
    return {r.advisory_id: r for r in df.collect()}


class TestRedHatCSAF:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.redhat import read_redhat_csaf

        got = _rows_by_id(read_redhat_csaf(spark, f"{REF}/redhat/csaf_2_0"))
        assert "RHSA-2010:0002" in got
        rhsa = got["RHSA-2010:0002"]
        assert rhsa.url.endswith("2010/rhsa-2010_0002.json")
        # per-vulnerability CVE list becomes the aliases
        assert any(a.startswith("CVE-") for a in rhsa.aliases)
        # notes concatenated, disclaimer excluded
        assert rhsa.summary and "legal" not in rhsa.summary.lower()
        # aggregate severity on the rhas system when present
        for row in got.values():
            for s in row.severities:
                assert s.system == "rhas"
        # rpm purls: version-less base + vers:rpm/<fixed
        packaged = [r for r in got.values() if r.affected_packages]
        assert packaged
        ap = packaged[0].affected_packages[0]
        assert ap.package.startswith("pkg:rpm/redhat/")
        assert "@" not in ap.package
        assert ap.affected_version_range == f"vers:rpm/<{ap.fixed_version}"

    def test_bugzilla_references_are_bug_typed(self, spark):
        from vulnerablecode_spark.sources.redhat import read_redhat_csaf

        df = read_redhat_csaf(spark, f"{REF}/redhat/csaf_2_0")
        refs = df.select(F.explode("references").alias("r")).select("r.*")
        bz = refs.filter(F.col("url").startswith("https://bugzilla.redhat.com/"))
        assert bz.count() > 0
        assert bz.filter(F.col("reference_type") != "bug").count() == 0


class TestArchLinux:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.archlinux import read_archlinux

        got = _rows_by_id(read_archlinux(spark, f"{REF}/archlinux.json"))
        avg = got["AVG-1146"]
        assert avg.aliases[:3] == ["CVE-2020-11945", "CVE-2019-12521",
                                   "CVE-2019-12519"]
        assert avg.summary == "multiple issues"
        ap = avg.affected_packages[0]
        assert ap.package == "pkg:alpm/archlinux/squid"
        assert ap.affected_version_range == "vers:alpm/4.10-2"
        assert ap.fixed_version is None
        assert avg.severities[0].system == "archlinux"
        assert avg.severities[0].value == "Critical"
        assert avg.url == "https://security.archlinux.org/AVG-1146.json"


class TestCurl:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.curl import read_curl

        got = _rows_by_id(read_curl(
            spark, f"{REF}/curl/curl_advisory_mock1.json"))
        adv = got["CURL-CVE-2024-2379"]
        # advisory_id removed from aliases (curl_importer.py:120-121)
        assert adv.aliases == ["CVE-2024-2379"]
        ap = adv.affected_packages[0]
        assert ap.package == "pkg:generic/curl.se/curl"
        assert ap.affected_version_range == "vers:generic/8.6.0"
        assert ap.fixed_version == "8.7.0"
        assert adv.weaknesses == [295]
        assert adv.severities[0].system == "cvssv3.1"
        assert adv.severities[0].value == "Low"
        assert adv.url == "https://curl.se/docs/CVE-2024-2379.json"
        assert adv.date_published is not None


class TestAlpine:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.alpine import read_alpine_secdb

        df = read_alpine_secdb(spark, f"{REF}/alpine/v3.11")
        rows = df.collect()
        assert rows
        # advisory_id = name/distroversion/version/vuln_id; aliases include
        # the vuln_id itself (parse_vuln_ids returns aliases[0] as vuln_id)
        for r in rows:
            parts = r.advisory_id.split("/")
            assert len(parts) == 4 and parts[1] == "v3.11"
            assert parts[3] in r.aliases
            for ap in r.affected_packages:
                assert ap.package.startswith("pkg:apk/alpine/")
                assert "distroversion=v3.11" in ap.package
                assert ap.affected_version_range == \
                    f"vers:alpine/<{ap.fixed_version}"
        # arch fan-out: v3.11 main.json declares 7 archs
        multi = [r for r in rows if len(r.affected_packages) == 7]
        assert multi, "expected one purl per arch"

    def test_empty_packages_file_yields_nothing(self, spark):
        from vulnerablecode_spark.sources.alpine import read_alpine_secdb

        df = read_alpine_secdb(spark, f"{REF}/alpine/v3.3")
        assert df.count() == 0


class TestProjectKB:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.project_kb import \
            read_project_kb_msr2019

        df = read_project_kb_msr2019(
            spark, f"{REF}/project-kb/MSR2019/dataset")
        got = _rows_by_id(df)
        adv = got["CVE-2017-4971"]
        assert adv.references[0].reference_id == \
            "57f2ccb66946943fbf3b3f2165eac1c8eb6b1523"
        assert adv.references[0].reference_type == "commit"
        assert adv.affected_packages[0].package == \
            "pkg:github/spring-projects/spring-webflow"
        # non-CVE ids are still advisories (COLLECTIONS-580)
        assert "COLLECTIONS-580" in got


class TestSuseScores:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.suse import read_suse_scores

        got = _rows_by_id(read_suse_scores(
            spark, f"{REF}/suse_scores_v2/suse-cvss-scores.yaml"))
        adv = got["CVE-2004-0230"]
        by_system = {s.system: s for s in adv.severities}
        assert by_system["cvssv2"].value == "4.3"
        assert by_system["cvssv2"].scoring_elements == \
            "AV:N/AC:M/Au:N/C:N/I:N/A:P"
        assert by_system["cvssv3.1"].value == "3.7"
        # version "3" maps to cvssv3, version "4" to cvssv4
        assert got["CVE-2003-1605"].severities[0].system == "cvssv3"
        v4 = [s for s in got["CVE-2010-20103"].severities
              if s.system == "cvssv4"]
        assert v4 and v4[0].value == "9.3"


class TestVulnrichment:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.vulnrichment import \
            read_vulnrichment

        got = _rows_by_id(read_vulnrichment(
            spark, f"{REF}/vulnrichment/vulnrichment-data1.json"))
        adv = got["CVE-2024-3018"]
        assert "Essential Addons" in adv.summary
        by_system = {s.system: s for s in adv.severities}
        assert by_system["cvssv3.1"].value == "8.8"
        assert by_system["cvssv3.1"].scoring_elements.startswith("CVSS:3.1/")
        # the SSVC metric evaluates through the CISA table to the exact
        # reference vector+decision (vulnrichment-data1-expected.json)
        assert by_system["ssvc"].value == "Track"
        assert by_system["ssvc"].scoring_elements == \
            "SSVCv2/E:N/A:N/T:P/P:M/B:A/M:M/D:T/2024-04-01T17:33:59Z/"


class TestApacheHTTPD:
    def test_parse_cve40(self, spark):
        from vulnerablecode_spark.sources.apache_httpd import \
            read_apache_httpd

        got = _rows_by_id(read_apache_httpd(
            spark, f"{REF}/apache_httpd/CVE-2022-28614.json"))
        adv = got["CVE-2022-28614"]
        assert adv.weaknesses == [190, 200]
        assert adv.url == \
            "https://httpd.apache.org/security/json/CVE-2022-28614.json"
        assert adv.severities[0].system == "apache_httpd"
        ap = adv.affected_packages
        assert ap and ap[0].package == "pkg:apache/httpd"
        assert "vers:apache/" in ap[0].affected_version_range

    def test_parse_cve50(self, spark):
        from vulnerablecode_spark.sources.apache_httpd import \
            read_apache_httpd

        got = _rows_by_id(read_apache_httpd(
            spark, f"{REF}/apache_httpd/CVE-2021-44224.json"))
        adv = got["CVE-2021-44224"]
        assert adv.advisory_id == "CVE-2021-44224"
        assert adv.summary


class TestMozilla:
    def test_parse_yml_fans_out_per_cve(self, spark, tmp_path):
        from vulnerablecode_spark.sources.mozilla import read_mozilla

        d = tmp_path / "announce" / "2022"
        d.mkdir(parents=True)
        src = open(f"{REF}/mozilla/mfsa2022-01.yml").read()
        (d / "mfsa2022-01.yml").write_text(src)
        got = _rows_by_id(read_mozilla(spark, str(tmp_path)))
        adv = got["mfsa2022-01/CVE-2022-22746"]
        assert adv.aliases == ["CVE-2022-22746"]
        assert "race condition" in adv.summary.lower()
        assert adv.severities[0].value == "high"
        ap = adv.affected_packages[0]
        assert ap.package == "pkg:mozilla/Firefox"
        assert ap.fixed_version == "96"
        assert adv.references[0].url == \
            "https://www.mozilla.org/en-US/security/advisories/mfsa2022-01"

    def test_parse_md_front_matter(self, spark, tmp_path):
        from vulnerablecode_spark.sources.mozilla import read_mozilla

        d = tmp_path / "announce"
        d.mkdir(parents=True)
        src = open(f"{REF}/mozilla/mfsa2006-02.md").read()
        (d / "mfsa2006-02.md").write_text(src)
        got = _rows_by_id(read_mozilla(spark, str(tmp_path)))
        adv = got["mfsa2006-02"]
        # description extracted from the paragraphs under <h3>Description</h3>
        assert "freed memory" in adv.summary
        # impact Moderate → medium
        assert adv.severities[0].value == "medium"
        fixed = {ap.package: ap.fixed_version for ap in adv.affected_packages}
        # versions with 3 dots (1.5.0.1 / 1.5.0.2) are skipped as invalid
        # SemVer (mozilla_importer.py:202-203) -- only SeaMonkey 1.0 remains,
        # matching the reference's expected-md.json
        assert "pkg:mozilla/Firefox" not in fixed
        assert fixed["pkg:mozilla/SeaMonkey"] == "1.0"
        assert adv.date_published is not None

    def test_front_matter_split(self):
        from vulnerablecode_spark.sources.mozilla import \
            split_markdown_front_matter

        yml, md = split_markdown_front_matter("---\na: 1\n---\nbody")
        assert yml == "a: 1" and md == "body"
        yml, md = split_markdown_front_matter("no front matter")
        assert yml == "" and md == "no front matter"


class TestGentoo:
    def test_parse(self, spark):
        from vulnerablecode_spark.sources.gentoo import read_gentoo

        got = _rows_by_id(read_gentoo(
            spark, f"{REF}/gentoo_v2/glsa-201709-09.xml"))
        adv = got["GLSA-201709-09"]
        assert adv.aliases == ["CVE-2017-9800"]
        assert "command injection" in adv.summary.lower()
        assert adv.url == "https://security.gentoo.org/glsa/201709-09"
        ranges = {ap.affected_version_range for ap in adv.affected_packages
                  if ap.affected_version_range}
        # vulnerable lt → <1.9.7, eq → bare version (vers equality)
        assert ranges == {"vers:ebuild/<1.9.7", "vers:ebuild/0.1.1"}
        fixed = {ap.fixed_version for ap in adv.affected_packages
                 if ap.fixed_version}
        assert fixed == {"1.9.7"}  # unaffected ge → fixed version
        for ap in adv.affected_packages:
            assert ap.package == "pkg:ebuild/dev-vcs/subversion"
