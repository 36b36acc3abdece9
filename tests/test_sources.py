"""Source-parser tests: GitLab YAML and Debian tracker JSON → canonical
parsed advisories (golden-shape checks per FIXTURES.md §2)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

GITLAB_YAML = """\
identifier: GMS-2024-1
package_slug: pypi/sample
title: Sample overflow
description: A buffer overflow in sample.
date: '2024-03-03'
pubdate: '2024-03-01'
affected_range: '>=1.0,<1.2'
fixed_versions:
- 1.2.0
urls:
- https://gitlab.com/advisories/GMS-2024-1
cvss_v3: CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H
identifiers:
- GMS-2024-1
- CVE-2024-5555
cwe_ids:
- CWE-120
"""

DEBIAN_TRACKER = {
    "curl": {
        "CVE-2024-7777": {
            "description": "curl vuln",
            "releases": {
                "bookworm": {"status": "resolved", "urgency": "medium",
                             "fixed_version": "7.88.1-1",
                             "repositories": {"bookworm": "7.88.0-1"}},
                "sid": {"status": "open", "urgency": "low",
                        "repositories": {"sid": "8.0.0-1"}},
            },
        },
        "CVE-2024-8888": {
            "description": "ignored urgency",
            "releases": {
                "bookworm": {"status": "resolved", "urgency": "unimportant",
                             "fixed_version": "0",
                             "repositories": {"bookworm": "7.88.0-1"}},
            },
        },
    },
}


class TestGitlabSource:
    def test_parse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.gitlab import read_gitlab

        d = tmp_path / "gitlab" / "pypi" / "sample"
        d.mkdir(parents=True)
        (d / "GMS-2024-1.yml").write_text(GITLAB_YAML)
        got = read_gitlab(spark, str(tmp_path / "gitlab")).collect()
        assert len(got) == 1
        row = got[0]
        assert row.advisory_id == "GMS-2024-1"
        assert row.aliases == ["CVE-2024-5555"]
        ap = row.affected_packages[0]
        assert ap.package == "pkg:pypi/sample"
        assert ap.affected_version_range == "vers:pypi/>=1.0|<1.2"
        assert ap.fixed_version == "1.2.0"
        assert row.weaknesses == [120]
        assert row.severities[0].system == "cvssv3"
        assert row.date_published is not None


class TestDebianSource:
    def test_parse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.debian import read_debian_tracker

        p = tmp_path / "tracker.json"
        p.write_text(json.dumps(DEBIAN_TRACKER))
        got = read_debian_tracker(spark, str(p))
        rows = {r.advisory_id: r for r in got.collect()}
        assert set(rows) == {"CVE-2024-7777", "CVE-2024-8888"}

        r = rows["CVE-2024-7777"]
        assert r.aliases == ["CVE-2024-7777"]
        by_release = {ap.package: ap for ap in r.affected_packages}
        bookworm = by_release["pkg:deb/debian/curl?distro=bookworm"]
        assert bookworm.affected_version_range == "vers:deb/<7.88.1-1"
        assert bookworm.fixed_version == "7.88.1-1"
        sid = by_release["pkg:deb/debian/curl?distro=sid"]
        assert sid.affected_version_range == "vers:deb/*"
        assert sid.fixed_version is None
        # urgency severities: medium + low kept
        assert {s.value for s in r.severities} == {"medium", "low"}

        # 'unimportant' urgency and fixed_version '0' are filtered
        r2 = rows["CVE-2024-8888"]
        assert r2.severities == []
        assert r2.affected_packages[0].fixed_version is None

    def test_canonicalizes_through_ingest(self, spark, tmp_path):
        from vulnerablecode_spark.operators.ingest import to_canonical_advisories
        from vulnerablecode_spark.sources.debian import read_debian_tracker

        p = tmp_path / "tracker.json"
        p.write_text(json.dumps(DEBIAN_TRACKER))
        adv = to_canonical_advisories(
            read_debian_tracker(spark, str(p)), "debian", "debian_importer_v2",
            "2024-03-01 00:00:00")
        assert adv.count() == 2
        assert adv.filter(F.col("is_latest")).count() == 2


OVAL_XML = """<?xml version='1.0' encoding='utf-8'?>
<oval_definitions xmlns="http://oval.mitre.org/XMLSchema/oval-definitions-5"
                  xmlns:linux="http://oval.mitre.org/XMLSchema/oval-definitions-5#linux">
  <definitions>
    <definition class="vulnerability" id="oval:test:def:1" version="1">
      <metadata>
        <title>CVE-2001-1593</title>
        <description>demo vuln</description>
        <debian><date>2014-03-31</date></debian>
      </metadata>
      <criteria operator="AND">
        <criterion comment="release" test_ref="oval:test:tst:1"/>
        <criterion comment="pkg earlier than fix" test_ref="oval:test:tst:2"/>
      </criteria>
    </definition>
    <definition class="inventory" id="oval:test:def:2" version="1"/>
  </definitions>
  <tests>
    <linux:dpkginfo_test id="oval:test:tst:2" version="1">
      <linux:object object_ref="oval:test:obj:1"/>
      <linux:state state_ref="oval:test:ste:1"/>
    </linux:dpkginfo_test>
  </tests>
  <objects>
    <linux:dpkginfo_object id="oval:test:obj:1" version="1">
      <linux:name>a2ps</linux:name>
    </linux:dpkginfo_object>
  </objects>
  <states>
    <linux:dpkginfo_state id="oval:test:ste:1" version="1">
      <linux:evr datatype="debian_evr_string" operation="less than">1:4.14-1.1+deb7u1</linux:evr>
    </linux:dpkginfo_state>
  </states>
</oval_definitions>
"""


class TestOvalSource:
    def test_parse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.oval import read_oval

        (tmp_path / "debian.xml").write_text(OVAL_XML)
        got = read_oval(spark, str(tmp_path)).collect()
        assert len(got) == 1  # inventory definition skipped
        row = got[0]
        assert row.advisory_id == "oval:test:def:1"
        assert row.aliases == ["CVE-2001-1593"]
        ap = row.affected_packages[0]
        assert ap.package == "pkg:deb/debian/a2ps"
        assert ap.affected_version_range == "vers:deb/<1:4.14-1.1+deb7u1"
        assert ap.fixed_version == "1:4.14-1.1+deb7u1"
        assert row.date_published is not None
