"""OVAL parser golden-parity tests against the reference's own fixture
pairs (debian/ubuntu/suse *_oval_data.xml → *-expected.json).

Pins the full OvalParser semantics (oval_parser.py:26-198 +
importer.py:789-921): per-(definition, CVE) fan-out, ref_id CVE
extraction with prefix strip, Ubuntu var_ref package resolution,
datatype-gated tests, version-range cleanups, reference-URL collection,
advisory severity, and the generator timestamp as date_published.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

REF = "/root/reference/vulnerabilities/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not available")


def _expected_rows(path):
    """Reference expected-JSON → comparable tuples."""
    out = []
    for adv in json.load(open(path)):
        affected = []
        for ap in adv["affected_packages"]:
            p = ap["package"]
            purl = f"pkg:{p['type']}/"
            if p.get("namespace"):
                purl += p["namespace"] + "/"
            purl += p["name"]
            if p.get("qualifiers"):
                purl += "?" + p["qualifiers"]
            affected.append((purl, ap["affected_version_range"]))
        urls = sorted({r["url"] for r in adv["references"]})
        sevs = sorted({(s["system"], s["value"])
                       for r in adv["references"]
                       for s in r.get("severities", [])})
        date = pd.Timestamp(adv["date_published"]).tz_convert("UTC") \
            if adv.get("date_published") else None
        out.append((tuple(adv["aliases"]), adv["summary"],
                    tuple(sorted(affected)), tuple(urls), tuple(sevs), date))
    return sorted(out, key=str)


def _got_rows(df):
    out = []
    for r in df.collect():
        affected = [(a.package, a.affected_version_range)
                    for a in r.affected_packages]
        urls = sorted({x.url for x in r.references})
        sevs = sorted({(s.system, s.value) for s in r.severities})
        date = (pd.Timestamp(r.date_published).tz_localize("UTC")
                if r.date_published is not None
                and pd.Timestamp(r.date_published).tzinfo is None
                else (pd.Timestamp(r.date_published).tz_convert("UTC")
                      if r.date_published is not None else None))
        out.append((tuple(r.aliases), r.summary,
                    tuple(sorted(affected)), tuple(urls), tuple(sevs), date))
    return sorted(out, key=str)


class TestOvalGolden:
    def test_debian(self, spark, tmp_path):
        from vulnerablecode_spark.sources.oval import (
            DEBIAN_TRANSLATIONS, read_oval)

        (tmp_path / "debian.xml").write_text(
            open(f"{REF}/debian_oval_data.xml").read())
        got = _got_rows(read_oval(
            spark, str(tmp_path), "debian_oval", purl_type="deb",
            purl_namespace="debian", qualifiers={"distro": "wheezy"},
            translations=DEBIAN_TRANSLATIONS))
        expected = _expected_rows(f"{REF}/debian-oval-expected.json")
        assert got == expected

    def test_ubuntu(self, spark, tmp_path):
        from vulnerablecode_spark.sources.oval import (
            DEBIAN_TRANSLATIONS, read_oval)

        (tmp_path / "ubuntu.xml").write_text(
            open(f"{REF}/ubuntu_oval_data.xml").read())
        got = _got_rows(read_oval(
            spark, str(tmp_path), "ubuntu_oval", purl_type="deb",
            purl_namespace="ubuntu", translations=DEBIAN_TRANSLATIONS))
        expected = _expected_rows(f"{REF}/ubuntu-oval-expected.json")
        assert got == expected

    def test_suse(self, spark, tmp_path):
        from vulnerablecode_spark.sources.oval import (
            SUSE_TRANSLATIONS, read_oval)

        (tmp_path / "suse.xml").write_text(
            open(f"{REF}/suse_oval/org.opensuse.CVE-2008-5679.xml").read())
        got = _got_rows(read_oval(
            spark, str(tmp_path), "suse_oval", purl_type="rpm",
            purl_namespace="opensuse", translations=SUSE_TRANSLATIONS))
        expected = _expected_rows(
            f"{REF}/suse_oval/suse-oval-CVE-2008-5679-expected.json")
        assert got == expected

    def test_rpm_name_case_preserved(self, spark, tmp_path):
        # packageurl-python does NOT lowercase rpm names: SUSE's
        # 'MozillaFirefox' must stay 'pkg:rpm/opensuse/MozillaFirefox'
        # (deb names stay lowercased via kernel _LOWERCASE_TYPES).
        from vulnerablecode_spark.sources.oval import (
            SUSE_TRANSLATIONS, read_oval)

        import re

        xml = open(
            f"{REF}/suse_oval/org.opensuse.CVE-2008-5679.xml").read()
        (tmp_path / "suse.xml").write_text(
            re.sub(r"\bopera\b", "MozillaFirefox", xml))
        got = read_oval(
            spark, str(tmp_path), "suse_oval", purl_type="rpm",
            purl_namespace="opensuse", translations=SUSE_TRANSLATIONS)
        purls = {a.package for r in got.collect()
                 for a in r.affected_packages}
        assert any("MozillaFirefox" in p for p in purls), purls
        assert not any("mozillafirefox" in p for p in purls), purls

    def test_suse_filter_excludes_unaffected_twin(self):
        # suse_oval.py:49-69 — prefer "name-affected.xml" over "name.xml"
        from vulnerablecode_spark.sources.oval import filter_suse_oval_files

        files = ["a/opensuse.leap.15.3.xml.gz",
                 "a/opensuse.leap.15.3-affected.xml.gz",
                 "a/opensuse.leap.15.4.xml.gz"]
        assert filter_suse_oval_files(files) == [
            "a/opensuse.leap.15.3-affected.xml.gz",
            "a/opensuse.leap.15.4.xml.gz"]
