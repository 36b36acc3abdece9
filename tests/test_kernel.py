"""Unit tests for the pure-Python kernels (no SparkSession needed).

Mirrors the reference's operator unit-test strategy (SURVEY.md §5):
content-id stability, purl normalization, ecosystem version ordering
(FIXTURES.md §4 invariants), vers containment, CVSS base scores.
"""

from __future__ import annotations

import pytest

from vulnerablecode_spark.kernel import contentid, cvss, purl, versions, vers


class TestContentId:
    def test_order_independent(self):
        a = {"aliases": ["CVE-2", "CVE-1"], "summary": "x", "url": "u"}
        b = {"aliases": ["CVE-1", "CVE-2"], "summary": "x", "url": "u"}
        assert contentid.content_id(a) == contentid.content_id(b)

    def test_whitespace_normalized(self):
        a = {"summary": "a  bad\n bug", "url": "u"}
        b = {"summary": "a bad bug", "url": "u"}
        assert contentid.content_id(a) == contentid.content_id(b)

    def test_content_sensitive(self):
        a = {"summary": "bug one", "url": "u"}
        b = {"summary": "bug two", "url": "u"}
        assert contentid.content_id(a) != contentid.content_id(b)

    def test_nested_lists_dedupe(self):
        a = {"references": [{"url": "r1"}, {"url": "r1"}, {"url": "r2"}]}
        b = {"references": [{"url": "r2"}, {"url": "r1"}]}
        assert contentid.content_id(a) == contentid.content_id(b)

    def test_stable_hex(self):
        cid = contentid.content_id({"summary": "s", "url": "u"})
        assert len(cid) == 64 and int(cid, 16) >= 0


class TestPurl:
    def test_roundtrip(self):
        s = "pkg:pypi/django@4.2"
        assert purl.normalize_purl(s) == s

    def test_pypi_normalization(self):
        assert purl.normalize_purl("pkg:PyPI/Django_Rest@1.0") == "pkg:pypi/django-rest@1.0"

    def test_namespace(self):
        p = purl.parse_purl("pkg:maven/org.apache/commons@1.0")
        assert p.namespace == "org.apache" and p.name == "commons"

    def test_qualifiers_sorted_and_plain(self):
        s = "pkg:deb/debian/curl@7.50?distro=jessie&arch=i386"
        assert purl.normalize_purl(s) == "pkg:deb/debian/curl@7.50?arch=i386&distro=jessie"
        assert purl.plain_purl(s) == "pkg:deb/debian/curl@7.50"

    def test_versionless(self):
        p = purl.parse_purl("pkg:npm/lodash@4.17.21")
        assert p.versionless.to_string() == "pkg:npm/lodash"

    def test_with_version(self):
        p = purl.parse_purl("pkg:npm/lodash")
        assert p.with_version("1.2.3").to_string() == "pkg:npm/lodash@1.2.3"

    def test_bad_purl(self):
        with pytest.raises(purl.PurlError):
            purl.parse_purl("not-a-purl")


class TestVersionOrdering:
    """FIXTURES.md §4.4: ordering is ecosystem-specific, NOT lexicographic."""

    def test_numeric_not_lexicographic(self):
        assert versions.compare("1.10", "1.9") > 0

    def test_prerelease_before_final(self):
        assert versions.compare("1.0-alpha", "1.0") < 0
        assert versions.compare("1.0rc1", "1.0") < 0
        assert versions.compare("1.0.dev1", "1.0a1") < 0

    def test_post_after_final(self):
        assert versions.compare("1.0.post1", "1.0") > 0

    def test_patch_ordering(self):
        assert versions.compare("1.0", "1.0.1") < 0

    def test_leading_v_stripped(self):
        assert versions.compare("v1.2", "1.2") == 0

    def test_debian_epoch(self):
        assert versions.compare("1:1.0", "2.0", "deb") > 0

    def test_debian_tilde(self):
        assert versions.compare("1.0~rc1", "1.0", "deb") < 0

    def test_debian_revision(self):
        assert versions.compare("1.0-2", "1.0-10", "deb") < 0

    def test_sort_key_ranks(self):
        vs = ["1.9", "1.10", "1.0", "2.0-rc1", "2.0"]
        ranked = sorted(vs, key=versions.sort_key)
        assert ranked == ["1.0", "1.9", "1.10", "2.0-rc1", "2.0"]


class TestVers:
    def test_roundtrip(self):
        r = vers.parse_vers("vers:pypi/>=1.0|<2.0")
        assert r.scheme == "pypi"
        assert r.to_string() == "vers:pypi/>=1.0|<2.0"

    def test_simple_interval(self):
        r = "vers:pypi/>=1.0|<2.0"
        assert vers.contains(r, "1.5")
        assert vers.contains(r, "1.0")
        assert not vers.contains(r, "2.0")
        assert not vers.contains(r, "0.9")

    def test_union_of_intervals(self):
        r = "vers:pypi/>=1.0|<2.0|>=3.0|<4.0"
        assert vers.contains(r, "1.5")
        assert not vers.contains(r, "2.5")
        assert vers.contains(r, "3.5")

    def test_star_and_exclusion(self):
        assert vers.contains("vers:npm/*", "9.9.9")
        assert not vers.contains("vers:npm/*|!=1.2.3", "1.2.3")

    def test_equality_pin(self):
        assert vers.contains("vers:npm/=1.2.3", "1.2.3")
        assert not vers.contains("vers:npm/=1.2.3", "1.2.4")

    def test_open_upper(self):
        assert vers.contains("vers:generic/>=2.0", "99.0")
        assert not vers.contains("vers:generic/>=2.0", "1.0")

    def test_open_lower(self):
        assert vers.contains("vers:generic/<1.5", "1.0")
        assert not vers.contains("vers:generic/<1.5", "1.5")

    def test_version_in_range_ecosystem_order(self):
        # 1.10 is inside [1.2, 1.9] only under LEXICOGRAPHIC order — must
        # be outside under numeric ordering (FIXTURES.md §4.4)
        assert not vers.contains("vers:pypi/>=1.2|<=1.9", "1.10")


class TestCvss:
    def test_v31_critical(self):
        # canonical example: all-high network vector = 9.8
        assert cvss.cvss3_base_score("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H") == 9.8

    def test_v31_scope_changed(self):
        assert cvss.cvss3_base_score("CVSS:3.1/AV:N/AC:L/PR:L/UI:R/S:C/C:H/I:H/A:N") == 8.7

    def test_v31_zero_impact(self):
        assert cvss.cvss3_base_score("CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:N/I:N/A:N") == 0.0

    def test_v2(self):
        assert cvss.cvss2_base_score("AV:N/AC:L/Au:N/C:P/I:P/A:P") == 7.5

    def test_dispatch_numeric(self):
        assert cvss.base_score("7.2") == 7.2

    def test_invalid(self):
        assert cvss.base_score("") is None
        assert cvss.cvss3_base_score("CVSS:3.1/AV:X") is None


class TestCvss4Kernel:
    """v4.0 scores validated against the reference repo's recorded values:
    the SUSE fixture (9.3), the severity_systems.py doctest (9.9), and the
    spec's zero-impact rule."""

    def test_reference_fixture_scores(self):
        from vulnerablecode_spark.kernel.cvss4 import cvss4_base_score

        assert cvss4_base_score(
            "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H"
            "/SC:N/SI:N/SA:N") == 9.3
        assert cvss4_base_score(
            "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H"
            "/SC:H/SI:H/SA:N") == 9.9

    def test_zero_impact_and_invalid(self):
        from vulnerablecode_spark.kernel.cvss4 import cvss4_base_score

        assert cvss4_base_score(
            "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:N/VI:N/VA:N"
            "/SC:N/SI:N/SA:N") == 0.0
        assert cvss4_base_score("CVSS:3.1/AV:N/AC:L") is None
        assert cvss4_base_score("CVSS:4.0/AV:N") is None  # missing metrics
        assert cvss4_base_score("") is None

    def test_lookup_table_shape(self):
        from vulnerablecode_spark.kernel.cvss4 import MACRO_LOOKUP

        # 3 eq1 x 2 eq2 x 5 valid (eq3,eq6) x 3 eq4 x 3 eq5 = 270 rows
        assert len(MACRO_LOOKUP) == 270
        assert all(0.0 <= v <= 10.0 for v in MACRO_LOOKUP.values())
        # eq3=2 implies eq6=1 (no High impact to elevate)
        assert not any(k[2] == "2" and k[5] == "0" for k in MACRO_LOOKUP)

    def test_interpolation_bounded_by_macro_score(self):
        from vulnerablecode_spark.kernel.cvss4 import (MACRO_LOOKUP,
                                                       cvss4_base_score,
                                                       parse_cvss4_vector,
                                                       _macro_vector)
        import itertools

        # exhaustive base-metric sweep on a coarse grid: score is defined,
        # within [0,10], and never above its macrovector's table value
        grid = itertools.product("NP", "LH", "HN", "HN", "HN", "HLN")
        for av, ac, vc, vi, va, sc in grid:
            vector = (f"CVSS:4.0/AV:{av}/AC:{ac}/AT:N/PR:N/UI:N/VC:{vc}"
                      f"/VI:{vi}/VA:{va}/SC:{sc}/SI:N/SA:N")
            score = cvss4_base_score(vector)
            assert score is not None and 0.0 <= score <= 10.0, vector
            metrics = parse_cvss4_vector(vector)
            def m(name, _mx=metrics):
                from vulnerablecode_spark.kernel.cvss4 import _m
                if name in ("MSI", "MSA"):
                    return _mx.get(name, "X")
                return _m(_mx, name)
            macro = _macro_vector(m)
            assert score <= MACRO_LOOKUP[macro] + 1e-9, vector

    def test_exploit_maturity_lowers_score(self):
        from vulnerablecode_spark.kernel.cvss4 import cvss4_base_score

        base = "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H/SC:N/SI:N/SA:N"
        assert cvss4_base_score(base + "/E:U") < cvss4_base_score(
            base + "/E:P") <= cvss4_base_score(base)

    def test_dispatch_through_base_score(self):
        from vulnerablecode_spark.kernel.cvss import base_score

        assert base_score(
            "CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/VC:H/VI:H/VA:H"
            "/SC:N/SI:N/SA:N") == 9.3
