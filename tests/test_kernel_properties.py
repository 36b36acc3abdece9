"""Property-based tests (hypothesis) for the version/vers/content kernels —
the invariants every downstream operator relies on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vulnerablecode_spark.kernel import contentid, versions, vers

version_strings = st.from_regex(r"[0-9]{1,3}(\.[0-9]{1,3}){0,3}", fullmatch=True)
schemes = st.sampled_from(["generic", "pypi", "semver", "deb"])


class TestVersionOrderProperties:
    @given(version_strings, schemes)
    @settings(max_examples=200, deadline=None)
    def test_reflexive(self, v, scheme):
        assert versions.compare(v, v, scheme) == 0

    @given(version_strings, version_strings, schemes)
    @settings(max_examples=200, deadline=None)
    def test_antisymmetric(self, a, b, scheme):
        assert versions.compare(a, b, scheme) == -versions.compare(b, a, scheme)

    @given(version_strings, version_strings, version_strings, schemes)
    @settings(max_examples=200, deadline=None)
    def test_transitive(self, a, b, c, scheme):
        ka, kb, kc = (versions.sort_key(x, scheme) for x in (a, b, c))
        if ka <= kb <= kc:
            assert versions.compare(a, c, scheme) <= 0

    @given(version_strings)
    @settings(max_examples=100, deadline=None)
    def test_sort_key_matches_compare(self, v):
        w = v + ".1"
        assert versions.compare(v, w) < 0
        assert versions.sort_key(v) < versions.sort_key(w)


class TestVersProperties:
    @given(version_strings, version_strings, version_strings)
    @settings(max_examples=200, deadline=None)
    def test_interval_membership_consistent(self, lo, hi, v):
        if versions.compare(lo, hi) >= 0:
            return
        rng = f"vers:generic/>={lo}|<{hi}"
        inside = vers.contains(rng, v)
        expected = (versions.compare(v, lo) >= 0 and versions.compare(v, hi) < 0)
        assert inside == expected

    @given(version_strings)
    @settings(max_examples=100, deadline=None)
    def test_star_contains_everything(self, v):
        assert vers.contains("vers:generic/*", v)

    @given(version_strings)
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_parse(self, v):
        rng = vers.parse_vers(f"vers:pypi/>={v}")
        assert vers.parse_vers(rng.to_string()) == rng


class TestContentIdProperties:
    @given(st.lists(st.text(min_size=1, max_size=12), max_size=6),
           st.text(max_size=40))
    @settings(max_examples=150, deadline=None)
    def test_alias_order_never_matters(self, aliases, summary):
        a = {"aliases": aliases, "summary": summary, "url": "u"}
        b = {"aliases": list(reversed(aliases)), "summary": summary, "url": "u"}
        assert contentid.content_id(a) == contentid.content_id(b)

    @given(st.text(max_size=40))
    @settings(max_examples=100, deadline=None)
    def test_whitespace_runs_never_matter(self, summary):
        a = {"summary": summary, "url": "u"}
        b = {"summary": " ".join(summary.split()), "url": "u"}
        assert contentid.content_id(a) == contentid.content_id(b)
