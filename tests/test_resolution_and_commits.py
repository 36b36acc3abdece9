"""Tests: alias→vulnerability resolution (FIXTURES.md §4.3 conflict rule),
VCID minting determinism, confidence-ranked relation dedup, SSVC
decisions, fix-commit mining."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vulnerablecode_spark.kernel.ssvc import ssvc_decision


class TestSsvcKernel:
    # expectations are the exact CISA coordinator table rows
    # (reference utils.py:817-853, kernel/ssvc.py DECISION_TABLE)
    @pytest.mark.parametrize("vector,decision", [
        ("SSVC:v2.0.3/E:N/A:N/T:P/M:M", "Track"),
        ("SSVC:v2.0.3/E:N/A:Y/T:T/M:H", "Attend"),
        ("SSVC:v2.0.3/E:N/A:N/T:T/M:H", "Track*"),
        ("SSVC:v2.0.3/E:P/A:Y/T:T/M:M", "Track*"),
        ("SSVC:v2.0.3/E:P/A:N/T:P/M:H", "Track*"),
        ("SSVC:v2.0.3/E:P/A:Y/T:P/M:H", "Attend"),
        ("SSVC:v2.0.3/E:A/A:Y/T:T/M:H", "Act"),
        ("SSVC:v2.0.3/E:A/A:N/T:P/M:M", "Track"),
        ("SSVC:v2.0.3/E:A/A:Y/T:P/M:L", "Attend"),
        ("garbage", None),
    ])
    def test_decisions(self, vector, decision):
        assert ssvc_decision(vector) == decision


class TestAliasResolution:
    def test_matched_minted_conflict(self, spark):
        from vulnerablecode_spark.operators.resolution import resolve_aliases

        advisory_aliases = spark.createDataFrame(
            [(1, "CVE-1"), (1, "GHSA-a"),       # both → V-100 (matched)
             (2, "CVE-2"), (2, "CVE-3"),        # CVE-2→V-100, CVE-3→V-200 (conflict)
             (3, "CVE-9")],                      # unknown → minted
            "advisory_pk bigint, alias string")
        existing = spark.createDataFrame(
            [("CVE-1", "V-100"), ("GHSA-a", "V-100"),
             ("CVE-2", "V-100"), ("CVE-3", "V-200")],
            "alias string, vulnerability_id string")
        got = {r.advisory_pk: r for r in
               resolve_aliases(advisory_aliases, existing).collect()}
        assert got[1].resolution == "matched" and got[1].vulnerability_id == "V-100"
        assert got[2].resolution == "conflict" and got[2].vulnerability_id is None
        assert got[3].resolution == "minted"
        assert got[3].vulnerability_id.startswith("VCID-")
        assert len(got[3].vulnerability_id) == len("VCID-xxxx-xxxx-xxxx")

    def test_minting_deterministic(self, spark):
        from vulnerablecode_spark.operators.resolution import resolve_aliases

        aa = spark.createDataFrame([(7, "CVE-X"), (7, "CVE-Y")],
                                   "advisory_pk bigint, alias string")
        a = resolve_aliases(aa).first().vulnerability_id
        b = resolve_aliases(aa).first().vulnerability_id
        assert a == b

    def test_alphabet_matches_reference(self, spark):
        """The reference's base32_custom alphabet is
        ``b"abcdefghjkmnpqrstuvwxyz123456789"`` and its build_vcid doctest
        pins the char class ``VCID(-[a-hjkm-z1-9]{4}){3}``
        (aboutcode/hashid/__init__.py:48-66,84). Assert both: the alphabet
        string is exactly the same 32 characters, and a minted VCID
        matches the doctest regex."""
        import re

        from vulnerablecode_spark.operators.resolution import (
            VCID_ALPHABET, resolve_aliases)

        assert VCID_ALPHABET == "abcdefghjkmnpqrstuvwxyz123456789"
        assert len(VCID_ALPHABET) == 32
        assert sorted(VCID_ALPHABET) == sorted(
            set("abcdefghijklmnopqrstuvwxyz0123456789") - set("0ilo"))
        aa = spark.createDataFrame(
            [(i, f"CVE-{i}") for i in range(40)],
            "advisory_pk bigint, alias string")
        for row in resolve_aliases(aa).collect():
            assert re.fullmatch(r"VCID(-[a-hjkm-z1-9]{4}){3}",
                                row.vulnerability_id), row.vulnerability_id

    def test_dedupe_relations_keeps_max_confidence(self, spark):
        from vulnerablecode_spark.operators.resolution import dedupe_relations

        rels = spark.createDataFrame(
            [(1, 10, "affected_by", "importer_a", 60),
             (1, 10, "affected_by", "improver_b", 90),
             (1, 10, "fixing", "importer_a", 50)],
            "package_pk bigint, vulnerability_pk bigint, relation string, "
            "created_by string, confidence int")
        got = dedupe_relations(rels).collect()
        by_rel = {r.relation: r for r in got}
        assert len(got) == 2
        assert by_rel["affected_by"].confidence == 90


class TestFixCommits:
    def test_commit_mining_and_vcs_normalization(self, spark):
        from vulnerablecode_spark.operators.commits import collect_fix_commits
        from vulnerablecode_spark.schemas import ADVISORY_PARSED

        rec = {
            "advisory_id": "A-1", "aliases": [], "summary": "",
            "affected_packages": [],
            "references": [
                {"reference_id": None, "reference_type": "advisory",
                 "url": "https://github.com/Org/Repo/commit/abcdef1234567890"},
                {"reference_id": None, "reference_type": "advisory",
                 "url": "https://gitlab.com/org/proj/-/commit/1234567"},
                {"reference_id": None, "reference_type": "advisory",
                 "url": "https://git.kernel.org/pub/scm/linux.git/commit/?id=deadbeefcafe"},
                {"reference_id": None, "reference_type": "advisory",
                 "url": "https://example.com/not-a-commit"},
            ],
            "severities": [], "weaknesses": [], "date_published": None,
            "url": None,
        }
        parsed = spark.createDataFrame([rec], ADVISORY_PARSED).withColumn(
            "advisory_pk", F.lit(1).cast("bigint"))
        got = collect_fix_commits(parsed).collect()
        by_sha = {r.commit_hash: r.repo_url for r in got}
        assert by_sha["abcdef1234567890"] == "https://github.com/Org/Repo"
        assert by_sha["1234567"] == "https://gitlab.com/org/proj"
        assert "deadbeefcafe" in by_sha
        assert len(got) == 3

    def test_normalize_vcs_url_forms(self, spark):
        from vulnerablecode_spark.operators.commits import normalize_vcs_url

        df = spark.createDataFrame(
            [("git@github.com:org/repo.git",),
             ("git+https://github.com/org/repo.git",),
             ("git://github.com/org/repo/",)], "url string")
        got = [r[0] for r in df.select(normalize_vcs_url(F.col("url"))).collect()]
        assert got == ["https://github.com/org/repo"] * 3


class TestSummaryBackfill:
    def test_longest_summary_wins_only_for_missing(self, spark):
        from vulnerablecode_spark.operators.improvers import backfill_summaries

        vulns = spark.createDataFrame(
            [(1, ""), (2, "already has one")],
            "vulnerability_pk bigint, summary string")
        advisories = spark.createDataFrame(
            [(10, "short", True), (11, "a much longer summary", True),
             (12, "latest=false is ignored but longest", False)],
            "advisory_pk bigint, summary string, is_latest boolean")
        bridge = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 11)],
            "vulnerability_pk bigint, advisory_pk bigint")
        got = {r.vulnerability_pk: r.summary
               for r in backfill_summaries(vulns, advisories, bridge).collect()}
        assert got[1] == "a much longer summary"
        assert got[2] == "already has one"


class TestVcsNormalizerRegressions:
    def test_git_suffix_with_trailing_slash(self, spark):
        # '.git/' must canonicalize like '.git' and bare — one repo,
        # one canonical URL
        from vulnerablecode_spark.operators.commits import normalize_vcs_url

        urls = ["https://github.com/org/repo.git/",
                "git@github.com:org/repo.git/",
                "https://github.com/org/repo.git",
                "https://github.com/org/repo"]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = {r[0] for r in
               df.select(normalize_vcs_url(F.col("url"))).collect()}
        assert got == {"https://github.com/org/repo"}

    def test_cgit_view_segment_stripped_from_repo_url(self, spark):
        from vulnerablecode_spark.operators.commits import collect_fix_commits

        advisories = spark.createDataFrame(
            [(1, [{"reference_id": None, "reference_type": "",
                   "url": ("https://git.kernel.org/pub/scm/linux.git/"
                           "commit/?id=deadbeefcafe")}])],
            "advisory_pk bigint, references array<struct<"
            "reference_id:string,reference_type:string,url:string>>")
        got = collect_fix_commits(advisories).collect()
        assert len(got) == 1
        assert got[0].repo_url == "https://git.kernel.org/pub/scm/linux"
        assert got[0].commit_hash == "deadbeefcafe"
