"""End-to-end domain pipeline tests: sources → ingest → unfurl → risk →
lookup → grouping → todos, on synthetic fixtures (the golden-file test
shape of the reference, SURVEY.md §5, exercising FIXTURES.md §4
invariants)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

OSV_RECORDS = [
    {
        "id": "PYSEC-2024-1",
        "summary": "Sample pickle vuln",
        "aliases": ["CVE-2024-1111", "GHSA-aaaa-bbbb-cccc"],
        "published": "2024-01-10T00:00:00Z",
        "severity": [{"type": "CVSS_V3",
                      "score": "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H"}],
        "affected": [{
            "package": {"ecosystem": "PyPI", "name": "sample",
                        "purl": "pkg:pypi/sample"},
            "ranges": [{"type": "ECOSYSTEM",
                        "events": [{"introduced": "1.0.0"}, {"fixed": "1.2.0"}]}],
        }],
        "references": [{"type": "ADVISORY", "url": "https://example.com/adv/1"}],
        "database_specific": {"cwe_ids": ["CWE-502"]},
    },
    {
        "id": "PYSEC-2024-2",
        "summary": "",
        "aliases": ["CVE-2024-2222"],
        "published": "2024-02-01T00:00:00Z",
        "affected": [{
            "package": {"ecosystem": "npm", "name": "Leftpad"},
            "ranges": [{"type": "SEMVER",
                        "events": [{"introduced": "0"}, {"fixed": "2.0.0"}]}],
        }],
        "references": [{"type": "WEB", "url": "https://example.com/adv/2"}],
    },
    {
        # explicit version list, no ranges
        "id": "PYSEC-2024-3",
        "summary": "Pinned versions",
        "aliases": ["CVE-2024-1111"],  # shares alias with PYSEC-2024-1
        "affected": [{
            "package": {"ecosystem": "PyPI", "name": "sample",
                        "purl": "pkg:pypi/sample"},
            "versions": ["1.0.0", "1.1.0"],
        }],
    },
]

PACKAGE_VERSIONS = [
    ("pkg:pypi/sample", v) for v in
    ["0.9", "1.0.0", "1.1.0", "1.1.5", "1.2.0", "1.10.0"]
] + [
    ("pkg:npm/leftpad", v) for v in ["0.5.0", "1.0.0", "2.0.0"]
]


@pytest.fixture(scope="module")
def osv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("osv")
    for rec in OSV_RECORDS:
        (d / f"{rec['id']}.json").write_text(json.dumps(rec))
    return str(d)


@pytest.fixture(scope="module")
def parsed(spark, osv_dir):
    from vulnerablecode_spark.sources.osv import read_osv

    return read_osv(spark, osv_dir).cache()


@pytest.fixture(scope="module")
def advisories(parsed):
    from vulnerablecode_spark.operators.ingest import to_canonical_advisories

    return to_canonical_advisories(
        parsed, "pysec", "pysec_importer_v2", "2024-03-01 00:00:00"
    ).cache()


@pytest.fixture(scope="module")
def package_versions(spark):
    return spark.createDataFrame(PACKAGE_VERSIONS, "base_purl string, version string")


class TestOsvParsing:
    def test_three_advisories(self, parsed):
        assert parsed.count() == 3

    def test_range_to_vers(self, parsed):
        row = parsed.filter(F.col("advisory_id") == "PYSEC-2024-1").first()
        ap = row.affected_packages[0]
        assert ap.package == "pkg:pypi/sample"
        assert ap.affected_version_range == "vers:pypi/>=1.0.0|<1.2.0"
        assert ap.fixed_version == "1.2.0"

    def test_introduced_zero_open_range(self, parsed):
        row = parsed.filter(F.col("advisory_id") == "PYSEC-2024-2").first()
        ap = row.affected_packages[0]
        assert ap.package == "pkg:npm/leftpad"  # name lowered, purl built
        assert ap.affected_version_range == "vers:npm/<2.0.0"

    def test_explicit_versions(self, parsed):
        row = parsed.filter(F.col("advisory_id") == "PYSEC-2024-3").first()
        assert row.affected_packages[0].affected_version_range == \
            "vers:pypi/=1.0.0|=1.1.0"

    def test_weaknesses_and_refs(self, parsed):
        row = parsed.filter(F.col("advisory_id") == "PYSEC-2024-1").first()
        assert row.weaknesses == [502]
        assert row.references[0].reference_type == "advisory"

    def test_git_only_ranges_use_enumerated_versions(self, spark):
        """The dominant OSS-Fuzz shape: GIT ranges (commit shas) plus an
        enumerated versions list. The advisory must claim ONLY the
        enumerated versions — not 'vers:…/*' — and the GIT 'fixed' sha
        must not leak into fixed_version."""
        import json

        from vulnerablecode_spark.sources.osv import OSV_SCHEMA, parse_osv

        rec = {
            "id": "OSV-2023-1", "summary": "s", "aliases": [],
            "affected": [{
                "package": {"ecosystem": "OSS-Fuzz", "name": "zlib",
                            "purl": None},
                "ranges": [{"type": "GIT", "events": [
                    {"introduced": "3a0386e"},
                    {"fixed": "0dd8ae2f7662ab2f2b66ba1e764c2c19c6d9a3b2"}]}],
                "versions": ["1.2.0", "1.2.1"],
                "database_specific": None,
            }],
            "references": [], "severity": [],
            "published": "2023-01-01T00:00:00Z",
        }
        raw = spark.createDataFrame([(json.dumps(rec),)], "value string")
        parsed = parse_osv(raw.select(
            F.from_json("value", OSV_SCHEMA).alias("o")).select("o.*"))
        ap = parsed.first().affected_packages[0]
        assert ap.affected_version_range == "vers:generic/=1.2.0|=1.2.1"
        assert ap.fixed_version is None  # the commit sha is NOT a version

    def test_cwe_noinfo_yields_null_not_cast_error(self, spark):
        """ANSI mode is the session default: a non-matching cwe id must
        null out, never CAST('' AS INT) the job to death."""
        import json

        from vulnerablecode_spark.sources.osv import OSV_SCHEMA, parse_osv

        rec = {"id": "X-1", "summary": "s", "aliases": [], "affected": [],
               "references": [], "severity": [],
               "database_specific": {"cwe_ids": ["CWE-noinfo", "CWE-79"]},
               "published": "2023-01-01T00:00:00Z"}
        raw = spark.createDataFrame([(json.dumps(rec),)], "value string")
        parsed = parse_osv(raw.select(
            F.from_json("value", OSV_SCHEMA).alias("o")).select("o.*"))
        assert parsed.first().weaknesses == [79]


class TestIngest:
    def test_avid_and_latest(self, advisories):
        rows = advisories.collect()
        assert all(r.avid.startswith("pysec/") for r in rows)
        assert all(r.is_latest for r in rows)  # one version each

    def test_content_id_deterministic(self, parsed, spark):
        from vulnerablecode_spark.operators.ingest import to_canonical_advisories

        a = to_canonical_advisories(parsed, "pysec", "p", "2024-03-01").select(
            "advisory_id", "unique_content_id")
        b = to_canonical_advisories(parsed, "pysec", "p", "2024-04-01").select(
            "advisory_id", "unique_content_id")
        assert a.join(b, "advisory_id").filter(
            a.unique_content_id != b.unique_content_id).count() == 0

    def test_content_id_normalizes_null_and_whitespace(self, parsed, spark):
        """compute_content_id_v2 parity: null-vs-'' summary and
        whitespace variance must hash EQUAL (utils.py:694-726 normalizes
        text and lists) — or SCD2 appends a spurious content version for
        the same content."""
        from vulnerablecode_spark.operators.ingest import with_content_id

        base = with_content_id(parsed).select(
            "advisory_id", "unique_content_id")
        ws = with_content_id(parsed.withColumn(
            "summary", F.concat(F.lit("  "), F.regexp_replace(
                "summary", " ", "   "), F.lit(" ")))).select(
            "advisory_id", F.col("unique_content_id").alias("ws_id"))
        assert base.join(ws, "advisory_id").filter(
            F.col("unique_content_id") != F.col("ws_id")).count() == 0
        nulled = with_content_id(
            parsed.withColumn("summary", F.lit(None).cast("string"))
            .withColumn("aliases", F.lit(None).cast("array<string>")))
        emptied = with_content_id(
            parsed.withColumn("summary", F.lit(""))
            .withColumn("aliases", F.array().cast("array<string>")))
        n = nulled.select("advisory_id",
                          F.col("unique_content_id").alias("n_id"))
        e = emptied.select("advisory_id",
                           F.col("unique_content_id").alias("e_id"))
        assert n.join(e, "advisory_id").filter(
            F.col("n_id") != F.col("e_id")).count() == 0

    def test_content_id_matches_kernel_on_flat_record(self, spark):
        from vulnerablecode_spark.kernel import contentid
        from vulnerablecode_spark.operators.ingest import with_content_id
        from vulnerablecode_spark.schemas import ADVISORY_PARSED

        rec = {"advisory_id": "X-1", "aliases": ["CVE-2024-1"],
               "summary": "a  summary", "affected_packages": [],
               "references": [], "severities": [], "weaknesses": [7],
               "date_published": None, "url": "https://x"}
        df = spark.createDataFrame([rec], ADVISORY_PARSED)
        got = with_content_id(df).select("unique_content_id").first()[0]
        assert got == contentid.content_id(rec)

    def test_scd2_merge_flips_latest(self, advisories, parsed, spark):
        """FIXTURES.md §4.1: exactly one is_latest per avid, old rows kept."""
        from vulnerablecode_spark.operators.ingest import (
            merge_advisories, to_canonical_advisories)

        changed = parsed.withColumn(
            "summary", F.concat(F.col("summary"), F.lit(" [updated]"))
        )
        v2 = to_canonical_advisories(changed, "pysec", "p", "2024-05-01 00:00:00")
        merged = merge_advisories(advisories, v2)
        assert merged.count() == 6  # 3 avids × 2 content versions
        per_avid = merged.groupBy("avid").agg(
            F.sum(F.col("is_latest").cast("int")).alias("n_latest"))
        assert per_avid.filter(F.col("n_latest") != 1).count() == 0
        latest = merged.filter(F.col("is_latest")).select("summary").collect()
        assert all("[updated]" in r.summary for r in latest)

    def test_merge_idempotent(self, advisories):
        from vulnerablecode_spark.operators.ingest import merge_advisories

        merged = merge_advisories(advisories, advisories)
        assert merged.count() == advisories.count()


class TestUnfurl:
    @pytest.fixture(scope="class")
    def impacts(self, advisories):
        from vulnerablecode_spark.operators.ingest import extract_impacts

        return extract_impacts(advisories).cache()

    def test_impacts_shape(self, impacts):
        assert impacts.count() == 3
        assert impacts.filter(F.col("base_purl") == "pkg:pypi/sample").count() == 2

    def test_unfurl_range(self, impacts, package_versions):
        """vers:pypi/>=1.0.0|<1.2.0 over the upstream list → exactly the
        in-range versions, honoring numeric (non-lexicographic) order."""
        from vulnerablecode_spark.operators.unfurl import unfurl_affected

        got = unfurl_affected(impacts, package_versions)
        sample = {
            (r.version,) for r in got.filter(
                (F.col("base_purl") == "pkg:pypi/sample")
                & F.col("affecting_vers").contains(">=1.0.0")
            ).collect()
        }
        assert sample == {("1.0.0",), ("1.1.0",), ("1.1.5",)}

    def test_unfurl_open_range(self, impacts, package_versions):
        from vulnerablecode_spark.operators.unfurl import unfurl_affected

        got = unfurl_affected(impacts, package_versions)
        npm = {r.version for r in got.filter(
            F.col("base_purl") == "pkg:npm/leftpad").collect()}
        assert npm == {"0.5.0", "1.0.0"}

    def test_materialized_packages_and_bridges(self, impacts, package_versions):
        from vulnerablecode_spark.operators.unfurl import (
            affecting_bridge, fixed_by_bridge, materialize_packages,
            unfurl_affected)

        unfurled = unfurl_affected(impacts, package_versions)
        pkgs = materialize_packages(unfurled)
        assert pkgs.filter(F.col("package_url") == "pkg:pypi/sample@1.1.5").count() == 1
        assert pkgs.filter(F.col("type") == "pypi").count() > 0
        bridges = affecting_bridge(unfurled)
        assert bridges.count() == unfurled.select("impact_pk", "base_purl",
                                                  "version").distinct().count()
        fixed = fixed_by_bridge(impacts, package_versions)
        # fixed 1.2.0 (pypi) and 2.0.0 (npm) both exist upstream
        assert fixed.count() == 2

    def test_watermark_stamping(self, impacts, package_versions):
        from vulnerablecode_spark.operators.unfurl import (stamp_watermarks,
                                                           unfurl_affected)

        unfurled = unfurl_affected(impacts, package_versions)
        stamped = stamp_watermarks(impacts, unfurled)
        assert stamped.filter(F.col("last_range_unfurl_at").isNotNull()).count() == 3


class TestRiskAndLookup:
    @pytest.fixture(scope="class")
    def tables(self, advisories, package_versions):
        from vulnerablecode_spark.functions.risk import compute_advisory_risk
        from vulnerablecode_spark.operators.ingest import extract_impacts
        from vulnerablecode_spark.operators.unfurl import (
            affecting_bridge, fixed_by_bridge, unfurl_affected,
            unfurled_package_universe)

        impacts = extract_impacts(advisories)
        unfurled = unfurl_affected(impacts, package_versions)
        packages = unfurled_package_universe(unfurled, impacts, package_versions)
        risk = compute_advisory_risk(advisories, advisories.sparkSession)
        adv = advisories.drop("weighted_severity", "exploitability", "risk_score") \
            .join(risk, "advisory_pk", "left")
        return {
            "advisories": adv, "impacts": impacts,
            "affecting": affecting_bridge(unfurled),
            "fixed_by": fixed_by_bridge(impacts, package_versions),
            "packages": packages,
        }

    def test_advisory_risk(self, tables):
        r = tables["advisories"].filter(
            F.col("advisory_id") == "PYSEC-2024-1").first()
        # CVSS numeric string is not parseable as float value "CVSS:…" → the
        # severity VALUE here is the vector string; numeric parse fails →
        # textual map misses → score 0. Exploitability: severities present,
        # no EPSS → 0.5.
        assert r.exploitability == 0.5
        assert r.weighted_severity == 0.0

    def test_lookup_flagship(self, spark, tables):
        from vulnerablecode_spark.operators.lookup import (
            advisories_for_purls, normalize_request_purls, vulnerable_purls)

        request = normalize_request_purls(
            spark, ["pkg:pypi/sample@1.1.0", "pkg:pypi/sample@1.2.0",
                    "pkg:npm/leftpad@0.5.0", "pkg:gem/unknown@1.0"])
        vuln = vulnerable_purls(request, tables["packages"], tables["affecting"],
                                tables["impacts"], tables["advisories"])
        got = {r.purl for r in vuln.collect()}
        assert got == {"pkg:pypi/sample@1.1.0", "pkg:npm/leftpad@0.5.0"}

        details = advisories_for_purls(
            request, tables["packages"], tables["affecting"], tables["fixed_by"],
            tables["impacts"], tables["advisories"], max_advisories=10)
        row = {r.purl: r for r in details.collect()}["pkg:pypi/sample@1.1.0"]
        ids = {a.advisory_id for a in row.advisories}
        assert ids == {"PYSEC-2024-1", "PYSEC-2024-3"}
        fixed = [a.fixed_by_purls for a in row.advisories
                 if a.advisory_id == "PYSEC-2024-1"][0]
        assert fixed == ["pkg:pypi/sample@1.2.0"]

    def test_lookup_key_matches_raw_storage_form(self, spark):
        """Regression: stored package_url rows are raw-concatenated
        ('pkg:npm/@babel/traverse@7.23.2'); the request normalizer must
        produce that SAME key for both the raw and the percent-encoded
        request spelling, or encodable purls never match."""
        from vulnerablecode_spark.operators.lookup import \
            normalize_request_purls

        req = {r.requested: r.lookup_purl for r in normalize_request_purls(
            spark, ["pkg:npm/@babel/traverse@7.23.2",
                    "pkg:npm/%40babel/traverse@7.23.2",
                    "pkg:deb/debian/curl@7.50.3-1+deb9u1?arch=i386",
                    ]).collect()}
        assert req["pkg:npm/@babel/traverse@7.23.2"] == \
            "pkg:npm/@babel/traverse@7.23.2"
        assert req["pkg:npm/%40babel/traverse@7.23.2"] == \
            "pkg:npm/@babel/traverse@7.23.2"
        assert req["pkg:deb/debian/curl@7.50.3-1+deb9u1?arch=i386"] == \
            "pkg:deb/debian/curl@7.50.3-1+deb9u1?arch=i386"

    def test_with_is_vulnerable(self, tables):
        from vulnerablecode_spark.operators.lookup import with_is_vulnerable

        flagged = with_is_vulnerable(tables["packages"], tables["affecting"],
                                     tables["impacts"], tables["advisories"])
        by_url = {r.package_url: r.is_vulnerable for r in flagged.collect()}
        assert by_url["pkg:pypi/sample@1.1.5"] is True
        assert by_url["pkg:pypi/sample@1.2.0"] is False


class TestBulkDetailsDedupe:
    def test_multi_impact_advisory_appears_once(self, spark):
        """api_v3.py bulk details: an advisory reaching a package through
        TWO impacts (two version ranges) must appear ONCE per purl, with
        its ranges and fixed-by sets merged — not consume two cap slots
        and duplicate the struct."""
        from vulnerablecode_spark.operators.lookup import (
            advisories_for_purls, normalize_request_purls)

        request = normalize_request_purls(spark, ["pkg:pypi/x@1.0"])
        packages = spark.createDataFrame(
            [(10, "pkg:pypi/x@1.0"), (11, "pkg:pypi/x@2.0")],
            "package_pk bigint, package_url string")
        affecting = spark.createDataFrame(
            [(100, 10), (101, 10)], "impact_pk bigint, package_pk bigint")
        fixed_by = spark.createDataFrame(
            [(100, 11), (101, 11)], "impact_pk bigint, package_pk bigint")
        impacts = spark.createDataFrame(
            [(100, 1, "vers:pypi/<1.5"), (101, 1, "vers:pypi/>=0.9|<1.2")],
            "impact_pk bigint, advisory_pk bigint, affecting_vers string")
        advisories = spark.createDataFrame(
            [(1, "ADV-1", "x/ADV-1", "s", ["CVE-1"], True, None)],
            "advisory_pk bigint, advisory_id string, avid string, "
            "summary string, aliases array<string>, is_latest boolean, "
            "risk_score string")
        out = advisories_for_purls(
            request, packages, affecting, fixed_by, impacts, advisories
        ).collect()
        assert len(out) == 1
        row = out[0]
        assert row.advisory_count == 1  # ONE advisory, not per-impact rows
        assert len(row.advisories) == 1
        adv = row.advisories[0]
        assert adv.fixed_by_purls == ["pkg:pypi/x@2.0"]
        assert "vers:pypi/<1.5" in adv.affecting_vers
        assert "vers:pypi/>=0.9|<1.2" in adv.affecting_vers


class TestGrouping:
    def test_identifierless_advisory_is_singleton_group(self, spark):
        """group_advisories.py: an advisory with no advisory_id and no
        aliases still belongs to the output — as its own group — instead
        of being dropped by the identifier join."""
        from vulnerablecode_spark.operators.grouping import group_advisories

        membership = spark.createDataFrame(
            [(10, "affecting", 1), (10, "affecting", 2)],
            "package_pk bigint, relation_type string, advisory_pk bigint")
        advisories = spark.createDataFrame(
            [(1, "", [], None), (2, "ADV-2", ["CVE-2"], None)],
            "advisory_pk bigint, advisory_id string, "
            "aliases array<string>, precedence int")
        got = group_advisories(membership, advisories).collect()
        by_member = {r.member_advisory_pk: r for r in got}
        assert set(by_member) == {1, 2}  # advisory 1 NOT dropped
        assert by_member[1].group_id != by_member[2].group_id

    def test_shared_alias_groups(self, spark, advisories):
        """FIXTURES.md §4.3: advisories sharing an alias group together."""
        from vulnerablecode_spark.operators.grouping import group_advisories

        pks = {r.advisory_id: r.advisory_pk for r in
               advisories.select("advisory_id", "advisory_pk").collect()}
        membership = spark.createDataFrame(
            [(100, "affecting", pks["PYSEC-2024-1"]),
             (100, "affecting", pks["PYSEC-2024-3"]),
             (100, "affecting", pks["PYSEC-2024-2"])],
            "package_pk bigint, relation_type string, advisory_pk bigint",
        )
        groups = group_advisories(membership, advisories).collect()
        gid = {r.member_advisory_pk: r.group_id for r in groups}
        # 1 and 3 share CVE-2024-1111 → same group; 2 is alone
        assert gid[pks["PYSEC-2024-1"]] == gid[pks["PYSEC-2024-3"]]
        assert gid[pks["PYSEC-2024-2"]] != gid[pks["PYSEC-2024-1"]]

    def test_primary_is_max_precedence(self, spark, advisories):
        from vulnerablecode_spark.operators.grouping import group_advisories

        pks = {r.advisory_id: r.advisory_pk for r in
               advisories.select("advisory_id", "advisory_pk").collect()}
        withprec = advisories.withColumn(
            "precedence",
            F.when(F.col("advisory_id") == "PYSEC-2024-3", 9).otherwise(1),
        )
        membership = spark.createDataFrame(
            [(100, "affecting", pks["PYSEC-2024-1"]),
             (100, "affecting", pks["PYSEC-2024-3"])],
            "package_pk bigint, relation_type string, advisory_pk bigint",
        )
        groups = group_advisories(membership, withprec).collect()
        assert all(r.primary_advisory_pk == pks["PYSEC-2024-3"] for r in groups)


class TestEnrichment:
    def test_kev_exploits_join(self, spark, advisories, tmp_path):
        from vulnerablecode_spark.operators.exploits import join_exploits
        from vulnerablecode_spark.operators.ingest import extract_aliases
        from vulnerablecode_spark.sources.kev import read_kev

        kev = {"count": 1, "vulnerabilities": [{
            "cveID": "CVE-2024-1111", "shortDescription": "exploited!",
            "dateAdded": "2024-02-02", "requiredAction": "patch",
            "dueDate": "2024-02-20", "notes": "",
            "knownRansomwareCampaignUse": "Known"}]}
        p = tmp_path / "kev.json"
        p.write_text(json.dumps(kev))
        catalog = read_kev(spark, str(p))
        got = join_exploits(extract_aliases(advisories), catalog)
        rows = got.collect()
        # CVE-2024-1111 is an alias of advisories 1 AND 3
        assert len(rows) == 2
        assert all(r.known_ransomware_campaign_use for r in rows)

    def test_epss_relate(self, spark, advisories, tmp_path):
        from vulnerablecode_spark.operators.relate import (
            attach_related_severities, relate_severities)
        from vulnerablecode_spark.sources.epss import read_epss

        p = tmp_path / "epss.csv"
        p.write_text("#model_version:v2023.03.01,score_date:2024-05-19\n"
                     "cve,epss,percentile\n"
                     "CVE-2024-1111,0.97,0.999\n"
                     "CVE-2024-9999,0.01,0.2\n")
        epss = read_epss(spark, str(p))
        assert epss.count() == 2
        related = relate_severities(advisories, epss)
        # attaches to advisories 1 and 3 via the shared alias
        assert related.count() == 2
        enriched = attach_related_severities(advisories, related)
        row = enriched.filter(F.col("advisory_id") == "PYSEC-2024-3").first()
        assert any(s.system == "epss" for s in row.severities)

    def test_high_epss_raises_exploitability(self, spark, advisories, tmp_path):
        from vulnerablecode_spark.functions.risk import compute_advisory_risk
        from vulnerablecode_spark.operators.relate import (
            attach_related_severities, relate_severities)
        from vulnerablecode_spark.sources.epss import read_epss

        p = tmp_path / "epss.csv"
        p.write_text("#c\ncve,epss,percentile\nCVE-2024-1111,0.97,0.999\n")
        enriched = attach_related_severities(
            advisories, relate_severities(advisories, read_epss(spark, str(p))))
        risk = compute_advisory_risk(enriched, spark)
        by_id = {r.advisory_pk: r for r in risk.collect()}
        pk1 = advisories.filter(F.col("advisory_id") == "PYSEC-2024-1") \
            .first().advisory_pk
        assert by_id[pk1].exploitability == 2.0


class TestTodos:
    def test_missing_summary_issue(self, advisories):
        from vulnerablecode_spark.operators.todos import per_advisory_issues

        issues = per_advisory_issues(advisories)
        got = {(r.avid, r.issue_type) for r in issues.collect()}
        assert ("pysec/PYSEC-2024-2", "MISSING_SUMMARY") in got
        assert ("pysec/PYSEC-2024-3", "MISSING_FIXED_BY_PACKAGE") in got

    def test_conflicting_packages(self, advisories):
        from vulnerablecode_spark.operators.todos import \
            conflicting_package_issues

        conflicts = {r.alias: r.issue_type
                     for r in conflicting_package_issues(advisories).collect()}
        # advisories 1 and 3 share CVE-2024-1111 but declare different
        # affected sets AND different fixed sets (1.2.0 vs none) → the
        # combined issue type (compute_advisory_todo.py:1007-1011)
        assert conflicts["CVE-2024-1111"] == \
            "CONFLICTING_AFFECTED_AND_FIXED_BY_PACKAGES"

    def test_missing_both_collapses_to_one_issue(self, spark):
        from vulnerablecode_spark.operators.todos import per_advisory_issues

        advisories = spark.createDataFrame(
            [(1, "x/ADV-1", "a summary", [], True)],
            "advisory_pk bigint, avid string, summary string, "
            "affected_packages array<struct<package:string,"
            "affected_version_range:string,fixed_version:string>>, "
            "is_latest boolean",
        )
        got = {r.issue_type for r in per_advisory_issues(advisories).collect()}
        assert got == {"MISSING_AFFECTED_AND_FIXED_BY_PACKAGES"}

    def test_conflicting_weaknesses(self, spark):
        from vulnerablecode_spark.operators.todos import \
            conflicting_weakness_issues

        advisories = spark.createDataFrame(
            [(1, ["CVE-1"], [79, 89], True), (2, ["CVE-1"], [79], True),
             (3, ["CVE-2"], [120], True), (4, ["CVE-2"], [120], True)],
            "advisory_pk bigint, aliases array<string>, "
            "weaknesses array<int>, is_latest boolean",
        ).withColumn("affected_packages", F.lit(None).cast(
            "array<struct<package:string,affected_version_range:string,"
            "fixed_version:string>>"))
        got = {r.alias for r in conflicting_weakness_issues(advisories).collect()}
        assert got == {"CVE-1"}  # CVE-2 sources agree

    def test_fixed_only_claims_conflict_as_fixed_not_both(self, spark):
        """Regression: entries with a NULL affected range (fixed-only
        claims, the distro-tracker shape) must not enter the affected
        hash via concat_ws's null-skip — two such advisories disagreeing
        on fixes are CONFLICTING_FIXED, not CONFLICTING_BOTH."""
        from vulnerablecode_spark.operators.todos import \
            conflicting_package_issues

        ap = ("array<struct<package:string,affected_version_range:string,"
              "fixed_version:string>>")
        advisories = spark.createDataFrame(
            [(1, ["CVE-1"], [{"package": "pkg:gen/a",
                              "affected_version_range": None,
                              "fixed_version": "1.0"}], True),
             (2, ["CVE-1"], [{"package": "pkg:gen/b",
                              "affected_version_range": None,
                              "fixed_version": "2.0"}], True)],
            f"advisory_pk bigint, aliases array<string>, "
            f"affected_packages {ap}, is_latest boolean",
        ).withColumn("weaknesses", F.array().cast("array<int>"))
        got = conflicting_package_issues(advisories).collect()
        assert len(got) == 1
        assert got[0].issue_type == "CONFLICTING_FIXED_BY_PACKAGES"

    def test_single_advisory_dual_vectors_not_a_conflict(self, spark):
        """One advisory carrying NVD-primary + CNA-secondary vectors for
        the same system is not a CROSS-source conflict."""
        from vulnerablecode_spark.operators.todos import \
            conflicting_severity_issues

        sev = ("array<struct<system:string,value:string,"
               "scoring_elements:string,published_at:timestamp,url:string>>")
        advisories = spark.createDataFrame(
            [(1, ["CVE-9"],
              [{"system": "cvssv3.1", "value": "9.8",
                "scoring_elements": "CVSS:3.1/AV:N", "published_at": None,
                "url": None},
               {"system": "cvssv3.1", "value": "8.8",
                "scoring_elements": "CVSS:3.1/AV:A", "published_at": None,
                "url": None}], True)],
            f"advisory_pk bigint, aliases array<string>, severities {sev}, "
            "is_latest boolean")
        assert conflicting_severity_issues(advisories).count() == 0

    def test_null_vectors_never_outvote_real_consensus(self, spark):
        from vulnerablecode_spark.operators.todos import consensus_severity

        sev = ("array<struct<system:string,value:string,"
               "scoring_elements:string,published_at:timestamp,url:string>>")
        rows = [(i, ["CVE-8"],
                 [{"system": "cvssv3.1", "value": "5.0",
                   "scoring_elements": None, "published_at": None,
                   "url": None}], True) for i in (1, 2)]
        rows.append((3, ["CVE-8"],
                     [{"system": "cvssv3.1", "value": "9.8",
                       "scoring_elements": "CVSS:3.1/AV:N",
                       "published_at": None, "url": None}], True))
        advisories = spark.createDataFrame(
            rows, f"advisory_pk bigint, aliases array<string>, "
                  f"severities {sev}, is_latest boolean")
        got = consensus_severity(advisories).collect()
        assert len(got) == 1
        assert got[0].consensus_vector == "CVSS:3.1/AV:N"

    def test_partially_stated_metric_is_not_consensus(self, spark):
        """A metric only SOME vectors state is not agreement — every
        reporting vector must carry it with the identical value."""
        from vulnerablecode_spark.operators.todos import \
            consensus_cvss_metrics

        sev = ("array<struct<system:string,value:string,"
               "scoring_elements:string,published_at:timestamp,url:string>>")
        advisories = spark.createDataFrame(
            [(1, ["CVE-7"],
              [{"system": "cvssv3.1", "value": "9",
                "scoring_elements": "CVSS:3.1/AV:N/AC:L/E:H",
                "published_at": None, "url": None}], True),
             (2, ["CVE-7"],
              [{"system": "cvssv3.1", "value": "7",
                "scoring_elements": "CVSS:3.1/AV:N/AC:H",
                "published_at": None, "url": None}], True)],
            f"advisory_pk bigint, aliases array<string>, severities {sev}, "
            "is_latest boolean")
        got = {(r.metric, r.value)
               for r in consensus_cvss_metrics(advisories).collect()}
        assert got == {("AV", "N")}  # AC disagrees; E stated by one only

    def test_consensus_cvss_metrics_agreement_subset(self, spark):
        from vulnerablecode_spark.operators.todos import consensus_cvss_metrics

        sev = ("array<struct<system:string,value:string,"
               "scoring_elements:string,published_at:timestamp,url:string>>")
        advisories = spark.createDataFrame(
            [(1, ["CVE-1"],
              [{"system": "cvssv3.1", "value": "9.8",
                "scoring_elements": "CVSS:3.1/AV:N/AC:L/PR:N/UI:N/S:U/C:H/I:H/A:H",
                "published_at": None, "url": None}], True),
             (2, ["CVE-1"],
              [{"system": "cvssv3.1", "value": "8.8",
                "scoring_elements": "CVSS:3.1/AV:N/AC:L/PR:L/UI:N/S:U/C:H/I:H/A:H",
                "published_at": None, "url": None}], True)],
            f"advisory_pk bigint, aliases array<string>, severities {sev}, "
            "is_latest boolean",
        )
        got = {(r.metric, r.value)
               for r in consensus_cvss_metrics(advisories).collect()}
        # PR disagrees (N vs L) → dropped; the rest agree → kept
        assert ("PR", "N") not in got and ("PR", "L") not in got
        assert {("AV", "N"), ("AC", "L"), ("UI", "N"), ("S", "U"),
                ("C", "H"), ("I", "H"), ("A", "H")} <= got


class TestGhost:
    def test_ghost_flagging(self, spark, package_versions):
        from vulnerablecode_spark.operators.ghost import flag_ghost_packages

        pkgs = spark.createDataFrame(
            [(1, "pypi", "", "sample", "1.1.5", "", "", "pkg:pypi/sample@1.1.5",
              "pkg:pypi/sample@1.1.5", False, None, 0),
             (2, "pypi", "", "sample", "9.9.9", "", "", "pkg:pypi/sample@9.9.9",
              "pkg:pypi/sample@9.9.9", False, None, 0),
             (3, "pypi", "", "sample", "v1.2.0", "", "", "pkg:pypi/sample@v1.2.0",
              "pkg:pypi/sample@v1.2.0", False, None, 0)],
            "package_pk bigint, type string, namespace string, name string, "
            "version string, qualifiers string, subpath string, "
            "package_url string, plain_package_url string, is_ghost boolean, "
            "risk_score string, version_rank int",
        )
        flagged = {r.package_pk: r.is_ghost
                   for r in flag_ghost_packages(pkgs, package_versions).collect()}
        assert flagged[1] is False
        assert flagged[2] is True    # 9.9.9 absent upstream
        assert flagged[3] is False   # leading v stripped before compare

    def test_unfetchable_ecosystem_is_never_ghost(self, spark,
                                                  package_versions):
        """flag_ghost_packages.py:74-77: a purl with NO fetchable upstream
        version list (unsupported ecosystem / fetch failure) is SKIPPED,
        not flagged — else a whole ecosystem reads as ghost and its
        fixed-by packages vanish from API answers."""
        from vulnerablecode_spark.operators.ghost import flag_ghost_packages

        pkgs = spark.createDataFrame(
            [(1, "generic", "", "blob", "1.0", "", "",
              "pkg:generic/blob@1.0", "pkg:generic/blob@1.0",
              False, None, 0),
             (2, "pypi", "", "sample", "9.9.9", "", "",
              "pkg:pypi/sample@9.9.9", "pkg:pypi/sample@9.9.9",
              False, None, 0)],
            "package_pk bigint, type string, namespace string, name string, "
            "version string, qualifiers string, subpath string, "
            "package_url string, plain_package_url string, is_ghost boolean, "
            "risk_score string, version_rank int",
        )
        flagged = {r.package_pk: r.is_ghost
                   for r in flag_ghost_packages(pkgs, package_versions).collect()}
        assert flagged[1] is False  # no dim coverage → skipped, not ghost
        assert flagged[2] is True   # covered purl, absent version → ghost


class TestVersionOps:
    def test_rank_and_next_non_vulnerable(self, spark):
        from vulnerablecode_spark.functions.version_funcs import rank_versions
        from vulnerablecode_spark.operators.versions import (
            nearest_fixed_version, with_non_vulnerable_versions)

        rows = [("pypi", "", "pkg", v, vuln, ghost) for v, vuln, ghost in [
            ("1.0", True, False), ("1.2", True, False), ("1.9", True, False),
            ("1.10", False, False), ("2.0", False, True), ("2.1", False, False),
        ]]
        df = spark.createDataFrame(
            rows, "type string, namespace string, name string, version string, "
                  "is_vulnerable boolean, is_ghost boolean")
        ranked = rank_versions(df)
        by_v = {r.version: r.version_rank for r in ranked.collect()}
        assert by_v["1.9"] < by_v["1.10"] < by_v["2.0"]  # numeric order

        annotated = with_non_vulnerable_versions(ranked)
        row = {r.version: r for r in annotated.collect()}["1.2"]
        assert row.next_non_vulnerable == "1.10"   # 2.0 is ghost, skipped
        assert row.latest_non_vulnerable == "2.1"

        affected = ranked.filter(F.col("is_vulnerable"))
        fixed = ranked.filter(~F.col("is_vulnerable") & ~F.col("is_ghost"))
        nearest = nearest_fixed_version(affected, fixed)
        got = {r.affected_version: r.fixed_version for r in nearest.collect()}
        assert got == {"1.0": "1.10", "1.2": "1.10", "1.9": "1.10"}


class TestSearch:
    def test_tiered_search_short_circuit(self, advisories):
        from vulnerablecode_spark.operators.search import tiered_search

        # exact advisory id → tier 1 only, even though 'PYSEC' would
        # substring-match everything at tier 3
        got = tiered_search(advisories, "PYSEC-2024-1").collect()
        assert [r.advisory_id for r in got] == ["PYSEC-2024-1"]
        assert got[0].tier == 1

        got = tiered_search(advisories, "CVE-2024-1111").collect()
        assert {r.advisory_id for r in got} == {"PYSEC-2024-1", "PYSEC-2024-3"}
        assert all(r.tier == 2 for r in got)

        got = tiered_search(advisories, "pysec").collect()
        assert len(got) == 3 and all(r.tier == 3 for r in got)

    def test_tiered_search_agg_shape_equals_window(self, advisories):
        # ADVICE r9: the window shape's single-partition exchange carries
        # the match set (page-bound assumption); shape='agg' is the
        # enforced-safe alternative — outputs must be identical and the
        # safe plan must not contain the single-partition window at all
        import io
        from contextlib import redirect_stdout

        from vulnerablecode_spark.operators.search import tiered_search

        for q in ("PYSEC-2024-1", "CVE-2024-1111", "pysec"):
            fast = [tuple(r) for r in tiered_search(advisories, q).collect()]
            safe = [tuple(r) for r in
                    tiered_search(advisories, q, shape="agg").collect()]
            assert fast == safe and fast

        buf = io.StringIO()
        with redirect_stdout(buf):
            tiered_search(advisories, "pysec", shape="agg").explain("formatted")
        plan = buf.getvalue()
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    def test_search_packages_purl_aware(self, spark):
        from vulnerablecode_spark.operators.search import search_packages

        pkgs = spark.createDataFrame(
            [("pypi", "", "sample", "1.0", "pkg:pypi/sample@1.0",
              "pkg:pypi/sample@1.0", 1),
             ("npm", "", "sample-js", "1.0", "pkg:npm/sample-js@1.0",
              "pkg:npm/sample-js@1.0", 1)],
            "type string, namespace string, name string, version string, "
            "package_url string, plain_package_url string, version_rank int")
        got = search_packages(pkgs, "pkg:pypi/sample").collect()
        assert len(got) == 1 and got[0].type == "pypi"
        got = search_packages(pkgs, "sample").collect()
        assert len(got) == 2


class TestCrossSourceCompare:
    def test_agreement_matrix(self, spark, advisories, parsed):
        from vulnerablecode_spark.operators.compare import (compare_sources,
                                                            source_claims)
        from vulnerablecode_spark.operators.ingest import (
            extract_impacts, to_canonical_advisories)

        # a second "datasource" carrying the same CVE with a DIFFERENT range
        from pyspark.sql import functions as F
        altered = parsed.withColumn(
            "affected_packages",
            F.transform(
                "affected_packages",
                lambda ap: F.struct(
                    ap["package"].alias("package"),
                    F.concat(ap["affected_version_range"], F.lit("|<9.9"))
                    .alias("affected_version_range"),
                    ap["fixed_version"].alias("fixed_version"),
                ),
            ),
        )
        other = to_canonical_advisories(altered, "ghsa", "x", "2024-03-02 00:00:00")
        claims = source_claims(advisories, extract_impacts(advisories)).unionByName(
            source_claims(other, extract_impacts(other)))
        matrix = compare_sources(claims)
        rows = {(r.base_purl, r.cve): r for r in matrix.collect()}
        conflict = rows[("pkg:pypi/sample", "CVE-2024-1111")]
        assert conflict.agreement == "conflict"
        assert set(conflict.sources) == {"pysec", "ghsa"}
        # sanity: a cve+purl claimed by one source only
        singles = [r for r in rows.values() if r.agreement == "single_source"]
        assert all(r.n_sources == 1 for r in singles)


class TestServe:
    def test_json_response_and_pagination(self, spark, advisories):
        from vulnerablecode_spark.operators.serve import (keyset_page,
                                                          paginate,
                                                          to_json_response)
        import json as _json

        resp = to_json_response(
            advisories.select("advisory_pk", "advisory_id", "aliases"),
            "advisory_pk")
        row = resp.first()
        payload = _json.loads(row.json)
        assert "advisory_id" in payload and "aliases" in payload

        page1 = paginate(advisories, ["advisory_id"], page=1, page_size=2)
        ids1 = [r.advisory_id for r in page1.select("advisory_id").collect()]
        page2 = paginate(advisories, ["advisory_id"], page=2, page_size=2)
        ids2 = [r.advisory_id for r in page2.select("advisory_id").collect()]
        assert len(ids1) == 2 and len(ids2) == 1
        assert ids1 + ids2 == sorted(ids1 + ids2)

        ks = keyset_page(advisories.select("advisory_id"), "advisory_id",
                         after=ids1[-1], page_size=2)
        assert [r.advisory_id for r in ks.collect()] == ids2


class TestImprovers:
    def test_exact_purl_extraction(self, spark):
        """improvers/default.py:87-141 doctest semantics: =2.0.0 inside
        the range -> affected; != and fixed_version -> fixed."""
        from vulnerablecode_spark.operators.improvers import \
            exact_purl_inferences

        impacts = spark.createDataFrame(
            [(1, 10, "pkg:npm/green", "vers:npm/<1.0.0|>=2.0.0|<3.0.0", None,
              "5.0.0", None),
             (2, 11, "pkg:npm/blue", "vers:npm/*|!=1.5.0", None, None, None),
             (3, 12, "pkg:npm/empty", "vers:npm/<2.0", None, None, None)],
            "impact_pk bigint, advisory_pk bigint, base_purl string, "
            "affecting_vers string, fixed_vers string, fixed_version string, "
            "last_range_unfurl_at timestamp")
        got = {r.impact_pk: r for r in exact_purl_inferences(impacts).collect()}
        assert got[1].affected_purls == ["pkg:npm/green@2.0.0"]
        assert got[1].fixed_purls == ["pkg:npm/green@5.0.0"]
        assert got[2].affected_purls == []
        assert got[2].fixed_purls == ["pkg:npm/blue@1.5.0"]
        # a strict upper bound's own version is NOT in the range → no purls
        assert 3 not in got

    def test_valid_versions_respects_publication_date(self, spark, advisories):
        from vulnerablecode_spark.operators.improvers import \
            valid_version_inferences
        from vulnerablecode_spark.operators.ingest import extract_impacts

        import datetime as dt
        pv = spark.createDataFrame(
            [("pkg:pypi/sample", "1.0.0", dt.datetime(2023, 1, 1)),
             ("pkg:pypi/sample", "1.1.0", dt.datetime(2023, 6, 1)),
             # released AFTER PYSEC-2024-1's date_published (2024-01-10)
             ("pkg:pypi/sample", "1.1.9", dt.datetime(2024, 6, 1))],
            "base_purl string, version string, release_date timestamp")
        impacts = extract_impacts(advisories)
        got = valid_version_inferences(advisories, impacts, pv)
        row = [r for r in got.collect()
               if "pkg:pypi/sample@1.0.0" in r.affected_purls]
        assert row, "expected an inference for pkg:pypi/sample"
        assert "pkg:pypi/sample@1.1.9" not in row[0].affected_purls


class TestWeightedSeverityVectorScoring:
    def test_v4_vector_scored_when_enabled(self, spark):
        from vulnerablecode_spark.functions.risk import weighted_severity

        advisories = spark.createDataFrame(
            [(1, [{"system": "cvssv4", "value": "n/a",
                   "scoring_elements": ("CVSS:4.0/AV:N/AC:L/AT:N/PR:N/UI:N/"
                                        "VC:H/VI:H/VA:H/SC:N/SI:N/SA:N"),
                   "published_at": None,
                   "url": "https://nvd.nist.gov/vuln/detail/CVE-X"}])],
            "advisory_pk bigint, severities array<struct<system:string,"
            "value:string,scoring_elements:string,published_at:timestamp,"
            "url:string>>",
        )
        got = {r.advisory_pk: r.weighted_severity
               for r in weighted_severity(advisories, spark,
                                          score_vectors=True).collect()}
        # 9.3 base score x nvd weight 10 / 10 = 9.3
        assert got[1] == 9.3
        # without vector scoring the non-numeric value scores 0
        got_off = {r.advisory_pk: r.weighted_severity
                   for r in weighted_severity(advisories, spark).collect()}
        assert got_off[1] == 0.0


class TestBulkResponse:
    def test_api_v3_shape(self, spark):
        import json

        from vulnerablecode_spark.operators.serve import bulk_affected_response

        affected = spark.createDataFrame(
            [("pkg:pypi/sample", "pysec/PYSEC-2024-1",
              "a vuln", ["CVE-2024-1111", "PYSEC-2024-1"], 7.25,
              ["pkg:pypi/sample@1.2.0"]),
             ("pkg:pypi/sample", "ghsa/GHSA-x",
              "same vuln", ["CVE-2024-1111"], None, None)],
            "purl string, avid string, summary string, "
            "aliases array<string>, risk_score double, "
            "fixed_by_purls array<string>",
        )
        rows = bulk_affected_response(affected).collect()
        assert len(rows) == 1
        payload = json.loads(rows[0].response)
        # sorted by identifier: GHSA-x < PYSEC-2024-1
        assert [p["advisory_id"] for p in payload] == ["GHSA-x", "PYSEC-2024-1"]
        first, second = payload
        # identifier derived from avid's last segment and excluded from aliases
        assert second["advisory_uid"] == "pysec/PYSEC-2024-1"
        assert second["aliases"] == ["CVE-2024-1111"]
        assert second["risk_score"] == "7.3"  # rounded 1dp, serialized
        assert second["fixed_by_packages"] == ["pkg:pypi/sample@1.2.0"]
        assert first["fixed_by_packages"] == []
        assert first["risk_score"] is None


class TestServingView:
    """Materialized serving view (VERDICT r6 directive #1): the bulk
    payload precomputed at ingest, persisted shard-partitioned, served
    as one pruned point-read and maintained incrementally."""

    def _responses(self, spark, rows):
        return spark.createDataFrame(rows, "purl string, response string")

    def test_shard_function_parity(self):
        """Driver-side zlib.crc32 must equal Spark's crc32 expression —
        the property that lets a request prune partitions without a
        cluster round-trip."""
        from vulnerablecode_spark.operators.serve import serving_shard_of

        import zlib
        for purl in ("pkg:pypi/sample@1.0", "pkg:npm/@babel/traverse@7.2",
                     "pkg:maven/org.apache/kafka@3.0", "pkg:deb/ü@1"):
            assert 0 <= serving_shard_of(purl) < 64
            assert serving_shard_of(purl) == (
                zlib.crc32(purl.encode("utf-8")) % 64)

    def test_shard_column_matches_driver_side(self, spark):
        from pyspark.sql import functions as F

        from vulnerablecode_spark.operators.serve import (serving_shard_col,
                                                          serving_shard_of)

        purls = ["pkg:pypi/a@1", "pkg:npm/@s/b@2.0.1", "pkg:gem/c-d@0.9",
                 "pkg:deb/debian/curl@7.50.3-1+deb9u1"]
        df = spark.createDataFrame([(p,) for p in purls], "purl string") \
            .select("purl", serving_shard_col("purl").alias("shard"))
        for r in df.collect():
            assert r.shard == serving_shard_of(r.purl), r.purl

    def test_write_read_roundtrip_and_pruning(self, spark, tmp_path):
        from vulnerablecode_spark.operators.serve import (
            read_bulk_responses, serving_shard_of, write_serving_view)

        rows = [(f"pkg:gen/p{i}", f'[{{"id": {i}}}]') for i in range(200)]
        path = str(tmp_path / "view")
        write_serving_view(self._responses(spark, rows), path)
        got = {r.purl: r.response for r in read_bulk_responses(
            spark, path, ["pkg:gen/p7", "pkg:gen/p42", "pkg:gen/missing"]
        ).collect()}
        assert got == {"pkg:gen/p7": '[{"id": 7}]',
                       "pkg:gen/p42": '[{"id": 42}]'}
        # the point-read plan prunes to the requested purl's shard dir
        import io
        import re
        from contextlib import redirect_stdout

        one = read_bulk_responses(spark, path, ["pkg:gen/p7"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            one.explain("formatted")
        plan = buf.getvalue()
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and f"= {serving_shard_of('pkg:gen/p7')})" in pf.group(1)
        assert "PushedFilters: [In(purl" in plan or \
            "PushedFilters: [IsNotNull(purl" in plan
        assert "Exchange" not in plan and "Join" not in plan

    def test_incremental_refresh_touches_only_affected_shards(
            self, spark, tmp_path):
        import os

        from vulnerablecode_spark.operators.serve import (
            read_bulk_responses, refresh_serving_view, serving_shard_of,
            write_serving_view)

        rows = [(f"pkg:gen/p{i}", f'[{{"v": 1}}]') for i in range(200)]
        path = str(tmp_path / "view")
        write_serving_view(self._responses(spark, rows), path)

        def shard_files():
            out = {}
            for d in os.listdir(path):
                if d.startswith("shard="):
                    out[d] = sorted(os.listdir(os.path.join(path, d)))
            return out

        before = shard_files()
        # merge-job update: one changed purl + one brand-new purl
        updated = self._responses(spark, [
            ("pkg:gen/p7", '[{"v": 2}]'), ("pkg:gen/new", '[{"v": 9}]')])
        refresh_serving_view(spark, updated, path)
        after = shard_files()

        touched = {f"shard={serving_shard_of(p)}"
                   for p in ("pkg:gen/p7", "pkg:gen/new")}
        for d, files in before.items():
            if d not in touched:
                assert after[d] == files, f"untouched {d} was rewritten"
        # updated + surviving rows all served correctly
        got = {r.purl: r.response for r in read_bulk_responses(
            spark, path, ["pkg:gen/p7", "pkg:gen/new", "pkg:gen/p8"]
        ).collect()}
        assert got == {"pkg:gen/p7": '[{"v": 2}]',
                       "pkg:gen/new": '[{"v": 9}]',
                       "pkg:gen/p8": '[{"v": 1}]'}
        # no row lost or duplicated across the refresh
        total = spark.read.parquet(path).count()
        assert total == 201

    def test_recommended_shards_bounds(self):
        from vulnerablecode_spark.operators.serve import \
            recommended_serving_shards

        assert recommended_serving_shards(1_000) == 16
        assert recommended_serving_shards(10_000_000) == 38
        assert recommended_serving_shards(10**12) == 4096

    def _read_all(self, spark, path, n=200, extra=()):
        from vulnerablecode_spark.operators.serve import read_bulk_responses

        purls = [f"pkg:gen/p{i}" for i in range(n)] + list(extra)
        return {r.purl: r.response for r in read_bulk_responses(
            spark, path, purls).collect()}

    def test_crash_mid_refresh_restores_pre_refresh_state(
            self, spark, tmp_path, monkeypatch):
        """Kill between materialize (staging write) and commit (marker):
        the view must read back as the FULL pre-refresh state, and a
        retried refresh must then land cleanly (VERDICT r7 directive #3)."""
        from vulnerablecode_spark.operators import serve
        from vulnerablecode_spark.operators.serve import (
            refresh_serving_view, write_serving_view)

        rows = [(f"pkg:gen/p{i}", '[{"v": 1}]') for i in range(200)]
        path = str(tmp_path / "view")
        write_serving_view(self._responses(spark, rows), path)
        before = self._read_all(spark, path)

        def boom(*_a, **_k):
            raise RuntimeError("killed before commit")

        monkeypatch.setattr(serve, "_commit_refresh", boom)
        updated = self._responses(spark, [
            ("pkg:gen/p7", '[{"v": 2}]'), ("pkg:gen/new", '[{"v": 9}]')])
        with pytest.raises(RuntimeError):
            refresh_serving_view(spark, updated, path)
        assert os.path.isdir(path + ".refresh-staging")  # crash artifact

        # a fresh reader recovers and sees exactly the pre-refresh view
        serve._invalidate_view(path)
        assert self._read_all(spark, path, extra=["pkg:gen/new"]) == before
        assert not os.path.isdir(path + ".refresh-staging")

        # the retried refresh completes and lands the update
        monkeypatch.undo()
        refresh_serving_view(spark, updated, path)
        after = self._read_all(spark, path, extra=["pkg:gen/new"])
        assert after["pkg:gen/p7"] == '[{"v": 2}]'
        assert after["pkg:gen/new"] == '[{"v": 9}]'
        assert after["pkg:gen/p8"] == '[{"v": 1}]'
        assert spark.read.parquet(path).count() == 201

    def test_crash_after_commit_marker_rolls_forward(
            self, spark, tmp_path, monkeypatch):
        """A kill AFTER the _COMMITTED marker (mid shard-swap) must roll
        FORWARD: the next reader finishes the swap and sees the full
        post-refresh state."""
        from vulnerablecode_spark.operators import serve
        from vulnerablecode_spark.operators.serve import (
            refresh_serving_view, write_serving_view)

        rows = [(f"pkg:gen/p{i}", '[{"v": 1}]') for i in range(200)]
        path = str(tmp_path / "view")
        write_serving_view(self._responses(spark, rows), path)

        real_finish = serve._finish_commit

        def marker_then_die(path_):
            raise RuntimeError("killed mid-swap")  # marker already written

        monkeypatch.setattr(serve, "_finish_commit", marker_then_die)
        updated = self._responses(spark, [("pkg:gen/p7", '[{"v": 2}]')])
        with pytest.raises(RuntimeError):
            refresh_serving_view(spark, updated, path)
        assert os.path.exists(serve._refresh_marker(path))

        monkeypatch.setattr(serve, "_finish_commit", real_finish)
        serve._invalidate_view(path)
        got = self._read_all(spark, path)
        assert got["pkg:gen/p7"] == '[{"v": 2}]'
        assert got["pkg:gen/p0"] == '[{"v": 1}]'
        assert not os.path.isdir(path + ".refresh-staging")
        assert spark.read.parquet(path).count() == 200

    def test_large_request_uses_broadcast_join_and_prunes(
            self, spark, tmp_path):
        """Above BULK_ISIN_MAX the read switches from isin literals to a
        broadcast semi-join (the reference's bulk API is unpaginated —
        api.py:482-624 — so 100k-purl requests are legal) while shard
        partition pruning stays literal (VERDICT r7 directive #4)."""
        import io
        import re
        from contextlib import redirect_stdout

        from vulnerablecode_spark.operators.serve import (
            read_bulk_responses, write_serving_view)

        rows = [(f"pkg:gen/p{i}", f'[{{"id": {i}}}]') for i in range(200)]
        path = str(tmp_path / "view")
        write_serving_view(self._responses(spark, rows), path)

        big_request = [f"pkg:gen/p{i}" for i in range(150)] + \
            [f"pkg:gen/ghost{i}" for i in range(1000)]
        df = read_bulk_responses(spark, path, big_request)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert re.search(r"PartitionFilters: \[shard#\d+ IN", plan), plan
        assert "SortMergeJoin" not in plan and "Exchange hash" not in plan
        got = {r.purl: r.response for r in df.collect()}
        assert len(got) == 150 and got["pkg:gen/p149"] == '[{"id": 149}]'
        # small requests keep the zero-join literal plan
        small = read_bulk_responses(spark, path, ["pkg:gen/p7"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            small.explain("formatted")
        assert "Join" not in buf.getvalue()

    def test_include_missing_returns_explicit_empty_with_watermark(
            self, spark, tmp_path):
        """A requested purl ABSENT from the view serves an explicit []
        response stamped with the view's freshness watermark, so "not
        vulnerable as of <wm>" is distinguishable from "never refreshed"
        (VERDICT r7 directive #5)."""
        from vulnerablecode_spark.operators.serve import (
            read_bulk_responses, refresh_serving_view, view_freshness,
            write_serving_view)

        rows = [("pkg:gen/vuln", '[{"id": 1}]')]
        path = str(tmp_path / "view")
        write_serving_view(self._responses(spark, rows), path,
                           watermark="2025-01-02 00:00:00")
        assert view_freshness(path) == "2025-01-02 00:00:00"

        got = {r.purl: (r.response, r.fresh_as_of)
               for r in read_bulk_responses(
                   spark, path, ["pkg:gen/vuln", "pkg:gen/clean"],
                   include_missing=True).collect()}
        assert got["pkg:gen/vuln"] == (
            '[{"id": 1}]', "2025-01-02 00:00:00")
        assert got["pkg:gen/clean"] == ("[]", "2025-01-02 00:00:00")

        # an incremental refresh advances the watermark
        refresh_serving_view(
            spark, self._responses(spark, [("pkg:gen/vuln2", "[]")]),
            path, watermark="2025-02-01 00:00:00")
        assert view_freshness(path) == "2025-02-01 00:00:00"

    def test_watermark_commits_atomically_with_the_view(
            self, spark, tmp_path, monkeypatch):
        """VERDICT r8 directive #4: the watermark rides in the _COMMITTED
        marker and is installed inside _finish_commit — a crash between
        the shard swaps and the freshness install rolls BOTH forward on
        recovery; a crash before the marker rolls BOTH back. At every
        observable point the watermark agrees with the view's data."""
        from vulnerablecode_spark.operators import serve
        from vulnerablecode_spark.operators.serve import (
            read_bulk_responses, refresh_serving_view, view_freshness,
            write_serving_view)

        path = str(tmp_path / "view")
        write_serving_view(
            self._responses(spark, [(f"pkg:gen/p{i}", '[{"v": 1}]')
                                    for i in range(50)]),
            path, watermark="wm-1")
        updated = self._responses(spark, [("pkg:gen/p7", '[{"v": 2}]')])

        # crash BEFORE the marker: data AND watermark stay pre-refresh
        def boom(*_a, **_k):
            raise RuntimeError("killed before commit")

        monkeypatch.setattr(serve, "_commit_refresh", boom)
        with pytest.raises(RuntimeError):
            refresh_serving_view(spark, updated, path, watermark="wm-2")
        monkeypatch.undo()
        serve._invalidate_view(path)
        got = {r.purl: (r.response, r.fresh_as_of)
               for r in read_bulk_responses(
                   spark, path, ["pkg:gen/p7"],
                   include_missing=True).collect()}
        assert got["pkg:gen/p7"] == ('[{"v": 1}]', "wm-1")

        # crash AFTER the swaps but BEFORE the freshness install (the
        # exact window r8 flagged): marker+staging survive, so the next
        # reader rolls the commit forward — data and watermark TOGETHER
        real_write = serve._write_freshness

        def die_on_install(*_a, **_k):
            raise RuntimeError("killed between swap and freshness")

        monkeypatch.setattr(serve, "_write_freshness", die_on_install)
        with pytest.raises(RuntimeError):
            refresh_serving_view(spark, updated, path, watermark="wm-2")
        monkeypatch.undo()
        assert os.path.exists(serve._refresh_marker(path))
        assert view_freshness(path) == "wm-1"  # install never happened

        serve._invalidate_view(path)
        got = {r.purl: (r.response, r.fresh_as_of)
               for r in read_bulk_responses(
                   spark, path, ["pkg:gen/p7"],
                   include_missing=True).collect()}
        # never post-refresh data with a pre-refresh watermark
        assert got["pkg:gen/p7"] == ('[{"v": 2}]', "wm-2")
        assert view_freshness(path) == "wm-2"
        assert not os.path.isdir(serve._refresh_staging(path))
        assert real_write is serve._write_freshness

    def test_cross_process_handle_sees_foreign_refresh(
            self, spark, tmp_path, monkeypatch):
        """VERDICT r8 directive #5: a cached view handle re-validates per
        request via the _freshness.json stat token, so a refresh done by
        a DIFFERENT process — which cannot touch this process's
        _VIEW_HANDLES dict — is picked up without a restart."""
        from vulnerablecode_spark.operators import serve
        from vulnerablecode_spark.operators.serve import (
            read_bulk_responses, refresh_serving_view, write_serving_view)

        path = str(tmp_path / "view")
        write_serving_view(
            self._responses(spark, [(f"pkg:gen/p{i}", '[{"v": 1}]')
                                    for i in range(50)]),
            path, watermark="wm-1")
        # populate this process's handle cache
        got = {r.purl: r.response for r in read_bulk_responses(
            spark, path, ["pkg:gen/p7"]).collect()}
        assert got["pkg:gen/p7"] == '[{"v": 1}]'
        key = (spark.sparkContext.applicationId, path)
        assert key in serve._VIEW_HANDLES

        # simulate the refresh running in another process: it cannot
        # invalidate OUR in-process cache entry
        monkeypatch.setattr(serve, "_invalidate_view", lambda _p: None)
        refresh_serving_view(
            spark, self._responses(spark, [("pkg:gen/p7", '[{"v": 2}]')]),
            path, watermark="wm-2")
        monkeypatch.undo()
        assert key in serve._VIEW_HANDLES  # stale entry still cached

        # the pre-existing handle path must serve the NEW data + watermark
        got = {r.purl: (r.response, r.fresh_as_of)
               for r in read_bulk_responses(
                   spark, path, ["pkg:gen/p7", "pkg:gen/p8"],
                   include_missing=True).collect()}
        assert got["pkg:gen/p7"] == ('[{"v": 2}]', "wm-2")
        assert got["pkg:gen/p8"] == ('[{"v": 1}]', "wm-2")

        # and an untouched view does NOT re-list per request: the token
        # comparison hits the cache (same DataFrame object back)
        h1 = serve._view_handle(spark, path)
        h2 = serve._view_handle(spark, path)
        assert h1 is h2


class TestReachabilityPatchSets:
    """reachability=true bulk payload (VERDICT r8 directive #3): per
    (package, advisory) deduped {commit_hash, vcs_url} patch pairs split
    by introduced/fixed relation (reference api_v3.py:474-563,710-724)."""

    def _affected(self, spark):
        return spark.createDataFrame(
            [("pkg:a", "adv/1", "s1", None, None),
             ("pkg:a", "adv/2", "s2", None, None)],
            "purl string, avid string, summary string, "
            "aliases array<string>, fixed_by_purls array<string>")

    def _patches(self, spark, rows):
        return spark.createDataFrame(
            rows, "purl string, avid string, relation string, "
                  "commit_hash string, vcs_url string")

    def test_dedup_relation_split_and_null_guard(self, spark):
        from vulnerablecode_spark.operators.serve import attach_patch_sets

        patches = self._patches(spark, [
            # duplicate introduced pair → deduped
            ("pkg:a", "adv/1", "introduced", "c1", "https://r/x"),
            ("pkg:a", "adv/1", "introduced", "c1", "https://r/x"),
            ("pkg:a", "adv/1", "introduced", "c0", "https://r/x"),
            # fixed side of the same advisory
            ("pkg:a", "adv/1", "fixed", "c9", "https://r/y"),
            # single-null kept (reference: `if commit_hash or vcs_url`)
            ("pkg:a", "adv/1", "fixed", None, "https://r/z"),
            # both-null dropped
            ("pkg:a", "adv/1", "fixed", None, None),
        ])
        got = {r.avid: r for r in attach_patch_sets(
            self._affected(spark), patches).collect()}
        intro = [(p.commit_hash, p.vcs_url)
                 for p in got["adv/1"].introduced_in_patches]
        fixed = [(p.commit_hash, p.vcs_url)
                 for p in got["adv/1"].fixed_in_patches]
        assert intro == [("c0", "https://r/x"), ("c1", "https://r/x")]
        assert fixed == [(None, "https://r/z"), ("c9", "https://r/y")]
        # advisory with NO patch rows: explicit empty arrays, not null
        assert got["adv/2"].introduced_in_patches == []
        assert got["adv/2"].fixed_in_patches == []

    def test_response_json_carries_patch_fields(self, spark):
        from vulnerablecode_spark.operators.serve import (
            attach_patch_sets, bulk_affected_response)

        patches = self._patches(spark, [
            ("pkg:a", "adv/1", "introduced", "c1", "u1"),
            ("pkg:a", "adv/1", "fixed", "c2", "u2"),
        ])
        rows = bulk_affected_response(attach_patch_sets(
            self._affected(spark), patches)).collect()
        assert len(rows) == 1
        import json as _json

        members = _json.loads(rows[0].response)
        by_id = {m["advisory_id"]: m for m in members}
        assert by_id["1"]["introduced_in_patches"] == [
            {"commit_hash": "c1", "vcs_url": "u1"}]
        assert by_id["1"]["fixed_in_patches"] == [
            {"commit_hash": "c2", "vcs_url": "u2"}]
        assert by_id["2"]["introduced_in_patches"] == []
        assert by_id["2"]["fixed_in_patches"] == []

    def test_attach_plan_broadcasts_patch_sets(self, spark):
        """The aggregated patch-set frame is response-proportional —
        the attach must be a BroadcastHashJoin so the page side never
        shuffles."""
        import io
        from contextlib import redirect_stdout

        from vulnerablecode_spark.operators.serve import attach_patch_sets

        df = attach_patch_sets(
            self._affected(spark),
            self._patches(spark, [("pkg:a", "adv/1", "fixed", "c", "u")]))
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestCweValidation:
    def test_broadcast_validation_splits_known_and_unknown(self, spark):
        from vulnerablecode_spark.functions.cwe import (default_cwe_catalog,
                                                        validate_weaknesses)

        advisories = spark.createDataFrame(
            [(1, [79, 502, 99999]), (2, []), (3, None)],
            "advisory_pk bigint, weaknesses array<int>",
        )
        got = {r.advisory_pk: r for r in validate_weaknesses(
            advisories, default_cwe_catalog(spark)).collect()}
        assert got[1].weaknesses == [79, 502]
        assert got[1].invalid_weaknesses == [99999]
        assert got[2].weaknesses == [] and got[2].invalid_weaknesses == []
        assert got[3].weaknesses == [] and got[3].invalid_weaknesses == []

    def test_official_csv_loader(self, spark, tmp_path):
        from vulnerablecode_spark.functions.cwe import load_cwe_catalog

        p = tmp_path / "cwe.csv"
        p.write_text("CWE-ID,Name,Status\n79,XSS,Stable\n89,SQLi,Stable\n")
        got = {r.cwe_id for r in load_cwe_catalog(spark, str(p)).collect()}
        assert got == {79, 89}

    def test_validation_plan_broadcasts(self, spark):
        from vulnerablecode_spark.functions.cwe import (default_cwe_catalog,
                                                        validate_weaknesses)

        advisories = spark.createDataFrame(
            [(1, [79])], "advisory_pk bigint, weaknesses array<int>")
        plan = validate_weaknesses(
            advisories, default_cwe_catalog(spark))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestHygieneHelpers:
    def test_todo_excluded_filter(self, spark):
        from vulnerablecode_spark.operators.todos import todo_excluded

        adv = spark.createDataFrame(
            [(1, "pysec_importer_v2"), (2, "epss_importer_v2"),
             (3, "nvd_importer_v2"), (4, "gitlab_importer_v2")],
            "advisory_pk bigint, pipeline_id string")
        kept = {r.advisory_pk for r in todo_excluded(adv).collect()}
        assert kept == {1, 4}

    def test_build_description(self, spark):
        from vulnerablecode_spark.functions.text_funcs import build_description

        df = spark.createDataFrame(
            [("short", "short is in this longer text"),
             ("short", "unrelated text"),
             ("only summary", ""),
             (None, "only description"),
             ("", "")],
            "summary string, description string")
        got = [r.d for r in df.select(
            build_description(F.col("summary"),
                              F.col("description")).alias("d")).collect()]
        assert got == ["short is in this longer text",
                       "short\nunrelated text",
                       "only summary",
                       "only description",
                       ""]


class TestGithubPocs:
    def test_parse_and_join(self, spark, tmp_path):
        import json

        from vulnerablecode_spark.operators.exploits import (
            join_github_pocs, read_github_pocs)

        d = tmp_path / "2024"
        d.mkdir()
        (d / "CVE-2024-1111.json").write_text(json.dumps([
            {"html_url": "https://github.com/a/poc1",
             "created_at": "2024-01-02T03:04:05Z",
             "updated_at": "2024-02-02T03:04:05Z"},
            {"html_url": None},               # dropped: no html_url
            {"html_url": "https://github.com/a/poc1",
             "created_at": "2024-01-02T03:04:05Z",
             "updated_at": "2024-02-02T03:04:05Z"},  # duplicate collapses
        ]))
        (d / "CVE-2024-2222.json").write_text("not json")  # unparsable skipped
        pocs = read_github_pocs(spark, str(tmp_path))
        rows = pocs.collect()
        assert [(r.alias, r.url) for r in rows] == \
            [("CVE-2024-1111", "https://github.com/a/poc1")]
        assert rows[0].created_at is not None

        aliases = spark.createDataFrame(
            [("CVE-2024-1111", 1), ("CVE-2024-1111", 2), ("CVE-9999-1", 3)],
            "alias string, advisory_pk long")
        joined = join_github_pocs(aliases, pocs)
        assert sorted((r.advisory_pk, r.url) for r in joined.collect()) == \
            [(1, "https://github.com/a/poc1"), (2, "https://github.com/a/poc1")]


class TestArchiveUrls:
    def test_worklist_and_apply(self, spark):
        from vulnerablecode_spark.operators.improvers import (
            NO_ARCHIVE, apply_archive_urls, urls_needing_archive)

        refs = spark.createDataFrame(
            [("https://a.example/x", None),
             ("https://b.example/y", None),
             ("https://c.example/z", "https://web.archive.org/web/0/c"),
             ("ftp://d.example/w", None)],
            "url string, archive_url string")
        work = {r.url for r in urls_needing_archive(refs).collect()}
        # already-archived and non-http rows are excluded (archive_urls.py:37-48)
        assert work == {"https://a.example/x", "https://b.example/y"}

        archives = spark.createDataFrame(
            [("https://a.example/x", "https://web.archive.org/web/1/a"),
             ("https://b.example/y", None)],       # attempted, unreachable
            "url string, archive_url string")
        got = {r.url: r.archive_url
               for r in apply_archive_urls(refs, archives).collect()}
        assert got["https://a.example/x"] == "https://web.archive.org/web/1/a"
        assert got["https://b.example/y"] == NO_ARCHIVE
        assert got["https://c.example/z"] == "https://web.archive.org/web/0/c"
        assert got["ftp://d.example/w"] is None

    def test_unattempted_rows_stay_null(self, spark):
        from vulnerablecode_spark.operators.improvers import apply_archive_urls

        refs = spark.createDataFrame(
            [("https://a.example/x", None)], "url string, archive_url string")
        empty = spark.createDataFrame([], "url string, archive_url string")
        got = apply_archive_urls(refs, empty).collect()
        assert got[0].archive_url is None


class TestMarkUnfurled:
    def test_marking_rules(self, spark):
        from vulnerablecode_spark.operators.unfurl import (
            mark_all_impacts_unfurled)

        advisories = spark.createDataFrame(
            [(1, True), (2, True), (3, True), (4, False)],
            "advisory_pk long, is_latest boolean")
        impacts = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
             (1, "2024-01-02 00:00:00", None),      # attempted, not succeeded
             (2, None, None),                        # never attempted
             (3, "2024-01-01 00:00:00", "2024-01-01 00:00:00"),
             (4, "2024-01-01 00:00:00", "2024-01-01 00:00:00")],
            "advisory_pk long, last_range_unfurl_at string, "
            "last_successful_range_unfurl_at string",
        ).selectExpr(
            "advisory_pk",
            "CAST(last_range_unfurl_at AS TIMESTAMP) AS last_range_unfurl_at",
            "CAST(last_successful_range_unfurl_at AS TIMESTAMP)"
            " AS last_successful_range_unfurl_at",
        )
        got = {r.advisory_pk: r for r in
               mark_all_impacts_unfurled(advisories, impacts).collect()}
        # 1: all attempted (→ marked) but one impact not succeeded
        assert got[1]._all_impacts_unfurled_at is not None
        assert got[1]._all_impacts_unfurled_successfully_at is None
        # 2: has an unattempted impact → neither mark
        assert got[2]._all_impacts_unfurled_at is None
        # 3: all succeeded → both marks
        assert got[3]._all_impacts_unfurled_at is not None
        assert got[3]._all_impacts_unfurled_successfully_at is not None
        # 4: not latest → untouched
        assert got[4]._all_impacts_unfurled_at is None

    def test_zero_impact_advisory_marks_vacuously(self, spark):
        """mark_unfurl_version_range.py:79-116: the rule is NOT-Exists(an
        impact missing its watermark), vacuously TRUE for an advisory
        with zero impacts — it must be marked once, not re-selected on
        every run forever."""
        from vulnerablecode_spark.operators.unfurl import (
            mark_all_impacts_unfurled)

        advisories = spark.createDataFrame(
            [(9, True)], "advisory_pk long, is_latest boolean")
        impacts = spark.createDataFrame(
            [], "advisory_pk long, last_range_unfurl_at timestamp, "
                "last_successful_range_unfurl_at timestamp")
        got = mark_all_impacts_unfurled(advisories, impacts).collect()[0]
        assert got._all_impacts_unfurled_at is not None
        assert got._all_impacts_unfurled_successfully_at is not None

    def test_source_claims_datasource_override_without_column(self, spark):
        """The datasource_id parameter exists for corpora LACKING the
        column — it must label the claims, not raise on an unresolved
        name."""
        from vulnerablecode_spark.operators.compare import source_claims
        from vulnerablecode_spark.operators.ingest import extract_impacts

        advisories = spark.createDataFrame(
            [(1, ["CVE-2024-9999"], True,
              [{"package": "pkg:pypi/x",
                "affected_version_range": "vers:pypi/<1.0",
                "fixed_version": "1.0"}])],
            "advisory_pk bigint, aliases array<string>, is_latest boolean, "
            "affected_packages array<struct<package:string,"
            "affected_version_range:string,fixed_version:string>>")
        claims = source_claims(advisories, extract_impacts(advisories),
                               datasource_id="osv")
        rows = claims.collect()
        assert rows and all(r.datasource_id == "osv" for r in rows)


class TestRawPurlAmbiguity:
    """ADVICE r5: reserved characters in purl segments must not produce
    ambiguous storage keys — parse(to_raw_string(p)) == p for ALL inputs,
    while ordinary purls (and npm '@scope' namespaces) stay byte-identical
    to plain concatenation."""

    def test_ordinary_and_scoped_purls_unchanged(self):
        from vulnerablecode_spark.kernel.purl import parse_purl

        for raw in ("pkg:pypi/sample@1.2.0",
                    "pkg:npm/@babel/traverse@7.23.2",
                    "pkg:deb/debian/curl@7.50.3-1+deb9u1",
                    "pkg:maven/org.apache/kafka@3.0.0"):
            assert parse_purl(raw).to_raw_string() == raw

    def test_reserved_characters_round_trip(self):
        from vulnerablecode_spark.kernel.purl import Purl, parse_purl

        tricky = [
            Purl("generic", "", "name@odd", "1.0"),       # '@' in name
            Purl("generic", "", "name", "1.0@beta"),      # '@' in version
            Purl("generic", "", "what?name", "1.0"),      # '?' in name
            Purl("generic", "", "hash#name", "1.0"),      # '#' in name
            Purl("generic", "", "pct%name", "1.0"),       # '%' in name
            Purl("generic", "", "n", "1.0", {"k": "a&b"}),  # '&' in qualifier
            # ADVICE r6: '/' in name or version must escape too — raw
            # "pkg:generic/a/b@1.0/2" would fail the final-segment '@'
            # test and re-parse to different fields
            Purl("generic", "", "na/me", "1.0"),          # '/' in name
            Purl("generic", "", "n", "1.0/2"),            # '/' in version
        ]
        for p in tricky:
            raw = p.to_raw_string()
            assert parse_purl(raw) == p, (p, raw)

    def test_distinct_purls_never_collide_on_raw_key(self):
        from vulnerablecode_spark.kernel.purl import Purl

        a = Purl("generic", "", "name@1.0", "")   # name contains '@'
        b = Purl("generic", "", "name", "1.0")    # version is 1.0
        assert a.to_raw_string() != b.to_raw_string()

    def test_materialized_key_matches_kernel_escape(self, spark):
        from pyspark.sql import functions as F

        from vulnerablecode_spark.kernel.purl import parse_purl
        from vulnerablecode_spark.operators.unfurl import \
            materialize_packages

        unfurled = spark.createDataFrame(
            [("pkg:generic/lib", "1.0@hotfix"), ("pkg:generic/lib", "2.0")],
            "base_purl string, version string")
        keys = {r.version: r.package_url
                for r in materialize_packages(unfurled).collect()}
        assert keys["2.0"] == "pkg:generic/lib@2.0"
        # reserved-char version: key escapes exactly like the kernel and
        # re-parses to the same (name, version)
        p = parse_purl(keys["1.0@hotfix"])
        assert (p.name, p.version) == ("lib", "1.0@hotfix")

    def test_materialized_key_escapes_name_segment_too(self, spark):
        """ADVICE r6: the escape must cover base_purl's NAME segment,
        not just the version — a stored key for a name containing '@'
        must equal raw_purl() of the same purl on the lookup side, and
        npm '@scope' namespace segments must stay literal."""
        from vulnerablecode_spark.kernel.purl import raw_purl
        from vulnerablecode_spark.operators.unfurl import \
            materialize_packages

        unfurled = spark.createDataFrame(
            [("pkg:generic/odd@name", "1.0"),       # '@' in name
             ("pkg:generic/what?name", "1.0"),      # '?' in name
             ("pkg:npm/@babel/traverse", "7.23.2"),  # scope: '@' literal
             ("pkg:generic/ns%part/lib", "2.0")],   # '%' in namespace
            "base_purl string, version string")
        keys = {r.name: r.package_url
                for r in materialize_packages(unfurled).collect()}
        assert keys["odd@name"] == "pkg:generic/odd%40name@1.0"
        assert keys["what?name"] == "pkg:generic/what%3Fname@1.0"
        assert keys["traverse"] == "pkg:npm/@babel/traverse@7.23.2"
        assert keys["lib"] == "pkg:generic/ns%25part/lib@2.0"
        # store key == lookup key, the property the escape exists for
        for stored in keys.values():
            assert raw_purl(stored) == stored


class TestMergedRangeNullSemantics:
    def test_rangeless_advisory_merges_to_null(self, spark):
        """ADVICE r5: an advisory whose every impact has a NULL
        affecting_vers must report NULL, not '' (lookup.py merged
        range)."""
        from pyspark.sql import functions as F

        from vulnerablecode_spark.operators.lookup import (
            advisories_for_purls, normalize_request_purls)

        request = normalize_request_purls(spark, ["pkg:pypi/x@1.0"])
        packages = spark.createDataFrame(
            [(10, "pkg:pypi/x@1.0")], "package_pk long, package_url string")
        impacts = spark.createDataFrame(
            [(100, 1, None)],
            "impact_pk long, advisory_pk long, affecting_vers string")
        affecting = spark.createDataFrame(
            [(100, 10)], "impact_pk long, package_pk long")
        fixed_by = spark.createDataFrame(
            [], "impact_pk long, package_pk long")
        advisories = spark.createDataFrame(
            [(1, "ADV-1", "a/ADV-1", "s", ["CVE-1"], 5.0, True)],
            "advisory_pk long, advisory_id string, avid string, "
            "summary string, aliases array<string>, risk_score double, "
            "is_latest boolean")
        row = advisories_for_purls(
            request, packages, affecting, fixed_by, impacts,
            advisories).collect()[0]
        assert row.advisories[0].affecting_vers is None


class TestAddCvss31ToCves:
    """Fixture test for the CVSS3.1 backfill composition
    (reference pipelines/add_cvss31_to_CVEs.py:33-102): stored CVSSv3
    severities with NVD CVE urls gain cvssv3.1 rows pulled from the
    NVD-imported advisories sharing the CVE alias."""

    def test_backfill_rows(self, spark):
        from vulnerablecode_spark.operators.relate import add_cvss31_to_cves

        severities = spark.createDataFrame(
            [
                # maps: CVSSv3 + NVD CVE url
                (1, "cvssv3", "https://nvd.nist.gov/vuln/detail/CVE-2024-0001"),
                # same CVE, second vulnerability → second output row
                (2, "cvssv3", "https://nvd.nist.gov/vuln/detail/CVE-2024-0001"),
                # wrong scoring system → skipped
                (3, "cvssv2", "https://nvd.nist.gov/vuln/detail/CVE-2024-0001"),
                # non-NVD url → skipped
                (4, "cvssv3", "https://example.com/CVE-2024-0001"),
                # NVD url but no cvss3.1 in any advisory → no output
                (5, "cvssv3", "https://nvd.nist.gov/vuln/detail/CVE-2024-0002"),
            ],
            "vulnerability_id long, scoring_system string, url string")
        aliases = spark.createDataFrame(
            [(100, "CVE-2024-0001"), (101, "CVE-2024-0001"),
             (102, "CVE-2024-0002"), (100, "GHSA-xxxx")],
            "advisory_pk long, alias string")
        ref_type = ("array<struct<url:string,severities:array<struct<"
                    "system:string,value:string,scoring_elements:string>>>>")
        rows = [
            # nvd advisory with a cvss3.1 severity → the backfill source
            (100, "nvd_importer",
             [("https://nvd.nist.gov/1",
               [("cvssv3.1", "9.8", "CVSS:3.1/AV:N/AC:L"),
                ("cvssv2", "7.5", "AV:N")])]),
            # NOT created by nvd_importer → its cvss3.1 is ignored
            (101, "github_importer",
             [("https://github.com/1", [("cvssv3.1", "5.0", "CVSS:3.1/X")])]),
            # nvd advisory for CVE-2024-0002 with no cvss3.1 entries
            (102, "nvd_importer",
             [("https://nvd.nist.gov/2", [("cvssv2", "5.0", "AV:N")])]),
        ]
        advisories = spark.createDataFrame(
            rows, f"advisory_pk long, created_by string, references {ref_type}")

        got = add_cvss31_to_cves(severities, aliases, advisories).collect()
        assert len(got) == 2
        assert {r.vulnerability_id for r in got} == {1, 2}
        for r in got:
            assert r.cve_id == "CVE-2024-0001"
            assert r.scoring_system == "cvssv3.1"
            assert r.url == "https://nvd.nist.gov/vuln/detail/CVE-2024-0001"
            assert r.value == "9.8"
            assert r.scoring_elements == "CVSS:3.1/AV:N/AC:L"

    def test_idempotent_under_duplicate_severities(self, spark):
        """update_or_create semantics: duplicate stored severities or
        duplicate advisory entries must not multiply output rows."""
        from vulnerablecode_spark.operators.relate import add_cvss31_to_cves

        severities = spark.createDataFrame(
            [(1, "cvssv3", "https://nvd.nist.gov/vuln/detail/CVE-2024-0001"),
             (1, "cvssv3", "https://nvd.nist.gov/vuln/detail/CVE-2024-0001")],
            "vulnerability_id long, scoring_system string, url string")
        aliases = spark.createDataFrame(
            [(100, "CVE-2024-0001"), (101, "CVE-2024-0001")],
            "advisory_pk long, alias string")
        ref_type = ("array<struct<url:string,severities:array<struct<"
                    "system:string,value:string,scoring_elements:string>>>>")
        advisories = spark.createDataFrame(
            [(100, "nvd_importer",
              [("u1", [("cvssv3.1", "9.8", "V")])]),
             (101, "nvd_importer",
              [("u2", [("cvssv3.1", "9.8", "V")])])],
            f"advisory_pk long, created_by string, references {ref_type}")
        got = add_cvss31_to_cves(severities, aliases, advisories).collect()
        assert len(got) == 1
