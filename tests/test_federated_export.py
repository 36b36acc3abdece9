"""FederatedCode export layout parity (VERDICT r6 directive #2).

Reference: aboutcode/hashid/__init__.py:30-96 (purl-hash balanced
directory tree), pipes/export.py:25-176 (per-package advisory relations +
serialize_advisory), exporters/federate_vulnerabilities.py:28-200
(publish → checkpoint → incremental). Golden assertions pin the EXACT
relative paths and YAML bytes for a fixture corpus, and the incremental
run must rewrite only files related to newly collected advisories.
"""

from __future__ import annotations

import os

import pytest


class TestHashidKernel:
    """Pin the purl-hash scheme to the reference's own doctest values
    (aboutcode/hashid/__init__.py get_purl_hash / package_path_elements /
    vulnerability_yml_path)."""

    def test_purl_hash_reference_doctests(self):
        from vulnerablecode_spark.kernel.hashid import get_purl_hash

        # version and qualifiers never change the hash
        assert get_purl_hash("pkg:pypi/univers@30.12.0", 7) == "09"
        assert get_purl_hash("pkg:pypi/univers@10.12.0", 7) == "09"
        assert get_purl_hash(
            "pkg:pypi/univers@30.12.0?foo=bar#sub/path", 7) == "09"
        # zero left-padding
        assert get_purl_hash("pkg:pypi/expressionss", 7) == "57"
        # purl normalization feeds the hash (pypi '_' → '-')
        assert get_purl_hash("pkg:pypi/license_expression", 7) == "50"
        assert get_purl_hash("pkg:pypi/license-expression", 7) == "50"

    def test_package_path_elements_reference_doctests(self):
        from vulnerablecode_spark.kernel.hashid import package_path_elements

        assert package_path_elements(
            "pkg:pypi/license_expression@30.3.1") == (
            "50", "pypi/license-expression", "30.3.1", "")
        assert package_path_elements(
            "pkg:pypi/license_expression@10.3.1") == (
            "50", "pypi/license-expression", "10.3.1", "")
        assert package_path_elements(
            "pkg:pypi/license_expression@30.3.1?foo=bar&baz=bar#sub/path"
        ) == ("50", "pypi/license-expression", "30.3.1",
              "baz%3Dbar%26foo%3Dbar%23sub%2Fpath")

    def test_vulnerability_yml_path(self):
        from vulnerablecode_spark.kernel.hashid import (
            get_vcid_yml_file_path, vulnerability_yml_path)

        assert vulnerability_yml_path(
            "VCID-s9bw-m429-aaaf") == "s9/VCID-s9bw-m429-aaaf.yml"
        assert get_vcid_yml_file_path("VCID-s9bw-m429-aaaf") == (
            "aboutcode-vulnerabilities/s9/VCID-s9bw-m429-aaaf.yml")

    def test_quote_more(self):
        from vulnerablecode_spark.kernel.hashid import quote_more

        assert quote_more("foo") == "foo"
        assert quote_more("foo/bar") == "foo%2Fbar"
        assert quote_more("foo%2Fbar") == "foo%2Fbar"  # no double-quote

    def test_ecosystem_tier_hash_lengths(self):
        from vulnerablecode_spark.kernel.hashid import get_purl_hash

        assert len(get_purl_hash("pkg:npm/foobar")) == 3       # 10 bits
        assert len(get_purl_hash("pkg:pypi/whatever")) == 2    # 7 bits
        assert len(get_purl_hash("pkg:deb/debian/curl")) == 2  # 5 bits
        assert get_purl_hash("pkg:cargo/serde") == "0"         # 1 repo


class TestYamlDump:
    def test_saneyaml_style(self):
        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        data = {
            "advisory_id": "ADV-9",
            "aliases": ["CVE-2025-0009"],
            "summary": "Test advisory",
            "severities": [
                {"score": "8.8", "scoring_system": "cvssv3",
                 "published_at": None, "url": ""}],
            "weaknesses": [],
        }
        assert dump_yaml(data) == (
            "advisory_id: ADV-9\n"
            "aliases:\n"
            "  - CVE-2025-0009\n"
            "summary: Test advisory\n"
            "severities:\n"
            "  - score: '8.8'\n"
            "    scoring_system: cvssv3\n"
            "    published_at:\n"
            "    url:\n"
            "weaknesses: []\n"
        )

    def test_nested_list_of_dicts(self):
        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        data = [{"purl": "pkg:npm/foobar@1.2.4",
                 "affected_by_advisories": ["test/ADV-002"],
                 "fixing_advisories": ["test/ADV-001"]}]
        assert dump_yaml(data) == (
            "- purl: pkg:npm/foobar@1.2.4\n"
            "  affected_by_advisories:\n"
            "    - test/ADV-002\n"
            "  fixing_advisories:\n"
            "    - test/ADV-001\n"
        )

    def test_multiline_block_literal(self):
        # Multi-line summaries must round-trip with line breaks intact
        # (saneyaml emits block style; single-quoting would FOLD them).
        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        assert dump_yaml({"summary": "line one\nline two"}) == (
            "summary: |-\n  line one\n  line two\n"
        )
        assert dump_yaml({"d": "ends\nwith newline\n"}) == (
            "d: |\n  ends\n  with newline\n"
        )
        # Bodies block style can't represent fall back to escapes.
        assert dump_yaml({"d": "trail \nnext"}) == (
            'd: "trail \\nnext"\n'
        )
        assert dump_yaml({"d": "\n"}) == 'd: "\\n"\n'

    def test_leading_indicator_quoting(self):
        # *foo/&foo/!foo are alias/anchor/tag at scalar start even with
        # no following space — they must be quoted.
        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        for s in ("*starred* text", "&anchor", "!tag", "%dir", "@at",
                  "`tick", ",lead"):
            out = dump_yaml({"k": s})
            assert out == "k: '" + s.replace("'", "''") + "'\n", out
        # -/?/: only act as indicators before a space: stay plain.
        for s in ("-rc1", "?x", ":y", "pkg:npm/a@1.0"):
            assert dump_yaml({"k": s}) == f"k: {s}\n"

    def test_pyyaml_roundtrip_fuzz(self):
        yaml = pytest.importorskip("yaml")
        import random
        import string

        from vulnerablecode_spark.kernel.yamldump import dump_yaml

        rng = random.Random(20260815)
        chars = string.ascii_letters + " \t\n-?:!&*%@`\"'[]{}#|>,.\\/"
        for _ in range(2000):
            s = "".join(rng.choice(chars)
                        for _ in range(rng.randint(0, 40)))
            doc = {"k": s, "l": [s, {"n": s, "m": [s]}]}
            back = yaml.safe_load(dump_yaml(doc))
            exp = s or None  # empty string renders as a bare key
            assert back["k"] == exp
            assert back["l"][0] == exp
            assert back["l"][1]["n"] == exp
            assert back["l"][1]["m"][0] == exp


class TestColumnHashParity:
    def test_purl_hash_col_matches_kernel(self, spark):
        from pyspark.sql import functions as F

        from vulnerablecode_spark.kernel.hashid import (core_purl_string,
                                                        get_purl_hash)
        from vulnerablecode_spark.streaming.export import _purl_hash_col

        purls = ["pkg:npm/foobar", "pkg:npm/@babel/traverse",
                 "pkg:pypi/license-expression", "pkg:pypi/univers",
                 "pkg:deb/debian/curl", "pkg:cargo/serde",
                 "pkg:github/torvalds/linux", "pkg:gem/rails",
                 "pkg:maven/org.apache/kafka", "pkg:golang/golang.org/x/net"]
        rows = [(core_purl_string(p), core_purl_string(p).split("/")[0][4:])
                for p in purls]
        df = spark.createDataFrame(rows, "core_purl string, type string") \
            .select("core_purl",
                    _purl_hash_col(F.col("core_purl"),
                                   F.col("type")).alias("h"))
        got = {r.core_purl: r.h for r in df.collect()}
        for p in purls:
            core = core_purl_string(p)
            assert got[core] == get_purl_hash(p), (p, got[core])

    def test_core_purl_col_quotes_like_to_string(self, spark):
        # package_tree_paths builds core_purl from RAW name/namespace
        # columns; for reserved characters its percent-quoting must
        # match Purl.to_string (the driver-side hash input) or files
        # land in a different purl-hash dir than lookups compute.
        from vulnerablecode_spark.kernel.hashid import core_purl_string
        from vulnerablecode_spark.kernel.purl import Purl
        from vulnerablecode_spark.streaming.export import package_tree_paths

        cases = [  # (type, namespace, name)
            ("npm", "@babel", "traverse"),
            ("generic", "", "name with space"),
            ("generic", "", "odd*star~tilde+plus"),
            ("generic", "ns%pct", "a&b=c"),
            ("rpm", "opensuse", "MozillaFirefox"),
            ("generic", "", "q?hash#slash@at"),
        ]
        rows = [(t, ns, n, "1.0", f"pkg:{t}/{ns}/{n}@1.0" if ns
                 else f"pkg:{t}/{n}@1.0", [], []) for t, ns, n in cases]
        df = package_tree_paths(spark.createDataFrame(
            rows, "type string, namespace string, name string, "
            "version string, package_url string, "
            "affected_by_advisories array<string>, "
            "fixing_advisories array<string>"))
        got = {(r.type, r.namespace, r.name): r.core_purl
               for r in df.collect()}
        for t, ns, n in cases:
            expected = core_purl_string(Purl(t, ns, n, "1.0"))
            assert got[(t, ns, n)] == expected, (t, ns, n, got[(t, ns, n)])


@pytest.fixture()
def corpus(spark):
    """Two-version npm package + one pypi package, two advisories —
    mirrors the reference exporter's own fixture corpus shape."""
    relations = spark.createDataFrame(
        [("npm", "", "foobar", "1.2.3", "pkg:npm/foobar@1.2.3",
          ["test/ADV-002"], []),
         ("npm", "", "foobar", "1.2.4", "pkg:npm/foobar@1.2.4",
          ["test/ADV-002"], ["test/ADV-001"]),
         ("pypi", "", "sample", "2.0", "pkg:pypi/sample@2.0",
          ["test/ADV-001"], [])],
        "type string, namespace string, name string, version string, "
        "package_url string, affected_by_advisories array<string>, "
        "fixing_advisories array<string>")
    advisories = spark.createDataFrame(
        [("ADV-001", "test/ADV-001", "https://example.com/advisory/1",
          ["CVE-2025-0001"], "Test advisory", "2025-01-01 00:00:00"),
         ("ADV-002", "test/ADV-002", "https://example.com/advisory/2",
          ["CVE-2025-0002"], "Test advisory2", "2025-01-02 00:00:00")],
        "advisory_id string, avid string, url string, "
        "aliases array<string>, summary string, date_collected string"
    ).withColumn("date_collected",
                 __import__("pyspark.sql.functions", fromlist=["col"])
                 .col("date_collected").cast("timestamp"))
    return relations, advisories


class TestFederatedTreeExport:
    # hashid-derived layout roots for the fixture corpus
    NPM_BASE = "aboutcode-packages-npm-3f1/npm/foobar"
    PYPI_BASE = None  # derived in the test

    def test_full_export_golden_layout(self, spark, tmp_path, corpus):
        from vulnerablecode_spark.kernel.hashid import package_base_dir
        from vulnerablecode_spark.streaming.export import federated_export

        relations, advisories = corpus
        repo = str(tmp_path / "repo")
        stats = federated_export(relations, advisories, repo,
                                 checkpoint_path=str(tmp_path / "ckpt.json"))
        assert stats == {"package_files": 4, "advisory_files": 2}

        pypi_base = package_base_dir("pkg:pypi/sample")
        expected_paths = {
            f"{self.NPM_BASE}/vulnerabilities.yml",
            f"{self.NPM_BASE}/purls.yml",
            f"{pypi_base}/vulnerabilities.yml",
            f"{pypi_base}/purls.yml",
            "advisories/test/ADV-001.yml",
            "advisories/test/ADV-002.yml",
        }
        found = set()
        for root, _dirs, files in os.walk(repo):
            for f in files:
                found.add(os.path.relpath(os.path.join(root, f), repo))
        assert found == expected_paths
        # the kernel and the column-side path derivation agree
        assert package_base_dir("pkg:npm/foobar") == self.NPM_BASE

        with open(f"{repo}/{self.NPM_BASE}/vulnerabilities.yml") as fh:
            assert fh.read() == (
                "- purl: pkg:npm/foobar@1.2.3\n"
                "  affected_by_advisories:\n"
                "    - test/ADV-002\n"
                "  fixing_advisories: []\n"
                "- purl: pkg:npm/foobar@1.2.4\n"
                "  affected_by_advisories:\n"
                "    - test/ADV-002\n"
                "  fixing_advisories:\n"
                "    - test/ADV-001\n"
            )
        with open(f"{repo}/{self.NPM_BASE}/purls.yml") as fh:
            assert fh.read() == (
                "- pkg:npm/foobar@1.2.3\n"
                "- pkg:npm/foobar@1.2.4\n"
            )
        with open(f"{repo}/advisories/test/ADV-001.yml") as fh:
            assert fh.read() == (
                "advisory_id: ADV-001\n"
                "datasource_id: test/ADV-001\n"
                "datasource_url: https://example.com/advisory/1\n"
                "aliases:\n"
                "  - CVE-2025-0001\n"
                "summary: Test advisory\n"
                "impacted_packages: []\n"
                "severities: []\n"
                "weaknesses: []\n"
                "references: []\n"
            )

    def test_incremental_export_rewrites_only_touched_files(
            self, spark, tmp_path, corpus):
        from pyspark.sql import functions as F

        from vulnerablecode_spark.streaming.export import federated_export

        relations, advisories = corpus
        repo = str(tmp_path / "repo")
        ckpt = str(tmp_path / "ckpt.json")
        federated_export(relations, advisories, repo, checkpoint_path=ckpt)

        def mtimes():
            out = {}
            for root, _dirs, files in os.walk(repo):
                for f in files:
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, repo)] = os.stat(p).st_mtime_ns
            return out

        before = mtimes()

        # a new advisory lands, affecting only the pypi package
        new_adv = spark.createDataFrame(
            [("ADV-003", "test/ADV-003", "https://example.com/advisory/3",
              ["CVE-2025-0003"], "Third", "2025-02-01 00:00:00")],
            "advisory_id string, avid string, url string, "
            "aliases array<string>, summary string, date_collected string"
        ).withColumn("date_collected",
                     F.col("date_collected").cast("timestamp"))
        relations2 = relations.withColumn(
            "affected_by_advisories",
            F.when(F.col("package_url") == "pkg:pypi/sample@2.0",
                   F.array(F.lit("test/ADV-001"), F.lit("test/ADV-003")))
            .otherwise(F.col("affected_by_advisories")))
        all_advisories = advisories.unionByName(new_adv)

        stats = federated_export(relations2, all_advisories, repo,
                                 checkpoint_path=ckpt)
        # one new advisory file + the pypi package's two files rewritten
        assert stats == {"package_files": 2, "advisory_files": 1}

        after = mtimes()
        from vulnerablecode_spark.kernel.hashid import package_base_dir
        pypi_base = package_base_dir("pkg:pypi/sample")
        touched = {"advisories/test/ADV-003.yml",
                   f"{pypi_base}/vulnerabilities.yml",
                   f"{pypi_base}/purls.yml"}
        assert set(after) == set(before) | {"advisories/test/ADV-003.yml"}
        for path, stamp in before.items():
            if path not in touched:
                assert after[path] == stamp, f"untouched {path} rewritten"
        with open(f"{repo}/{pypi_base}/vulnerabilities.yml") as fh:
            content = fh.read()
        assert "test/ADV-003" in content

        # checkpoint advanced: a third run with no new advisories is a
        # no-op for advisory files
        stats3 = federated_export(relations2, all_advisories, repo,
                                  checkpoint_path=ckpt)
        assert stats3["advisory_files"] == 0

        # a LATE advisory stamped exactly AT the watermark (coarse
        # date_collected) must still be exported — strict ">" would skip
        # it forever; the boundary-avid side file lets "==" rows through
        # exactly once.
        late_adv = spark.createDataFrame(
            [("ADV-004", "test/ADV-004", "https://example.com/advisory/4",
              ["CVE-2025-0004"], "Late twin", "2025-02-01 00:00:00")],
            "advisory_id string, avid string, url string, "
            "aliases array<string>, summary string, date_collected string"
        ).withColumn("date_collected",
                     F.col("date_collected").cast("timestamp"))
        with_late = all_advisories.unionByName(late_adv)
        stats4 = federated_export(relations2, with_late, repo,
                                  checkpoint_path=ckpt)
        assert stats4["advisory_files"] == 1
        assert os.path.exists(f"{repo}/advisories/test/ADV-004.yml")
        # and it is exactly-once: the next run is a no-op again
        stats5 = federated_export(relations2, with_late, repo,
                                  checkpoint_path=ckpt)
        assert stats5["advisory_files"] == 0
