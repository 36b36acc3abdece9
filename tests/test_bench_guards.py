"""bench.py artifact guards (VERDICT r8 directive #1).

The r8 bench run was killed mid-sf1 and still produced a
plausible-looking BENCH_FULL.json with null sf1/sf10 blocks, and
nothing flagged it. Two guards now exist:

- a >25% round-over-round regression WARNING per headline query and for
  the headline total, compared against the latest committed
  BENCH_r*.json;
- an incomplete-artifact check: a scale point whose data directory
  exists but whose block is missing marks the artifact
  ``"incomplete": true`` and makes bench exit non-zero.

These tests exercise the guard functions directly (no Spark session).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class TestRegressionGuard:
    PRIOR = {"queries": {"q01": 1.0, "q06": 2.0, "q07": 0.2}, "value": 3.2}

    def test_fires_on_25pct_slower_query(self):
        cur = {"q01": 1.26, "q06": 2.0, "q07": 0.2}
        warns = bench.check_regressions(cur, 3.46, self.PRIOR)
        assert [w["query"] for w in warns] == ["q01"]
        assert warns[0]["prior_sec"] == 1.0
        assert warns[0]["current_sec"] == 1.26
        assert warns[0]["slowdown_pct"] == 26.0

    def test_quiet_within_threshold(self):
        cur = {"q01": 1.24, "q06": 2.1, "q07": 0.19}
        assert bench.check_regressions(cur, 3.53, self.PRIOR) == []

    def test_fires_on_total(self):
        # every query just under the per-query line, total over it
        cur = {"q01": 1.24, "q06": 2.49, "q07": 0.24}
        warns = bench.check_regressions(cur, 4.05, self.PRIOR)
        assert [w["query"] for w in warns] == ["_headline_total"]

    def test_new_query_without_prior_is_ignored(self):
        cur = {"q01": 1.0, "q99": 9.9}
        assert bench.check_regressions(cur, 3.0, self.PRIOR) == []

    def test_no_prior_round_is_quiet(self):
        assert bench.check_regressions({"q01": 9.9}, 9.9, None) == []

    def test_loads_latest_committed_round(self, tmp_path):
        # driver-wrapped shape ({"parsed": {...}}) and bare shape both load;
        # the highest round number wins
        (tmp_path / "BENCH_r01.json").write_text(json.dumps(
            {"queries": {"q01": 5.0}, "value": 5.0}))
        (tmp_path / "BENCH_r02.json").write_text(json.dumps(
            {"parsed": {"queries": {"q01": 1.0}, "value": 1.0}}))
        name, prior = bench.load_prior_bench(repo=str(tmp_path))
        assert name == "BENCH_r02.json"
        assert prior["queries"] == {"q01": 1.0}

    def test_skips_rounds_without_per_query_data(self, tmp_path):
        # e.g. a round whose stdout capture failed → parsed has no queries
        (tmp_path / "BENCH_r01.json").write_text(json.dumps(
            {"queries": {"q01": 5.0}, "value": 5.0}))
        (tmp_path / "BENCH_r02.json").write_text(json.dumps(
            {"parsed": {}, "tail": "..."}))
        name, prior = bench.load_prior_bench(repo=str(tmp_path))
        assert name == "BENCH_r01.json"

    def test_real_repo_prior_exists(self):
        # the actual repo has committed rounds — guard must find one
        name, prior = bench.load_prior_bench()
        assert name is not None and prior["queries"]


class TestIncompleteGuard:
    def test_requested_iff_directory_exists(self, tmp_path):
        (tmp_path / "testdata" / "sf1").mkdir(parents=True)
        pts = bench.requested_scale_points(repo=str(tmp_path), environ={})
        assert pts["sf1"] and pts["sf10"] is None

    def test_env_override(self, tmp_path):
        d = tmp_path / "elsewhere"
        d.mkdir()
        pts = bench.requested_scale_points(
            repo=str(tmp_path),
            environ={"SPARK_GRAFT_SF10_DIR": str(d)})
        assert pts["sf10"] == str(d)

    def test_missing_fires_when_requested_point_unmeasured(self):
        requested = {"sf1": "/data/sf1", "sf10": "/data/sf10"}
        # sf10 run died → its block is None → incomplete
        assert bench.missing_scale_points(
            requested, {"sf1": {"value": 1.0}, "sf10": None}) == ["sf10"]

    def test_unrequested_point_is_not_missing(self):
        requested = {"sf1": None, "sf10": None}
        assert bench.missing_scale_points(
            requested, {"sf1": None, "sf10": None}) == []


class TestMedianBand:
    """r11 directive #2: committed sf0.1 numbers are per-query medians
    across PHASE_RUNS suite passes, with per-pass ratios in a band."""

    RUNS = [{"q01": 1.0, "q06": 4.0}, {"q01": 3.0, "q06": 2.0},
            {"q01": 2.0, "q06": 9.0}]

    def test_median_is_per_query(self):
        assert bench.median_timings(self.RUNS) == {"q01": 2.0, "q06": 4.0}

    def test_median_empty(self):
        assert bench.median_timings([]) == {}

    def test_band_per_run_ratios(self):
        duck = [{"q01": 0.5, "q06": 0.5}, {"q01": 1.0, "q06": 1.0},
                {"q01": 0.5, "q06": 0.5}]
        band = bench.ratio_band(self.RUNS, duck)
        assert [r["ratio"] for r in band["runs"]] == [5.0, 2.5, 11.0]
        assert band["ratio_min"] == 2.5 and band["ratio_max"] == 11.0

    def test_band_survives_failed_duck_pass(self):
        duck = [{"q01": 0.5, "q06": 0.5}, {}, {}]
        band = bench.ratio_band(self.RUNS, duck)
        assert band["runs"][1]["ratio"] is None
        assert band["ratio_min"] == band["ratio_max"] == 5.0

    def test_phase_runs_at_least_three(self):
        assert bench.PHASE_RUNS >= 3

    def test_sf30_is_a_requested_point(self, tmp_path):
        (tmp_path / "testdata" / "sf30").mkdir(parents=True)
        pts = bench.requested_scale_points(repo=str(tmp_path), environ={})
        assert pts["sf30"] and pts["sf1"] is None


class TestBaselineFaultIsolation:
    """One pathological DuckDB baseline query must not erase the rest.

    At sf30 the q24 baseline spilled >70 GB of DuckDB temp and died on
    disk-full; the old whole-pass try/except in scale_point() then threw
    away the 17 baselines already measured. _time_duck now skips the
    failing query per-query (reopening the connection), and the scale
    ratio is computed over the intersection of queries present on both
    sides, so a missing baseline can never flatter the ratio.
    """

    def test_time_duck_skips_failing_query(self, tmp_path):
        oracles = {"good": "SELECT 1 AS x",
                   "bad": "SELECT * FROM no_such_table",
                   "good2": "SELECT 2 AS y"}
        t = bench._time_duck(oracles, ["good", "bad", "good2"],
                             str(tmp_path), 1, "test")
        assert set(t) == {"good", "good2"}

    def test_matched_ratio_full_overlap(self):
        ratio, missing, s_matched = bench.matched_ratio(
            {"q1": 2.0, "q2": 4.0}, {"q1": 1.0, "q2": 2.0})
        assert ratio == 2.0 and missing == [] and s_matched == 6.0

    def test_matched_ratio_excludes_spark_only_queries(self):
        # q2's baseline died: its Spark seconds must leave the numerator
        ratio, missing, s_matched = bench.matched_ratio(
            {"q1": 2.0, "q2": 100.0}, {"q1": 1.0})
        assert ratio == 2.0 and missing == ["q2"] and s_matched == 2.0

    def test_matched_ratio_no_baseline(self):
        ratio, missing, s_matched = bench.matched_ratio(
            {"q1": 2.0}, {})
        assert ratio is None and missing == ["q1"] and s_matched == 0.0

    def test_infeasible_list_is_headline_subset(self):
        # every pre-skipped baseline must name a real headline query at
        # a real scale point, so a rename can't silently disable a skip
        for label, names in bench.DUCK_INFEASIBLE.items():
            assert label in ("sf1", "sf10", "sf30")
            for n in names:
                assert n in bench.HEADLINE, n
