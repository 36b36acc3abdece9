"""Layout + skew primitives: partition pruning must reach the scan, salted
ops must equal their unsalted equivalents."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


class TestStorageLayout:
    def test_partitioned_write_and_pruned_read(self, spark, tmp_path):
        from vulnerablecode_spark.operators.ingest import to_canonical_advisories
        from vulnerablecode_spark.schemas import ADVISORY_PARSED
        from vulnerablecode_spark.storage import (read_partition_pruned,
                                                  write_advisories)

        recs = [
            {"advisory_id": f"A-{i}", "aliases": [f"CVE-{i}"], "summary": "s",
             "affected_packages": [], "references": [], "severities": [],
             "weaknesses": [], "date_published": None, "url": "u"}
            for i in range(4)
        ]
        parsed = spark.createDataFrame(recs, ADVISORY_PARSED)
        a = to_canonical_advisories(parsed, "osv", "p", "2024-01-01 00:00:00")
        b = to_canonical_advisories(parsed, "nvd", "p", "2024-01-01 00:00:00")
        path = str(tmp_path / "advisories")
        write_advisories(a.unionByName(b), path)

        pruned = read_partition_pruned(spark, path, "nvd")
        assert pruned.count() == 4
        buf = io.StringIO()
        with redirect_stdout(buf):
            pruned.explain("formatted")
        plan = buf.getvalue()
        # the partition filter must appear as a partition filter, not a
        # post-scan filter
        assert "PartitionFilters" in plan
        assert "datasource_id" in plan.split("PartitionFilters", 1)[1][:200]

    def test_bucketed_bridge_roundtrip(self, spark, tmp_path):
        from vulnerablecode_spark.storage import write_bridge

        bridge = spark.createDataFrame(
            [(i % 7, i, "affecting") for i in range(100)],
            "impact_pk bigint, package_pk bigint, relation string")
        write_bridge(bridge, str(tmp_path / "bridge"))
        back = spark.read.parquet(str(tmp_path / "bridge"))
        assert back.count() == 100


class TestSkewPrimitives:
    def test_salted_count_matches_plain(self, spark):
        from vulnerablecode_spark.functions.skew import salted_count

        df = spark.range(10000).select(
            (F.col("id") % 3).alias("k"), F.col("id").cast("string").alias("v"))
        plain = {r.k: r["count"] for r in
                 df.groupBy("k").agg(F.count(F.lit(1)).alias("count")).collect()}
        salted = {r.k: r["count"] for r in
                  salted_count(df, ["k"], "v").collect()}
        assert plain == salted

    def test_salted_join_matches_plain(self, spark):
        from vulnerablecode_spark.functions.skew import salted_join

        skewed = spark.range(5000).select(
            F.when(F.col("id") % 10 == 0, 1).otherwise(F.col("id") % 50)
            .alias("k"), F.col("id").alias("payload"))
        dim = spark.createDataFrame([(i, f"d{i}") for i in range(50)],
                                    "k bigint, label string")
        plain = skewed.join(dim, "k").select("payload", "label")
        fancy = salted_join(skewed, dim, "k").select("payload", "label")
        assert plain.exceptAll(fancy).count() == 0
        assert fancy.exceptAll(plain).count() == 0
