#!/usr/bin/env python
"""Scale smoke: run the full domain pipeline on a synthesized corpus N×
larger than the fixtures and print per-stage timings.

Usage: python scripts/scale_smoke.py [n_advisories] [versions_per_pkg]

Generates deterministic synthetic advisories (content-addressed, multiple
datasources, overlapping aliases) + an upstream version dimension, then
runs: ingest/SCD2 merge → impacts → unfurl (pandas-UDF containment join)
→ package materialization → risk → flagship bulk lookup → grouping edges
→ connected components. The point is shape, not absolute speed: every
stage must stay set-oriented as N grows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ADVISORIES = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
VERSIONS_PER_PKG = int(sys.argv[2]) if len(sys.argv) > 2 else 40
N_PACKAGES = max(1, N_ADVISORIES // 10)


def main() -> None:
    from pyspark.sql import functions as F

    from vulnerablecode_spark.session import get_spark

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # operator modules define pandas UDFs at import time, which needs the
    # active session — import AFTER get_spark
    from vulnerablecode_spark.functions.risk import compute_advisory_risk
    from vulnerablecode_spark.operators.components import connected_components
    from vulnerablecode_spark.operators.ingest import (extract_aliases,
                                                       extract_impacts,
                                                       flag_latest)
    from vulnerablecode_spark.operators.lookup import (advisories_for_purls,
                                                       normalize_request_purls)
    from vulnerablecode_spark.operators.unfurl import (affecting_bridge,
                                                       unfurl_affected,
                                                       unfurled_package_universe)
    timings: dict[str, float] = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t = time.perf_counter()

            def __exit__(self, *a):
                timings[name] = round(time.perf_counter() - self.t, 2)
                print(f"# {name}: {timings[name]}s", flush=True)

        return _T()

    with stage("synthesize"):
        base = spark.range(N_ADVISORIES).withColumnRenamed("id", "i")
        pkg = F.concat(F.lit("pkg:pypi/pkg"), (F.col("i") % N_PACKAGES))
        lo = (F.col("i") % 20) + 1
        hi = lo + (F.col("i") % 5) + 1
        advisories = base.select(
            F.concat(F.lit("ADV-"), F.col("i")).alias("advisory_id"),
            F.array(F.concat(F.lit("CVE-2024-"), (F.col("i") % (N_ADVISORIES // 2)))).alias("aliases"),
            F.concat(F.lit("synthetic advisory "), F.col("i")).alias("summary"),
            F.array(F.struct(
                pkg.alias("package"),
                F.concat(F.lit("vers:pypi/>="), lo, F.lit(".0|<"), hi, F.lit(".0"))
                .alias("affected_version_range"),
                F.concat(hi, F.lit(".0")).alias("fixed_version"),
            )).alias("affected_packages"),
            F.array().cast("array<struct<reference_id:string,reference_type:string,url:string>>").alias("references"),
            F.array(F.struct(
                F.lit("cvssv3").alias("system"),
                (F.round(F.rand(seed=7) * 10, 1)).cast("string").alias("value"),
                F.lit("").alias("scoring_elements"),
                F.lit(None).cast("timestamp").alias("published_at"),
                F.lit("https://nvd.nist.gov/x").alias("url"),
            )).alias("severities"),
            F.array().cast("array<int>").alias("weaknesses"),
            F.lit(None).cast("timestamp").alias("date_published"),
            F.concat(F.lit("https://example.com/"), F.col("i")).alias("url"),
            # pre-computed canonical fields (the content-id UDF is timed
            # separately below on a 10% sample)
            F.sha2(F.concat(F.lit("content"), F.col("i")), 256).alias("unique_content_id"),
            F.when(F.col("i") % 2 == 0, "osv").otherwise("ghsa").alias("datasource_id"),
            F.lit("scale_smoke").alias("pipeline_id"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("date_collected"),
            F.xxhash64(F.col("i")).alias("advisory_pk"),
            F.lit(1).alias("status"),
            F.lit(None).cast("int").alias("precedence"),
        ).withColumn("avid", F.concat_ws("/", "datasource_id", "advisory_id"))
        versions = (
            spark.range(N_PACKAGES).withColumnRenamed("id", "p")
            .crossJoin(spark.range(VERSIONS_PER_PKG).withColumnRenamed("id", "v"))
            .select(
                F.concat(F.lit("pkg:pypi/pkg"), F.col("p")).alias("base_purl"),
                F.concat(F.col("v") + 1, F.lit(".0")).alias("version"),
                F.lit(None).cast("timestamp").alias("release_date"),
            )
        )
        advisories = advisories.localCheckpoint(eager=True)
        versions = versions.localCheckpoint(eager=True)

    with stage("scd2_flag_latest"):
        adv = flag_latest(advisories).localCheckpoint(eager=True)

    with stage("content_id_udf_10pct"):
        from vulnerablecode_spark.operators.ingest import with_content_id
        with_content_id(adv.sample(0.1, seed=1)).select("unique_content_id") \
            .write.format("noop").mode("overwrite").save()

    with stage("impacts"):
        impacts = extract_impacts(adv).localCheckpoint(eager=True)

    with stage("unfurl_pandas_udf_join"):
        unfurled = unfurl_affected(impacts, versions).localCheckpoint(eager=True)
        n_unfurled = unfurled.count()

    with stage("materialize_packages"):
        packages = unfurled_package_universe(unfurled, impacts, versions) \
            .localCheckpoint(eager=True)
        n_pkgs = packages.count()

    with stage("risk"):
        compute_advisory_risk(adv, spark).write.format("noop").mode("overwrite").save()

    with stage("bulk_lookup_1k_purls"):
        request = normalize_request_purls(
            spark, [f"pkg:pypi/pkg{i}@{(i % VERSIONS_PER_PKG) + 1}.0"
                    for i in range(1000)])
        advisories_for_purls(
            request, packages, affecting_bridge(unfurled),
            affecting_bridge(unfurled).limit(0), impacts, adv,
        ).write.format("noop").mode("overwrite").save()

    with stage("snapshot_merge_4_batches"):
        # the incremental table merge (batch_merge_to_table): fully
        # distributed staging-swap writes — no driver materialization, so
        # this stage must stay ~flat per batch as N grows
        import shutil
        import tempfile

        from vulnerablecode_spark.streaming.incremental import \
            batch_merge_to_table

        table_dir = tempfile.mkdtemp(prefix="merge_scale_")
        table_path = os.path.join(table_dir, "advisories")
        try:
            quarter = adv.withColumn(
                "_b", F.col("advisory_pk") % 4)
            for b in range(4):
                batch = quarter.filter(F.col("_b") == b).drop("_b")
                batch_merge_to_table(spark, batch, table_path)
        finally:
            shutil.rmtree(table_dir, ignore_errors=True)

    with stage("alias_components"):
        aliases = extract_aliases(adv)
        edges = aliases.select(
            F.concat(F.lit("a:"), F.col("advisory_pk")).alias("src"),
            F.concat(F.lit("i:"), F.col("alias")).alias("dst"))
        connected_components(edges).groupBy("component").count() \
            .write.format("noop").mode("overwrite").save()

    total = round(sum(timings.values()), 2)
    print({"n_advisories": N_ADVISORIES, "n_unfurled": n_unfurled,
           "n_packages": n_pkgs, "total_sec": total, "stages": timings})


if __name__ == "__main__":
    main()
