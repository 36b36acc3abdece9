"""Google OSS-Fuzz vulnerability importer.

Reference: pipelines/v2_importers/oss_fuzz.py — one OSV-format YAML per
vulnerability under vulns/. The record IS the OSV schema, so the parse
delegates to the engine's existing OSV pipeline: a tiny mapInPandas turns
YAML into canonical JSON strings, then the shared ``from_json`` +
``parse_osv`` path (sources/osv.py) does everything else — one parser,
many container formats.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vulnerablecode_spark.sources.osv import OSV_SCHEMA, parse_osv


def read_oss_fuzz(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.format("text").option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.yaml")
        .load(path)
    )
    return parse_oss_fuzz(raw)


def parse_oss_fuzz(files: DataFrame) -> DataFrame:
    def to_json(batches):
        import json

        import yaml

        for pdf in batches:
            out = []
            for content in pdf["value"]:
                try:
                    # default=str: safe_load turns unquoted OSV
                    # 'modified:'/'published:' timestamps into datetime
                    # objects, which plain json.dumps rejects
                    out.append(json.dumps(yaml.safe_load(content),
                                          default=str))
                except (yaml.YAMLError, TypeError):
                    continue
            yield pd.DataFrame({"json": out})

    jsons = files.mapInPandas(to_json, "json string")
    osv_shaped = jsons.select(
        F.from_json(F.col("json"), OSV_SCHEMA).alias("o")).select("o.*")
    return parse_osv(osv_shaped, datasource_id="oss_fuzz")
