"""vulnerablecode_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of aboutcode-org/vulnerablecode.

The reference (/root/reference) is a Django+PostgreSQL vulnerability-database
builder; this package re-expresses its data model (SURVEY.md §1), operator
inventory (§2) and pipelines (§3) as idiomatic Spark SQL / DataFrame programs
designed for a 1000-executor, 100 TB deployment:

- ``kernel/``     pure-Python semantic kernels (purl, vers, version ordering,
                  canonical content-id, CVSS) — no Spark imports, unit-tested
                  in isolation.
- ``functions/``  Spark column expressions + (pandas-)UDF wrappers over the
                  kernels; everything that CAN be a built-in Catalyst
                  expression IS one.
- ``sources/``    source-format parsers (OSV, EPSS, KEV, GitLab YAML, Debian
                  tracker, OVAL XML) producing the canonical advisory
                  DataFrame.
- ``operators/``  the relational/analytic operator library (dedup+SCD2,
                  tiered search, lookup, version ranking, unfurl, risk,
                  grouping, ghost flagging, exploit enrichment, todos).
- ``llm/``        large-scale training-data operators (exact/minhash/simhash
                  dedup, ANN similarity, text analysis, multimodal columns).
- ``streaming/``  incremental processing: watermarked merges, partitioned
                  export with checkpointing, changelog streams.
"""

__version__ = "0.1.0"
