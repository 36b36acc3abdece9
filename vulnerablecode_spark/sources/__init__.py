"""Source-format parsers → canonical advisory DataFrame.

Each source module reads raw upstream payloads (OSV JSON, EPSS CSV, KEV
JSON, GitLab YAML advisories, Debian tracker JSON) and emits rows in the
``schemas.ADVISORY_PARSED`` shape — the engine's equivalent of the
reference's ~37 importer pipelines normalizing into AdvisoryData
(importers/__init__.py:57-132, importer.py:599-714).

Parse strategy is Spark-first: declared-schema ``spark.read.json/csv`` +
explode/transform, falling back to an Arrow-batched parse UDF only for
formats Catalyst can't express (YAML, deeply dynamic JSON maps)."""
