"""Pure-Python semantic kernels — no Spark imports.

These implement the only genuinely custom semantics in the engine
(SURVEY.md §2.11): package-URL normalization, canonical content hashing,
ecosystem-aware version ordering, `vers` range containment, and CVSS base
scores. Everything is a deterministic pure function so the Spark layer can
wrap them as Arrow-batched pandas UDFs, and property/unit tests run without
a SparkSession.
"""
