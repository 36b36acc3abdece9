"""Large-scale training-data pipeline operators.

These extend the reference's dedup/entity-resolution machinery (SURVEY.md
§2.10 — content-hash dedup, union-find grouping) with the operators a 100 TB
LLM data pipeline needs: exact + near dedup (MinHash/LSH, SimHash, n-gram
Jaccard), embedding similarity search (brute-force and LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting, fingerprinting)
and multimodal binary-column plumbing.

Everything is expressed with built-in Catalyst expressions (JVM-side,
whole-stage-codegen) — the ONLY Python that touches row data is the
multimodal decode stub, which is an Arrow-batched ``mapInPandas``.
"""
