"""LLM training-data pipeline queries (dedup, similarity, text analysis,
multimodal) over the documents/embeddings tables. Populated below."""
