"""Operator library: relational helpers plus the LLM-data-pipeline
operators (SURVEY §2.10) — dedup, similarity search, text analysis,
sessionization, multimodal plumbing."""
