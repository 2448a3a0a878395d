"""Operator library: the relational query surface the reference delegates to
its Flight clients (SURVEY.md §2 Part B), plus LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal) — all expressed as
declarative DataFrame plans so Catalyst owns the physical strategy."""
