"""LLM-training-data operator queries (SURVEY.md §2.3) — build-plan step 4."""
