"""ETL-surface demo queries (SURVEY.md §2.1) — filled in build-plan step 3."""
