"""ETL layer: normalization primitives + pipeline orchestration
(reference-parity tier, SURVEY.md §2.1)."""
