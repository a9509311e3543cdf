"""Operator library: every SURVEY.md §2 operator re-expressed Spark-first,
plus the large-scale pipeline extensions (dedup, similarity, text)."""
