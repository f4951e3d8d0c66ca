"""Presto function surface on Spark expressions (SURVEY.md §2.9)."""
