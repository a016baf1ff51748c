"""Reusable relational operators (SURVEY.md §2), Spark-first."""
