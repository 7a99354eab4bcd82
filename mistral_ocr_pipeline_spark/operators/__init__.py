"""Relational/dataflow operators from SURVEY.md §2, Spark-first."""
