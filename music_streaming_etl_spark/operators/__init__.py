"""Dataflow operators (SURVEY.md §2) expressed Spark-first."""
