"""Composed query plans (pipelines) built from the operator library."""
