"""Spark-native scalar function library (SURVEY.md §2.5): the
reference's BoundingBox interval algebra re-expressed as SQL expression
templates usable in both Spark SQL and DuckDB."""

from . import bbox  # noqa: F401
