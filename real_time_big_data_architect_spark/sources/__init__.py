"""Ingestion layer: source catalog, payload schemas, JSON normalization,
HTTP polling DataSource (reference Extract+Transform, app.py:40-189)."""

from real_time_big_data_architect_spark.sources.registry import SOURCES
from real_time_big_data_architect_spark.sources.normalize import normalize

__all__ = ["SOURCES", "normalize"]
