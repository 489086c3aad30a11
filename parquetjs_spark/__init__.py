"""parquetjs_spark — a PySpark-native per-column lightweight-compression
engine with the encode/decode capabilities of ironSource/parquetjs,
re-expressed Spark-first (SURVEY.md)."""

__version__ = "0.1.0"
