"""Spark-side engine: builder, windows, evaluation, streaming, payload ops."""
