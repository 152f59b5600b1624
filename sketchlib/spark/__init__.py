"""Spark-facing layer: DataFrame build/merge/probe for all sketches."""
