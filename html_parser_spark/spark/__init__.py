"""Spark-side pipeline: sources, parse UDFs, extraction job, metrics,
checkpointing, and training-data operators (dedup, text stats, ANN)."""
