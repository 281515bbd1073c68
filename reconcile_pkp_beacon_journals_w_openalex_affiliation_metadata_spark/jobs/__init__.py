"""spark-submit entrypoints."""
