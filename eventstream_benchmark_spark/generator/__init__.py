"""Layer-A generator package (reference semantics on Spark)."""
