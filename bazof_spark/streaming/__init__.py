"""Structured Streaming extensions (the reference roadmaps a streaming
scan at README.md:158 but implements none — this is beyond-parity
surface, Spark-native)."""
