"""Column-level function libraries (text analysis, vectors). Everything
here is built from ``pyspark.sql.functions`` — JVM-side, whole-stage
-codegen friendly; no Python UDFs in any hot path."""
