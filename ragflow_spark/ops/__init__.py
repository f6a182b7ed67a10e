"""Training-data pipeline operators over the driver's parquet tables.

Everything here is Spark-first: JVM-side ``pyspark.sql.functions`` in the hot
path (whole-stage codegen), Arrow-batched pandas UDFs only where built-ins
genuinely cannot express the semantics (simhash bit folds, fake media decode).
Each query module pairs the DataFrame implementation with the DuckDB oracle
SQL used by the driver's correctness gate.
"""
