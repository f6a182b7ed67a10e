"""ragflow_spark — a PySpark-native main-content extraction engine.

A from-scratch rebuild of the *capabilities* of RAGFlow's deepdoc extraction
core (reference: dawn9551/ragflow v0.20.3, read-only at /root/reference) on
idiomatic Spark: DataFrames + Arrow-vectorized pandas UDFs, salted
repartitioning for giant-document skew, snapshot checkpointing with
per-partition lineage metrics.

Layout:
    functions/   deterministic scalar/series kernels (tokens, delimiters, text stats)
    kernels/     pure pandas/numpy per-document extraction kernels (shared by
                 the pytest oracle and the Spark operators)
    operators/   Spark operators (extraction stages, dedup, similarity, text analysis)
    sources/     table loaders / adapters for the interleaved-span input contract
    plans/       end-to-end pipeline + snapshot checkpoint/resume + lineage
    streaming/   incremental (Structured Streaming) extraction
"""

__version__ = "0.1.0"
