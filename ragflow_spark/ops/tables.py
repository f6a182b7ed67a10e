"""Parquet table loaders for the driver's testdata layout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan; Catalyst prunes columns/filters into the parquet read."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
